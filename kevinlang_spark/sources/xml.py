"""XML source/sink (Spark's built-in ``xml`` data source, merged from
spark-xml in Spark 4.0) — the enterprise-interchange format the crawl
side of a corpus pipeline still meets constantly (sitemaps, RSS/Atom
feeds, Wikipedia dumps, PubMed/arXiv metadata).

Scale rules, same as the JSONL source:

- **Explicit schema always.**  Schema inference is a full extra scan;
  ``read_xml`` requires the schema (or samples one via
  ``infer_xml_schema`` at a bounded fraction for interactive use).
- **Malformed records never kill the job.**  PERMISSIVE mode quarantines
  unparseable elements into ``_corrupt`` (Spark's
  ``columnNameOfCorruptRecord``); ``corrupt_records``/``valid_records``
  split the streams like the JSONL twins.
- **rowTag drives splittability.**  The XML reader splits files on the
  row-element boundary, so a single 100 GB dump file still parallelizes
  — but ONE document per row element; a pathological row element the
  size of the file serializes that file's parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt"


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read XML with an EXPLICIT schema (no inference scan): one row per
    ``row_tag`` element.  PERMISSIVE (default) routes unparseable
    elements to the ``_corrupt`` column; DROPMALFORMED silently drops
    them; FAILFAST fails the job on the first one."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if mode == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        # StructType.add mutates in place — build a copy so the caller's
        # schema object doesn't permanently gain the corrupt column.
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(schema)
        .load(path)
    )


def infer_xml_schema(
    spark: SparkSession,
    path: str,
    row_tag: str,
    sampling_ratio: float = 0.01,
) -> T.StructType:
    """One bounded inference pass; pin the result in code afterwards."""
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("samplingRatio", sampling_ratio)
        .load(path)
        .schema
    )


def corrupt_records(df: DataFrame) -> DataFrame:
    """The quarantine stream: full rows for elements that failed to parse
    (data columns NULL, raw XML in ``_corrupt``).

    Returns whole rows rather than the bare ``_corrupt`` string because
    Spark's analyzer forbids projections that reference ONLY the corrupt
    column straight off a file scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — same rule as
    JSON/CSV); keeping the row shape sidesteps that without caching the
    scan, and preserves any partially-parsed fields for triage."""
    if CORRUPT_COL not in df.columns:
        return df.limit(0)
    return df.where(F.col(CORRUPT_COL).isNotNull())


def valid_records(df: DataFrame) -> DataFrame:
    """Rows that parsed cleanly, with the corrupt column dropped.

    Two caveats shared with :func:`corrupt_records` (both are properties
    of Spark's lazy per-column parsing, not this wrapper):

    - **Corruption is projection-dependent.**  Pruned columns are never
      parsed, so their errors never fire — a query touching only
      ``doc_id`` sees NO corrupt rows even when ``score`` is garbage.
      Quarantine decisions are only complete when every schema column is
      referenced (e.g. right after read, before any narrowing select).
    - **A bare ``.count()`` is rejected** — it prunes every projected
      column, leaving the corrupt column as the scan's only reference
      (QUERY_ONLY_CORRUPT_RECORD_COLUMN).  Materialize rows or persist
      the parsed frame first — at corpus scale you'd do the latter
      anyway (one read pass, write both streams)."""
    if CORRUPT_COL not in df.columns:
        return df
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write XML shards (one ``row_tag`` element per row)."""
    w = (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
    )
    if compression:
        w = w.option("compression", compression)
    w.save(path)
