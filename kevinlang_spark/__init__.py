"""kevinlang_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of harry75369/KevinLang ("kevin").

The reference (/root/reference, Haskell, ~960 LoC) is a Tableau-flavored
in-memory DataFrame library: CSV ingestion with type/role trait inference,
an index-viewed columnar table, and a combinator algebra
(select / filter / groupby / aggregate / sort / slice / melt / cast /
pivot-stack-unstack / append / positional join).  This package re-expresses
that surface Spark-first: every combinator builds a lazy Catalyst logical
plan via the DataFrame API; nothing is executed until an action.

Beyond reference parity, the package adds the operators a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal column plumbing, streaming windows) — all designed to run
partition-parallel on a 100 TB cluster (no collect(), no driver loops).
"""

from kevinlang_spark.frame import KevinFrame, SortOrder
from kevinlang_spark.session import get_spark
from kevinlang_spark.traits import FieldTraits, DataRole, DataInterpretation, KType

__all__ = [
    "KevinFrame",
    "SortOrder",
    "get_spark",
    "FieldTraits",
    "DataRole",
    "DataInterpretation",
    "KType",
]

__version__ = "0.1.0"
