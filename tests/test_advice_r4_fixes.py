"""Regression tests for the round-4 ADVICE findings.

1. theta overlap: keys present in only one unit survive (full outer).
2. frequent_sequences: NULL users are excluded from the sequence set.
3. read_xml: caller's StructType is not mutated by the corrupt-column add.
4. quantile column names: fine-grained quantiles get distinct names.
5. dp_counts: release_id is mandatory and rotates the noise.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_theta_overlap_keeps_one_sided_keys(spark):
    from kevinlang_spark.operators.sketches import theta_overlap, theta_rollup

    # key "new" appears only on d2, key "gone" only on d1, "both" on both
    rows = (
        [("both", "d1", f"u{i}") for i in range(5)]
        + [("both", "d2", f"u{i}") for i in range(3, 9)]
        + [("gone", "d1", f"g{i}") for i in range(4)]
        + [("new", "d2", f"n{i}") for i in range(7)]
    )
    df = spark.createDataFrame(rows, "k string, day string, user string")
    sk = theta_rollup(df, ["k"], F.col("day"), "user")
    out = {r.k: r for r in theta_overlap(sk, ["k"], "d1", "d2").collect()}
    assert set(out) == {"both", "gone", "new"}
    assert (out["gone"].n_a, out["gone"].n_b, out["gone"].n_both) == (4, 0, 0)
    assert out["gone"].n_only_a == 4
    assert (out["new"].n_a, out["new"].n_b, out["new"].n_both) == (0, 7, 0)
    assert out["new"].n_only_a == 0
    assert (out["both"].n_a, out["both"].n_b, out["both"].n_both) == (5, 6, 2)
    assert out["both"].n_only_a == 3


def test_frequent_sequences_drops_null_users(spark):
    from kevinlang_spark.operators.baskets import frequent_sequences

    base = []
    for u in range(4):
        base += [(f"u{u}", "2024-01-01 00:00:00", 2 * u, "view"),
                 (f"u{u}", "2024-01-01 00:01:00", 2 * u + 1, "buy")]
    # NULL-user rows would otherwise merge into one extra sequence and
    # raise the absolute support threshold
    noise = [(None, "2024-01-01 00:00:00", 100 + i, "noise") for i in range(3)]
    df = spark.createDataFrame(
        base + noise, "user_id string, ts string, event_id bigint, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.pattern: r.freq
        for r in frequent_sequences(
            df, user_col="user_id", ts_col="ts", id_col="event_id",
            type_col="event_type", min_support=0.9,
        ).collect()
    }
    # 4 real sequences, all contain view->buy; at min_support=0.9 the
    # threshold must be ceil(0.9*4)=4 sequences, not 0.9*5
    assert out.get("view->buy") == 4
    assert "noise" not in out


def test_read_xml_does_not_mutate_caller_schema(tmp_path, spark):
    from kevinlang_spark.sources.xml import read_xml

    xml = tmp_path / "r.xml"
    xml.write_text("<rows><row><a>1</a></row></rows>")
    schema = T.StructType([T.StructField("a", T.LongType(), True)])
    before = [f.name for f in schema.fields]
    try:
        read_xml(spark, str(xml), "row", schema)
    except Exception:
        pass  # the xml datasource may be unavailable; mutation check still valid
    assert [f.name for f in schema.fields] == before


def test_quantile_col_names_distinct_and_stable():
    from kevinlang_spark.operators.sketches import quantile_col_names

    assert quantile_col_names([0.5, 0.9, 0.25]) == ["q_50", "q_90", "q_25"]
    assert quantile_col_names([0.999, 1.0, 0.05]) == ["q_999", "q_100", "q_05"]
    assert quantile_col_names([0.5, 0.504]) == ["q_50", "q_504"]
    with pytest.raises(ValueError):
        quantile_col_names([0.5, 0.5])
    with pytest.raises(ValueError):
        quantile_col_names([1.5])


def test_dp_counts_requires_and_uses_release_id(spark):
    from kevinlang_spark.operators.quality import dp_counts

    df = spark.createDataFrame(
        [(i, f"g{i % 20}") for i in range(2000)], "id bigint, g string"
    )
    with pytest.raises(TypeError):
        dp_counts(df, ["g"])  # release_id is keyword-only and mandatory
    with pytest.raises(ValueError):
        dp_counts(df, ["g"], release_id="")
    a = {r.g: r.noisy_count for r in dp_counts(df, ["g"], release_id="v1").collect()}
    b = {r.g: r.noisy_count for r in dp_counts(df, ["g"], release_id="v2").collect()}
    assert a != b  # fresh release -> fresh noise (differencing defense)
