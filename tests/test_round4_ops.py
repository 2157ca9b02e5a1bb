"""Round-4 operators: PII redaction, TF-IDF, merge/upsert, weighted
sampling, range-sorted parquet writes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# --------------------------------------------------------------------- #
# redact_pii
# --------------------------------------------------------------------- #


def test_redact_pii_basic(spark):
    from kevinlang_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            ("mail me at jo.doe+x@test-site.co.uk please",),
            ("server 192.168.1.250 is down",),
            ("call +1 555-123-4567 now",),
            ("no pii here at all",),
            (None,),
        ],
        ["t"],
    )
    got = [r.r for r in df.select(redact_pii(F.col("t")).alias("r")).collect()]
    assert got[0] == "mail me at <EMAIL> please"
    assert got[1] == "server <IP> is down"
    assert got[2] == "call <PHONE> now"
    assert got[3] == "no pii here at all"
    assert got[4] is None


def test_redact_pii_email_wins_over_ip(spark):
    # an address-looking email must redact as ONE email, not leak an <IP>
    from kevinlang_spark.operators.text import redact_pii

    df = spark.createDataFrame([("ping 1.2.3.4@ex.com ok",)], ["t"])
    (r,) = df.select(redact_pii(F.col("t")).alias("r")).collect()
    assert r.r == "ping <EMAIL> ok"


# --------------------------------------------------------------------- #
# tfidf_top_terms
# --------------------------------------------------------------------- #


def test_tfidf_ranks_distinctive_terms(spark):
    from kevinlang_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "common common zebra"),
            (2, "common common yak yak"),
            (3, "common xylophone"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(df, k=1).collect()
    top = {r.doc_id: r.term for r in out}
    # 'common' is in every doc (idf = ln(4/4) = 0); the unique term wins
    assert top == {1: "zebra", 2: "yak", 3: "xylophone"}
    scores = {r.doc_id: r.score for r in out}
    # doc 2's yak has tf=2
    assert scores[2] == pytest.approx(2 * math.log(4 / 2), abs=1e-4)


def test_tfidf_k_and_tie_order(spark):
    from kevinlang_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame([(1, "bb aa"), (2, "zz")], ["doc_id", "text"])
    out = tfidf_top_terms(df, k=2).where(F.col("doc_id") == 1).collect()
    # equal scores → alphabetical rank order
    assert [(r.term, r.rank) for r in sorted(out, key=lambda r: r.rank)] == [
        ("aa", 1),
        ("bb", 2),
    ]


# --------------------------------------------------------------------- #
# merge_upsert
# --------------------------------------------------------------------- #


def _upsert_fixture(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "tag", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "B", 200.0), (9, "z", 90.0)], ["id", "tag", "v"]
    )
    return base, updates


def test_merge_upsert_semantics(spark):
    from kevinlang_spark.operators.joins import merge_upsert

    base, updates = _upsert_fixture(spark)
    got = {
        r.id: (r.tag, r.v)
        for r in merge_upsert(base, updates, keys=("id",)).collect()
    }
    assert got == {
        1: ("a", 10.0),  # untouched
        2: ("B", 200.0),  # updated
        3: ("c", 30.0),  # untouched
        9: ("z", 90.0),  # inserted
    }


def test_merge_upsert_single_shuffle(spark):
    from kevinlang_spark.operators.joins import merge_upsert
    from kevinlang_spark.plans.inspect import executed_plan

    base, updates = _upsert_fixture(spark)
    plan = executed_plan(merge_upsert(base, updates, keys=("id",)))
    # union + grouped max_by: exactly ONE exchange, no join operator
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


# --------------------------------------------------------------------- #
# weighted_sample
# --------------------------------------------------------------------- #


def test_weighted_sample_exact_k_and_deterministic(spark, sf_dir):
    from kevinlang_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = weighted_sample(docs, 50, "n_chars").select("doc_id").collect()
    b = weighted_sample(docs, 50, "n_chars").select("doc_id").collect()
    ids_a = sorted(r.doc_id for r in a)
    assert len(ids_a) == 50
    assert ids_a == sorted(r.doc_id for r in b)


def test_weighted_sample_favors_heavy_rows(spark):
    from kevinlang_spark.operators.sampling import weighted_sample

    # 200 light rows (w=1) + 200 heavy rows (w=1000): the heavy half must
    # dominate the sample (deterministic given the hash family)
    rows = [Row(doc_id=i, w=1) for i in range(200)] + [
        Row(doc_id=1000 + i, w=1000) for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    got = weighted_sample(df, 40, "w").collect()
    heavy = sum(1 for r in got if r.doc_id >= 1000)
    assert heavy > 30, f"heavy rows underrepresented: {heavy}/40"


def test_weighted_sample_drops_nonpositive_weights(spark):
    from kevinlang_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -1), (4, None)], ["doc_id", "w"]
    )
    got = weighted_sample(df, 10, "w").collect()
    assert [r.doc_id for r in got] == [1]


def test_weighted_sample_is_topk_not_global_sort(spark, sf_dir):
    from kevinlang_spark.operators.sampling import weighted_sample
    from kevinlang_spark.plans.inspect import executed_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = executed_plan(weighted_sample(docs, 10, "n_chars"))
    assert "TakeOrderedAndProject" in plan, plan


# --------------------------------------------------------------------- #
# write_range_sorted
# --------------------------------------------------------------------- #


def test_write_range_sorted_disjoint_sorted_files(spark, sf_dir, tmp_path):
    from kevinlang_spark.sources.parquet import write_range_sorted

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "sorted")
    write_range_sorted(docs, out, ["doc_id"], num_files=4)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    assert len(per_file) == 4
    ranges = sorted((r.lo, r.hi) for r in per_file)
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"file ranges overlap: {ranges}"

    # each file is internally sorted: global order = files in range order
    import pyarrow.parquet as pq
    import glob

    for f in glob.glob(f"{out}/part-*.parquet"):
        ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids), f"file {f} not sorted"


# --------------------------------------------------------------------- #
# resample_ffill
# --------------------------------------------------------------------- #


def test_resample_ffill_semantics(spark):
    from kevinlang_spark.operators.joins import resample_ffill

    df = spark.createDataFrame(
        [
            # user 1: events at 10:30 and 13:10 → grid 10:00..13:00
            (1, "2024-01-01 10:30:00", 5.0),
            (1, "2024-01-01 13:10:00", 9.0),
            # user 2: single event → single-point grid
            (2, "2024-01-01 00:59:00", 1.5),
        ],
        ["user_id", "ts", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r.user_id, r.grid_ts): r.value
        for r in resample_ffill(df).collect()
    }
    base = 1704103200  # 2024-01-01 10:00:00 UTC
    assert got == {
        (1, base): None,  # 10:00 precedes the first event → gap stays NULL
        (1, base + 3600): 5.0,  # 11:00 forward-fills 10:30's value
        (1, base + 7200): 5.0,
        (1, base + 10800): 5.0,  # 13:00 still before 13:10
        (2, 1704067200): None,  # 00:00 precedes user 2's 00:59 event
    }


def test_resample_ffill_same_second_ties_collapse(spark):
    from kevinlang_spark.operators.joins import resample_ffill

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:01", 3.0), (1, "2024-01-01 10:00:01", 7.0)],
        ["user_id", "ts", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = resample_ffill(df).collect()
    # one grid point; the max of the simultaneous values wins
    assert [(r.user_id, r.value) for r in rows] == [(1, None)] or [
        (r.user_id, r.value) for r in rows
    ] == [(1, 7.0)]
