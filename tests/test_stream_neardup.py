"""Bipartite probe-vs-index near-dup: batch semantics + the streaming
ingest flow against a persisted MinHash index."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "completely different content about spark and distributed shuffles"),
    (3, "a third corpus document with its own unique wording throughout"),
]
NEW_DOCS = [
    # near-dup of corpus doc 1 (one word changed)
    (101, "the quick brown fox jumps over the lazy cat again and again today"),
    # exact text of corpus doc 2
    (102, "completely different content about spark and distributed shuffles"),
    # novel
    (103, "an entirely novel arrival that matches nothing in the corpus"),
    # near-dup of 101 — but probe docs must NOT pair with each other
    (104, "the quick brown fox jumps over the lazy cat again and again now"),
]


@pytest.fixture(scope="module")
def mh_index(spark, tmp_path_factory):
    from kevinlang_spark.operators.dedup import write_minhash_index

    path = str(tmp_path_factory.mktemp("mh") / "index")
    corpus = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    write_minhash_index(corpus, path, num_hashes=32)
    return path


def test_probe_index_matches(spark, mh_index):
    from kevinlang_spark.operators.dedup import minhash_probe_index

    new = spark.createDataFrame(NEW_DOCS, "doc_id bigint, text string")
    got = {
        (r.new_id, r.corpus_id): r.jaccard
        for r in minhash_probe_index(
            spark, mh_index, new, threshold=0.5, num_hashes=32
        ).collect()
    }
    # 101 ~ corpus 1, 102 == corpus 2; 103/104 match nothing in corpus;
    # the 101~104 near-dup pair is absent (bipartite)
    assert set(got) == {(101, 1), (102, 2)}
    assert got[(102, 2)] == 1.0
    assert 0.5 <= got[(101, 1)] < 1.0


def test_probe_index_rejects_wrong_family(spark, mh_index):
    from kevinlang_spark.operators.dedup import minhash_probe_index

    new = spark.createDataFrame(NEW_DOCS[:1], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="32-hash"):
        minhash_probe_index(spark, mh_index, new, num_hashes=64)


def test_probe_index_corpus_never_shuffles(spark, mh_index):
    """The index side must reach the verify join without an exchange:
    probe band keys and probe shingles broadcast."""
    from kevinlang_spark.operators.dedup import minhash_probe_index
    from kevinlang_spark.plans.inspect import executed_plan

    new = spark.createDataFrame(NEW_DOCS, "doc_id bigint, text string")
    plan = executed_plan(
        minhash_probe_index(spark, mh_index, new, threshold=0.5, num_hashes=32)
    )
    assert "BroadcastHashJoin" in plan


def test_stream_neardup_against_index(spark, mh_index, tmp_path):
    from kevinlang_spark.operators.dedup import minhash_probe_index
    from kevinlang_spark.streaming.neardup import neardup_against_index

    src = str(tmp_path / "arrivals")
    sink = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")
    new = spark.createDataFrame(NEW_DOCS, "doc_id bigint, text string")
    new.write.parquet(src)

    stream = spark.readStream.schema(new.schema).parquet(src)
    q = neardup_against_index(
        stream, mh_index, sink, ckpt, threshold=0.5, num_hashes=32
    )
    q.awaitTermination(120)

    streamed = {
        (r.new_id, r.corpus_id, r.jaccard)
        for r in spark.read.parquet(sink).collect()
    }
    batch = {
        (r.new_id, r.corpus_id, r.jaccard)
        for r in minhash_probe_index(
            spark, mh_index, new, threshold=0.5, num_hashes=32
        ).collect()
    }
    assert streamed == batch and len(streamed) == 2
