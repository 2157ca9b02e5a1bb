"""Ingest-time near-dup screening: a stream of new documents probed
against a persisted MinHash index of the corpus.

The batch corpus is indexed ONCE (``operators.dedup.write_minhash_index``
— shingle-hash + signature tables); each arriving micro-batch computes
its own signatures (batch-sized, cheap), broadcasts its band keys
against the index scan, and emits verified (new_id, corpus_id, jaccard)
matches through ``foreachBatch``.  The corpus is never re-tokenized and
never shuffled — exactly the shape you want when 100 TB sits behind the
index and the stream delivers megabytes per trigger.

The reference is batch-only (SURVEY §2.7); this is the streaming face of
the same dedup semantics, parity-tested against the batch probe in
tests/test_stream_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def neardup_against_index(
    stream_docs: DataFrame,
    index_path: str,
    sink_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
):
    """Start a foreachBatch query writing verified near-dup matches of
    each micro-batch against the persisted index to ``sink_path``
    (parquet, append).  Returns the StreamingQuery.

    foreachBatch (not a plain stream-static join) because the probe side
    needs a multi-stage batch plan — signature checkpoint, banding,
    verification joins — that Structured Streaming can't express inline;
    each batch runs it as a normal batch job with exactly-once parquet
    appends via the checkpoint."""
    from kevinlang_spark.operators.dedup import minhash_probe_index

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = minhash_probe_index(
            batch_df.sparkSession,
            index_path,
            batch_df,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
        )
        out.write.mode("append").parquet(sink_path)

    return (
        stream_docs.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
