"""Document chunking, line-level cleaning, and sequence packing — the
shaping stages of a training-data pipeline (reference scope: none — the
reference engine, /root/reference/src/Data/DataFrame/Combinator.hs, has no
text pipeline; these extend SURVEY.md §2's beyond-reference operator set).

All three operators are pure Catalyst expression pipelines:

- ``chunk_tokens`` / ``clean_lines`` are NARROW (per-row arrays, no
  shuffle) — at 100 TB they stream through the scan stage and their cost
  is bounded by the token regex, which runs inside whole-stage codegen.
- ``pack_sequences`` shuffles ONCE on (partition cols, shard) and runs an
  ordered window inside each shard.  The shard column exists precisely so
  the window never sees an unbounded partition: packing is order-dependent
  by nature, so the scalable form fixes a deterministic shard count and
  packs each shard independently (standard concat-and-split packing for
  LLM pretraining batches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kevinlang_spark.functions.textexpr import token_count, tokenize


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 32,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split each document into fixed-size token windows.

    Output: one row per chunk — (id, chunk_id, chunk_text, chunk_tokens,
    *keep_cols), chunk_id 0-based, last chunk possibly partial, token-free
    documents yield no rows.  ``keep_cols`` are replicated onto each chunk
    so downstream grouping needs no join back to the source.  The whole
    transform is sequence+transform+slice over the token array followed by
    posexplode: no shuffle, no UDF; output row count is bounded by
    ceil(tokens/chunk_size) per document.
    """
    # tokenize ONCE into its own projection: the token array is referenced
    # by the count, the window index AND every slice — lambda-bearing
    # expressions defeat Catalyst CSE, so leaving tokenize() inline would
    # re-split the text several times per row
    base = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in keep_cols],
        tokenize(F.col(text_col)).alias("__toks"),
    )
    toks = F.col("__toks")
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(float(chunk_size))).cast("int")
    # guard: sequence(0, -1) would DESCEND; empty docs get an empty array
    # (posexplode then emits nothing, matching the oracle's 0 chunks)
    idx = F.when(n > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    texts = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i * chunk_size + 1, chunk_size))
    )
    out = base.select(
        "id",
        *[F.col(c) for c in keep_cols],
        n.alias("__n"),
        F.posexplode(texts),
    )
    return out.select(
        "id",
        F.col("pos").alias("chunk_id"),
        F.col("col").alias("chunk_text"),
        F.least(F.lit(chunk_size), F.col("__n") - F.col("pos") * chunk_size).alias(
            "chunk_tokens"
        ),
        *keep_cols,
    )


def _line_pred(
    line: Column,
    min_words: int,
    require_terminal: bool,
    blocklist: tuple[str, ...],
) -> Column:
    words = F.size(F.filter(F.split(line, " "), lambda w: w != ""))
    keep = words >= min_words
    if require_terminal:
        keep = keep & line.rlike('[.!?"]$')
    for term in blocklist:
        keep = keep & ~F.contains(F.lower(line), F.lit(term))
    return keep


def clean_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    require_terminal: bool = False,
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """C4-style line-level cleaning: trim each line, keep lines with at
    least ``min_words`` space-separated words, optionally require terminal
    punctuation, and drop lines containing a blocklisted term
    (case-insensitive).  Output keeps every document with its cleaned
    text and kept/total line counts — filtering out now-empty documents
    is the caller's policy decision.

    Narrow per-row array work; the predicates are Column expressions so
    Catalyst fuses the whole pass into the scan stage.
    """
    lines = F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l))
    nonempty = F.filter(lines, lambda l: l != "")
    kept = F.filter(
        nonempty, lambda l: _line_pred(l, min_words, require_terminal, blocklist)
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_join(kept, "\n").alias("cleaned_text"),
        F.size(kept).alias("n_lines_kept"),
        F.size(nonempty).alias("n_lines_total"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    part_cols: tuple[str, ...] = ("source",),
    n_shards: int = 4,
) -> DataFrame:
    """Assign each document to a training sequence of ≤ ``max_tokens``
    (concat-and-split packing): within each (part_cols, shard) stream,
    documents are concatenated in id order and the stream is cut every
    ``max_tokens`` tokens; a document's sequence is the one its FIRST
    token lands in.  Output: (id, *part_cols, shard, seq_id, n_tokens).

    shard = id % n_shards (engine-portable, deterministic) bounds the
    window partition: at 100 TB you raise n_shards so each shard's token
    stream fits an executor — packing quality is unaffected because
    sequences never span shards anyway.  One shuffle total.
    """
    ntok = token_count(F.col(text_col))
    shard = (F.col(id_col) % n_shards).alias("shard")
    base = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in part_cols],
        shard,
        ntok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy(*part_cols, "shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.withColumn(
        "seq_id",
        F.floor((cum - F.col("n_tokens")) / F.lit(float(max_tokens))).cast("bigint"),
    )


def pack_sequences_with_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    ntok_col: str = "n_tokens",
    max_tokens: int = 512,
    part_cols: "tuple[str, ...]" = ("source",),
    n_shards: int = 4,
) -> DataFrame:
    """:func:`pack_sequences` plus the document's TOKEN OFFSET inside
    its packed sequence — the missing coordinate for mapping per-doc
    loss-mask spans into per-sequence positions (what the trainer's
    collator actually indexes).  Token counts arrive precomputed in
    ``ntok_col`` (the caller knows its unit: plain words, BPE
    subtokens, chars), so this operator is pure stream arithmetic.

    Same one-shuffle shape as pack_sequences: shard = id % n_shards
    bounds each ordered window; ``stream_offset`` = tokens before the
    doc in its (part_cols, shard) stream; ``seq_id`` =
    floor(stream_offset / max_tokens) (the sequence the doc's FIRST
    token lands in); ``tok_offset`` = stream_offset - seq_id *
    max_tokens (0-based within the sequence).  Returns (id,
    *part_cols, shard, n_tokens, stream_offset, seq_id, tok_offset).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in part_cols],
        (F.col(id_col) % n_shards).alias("shard"),
        F.col(ntok_col).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(*part_cols, "shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prior = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
        "stream_offset"
    )
    out = base.select("id", *part_cols, "shard", "n_tokens", prior)
    seq = F.floor(F.col("stream_offset") / F.lit(max_tokens)).cast("bigint")
    return out.select(
        "id",
        *part_cols,
        "shard",
        "n_tokens",
        "stream_offset",
        seq.alias("seq_id"),
        (F.col("stream_offset") - seq * max_tokens).alias("tok_offset"),
    )


def bfd_packing_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    ntok_col: str = "n_tokens",
    max_tokens: int = 2048,
    n_shards: int = 8,
    part_cols: "tuple[str, ...]" = ("source",),
    shard_col: "str | None" = None,
) -> DataFrame:
    """Best-fit-decreasing sequence packing plan — the whole-document
    packing strategy next to concat-and-split (:func:`pack_sequences`):
    documents keep their boundaries (no mid-document splits, the
    instruction-tuning requirement) and pack whole into fixed-capacity
    training sequences.  BFD shares FFD's 11/9·OPT + 6/9 worst-case
    guarantee (Johnson 1974; Dósa 2007) and is the better fit for a
    declarative engine: its state is the bin-load MULTISET (each doc
    goes to the FULLEST bin that still fits), which canonicalizes as a
    sorted array — no bin-creation order to carry, so the fold replays
    identically on any engine.  The report says how many sequences BFD
    needs per stream vs the ceil(total/capacity) lower bound, and the
    utilization — the padding bill a no-split policy pays.

    Scale shape: documents hash into ``n_shards`` streams per
    ``part_cols`` group (deterministic xxhash64 bucket by default;
    pass ``shard_col`` for a caller-computed shard — e.g. an
    oracle-replayable md5 bucket), each stream's length multiset
    collects ONCE (sorted desc in-row), and the BFD fold runs as a
    Catalyst ``aggregate`` whose accumulator is the sorted bin-load
    array — per-stream work is O(docs·bins), bounded by the shard,
    zero Python.  Docs longer than ``max_tokens`` clamp to the
    capacity (solo full bins — :func:`packing_report`'s truncation
    accounting).

    Returns (*part_cols, shard, n_docs, total_tokens, n_bins_bfd,
    n_bins_lb, utilization)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    cap = F.lit(int(max_tokens)).cast("bigint")
    n = F.least(F.col(ntok_col).cast("bigint"), cap)
    shard = (
        F.col(shard_col).cast("bigint")
        if shard_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )
    base = df.where(
        F.col(ntok_col).isNotNull() & (F.col(ntok_col) > 0)
    ).select(
        *[F.col(c) for c in part_cols],
        shard.alias("shard"),
        n.alias("__n"),
    )
    g = base.groupBy(*part_cols, "shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("__n").alias("total_tokens"),
        F.reverse(F.array_sort(F.collect_list("__n"))).alias("__lens"),
    )

    def step(acc, x):
        cand = F.filter(acc, lambda b: (b + x) <= cap)
        best = F.array_max(cand)
        pos = F.array_position(acc, best).cast("int")
        removed = F.concat(
            F.slice(acc, 1, pos - 1),
            F.slice(
                acc, pos + 1, F.greatest(F.size(acc) - pos, F.lit(0))
            ),
        )
        return F.when(
            F.size(cand) == 0,
            F.array_sort(F.concat(acc, F.array(x))),
        ).otherwise(
            F.array_sort(F.concat(removed, F.array(best + x)))
        )

    loads = F.aggregate(
        F.col("__lens"), F.array().cast("array<bigint>"), step
    )
    staged = g.select(
        *part_cols, "shard", "n_docs", "total_tokens",
        F.size(loads).alias("n_bins_bfd"),
    )
    lb = F.ceil(F.col("total_tokens") / max_tokens).cast("bigint")
    return staged.select(
        *part_cols,
        "shard",
        "n_docs",
        "total_tokens",
        F.col("n_bins_bfd").cast("bigint").alias("n_bins_bfd"),
        lb.alias("n_bins_lb"),
        (
            F.col("total_tokens")
            / (F.col("n_bins_bfd") * F.lit(int(max_tokens)))
        ).alias("utilization"),
    )
