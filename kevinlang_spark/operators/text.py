"""Text-analysis operators for large-scale document pipelines.

The reference has no text functions at all (SURVEY §2.8); these are the
beyond-reference extension ops a 100 TB training-data pipeline needs:
language ID, quality scoring, token counting, fingerprinting.  Every
operator is a narrow per-row transformation built from Catalyst
expressions — they run inside the scan stage, shuffle nothing, and scale
linearly with partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kevinlang_spark.functions.textexpr import (
    normalize_text,
    shingle_hashes,
    token_count,
    tokenize,
    word_shingles,
)
from kevinlang_spark.operators.util import spread

#: tiny per-language stopword marker sets (n-gram-heuristic language ID).
#: Chosen to be unambiguous across the five testdata languages.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with", "for"],
    # ASCII-safe markers only: the tokenizer splits on [^a-z0-9]+, so a
    # marker containing 'ü' ('für') could never match a token
    "de": ["der", "die", "und", "ist", "mit", "das"],
    "es": ["el", "los", "las", "es", "con", "para"],
    "fr": ["le", "les", "et", "est", "avec", "pour"],
}

ENGLISH_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "from",
]


def lang_scores(text: Column, toks: Column | None = None) -> dict[str, Column]:
    """Marker-hit count per language (distinct-token intersection size).
    Pass a pre-tokenized ``toks`` column to share one tokenization across
    operators (lambda-bearing expressions defeat Catalyst CSE, so each
    textual ``tokenize(text)`` re-splits the string)."""
    toks = F.array_distinct(toks if toks is not None else tokenize(text))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column, toks: Column | None = None) -> Column:
    """Heuristic language ID: CJK-character presence → 'zh'; otherwise the
    marker set with the most distinct hits; ties/no-hits → 'und'.

    A deliberately simple, deterministic heuristic (fastText-class models
    don't ship in this container) — the Spark shape (pure expression,
    no UDF) is what matters at scale.
    """
    scores = lang_scores(text, toks)
    has_cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", "")) > 0
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reverse order so earlier languages win exact ties deterministically
    for lang in reversed(list(scores)):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(has_cjk, F.lit("zh")).otherwise(F.when(best > 0, out).otherwise(F.lit("und")))


def quality_features(
    text: Column, toks: Column | None = None
) -> dict[str, Column]:
    """Deterministic quality signals (Gopher/C4-style cheap filters):
    char/word counts, mean word length, alpha ratio, stopword ratio,
    digit ratio.  ``toks`` shares a pre-tokenized column (see
    ``lang_scores``)."""
    toks = toks if toks is not None else tokenize(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(F.lower(text), "[^a-z]", ""))
    digit_chars = F.length(F.regexp_replace(text, "[^0-9]", ""))
    stop_arr = F.array(*[F.lit(s) for s in ENGLISH_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    safe_tok = F.when(n_tok > 0, n_tok.cast("double"))
    safe_chars = F.when(n_chars > 0, n_chars.cast("double"))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "mean_word_len": F.round(
            F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double")
            / safe_tok,
            4,
        ),
        "alpha_ratio": F.round(alpha_chars / safe_chars, 4),
        "digit_ratio": F.round(digit_chars / safe_chars, 4),
        "stopword_ratio": F.round(n_stop / safe_tok, 4),
    }


def quality_score(
    text: Column, rounded: bool = True, toks: Column | None = None
) -> Column:
    """Composite [0,1] quality score from the features — a monotone blend
    of alpha ratio, stopword presence, and length adequacy.

    ``rounded=False`` returns the raw double: sums of 4dp-rounded inputs
    land on exact decimal halves constantly, where Spark (decimal-string
    HALF_UP) and other engines (binary rounding) disagree — cross-engine
    comparisons should compare the raw binary value instead.
    """
    f = quality_features(text, toks)
    len_ok = F.least(f["n_tokens"].cast("double") / F.lit(20.0), F.lit(1.0))
    # coalesce BEFORE least: F.least skips NULL arguments, so
    # least(NULL, 1.0) = 1.0 would hand token-free garbage a 0.3 floor
    stop_ok = F.least(
        F.coalesce(f["stopword_ratio"], F.lit(0.0)) * 5.0, F.lit(1.0)
    )
    raw = (
        0.4 * F.coalesce(f["alpha_ratio"], F.lit(0.0))
        + 0.3 * stop_ok
        + 0.3 * len_ok
    )
    return F.round(raw, 4) if rounded else raw


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: MD5 of the normalized text.
    Cross-engine reproducible (Spark md5 == DuckDB md5 == Python hashlib)."""
    return F.md5(normalize_text(text))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003): hash every char ``k``-gram of the normalized text, then keep
    the minimum hash of each sliding window of ``window`` consecutive
    gram hashes, distinct — the classic rolling-hash fingerprint set
    behind MOSS-style local similarity (any shared substring of length
    ≥ k + window − 1 is guaranteed to share a fingerprint).

    Everything is one scan-stage expression chain per row — the k-gram
    explosion, window minima, and distinct all happen INSIDE array
    columns (no row explosion, no shuffle), so the operator scales
    linearly with partitions like the other text ops.  Hashes are the
    md5-prefix 52-bit integers used engine-wide (dp_counts, dedup), so
    DuckDB reproduces them bit-for-bit.

    Documents whose normalized text is shorter than ``k`` have no
    k-grams and are dropped (no fingerprintable content).

    Returns (id, n_grams, fps array<bigint>) — callers explode ``fps``
    for fingerprint-keyed joins (candidate pairs, plagiarism buckets) or
    aggregate them for per-doc summaries."""
    if k < 1 or window < 1:
        raise ValueError(f"k and window must be >= 1 (got k={k}, window={window})")
    import hashlib

    import pandas as pd

    from pyspark.sql.functions import PandasUDFType

    # materialize the regexp normalization as a column so it is computed
    # ONCE per row (CollapseProject keeps non-cheap expressions un-inlined)
    norm = df.select(
        F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("__norm")
    ).select("id", "__norm", (F.length("__norm") - k + 1).alias("__m"))

    # The gram hashing + window minima + distinct run inside ONE
    # Arrow-vectorized pandas UDF (r12 optimization round): the previous
    # all-Catalyst shape — transform(sequence(1,m), md5-prefix) feeding a
    # zip_with/least chain — executed the per-gram md5+conv+substring
    # through the expression INTERPRETER (higher-order lambdas never
    # compile), paying interpreter dispatch per gram.  The Python loop
    # replays the exact semantics: codepoint slicing (== substr), UTF-8
    # md5 (== md5), 13-hex prefix → int (== conv 16→10, 52 bits exact),
    # min over each length-`window` slice with short tails truncating
    # (== the zip_with null-pad that least() skips, so m < window yields
    # the min over all m grams), then sorted(set(...)) == array_sort ∘
    # array_distinct.  Outputs byte-identical; the plan swaps an
    # interpreted projection for one ArrowEvalPython node (guide §4.2).
    @F.pandas_udf("array<bigint>", PandasUDFType.SCALAR)
    def _fps(norms):
        out = []
        for t in norms:
            if t is None:  # unreachable behind the __m >= 1 filter
                out.append(None)
                continue
            m = len(t) - k + 1
            hs = [
                int(
                    hashlib.md5(t[i : i + k].encode("utf-8")).hexdigest()[:13],
                    16,
                )
                for i in range(m)
            ]
            n_windows = max(m - window + 1, 1)
            out.append(
                sorted({min(hs[j : j + window]) for j in range(n_windows)})
            )
        return pd.Series(out, dtype=object)

    return norm.where(F.col("__m") >= 1).select(
        "id",
        F.col("__m").cast("bigint").alias("n_grams"),
        _fps(F.col("__norm")).alias("fps"),
    )


def token_pmi(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50,
    min_pair_docs: int = 5,
) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring in the
    same document — the collocation/association statistic behind phrase
    mining and topic coherence: PMI(a,b) = ln(P(a,b) / (P(a)·P(b))) with
    probabilities as document frequencies over the corpus.

    Scale shape: the vocabulary is capped at ``vocab_size`` by document
    frequency (ties on token asc, deterministic) and BROADCAST, so the
    per-doc token sets are vocab-bounded arrays; pairs are generated
    IN-ROW from the sorted per-doc array (transform × slice × flatten —
    no self-join, no row explosion before the filter), then one
    (a,b)-keyed count shuffle of ≤ |vocab|² keys.  The corpus size N
    rides along as a broadcast 1-row aggregate — no driver collect.

    Returns (tok_a, tok_b, n_ab, pmi) for pairs seen in ≥
    ``min_pair_docs`` documents, tok_a < tok_b."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("df_cnt"))
        .orderBy(F.col("df_cnt").desc(), F.col("tok").asc())
        .limit(vocab_size)
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("id")
        .agg(F.array_sort(F.collect_set("tok")).alias("ts"))
    )
    # in-row ordered pairs: for element i, pair with every later element
    pairs = per_doc.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ts"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ts"), i + 2, F.size(F.col("ts"))),
                        lambda y: F.struct(x.alias("tok_a"), y.alias("tok_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.tok_a", "p.tok_b")
    n_docs = df.select(F.count("*").alias("__n"))
    counts = pairs.groupBy("tok_a", "tok_b").agg(F.count("*").alias("n_ab"))
    ca = vocab.select(F.col("tok").alias("tok_a"), F.col("df_cnt").alias("n_a"))
    cb = vocab.select(F.col("tok").alias("tok_b"), F.col("df_cnt").alias("n_b"))
    return (
        counts.where(F.col("n_ab") >= min_pair_docs)
        .join(F.broadcast(ca), "tok_a")
        .join(F.broadcast(cb), "tok_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.col("__n")
                    / (F.col("n_a").cast("double") * F.col("n_b"))
                ),
                4,
            ).alias("pmi"),
        )
    )


def split_lines(text: Column) -> Column:
    """Non-empty trimmed lines of a document as an array column."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )


def dup_line_features(
    text: Column, lines: Column | None = None
) -> dict[str, Column]:
    """Line-level repetition signals (Gopher-style): non-empty line count
    and the fraction of lines that repeat an earlier line.  Pure
    expressions — no explode, no shuffle; NULL text → NULL features.

    Pass a pre-projected ``lines`` column when the caller stages the line
    array: the features reference it several times, and lambda-built
    arrays are ineligible for Spark's subexpression elimination, so the
    inline form rebuilds the array per reference."""
    if lines is None:
        lines = split_lines(text)
    n_lines = F.size(lines)
    dup_frac = F.when(
        n_lines > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)) / n_lines.cast("double"),
    )
    return {
        "n_lines": F.when(n_lines >= 0, n_lines).cast("long"),
        "dup_line_frac": F.round(dup_frac, 4),
    }


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "inrow",
) -> DataFrame:
    """Per-document repetition profile: (id, n_lines, dup_line_frac,
    top_bigram_frac) — the cheap Gopher-repetition filters that knock out
    boilerplate and degenerate generations before training.

    Line features are pure expressions in the scan stage.  The top-bigram
    fraction (share of the most frequent word bigram in all bigram
    occurrences) has two equivalent implementations:

    - ``method='inrow'`` (default): sort the hashed gram array and take
      the longest equal-run — a single O(L log L) fold per doc with ZERO
      shuffles: the whole operator runs in the scan stage.  (The naive
      distinct×filter formulation is a trap: lambdas defeat common
      subexpression elimination, so the gram array would be rebuilt per
      distinct element.)  The right default when document length is
      bounded (chunked corpora — exactly the 100 TB shape).
    - ``method='relational'``: explode → count per (doc, gram) → max/sum
      per doc — two key-shuffles with map-side partial agg.  Use when
      documents can be pathologically long (L² in-row cost would spike).

    Both produce identical values (tested); NULL/token-free docs get NULL
    top_bigram_frac either way."""
    t = F.col(text_col)
    sp = spread(df)
    if method == "inrow":
        # stage the two heavy lambda-built arrays (line array, hashed
        # grams) into their OWN projection: each is referenced 2-3 times
        # downstream, and HOF-built arrays are ineligible for Spark's
        # subexpression elimination — the inline form re-tokenized the
        # text up to 3× per row (measured ~40% of the operator's time)
        staged = sp.select(
            F.col(id_col).alias("id"),
            split_lines(t).alias("__lines"),
            # hashed grams (8-byte) so per-row counting compares longs,
            # not gram strings; identity matches word_shingles up to
            # xxhash64 collisions — counts are gram-value-agnostic
            shingle_hashes(t, 2).alias("__grams"),
        )
        feats = dup_line_features(t, lines=F.col("__lines"))
        grams = F.col("__grams")
        init = F.struct(
            F.lit(None).cast("bigint").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        )

        def merge(acc, x):
            run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
                F.lit(1)
            )
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        top = F.aggregate(
            F.array_sort(grams), init, merge, lambda acc: acc["best"]
        )
        frac = F.when(F.size(grams) > 0, F.round(top / F.size(grams), 4))
        return staged.select(
            "id",
            *[v.alias(k) for k, v in feats.items()],
            frac.alias("top_bigram_frac"),
        ).select(
            F.col("id").alias(id_col),
            "n_lines",
            "dup_line_frac",
            "top_bigram_frac",
        )
    lfeats = dup_line_features(t, lines=F.col("__lines"))
    base = sp.select(F.col(id_col).alias("id"), split_lines(t).alias("__lines")).select(
        "id", *[v.alias(k) for k, v in lfeats.items()]
    )
    bigr = sp.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_hashes(t, 2)).alias("g"),
    )
    per_gram = bigr.groupBy("id", "g").agg(F.count("*").alias("c"))
    per_doc = per_gram.groupBy("id").agg(
        F.round(F.max("c") / F.sum("c"), 4).alias("top_bigram_frac")
    )
    return base.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col), "n_lines", "dup_line_frac", "top_bigram_frac"
    )


def ngram_contamination(
    corpus: DataFrame,
    probes: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing ≥1 word
    ``n``-gram with any probe (benchmark) document, with the count of
    distinct shared n-grams.

    The probe side is a benchmark suite — small by construction — so its
    distinct n-gram set broadcasts and the corpus-side check is a
    broadcast semi-style join inside the scan stage: no corpus shuffle
    until the tiny per-doc hit aggregation.  Grams are 64-bit rolling
    hashes (``shingle_hashes``): the broadcast set is 8 bytes/gram and no
    gram strings are built on the corpus side — the 100 TB form."""
    c = spread(corpus).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingle_hashes(F.col(text_col), n))).alias("g"),
    )
    p = (
        probes.select(
            F.explode(F.array_distinct(shingle_hashes(F.col(text_col), n))).alias("g")
        )
        .distinct()
    )
    return (
        c.join(F.broadcast(p), "g")
        .groupBy("id")
        .agg(F.count("*").alias("n_shared_ngrams"))
        .select(F.col("id").alias(id_col), "n_shared_ngrams")
    )


#: PII patterns, ordered so earlier redactions can't mangle later matches
#: (emails contain dots/digits that the IP/phone patterns would chew on).
#: Deliberately RE2-safe (no lookaround/backrefs): the SAME pattern string
#: runs in Spark (Java regex) and DuckDB (RE2), so redaction is
#: oracle-comparable.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d{1,2}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]\d{4}", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Scrub emails / IPv4 addresses / phone numbers to typed placeholder
    tokens — the standard pre-training privacy pass.  A chain of
    ``regexp_replace`` calls: pure codegen expressions in the scan stage,
    zero shuffle at any scale."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: (id, term, tf, score, rank).

    The corpus-frequency join keys on the term (one shuffle with map-side
    partial counts on a vocabulary-sized table), the per-document ranking
    windows over single-document partitions — nothing global anywhere, so
    the operator scales with the corpus.  ``score = tf · ln((N+1)/(df+1))``
    (add-one smoothed); ties rank alphabetically for determinism.
    """
    from pyspark.sql import Window

    sp = spread(df)
    tf = (
        sp.select(F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # (id, term) is unique in tf, so document frequency is a plain count
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = sp.count()  # scalar: one cheap count job, broadcast as a literal
    scored = tf.join(dfreq, "term").select(
        "id",
        "term",
        "tf",
        F.round(
            F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("score"),
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "term", "tf", "score", "rank")
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_postings: int = 20,
) -> DataFrame:
    """Build an inverted index: (term, df, postings) where ``postings``
    is the first ``max_postings`` doc ids in ascending order (comma
    joined) and ``df`` counts distinct docs containing the term.

    Shape: distinct terms per doc (in-row ``array_distinct``, so a term
    repeated in one doc costs one shuffle row), explode, then ONE shuffle
    on the term: a per-term rank window and the grouped aggregation share
    the same hash partitioning, so the posting ``collect_list`` only ever
    sees ≤ ``max_postings`` rows per term — a stopword-grade term with
    10⁹ docs aggregates a bounded list, not a gigabyte cell.  Production
    writes would partition the output by a term hash bucket for pruned
    lookups.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("term").orderBy("id")
    exploded = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term"),
    )
    return (
        exploded.withColumn("__rk", F.row_number().over(w))
        .groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("__rk") <= max_postings, F.col("id"))
                        )
                    ),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings"),
        )
        .where(F.col("df") >= min_df)
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → + language/quality/token/fingerprint columns; one narrow
    projection, no shuffle."""
    t = F.col(text_col)
    feats = quality_features(t)
    return df.select(
        "*",
        lang_id(t).alias("lang_pred"),
        *[v.alias(k) for k, v in feats.items() if k != "n_chars"],
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
    )


def bigram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-trained bigram language-model score per document: mean
    add-one-smoothed log P(wᵢ | wᵢ₋₁) over the doc's bigram occurrences
    — the cheap relational stand-in for KenLM-perplexity quality
    filtering (low scores flag word-salad and boilerplate-free gibberish
    the length/stopword heuristics miss).

    Everything is count joins on gram keys: bigram and unigram count
    tables (map-side combined), then the doc's occurrences join both and
    average.  Gram-keyed shuffles only — no model broadcast, no driver
    state beyond the scalar vocabulary size — so training corpus and
    scored corpus can both be arbitrarily large (they're the same table
    here; pass a frozen count table for train/apply splits).
    """
    # tokenize ONCE into a multi-referenced column: embedding the full
    # tokenize() expression in the transform lambda would re-evaluate it
    # per array element under interpreted higher-order eval (O(tokens²)
    # regexp splits per doc — the CollapseProject/per-element trap
    # documented in winnow_fingerprints)
    tok_df = spread(df).select(
        F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    pairs = F.when(
        (F.size(toks) >= 2) & toks.isNotNull(),
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    occ = tok_df.select("id", F.explode(pairs).alias("p")).select(
        "id", "p.w1", "p.w2"
    )

    big = occ.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    uni = occ.groupBy("w1").agg(F.count("*").alias("c1"))
    # vocabulary = distinct context words (one cheap count job, a scalar)
    v = uni.count()
    scored = (
        occ.join(big, ["w1", "w2"]).join(uni, "w1")
        .select(
            "id",
            F.log((F.col("c2") + 1.0) / (F.col("c1") + F.lit(float(v)))).alias(
                "lp"
            ),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logp"),
    ).select(F.col("id").alias(id_col), "n_bigrams", "avg_logp")


def lm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    train_filter: Column | None = None,
) -> DataFrame:
    """Trigram stupid-backoff language-model perplexity per document
    (Brants et al. 2007, "Large Language Models in Machine Translation"
    §4) — the CCNet-style perplexity filter upgraded from
    :func:`bigram_lm_score`'s add-one bigram to the n-gram shape real
    curation stacks train at corpus scale:

        S(w₃|w₁w₂) = c(w₁w₂w₃)/c(w₁w₂)            if the trigram was seen
                   = α · c(w₂w₃)/c(w₂)            else if the bigram was
                   = α² · (c(w₃)+1)/(N+V)         else (add-one unigram
                                                   floor so OOV never hits
                                                   log 0 — the one
                                                   deviation from Brants,
                                                   who leaves OOV scores
                                                   undefined)

    ``train_filter`` freezes the count tables on a subset (the
    train/apply split); held-out documents then exercise the backoff
    chain for real.  With no filter the model trains on the full input
    and the trigram branch always fires (every occurrence is its own
    evidence).

    Scale shape: the model IS three count tables keyed by their grams —
    map-side-combined count shuffles to build, five gram-keyed
    broadcast-or-shuffle hash joins to score, N+V as a broadcast 1-row
    aggregate (the plan stays lazy; the train aggregation runs once).
    No dense vocabulary structure ever materializes, so train and
    scoring corpora can both be arbitrarily large.

    Returns one row per document with ≥1 trigram:
    (id_col, n_trigrams, avg_logp rounded 6dp, perplexity =
    exp(−avg_logp) of the ROUNDED mean — rounding first keeps the
    exponentiation bit-replayable across engines).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("lm_perplexity: alpha must be in (0, 1]")
    # tokenize ONCE into a multi-referenced column (the per-element
    # re-evaluation trap documented in winnow_fingerprints)
    tok_df = spread(df).select(
        F.col(id_col).alias("id"),
        tokenize(F.col(text_col)).alias("__toks"),
        (
            train_filter if train_filter is not None else F.lit(True)
        ).alias("__train"),
    )
    toks = F.col("__toks")
    tris = F.when(
        toks.isNotNull() & (F.size(toks) >= 3),
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
                F.element_at(toks, i + 2).alias("w3"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string,w3:string>>"))
    occ = tok_df.select(
        "id", "__train", F.explode(tris).alias("t")
    ).select("id", "__train", "t.w1", "t.w2", "t.w3")

    # count tables over the TRAIN slice only; unigrams/bigrams count every
    # position (not just trigram contexts) so c(w₂) really is the word's
    # corpus count, exactly what the backoff denominator means
    train_toks = tok_df.where("__train").select("__toks")
    uni = (
        train_toks.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    pairs = F.when(
        toks.isNotNull() & (F.size(toks) >= 2),
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("a"),
                F.element_at(toks, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    big = (
        train_toks.select(F.explode(pairs).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("c2"))
    )
    tri = (
        occ.where("__train")
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("c3"))
    )
    # N+V (train token mass + vocabulary) is the model's only scalar —
    # a broadcast 1-row cross join (the oracle's own CROSS JOIN nv
    # shape) keeps the plan fully LAZY and evaluates the train
    # aggregation once; an eager .collect() here would both trigger a
    # job at construction time and recompute the tokenize+groupBy when
    # the returned frame executes
    nv = uni.agg(
        (F.coalesce(F.sum("c1"), F.lit(0)) + F.count("*")).alias("__npv")
    )
    # guard on token MASS, not row count: a train slice whose docs all
    # tokenize empty leaves uni empty → __npv = 0 → the backoff floor
    # divides by zero and (ANSI off) every scored doc silently gets
    # NULL instead of the promised error.  First-match scan, no
    # aggregation — isEmpty short-circuits on the first qualifying row.
    if (
        tok_df.where("__train")
        .where(F.size("__toks") > 0)
        .isEmpty()
    ):
        raise ValueError("lm_perplexity: training slice has no tokens")

    b_ctx = big.select(
        F.col("a").alias("w1"), F.col("b").alias("w2"),
        F.col("c2").alias("c2ctx"),
    )
    b_bo = big.select(
        F.col("a").alias("w2"), F.col("b").alias("w3"),
        F.col("c2").alias("c2"),
    )
    u_ctx = uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1ctx"))
    u_tgt = uni.select(F.col("w").alias("w3"), F.col("c1").alias("c1"))
    joined = (
        occ.join(tri, ["w1", "w2", "w3"], "left")
        .join(b_ctx, ["w1", "w2"], "left")
        .join(b_bo, ["w2", "w3"], "left")
        .join(u_ctx, ["w2"], "left")
        .join(u_tgt, ["w3"], "left")
        .crossJoin(F.broadcast(nv))
    )
    # association mirrors the DuckDB oracle token-for-token: (x·1.0)/y,
    # (α·x)/y, ((α·α)·x)/y — double arithmetic is order-sensitive and the
    # hash compare is exact at 6dp
    lp = (
        F.when(
            F.col("c3").isNotNull(),
            F.log(F.col("c3") * F.lit(1.0) / F.col("c2ctx")),
        )
        .when(
            F.col("c2").isNotNull(),
            F.log(F.lit(alpha) * F.col("c2") / F.col("c1ctx")),
        )
        .otherwise(
            F.log(
                F.lit(alpha)
                * F.lit(alpha)
                * (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(1.0))
                / F.col("__npv")
            )
        )
    )
    avg6 = F.round(F.avg("__lp"), 6)
    return (
        joined.select("id", lp.alias("__lp"))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_trigrams"),
            avg6.alias("avg_logp"),
            F.round(F.exp(-avg6), 6).alias("perplexity"),
        )
        .select(
            F.col("id").alias(id_col), "n_trigrams", "avg_logp", "perplexity"
        )
    )


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Shannon entropy of the letter distribution per document — the
    gibberish/encrypted-blob screen in curation stacks: natural prose
    sits near the language's letter-frequency entropy (~4.1 bits for
    English); random keys and base64 push toward log2(26), repeated
    padding collapses toward 0.

    Zero shuffle, zero UDF: the 26 per-letter counts come from the
    ``length(s) - length(replace(s, c))`` identity (pure codegen, no
    regex), the count array is staged through its own projection so the
    entropy fold doesn't re-evaluate the 26-replace pass per reference,
    and ``H = -Σ (c/t) log2 (c/t)`` folds in-row via ``aggregate``.
    Documents with no letters report NULL entropy (no distribution to
    measure), not 0 (which means "one letter repeated").

    Returns (id, n_letters, letter_ratio, entropy_bits).
    """
    letters = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    low = F.lower(F.col(text_col))
    s = F.col("__s")
    counts = F.array(
        *[
            (F.length(s) - F.length(F.replace(s, F.lit(c)))).cast("double")
            for c in letters
        ]
    )
    t = F.col("__t")
    h = -F.aggregate(
        F.filter(F.col("__c"), lambda c: c > 0),
        F.lit(0.0),
        lambda acc, c: acc + (c / t) * F.log2(c / t),
    )
    return (
        spread(df.where(F.col(text_col).isNotNull()))
        # n_chars measured on the ORIGINAL text: lowercasing can change
        # length for some Unicode code points (e.g. U+0130)
        .select(
            F.col(id_col).alias("id"),
            F.length(F.col(text_col)).alias("n_chars"),
            low.alias("__s"),
        )
        .select("id", "n_chars", counts.alias("__c"))
        .select(
            "id",
            "n_chars",
            "__c",
            F.aggregate(
                F.col("__c"), F.lit(0.0), lambda a, c: a + c
            ).alias("__t"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("__t").cast("bigint").alias("n_letters"),
            F.round(
                F.when(F.col("n_chars") > 0, t / F.col("n_chars")), 6
            ).alias("letter_ratio"),
            F.round(F.when(t > 0, h), 6).alias("entropy_bits"),
        )
    )


def bpe_merge_pairs(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` BPE merge candidates: corpus-wide frequencies of
    adjacent CHARACTER pairs within words — the statistic one iteration
    of byte-pair-encoding vocabulary learning maximizes.

    Per row the pair multiset is assembled in-row (tokenize → per-word
    char bigrams via sequence+transform+substring — no per-word explode),
    then ONE explode feeds the classic wordcount shape: hash-partial
    counts map-side, a pair-keyed shuffle of (pair, partial_n) rows only,
    TakeOrderedAndProject for the top-k.  Scales like wordcount: the
    shuffle is bounded by distinct pairs per partition (≤ ~1k for ascii
    corpora), not corpus size."""
    words = tokenize(F.col(text_col))
    # char bigrams of one word; words shorter than 2 chars contribute
    # nothing.  sequence(1, 0) would generate a DESCENDING [1, 0] in
    # Spark, so the short-word case must be guarded explicitly.
    def _pairs(w):
        return F.when(
            F.length(w) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.length(w) - 1),
                lambda i: F.substring(w, i, 2),
            ),
        ).otherwise(F.array().cast("array<string>"))

    doc_pairs = F.flatten(F.transform(words, _pairs))
    return (
        spread(df.where(F.col(text_col).isNotNull()))
        .select(F.explode(doc_pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(top_k)
    )


def ngram_diversity(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus diversity: distinct word bigrams / total word
    bigram occurrences (a low ratio = heavy cross-document repetition,
    the self-repetition signal used to spot template-generated slices of
    a training corpus).

    Bigrams are built in-row (no shingle strings stored — the pair is
    space-joined only at explode time), then one (group, gram) shuffle
    computes both COUNT and COUNT(DISTINCT) with map-side partials.
    Documents under 2 tokens contribute nothing (no whole-doc fallback
    shingle — diversity is only defined over real bigrams)."""
    toks = F.col("__toks")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        spread(df.where(F.col(text_col).isNotNull()))
        .select(F.col(group_col), tokenize(F.col(text_col)).alias("__toks"))
        .select(F.col(group_col), F.explode(grams).alias("gram"))
        .groupBy(group_col)
        .agg(
            F.count("*").alias("total_grams"),
            F.count_distinct("gram").alias("distinct_grams"),
            F.round(F.count_distinct("gram") / F.count("*"), 6).alias(
                "diversity"
            ),
        )
    )


def sparse_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 100,
) -> DataFrame:
    """All-pairs document cosine similarity over TF-IDF vectors ≥
    ``threshold`` (Bayardo et al. WWW 2007 family) — the sparse
    lexical twin of the embedding kNN ops: near-dup and plagiarism
    detection when no embedding model is in the loop.

    Shape: one (id, term, tf) aggregation; idf-weight + per-doc L2
    normalize (window over single-doc partitions); then the ONLY
    quadratic-risk step, the term-keyed self-join, multiplies unit
    weights term-by-term and sums per pair.  Terms with document
    frequency > ``max_df`` are dropped BEFORE the join — the standard
    stopword cap that bounds each term's join group at max_df² pairs
    (high-df terms carry near-zero idf weight anyway, so the cosine
    loss is second-order; Bayardo's exact prefix filter is the
    recall-lossless upgrade, implemented for Jaccard in
    ``dedup.jaccard_prefix_pairs``).

    Returns (id_a, id_b, cosine) with id_a < id_b, cosine rounded 6dp.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1] (got {threshold})")
    sp = spread(df)
    # tf feeds BOTH the df-count aggregate and the weight join; unit
    # feeds BOTH sides of the term self-join — materialize each once
    # (the same build-once table pattern as the minhash shingle-hash
    # table in dedup.py), or the whole tokenize+aggregate lineage
    # re-executes per consumer
    tf = (
        sp.select(
            F.col(id_col).alias("id"),
            F.explode(tokenize(F.col(text_col))).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = sp.count()  # scalar literal, like tfidf_top_terms
    w = (
        tf.join(dfreq.where(F.col("df") <= max_df), "term")
        .select(
            "id",
            "term",
            (F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0))).alias(
                "w"
            ),
        )
    )
    norm = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("n"))
    unit = (
        w.join(norm, "id")
        .where(F.col("n") > 0)
        .select("id", "term", (F.col("w") / F.col("n")).alias("u"))
        .localCheckpoint(eager=True)
    )
    a, b = unit.alias("a"), unit.alias("b")
    return (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.sum(F.col("a.u") * F.col("b.u")).alias("__c"))
        # cut on the ROUNDED cosine (the value we return): the raw sum
        # depends on aggregation order, so boundary pairs would flicker
        # across runs/engines if thresholded unrounded
        .where(F.round(F.col("__c"), 6) >= threshold)
        .select("id_a", "id_b", F.round("__c", 6).alias("cosine"))
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 document scores for a fixed term query (Robertson &
    Walker 1994; Lucene's always-positive idf variant
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``) — the lexical half of the
    hybrid-retrieval stack whose dense half is ``similarity.cosine_topk``
    and whose fusion is ``stats.reciprocal_rank_fusion``.

    Shape: the exploded token stream is filtered to the query vocabulary
    IN THE SCAN STAGE, so the only data-sized shuffle is the (doc, term)
    count over rows that actually match — a |query|-bounded slice of the
    corpus, not the corpus.  Document length and the corpus-wide
    (N, avgdl) statistics come from one grouped count and one lazy 1-row
    aggregate broadcast-crossed into the scoring expression (the
    dangling-mass pattern from graph.pagerank — no driver round-trip).
    Per-term df is a query-vocab-sized table, broadcast back onto the
    matches.  Returns (id, n_terms, bm25) for documents matching at
    least one query term, bm25 rounded 6dp; rank on the rounded value
    with an id tie-break for engine-reproducible cuts.
    """
    if not query_terms:
        raise ValueError("bm25_scores: need at least one query term")
    if k1 <= 0 or not 0.0 <= b <= 1.0:
        raise ValueError(f"bm25_scores: bad k1/b (got k1={k1}, b={b})")
    sp = spread(df)
    toks = sp.select(
        F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("toks")
    )
    # NULL text → NULL dl (size() would report -1), so avg() skips it in
    # both engines
    dl = toks.select(
        "id",
        F.when(F.col("toks").isNull(), F.lit(None))
        .otherwise(F.size("toks"))
        .alias("dl"),
    )
    stats = dl.agg(
        F.count("dl").alias("__n"), F.avg("dl").alias("__avgdl")
    )
    tf = (
        toks.select("id", F.explode("toks").alias("term"))
        .where(F.col("term").isin(list(query_terms)))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            (
                F.log(
                    1.0
                    + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("__avgdl"))
                )
            ).alias("__s"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").cast("int").alias("n_terms"),
        F.round(F.sum("__s"), 6).alias("bm25"),
    )


def vocab_coverage(
    df: DataFrame,
    vocab_size: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str | None = None,
) -> DataFrame:
    """Tokenizer-vocabulary coverage diagnostic: derive the top-
    ``vocab_size`` tokens by document frequency (df desc, token asc —
    deterministic), then measure what fraction of token OCCURRENCES
    fall outside that vocabulary — the out-of-vocabulary (OOV) audit a
    pretraining pipeline runs before committing to a tokenizer or a new
    data source.  Rolled up per ``by`` column (default: whole corpus as
    one row with ``by`` absent).

    Shape: the vocabulary is metadata (``vocab_size`` rows via one
    df-count shuffle + a top-k cut) collected and folded back as a
    LITERAL array, so the coverage pass is pure scan-stage — an in-row
    ``filter(array_contains)`` per token, no second corpus shuffle.
    For 100k+-entry vocabularies swap the literal for a broadcast join
    on the exploded tokens (one broadcast, still no corpus shuffle).
    Returns (``by``?, n_docs, total_tokens, oov_tokens, oov_rate) with
    oov_rate rounded 6dp.
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1 (got {vocab_size})")
    sp = spread(df)
    toks = sp.select(
        F.col(id_col).alias("id"),
        *( [F.col(by)] if by else [] ),
        tokenize(F.col(text_col)).alias("toks"),
    )
    vocab_rows = (
        toks.select(F.explode(F.array_distinct("toks")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(vocab_size)
        .collect()  # vocab_size rows — metadata-scale, like IVF centroids
    )
    vocab = F.array(*[F.lit(r["term"]) for r in vocab_rows])
    per_doc = toks.select(
        *( [F.col(by)] if by else [] ),
        F.when(F.col("toks").isNull(), F.lit(None))
        .otherwise(F.size("toks"))
        .alias("n_tok"),
        F.when(F.col("toks").isNull(), F.lit(None))
        .otherwise(
            F.size(F.filter("toks", lambda t: ~F.array_contains(vocab, t)))
        )
        .alias("n_oov"),
    )
    keys = [by] if by else []
    return per_doc.groupBy(*keys).agg(
        F.count("n_tok").cast("bigint").alias("n_docs"),
        F.coalesce(F.sum("n_tok"), F.lit(0)).cast("bigint").alias("total_tokens"),
        F.coalesce(F.sum("n_oov"), F.lit(0)).cast("bigint").alias("oov_tokens"),
        F.round(
            F.try_divide(F.sum("n_oov"), F.sum("n_tok")), 6
        ).alias("oov_rate"),
    )


def feature_hash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
) -> DataFrame:
    """Hashing-trick vectorizer (Weinberger et al. 2009): tokens map to
    ``dim`` feature slots by hash, with a second hash bit supplying a
    ±1 sign so collisions cancel in expectation — the fixed-memory,
    vocabulary-free featurizer behind Vowpal-Wabbit-style linear
    models and sketch-based similarity.

    Slot and sign are md5-prefix hashes (engine-portable, like the
    bloom/winnow families); the output is the sparse triple table
    (id, idx, val) with val = signed token count — one explode + one
    (id, idx) key shuffle with map-side combine, no vocabulary state
    anywhere.  Rows with no tokens vanish (no zero vector rows)."""
    if dim < 2:
        raise ValueError(f"dim must be >= 2 (got {dim})")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(F.col(text_col))).alias("tok"),
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("tok"), F.lit("#fh"))), 1, 13), 16, 10
    ).cast("bigint")
    sign = F.when(
        F.conv(
            F.substring(F.md5(F.concat(F.col("tok"), F.lit("#fs"))), 1, 13),
            16,
            10,
        ).cast("bigint")
        % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        toks.select("id", (h % dim).alias("idx"), sign.alias("s"))
        .groupBy("id", "idx")
        .agg(F.sum("s").cast("bigint").alias("val"))
        .where(F.col("val") != 0)
    )


def trigram_search(
    df: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring search through a character-trigram index (the
    pg_trgm / code-search-engine model): a document can contain
    ``pattern`` only if it contains EVERY trigram of the pattern, so
    candidates come from trigram posting-list intersection and only
    candidates pay the exact ``contains`` verify — at scale the
    posting lists are a persisted index and the scan never touches
    non-candidate documents.

    Relational form: the candidate test counts how many PATTERN grams
    the doc contains (a filter over the tiny pattern-gram array, each
    element one JVM ``contains`` probe — the in-row equivalent of
    intersecting |grams| posting lists), keeps count == |pattern
    grams|, then verifies.  Iterating the ~dozen pattern grams instead
    of the document's every character position keeps the higher-order
    lambda O(|grams|) per doc with the string search in JVM code —
    measured 10x faster than the transform-over-all-positions shape at
    sf0.1.  Case folds; patterns shorter than 3 chars fall back to the
    plain scan.  Returns matching (id) rows — by construction EQUAL to
    the brute-force LIKE scan, which is exactly what the oracle runs."""
    pat = pattern.lower()
    base = spread(df).select(
        F.col(id_col).alias("id"), F.lower(F.col(text_col)).alias("__t")
    )
    verify = F.col("__t").contains(pat)
    if len(pat) < 3:
        return base.where(verify).select(F.col("id").alias(id_col))
    grams = sorted({pat[i : i + 3] for i in range(len(pat) - 2)})
    gram_arr = F.array(*[F.lit(g) for g in grams])
    hits = F.size(F.filter(gram_arr, lambda g: F.col("__t").contains(g)))
    cand = (
        base.select("id", "__t", hits.alias("__hits"))
        .where(F.col("__hits") == len(grams))
    )
    return cand.where(verify).select(F.col("id").alias(id_col))


def dsir_weights(
    df: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """Hashed n-gram importance-resampling weights (DSIR, Xie et al.
    2023): score every document by how target-like its token-bigram
    distribution is — w(doc) = Σ_{g ∈ doc} log p_target(g)/p_raw(g)
    over hashed bigram buckets with add-one smoothing.  Sampling
    proportionally to exp(w) reweights a raw corpus toward the target
    domain; this is the selection method behind modern pretraining
    data curation when a quality subset (the ``target_pred`` rows)
    defines "good".

    Shapes: one bigram explode feeding BOTH bucket-count aggregates
    (map-side combined, ≤ ``buckets`` keys each) and the per-doc score
    join; the bucket log-ratio table is ≤ ``buckets`` rows and
    broadcasts, so scoring is one scan + one tiny broadcast join.
    Bigram buckets are md5-prefix hashes — engine-portable like the
    bloom/winnow/feature-hash families.  Returns (id, n_grams, weight)
    with weight rounded 6dp; docs with <2 tokens are dropped."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2 (got {buckets})")
    base = spread(df).select(
        F.col(id_col).alias("id"),
        target_pred.alias("__is_target"),
        tokenize(F.col(text_col)).alias("__toks"),
    )
    ctoks = F.col("__toks")  # column, multi-referenced: no inline re-eval
    grams = F.when(
        F.size(ctoks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ctoks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(ctoks, i), F.element_at(ctoks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = base.select(
        "id",
        "__is_target",
        F.explode(grams).alias("g"),
    ).select(
        "id",
        "__is_target",
        (
            F.conv(F.substring(F.md5(F.col("g")), 1, 13), 16, 10).cast("bigint")
            % buckets
        ).alias("b"),
    ).localCheckpoint(eager=True)  # feeds both count aggs AND the score join

    counts = occ.groupBy("b").agg(
        F.count_if(F.col("__is_target")).alias("nt"),
        F.count("*").alias("nr"),
    )
    totals = occ.agg(
        F.count_if(F.col("__is_target")).alias("Nt"), F.count("*").alias("Nr")
    ).collect()[0]
    nt_total, nr_total = totals["Nt"], totals["Nr"]
    ratio = counts.select(
        "b",
        (
            F.log((F.col("nt") + 1.0) / F.lit(float(nt_total + buckets)))
            - F.log((F.col("nr") + 1.0) / F.lit(float(nr_total + buckets)))
        ).alias("lr"),
    )
    return (
        occ.join(F.broadcast(ratio), "b")
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.round(F.sum("lr"), 6).alias("weight"),
        )
        .select(F.col("id").alias(id_col), "n_grams", "weight")
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> "list[tuple[int, str, str, int]]":
    """Distributed byte-pair-encoding vocabulary training (Sennrich et
    al. 2016, the tokenizer-training algorithm behind GPT/Llama BPE
    vocabularies): ``n_merges`` rounds of (count adjacent token pairs →
    merge the most frequent pair corpus-wide).  Returns the learned
    merge list ``[(rank, tok_a, tok_b, pair_count), …]``.

    The scale trick is the classic one: the corpus collapses to the
    (word, freq) VOCABULARY table in a single wordcount shuffle up
    front, and every training round runs on that vocab-scale table —
    pair statistics are weighted by word frequency, so a 100 TB corpus
    trains at the cost of its distinct-word count (~10⁷ rows), not its
    token count.  Per round: one in-row pair explode + one pair-keyed
    count shuffle + a 1-row argmax collect (metadata, like a k-means
    centroid pull), then an in-row left-to-right fold applies the merge
    — no shuffle at all for the apply step.  The vocab table is
    checkpointed each round: the fold lambda nests per round, so an
    uncheckpointed plan's expression tree would double every round.
    Checkpoints are LAZY (r9): each round's rewrite materializes inside
    the NEXT round's argmax job instead of as its own job, and the
    rewrite after the final merge is skipped — halving the per-round
    scheduler latency that dominates this driver-sequential loop (the
    consumers are strictly sequential, so laziness cannot race).

    Determinism: tie-breaks are (count desc, tok_a asc, tok_b asc);
    merging is left-to-right non-overlapping (the fold re-reads its own
    output token, so ``l l l`` under merge (l,l) gives ``ll l`` exactly
    like reference BPE).  The DuckDB oracle unrolls the identical
    rounds.  Training stops early if no adjacent pair remains."""
    spark = df.sparkSession
    words = (
        spread(df.where(F.col(text_col).isNotNull()))
        .select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            # "hello" -> "h e l l o": spaced single chars seed the token
            # sequence; regexp_replace is global in both engines
            F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")).alias("toks"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )

    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        t = F.split(F.col("toks"), " ")
        pairs = F.when(
            F.size(t) > 1,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.struct(
                    F.element_at(t, i).alias("a"),
                    F.element_at(t, i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        best = (
            words.select(F.explode(pairs).alias("p"), "freq")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        merges.append((r, a, b, n))
        if r == n_merges:
            break  # the rewrite after the final merge has no consumer
        words = words.select(
            _apply_merge(a, b).alias("toks"), "freq"
        ).localCheckpoint(eager=False)
    return merges


def _apply_merge(a: str, b: str, toks_col: str = "toks"):
    """Left-to-right non-overlapping application of one BPE merge (a,b)
    to a space-separated token string: an in-row fold that re-reads its
    own output token, so ``l l l`` under merge (l,l) gives ``ll l``
    exactly like reference BPE.  Shared by training (the per-round
    vocab rewrite) and encoding (:func:`bpe_encode_words`)."""
    t2 = F.split(F.col(toks_col), " ")
    return F.aggregate(
        F.slice(t2, 2, F.greatest(F.size(t2) - 1, F.lit(0))),
        F.element_at(t2, 1),
        lambda acc, tok: F.when(
            ((acc == F.lit(a)) | F.endswith(acc, F.lit(" " + a)))
            & (tok == F.lit(b)),
            F.concat(
                F.substring(acc, 1, F.length(acc) - len(a)),
                F.lit(a + b),
            ),
        ).otherwise(F.concat(acc, F.lit(" "), tok)),
    )


def bpe_encode_words(
    words: DataFrame,
    merges: "list[tuple[int, str, str, int]]",
    word_col: str = "w",
) -> DataFrame:
    """Apply a trained BPE merge list to a DISTINCT-word table: returns
    (word, subtokens string, n_subtokens).  Merges apply in rank order,
    each left-to-right non-overlapping — byte-for-byte the tokenization
    reference BPE produces from the same merge table.

    This is the vocabulary-scale half of the encode path: a 100 TB
    corpus is tokenized by encoding its ~10⁷ DISTINCT words once and
    joining the word→n_subtokens map back to the corpus (see
    :func:`bpe_token_counts`) — the fold never runs per occurrence.

    All merges apply inside ONE Arrow-vectorized pandas UDF per
    distinct word (r12 optimization round): the previous shape was
    ``len(merges)`` CHAINED interpreted ``F.aggregate`` folds (one
    projection + lazy checkpoint per merge — higher-order lambdas
    never compile, so every merge was a full pass through the
    expression interpreter).  The Python loop replays the Catalyst
    semantics exactly — the seed string replicates
    ``trim(regexp_replace(w, '(.)', '$1 '))`` including the Java-regex
    line-terminator skip and the space-only trim, each merge is the
    same left-to-right non-overlapping scan :func:`bpe_encode_word_py`
    pytest-parity-gates against the old fold, and ``n_subtokens``
    still derives from the identical ``size(split(...))`` expression —
    so outputs are byte-identical while the 8-stage interpreted chain
    collapses to one ArrowEvalPython projection (the plan-lint-allowed
    node; guide §4.2)."""
    import pandas as pd

    from pyspark.sql.functions import PandasUDFType

    ms = [(a, b) for _, a, b, _ in sorted(merges)]

    # explicit SCALAR functionType: this module runs under
    # `from __future__ import annotations` (string hints don't resolve)
    @F.pandas_udf("string", PandasUDFType.SCALAR)
    def _encode_subtoks(ws):
        out = []
        for w in ws:
            if w is None:
                out.append(None)
                continue
            # literal replay of trim(regexp_replace(w, '(.)', '$1 ')):
            # '.' skips line terminators (they glue to the next char's
            # token), trim strips 0x20 only
            s = "".join(
                c if c in "\n\r\x85\u2028\u2029" else c + " " for c in w
            ).strip(" ")
            seq = s.split(" ")
            for a, b in ms:
                merged: "list[str]" = []
                for tok in seq:
                    if merged and merged[-1] == a and tok == b:
                        merged[-1] = a + b
                    else:
                        merged.append(tok)
                seq = merged
            out.append(" ".join(seq))
        return pd.Series(out, dtype=object)

    return words.select(
        F.col(word_col).alias("w"),
        _encode_subtoks(F.col(word_col)).alias("subtokens"),
    ).select(
        "w",
        "subtokens",
        F.size(F.split(F.col("subtokens"), " ")).alias("n_subtokens"),
    )


def bpe_token_counts(
    df: DataFrame,
    merges: "list[tuple[int, str, str, int]]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token count under a TRAINED BPE vocabulary — the
    real token-budget number a pretraining pipeline bills by (whitespace
    estimates over-count rare words, under-count merged common ones).

    Shape: one wordcount-style explode of the corpus joined to the
    vocabulary-scale word→n_subtokens map from :func:`bpe_encode_words`
    (broadcast when small, hash join on the word key otherwise) — the
    merge fold itself runs once per DISTINCT word, never per token.
    Returns (id, n_words, n_bpe_tokens) for documents with ≥1 token."""
    toks = (
        spread(df.where(F.col(text_col).isNotNull()))
        .select(F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("w"))
    )
    vocab = bpe_encode_words(toks.select("w").distinct(), merges)
    return (
        toks.join(vocab, "w")
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_subtokens").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(F.col("id").alias(id_col), "n_words", "n_bpe_tokens")
    )


def bpe_merges_df(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """``bpe_train`` as a DataFrame of (merge_rank, tok_a, tok_b,
    pair_count) — the learned merge table a tokenizer ships."""
    spark = df.sparkSession
    rows = bpe_train(df, text_col, n_merges)
    return spark.createDataFrame(
        rows, "merge_rank int, tok_a string, tok_b string, pair_count bigint"
    )


def bpe_train_local(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 32_000,
    max_vocab_rows: int = 20_000_000,
) -> "list[tuple[int, str, str, int]]":
    """Production-vocab BPE training (VERDICT r11 item 2): identical
    semantics to :func:`bpe_train` — same (count desc, tok_a, tok_b)
    tie-breaks, same overlapping adjacent-pair statistics, same
    left-to-right non-overlapping merge application — but the merge
    loop runs LOCALLY over the collected (word, freq) vocabulary table
    with incremental pair-count maintenance, so a 32k–100k-merge
    vocabulary costs seconds of CPU instead of 32k driver-sequential
    Spark jobs (days of scheduler latency at ~0.3s/job).

    This is the standard production shape (Sennrich et al. 2016's
    reference ``learn_bpe`` trains exactly this way): the CORPUS-scale
    work — the wordcount that collapses 100 TB to its ~10⁷ distinct
    words — is the one distributed shuffle; the training loop is
    vocab-scale and latency-bound, so it belongs on one node.  The
    learned merge table then ships back into the cluster like
    ``chat_token_spans_static`` consumes one.  ``max_vocab_rows``
    guards the collect: a vocab table larger than that raises instead
    of silently OOMing the driver (raise the cap or pre-prune rare
    words with a frequency floor).

    Incremental maintenance per merge: a lazy max-heap of
    (-count, a, b) entries (stale entries re-validated against the
    live pair-count dict on pop — the textbook lazy-deletion heap), a
    pair→word-ids index so only words CONTAINING the argmax pair are
    rewritten, and delta updates that subtract the rewritten word's
    old adjacent pairs and add its new ones.  Early-stops when no
    adjacent pair remains.  Returns ``[(rank, tok_a, tok_b,
    pair_count), …]`` — byte-identical to :func:`bpe_train` for the
    same corpus and merge count (pytest parity-gates the first rounds;
    tests/test_bpe_vocab.py)."""
    words, freqs = _bpe_collect_vocab(df, text_col, max_vocab_rows)
    return _bpe_train_core(words, freqs, n_merges)


def _bpe_collect_vocab(
    df: DataFrame, text_col: str, max_vocab_rows: int
) -> "tuple[list[list[str]], list[int]]":
    """The one distributed step of local BPE training: corpus →
    (word, freq) vocab table, collected under the ``max_vocab_rows``
    guard."""
    vocab_rows = (
        spread(df.where(F.col(text_col).isNotNull()))
        .select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .limit(max_vocab_rows + 1)
        .collect()
    )
    if len(vocab_rows) > max_vocab_rows:
        raise ValueError(
            f"bpe_train_local: vocabulary exceeds max_vocab_rows="
            f"{max_vocab_rows}; raise the cap or prune rare words first"
        )
    return (
        [list(r["w"]) for r in vocab_rows],
        [int(r["freq"]) for r in vocab_rows],
    )


def _bpe_train_core(
    words: "list[list[str]]",
    freqs: "list[int]",
    n_merges: int,
    on_merge=None,
) -> "list[tuple[int, str, str, int]]":
    """The local merge loop (see :func:`bpe_train_local` for the
    algorithm notes).  ``on_merge(rank, total_tokens)`` is called after
    each merge with the freq-weighted corpus token count — the hook
    :func:`bpe_vocab_sweep` uses to read the encoding state at vocab
    checkpoints for free (the vocab state after k merges IS the
    encoding under the first k merges)."""
    import heapq

    counts: "dict[tuple[str, str], int]" = {}
    where: "dict[tuple[str, str], set[int]]" = {}
    for wi, seq in enumerate(words):
        f = freqs[wi]
        for i in range(len(seq) - 1):
            p = (seq[i], seq[i + 1])
            counts[p] = counts.get(p, 0) + f
            where.setdefault(p, set()).add(wi)
    heap = [(-n, a, b) for (a, b), n in counts.items()]
    heapq.heapify(heap)
    total_tokens = sum(len(seq) * f for seq, f in zip(words, freqs))

    merges: "list[tuple[int, str, str, int]]" = []
    rank = 0
    # Heap discipline (r12 optimization round): ONE entry at the live
    # count per changed pair, pushed after all of a merge's deltas land,
    # and stale entries DISCARDED on pop instead of re-queued.  The
    # previous per-delta push + re-queue-on-stale loop validated ~1.5k
    # stale entries per merge (1.5M heappops for a 1k-merge vocab, 4.2 µs
    # each on a million-entry heap of string tuples) — 5.7 s of the old
    # q_bpe_train_vocab's wall was this churn; the same corpus now trains
    # in ~0.9 s with byte-identical merges, word states and on_merge
    # totals (pytest parity gates unchanged).  Invariant making the
    # discard safe: for every pair, some heap entry equals its live
    # count — seeded by heapify, maintained by the per-merge changed-set
    # push — so a popped mismatch is never the only witness.
    while rank < n_merges and heap:
        negn, a, b = heapq.heappop(heap)
        live = counts.get((a, b), 0)
        if live <= 0 or -negn != live:
            continue  # stale: a fresh entry with the live count exists
        rank += 1
        merges.append((rank, a, b, live))
        ab = a + b
        changed: "set[tuple[str, str]]" = set()
        for wi in sorted(where.pop((a, b), ())):
            seq = words[wi]
            f = freqs[wi]
            # the index may hold stale members; the delta update below
            # is a no-op for them, but skip the rewrite cost
            if not any(
                seq[i] == a and seq[i + 1] == b for i in range(len(seq) - 1)
            ):
                continue
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                counts[p] -= f
                changed.add(p)
            new: "list[str]" = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    new.append(ab)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            words[wi] = new
            total_tokens -= (len(seq) - len(new)) * f
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                counts[p] = counts.get(p, 0) + f
                changed.add(p)
                where.setdefault(p, set()).add(wi)
        counts.pop((a, b), None)
        changed.discard((a, b))
        for p in changed:
            n2 = counts.get(p, 0)
            if n2 > 0:
                heapq.heappush(heap, (-n2, p[0], p[1]))
        if on_merge is not None:
            on_merge(rank, total_tokens)
    return merges


def bpe_merges_local_df(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 32_000,
    max_vocab_rows: int = 20_000_000,
) -> DataFrame:
    """``bpe_train_local`` as a DataFrame of (merge_rank, tok_a, tok_b,
    pair_count) — the shippable merge table for production vocab
    sizes."""
    spark = df.sparkSession
    rows = bpe_train_local(df, text_col, n_merges, max_vocab_rows)
    return spark.createDataFrame(
        rows, "merge_rank int, tok_a string, tok_b string, pair_count bigint"
    )


def bpe_vocab_sweep(
    df: DataFrame,
    text_col: str = "text",
    checkpoints: "tuple[int, ...]" = (64, 256, 1024, 4096),
    max_vocab_rows: int = 20_000_000,
) -> DataFrame:
    """Vocabulary-size sweep — the choose-your-vocab report a
    tokenizer owner reads before committing to a merge count: corpus
    token totals, fertility (tokens/word), and compression
    (chars/token) at each candidate vocab size, from ONE training run.

    The trick: after k merges the trainer's vocab state IS the
    encoding of the corpus under the first k merges (BPE encoding
    replays the training trajectory), so the sweep costs one
    ``_bpe_train_core`` pass to max(checkpoints) with an ``on_merge``
    hook — no re-encoding per candidate size, no extra Spark jobs
    beyond the single wordcount shuffle.  A checkpoint past pair
    exhaustion reports the exhausted state with its EFFECTIVE merge
    count, so the caller sees the vocab saturated rather than a
    fabricated larger vocabulary.

    Returns (n_merges, n_merges_effective, total_tokens, fertility,
    chars_per_token) with a row for 0 (character-level baseline) and
    each checkpoint."""
    if not checkpoints or any(c < 1 for c in checkpoints):
        raise ValueError(f"checkpoints must be >= 1, got {checkpoints}")
    spark = df.sparkSession
    words, freqs = _bpe_collect_vocab(df, text_col, max_vocab_rows)
    n_words = sum(freqs)
    n_chars = sum(len(seq) * f for seq, f in zip(words, freqs))
    cps = sorted(set(int(c) for c in checkpoints))
    state: "dict[int, int]" = {}  # rank -> total_tokens at rank
    last: "list[tuple[int, int]]" = [(0, n_chars)]

    def on_merge(rank: int, total: int) -> None:
        last[0] = (rank, total)
        if rank in want:
            state[rank] = total

    want = set(cps)
    _bpe_train_core(words, freqs, max(cps), on_merge=on_merge)
    rows = []
    for req in [0] + cps:
        if req == 0:
            eff, total = 0, n_chars
        elif req in state:
            eff, total = req, state[req]
        else:  # exhausted before this checkpoint
            eff, total = last[0]
        rows.append(
            (
                req,
                eff,
                total,
                total / n_words if n_words else None,
                n_chars / total if total else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "n_merges int, n_merges_effective int, total_tokens bigint, "
        "fertility double, chars_per_token double",
    )


def source_kl_divergence(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution
    (add-one smoothed) — the domain-shift diagnostic a data-mixing
    pipeline reads to see which sources are lexically far from the pool
    they are being blended into.  Returns (source, n_tokens, n_vocab,
    kl) with kl in nats, rounded 6dp.

    The smoothed source distribution assigns every CORPUS vocabulary
    word a probability, including words absent from the source — but
    the absent-word mass is a CONSTANT p0 = 1/(n_s + V) per source, so
    its KL contribution collapses to closed form:

        KL(s) = Σ_{w∈s} p_s(w)·(ln p_s(w) − ln p(w))
              + p0·( (V − V_s)·ln p0 − (L_all − L_s) )

    where L = Σ ln p(w).  No (source × vocab) dense matrix ever
    materializes: one (source, word) count shuffle, one corpus word
    aggregate, a word-keyed join, and 1-row/|sources|-row broadcasts —
    vocab-scale work at any corpus size."""
    toks = (
        spread(df.where(F.col(text_col).isNotNull()))
        .select(
            F.col(group_col).alias("source"),
            F.explode(tokenize(F.col(text_col))).alias("w"),
        )
    )
    sw = toks.groupBy("source", "w").agg(F.count("*").alias("c"))
    cw = sw.groupBy("w").agg(F.sum("c").alias("cw"))
    scal = cw.agg(
        F.sum("cw").alias("__N"), F.count("*").alias("__V")
    )
    wt = cw.crossJoin(F.broadcast(scal)).select(
        "w",
        "__V",
        F.log(
            (F.col("cw").cast("double") + F.lit(1.0))
            / (F.col("__N") + F.col("__V")).cast("double")
        ).alias("lnp"),
    )
    l_all = wt.agg(F.sum("lnp").alias("__L"))
    ns = sw.groupBy("source").agg(
        F.sum("c").alias("n"), F.count("*").alias("vs")
    )
    ps = (F.col("c").cast("double") + F.lit(1.0)) / (
        F.col("n") + F.col("__V")
    ).cast("double")
    pres = (
        sw.join(wt, "w")
        .join(F.broadcast(ns), "source")
        .groupBy("source")
        .agg(
            F.sum(ps * (F.log(ps) - F.col("lnp"))).alias("kp"),
            F.sum("lnp").alias("ls"),
            F.first("n").alias("n"),
            F.first("vs").alias("vs"),
            F.first("__V").alias("V"),
        )
    )
    p0 = F.lit(1.0) / (F.col("n") + F.col("V")).cast("double")
    return (
        pres.crossJoin(F.broadcast(l_all))
        .select(
            "source",
            F.col("n").cast("bigint").alias("n_tokens"),
            F.col("vs").cast("bigint").alias("n_vocab"),
            F.round(
                F.col("kp")
                + p0
                * (
                    (F.col("V") - F.col("vs")).cast("double") * F.log(p0)
                    - (F.col("__L") - F.col("ls"))
                ),
                6,
            ).alias("kl"),
        )
    )


#: the Gopher stop-word presence set (Rae et al. 2021, appendix A1.1)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, appendix A1.1) — the
    widely-reused document filter battery behind Gopher / MassiveText
    and its descendants (RefinedWeb, Dolma, FineWeb).  Emits the raw
    per-document metrics plus per-rule booleans and the conjunction, so
    a pipeline can audit WHICH rule fired, not just the verdict:

    - word count within [min_words, max_words] (whitespace tokens)
    - mean word length within [3, 10] characters
    - symbol-to-word ratio (``#`` or ``...``) ≤ 0.1
    - ≤ 90% of non-empty lines start with a bullet (-, *, •)
    - ≤ 30% of non-empty lines end with an ellipsis (... or …)
    - ≥ 80% of words contain at least one alphabetic character
    - ≥ 2 distinct stop words from :data:`GOPHER_STOPWORDS` present

    Pure Catalyst expressions over one scan (split / filter /
    aggregate higher-order functions) — no shuffle, no UDF; ratios are
    raw doubles (int/int division — bit-identical across engines).
    NULL text yields null word metrics, zero line ratios, and
    ``passes`` = false (the word-level rules fail)."""
    t = F.col(text_col)
    words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    total_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_wl = F.when(
        n_words > 0, total_chars.cast("double") / n_words.cast("double")
    )
    hash_n = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    ell_n = (
        F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))
    ) / F.lit(3)
    symbol_ratio = F.when(
        n_words > 0, (hash_n + ell_n).cast("double") / n_words.cast("double")
    )
    # the lambda MUST be unary: F.trim passed bare would receive
    # transform's (element, index) pair — Spark 4's optional second trim
    # parameter silently turns the index into a trim-character set
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda ln: F.trim(ln)), lambda ln: ln != ""
    )
    n_lines = F.size(lines)
    bullet_n = F.size(F.filter(lines, lambda ln: ln.rlike(r"^[-*•]")))
    ellipsis_n = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)$"))
    )
    bullet_ratio = F.when(
        n_lines > 0, bullet_n.cast("double") / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(
        n_lines > 0, ellipsis_n.cast("double") / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    alpha_n = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_ratio = F.when(
        n_words > 0, alpha_n.cast("double") / n_words.cast("double")
    )
    lowered = F.transform(
        words, lambda w: F.regexp_replace(F.lower(w), r"[^a-z]", "")
    )
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(lowered, s),
        )
    )

    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_line_ratio"),
        ellipsis_ratio.alias("ellipsis_line_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        n_stop.alias("n_stopwords"),
    )
    rules = {
        "r_word_count": F.col("n_words").between(min_words, max_words),
        "r_word_len": F.col("mean_word_len").between(3.0, 10.0),
        "r_symbols": F.col("symbol_ratio") <= 0.1,
        "r_bullets": F.col("bullet_line_ratio") <= 0.9,
        "r_ellipses": F.col("ellipsis_line_ratio") <= 0.3,
        "r_alpha": F.col("alpha_word_ratio") >= 0.8,
        "r_stopwords": F.col("n_stopwords") >= 2,
    }
    for name, cond in rules.items():
        out = out.withColumn(name, F.coalesce(cond, F.lit(False)))
    passes = rules["r_word_count"]
    for name in list(rules)[1:]:
        passes = passes & F.col(name)
    return out.withColumn("passes", F.coalesce(passes, F.lit(False)))


def fasttext_weights(dim: int, seed: int) -> list[float]:
    """Seeded deterministic linear-model weights (one per hash slot) —
    standing in for a trained fastText-style classifier's weight vector.
    ``random.Random(seed).gauss`` floats, embedded as literals on BOTH
    engines (the seeded-constants-via-repr rule), so the scorer is
    replayable closed-form."""
    import random

    rng = random.Random(seed)
    return [rng.gauss(0.0, 1.0) for _ in range(dim)]


def fasttext_quality_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    n: int = 3,
    seed: int = 13,
    bias: float = 0.0,
) -> DataFrame:
    """Model-based document quality scoring, fastText-shaped (Joulin et
    al. 2016; the CCNet / LLaMA wiki-vs-crawl filter): hashed char
    ``n``-gram features — no vocabulary, no state — averaged into a
    linear logit and squashed to a [0,1] score.

    Engine shape: ONE pass over text at any corpus size, zero shuffles.
    The per-gram hash+lookup fold runs as an Arrow-vectorized pandas
    UDF over the PRE-LOWERED text column (r12 optimization round): the
    previous all-Catalyst higher-order fold was interpreted
    (CodegenFallback — lambdas never compile), and per-gram
    md5/conv/substring through the expression interpreter measured
    2.4× slower than CPython's C hashlib doing the identical byte
    math (9.0 s → 3.8 s at sf0.1, outputs byte-identical at every test
    scale — the guide-§4.2 "heavy per-row work belongs in vectorized
    native code" case).  Everything AROUND the fold stays Catalyst:
    lower(), the gram count, the logit/score/keep algebra — so the
    only Python-replicated semantics are codepoint slicing (== Spark
    substring), UTF-8 md5 (== Spark md5), 13-hex-digit prefix to int
    (== conv(…,16,10), 52 bits exact), and left-to-right float adds
    (IEEE-identical to the old F.aggregate order).  The weights are
    :func:`fasttext_weights` literals — swap in trained coefficients
    and nothing else moves.

    Float parity: contributions fold left-to-right in n-gram order
    (identical add order in CPython, the old Catalyst fold, and DuckDB
    ``list_sum``), then one divide by the n-gram count —
    bit-reproducible across engines; ``keep`` thresholds the LOGIT at
    0 (exact), not the sigmoid.  The sigmoid itself is the one
    transcendental (JVM exp and libm exp diverge in the last ULP on
    ~2% of inputs — measured), so ``score`` is emitted ROUNDED to 6 dp
    on both engines, the repo's discipline for non-arithmetic floats.

    Returns (id, n_grams, logit, score, keep); null/short texts score
    the bare bias (no n-gram evidence)."""
    if dim < 2:
        raise ValueError(f"dim must be >= 2 (got {dim})")
    if n < 1:
        raise ValueError(f"n must be >= 1 (got {n})")
    import hashlib

    import pandas as pd

    from pyspark.sql.functions import PandasUDFType

    w = fasttext_weights(dim, seed)

    # explicit SCALAR functionType: text.py runs under
    # `from __future__ import annotations`, so hint-based inference
    # would see unresolvable string annotations
    @F.pandas_udf("double", PandasUDFType.SCALAR)
    def _fold_tot(texts):
        out = []
        for t in texts:
            if t is None or len(t) < n:
                out.append(0.0)
                continue
            tot = 0.0
            for i in range(len(t) - n + 1):
                h = int(
                    hashlib.md5(
                        (t[i : i + n] + "#qs").encode("utf-8")
                    ).hexdigest()[:13],
                    16,
                )
                tot += w[h % dim]
            out.append(tot)
        return pd.Series(out, dtype="float64")

    base = df.select(F.col(id_col), F.lower(F.col(text_col)).alias("__t"))
    t = F.col("__t")
    sdf = base.select(
        F.col(id_col),
        F.coalesce(
            F.when(
                t.isNotNull() & (F.length(t) >= n), F.length(t) - (n - 1)
            ),
            F.lit(0),
        ).alias("n_grams"),
        _fold_tot(t).alias("__tot"),
    )
    logit = F.when(
        F.col("n_grams") > 0,
        F.lit(float(bias)) + F.col("__tot") / F.col("n_grams"),
    ).otherwise(F.lit(float(bias)))
    return sdf.select(
        F.col(id_col),
        F.col("n_grams"),
        logit.alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
        (logit >= 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# trained quality classifier: distributed batch-GD logistic regression


def lr_gram_features(
    df: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 32,
    n: int = 3,
) -> DataFrame:
    """Long-form hashed char-``n``-gram design matrix for the logistic
    trainer: one ``(id, y, slot, x)`` row per document × active hash
    slot, where ``x`` is the slot's n-gram count normalized by the
    document's n-gram total (the fastText mean-of-grams feature,
    :func:`fasttext_quality_score`'s shape), PLUS one ``slot 0, x=1``
    bias row per document — so the intercept trains and applies through
    the same aggregations as every other coordinate.

    Long-form is the 100 TB layout: ~``min(len, dim)`` rows per
    document, partitioned like the corpus, built by one explode + one
    keyed count (map-side combine) — the same shape feature_hash and the
    BPE vocab collapse already use.  No dense vectors ever materialize.
    """
    if dim < 2:
        raise ValueError(f"dim must be >= 2 (got {dim})")
    if n < 1:
        raise ValueError(f"n must be >= 1 (got {n})")
    base = df.select(
        F.col(id_col).alias("id"),
        label.cast("double").alias("y"),
        F.lower(F.col(text_col)).alias("__t"),
    )
    t = F.col("__t")
    ng = F.when(
        t.isNotNull() & (F.length(t) >= n), F.length(t) - (n - 1)
    ).otherwise(F.lit(0))
    staged = base.select("id", "y", "__t", ng.alias("ng"))
    # bias rows: every document, even gramless ones, trains the intercept
    bias_rows = staged.select(
        "id", "y", F.lit(0).cast("int").alias("slot"), F.lit(1.0).alias("x")
    )
    gram = (
        staged.where(F.col("ng") > 0)
        .select(
            "id",
            "y",
            "ng",
            "__t",
            F.explode(F.sequence(F.lit(1), F.col("ng"))).alias("i"),
        )
        .select(
            "id",
            "y",
            "ng",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("__t").substr(F.col("i"), F.lit(n)),
                                F.lit("#lr"),
                            )
                        ),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % dim
                + 1
            )
            .cast("int")
            .alias("slot"),
        )
        .groupBy("id", "y", "ng", "slot")
        .agg(F.count("*").alias("cnt"))
        .select("id", "y", "slot", (F.col("cnt") / F.col("ng")).alias("x"))
    )
    return bias_rows.unionByName(gram)


def lr_feature_stats(
    feat: DataFrame, n_docs: int
) -> tuple[dict[int, float], dict[int, float]]:
    """Per-slot population mean/std of the design matrix INCLUDING the
    implicit zeros of absent (doc, slot) pairs — ``sum(x)/N`` and
    ``sum(x²)/N − mu²`` over the long form, one keyed aggregation and a
    ``dim``-row collect.  Stats round to 6 dp (they become literals on
    both engines); a zero std maps to 1 so constant slots pass through
    unscaled."""
    import math

    from kevinlang_spark.operators.similarity import _round_half_up

    rows = (
        feat.where(F.col("slot") > 0)
        .groupBy("slot")
        .agg(F.sum("x").alias("sx"), F.sum(F.col("x") * F.col("x")).alias("sxx"))
        .collect()
    )
    mu: dict[int, float] = {}
    sd: dict[int, float] = {}
    for r in rows:
        m = _round_half_up(r["sx"] / n_docs, 6)
        mu[r["slot"]] = m
        s = _round_half_up(math.sqrt(max(r["sxx"] / n_docs - m * m, 0.0)), 6)
        sd[r["slot"]] = s if s > 0 else 1.0
    return mu, sd


def _lr_effective_weights(
    model: list[float], mu: dict[int, float], sd: dict[int, float]
) -> list[float]:
    """Fold z-score standardization into the model so the SPARSE design
    matrix applies it: for standardized features z = (x − mu)/sd the
    logit is Σ z_j·w_j + w0 = Σ_present x_j·(w_j/sd_j) + (w0 − K) with
    K = Σ_j (mu_j/sd_j)·w_j — the absent-pair contributions collapse
    into one constant, so centering never densifies the matrix."""
    dim = len(model) - 1
    k = sum(
        mu.get(j, 0.0) / sd.get(j, 1.0) * model[j] for j in range(1, dim + 1)
    )
    return [model[0] - k] + [
        model[j] / sd.get(j, 1.0) for j in range(1, dim + 1)
    ]


def _lr_probs(
    feat: DataFrame,
    model: list[float],
    mu: dict[int, float],
    sd: dict[int, float],
) -> DataFrame:
    """(id, y, p) with the standardization-folded model broadcast as a
    literal array — the per-document logit is ONE keyed aggregation
    because the bias participates as a feature row (slot 0, x = 1).
    The sigmoid is rounded to 6 dp on BOTH engines (JVM exp vs libm exp
    differ in the last ULP), which also locks every GD trajectory
    cross-engine."""
    v = _lr_effective_weights(model, mu, sd)
    vlit = F.array(*[F.lit(float(x)) for x in v])
    z = F.sum(F.col("x") * F.element_at(vlit, F.col("slot") + 1))
    return feat.groupBy("id", "y").agg(
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("p")
    )


def lr_train(
    feat: DataFrame,
    n_docs: int,
    dim: int = 64,
    steps: int = 6,
    lr: float = 2.0,
    checkpoint: bool = True,
) -> tuple[list[float], dict[int, float], dict[int, float]]:
    """Distributed batch-gradient-descent logistic regression over the
    long-form design matrix, with per-slot z-score standardization
    folded in sparsely (:func:`_lr_effective_weights`): the DRIVER holds
    the model (``dim + 1`` doubles — metadata-scale, like k-center's
    greedy seeds); each step is two keyed aggregations over the corpus
    (per-document logit, then the per-slot residual moment
    S_j = Σ r_i·x_ij / N, whose slot-0 row is the mean residual) and one
    ``dim + 1``-row collect.  The standardized gradient reconstructs
    driver-side as g_j = (S_j − mu_j·S_0)/sd_j, g_0 = S_0.  Weights
    round to 6 dp after every update (the repo's transcendental
    discipline), keeping the whole trajectory bit-reproducible
    cross-engine.

    This is the standard data-parallel LR shape at 100 TB: shuffle keys
    are ``id`` then ``slot`` (both with map-side partial sums), no
    all-pairs stage, model traffic is O(dim) per step.  Trains the
    quality/language gate that :func:`fasttext_quality_score` applies
    with fixed seeded weights.  Returns (model, mu, sd)."""
    from kevinlang_spark.operators.similarity import _round_half_up

    if checkpoint:
        feat = feat.localCheckpoint(eager=True)  # consumed 2× per step
    mu, sd = lr_feature_stats(feat, n_docs)
    model = [0.0] * (dim + 1)
    for _ in range(steps):
        probs = _lr_probs(feat, model, mu, sd)
        s = {
            r["slot"]: r["s"]
            for r in feat.join(probs.select("id", "p"), "id")
            .groupBy("slot")
            .agg(
                (
                    F.sum((F.col("p") - F.col("y")) * F.col("x"))
                    / F.lit(float(n_docs))
                ).alias("s")
            )
            .collect()
        }
        s0 = s.get(0, 0.0)
        model = [_round_half_up(model[0] - lr * s0, 6)] + [
            _round_half_up(
                model[j]
                - lr * ((s.get(j, 0.0) - mu.get(j, 0.0) * s0) / sd.get(j, 1.0)),
                6,
            )
            for j in range(1, dim + 1)
        ]
    return model, mu, sd


def lr_score(
    feat: DataFrame,
    model: list[float],
    mu: dict[int, float],
    sd: dict[int, float],
) -> DataFrame:
    """Apply a trained model to the design matrix: (id, label, prob,
    pred) — ``pred`` thresholds the ROUNDED probability so both engines
    compare identical doubles against 0.5."""
    return _lr_probs(feat, model, mu, sd).select(
        F.col("id"),
        (F.col("y") == 1.0).alias("label"),
        F.col("p").alias("prob"),
        (F.col("p") >= 0.5).alias("pred"),
    )


def classifier_eval(
    scored: DataFrame,
    label_col: str = "label",
    prob_col: str = "prob",
    pred_col: str = "pred",
) -> DataFrame:
    """One-row evaluation of a binary classifier: confusion counts at
    the prediction threshold, accuracy/precision/recall/F1, and ROC AUC
    by the rank-sum (Mann–Whitney) identity with AVERAGE ranks for
    tied probabilities.

    Scale shape: the confusion row is one aggregation; AUC groups by the
    (rounded) probability — a grid of at most 10^6+1 distinct values at
    6 dp, so the cumulative-rank window runs over a BOUNDED frame no
    matter the corpus size (the equidepth-boundary pattern), never over
    raw rows.  Rank sums stay exact in doubles (every addend is a
    multiple of 0.5 well inside 2^53), so AUC is bit-reproducible
    cross-engine with no rounding step."""
    from pyspark.sql import Window

    lab = F.col(label_col).cast("int")
    pred = F.col(pred_col).cast("int")
    conf = scored.agg(
        F.count("*").alias("n_docs"),
        F.sum(lab).alias("n_pos"),
        F.sum(((pred == 1) & (lab == 1)).cast("long")).alias("tp"),
        F.sum(((pred == 1) & (lab == 0)).cast("long")).alias("fp"),
        F.sum(((pred == 0) & (lab == 1)).cast("long")).alias("fn"),
        F.sum(((pred == 0) & (lab == 0)).cast("long")).alias("tn"),
    )
    by_p = scored.groupBy(prob_col).agg(
        F.count("*").alias("n"), F.sum(lab).alias("npos")
    )
    w = (
        Window.orderBy(prob_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # bounded frame (distinct 6-dp probs), so the global-order window is
    # the equidepth pattern, not a full-data sort
    ranks = by_p.select(
        (
            F.col("npos")
            * (
                F.coalesce(F.sum("n").over(w), F.lit(0)).cast("double")
                + (F.col("n") + 1) / F.lit(2.0)
            )
        ).alias("rsum")
    ).agg(F.sum("rsum").alias("rank_sum"))
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    npos = F.col("n_pos").cast("double")
    nneg = (F.col("n_docs") - F.col("n_pos")).cast("double")
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(tp + fn > 0, tp / (tp + fn))
    return conf.crossJoin(ranks).select(
        "n_docs",
        "n_pos",
        "tp",
        "fp",
        "fn",
        "tn",
        ((tp + tn) / F.col("n_docs")).alias("acc"),
        prec.alias("prec"),
        rec.alias("rec"),
        F.when(
            prec + rec > 0, F.lit(2.0) * prec * rec / (prec + rec)
        ).alias("f1"),
        F.when(
            (npos > 0) & (nneg > 0),
            (F.col("rank_sum") - npos * (npos + 1) / F.lit(2.0))
            / (npos * nneg),
        ).alias("auc"),
    )


def _fim_rewrite(t, sid, rate: float, mode: str, pre: str, suf: str, mid: str):
    """Shared FIM machinery: deterministic selection + cuts + the
    mode's reordering over text column ``t`` salted by string column
    ``sid``.  Returns (applied, rewritten) column pair."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("fim_transform: rate must be in [0, 1]")
    if mode not in ("psm", "spm"):
        raise ValueError(f"fim_transform: unknown mode {mode!r}")

    def h52(tag: str):
        return F.conv(
            F.substring(F.md5(F.concat(sid, F.lit(tag))), 1, 13), 16, 10
        ).cast("bigint")

    n = F.length(t)
    # exact-rate selection: compare the 52-bit hash against the scaled
    # threshold directly (ADVICE r10: '% 100 < round(rate*100)' silently
    # quantized rate=0.005 to 1% and 0.004 to 0%).  int(rate * 2**52)
    # is exact for rate in {0, 1} and within 2**-52 elsewhere.
    pick = h52("#fim") < int(rate * 2**52)
    c1 = h52("#fim1") % (n + 1)
    c2 = h52("#fim2") % (n + 1)
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    prefix = t.substr(F.lit(1), lo)
    suffix = t.substr(hi + 1, n - hi)
    middle = t.substr(lo + 1, hi - lo)
    if mode == "psm":
        rewritten = F.concat(
            F.lit(pre), prefix, F.lit(suf), suffix, F.lit(mid), middle
        )
    else:
        # SPM with PSM-style sentinels (arXiv:2207.14255 appendix D,
        # the variant production infilling models ship): suffix moves
        # before the prefix, prefix+middle stay contiguous so the
        # model's continuation is a plain left-to-right completion.
        rewritten = F.concat(
            F.lit(pre), F.lit(suf), suffix, F.lit(mid), prefix, middle
        )
    applied = pick & t.isNotNull() & (n > 0)
    return applied, rewritten


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rate: float = 0.5,
    pre: str = "<PRE>",
    suf: str = "<SUF>",
    mid: str = "<MID>",
    mode: str = "psm",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle" —
    arXiv:2207.14255): for a ``rate`` fraction of documents, pick two
    character cut points, and emit the reordered training string so an
    autoregressive model learns infilling; the rest pass through
    unchanged.  ``mode='psm'`` gives ``<PRE>prefix<SUF>suffix<MID>
    middle``; ``mode='spm'`` gives the suffix-first ordering
    ``<PRE><SUF>suffix<MID>prefix+middle`` (SPM with PSM sentinels,
    the paper's appendix-D variant) — §3 trains on BOTH orderings
    50/50, so a pipeline that can only emit PSM halves the recipe
    (VERDICT r10 item 5).

    Everything is DETERMINISTIC and engine-portable (the repo's no-
    rand() rule): selection and both cut points derive from 52-bit
    md5 prefixes of ``id || tag`` — the same md5 bridge every sampling
    oracle uses — so the transformation replays bit-identically across
    runs, partitionings, and engines.  Zero shuffle: one scan-stage
    projection of pure Catalyst expressions (substr/concat), no Python.

    Returns (id_col, fim_applied, text_out).  NULL or empty text passes
    through unapplied.  At 100 TB this is a map-only pass whose cost is
    the rewrite bandwidth itself.
    """
    t = F.col(text_col)
    applied, rewritten = _fim_rewrite(
        t, F.col(id_col).cast("string"), rate, mode, pre, suf, mid
    )
    return spread(df).select(
        F.col(id_col),
        applied.alias("fim_applied"),
        F.when(applied, rewritten).otherwise(t).alias("text_out"),
    )


def fim_transform_context(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 256,
    rate: float = 0.5,
    pre: str = "<PRE>",
    suf: str = "<SUF>",
    mid: str = "<MID>",
    mode: str = "psm",
) -> DataFrame:
    """CONTEXT-LEVEL fill-in-the-middle (arXiv:2207.14255 §3's
    context-level application, VERDICT r10 item 5): documents first
    split into fixed-size training contexts (``chunk_chars``
    characters), then FIM applies INDEPENDENTLY per context — both cut
    points land inside the chunk, never across a chunk boundary, which
    is the property document-level FIM loses once the packer slices
    the rewritten document (a ``<SUF>`` in one context with its
    ``<MID>`` in the next teaches nothing).

    Selection and cuts hash on ``id || '#' || chunk_idx``, so every
    chunk draws independently at the same exact ``rate``.  One
    map-side posexplode (sequence over ceil(n/chunk_chars)) + the same
    scan-stage rewrite — zero shuffle, zero Python; at 100 TB this is
    the packer's own pass with the rewrite fused in.

    Returns (id_col, chunk_idx, fim_applied, text_out), one row per
    context, chunk_idx 0-based."""
    if chunk_chars < 1:
        raise ValueError("fim_transform_context: chunk_chars must be >= 1")
    t = F.col(text_col)
    n = F.length(t)
    n_chunks = F.ceil(n / F.lit(chunk_chars)).cast("int")
    exploded = (
        spread(df)
        .where(t.isNotNull() & (n > 0))
        .select(
            F.col(id_col),
            t.alias("__t"),
            F.explode(
                F.sequence(F.lit(0), n_chunks - 1)
            ).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.col("__t")
            .substr(
                F.col("chunk_idx") * chunk_chars + 1, F.lit(chunk_chars)
            )
            .alias("__chunk"),
        )
    )
    sid = F.concat(
        F.col(id_col).cast("string"),
        F.lit("#"),
        F.col("chunk_idx").cast("string"),
    )
    applied, rewritten = _fim_rewrite(
        F.col("__chunk"), sid, rate, mode, pre, suf, mid
    )
    return exploded.select(
        F.col(id_col),
        "chunk_idx",
        applied.alias("fim_applied"),
        F.when(applied, rewritten).otherwise(F.col("__chunk")).alias(
            "text_out"
        ),
    )


def code_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Code-corpus curation statistics — The Stack / StarCoder's file
    filters (Kocetkov et al. 2022 §3, Li et al. 2023 §3.1) as ONE
    zero-shuffle Catalyst projection:

    - line-shape: ``n_lines``, ``max_line_len``, ``sum_line_len``
      (the max-line ≤ 1000 / avg-line ≤ 100 rules — emitted as exact
      INTEGERS so the gate math is engine-portable with no float
      rounding anywhere);
    - content: ``n_chars``, ``alnum_chars`` (the ≥ 25% alphanumeric
      rule, again integer form: 4·alnum ≥ n_chars);
    - ``license``: SPDX tag when present (``SPDX-License-Identifier:``,
      the machine-readable convention), else the common header
      spellings (MIT / Apache / GPL), else NULL;
    - ``autogen``: generated-file heuristic (auto-generated / DO NOT
      EDIT / generated by — files to drop from training sets);
    - ``passes``: the conjunction of the three Stack shape rules and
      NOT autogen.

    NULL text yields NULL stats (quarantine-by-null, the extractor
    convention).  At 100 TB this is a map-only scan whose cost is the
    regex bandwidth — no Python, no shuffle."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    lens = F.transform(lines, lambda ln: F.length(ln))
    n_lines = F.size(lines)
    max_line = F.array_max(lens)
    sum_line = F.aggregate(
        lens, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    n_chars = F.length(t)
    alnum = F.length(F.regexp_replace(t, "[^A-Za-z0-9]", ""))
    spdx = F.regexp_extract(
        t, r"SPDX-License-Identifier:\s*([A-Za-z0-9.+-]+)", 1
    )
    license_col = (
        F.when(spdx != "", spdx)
        .when(t.contains("MIT License"), F.lit("MIT"))
        .when(t.contains("Apache License"), F.lit("Apache-2.0"))
        .when(
            t.contains("GNU General Public License"), F.lit("GPL-3.0-or-later")
        )
        .otherwise(F.lit(None).cast("string"))
    )
    autogen = t.rlike(r"(?i)auto-?generated|do not edit|generated by")
    passes = (
        (max_line <= 1000)
        & (sum_line <= 100 * n_lines.cast("bigint"))
        & (4 * alnum >= n_chars)
        & ~autogen
    )
    return spread(df).select(
        F.col(id_col),
        F.when(t.isNotNull(), n_lines).alias("n_lines"),
        F.when(t.isNotNull(), max_line).alias("max_line_len"),
        F.when(t.isNotNull(), sum_line).alias("sum_line_len"),
        F.when(t.isNotNull(), n_chars).alias("n_chars"),
        F.when(t.isNotNull(), alnum).alias("alnum_chars"),
        license_col.alias("license"),
        F.when(t.isNotNull(), autogen).alias("autogen"),
        F.when(t.isNotNull(), passes).alias("passes"),
    )


def encoding_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encoding-damage audit — the UTF-8 hygiene gate real curation
    stacks run before anything else (CCNet drops mojibake pages; Dolma
    ships a fix-encoding pass): per document,

    - ``n_replacement``: U+FFFD replacement characters (a decoder
      already gave up once upstream);
    - ``n_mojibake``: classic double-encoded UTF-8 markers (the
      \u00c3-acute family, \u00e2\u0080-smart-quote family, and
      \u00c2+NBSP — Latin-1 reread as UTF-8), counted as an explicit
      literal alternation so both engines match the same sequences;
    - ``n_ctrl``: C0 control characters other than tab/newline/CR;
    - ``clean``: no replacement chars, no mojibake markers, and
      control characters <= 1% of the text (integer math — no float).

    Pure Catalyst counting expressions: zero shuffle, zero Python, NULL
    text -> NULL stats."""
    t = F.col(text_col)
    # cp1252-reread display forms (the common wild shape): C3+letter
    # acutes, E2 20AC 2122 / E2 20AC 0153 smart quotes, C2+NBSP
    moji = (
        "\u00c3\u00a9|\u00c3\u00a8|\u00c3\u00a4|\u00c3\u00b6|\u00c3\u00bc|"
        "\u00e2\u20ac\u2122|\u00e2\u20ac\u0153|\u00c2\u00a0"
    )
    n_chars = F.length(t)
    n_repl = F.regexp_count(t, F.lit("\ufffd"))
    n_moji = F.regexp_count(t, F.lit(moji))
    n_ctrl = F.regexp_count(
        t, F.lit("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]")
    )
    clean = (n_repl == 0) & (n_moji == 0) & (n_ctrl * 100 <= n_chars)
    return spread(df).select(
        F.col(id_col),
        F.when(t.isNotNull(), n_chars).alias("n_chars"),
        F.when(t.isNotNull(), n_repl).alias("n_replacement"),
        F.when(t.isNotNull(), n_moji).alias("n_mojibake"),
        F.when(t.isNotNull(), n_ctrl).alias("n_ctrl"),
        F.when(t.isNotNull(), clean).alias("clean"),
    )


def render_chat(
    df: DataFrame,
    turns: list,
    id_col: str = "doc_id",
    fmt: str = "chatml",
) -> DataFrame:
    """Chat-template rendering — the SFT-data assembly step that turns
    (role, content) columns into the exact training string a chat model
    consumes.  ``turns`` is an ordered list of (role, column_name);
    NULL-content turns are SKIPPED (not rendered empty), matching how
    template engines drop absent optional turns.

    Formats: ``chatml`` (``<|im_start|>role\ncontent<|im_end|>\n`` per
    turn — the OpenAI/Qwen wire form), ``alpaca``
    (``### Role:\ncontent\n\n``), and ``llama3`` (the Meta Llama-3
    header format: ``<|begin_of_text|>`` once at the front, then
    ``<|start_header_id|>role<|end_header_id|>\n\ncontent<|eot_id|>``
    per turn — the third wire format real SFT data ships in, VERDICT
    r10 item 6).  Deterministic string assembly in one zero-shuffle
    Catalyst projection — at 100 TB this is the map-only rewrite that
    feeds the tokenizer, and the rendered string must be
    byte-reproducible or train/eval disagree.

    Returns (id_col, rendered, n_turns, n_chars)."""
    if fmt not in ("chatml", "alpaca", "llama3"):
        raise ValueError(f"render_chat: unknown format {fmt!r}")
    if not turns:
        raise ValueError("render_chat: need at least one (role, column) turn")
    pieces = []
    counts = []
    for role, colname in turns:
        c = F.col(colname)
        if fmt == "chatml":
            rendered = F.concat(
                F.lit("<|im_start|>" + role + "\n"), c, F.lit("<|im_end|>\n")
            )
        elif fmt == "llama3":
            rendered = F.concat(
                F.lit("<|start_header_id|>" + role + "<|end_header_id|>\n\n"),
                c,
                F.lit("<|eot_id|>"),
            )
        else:
            rendered = F.concat(
                F.lit("### " + role.capitalize() + ":\n"), c, F.lit("\n\n")
            )
        pieces.append(F.when(c.isNotNull(), rendered).otherwise(F.lit("")))
        counts.append(c.isNotNull().cast("int"))
    out = F.concat(*pieces) if len(pieces) > 1 else pieces[0]
    if fmt == "llama3":
        out = F.concat(F.lit("<|begin_of_text|>"), out)
    n_turns = sum(counts[1:], counts[0]) if len(counts) > 1 else counts[0]
    return spread(df).select(
        F.col(id_col),
        out.alias("rendered"),
        n_turns.alias("n_turns"),
        F.length(out).alias("n_chars"),
    )


def chat_loss_spans(
    df: DataFrame,
    turns: list,
    id_col: str = "doc_id",
    train_roles: tuple = ("assistant",),
    fmt: str = "chatml",
) -> DataFrame:
    """Loss-mask spans for SFT training — the character offsets of the
    TRAINABLE turns' content inside :func:`render_chat`'s rendered
    string (``chatml`` or ``llama3`` — the two formats with
    unambiguous per-turn delimiters), so the tokenizer stage can zero
    the loss on every byte the model must not learn to produce
    (system/user turns).  Getting these offsets wrong is the classic
    silent SFT bug: the model trains on its own prompt.

    Offsets replicate the renderer's skip-NULL rule exactly: a skipped
    turn contributes zero length, shifting every later span; llama3's
    one-time ``<|begin_of_text|>`` prefix shifts every span by a
    constant.  Output is one row per trainable non-NULL turn —
    (id_col, turn_idx, role, start, end), 1-based inclusive character
    positions into the rendered string — flat rows so a relational
    oracle can replay the arithmetic.  Pure Catalyst length algebra:
    zero shuffle, zero Python."""
    if fmt not in ("chatml", "llama3"):
        raise ValueError(f"chat_loss_spans: unknown format {fmt!r}")
    if not turns:
        raise ValueError("chat_loss_spans: need at least one turn")
    offset = F.lit(len("<|begin_of_text|>") if fmt == "llama3" else 0)
    rows = []
    for i, (role, colname) in enumerate(turns):
        c = F.col(colname)
        if fmt == "chatml":
            header = len("<|im_start|>" + role + "\n")
            footer = len("<|im_end|>\n")
        else:
            header = len(
                "<|start_header_id|>" + role + "<|end_header_id|>\n\n"
            )
            footer = len("<|eot_id|>")
        piece_len = F.when(
            c.isNotNull(), F.length(c) + F.lit(header + footer)
        ).otherwise(F.lit(0))
        if role in train_roles:
            rows.append(
                F.when(
                    c.isNotNull(),
                    F.struct(
                        F.lit(i).alias("turn_idx"),
                        F.lit(role).alias("role"),
                        (offset + header + 1).cast("int").alias("start"),
                        (offset + header + F.length(c))
                        .cast("int")
                        .alias("end"),
                    ),
                )
            )
        offset = offset + piece_len
    if not rows:
        raise ValueError(
            "chat_loss_spans: no turn has a role in train_roles"
        )
    spans = F.filter(
        F.array(*rows), lambda x: x.isNotNull()
    )
    return (
        spread(df)
        .select(F.col(id_col), F.explode(spans).alias("s"))
        .select(
            id_col, "s.turn_idx", "s.role", "s.start", "s.end"
        )
    )


def bpe_encode_word_py(word: str, merges) -> "list[str]":
    """Driver-side replay of :func:`_apply_merge`'s left-to-right
    non-overlapping fold on ONE word — bit-identical to the Spark
    expression (the fold compares the accumulator's TRAILING token to
    ``a``, so a just-formed ``a+b`` never re-merges as ``a``).  Used to
    constant-fold the chat-template header/footer token counts in
    :func:`chat_token_spans`: headers are per-role constants, so
    encoding them driver-side keeps six scalar joins out of the plan —
    the same metadata-at-the-driver status as the merge table itself.
    pytest asserts this replay equals the Spark fold on shared
    vocabulary."""
    toks = list(word)
    for _, a, b, _ in sorted(merges):
        out: list[str] = []
        for tok in toks:
            if out and out[-1] == a and tok == b:
                out[-1] = a + b
            else:
                out.append(tok)
        toks = out
    return toks


def _nwords_const_py(s: str) -> int:
    """Plain word-token count of a CONSTANT string — the repo
    tokenizer's [a-z0-9]+ runs of the lowercased text (the
    ``unit='word'`` counterpart of :func:`_ntok_const_py`)."""
    import re as _re

    return sum(1 for w in _re.split("[^a-z0-9]+", s.lower()) if w)


def _ntok_const_py(s: str, merges) -> int:
    """BPE token count of a CONSTANT string under ``merges`` — the
    repo tokenizer ([a-z0-9]+ runs of the lowercased text) followed by
    the per-word merge replay."""
    import re as _re

    words = [w for w in _re.split("[^a-z0-9]+", s.lower()) if w]
    return sum(len(bpe_encode_word_py(w, merges)) for w in words)


def chat_token_spans(
    df: DataFrame,
    turns: list,
    merges: "list[tuple[int, str, str, int]] | None" = None,
    id_col: str = "doc_id",
    train_roles: tuple = ("assistant",),
    unit: str = "bpe",
) -> DataFrame:
    """TOKEN-space loss-mask spans for SFT training (VERDICT r10 item
    2): the [token_start, token_end] interval each trainable turn's
    content occupies in the BPE tokenization of :func:`render_chat`'s
    ChatML string — what a trainer actually consumes (char spans from
    :func:`chat_loss_spans` still need this mapping, and the offset-
    drift failure mode doubles at the token layer).

    Token indices are 1-based positions in the tokenized rendered
    string: the repo tokenizer's [a-z0-9]+ word runs, each word split
    into its subtokens under the TRAINED ``merges`` table (the
    q_bpe_encode path).  Because every ChatML piece boundary is
    non-alphanumeric (``<|``, ``\\n``), no word run spans a boundary,
    so the full string's token sequence is exactly the concatenation
    of the per-piece sequences — the span arithmetic is additive and
    replays closed-form in SQL.

    Scale shape (the 100 TB property): content token counts come from
    ONE union-explode of the turn columns joined to the vocabulary-
    scale word→n_subtokens map (:func:`bpe_encode_words` — the merge
    fold runs per DISTINCT word, never per occurrence), then one
    id-keyed aggregation; header/footer counts are per-role CONSTANTS
    encoded driver-side (:func:`bpe_encode_word_py`) and folded into
    the offset algebra as literals.  NULL-content turns are skipped
    exactly like the renderer (zero tokens, shifting later spans).

    Returns one row per trainable non-NULL turn: (id_col, turn_idx,
    role, token_start, token_end, n_tokens), inclusive 1-based; a
    content with no alphanumeric tokens emits n_tokens=0 with
    token_end = token_start - 1 (an honest empty interval).

    ``unit='word'`` measures spans in PLAIN tokenizer words (every
    [a-z0-9]+ run = one token, ``merges`` ignored) — the unit
    :func:`token_count` bills in, so word spans compose directly with
    word-budget packing (pack_sequences).  The word path needs no
    vocabulary join at all: it is one zero-shuffle projection."""
    from functools import reduce

    if unit not in ("bpe", "word"):
        raise ValueError(f"chat_token_spans: unknown unit {unit!r}")
    if unit == "bpe" and merges is None:
        raise ValueError("chat_token_spans: unit='bpe' needs a merge table")
    if not turns:
        raise ValueError("chat_token_spans: need at least one turn")
    if not any(role in train_roles for role, _ in turns):
        raise ValueError(
            "chat_token_spans: no turn has a role in train_roles"
        )
    base = spread(df)
    if unit == "word":
        joined = base

        def _nt(i: int, c):
            return F.coalesce(F.size(tokenize(c)), F.lit(0))

        header_n = [
            _nwords_const_py(f"<|im_start|>{role}\n") for role, _ in turns
        ]
        footer_n = _nwords_const_py("<|im_end|>\n")
    else:
        parts = []
        for i, (role, colname) in enumerate(turns):
            c = F.col(colname)
            parts.append(
                base.where(c.isNotNull()).select(
                    F.col(id_col).alias("__id"),
                    F.lit(i).alias("__ti"),
                    F.explode(tokenize(c)).alias("w"),
                )
            )
        toks = reduce(lambda a, b: a.unionByName(b), parts)
        vocab = bpe_encode_words(toks.select("w").distinct(), merges).select(
            "w", "n_subtokens"
        )
        wide = (
            toks.join(vocab, "w")
            .groupBy("__id")
            .agg(
                *[
                    F.sum(
                        F.when(F.col("__ti") == i, F.col("n_subtokens"))
                    ).alias(f"__nt{i}")
                    for i in range(len(turns))
                ]
            )
        )
        joined = base.join(
            wide, base[id_col] == wide["__id"], "left"
        ).drop("__id")

        def _nt(i: int, c):
            return F.coalesce(F.col(f"__nt{i}"), F.lit(0))

        header_n = [
            _ntok_const_py(f"<|im_start|>{role}\n", merges)
            for role, _ in turns
        ]
        footer_n = _ntok_const_py("<|im_end|>\n", merges)

    offset = F.lit(0)
    rows = []
    for i, (role, colname) in enumerate(turns):
        c = F.col(colname)
        nt = _nt(i, c)
        piece = F.when(
            c.isNotNull(), nt + F.lit(header_n[i] + footer_n)
        ).otherwise(F.lit(0))
        if role in train_roles:
            rows.append(
                F.when(
                    c.isNotNull(),
                    F.struct(
                        F.lit(i).alias("turn_idx"),
                        F.lit(role).alias("role"),
                        (offset + header_n[i] + 1)
                        .cast("int")
                        .alias("token_start"),
                        (offset + header_n[i] + nt)
                        .cast("int")
                        .alias("token_end"),
                        nt.cast("int").alias("n_tokens"),
                    ),
                )
            )
        offset = offset + piece
    spans = F.filter(F.array(*rows), lambda x: x.isNotNull())
    return (
        joined.select(F.col(id_col), F.explode(spans).alias("s"))
        .select(
            id_col,
            "s.turn_idx",
            "s.role",
            "s.token_start",
            "s.token_end",
            "s.n_tokens",
        )
    )


def span_corruption(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 20,
    sentinel: str = "<extra_id_{}>",
) -> DataFrame:
    """T5-style span-corruption denoising (Raffel et al. 2020, §3.1.4
    and §3.3.4 of the T5 paper; the R-denoiser of UL2, Tay et al.
    2022): replace two non-overlapping character spans with sentinel
    tokens and emit the (inputs, targets) pair an encoder-decoder (or
    prefix-LM) trains on —
    ``inputs  = pre <extra_id_0> gap <extra_id_1> tail``
    ``targets = <extra_id_0> span1 <extra_id_1> span2 <extra_id_2>``.

    Span placement is DETERMINISTIC (the repo's no-rand() rule): both
    starts and lengths derive from 52-bit md5 prefixes of ``id||tag``.
    Non-overlap holds by construction: span1 lives in the first half
    (start in [0, n/2 - len1]), span2 in the second (start in
    [n/2, n - len2]); lengths are 3 + h % 8 chars, the T5 mean-span-3
    regime.  Documents shorter than ``min_chars`` (or NULL) pass
    through with corrupted = false and inputs = the original text,
    targets NULL — quarantine by pass-through, the FIM convention.

    Zero shuffle, zero Python: one scan-stage projection of
    substr/concat.  Returns (id_col, corrupted, inputs, targets)."""
    # the non-overlap construction needs each half to hold a max-length
    # span (3 + 7 chars): with min_chars < 20 the modulus half - len1 + 1
    # can be <= 0, silently yielding null/overlapping spans (ADVICE r11)
    if min_chars < 20:
        raise ValueError(
            "span_corruption needs min_chars >= 20 (2 x the 10-char max "
            f"span) for the non-overlap construction; got {min_chars}"
        )
    t = F.col(text_col)
    sid = F.col(id_col).cast("string")

    def h52(tag: str):
        return F.conv(
            F.substring(F.md5(F.concat(sid, F.lit(tag))), 1, 13), 16, 10
        ).cast("bigint")

    n = F.length(t)
    half = F.floor(n / 2).cast("bigint")
    len1 = (h52("#sc1l") % 8) + 3
    len2 = (h52("#sc2l") % 8) + 3
    s1 = h52("#sc1s") % (half - len1 + 1)  # 0-based start, first half
    s2 = half + (h52("#sc2s") % (n - half - len2 + 1))  # second half
    s0, s1_, s2_ = (
        F.lit(sentinel.format(0)),
        F.lit(sentinel.format(1)),
        F.lit(sentinel.format(2)),
    )
    inputs = F.concat(
        t.substr(F.lit(1), s1), s0,
        t.substr(s1 + len1 + 1, s2 - s1 - len1), s1_,
        t.substr(s2 + len2 + 1, n - s2 - len2),
    )
    targets = F.concat(
        s0, t.substr(s1 + 1, len1), s1_, t.substr(s2 + 1, len2), s2_
    )
    ok = t.isNotNull() & (n >= min_chars)
    return spread(df).select(
        F.col(id_col),
        ok.alias("corrupted"),
        F.when(ok, inputs).otherwise(t).alias("inputs"),
        F.when(ok, targets).alias("targets"),
    )


def packing_report(
    df: DataFrame,
    id_col: str = "doc_id",
    ntok_col: str = "n_tokens",
    max_tokens: int = 512,
    part_cols: "tuple[str, ...]" = ("source",),
    n_shards: int = 4,
) -> DataFrame:
    """Packing-efficiency report per (part_cols, shard) stream: how
    many training sequences concat-and-split packing produces, the
    fill ratio of the LAST (ragged) sequence, and what plain
    one-doc-per-sequence padding would have wasted instead — the
    numbers a pipeline owner reads before buying compute.  Exact
    integer math: total tokens T → ceil(T / max) sequences, tail fill
    = T - (ceil-1)·max; pad-per-doc waste = Σ (max - n_tok mod max
    complement) for the truncate-or-pad baseline (docs longer than
    ``max_tokens`` count their overflow as truncation loss).

    ONE keyed aggregation (map-side combinable sums) — no window, no
    per-sequence explode: every output is a closed form of the
    stream's token total and per-doc counts.  Returns (*part_cols,
    shard, n_docs, total_tokens, n_sequences, tail_fill_ratio,
    padded_waste_tokens, truncated_tokens)."""
    ntok = F.col(ntok_col).cast("bigint")
    base = df.select(
        *[F.col(c) for c in part_cols],
        (F.col(id_col) % n_shards).alias("shard"),
        ntok.alias("n"),
    )
    agg = base.groupBy(*part_cols, "shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("total_tokens"),
        # pad waste: short docs pad up to the budget; long docs fill
        # floor(n/max) full sequences then pad the remainder
        F.sum(
            F.when(
                F.col("n") % max_tokens == 0, F.lit(0)
            ).otherwise(max_tokens - F.col("n") % max_tokens)
        ).alias("padded_waste_tokens"),
        F.sum(
            F.when(F.col("n") > max_tokens, F.col("n") - max_tokens)
            .otherwise(F.lit(0))
        ).alias("truncated_tokens"),
    )
    n_seq = F.ceil(F.col("total_tokens") / F.lit(max_tokens)).cast("bigint")
    tail = F.col("total_tokens") - (n_seq - 1) * max_tokens
    return agg.select(
        *part_cols,
        "shard",
        "n_docs",
        "total_tokens",
        n_seq.alias("n_sequences"),
        # raw double, NOT rounded: total/2^k is exactly dyadic, and a
        # dyadic value can sit exactly on a half-way decimal boundary
        # where Spark and DuckDB round differently (verify-skill rule);
        # the checker rounds both sides identically in Python
        (tail / F.lit(float(max_tokens))).alias("tail_fill_ratio"),
        "padded_waste_tokens",
        "truncated_tokens",
    )


def bpe_fertility(
    df: DataFrame,
    merges: "list[tuple[int, str, str, int]]",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Tokenizer FERTILITY per corpus slice — BPE tokens per word and
    characters per token under a trained merge table, the standard
    tokenizer-efficiency metric (how many tokens a tokenizer spends
    per unit of text varies 2-4x across languages/domains, and the
    training budget bills in tokens).  A data-mixing recipe reads this
    per source before fixing sampling weights.

    Same vocabulary-scale shape as :func:`bpe_token_counts`: one
    corpus explode, the merge fold runs once per DISTINCT word, one
    word-keyed join, one group aggregation.  Ratios ship as raw
    doubles (identical FP ops on both engines; the checker rounds both
    sides identically).

    Returns (group_col, n_words, n_bpe_tokens, n_chars, fertility,
    chars_per_token)."""
    toks = spread(df.where(F.col(text_col).isNotNull())).select(
        F.col(group_col), F.explode(tokenize(F.col(text_col))).alias("w")
    )
    vocab = bpe_encode_words(toks.select("w").distinct(), merges).select(
        "w", "n_subtokens"
    )
    agg = (
        toks.join(vocab, "w")
        .groupBy(group_col)
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_subtokens").cast("bigint").alias("n_bpe_tokens"),
            F.sum(F.length("w")).cast("bigint").alias("n_chars"),
        )
    )
    return agg.select(
        group_col,
        "n_words",
        "n_bpe_tokens",
        "n_chars",
        (F.col("n_bpe_tokens") / F.col("n_words")).alias("fertility"),
        (F.col("n_chars") / F.col("n_bpe_tokens")).alias("chars_per_token"),
    )


def length_bucket_batches(
    df: DataFrame,
    ntok_col: str = "n_tokens",
    token_budget: int = 4096,
) -> DataFrame:
    """Length-bucketed batch planning — the dynamic-batching census a
    trainer uses instead of fixed batch sizes: documents group into
    power-of-two length buckets (bucket = ceil(log2(n)), padding only
    up to the bucket ceiling instead of a global max), each bucket
    batches ``token_budget // ceiling`` sequences, and the report says
    how many batches and how much bucket-ceiling padding each bucket
    costs.  Variable-length corpora waste 30-60% of compute under
    global-max padding; this is the standard fix.

    ONE map-side-combinable aggregation — bucket assignment is a
    scan-stage expression in INTEGER math: ceil(log2(n)) =
    bit_length(n-1) = length(bin(n-1)) for n >= 2 (ADVICE r11: Spark's
    LOG2 is ln(x)/ln(2), which returns 29.000000000000004 at n = 2^29,
    so a float ceil over-buckets exact powers of two >= 2^29 while
    DuckDB's true log2 does not — integer bit-length replays
    identically on both engines at every n).  Docs with n_tokens < 1
    are dropped (nothing to batch).

    Returns (bucket, max_len, n_docs, total_tokens, batch_size,
    n_batches, pad_waste_tokens)."""
    n = F.col(ntok_col).cast("bigint")
    bucket = F.when(n <= 1, F.lit(0)).otherwise(
        F.length(F.bin(n - 1))
    ).cast("int")
    base = df.where(n >= 1).select(n.alias("__n"), bucket.alias("bucket"))
    max_len = F.pow(F.lit(2.0), F.col("bucket")).cast("bigint")
    agg = base.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("__n").alias("total_tokens"),
    )
    # explicit floor (not a bare cast): Spark's double->bigint cast
    # truncates while DuckDB's ROUNDS — floor on both sides is the
    # engine-portable form
    bs = F.greatest(
        F.floor(F.lit(token_budget) / max_len).cast("bigint"), F.lit(1)
    )
    return agg.select(
        "bucket",
        max_len.alias("max_len"),
        "n_docs",
        "total_tokens",
        bs.alias("batch_size"),
        F.ceil(F.col("n_docs") / bs).cast("bigint").alias("n_batches"),
        (F.col("n_docs") * max_len - F.col("total_tokens")).alias(
            "pad_waste_tokens"
        ),
    )


def quality_retention_curve(
    df: DataFrame,
    score_col: str = "score",
    ntok_col: str = "n_tokens",
    n_bins: int = 10,
    quantize: "float | None" = 1e-4,
) -> DataFrame:
    """Quality-vs-quantity retention curve — for "keep the top X% by
    quality score" decisions: documents rank by (score desc), rank
    space cuts into ``n_bins`` equal-population bins, and each bin
    reports its document count, token mass, and the CUMULATIVE token
    mass down to it (the token budget you keep at each retention
    cut).  The report a curation owner reads next to the classifier's
    calibration before fixing the threshold.

    Scale shape (the equidepth pattern): the corpus first collapses to
    the per-SCORE grid (one keyed agg), the cumulative walk runs over
    that bounded grid, and a score-group's bin is decided by its first
    rank — floor(cum_docs_before * n_bins / N), all integer math, so
    ties never straddle engines differently.  No per-document global
    sort anywhere.

    The grid bound is now a GUARD, not an assumption (VERDICT r11):
    ``quantize`` (default 1e-4) buckets scores to floor(score /
    quantize) before grouping, so a raw continuous double score
    collapses to at most range/quantize grid cells instead of
    degenerating to one cell per document — which would put the whole
    corpus through the single-partition cumulative window.  Bucketing
    by a positive constant is monotone, so already-discrete scores
    spaced >= quantize apart group and bin identically (the oracle
    replays raw integer scores unchanged).  Pass ``quantize=None``
    ONLY when the score column is already discrete — the caller then
    owns the grid bound.

    Returns (bin, n_docs, total_tokens, cum_tokens), bin 0 = best."""
    from pyspark.sql import Window

    if quantize is not None and not quantize > 0:
        raise ValueError(f"quantize must be positive or None, got {quantize}")
    s = F.col(score_col)
    key = (
        F.floor(s / F.lit(float(quantize))).cast("bigint")
        if quantize is not None
        else s
    )
    g = (
        df.where(s.isNotNull())
        .groupBy(key.alias("s"))
        .agg(
            F.count("*").alias("nd"),
            F.sum(F.col(ntok_col).cast("bigint")).alias("nt"),
        )
    )
    # bounded-grid cumulative walk (score grid, not corpus rows)
    w = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = g.select(
        "s", "nd", "nt",
        (F.sum("nd").over(w) - F.col("nd")).alias("before"),
    )
    total = cum.agg(
        F.sum("nd").alias("N")
    )
    binned = cum.join(F.broadcast(total)).select(
        (F.col("before") * n_bins / F.col("N"))
        .cast("bigint")
        .alias("bin"),
        "nd",
        "nt",
    )
    agg = binned.groupBy("bin").agg(
        F.sum("nd").alias("n_docs"), F.sum("nt").alias("total_tokens")
    )
    w2 = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return agg.select(
        "bin",
        "n_docs",
        "total_tokens",
        F.sum("total_tokens").over(w2).alias("cum_tokens"),
    )


def conversation_paths(
    df: DataFrame,
    conv_col: str = "conv_id",
    msg_col: str = "msg_id",
    parent_col: str = "parent_id",
    role_col: str = "role",
    max_depth: int = 64,
    text_col: "str | None" = None,
) -> DataFrame:
    """Conversation-tree flattening (the OASST / ShareGPT data shape —
    Köpf et al. 2023, arXiv:2304.07327: crowd-sourced chat data arrives
    as MESSAGE TREES where each prompt has several replies, and SFT
    consumes root-to-leaf PATHS as linear conversations): for every
    leaf message, walk the parent pointers up to the root and emit the
    linearized thread.

    Shape: ONE conversation-keyed aggregation collects the (msg,
    parent, role) structs, then every leaf's upward walk runs IN-ROW
    as a fold over ``sequence(1, max_depth)`` — conversations are
    bounded (OASST trees: tens of messages), so per-row work is
    O(leaves × depth × msgs) on a small constant, with no iterative
    joins and no driver loop.  A walk that hasn't reached a root
    within ``max_depth`` hops (cycle, orphaned parent, or truncated
    export) reports is_complete = false instead of looping or
    erroring — quarantine by annotation, the FIM convention.  A pure
    cycle with no leaf (every message is some message's parent) emits
    no rows at all: there is no leaf to anchor a thread.

    Returns (conv_col, leaf_id, depth, path, roles, is_complete):
    path/roles are the root→leaf message ids / roles joined by '>'
    (strings, so the driver hash sees a stable scalar encoding);
    depth = messages on the path.  With ``text_col`` set, a
    ``rendered`` column adds the ChatML linearization of the thread
    (byte-identical grammar to :func:`render_chat` fmt='chatml');
    NULL-content messages are skipped in the rendering — the
    render_chat convention — but keep their place on the path."""
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    msgs = df.where(
        F.col(msg_col).isNotNull()
    ).groupBy(conv_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(msg_col).cast("bigint").alias("id"),
                    F.col(parent_col).cast("bigint").alias("pid"),
                    F.col(role_col).cast("string").alias("role"),
                    *(
                        [F.col(text_col).cast("string").alias("t")]
                        if text_col is not None
                        else []
                    ),
                )
            )
        ).alias("ms")
    )
    ms = F.col("ms")
    # root parents are NULL: strip them before the containment test or
    # array_contains returns NULL (three-valued logic) and every
    # candidate leaf silently drops
    parent_ids = F.filter(
        F.transform(ms, lambda m: m["pid"]), lambda p: p.isNotNull()
    )
    leaves = F.filter(
        ms, lambda m: ~F.array_contains(parent_ids, m["id"])
    )
    staged = msgs.select(conv_col, "ms", leaves.alias("__leaves"))

    def walk(leaf):
        """Fold max_depth steps: prepend the parent of the chain head
        until a root (pid NULL) or a dangling/cyclic pointer."""
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(max_depth)),
            F.array(leaf),
            lambda chain, _i: F.when(
                F.element_at(chain, 1)["pid"].isNull(), chain
            ).otherwise(
                F.concat(
                    F.slice(
                        F.filter(
                            F.col("ms"),
                            lambda m: m["id"]
                            == F.element_at(chain, 1)["pid"],
                        ),
                        1,
                        1,
                    ),
                    chain,
                )
            ),
        )

    out = staged.select(
        conv_col, "ms", F.explode("__leaves").alias("leaf")
    ).select(
        conv_col,
        F.col("leaf.id").alias("leaf_id"),
        walk(F.col("leaf")).alias("__chain"),
    )
    chain = F.col("__chain")
    cols = [
        conv_col,
        F.col("leaf_id"),
        F.size(chain).alias("depth"),
        F.array_join(
            F.transform(chain, lambda m: m["id"].cast("string")), ">"
        ).alias("path"),
        F.array_join(
            F.transform(chain, lambda m: m["role"]), ">"
        ).alias("roles"),
        F.element_at(chain, 1)["pid"].isNull().alias("is_complete"),
    ]
    if text_col is not None:
        cols.append(
            F.aggregate(
                chain,
                F.lit(""),
                lambda acc, m: F.when(m["t"].isNull(), acc).otherwise(
                    F.concat(
                        acc,
                        F.lit("<|im_start|>"), m["role"], F.lit("\n"),
                        m["t"], F.lit("<|im_end|>\n"),
                    )
                ),
            ).alias("rendered")
        )
    return out.select(*cols)


def _powerlaw_ols(pts: Column) -> "dict[str, Column]":
    """Closed-form OLS over an array<struct<x double, y double>> column
    — five LEFT folds in array order (deterministic accumulation:
    callers sort the points), then slope / intercept / r² with FIXED
    parenthesization so both engines replay identical IEEE ops.
    Degenerate inputs (n < 2 or zero x-variance) yield NULL fits; zero
    y-variance yields NULL r² (a flat line has no explained variance
    to ratio)."""

    def fold(f):
        return F.aggregate(pts, F.lit(0.0), lambda acc, p: acc + f(p))

    n = F.size(pts).cast("double")
    sx = fold(lambda p: p["x"])
    sy = fold(lambda p: p["y"])
    sxy = fold(lambda p: p["x"] * p["y"])
    sxx = fold(lambda p: p["x"] * p["x"])
    syy = fold(lambda p: p["y"] * p["y"])
    cov_n = n * sxy - sx * sy
    vx_n = n * sxx - sx * sx
    vy_n = n * syy - sy * sy
    slope = F.when(vx_n > 0, cov_n / vx_n)
    return {
        "n": F.size(pts).cast("bigint"),
        "slope": slope,
        "intercept": F.when(vx_n > 0, (sy - slope * sx) / n),
        "r2": F.when(
            (vx_n > 0) & (vy_n > 0), (cov_n * cov_n) / (vx_n * vy_n)
        ),
    }


def zipf_fit(
    df: DataFrame, text_col: str = "text", top_k: int = 500
) -> DataFrame:
    """Zipf's-law fit over the corpus word-frequency spectrum — the
    power-law slope of log(freq) on log(rank) across the ``top_k``
    most frequent words (Zipf 1949; natural corpora run slope ≈ −1).
    The standard corpus-health diagnostic: a slope far from −1 or a
    low r² flags templated / machine-generated / deduplication-damaged
    text before it poisons a training mix (Kudugunta et al. 2023's
    MADLAD-400 audit reads exactly this spectrum per language).

    Shape: one corpus explode → word-keyed count (the wordcount
    shuffle), then ``orderBy(freq desc, word).limit(k)`` — which Spark
    executes as TakeOrderedAndProject: each partition keeps its own
    top-k and the driver merges k-sized heaps, so the global sort is
    O(partitions × k), never a full vocab sort.  The k survivors
    collapse to ONE row where rank assignment and the OLS fit run
    IN-ROW over the sorted bounded array (left folds, fixed
    parenthesization — the DuckDB oracle replays bit-for-bit); corpus
    totals ride the reviewed 1-row scalar crossJoin.

    Returns ONE row: (total_tokens, vocab_size, n_top, zipf_slope,
    zipf_intercept, zipf_r2)."""
    toks = spread(df.where(F.col(text_col).isNotNull())).select(
        F.explode(tokenize(F.col(text_col))).alias("w")
    )
    wc = toks.groupBy("w").agg(F.count("*").cast("bigint").alias("freq"))
    tot = wc.agg(
        F.sum("freq").cast("bigint").alias("total_tokens"),
        F.count("*").cast("bigint").alias("vocab_size"),
    )
    top = wc.orderBy(F.desc("freq"), F.asc("w")).limit(top_k)
    arr = top.agg(
        F.array_sort(
            F.collect_list(
                F.struct((-F.col("freq")).alias("nf"), F.col("w").alias("w"))
            )
        ).alias("a")
    )
    # rank i+1 in sorted (freq desc, word asc) order; materialize the
    # points array in its own projection (interpreted-lambda rule)
    staged = arr.select(
        F.transform(
            F.col("a"),
            lambda e, i: F.struct(
                F.log((i + 1).cast("double")).alias("x"),
                F.log((-e["nf"]).cast("double")).alias("y"),
            ),
        ).alias("pts")
    )
    ols = _powerlaw_ols(F.col("pts"))
    fit = staged.select(
        ols["n"].alias("n_top"),
        ols["slope"].alias("zipf_slope"),
        ols["intercept"].alias("zipf_intercept"),
        ols["r2"].alias("zipf_r2"),
    )
    return tot.crossJoin(fit).select(
        "total_tokens", "vocab_size", "n_top",
        "zipf_slope", "zipf_intercept", "zipf_r2",
    )


def heaps_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> DataFrame:
    """Heaps'-law fit of vocabulary growth — V(n) ≈ K·n^β over the
    corpus read in ``id_col`` order (Heaps 1978; English corpora run
    β ≈ 0.4–0.6).  The companion diagnostic to :func:`zipf_fit`: a β
    collapsing toward 0 means the tail of the corpus adds no new
    vocabulary (crawl exhaustion / duplication), β near 1 flags
    id-like token noise minting unbounded vocabulary.

    Shape: the growth curve is sampled at ``n_buckets`` checkpoints of
    the id range, so NOTHING here is a global ordered walk: per-doc
    token counts and per-word FIRST-occurrence ids (one wordcount-style
    min-agg) each bucket by integer math against the broadcast 1-row
    (min, max) id bounds — the reviewed scalar-crossJoin pattern — and
    collapse to ≤ n_buckets rows.  The cumulative curve and the
    log-log OLS fit then run IN-ROW over the sorted bounded bucket
    array (O(n_buckets²) slice-folds on ONE row), deterministic
    accumulation order, DuckDB-replayable bit-for-bit.

    Returns ONE row: (total_tokens, vocab_size, n_points, heaps_beta,
    heaps_k, heaps_r2); heaps_k = exp(intercept)."""
    docs = (
        spread(
            df.where(
                F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
            )
        )
        .select(
            F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("ws")
        )
        # two consumers (token counts + first occurrences) diverge in
        # the scan stage — materialize once or the regex tokenize runs
        # per leg (the loop-invariant rule)
        .localCheckpoint(eager=True)
    )
    nt = docs.select("id", F.size("ws").cast("bigint").alias("n_tok"))
    bounds = nt.agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
    fo = (
        docs.select("id", F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.min("id").alias("fd"))
    )
    # integer bucket math (div floors like DuckDB // on nonnegative ids)
    tbucket = F.expr(f"((id - lo) * {int(n_buckets)}) div (hi - lo + 1)")
    vbucket = F.expr(f"((fd - lo) * {int(n_buckets)}) div (hi - lo + 1)")
    tb = (
        nt.crossJoin(bounds)
        .groupBy(tbucket.alias("b"))
        .agg(F.sum("n_tok").alias("t"))
    )
    vb = (
        fo.crossJoin(bounds)
        .groupBy(vbucket.alias("b"))
        .agg(F.count("*").cast("bigint").alias("v"))
    )
    j = tb.join(vb, "b", "full_outer").select(
        "b",
        F.coalesce(F.col("t"), F.lit(0).cast("bigint")).alias("t"),
        F.coalesce(F.col("v"), F.lit(0).cast("bigint")).alias("v"),
    )
    arr = j.agg(
        F.array_sort(F.collect_list(F.struct("b", "t", "v"))).alias("a")
    )
    a = F.col("a")
    cums = F.transform(
        a,
        lambda e, i: F.struct(
            F.aggregate(
                F.slice(a, F.lit(1), i + 1),
                F.lit(0).cast("bigint"),
                lambda acc, p: acc + p["t"],
            ).alias("ct"),
            F.aggregate(
                F.slice(a, F.lit(1), i + 1),
                F.lit(0).cast("bigint"),
                lambda acc, p: acc + p["v"],
            ).alias("cv"),
        ),
    )
    staged = arr.select(cums.alias("cums"))
    pts = F.transform(
        F.filter(F.col("cums"), lambda c: (c["ct"] > 0) & (c["cv"] > 0)),
        lambda c: F.struct(
            F.log(c["ct"].cast("double")).alias("x"),
            F.log(c["cv"].cast("double")).alias("y"),
        ),
    )
    staged2 = staged.select(
        F.element_at(F.col("cums"), -1)["ct"].alias("total_tokens"),
        F.element_at(F.col("cums"), -1)["cv"].alias("vocab_size"),
        pts.alias("pts"),
    )
    ols = _powerlaw_ols(F.col("pts"))
    return staged2.select(
        "total_tokens",
        "vocab_size",
        ols["n"].alias("n_points"),
        ols["slope"].alias("heaps_beta"),
        F.exp(ols["intercept"]).alias("heaps_k"),
        ols["r2"].alias("heaps_r2"),
    )


#: Unicode script classes for :func:`script_census` — (name, regex
#: character class).  Each class is a literal codepoint range written
#: with the ACTUAL characters (not engine-specific \u escapes), so the
#: same pattern string drives both Spark's Java regex and the DuckDB
#: oracle's RE2 — no transcription between syntaxes can drift.
SCRIPT_CLASSES: "list[tuple[str, str]]" = [
    ("latin", "[A-Za-z]"),
    ("digit", "[0-9]"),
    ("space", "[ \t\n\r]"),
    ("latin_ext", "[À-ɏ]"),
    ("cjk", "[一-鿿]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[Ͱ-Ͽ]"),
    ("arabic", "[؀-ۿ]"),
]


def script_census(
    df: DataFrame, text_col: str = "text", group_col: str = "lang"
) -> DataFrame:
    """Unicode script mix per corpus slice — the curation census every
    multilingual pipeline reads before fixing language weights
    (MADLAD-400's audit, arXiv:2309.04662 §2, found whole "languages"
    that were one script of noise): per group, total chars and the
    char count in each of :data:`SCRIPT_CLASSES` (Latin, digits,
    whitespace, Latin-extended, CJK, Cyrillic, Greek, Arabic) plus the
    uncovered remainder, with Latin/CJK/other fractions.

    Per-doc counting is ``length(t) - length(regexp_replace(t, class,
    ''))`` — one scan-stage regex pass per class, zero shuffle; the
    group census is ONE aggregation of BIGINT-exact sums, and every
    fraction derives from those sums with one division.  Codepoint
    counting is identical on both engines (Spark ``length`` and DuckDB
    ``length`` both count codepoints).

    Returns (group_col, n_docs, n_chars, <one count per class>, other,
    frac_latin, frac_cjk, frac_other)."""
    t = F.col(text_col)
    clean = df.where(t.isNotNull())
    counts = [
        (
            F.length(t) - F.length(F.regexp_replace(t, pat, ""))
        ).cast("bigint").alias(name)
        for name, pat in SCRIPT_CLASSES
    ]
    staged = clean.select(
        F.col(group_col), F.length(t).cast("bigint").alias("__nc"), *counts
    )
    aggs = [F.sum(name).alias(name) for name, _ in SCRIPT_CLASSES]
    g = staged.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("__nc").alias("n_chars"),
        *aggs,
    )
    covered = None
    for name, _ in SCRIPT_CLASSES:
        covered = F.col(name) if covered is None else covered + F.col(name)
    nc = F.col("n_chars")
    out = g.select(
        group_col,
        "n_docs",
        "n_chars",
        *[name for name, _ in SCRIPT_CLASSES],
        (nc - covered).alias("other"),
    )
    return out.select(
        "*",
        F.when(nc > 0, F.col("latin") / nc).alias("frac_latin"),
        F.when(nc > 0, F.col("cjk") / nc).alias("frac_cjk"),
        F.when(nc > 0, F.col("other") / nc).alias("frac_other"),
    )


def _word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams; documents shorter than n words yield
    an EMPTY array (standard MT-metric convention: no n-gram, no
    contribution to either numerator or denominator).  The sequence is
    guarded — Spark's sequence(1, 0) would count DOWN, not return
    empty."""
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def rouge_n(
    df: DataFrame,
    id_col: str = "doc_id",
    cand_col: str = "candidate",
    ref_col: str = "reference",
    n: int = 2,
) -> DataFrame:
    """ROUGE-n per (candidate, reference) pair (Lin 2004): clipped
    n-gram overlap with precision, recall, and F1 — the standard
    summarization/eval-tier metric next to pass@k and win rates.

    Shape (r13): both sides explode in ONE tagged pass to a single
    (id, gram)-keyed count carrying per-side sums, then one (id)-keyed
    agg — 2 Exchanges total, one scan; per-pair totals and the clipped
    overlap are INTEGER sums (min of counts), so the only doubles are
    the three final divisions.  Scales like any wordcount: no per-pair
    state beyond the keyed aggregations.

    Returns (id_col, cand_ngrams, ref_ngrams, overlap, precision,
    recall, f1); pairs where either side has no n-gram report 0
    totals and NULL ratios."""
    if n < 1:
        raise ValueError(f"n must be >= 1 (got {n}")
    base = spread(
        df.where(F.col(cand_col).isNotNull() & F.col(ref_col).isNotNull())
    ).select(
        F.col(id_col).alias("id"),
        _word_ngrams(tokenize(F.col(cand_col)), n).alias("cg"),
        _word_ngrams(tokenize(F.col(ref_col)), n).alias("rg"),
    )
    # ONE tagged-union explode + two keyed aggs replaces the r12 shape
    # (2 per-side gram aggs + full-outer join + id-spine left join — 4
    # Exchanges, an eager checkpoint, 3 scans): every gram lands as a
    # struct tagged with per-side increments, plus ONE null-gram spine
    # entry per pair so pairs where BOTH sides have zero n-grams still
    # reach the per-id agg (their zero sums replay the old coalesced
    # spine join exactly).  Clipping is unchanged: a gram on one side
    # only sums 0 on the other, so least(cc, rc) = 0 — identical to
    # the inner contribution of the old full-outer join.  All three
    # per-id totals stay INTEGER sums — byte-identical output.
    one, zero = F.lit(1), F.lit(0)
    entry = lambda g, c, r: F.struct(  # noqa: E731
        g.alias("g"), c.alias("c"), r.alias("r")
    )
    tagged = base.select(
        "id",
        F.explode(
            F.concat(
                F.transform(F.col("cg"), lambda g: entry(g, one, zero)),
                F.transform(F.col("rg"), lambda g: entry(g, zero, one)),
                F.array(
                    entry(F.lit(None).cast("string"), zero, zero)
                ),
            )
        ).alias("e"),
    )
    per_gram = tagged.groupBy("id", F.col("e.g").alias("g")).agg(
        F.sum(F.col("e.c")).cast("bigint").alias("cc"),
        F.sum(F.col("e.r")).cast("bigint").alias("rc"),
    )
    joined = per_gram.groupBy("id").agg(
        F.sum("cc").alias("cand_ngrams"),
        F.sum("rc").alias("ref_ngrams"),
        F.sum(F.least(F.col("cc"), F.col("rc"))).alias("overlap"),
    )
    o = F.col("overlap")
    p = F.when(F.col("cand_ngrams") > 0, o / F.col("cand_ngrams"))
    r = F.when(F.col("ref_ngrams") > 0, o / F.col("ref_ngrams"))
    return joined.select(
        F.col("id").alias(id_col),
        "cand_ngrams",
        "ref_ngrams",
        "overlap",
        p.alias("precision"),
        r.alias("recall"),
        F.when(
            (F.col("cand_ngrams") > 0)
            & (F.col("ref_ngrams") > 0)
            & (o > 0),
            F.lit(2.0)
            * (o / F.col("cand_ngrams"))
            * (o / F.col("ref_ngrams"))
            / (o / F.col("cand_ngrams") + o / F.col("ref_ngrams")),
        ).alias("f1"),
    )


def corpus_bleu(
    df: DataFrame,
    id_col: str = "doc_id",
    cand_col: str = "candidate",
    ref_col: str = "reference",
    max_n: int = 2,
) -> DataFrame:
    """Corpus-level BLEU (Papineni et al. 2002) up to ``max_n``-grams:
    modified (clipped) n-gram precisions aggregated over the WHOLE
    corpus — Σ clipped matches / Σ candidate n-grams, the corpus
    definition, not an average of sentence scores — with the brevity
    penalty exp(1 − ref_len/cand_len) for short candidates and
    uniform 1/max_n weights.

    Every numerator and denominator is an integer sum; the score
    assembles from ≤ 2·max_n + 2 exact integers with a fixed sequence
    of ln/exp/division ops, so both engines replay it bit-for-bit.
    Any zero precision yields bleu = 0.0 (no smoothing), the
    reference behavior.

    Returns ONE row: (cand_len, ref_len, bp, p1..p{max_n}, bleu)."""
    if max_n < 1:
        raise ValueError(f"max_n must be >= 1 (got {max_n})")
    base = spread(
        df.where(F.col(cand_col).isNotNull() & F.col(ref_col).isNotNull())
    ).select(
        F.col(id_col).alias("id"),
        tokenize(F.col(cand_col)).alias("ct"),
        tokenize(F.col(ref_col)).alias("rt"),
    )
    # ONE tagged-union explode + ONE (order, id, gram)-keyed agg + ONE
    # global agg replaces the r12 shape (a lens agg + per-order cc/rc
    # aggs + per-order clip joins, all crossJoined — 2·max_n + 1 scans
    # of an eager checkpoint and 2·max_n + 1 single-row BNLJ broadcasts;
    # 21 Spark jobs at max_n=2).  Every n-gram of every order lands as
    # ONE struct row tagged (n, side-increments); clipping is the same
    # per-(n, id, gram) least(cc, rc) — a gram absent on one side sums
    # 0 there, so least = 0, identical to the old INNER-join clip.
    # cand_len/ref_len fall out of the same pass: Σ size(tokens) IS the
    # unigram count per side (t1 / Σrc@n=1).  A per-pair spine entry
    # (n=0) preserves the old NULL lens on an EMPTY pair set while
    # zero-token pairs still report 0 — byte-identical in every case.
    # All sums are INTEGER; the ln/exp/division assembly is untouched.
    one, zero = F.lit(1), F.lit(0)
    entry = lambda n, g, c, r: F.struct(  # noqa: E731
        n.alias("n"), g.alias("g"), c.alias("c"), r.alias("r")
    )
    legs = [F.array(entry(zero, F.lit(None).cast("string"), zero, zero))]
    for n in range(1, max_n + 1):
        nn = F.lit(n)
        legs.append(
            F.transform(
                _word_ngrams(F.col("ct"), n), lambda g: entry(nn, g, one, zero)
            )
        )
        legs.append(
            F.transform(
                _word_ngrams(F.col("rt"), n), lambda g: entry(nn, g, zero, one)
            )
        )
    tagged = base.select("id", F.explode(F.concat(*legs)).alias("e"))
    per_gram = tagged.groupBy(
        F.col("e.n").alias("n"), "id", F.col("e.g").alias("g")
    ).agg(
        F.sum(F.col("e.c")).cast("bigint").alias("cc"),
        F.sum(F.col("e.r")).cast("bigint").alias("rc"),
    )
    z = F.lit(0).cast("bigint")
    aggs = [F.count(F.when(F.col("n") == 0, True)).alias("_np")]
    for n in range(1, max_n + 1):
        tag = F.col("n") == n
        aggs.append(
            F.coalesce(
                F.sum(F.when(tag, F.least(F.col("cc"), F.col("rc")))), z
            ).alias(f"m{n}")
        )
        aggs.append(F.coalesce(F.sum(F.when(tag, F.col("cc"))), z).alias(f"t{n}"))
    aggs.append(F.sum(F.when(F.col("n") == 1, F.col("cc"))).alias("_clen"))
    aggs.append(F.sum(F.when(F.col("n") == 1, F.col("rc"))).alias("_rlen"))
    out = per_gram.agg(*aggs).select(
        "*",
        # lens replay the old F.sum semantics: NULL on an empty pair
        # set, 0 when pairs exist but hold no tokens
        F.when(F.col("_np") > 0, F.coalesce(F.col("_clen"), z)).alias(
            "cand_len"
        ),
        F.when(F.col("_np") > 0, F.coalesce(F.col("_rlen"), z)).alias(
            "ref_len"
        ),
    )
    cl = F.col("cand_len").cast("double")
    rl = F.col("ref_len").cast("double")
    bp = F.when(
        F.col("cand_len") >= F.col("ref_len"), F.lit(1.0)
    ).otherwise(F.exp(F.lit(1.0) - rl / cl))
    # ANSI division-by-zero guard: p_n is NULL when no candidate
    # n-gram exists; any_zero routes those to bleu = 0.0
    ps = [
        F.when(
            F.col(f"t{n}") > 0, F.col(f"m{n}") / F.col(f"t{n}")
        )
        for n in range(1, max_n + 1)
    ]
    log_sum = None
    for p in ps:
        term = F.log(p)
        log_sum = term if log_sum is None else log_sum + term
    any_zero = None
    for n in range(1, max_n + 1):
        cond = (F.col(f"m{n}") == 0) | (F.col(f"t{n}") == 0)
        any_zero = cond if any_zero is None else any_zero | cond
    bleu = F.when(any_zero, F.lit(0.0)).otherwise(
        bp * F.exp(log_sum / F.lit(float(max_n)))
    )
    cols = [
        "cand_len",
        "ref_len",
        bp.alias("bp"),
        *[p.alias(f"p{n}") for n, p in enumerate(ps, start=1)],
        bleu.alias("bleu"),
    ]
    return out.select(*cols)
