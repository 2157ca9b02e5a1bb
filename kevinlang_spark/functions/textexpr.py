"""Text Column expressions.

Everything here compiles to Catalyst expressions (split / filter /
transform / aggregate) — the tokenizer runs inside whole-stage codegen on
every executor, no Python in the loop.  The token regex ``[^a-z0-9]+`` is
deliberately ASCII-simple so the DuckDB oracle can replicate it exactly
(``regexp_split_to_array(lower(text), '[^a-z0-9]+')``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def normalize_text(col: Column) -> Column:
    """Lowercase + strip all non-alphanumerics — canonical form for exact
    dedup fingerprints."""
    return F.regexp_replace(F.lower(col), "[^a-z0-9]", "")


def tokenize(col: Column) -> Column:
    """array<string> of lowercase tokens, empties removed."""
    parts = F.split(F.lower(col), TOKEN_SPLIT_RE)
    return F.filter(parts, lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokenize(col))


def word_shingles(col: Column, n: int = 3) -> Column:
    """array<string> of word n-gram shingles (space-joined).

    Built with sequence+transform+slice — one pass over the token array per
    row, no explode, no shuffle.  Documents shorter than n words yield their
    whole token string as the single shingle.
    """
    toks = tokenize(col)
    k = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1)))
    # NULL text → k is NULL → a NULL when-condition falls through to
    # otherwise(), which would emit [""] (concat_ws over a NULL slice);
    # treat NULL like empty explicitly
    return F.when(k.isNull() | (k <= 0), F.array().cast("array<string>")).otherwise(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def shingle_hashes(col: Column, n: int = 3) -> Column:
    """64-bit hashed word ``n``-grams: the same windows as
    ``word_shingles`` but each gram is a fold of ``xxhash64`` over the
    window's token hashes — no per-gram string building, and downstream
    joins/groupBys shuffle 8-byte keys instead of long strings.  Gram
    identity matches ``word_shingles`` up to xxhash64 collisions
    (~2⁻⁶⁴ per pair; deterministic, so a passing oracle run stays
    passing).  The combine is ``xxhash64(acc, tok_hash)`` — overflow-free
    under ANSI mode, position-sensitive like string grams."""
    h = F.transform(tokenize(col), lambda t: F.xxhash64(t))
    k = F.size(h)
    starts = F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1)))
    return F.when(k.isNull() | (k <= 0), F.array().cast("array<bigint>")).otherwise(
        F.transform(
            starts,
            lambda i: F.aggregate(
                F.slice(h, i, n),
                F.lit(0).cast("bigint"),
                lambda acc, x: F.xxhash64(acc, x),
            ),
        )
    )


#: BPE-ish pretokenizer: letter runs, digit runs, and punctuation blocks
#: count as separate tokens (the way subword tokenizers split before
#: merging).  ASCII-simple on purpose — the same pattern runs unchanged in
#: Spark (Java regex) and DuckDB (RE2), so counts are oracle-comparable.
BPE_ISH_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"


def bpe_ish_token_count(col: Column) -> Column:
    """Estimated subword-ish token count: matches of ``BPE_ISH_RE`` over
    the lowercased text.  A pure ``regexp_count`` expression — scan-stage,
    no split arrays materialized (unlike ``tokenize``), so it's the cheap
    estimator for corpus-level token budgeting."""
    return F.regexp_count(F.lower(col), F.lit(BPE_ISH_RE))
