"""Text-analysis column functions for training-data pipelines.

All hot-path functions are built-in Spark SQL expressions (JVM-side,
whole-stage-codegen) — no Python in the row path. The reference's only text
ops are LIKE and CASE standardization (SURVEY.md §2.2 P5, §2.8 F3); the
functions here extend that to the language-ID / quality / tokenization /
fingerprinting surface a 100 TB corpus pipeline needs.

Determinism note: every function here is a pure expression over the input
string, so results are identical across partitionings and engines — which
is what lets the DuckDB oracles in plans/queries_ml.py replicate them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny English function-word list for the n-gram/stopword heuristics
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(col), r"\s+")




#: the BPE-ish piece alternation — ONE definition for both the count and
#: the array form AND the DuckDB oracles (SQL_TEXT_TOKEN_STATS /
#: SQL_VOCAB_TOP_TOKENS interpolate this constant into their f-strings,
#: so Spark and oracle can never drift on the pattern; the value contains
#: no quote/brace characters, so it drops into a single-quoted SQL
#: literal unescaped)
BPE_ISH_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish sub-word count: runs of letters, runs of digits, or single
    other non-space chars — a cheap stand-in for a real tokenizer's piece
    count. Case-insensitive: 'Hello World' is 2 pieces, not 4 (an
    uppercase letter must not break a run)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0))


def bpe_ish_tokens(col: Column) -> Column:
    """The token ARRAY behind :func:`bpe_ish_token_count`'s count — the
    same BPE_ISH_RE, returning the pieces themselves for vocabulary
    induction (plans/queries_ml.py:q_vocab_top_tokens). Equality of
    ``size(bpe_ish_tokens(x))`` with ``bpe_ish_token_count(x)`` over the
    corpus is pinned by tests/test_training_ops_r4.py — the twin tie that
    lets text_token_stats rotate to the registry tail."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0)


def stopword_hits(tok_col: Column, words: list[str] | None = None) -> Column:
    """Case-insensitive: 'The' at sentence start is a stopword hit —
    lang_id/quality_score must not go blind on title-case text."""
    words = words or STOPWORDS
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tok_col, lambda t: F.array_contains(arr, F.lower(t))))


def quality_score(text_col: Column) -> Column:
    """Composite [0,1] quality heuristic: lexical diversity + stopword
    presence + length band. Pure expression; identical order of double ops
    on both engines (see plans/queries_ml.py oracle)."""
    t = tokens(text_col)
    diversity = F.size(F.array_distinct(t)) / F.size(t)
    stop_ratio = stopword_hits(t) / F.size(t)
    length_ok = F.when((F.length(text_col) >= 100) & (F.length(text_col) <= 2000), 1.0).otherwise(0.5)
    return diversity * 0.5 + stop_ratio * 0.3 + length_ok * 0.2


def lang_id(text_col: Column) -> Column:
    """N-gram-heuristic language ID: English function-word hits win,
    else unknown. (A real model would be a pandas UDF; the heuristic keeps
    the hot path in codegen.)"""
    t = tokens(text_col)
    return F.when(stopword_hits(t) >= 1, F.lit("en")).otherwise(F.lit("und"))


def fingerprint(text_col: Column) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase text —
    the canonical-form content hash used for near-exact dedup."""
    norm = F.lower(F.regexp_replace(F.trim(text_col), r"\s+", " "))
    return F.md5(norm)
