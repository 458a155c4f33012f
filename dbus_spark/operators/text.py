"""Text-analysis operators for training-data pipelines.

Beyond the reference's scope (its payloads are opaque bytes), these are
the per-document operators a 100 TB text pipeline needs: token
counting, quality scoring, language ID, fingerprinting. Everything is
a Catalyst expression — no Python UDFs — so the whole stage stays in
whole-stage codegen and scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small public stopword/marker lists (language ID by stopword voting —
# the classic n-gram/function-word heuristic, deterministic).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "que", "y"],
    "de": ["der", "die", "und", "das", "ein"],
}
_LANG_ORDER = ["en", "fr", "es", "de"]  # deterministic tie-break

STOPWORDS = ["the", "a", "and", "of", "is", "to", "in"]


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization (the BPE-ish splitter's cheap cousin)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


def quality_features(df: DataFrame, col: str = "text") -> DataFrame:
    """Deterministic quality-scoring features per document:
    length, token count, alphabetic ratio, stopword ratio, mean token
    length — the usual cheap filters before expensive dedup stages."""
    toks = tokens(col)
    n_chars = F.length(F.col(col))
    alpha = F.length(F.regexp_replace(F.col(col), "[^a-zA-Z]", ""))
    stop_in = ",".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS))
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(alpha / n_chars, 4).alias("alpha_ratio"),
        F.round(n_stop / F.size(toks), 4).alias("stopword_ratio"),
        F.round((n_chars - F.size(toks) + 1) / F.size(toks), 4).alias(
            "mean_token_len"
        ),
    )


def lang_id(col: str | Column = "text") -> Column:
    """Marker-word voting: argmax of per-language stopword hits,
    ties broken in fixed language order, no hits → 'und'."""
    toks = tokens(col)
    scores = {
        lang: F.size(F.filter(toks, lambda t: F.lower(t).isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate reversed so earlier languages win ties
    for lang in reversed(_LANG_ORDER):
        cond = scores[lang] >= F.greatest(best_score, F.lit(1))
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


# subword-ish lexer classes: letter runs, digit runs, single
# non-alnum marks — the shape of a BPE pre-tokenizer's coarse pass,
# kept to constructs Java regex and the oracle's RE2 agree on
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe(col: str | Column = "text") -> Column:
    """BPE-ish token count: counts lexer-class matches instead of
    whitespace splits, so punctuation and digits count as their own
    tokens — the pre-tokenization granularity an LLM data pipeline
    budgets by."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_PATTERN))


def fingerprint(col: str | Column = "text") -> Column:
    """Normalized document fingerprint: md5 of the
    lowercased, whitespace-collapsed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))
