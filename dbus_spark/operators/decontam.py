"""Benchmark decontamination — n-gram overlap between a training
corpus and an evaluation/benchmark set.

The standard LLM-training-data hygiene pass (the n-gram protocol from
the GPT-3 appendix / Dolma / FineWeb pipelines, all public): a
document is contaminated when it shares at least one word n-gram
(n usually 8-13) with any benchmark item; contaminated docs are
dropped or the matching spans are excised before training.  The
reference engine has no analog — this is target-scope for the
training-data pipeline the survey's §6 asks for.

Scale shape (100 TB corpus, MB-scale benchmark): the benchmark's
distinct n-gram set is tiny — it broadcasts.  The corpus side is one
Arrow shingle pass (reusing ``shingles_exploded_arrow``, the measured
fast path from the dedup ladder) feeding a broadcast LEFT join and ONE
hash aggregation on doc_id: a single scan of the corpus, no
corpus-sized shuffle beyond the per-doc rollup, no candidate blowup.
The same shape at any corpus size; only the rollup shuffle grows, and
it is doc-count-, not token-count-, sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dbus_spark.operators.dedup import shingles_exploded_arrow


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document benchmark-overlap report.

    Output: ``<id_col>, n_ngrams, n_hit, contam_frac`` — distinct
    n-grams in the doc, how many of those appear anywhere in the
    benchmark, and the ratio (rounded to 4 dp).  Docs shorter than
    ``n`` tokens have no n-grams and produce no row.  Filtering is the
    caller's policy (``contam_frac > 0`` is the usual drop rule; a
    ``left_semi`` against the flagged ids excises them from the
    corpus).

    Both sides shingle with the SAME tokenization (the dedup ladder's
    Java-whitespace-parity Arrow path), so equality is byte-exact —
    no hashing in the match key.  At true 100 TB scale the join key
    would be ``xxhash64(s)`` to shrink the broadcast; that swap
    changes no counts short of a 64-bit collision.
    """
    doc_sh = shingles_exploded_arrow(docs, id_col, text_col, n)
    bench_sh = (
        shingles_exploded_arrow(benchmark, id_col, bench_text_col, n)
        .select("s")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    flagged = doc_sh.join(F.broadcast(bench_sh), on="s", how="left")
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_ngrams"),
        F.count("_hit").alias("n_hit"),
        F.round(F.count("_hit") / F.count("*"), 4).alias("contam_frac"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    max_frac: float = 0.0,
) -> DataFrame:
    """Drop documents whose benchmark n-gram overlap exceeds
    ``max_frac`` (default: any overlap).  Anti-join on the flagged id
    set — the corpus is scanned once for stats and once for the
    projection, both with the filter pushed down."""
    flagged = (
        ngram_contamination(
            docs, benchmark, id_col, text_col, bench_text_col, n
        )
        .filter(F.col("contam_frac") > max_frac)
        .select(id_col)
    )
    return docs.join(flagged, on=id_col, how="left_anti")
