"""The LLM training-data ingest vertical as a reusable pipeline stage.

Shape (the one a crawl re-ingest actually runs): document stream →
one-pass Arrow enrichment (quality + token count) → quality filter →
streaming exact-dedup on the normalized fingerprint
(``dropDuplicatesWithinWatermark`` state) → exactly-once keyed sink.
``bench.py``'s streaming_doc_ingest section drives exactly this
function.

Scale notes baked in (profiled on the micro-batch listener, r4):

- the enrichment runs as ONE nondeterministic Arrow struct UDF
  (``functions.vectorized.doc_enrich_v``): a deterministic pandas UDF
  is duplicated when Catalyst pushes the quality filter beneath the
  projection that computes it — measured 2x the Arrow cost.
- ``hash_fn='xxhash64'`` is the production fingerprint mode: 8-byte
  state key + codegen'd JVM hash (md5's 32-hex-char key exists for
  oracle parity, see ``operators.text.fingerprint``).
- state-partition sizing is the caller's launch decision, NOT set
  here: per-partition state-store commit is fixed overhead, so size
  ``spark.sql.shuffle.partitions`` to the expected distinct-key
  volume before starting the query (the partition count is baked into
  the checkpoint). ~5k keys want ~8 partitions; 10^9 keys at 100 TB
  want thousands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dbus_spark.functions.vectorized import doc_enrich_v
from dbus_spark.operators.text import fingerprint


def doc_ingest_stream(
    src: DataFrame,
    quality_min: float = 0.3,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    dedup: bool = True,
) -> DataFrame:
    """Enrich → quality-filter → (optionally) streaming-dedup a
    document stream. Works on batch DataFrames too (the watermark/
    dedup step is skipped unless ``df.isStreaming`` and ``dedup``).

    Returns the cleaned frame with added columns ``quality``,
    ``n_tokens``, ``fp``; feed it to ``writeStream.foreachBatch(
    IdempotentKeyedSink(..., keys=['fp']).foreach_batch())`` for the
    exactly-once landing."""
    out = (
        src.withColumn("e", doc_enrich_v(F.col(text_col)))
        .filter(F.col("e.quality") >= quality_min)
        .select("*", "e.quality", "e.n_tokens")
        .drop("e")
        .withColumn("fp", fingerprint(text_col, hash_fn=hash_fn))
    )
    if dedup and out.isStreaming:
        out = out.withWatermark(ts_col, watermark)
        out = out.dropDuplicatesWithinWatermark(["fp"])
    elif dedup:
        out = out.dropDuplicates(["fp"])
    return out


def doc_policy_stage(
    df: DataFrame,
    bench_ngrams=None,
    ngram_n: int = 8,
    max_contam_frac: float = 0.0,
    decontam_mode: str = "exact",
    mixture_rates: "dict[str, float] | None" = None,
    strata_col: str = "lang",
    sample_seed: int = 0,
    default_rate: float = 0.0,
    redact: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-policy stage: mixture sampling → benchmark decontam →
    PII redaction, in that order (cheapest predicate first — the
    codegen'd md5 sampling filter drops rows before the Arrow decontam
    UDF ever sees them).

    Every step is MAP-SIDE (zero shuffle, zero state), so the stage
    composes identically into a batch job or ANYWHERE in a streaming
    query — before the stateful dedup of :func:`doc_ingest_stream`,
    after it, or standalone.  Pass only the knobs you want; the
    default configuration is the identity transform.
    """
    from dbus_spark.operators.corpus import redact_pii, sample_mixture
    from dbus_spark.operators.decontam import streaming_decontam_filter

    out = df
    if mixture_rates is not None:
        out = sample_mixture(
            out,
            mixture_rates,
            strata_col=strata_col,
            id_col=id_col,
            seed=sample_seed,
            default_rate=default_rate,
        )
    if bench_ngrams is not None:
        out = streaming_decontam_filter(
            out, bench_ngrams, text_col=text_col, n=ngram_n,
            max_frac=max_contam_frac, mode=decontam_mode,
        )
    if redact:
        out = redact_pii(out, text_col=text_col)
    return out
