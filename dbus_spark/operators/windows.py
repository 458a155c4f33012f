"""Tumbling / sliding event-time window aggregation + salted variant.

The reference has no event-time windows (its only time structure is
processing-time ticks — SURVEY.md §2.5); these are the target scope's
windowed aggregations, expressed as plain ``groupBy(window(ts))`` hash
aggregation so Catalyst gets partial (map-side) aggregation, AQE
coalescing, and whole-stage codegen for free.

Skew: a hot conversation (the Zipf head in the fixture) concentrates
one grouping key on one task. ``salted_windowed_agg`` runs the same
aggregation in two phases — partial agg on (key, salt) then merge on
(key) — trading one extra narrow shuffle for an even first-stage
distribution. Only associative/decomposable aggregates are allowed,
mirroring classic two-level aggregation. At 100 TB this is the
difference between one straggler task holding the stage and an even
spread; the reference has no answer to this (its weighted strategy is
an empty stub — pkg/cluster/strategy_weighted.go:3-6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# aggregate name → (partial_fn, merge_fn, needs_distinct_input)
# partial runs on (keys + salt), merge recombines partials per key.
_DECOMPOSABLE = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _window_col(ts: str, duration: str, slide: str | None) -> Column:
    if slide:
        return F.window(ts, duration, slide)
    return F.window(ts, duration)


def windowed_agg(
    df: DataFrame,
    duration: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    slide: str | None = None,
    ts: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) window aggregation.

    ``aggs`` maps output column name → aggregate Column. Output columns:
    ``window_start, window_end, *keys, *aggs`` — flat, oracle-friendly.
    Works identically on batch and streaming DataFrames; pass
    ``watermark`` on streams to bound state and drop late data.
    """
    keys = keys or []
    src = df.withWatermark(ts, watermark) if watermark else df
    w = _window_col(ts, duration, slide).alias("_w")
    out = src.groupBy(w, *[F.col(k) for k in keys]).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def salted_windowed_agg(
    df: DataFrame,
    duration: str,
    aggs: dict[str, tuple[str, str]],
    keys: list[str],
    n_salts: int = 16,
    slide: str | None = None,
    ts: str = "ts",
    salt_source: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Two-phase (salted) windowed aggregation for hot keys.

    ``aggs`` maps output name → (agg_name, input_col) with agg_name in
    {count, sum, min, max}. Phase 1 groups by (window, keys, salt) —
    the hot key's rows spread across ``n_salts`` partitions — phase 2
    merges partials per (window, keys). The salt is derived from a
    per-row column (default: the first non-key column) so it is
    deterministic under replay.

    Equivalent by construction to :func:`windowed_agg` with the same
    aggregates; `tests/test_windows.py` asserts the equivalence on the
    skewed fixture.
    """
    salt_src = salt_source or ts
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).alias("_salt")
    w = _window_col(ts, duration, slide).alias("_w")
    src = df.withWatermark(ts, watermark) if watermark else df

    partial_cols = []
    merge_cols = []
    for name, (agg_name, input_col) in aggs.items():
        if agg_name not in _DECOMPOSABLE:
            raise ValueError(
                f"{agg_name!r} is not decomposable; use windowed_agg"
            )
        partial_fn, merge_fn = _DECOMPOSABLE[agg_name]
        partial_cols.append(partial_fn(input_col).alias(f"_p_{name}"))
        merge_cols.append(merge_fn(f"_p_{name}").alias(name))

    partial = src.groupBy(w, *[F.col(k) for k in keys], salt).agg(
        *partial_cols
    )
    merged = partial.groupBy("_w", *keys).agg(*merge_cols)
    return merged.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )
