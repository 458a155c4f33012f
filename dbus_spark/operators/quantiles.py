"""Grouped quantiles with an exact and an approximate arm.

The OLAP latency-percentile staple (p50/p95/p99 per group). Two
physical strategies behind one API (VERDICT r4 #5 — the last
documented 100 TB swap):

- ``exact=True`` (default): ``F.percentile`` — exact linear
  interpolation, matches DuckDB ``quantile_cont`` to the bit (the
  oracle arm). Physically this collects each group's values into a
  sort buffer per group: fine when the biggest group fits an
  executor, contractual-exactness territory.
- ``exact=False``: ``F.percentile_approx`` — the
  Greenwald-Khanna-style mergeable sketch. Map-side partial
  aggregation (a bounded sketch per group per partition, merged on
  the reduce side), so memory is O(accuracy) per group regardless of
  group size — the 100 TB arm. Result is an actual observed value
  (no interpolation) within rank error ``1/accuracy``.

Reference parity note: the reference engine has no quantile operator
at all (its metrics are counters — engine/stats.go); this is part of
the analytics surface the survey adds on top.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def grouped_quantiles(
    df: DataFrame,
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    probs: Sequence[float] = (0.5, 0.95, 0.99),
    names: Sequence[str] = ("p50", "p95", "p99"),
    exact: bool = True,
    accuracy: int = 10_000,
    round_dp: int = 4,
) -> DataFrame:
    """Per-``keys`` quantiles of ``value_col`` at ``probs``, plus a
    row count ``n``. Output columns: ``*keys, *names, n``."""
    if len(probs) != len(names):
        raise ValueError("probs and names must have the same length")

    def q(p: float):
        if exact:
            return F.percentile(value_col, p)
        return F.percentile_approx(value_col, p, accuracy)

    return df.groupBy(*keys).agg(
        *[
            F.round(q(p), round_dp).alias(nm)
            for p, nm in zip(probs, names)
        ],
        F.count("*").alias("n"),
    )


def grouped_distinct(
    df: DataFrame,
    value_col: str = "user_id",
    keys: Sequence[str] = ("event_type",),
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-``keys`` distinct count of ``value_col`` (the reach /
    cardinality staple), same two-arm contract as
    :func:`grouped_quantiles`:

    - ``exact=True`` (default, the oracle arm): ``countDistinct`` —
      physically an expand + two-phase aggregate; the shuffle carries
      every distinct (key, value) pair, fine while that set fits.
    - ``exact=False``: ``approx_count_distinct`` — HyperLogLog++, a
      mergeable fixed-size sketch per group per partition (map-side
      combined), memory O(1.04/rsd²) per group regardless of
      cardinality — the 100 TB arm, and the only viable shape for
      STREAMING reach (the sketch is a monoid; exact distinct over an
      unbounded stream needs unbounded state).

    Output: ``*keys, n_distinct, n``.
    """
    d = (
        F.countDistinct(value_col)
        if exact
        else F.approx_count_distinct(value_col, rsd)
    )
    return df.groupBy(*keys).agg(
        d.alias("n_distinct"), F.count("*").alias("n")
    )
