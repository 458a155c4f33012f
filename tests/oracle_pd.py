"""Single-process pandas oracles (FIXTURES.md F4).

Each function recomputes an operator's expected output from the raw
transcript frame with plain pandas — no Spark — so engine bugs can't
hide in shared code. The golden-JSON analog of the reference
(pkg/model/rowsevent_test.go) becomes: oracle frame == engine frame on
rows sorted by the output's natural key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def dedup(df: pd.DataFrame) -> pd.DataFrame:
    """Drop redelivered (conv_id, turn_idx) duplicates."""
    return df.drop_duplicates(subset=["conv_id", "turn_idx"], keep="first")


def expected_tumbling(
    df: pd.DataFrame, window_s: int = 60, dedup_first: bool = False
) -> pd.DataFrame:
    d = dedup(df) if dedup_first else df
    wstart = d["ts"].dt.floor(f"{window_s}s")
    g = d.assign(window_start=wstart).groupby(
        ["conv_id", "window_start"], as_index=False
    )
    out = g.agg(n_turns=("turn_idx", "size"), max_turn=("turn_idx", "max"))
    out["window_end"] = out["window_start"] + pd.Timedelta(seconds=window_s)
    return out


def expected_sliding(
    df: pd.DataFrame, window_s: int = 600, slide_s: int = 300
) -> pd.DataFrame:
    """Each row belongs to window_s/slide_s overlapping windows."""
    k = window_s // slide_s
    parts = []
    for i in range(k):
        base = (
            df["ts"] - pd.Timedelta(seconds=i * slide_s)
        ).dt.floor(f"{slide_s * k}s") + pd.Timedelta(seconds=i * slide_s)
        parts.append(df.assign(window_start=base))
    expl = pd.concat(parts, ignore_index=True)
    expl = expl[
        (expl["ts"] >= expl["window_start"])
        & (
            expl["ts"]
            < expl["window_start"] + pd.Timedelta(seconds=window_s)
        )
    ]
    out = expl.groupby(["conv_id", "window_start"], as_index=False).agg(
        n_turns=("turn_idx", "size")
    )
    return out


def expected_sessions(
    df: pd.DataFrame, gap_s: int = 1800
) -> pd.DataFrame:
    d = dedup(df).sort_values(["conv_id", "ts", "turn_idx"], kind="stable")
    new_session = (
        d.groupby("conv_id")["ts"].diff().dt.total_seconds().fillna(np.inf)
        >= gap_s
    )
    d = d.assign(session=new_session.groupby(d["conv_id"]).cumsum())
    g = d.groupby(["conv_id", "session"], as_index=False).agg(
        session_start=("ts", "min"),
        last_ts=("ts", "max"),
        n_turns=("turn_idx", "size"),
        roles=("role", lambda s: ",".join(s)),
    )
    return g.drop(columns=["session"])


def expected_ordered(df: pd.DataFrame) -> pd.DataFrame:
    return (
        dedup(df)
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)[
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        ]
    )


def expected_joined(df: pd.DataFrame, horizon_s: int = 120) -> pd.DataFrame:
    d = dedup(df)
    users = d[d["role"] == "user"][["conv_id", "turn_idx", "ts"]].rename(
        columns={"turn_idx": "user_turn_idx", "ts": "user_ts"}
    )
    tools = d[d["tool"].notna()][
        ["conv_id", "turn_idx", "tool", "ts"]
    ].rename(columns={"turn_idx": "tool_turn_idx", "ts": "tool_ts"})
    m = users.merge(tools, on="conv_id")
    m = m[
        (m["tool_ts"] > m["user_ts"])
        & (m["tool_ts"] <= m["user_ts"] + pd.Timedelta(seconds=horizon_s))
    ]
    return m.reset_index(drop=True)


def simulate_watermark_survivors(
    batches: list[pd.DataFrame], horizon_s: float, window_s: int
) -> tuple[pd.DataFrame, pd.Timestamp]:
    """Micro-batch watermark simulation matching Spark's two-watermark
    semantics (verified empirically against pyspark 4.1 progress
    events): late rows in batch N are filtered with the watermark that
    was in effect DURING batch N-1 (one batch of lag), while state
    eviction/emission at the end of batch N uses the freshly-updated
    watermark max_ts(0..N-1) − horizon.

    Returns (surviving rows, final eviction watermark): in append mode
    only windows with window_end <= final watermark are ever emitted.
    """
    h = pd.Timedelta(seconds=horizon_s)
    wm_filter = pd.Timestamp.min  # lags one batch behind
    wm_evict = pd.Timestamp.min
    kept = []
    for b in batches:
        wend = b["ts"].dt.floor(f"{window_s}s") + pd.Timedelta(
            seconds=window_s
        )
        kept.append(b[wend > wm_filter])
        wm_filter = wm_evict
        wm_evict = max(wm_evict, b["ts"].max() - h)
    return pd.concat(kept, ignore_index=True), wm_filter


def expected_append_mode_windows(
    batches: list[pd.DataFrame], horizon_s: float, window_s: int
) -> pd.DataFrame:
    """Expected final output of an append-mode tumbling count over a
    finite replay of ``batches`` (no flush of still-open windows)."""
    survivors, wm_final = simulate_watermark_survivors(
        batches, horizon_s, window_s
    )
    out = expected_tumbling(survivors, window_s=window_s)
    return out[out["window_end"] <= wm_final].reset_index(drop=True)
