"""Generate a driver-shaped testdata directory at an arbitrary scale
factor, for LOCAL measurement only.

The driver's round-6 measurement ran at sf=1.0, but /root/testdata
stops at sf0.1 and is read-only.  This script synthesizes the same
table shapes at any sf by matching the measured distributions of the
shipped sf0.001/0.01/0.1 ladder (row counts scale linearly: events =
1M*sf over a fixed 30-day window, lineitem = 6M*sf, orders = 1.5M*sf,
customer = 150k*sf, part = 200k*sf, supplier = 10k*sf, documents =
50k*sf over the SAME 31-word vocabulary as the shipped tables,
embeddings = 20k*sf near-random unit vectors with 10 soft labels).

Values are NOT byte-identical to the driver's generator — only the
distributions (key ranges, vocab, timestamp windows, value tails) are
matched, which is what plan shapes and runtimes depend on.

Usage:  python tools/make_sf.py 1.0 /root/testdata_local/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd


def make_sf(sf: float, out: str, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    ref = "/root/testdata/sf0.1"

    # nation/region are fixed-size: copy the shipped ones verbatim
    for t in ("nation", "region"):
        pd.read_parquet(f"{ref}/{t}.parquet").to_parquet(
            f"{out}/{t}.parquet", index=False
        )

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = max(500, int(50_000 * sf))
    n_vecs = max(500, int(20_000 * sf))

    pd.DataFrame(
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": rng.integers(0, 25, n_cust),
            "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
            "c_mktsegment": rng.choice(
                ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING",
                 "HOUSEHOLD"], n_cust
            ),
        }
    ).to_parquet(f"{out}/customer.parquet", index=False)

    pd.DataFrame(
        {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": rng.integers(0, 25, n_supp),
            "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
        }
    ).to_parquet(f"{out}/supplier.parquet", index=False)

    adjs = ["large", "hot", "small", "cold", "red", "green", "smooth",
            "rough", "shiny", "dull"]
    nouns = ["ring", "bolt", "washer", "nut", "gear", "pin", "rod",
             "cap", "plate", "clip"]
    pd.DataFrame(
        {
            "p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": [
                f"{adjs[i % 10]} {nouns[(i // 10) % 10]}"
                for i in range(n_part)
            ],
            "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
            "p_type": rng.choice(
                ["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM",
                 "PROMO"], n_part
            ),
            "p_size": rng.integers(1, 51, n_part),
            "p_retailprice": np.round(
                900.0 + (np.arange(n_part) % 1000) / 10.0, 2
            ),
        }
    ).to_parquet(f"{out}/part.parquet", index=False)

    od_lo = np.datetime64("1995-01-01")
    pd.DataFrame(
        {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_ord),
            "o_orderstatus": rng.choice(["P", "O", "F"], n_ord),
            "o_totalprice": np.round(rng.uniform(900, 450_000, n_ord), 2),
            "o_orderdate": (
                od_lo + rng.integers(0, 2404, n_ord).astype("timedelta64[D]")
            ).astype("datetime64[us]"),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                 "5-LOW"], n_ord
            ),
        }
    ).to_parquet(f"{out}/orders.parquet", index=False)

    sd_lo = np.datetime64("1995-01-02")
    pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, n_ord, n_li),
            "l_partkey": rng.integers(0, n_part, n_li),
            "l_suppkey": rng.integers(0, n_supp, n_li),
            "l_linenumber": rng.integers(1, 8, n_li),
            "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
            "l_returnflag": rng.choice(["A", "N", "R"], n_li),
            "l_linestatus": rng.choice(["O", "F"], n_li),
            "l_shipdate": (
                sd_lo + rng.integers(0, 2498, n_li).astype("timedelta64[D]")
            ).astype("datetime64[us]"),
        }
    ).to_parquet(f"{out}/lineitem.parquet", index=False)

    # events: fixed 30-day window, sorted arrivals, 5 uniform types,
    # exponential-ish value (mean ~50, 2dp), props = {"k": 0..99}
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 86_400 * 1_000_000
    ts = np.sort(rng.integers(0, span_us, n_ev))
    pd.DataFrame(
        {
            "event_id": np.arange(n_ev, dtype=np.int64),
            "ts": t0 + ts.astype("timedelta64[us]"),
            "user_id": rng.integers(0, n_users, n_ev),
            "event_type": rng.choice(
                ["signup", "purchase", "view", "click", "error"], n_ev
            ),
            "value": np.round(
                np.minimum(rng.exponential(50.0, n_ev), 600.0), 2
            ),
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
        }
    ).to_parquet(f"{out}/events.parquet", index=False)

    # documents: the shipped 31-word vocabulary, uniform 10..100 words
    refd = pd.read_parquet(f"{ref}/documents.parquet", columns=["text"])
    vocab = np.array(sorted({t for x in refd["text"] for t in x.split()}))
    lens = rng.integers(10, 101, n_docs)
    flat = rng.integers(0, len(vocab), int(lens.sum()))
    texts = []
    off = 0
    for ln in lens:
        texts.append(" ".join(vocab[flat[off:off + ln]]))
        off += ln
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang = langs[
        rng.choice(5, n_docs, p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    ]
    pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": lang,
            "source": [f"src{i % 20}" for i in range(n_docs)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    ).to_parquet(f"{out}/documents.parquet", index=False)

    # embeddings: near-random unit vectors with 10 soft labels
    # (measured sf0.1: mean cosine to own label centroid ~0.07)
    dim = 64
    centers = rng.standard_normal((10, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, 10, n_vecs)
    V = 0.57 * centers[lab] + rng.standard_normal((n_vecs, dim))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    V = V.astype(np.float32)
    pd.DataFrame(
        {
            "vec_id": np.arange(n_vecs, dtype=np.int64),
            "embedding": [v for v in V],
            "label": lab.astype(np.int32),
        }
    ).to_parquet(f"{out}/embeddings.parquet", index=False)
    with open(f"{out}/_DONE", "w") as f:
        f.write("ok\n")
    print(f"wrote {out}: docs={n_docs} vecs={n_vecs} events={n_ev} "
          f"lineitem={n_li}")


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/root/testdata_local/sf{sys.argv[1] if len(sys.argv) > 1 else '1.0'}"
    )
    make_sf(sf, out)
