"""Scale-growth evidence for the pair-join ladder (VERDICT r3 #4/#5).

The driver's testdata stops at sf0.1 (5k docs / 2k embeddings), where
the candidate-generation caps (bands, df-cuts, SRP planes) are tuned.
The "never O(n^2)" claim needs MEASURED growth, so this bench runs the
four pair queries on self-similar synthetic corpora
(``dbus_spark.datagen.generate_documents`` / ``generate_embeddings``)
at 1x / 3x / 10x the sf0.1 size and reports wall-clock growth
exponents alpha = log(t2/t1) / log(n2/n1) (1.0 = linear, 2.0 =
quadratic) plus output-pair counts (the true pair density is built to
grow linearly).

Tuning protocol across scales — the part that holds at 100 TB:
- text ladder (minhash bands, jaccard/winnow df-cut): parameters are
  IDENTICAL at every scale. The corpus generator grows the vocabulary
  with the corpus (Heaps' law), which keeps per-shingle document
  frequency constant, so a fixed ``max_df`` means the same thing at
  every size - as it does on real crawls.
- SRP-LSH: bucket occupancy, not plane count, is the scale invariant.
  planes_per_table = round(log2(n / TARGET_BUCKET)) holds expected
  docs-per-bucket at ~TARGET_BUCKET, so per-bucket verify work stays
  constant and total cost stays ~linear; recall lost to the extra
  planes is bought back with tables (standard LSH sizing). A fixed
  plane count would instead leave candidate pairs grow ~n^2/2^b.

Run: ``python growth_bench.py [--scales 5000,15000,50000]``.
Emits one JSON line; the human-readable table goes in BENCH.md §8.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_BUCKET = 125  # docs per SRP bucket at every scale (sf0.1 ratio)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time_best(df_fn, repeats: int) -> tuple[float, int]:
    """(best wall seconds, row count) over ``repeats`` materializations.
    Plan CONSTRUCTION is inside the timed region: several operators
    (winnow/jaccard/est-jaccard) persist or eagerly checkpoint shared
    scans while building, so timing only the final action would
    under-report them."""
    best = math.inf
    for _ in range(repeats):
        t0 = time.time()
        df = df_fn()
        _noop(df)
        best = min(best, time.time() - t0)
    rows = df.count()
    return best, rows


def _span_dedup_chunked(docs_df):
    from pyspark.sql import functions as F

    from dbus_spark.operators.corpus import dedup_spans
    from dbus_spark.operators.text import tokens

    toks = tokens("text")
    paras = F.transform(
        F.sequence(F.lit(0), F.floor((F.size(toks) - 1) / 12)),
        lambda i: F.array_join(F.slice(toks, i * 12 + 1, 12), " "),
    )
    chunked = docs_df.select(
        "doc_id", F.array_join(paras, "\n\n").alias("text")
    )
    return dedup_spans(chunked, hash_key=True)


def srp_planes(n: int) -> int:
    return max(4, round(math.log2(max(n, 2) / TARGET_BUCKET)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="5000,15000,50000")
    ap.add_argument("--emb-ratio", type=float, default=0.4,
                    help="embeddings per doc (sf0.1: 2000/5000)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--dim768", action="store_true", default=True)
    ap.add_argument("--no-dim768", dest="dim768", action="store_false")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F  # noqa: F401

    from dbus_spark.datagen import generate_documents, generate_embeddings
    from dbus_spark.operators import dedup as D
    from dbus_spark.operators import similarity as S
    from dbus_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "dbus_growth", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    work = tempfile.mkdtemp(prefix="dbus_growth_")
    results: dict[str, dict] = {}
    try:
        # warm codegen/JIT/Arrow workers on a tiny corpus so the first
        # measured scale isn't paying one-time costs
        wdoc = os.path.join(work, "warm_docs.parquet")
        wemb = os.path.join(work, "warm_emb.parquet")
        generate_documents(300, seed=1).to_parquet(wdoc, index=False)
        generate_embeddings(150, seed=1).to_parquet(wemb, index=False)
        _noop(D.lsh_candidate_pairs(spark.read.parquet(wdoc)))
        _noop(D.ngram_jaccard_pairs(spark.read.parquet(wdoc), max_df=50))
        _noop(D.winnow_match_pairs(spark.read.parquet(wdoc)))
        _noop(S.neardup_pairs_lsh(spark.read.parquet(wemb), dim=64))
        _noop(_span_dedup_chunked(spark.read.parquet(wdoc)))
        _noop(S.semdedup(spark.read.parquet(wemb), dim=64, n_centroids=16))
        print("[warm] done", file=sys.stderr)

        for n_docs in scales:
            n_emb = int(n_docs * args.emb_ratio)
            ddir = os.path.join(work, f"docs_{n_docs}.parquet")
            edir = os.path.join(work, f"emb_{n_emb}.parquet")
            generate_documents(n_docs).to_parquet(ddir, index=False)
            generate_embeddings(n_emb).to_parquet(edir, index=False)
            docs = lambda: spark.read.parquet(ddir).repartition(cpus)  # noqa: E731
            emb = lambda: spark.read.parquet(edir).repartition(cpus)  # noqa: E731
            planes = srp_planes(n_emb)
            cell: dict[str, dict] = {"n_docs": n_docs, "n_emb": n_emb,
                                     "srp_planes": planes}
            reps = args.repeats if n_docs < max(scales) else 1
            load0 = os.getloadavg()[0]
            for name, fn in {
                "doc_lsh_pairs": lambda: D.lsh_candidate_pairs(
                    docs(), n_hashes=16, n_bands=4
                ),
                "doc_jaccard_pairs": lambda: D.ngram_jaccard_pairs(
                    docs(), threshold=0.2, max_df=50
                ),
                "doc_winnow_pairs": lambda: D.winnow_match_pairs(
                    docs(), min_shared=2, max_df=50
                ),
                # threshold 0.8, NOT the ladder's old 0.4 (r5 fix): in
                # dim 64 a random cross-cluster pair has cos ~
                # N(0, 1/64), so P(cos >= 0.4) ~ 7e-4 and the TRUE
                # pair set of the corpus grows ~n^2 (measured:
                # 9.5k/99k/873k true pairs at 6k/20k/60k vecs) — at
                # 0.4 the task is quadratic BY DEFINITION and any
                # operator is output-bound. At 0.8 the background is
                # ~0 (6.4 sigma) and true density is linear (planted
                # dups + same-cluster tail), so wall-clock growth
                # measures the OPERATOR again.
                "emb_neardup_lsh": lambda: S.neardup_pairs_lsh(
                    emb(), threshold=0.8, dim=64,
                    planes_per_table=planes,
                ),
                # span dedup: the only corpus-curation op with a
                # corpus-sized shuffle (window keyed by the span hash);
                # 12-token re-chunk mirrors the doc_paragraph_dedup
                # query. hash_key=True is the 100 TB arm under test.
                "doc_span_dedup": lambda: _span_dedup_chunked(docs()),
                # SemDeDup: cluster count must GROW with the corpus
                # (the paper's geometry and the generator's own
                # occupancy-constant rule) — a fixed n_centroids
                # makes cell occupancy linear and the within-cell
                # pair join quadratic BY CONSTRUCTION; ~125 vecs/cell
                # keeps the task the operator's, threshold 0.8 as in
                # the emb_neardup_lsh cell (linear true density)
                "emb_semdedup": lambda: S.semdedup(
                    emb(), threshold=0.8, dim=64,
                    n_centroids=max(16, n_emb // 125),
                ),
            }.items():
                sec, rows = _time_best(fn, reps)
                cell[name] = {"sec": round(sec, 3), "pairs": rows}
                print(f"[{n_docs}] {name}: {sec:.2f}s {rows} pairs",
                      file=sys.stderr)
            cell["loadavg"] = [round(load0, 2),
                               round(os.getloadavg()[0], 2)]
            results[str(n_docs)] = cell

        # growth exponents over the full span and per hop
        lo, hi = str(scales[0]), str(scales[-1])
        exponents = {}
        for q in ("doc_lsh_pairs", "doc_jaccard_pairs",
                  "doc_winnow_pairs", "emb_neardup_lsh",
                  "doc_span_dedup", "emb_semdedup"):
            n_lo = results[lo]["n_docs" if q.startswith("doc") else "n_emb"]
            n_hi = results[hi]["n_docs" if q.startswith("doc") else "n_emb"]
            t_lo, t_hi = results[lo][q]["sec"], results[hi][q]["sec"]
            exponents[q] = round(
                math.log(t_hi / t_lo) / math.log(n_hi / n_lo), 3
            )

        dim_section = {}
        if args.dim768:
            # dim-768 evidence: same n, production embedding width. The
            # r3 vectorization's claim is the PLAN is dim-independent
            # (no literal planes / per-dim expressions); cost should
            # grow ~linearly with dim (flop-bound), far below 12x.
            n = int(scales[0] * args.emb_ratio)
            for dim in (64, 768):
                p = os.path.join(work, f"emb_d{dim}.parquet")
                generate_embeddings(n, dim=dim).to_parquet(p, index=False)
                e = lambda: spark.read.parquet(p).repartition(cpus)  # noqa: E731
                sec, rows = _time_best(
                    lambda: S.neardup_pairs_lsh(
                        e(), threshold=0.4, dim=dim,
                        planes_per_table=srp_planes(n),
                    ),
                    args.repeats,
                )
                ksec, krows = _time_best(
                    lambda: S.knn_lsh(
                        e(), query_ids=[0, 1, 2, 3, 4], dim=dim, k=3
                    ),
                    args.repeats,
                )
                dim_section[str(dim)] = {
                    "n": n,
                    "neardup_sec": round(sec, 3),
                    "neardup_pairs": rows,
                    "knn_sec": round(ksec, 3),
                    "knn_rows": krows,
                }
            dim_section["neardup_cost_ratio_768_vs_64"] = round(
                dim_section["768"]["neardup_sec"]
                / dim_section["64"]["neardup_sec"],
                2,
            )

        print(json.dumps({
            "metric": "pair-join wall-clock growth exponent "
                      "(1.0=linear, 2.0=quadratic)",
            "scales": results,
            "growth_exponents": exponents,
            "dim_evidence": dim_section,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
