"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; random-hyperplane
LSH bucketing as the scale path (bucket-join instead of the full cross
product). Pairwise dot products / norms in the verify stage run as
Catalyst higher-order functions (``aggregate``/``zip_with``) in the
JVM; the vector-vs-MANY-planes projections (SRP bucketing, IVF coarse
quantization) run as one Arrow ``pandas_udf`` doing a numpy
accumulation against the plane/centroid matrix — at production dims
(768–1536) × dozens of planes, literal-array expression trees would
make the PLAN itself the bottleneck (thousands of interpreted
higher-order-fold nodes; no codegen inside HOF lambdas).

FP-parity contract: the numpy path accumulates dimension-by-dimension
(``_fold_dots``), which is bit-identical to Catalyst's sequential
left-to-right double fold and to DuckDB's ``list_dot_product`` — so
the seeded-literal oracle SQL sees the exact same signs/argmax and the
value checks stay hash-exact. A plain ``V @ P.T`` (BLAS) uses blocked
summation and could flip a sign at a bucket boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dvec(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_dvec(a), _dvec(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pre(a, b, na, nb) -> Column:
    """Cosine with pre-computed norms. The higher-order-function fold
    is interpreted (no codegen inside lambdas), so norms recomputed
    per candidate PAIR cost 2× the dot product for nothing — compute
    them once per ROW before the join and carry the scalar. Same
    doubles, same association as :func:`cosine` (norm is the same
    sqrt-of-self-dot; the product order is unchanged)."""
    na = F.col(na) if isinstance(na, str) else na
    nb = F.col(nb) if isinstance(nb, str) else nb
    return dot(a, b) / (na * nb)


def knn_bruteforce(
    df: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the given query ids.

    The query side is tiny by construction → broadcast, so the scan of
    the big side is embarrassingly parallel (no shuffle until the
    per-query top-k, which is a k-row-per-partition aggregation).
    """
    q = df.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(vec_col).alias("q_n"),
    )
    cand = df.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(vec_col).alias("n_n"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(cand)
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            cosine_pre("q_vec", "n_vec", "q_n", "n_n").alias("_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("_sim").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id", "n_id", "rank", F.round("_sim", 4).alias("sim")
        )
    )


def neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine > threshold (brute force baseline)."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(vec_col).alias("na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(vec_col).alias("nb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_pre("va", "vb", "na", "nb"), 4).alias("sim"),
        )
        .filter(F.col("sim") > threshold)
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _fold_dots(V: np.ndarray, P: np.ndarray) -> np.ndarray:
    """<v, p> for every (row, plane) pair with LEFT-TO-RIGHT double
    association: acc_{i+1} = acc_i + v_i * p_i, vectorized across the
    whole (rows × planes) grid per dimension step. Bit-identical to
    Catalyst's ``aggregate(zip_with(...), 0.0, acc + x)`` and DuckDB's
    ``list_dot_product``, so sign/argmax decisions agree with the
    literal-plane oracle SQL exactly. dim python-loop steps of one
    (rows × planes) numpy FMA each — for batch 10k, 32 planes, dim
    1536 that's ~1.5e9 flops in 1536 vector ops: plenty fast, and the
    per-batch cost is O(rows·planes·dim) either way."""
    acc = np.zeros((V.shape[0], P.shape[0]), dtype=np.float64)
    for i in range(V.shape[1]):
        acc += V[:, i, None] * P[None, :, i]
    return acc


def _stack(vecs: pd.Series) -> np.ndarray:
    # array<float> arrives as a Series of float32 numpy arrays; the
    # cast to float64 is exact (widening), matching Catalyst's
    # cast("array<double>") before its fold.
    return np.stack(vecs.to_numpy()).astype(np.float64)


def lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 7,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane (SRP) bucket id per vector: bit i = sign of
    <v, plane_i>. Deterministic planes from the seed; one Arrow
    pandas_udf per batch against the (n_planes × dim) plane matrix —
    map-side only, no shuffle, plan size independent of dim. The plane
    matrix ships in the UDF closure (n_planes·dim doubles — ~400 KB at
    32×1536; use an explicit SparkContext.broadcast above ~10 MB)."""
    P = np.asarray(_hyperplanes(n_planes, dim, seed), dtype=np.float64)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf("long")
    def srp_bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        bits = (_fold_dots(_stack(vecs), P) > 0).astype(np.int64)
        return pd.Series(bits @ weights)

    return df.withColumn(out_col, srp_bucket(F.col(vec_col)))


def ivf_centroids(
    n_centroids: int, dim: int, seed: int = 11
) -> list[list[float]]:
    """Deterministic unit-norm 'centroids' from the seed — the IVF
    coarse quantizer stand-in AND the k-means init. Train real ones
    with :func:`kmeans_centroids` (a Spark job) and pass them via the
    ``centroids`` parameter; the assignment/probe machinery is
    identical either way, and seeding keeps the oracle reproducible."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, dim))
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    return c.tolist()


def _kpp_top(
    V: np.ndarray, ids: np.ndarray, C: np.ndarray, take: int
) -> tuple[np.ndarray, np.ndarray]:
    """Row indices of the ``take`` best k-means++ candidates in (V,
    ids) against chosen centroids C: largest min-cosine-distance,
    exact ties to the smaller id; returns (indices, all-row d). The
    ONE implementation both the
    distributed partial and the local replica call — the bit-for-bit
    Spark/oracle centroid parity is by construction, not by keeping
    two copies in sync (review finding). Zero-norm vectors (all-zero
    embeddings) are pinned to distance 0 — similarity undefined, so
    they must never be promoted to candidates; without the guard the
    0/0 NaN propagates into lexsort, whose NaN ordering can
    nondeterministically diverge the distributed trainer from the
    local oracle replica (advisor finding)."""
    nv = np.linalg.norm(V, axis=1)
    nc = np.linalg.norm(C, axis=1)
    denom = np.where(nv == 0, 1.0, nv)[:, None] * np.where(
        nc == 0, 1.0, nc
    )[None, :]
    sims = _fold_dots(V, C) / denom
    d = 1.0 - sims.max(axis=1)
    d = np.where(nv == 0, 0.0, d)
    return np.lexsort((ids, -d))[:take], d


def kmeanspp_init(
    df: DataFrame,
    dim: int,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    batch: int = 5,
) -> list[list[float]]:
    """Deterministic farthest-point (k-means‖-style batched greedy
    k-means++) initialization: start from the lowest-id vector, then
    per round add the ``batch`` vectors with the largest min-distance
    to the chosen set (distance 1 - <v,c>/(|v||c|); exact ties break
    to the smaller id; intra-batch interactions ignored, the standard
    k-means|| oversampling trade-off — Lloyd iterations clean up any
    same-batch redundancy). ceil((k-1)/batch) distributed scans
    instead of k-1: each partition reduces to its top-``batch``
    candidates via a mapInPandas partial, the driver merges the tiny
    candidate rows and appends the global top-``batch``.

    Deterministic and engine-replicable: chosen centroids are actual
    data vectors (float32 values, no arithmetic wobble) rounded to the
    same 6-decimal protocol as the Lloyd iterations, distances use the
    fold-exact dots, and the selection rule is a pure function of the
    per-row (d, id) pairs — so :func:`kmeanspp_init_local` reproduces
    the choices bit-for-bit regardless of partitioning."""
    first = (
        df.orderBy(F.col(id_col).asc())
        .select(vec_col)
        .limit(1)
        .collect()[0][0]
    )
    if len(first) != dim:
        raise ValueError(
            f"kmeanspp_init: dim={dim} but {vec_col} vectors have "
            f"{len(first)} components"
        )
    chosen = [np.round(np.asarray(first, dtype=np.float64), 6)]

    while len(chosen) < n_centroids:
        C = np.stack(chosen)
        take = min(batch, n_centroids - len(chosen))

        def partial(it):
            rows = []
            for pdf in it:
                if not len(pdf):
                    continue
                V = _stack(pdf[vec_col])
                ids = pdf[id_col].to_numpy()
                top, d = _kpp_top(V, ids, C, take)
                rows.append(
                    pd.DataFrame(
                        {
                            "d": d[top],
                            "id": ids[top],
                            "v": [V[i].tolist() for i in top],
                        }
                    )
                )
            if rows:
                yield pd.concat(rows, ignore_index=True)

        cands = df.select(id_col, vec_col).mapInPandas(
            partial, schema="d double, id long, v array<double>"
        ).collect()
        cands.sort(key=lambda r: (-r.d, r.id))
        for r in cands[:take]:
            chosen.append(np.round(np.asarray(r.v, dtype=np.float64), 6))
    return [c.tolist() for c in chosen]


def kmeanspp_init_local(
    V: np.ndarray, ids: np.ndarray, n_centroids: int = 16, batch: int = 5
) -> list[list[float]]:
    """numpy replica of :func:`kmeanspp_init` (same rounding, same
    fold-exact distances, same batched selection and tie-break) for
    the oracle generator."""
    V = V.astype(np.float64)
    order0 = np.argsort(ids, kind="stable")
    chosen = [np.round(V[order0[0]], 6)]
    while len(chosen) < n_centroids:
        C = np.stack(chosen)
        take = min(batch, n_centroids - len(chosen))
        top, _ = _kpp_top(V, ids, C, take)
        for i in top:
            chosen.append(np.round(V[i], 6))
    return [c.tolist() for c in chosen]


def kmeans_centroids(
    df: DataFrame,
    dim: int,
    n_centroids: int = 16,
    seed: int = 11,
    n_iter: int = 5,
    vec_col: str = "embedding",
    init: str = "seeded",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Spherical k-means (Lloyd's) over the embedding table — the
    training pass that turns the seeded IVF stand-ins into real
    coarse-quantizer centroids. ``init``: "seeded" (random unit
    vectors from the seed — oracle-stable anywhere) or "kpp"
    (:func:`kmeanspp_init` — data-spread farthest-point starts,
    k extra scans). Each iteration is ONE distributed scan:
    ``mapInPandas`` assigns every vector to its max-dot centroid and
    emits per-partition partial (sum, count) per cell — k·dim doubles
    per partition, so the driver combine handles scalars-sized data
    regardless of corpus size (the same rounds-only driver discipline
    as ``neardup_groups``). New centroid = unit-normalized mean of its
    cell, empty cells keep their previous centroid.

    Determinism/oracle contract: centroids are ROUNDED to 6 decimals
    after every iteration (including the seeded init), so the values
    are exact decimal literals. Assignments use the fold-exact dots
    against those rounded literals, and the ~1e-12 summation-order
    wobble between this distributed combine and the single-pass numpy
    replica (:func:`kmeans_centroids_local`) is quashed by the
    rounding — the two trainers produce identical centroids, which is
    what lets the DuckDB oracle inline them."""
    if init == "kpp":
        C = np.asarray(
            kmeanspp_init(df, dim, n_centroids, vec_col, id_col),
            dtype=np.float64,
        )
    else:
        C = np.round(
            np.asarray(
                ivf_centroids(n_centroids, dim, seed), dtype=np.float64
            ),
            6,
        )
    for _ in range(n_iter):
        C_cur = C.copy()

        def partials(it):
            sums = np.zeros((n_centroids, dim), dtype=np.float64)
            cnts = np.zeros(n_centroids, dtype=np.int64)
            for pdf in it:
                if not len(pdf):
                    continue
                V = _stack(pdf[vec_col])
                cells = np.argmax(_fold_dots(V, C_cur), axis=1)
                for c in np.unique(cells):
                    m = cells == c
                    sums[c] += V[m].sum(axis=0)
                    cnts[c] += int(m.sum())
            yield pd.DataFrame(
                {
                    "cell": np.arange(n_centroids, dtype=np.int32),
                    "n": cnts,
                    "s": list(sums),
                }
            )

        part = df.select(vec_col).mapInPandas(
            partials, schema="cell int, n long, s array<double>"
        ).toPandas()
        # combine in (partition, cell) order — toPandas preserves
        # partition order, so the fold is deterministic per input
        for c in range(n_centroids):
            rows = part[part["cell"] == c]
            n = int(rows["n"].sum())
            if n == 0:
                continue
            v = np.sum(np.stack(rows["s"].to_numpy()), axis=0) / n
            nv = np.linalg.norm(v)
            if nv > 0:
                v = v / nv
            C[c] = np.round(v, 6)
    return C.tolist()


def kmeans_centroids_local(
    V: np.ndarray,
    n_centroids: int = 16,
    seed: int = 11,
    n_iter: int = 5,
    init: str = "seeded",
    ids: np.ndarray | None = None,
) -> list[list[float]]:
    """Single-process numpy replica of :func:`kmeans_centroids` — used
    by the DuckDB oracle generator (which has no SparkSession) and by
    equivalence tests. Identical math: same init (seeded or kpp, the
    latter needs ``ids``), fold-exact assignment dots, unit-normalized
    means, 6-decimal rounding per iteration."""
    dim = V.shape[1]
    V = V.astype(np.float64)
    if init == "kpp":
        if ids is None:
            raise ValueError(
                "kmeans_centroids_local: init='kpp' requires the ids "
                "array (the tie-break key of the candidate selection)"
            )
        C = np.asarray(
            kmeanspp_init_local(V, ids, n_centroids), dtype=np.float64
        )
    else:
        C = np.round(
            np.asarray(
                ivf_centroids(n_centroids, dim, seed), dtype=np.float64
            ),
            6,
        )
    for _ in range(n_iter):
        cells = np.argmax(_fold_dots(V, C), axis=1)
        for c in range(n_centroids):
            m = cells == c
            if not m.any():
                continue
            v = V[m].sum(axis=0) / int(m.sum())
            nv = np.linalg.norm(v)
            if nv > 0:
                v = v / nv
            C[c] = np.round(v, 6)
    return C.tolist()


def save_centroids(centroids: list[list[float]], path: str) -> None:
    """Persist trained centroids as exact decimal text (json of repr
    floats round-trips bit-exactly — 6-dp decimals by construction)."""
    import json

    with open(path, "w") as f:
        json.dump(centroids, f)


def load_centroids(path: str) -> list[list[float]]:
    import json

    with open(path) as f:
        return json.load(f)


def _centroid_dots(vec_col: str, centroids: list[list[float]]) -> Column:
    """array of <v, c_i> per centroid — the coarse-quantizer scores.
    One Arrow pandas_udf against the (n_centroids × dim) matrix; the
    fold-exact accumulation keeps argmax/probe-order decisions
    identical to the literal-centroid oracle SQL."""
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def cdots(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        # a null vector must not kill the whole Arrow batch (the
        # null-signature lesson): stand in a zero vector — dots all 0,
        # deterministic first-cell argmax; streaming consumers carry
        # the original null alongside and handle it explicitly
        na = vecs.isna()
        if na.any():
            vecs = vecs.copy()
            vecs[na] = pd.Series(
                [np.zeros(C.shape[1], dtype=np.float64)] * int(na.sum()),
                index=vecs.index[na],
            )
        return pd.Series(list(_fold_dots(_stack(vecs), C)))

    return cdots(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def ivf_assign(
    df: DataFrame,
    dim: int,
    n_centroids: int = 16,
    seed: int = 11,
    vec_col: str = "embedding",
    out_col: str = "cell",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Assign each vector to its nearest centroid (max dot product,
    first index on ties) — map-side only, the IVF inverted-list key.
    At scale this is the partitioning column of the vector table.
    ``centroids`` overrides the seeded stand-ins with a trained set
    (:func:`kmeans_centroids`)."""
    cents = centroids if centroids is not None else ivf_centroids(
        n_centroids, dim, seed
    )
    # materialize the UDF result once; argmax reads the attribute twice
    return (
        df.withColumn("_cdots", _centroid_dots(vec_col, cents))
        .withColumn(
            out_col,
            (
                F.array_position(F.col("_cdots"), F.array_max("_cdots")) - 1
            ).cast("int"),
        )
        .drop("_cdots")
    )


def knn_ivf(
    df: DataFrame,
    query_ids: list[int],
    dim: int,
    k: int = 3,
    n_centroids: int = 16,
    n_probes: int = 4,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: vectors live in their nearest-centroid cell; a
    query probes its ``n_probes`` best cells and exact-scores only
    those inverted lists. The scan side shuffles once on ``cell``;
    the (tiny) probe side broadcasts — candidates are
    |docs|·n_probes/n_centroids in expectation, never O(n²).
    Complements SRP-LSH (`knn_lsh`): IVF recall degrades gracefully
    with n_probes instead of collapsing with bucket width.
    ``centroids`` plugs in a trained coarse quantizer
    (:func:`kmeans_centroids`); default is the seeded stand-ins."""
    cents = centroids if centroids is not None else ivf_centroids(
        n_centroids, dim, seed
    )
    assigned = ivf_assign(df, dim, n_centroids, seed, vec_col, centroids=cents)
    probes = (
        df.filter(F.col(id_col).isin(query_ids))
        # materialize the UDF column BEFORE the generator: posexplode
        # of a raw UDF expression makes InferFiltersFromGenerate
        # synthesize a size()>0 filter that re-evaluates the UDF (the
        # doc_minhash trap); exploding the attribute is evaluate-once
        .withColumn("_cdots", _centroid_dots(vec_col, cents))
        .select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            norm(vec_col).alias("q_n"),
            F.posexplode("_cdots").alias("cell", "cdot"),
        )
        .withColumn(
            "prank",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.col("cdot").desc(), F.col("cell").asc()
                )
            ),
        )
        .filter(F.col("prank") <= n_probes)
        .select("q_id", "q_vec", "q_n", "cell")
    )
    cand = assigned.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(vec_col).alias("n_n"),
        "cell",
    )
    scored = (
        F.broadcast(probes)
        .join(cand, on="cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            cosine_pre("q_vec", "n_vec", "q_n", "n_n").alias("_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("_sim").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("_sim", 4).alias("sim"))
    )


def lsh_bucket_tables(
    df: DataFrame,
    dim: int,
    n_tables: int = 8,
    planes_per_table: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table SRP bucketing: ``n_tables`` independent hash tables
    of ``planes_per_table`` hyperplanes each. A pair of vectors is a
    candidate if they collide in ANY table — the OR-construction that
    trades a little extra shuffle (|docs|·n_tables rows, ids only) for
    much higher recall than a single 2^k-bucket table.

    Output: one (id, tbl, bucket) row per vector per table — the
    exploded candidate-key stream, vectors NOT carried (the shuffle
    payload stays two ints + the id). All n_tables·planes_per_table
    projections happen in ONE Arrow pandas_udf against the stacked
    plane matrix (fold-exact, see module docstring) — plan size is
    independent of dim and table count."""
    P = np.asarray(
        _hyperplanes(n_tables * planes_per_table, dim, seed),
        dtype=np.float64,
    )
    weights = 1 << np.arange(planes_per_table, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def srp_table_buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        bits = (_fold_dots(_stack(vecs), P) > 0).astype(np.int64)
        buckets = bits.reshape(len(vecs), n_tables, planes_per_table) @ weights
        return pd.Series(list(buckets))

    return df.withColumn(
        "_tb", srp_table_buckets(F.col(vec_col))
    ).select(
        F.col(id_col), F.posexplode("_tb").alias("tbl", "bucket")
    )


def neardup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.4,
    dim: int = 64,
    n_tables: int = 8,
    planes_per_table: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via multi-table SRP-LSH — the 100 TB shape:

    1. candidate generation: bucket-join on (table, bucket) over an
       ids-only exploded stream (shuffle = |docs|·n_tables tiny rows;
       per-bucket pair blowup bounded by 2^planes_per_table fan-in, the
       same hot-key geometry as the MinHash band join) — never O(n²);
    2. ``distinct`` collapses pairs colliding in several tables before
       any vector is touched;
    3. exact-cosine verify: the small candidate set joins back to the
       vectors (two hash joins on id) and is filtered on the threshold.

    Same output contract as ``neardup_pairs`` restricted to candidate
    pairs; recall is the standard LSH OR-construction bound
    (1 - (1 - (1-θ/π)^m)^T for angle θ), NOT 1.0 — near-dups at
    cos ≥ .95 are found with P > .9999 at the defaults, low-similarity
    pairs may be missed by design. The DuckDB oracle mirrors the exact
    same construction (literal hyperplanes), so the value check is
    exact over the implemented semantics.

    ``max_bucket`` drops (table, bucket) cells holding more than that
    many vectors before pairing — the bucket-join analog of the
    Jaccard ``max_df`` cut: a degenerate cell (e.g. a dense region all
    hashing together) costs |cell|² join rows while its pairs are the
    least informative; capping bounds the worst hot key at
    max_bucket² regardless of data skew. Off by default (the oracle
    mirrors the uncapped construction)."""
    tb = lsh_bucket_tables(
        df, dim, n_tables, planes_per_table, seed, id_col, vec_col
    )
    if max_bucket is not None:
        # window count, not groupBy+semi-join: the cap rides the SAME
        # (tbl, bucket) shuffle the pair join needs — a semi-join form
        # would re-evaluate the whole projection subtree for both the
        # aggregate branch and the probe side (review finding)
        tb = (
            tb.withColumn(
                "_n",
                F.count("*").over(Window.partitionBy("tbl", "bucket")),
            )
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    a, b = tb.alias("a"), tb.alias("b")
    cand = (
        a.join(b, on=["tbl", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(vec_col).alias("na"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(vec_col).alias("nb"),
    )
    return (
        cand.join(va, on="id_a")
        .join(vb, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine_pre("va", "vb", "na", "nb"), 4).alias("sim"),
        )
        .filter(F.col("sim") > threshold)
    )


def neardup_pairs_ivf(
    df: DataFrame,
    threshold: float = 0.4,
    dim: int = 64,
    n_centroids: int = 16,
    n_probes: int = 2,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    max_cell: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via IVF cells — the second scale path
    beside SRP-LSH (``neardup_pairs_lsh``): each vector indexes into
    its ``n_probes`` best coarse-quantizer cells (multi-probe on the
    INDEX side, so two vectors straddling a cell boundary still meet
    in the runner-up cell); pairs sharing any cell are candidates,
    then exact-cosine verified. Candidate volume is
    |docs|²·n_probes²/n_centroids in expectation per shared cell —
    bounded by the quantizer, never O(n²); with a TRAINED quantizer
    (``kmeans_centroids``) cells track the data distribution, which is
    what makes this the preferred path when the corpus is clustered
    (IVF recall degrades gracefully with n_probes; SRP recall is fixed
    by plane count at index time).

    ``max_cell`` mirrors ``max_bucket`` on the LSH path: drop cells
    holding more vectors than the cap before pairing (off by default;
    the oracle mirrors the uncapped construction)."""
    cents = centroids if centroids is not None else ivf_centroids(
        n_centroids, dim, seed
    )
    k = len(cents)
    # top-P cells, map-side: sort struct(dot, -cell) DESC == dot DESC
    # then cell ASC (the tie rule the argmax/oracle row_number uses)
    entries = F.slice(
        F.sort_array(
            F.zip_with(
                _centroid_dots(vec_col, cents),
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda d, c: F.struct(
                    d.alias("d"), (-c).alias("negc")
                ),
            ),
            asc=False,
        ),
        1,
        n_probes,
    )
    probed = df.select(
        F.col(id_col), F.explode(entries).alias("e")
    ).select(id_col, (-F.col("e.negc")).cast("int").alias("cell"))
    if max_cell is not None:
        probed = (
            probed.withColumn(
                "_n", F.count("*").over(Window.partitionBy("cell"))
            )
            .filter(F.col("_n") <= max_cell)
            .drop("_n")
        )
    a, b = probed.alias("a"), probed.alias("b")
    cand = (
        a.join(b, on="cell")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(vec_col).alias("na"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(vec_col).alias("nb"),
    )
    return (
        cand.join(va, on="id_a")
        .join(vb, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine_pre("va", "vb", "na", "nb"), 4).alias("sim"),
        )
        .filter(F.col("sim") > threshold)
    )


def neardup_groups(
    df: DataFrame,
    threshold: float = 0.4,
    dim: int = 64,
    n_tables: int = 8,
    planes_per_table: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 20,
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """Near-duplicate GROUPS: connected components over the verified
    LSH pair graph, labelling every vector with the minimum id
    reachable through above-threshold edges — the step that turns a
    pair list into dedup groups (keep one representative per group).

    Two execution strategies, picked by measured edge count (the same
    size-adaptive philosophy as broadcast-join thresholds):

    - edge list ≤ ``small_graph_threshold``: union-find on the driver
      over the (ids-only, bounded) collected pairs — near-dup graphs
      are usually tiny relative to the corpus, and the distributed
      loop's per-round scheduling (~1 s/round here) dwarfs the actual
      work. The collect is explicitly bounded by the threshold.
    - larger: iterative min-label propagation — the standard
      distributed CC formulation (each round: every node takes the min
      label among itself and its neighbors; one join + one
      aggregation, all data-parallel; the driver only schedules rounds
      and checks a scalar convergence count). Dense near-dup clusters
      converge in O(log d) ≈ 2-4 rounds; each round localCheckpoints
      the (nodes-in-edges only) label frame so plans don't grow.

    Both strategies compute the identical min-label fixpoint
    (equivalence pinned by test); the CC core is shared with the
    text-side ``dedup.doc_neardup_groups`` via
    ``graph.components_from_pairs``."""
    from dbus_spark.operators.graph import components_from_pairs

    pairs = neardup_pairs_lsh(
        df, threshold, dim, n_tables, planes_per_table, seed,
        id_col, vec_col,
    )
    return components_from_pairs(
        pairs,
        df.select(F.col(id_col)),
        id_col,
        max_iter=max_iter,
        small_graph_threshold=small_graph_threshold,
    )


def knn_lsh(
    df: DataFrame,
    query_ids: list[int],
    dim: int,
    k: int = 3,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's SRP
    bucket — the scale path: the bucket-join shuffles |docs| rows into
    2^n_planes groups instead of scanning everything per query."""
    bucketed = lsh_bucket(df, dim, n_planes, seed, vec_col)
    q = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(vec_col).alias("q_n"),
        F.col("bucket"),
    )
    cand = bucketed.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(vec_col).alias("n_n"),
        F.col("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(cand, on="bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            cosine_pre("q_vec", "n_vec", "q_n", "n_n").alias("_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("_sim").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("_sim", 4).alias("sim"))
    )


def semdedup(
    df: DataFrame,
    threshold: float = 0.4,
    dim: int = 64,
    n_centroids: int = 16,
    seed: int = 11,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public):
    cluster-scoped SEMANTIC dedup over an embedding column.  Vectors
    are coarse-clustered (the IVF assignment — seeded stand-ins or a
    :func:`kmeans_centroids` quantizer); within each cluster, pairs
    above the cosine ``threshold`` are semantic duplicates, and of
    any duplicate pair the survivor is the one FARTHER from the
    centroid (the paper's keep-rule: low centroid-cosine = the more
    marginal, information-adding example), ties broken by id.

    Exact rule (deterministic, oracle-replayable): a row x is DROPPED
    iff some y in the same cell has round(cos(x,y),4) > threshold and
    (round(cos(y,cent)),4), y.id) < ((round(cos(x,cent)),4), x.id).
    On a chain a~b, b~c (a best-ranked) this drops BOTH b and c —
    slightly more aggressive than keep-one-per-component, and join-
    expressible without an iterative CC pass (use
    :func:`neardup_groups` when component semantics matter).

    Output: the kept rows, ``(id, cell, cent_sim)``.

    Scale shape (the reason SemDeDup beats pairwise near-dup at
    100 TB): the only pair join is WITHIN cells — shuffle keys on the
    cell id, candidate count is sum of cell-size², never corpus².
    The cluster count is the knob (the paper uses ~100k clusters at
    web scale, keeping cells ~1e4 rows); centroid assignment is one
    map-side Arrow pass.  Hot-cell skew mitigations are the IVF
    family's (cap or split oversized cells — `neardup_pairs_ivf`'s
    ``max_cell``).  Centroid norms are injected as literals computed
    once at plan time, so the Spark plan and the SQL oracle consume
    bit-identical constants.
    """
    cents = centroids if centroids is not None else ivf_centroids(
        n_centroids, dim, seed
    )
    cnorms = [float(np.sqrt(np.dot(np.asarray(c), np.asarray(c)))) for c in cents]
    base = (
        df.withColumn("_cdots", _centroid_dots(vec_col, cents))
        .withColumn(
            "cell",
            (
                F.array_position(F.col("_cdots"), F.array_max("_cdots")) - 1
            ).cast("int"),
        )
        .withColumn("_cdot", F.element_at("_cdots", F.col("cell") + 1))
        .withColumn(
            "_cnorm",
            F.element_at(
                F.array(*[F.lit(x) for x in cnorms]), F.col("cell") + 1
            ),
        )
        .withColumn("_vnorm", norm(vec_col))
        .select(
            F.col(id_col),
            "cell",
            F.round(F.col("_cdot") / (F.col("_vnorm") * F.col("_cnorm")), 4)
            .alias("cent_sim"),
            F.col(vec_col).alias("_vec"),
            F.col("_vnorm"),
        )
    )
    x = base.select(
        F.col(id_col).alias("_x_id"),
        F.col("cell"),
        F.col("cent_sim").alias("_x_cs"),
        F.col("_vec").alias("_x_vec"),
        F.col("_vnorm").alias("_x_n"),
    )
    y = base.select(
        F.col(id_col).alias("_y_id"),
        F.col("cell"),
        F.col("cent_sim").alias("_y_cs"),
        F.col("_vec").alias("_y_vec"),
        F.col("_vnorm").alias("_y_n"),
    )
    dropped = (
        x.join(y, on="cell")
        .filter(F.col("_x_id") != F.col("_y_id"))
        .filter(
            (F.col("_y_cs") < F.col("_x_cs"))
            | (
                (F.col("_y_cs") == F.col("_x_cs"))
                & (F.col("_y_id") < F.col("_x_id"))
            )
        )
        .filter(
            F.round(
                cosine_pre("_x_vec", "_y_vec", "_x_n", "_y_n"), 4
            )
            > threshold
        )
        .select(F.col("_x_id").alias(id_col))
        .distinct()
    )
    return base.join(dropped, on=id_col, how="left_anti").select(
        id_col, "cell", "cent_sim"
    )
