"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference declares a dedup store and never implements it
(reference: pkg/idempotent/repository.go:1-5); a 100 TB training-data
pipeline needs the full ladder:

- exact: hash-groupBy on a normalized fingerprint — one shuffle on the
  hash, combiner-friendly.
- n-gram Jaccard: explode-shingle → self-join on shingle → agg. The
  join is shuffle-on-shingle (hot shingles behave like hot keys — we
  drop top-frequency shingles like classic suffix-array dedup does).
- MinHash + LSH: per-doc signature (map-side only, no shuffle), band →
  bucket-join so candidate generation shuffles |docs|·n_bands rows,
  never the O(n²) pair space.
- SimHash: 32-bit sketch via bit-vote aggregation, hamming-adjacent
  buckets as the candidate filter.

Every sketch operator takes ``hash_fn``:

- ``"md5"`` (default): first 8 md5-hex chars → int. Chosen for
  cross-engine reproducibility (same value in DuckDB:
  ``('0x'||substr(md5(s),1,8))::BIGINT``) — the oracle-parity mode the
  driver correctness gate pins.
- ``"xxhash64"``: Spark's codegen'd non-cryptographic hash folded into
  the same [0, 2^32) range — the production mode: at 100 TB the
  per-shingle md5 is the dominant sketch CPU and buys nothing (dedup
  needs uniformity, not collision resistance). Bucket assignments
  differ between modes (different hash, different permutation), but
  the verified near-dup answer is the same — pinned by an equivalence
  test that verifies both modes' candidates against exact similarity.

``ngram_jaccard_pairs`` has no hash at all (it joins raw shingles), so
it takes no knob.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbus_spark.operators.text import fingerprint, tokens


def _h32(c: Column, hash_fn: str = "md5") -> Column:
    """Deterministic hash into [0, 2^32): md5-derived (reproducible in
    ANSI SQL, the oracle mode) or xxhash64-derived (codegen'd JVM hash,
    the production mode — several-fold cheaper per shingle)."""
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(c), F.lit(1 << 32)).cast("long")
    raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")


def _hash_bits(c: Column, n_bits: int, hash_fn: str = "md5") -> Column:
    """Deterministic hash with at least ``n_bits`` of entropy (≤ 60):
    the 32-bit ``_h32`` for narrow sketches (oracle-parity form), a
    60-bit md5 slice / folded xxhash64 for wide ones — a 32-bit base
    hash under a wider sketch would leave every bit ≥ 32 voting
    negative (zero entropy), which for the blocked near-dup tables
    means whole blocks of always-colliding zero buckets."""
    if n_bits <= 32:
        return _h32(c, hash_fn)
    if hash_fn == "md5":
        # 15 hex chars = 60 bits, fits a signed long
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    return F.pmod(F.xxhash64(c), F.lit(1 << 60)).cast("long")


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct normalized text: keeper id + copy count."""
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count("*").alias("n_copies"),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id representative of each duplicate group."""
    keepers = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keeper").alias(id_col)
    )
    # broadcast-free: semi join on the id (both sides shuffle on id)
    return df.join(keepers, on=id_col, how="left_semi")


def word_shingles(col: str | Column = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document.

    The token split is bound as a lambda variable (singleton-array
    transform) so it evaluates once per row — referenced directly
    inside the shingle lambda it would re-split the text once per
    shingle (the winnow_fingerprints evaluation-order lesson)."""

    def _shingles(toks: Column) -> Column:
        # guard: Spark's sequence(0, k) descends for k<0 — short docs
        # get an empty shingle set instead
        idx = F.when(
            F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
        ).otherwise(F.array().cast("array<int>"))
        return F.array_distinct(
            F.transform(
                idx,
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        )

    return F.get(F.transform(F.array(tokens(col)), _shingles), 0)


def shingles_exploded_arrow(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Distinct word n-gram shingles, EXPLODED (one row per (id,
    shingle)) — the Arrow throughput path for the shingle stage.
    Byte-identical strings to ``word_shingles`` + explode, computed
    with C-backed pandas kernels: explode + group-wise shift +
    vectorized concat — no per-row python. The Catalyst form evaluates
    an interpreted slice+array_join per shingle (~15 µs each, measured:
    3.9 s for 260k shingles at sf0.1); this path batches it all.

    Parity detail (a review caught the naive version diverging): Spark
    ``trim`` strips ONLY 0x20 spaces and Java ``\\s`` is ASCII-only,
    while pandas ``.str.strip()`` / Python ``\\s`` are Unicode-aware —
    so this path strips spaces explicitly and splits on the ASCII
    whitespace class, keeping tab-edged and NBSP-containing texts
    byte-identical to the JVM tokenization (pinned by a parity test
    with hostile whitespace)."""
    import pandas as pd

    # Java \s == [ \t\n\x0B\f\r]; Spark trim == strip 0x20 only
    _JAVA_WS = r"[ \t\n\x0b\f\r]+"

    def gen(it):
        for pdf in it:
            if not len(pdf):
                continue
            pdf = pdf.reset_index(drop=True)
            toks = (
                pdf[text_col]
                .str.strip(" ")
                .str.split(_JAVA_WS, regex=True)
                .explode()
            )
            g = toks.groupby(level=0)
            sh = toks
            for k in range(1, n):
                sh = sh + " " + g.shift(-k)
            sh = sh.dropna()
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[sh.index.to_numpy()],
                    "s": sh.to_numpy(),
                }
            ).drop_duplicates()  # array_distinct parity, per doc
            yield out

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        gen, schema=f"{id_col} {id_type}, s string"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.0,
    max_df: int | None = None,
) -> DataFrame:
    """Pairwise n-gram Jaccard similarity via explode + shuffle-join —
    the distributed formulation: |docs|·|shingles| rows shuffled, never
    the O(n²) pair matrix materialized below the threshold.

    ``max_df`` drops shingles occurring in more than that many docs
    before pairing — the classic document-frequency cut: a shingle
    shared by thousands of documents is non-discriminative but costs
    count² join rows (the hot-key blowup). With it set, similarity is
    Jaccard over the *rare-shingle* sets of each doc (set sizes are
    recomputed after the cut, so the measure stays a true Jaccard)."""
    sh = shingles_exploded_arrow(df, id_col, text_col, n)
    # materialize the exploded shingles once: the df-cut aggregate, the
    # size aggregate and BOTH sides of the self-join would otherwise
    # re-run the (expensive) shingling subtree 4x — the DataFrame
    # analog of the reference's refcount sharing (engine/packet.go)
    sh = sh.persist()
    if max_df is not None:
        rare = (
            sh.groupBy("s")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("s")
        )
        sh = sh.join(rare, on="s", how="left_semi")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    # set sizes join AFTER the pair aggregation: the shingle self-join
    # and the (id_a, id_b) shuffle are the heavy paths — keep their
    # rows at two ids wide; n_sh attaches to the (small) pair set
    pairs = (
        a.join(b, on="s")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("common"))
        .join(sizes.select(F.col(id_col).alias("id_a"),
                           F.col("n_sh").alias("n_a")), on="id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"),
                           F.col("n_sh").alias("n_b")), on="id_b")
    )
    jac = F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))
    out = pairs.select(
        "id_a", "id_b", F.round(jac, 4).alias("jaccard")
    ).filter(F.col("jaccard") > threshold)
    # materialize the (threshold-filtered, small) pair set eagerly and
    # release the shared shingle cache: without this every invocation
    # leaks its cached blocks into the session (localCheckpoint blocks
    # are reference-tracked and GC-cleaned, cacheManager entries are not)
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): hash every
    character ``k``-gram of the normalized text (the rolling hash —
    here the md5-derived h32 so the oracle reproduces it), then keep
    the minimum hash of every ``w``-wide window and dedup. Guarantees
    any match of length ≥ w+k-1 shares a fingerprint, at ~2/(w+1)
    selection density. Pure map-side Catalyst (one row per selected
    fingerprint) — the shuffle, if any, belongs to the downstream
    fingerprint join."""
    norm = F.regexp_replace(
        F.lower(F.trim(F.col(text_col))), r"\s+", " "
    )

    # Evaluation-order trap: referencing a per-row EXPRESSION inside a
    # higher-order-function lambda inlines it per ELEMENT (the norm
    # regex would run once per character position — measured O(n²),
    # 292 s for 5 k docs at sf0.1). Binding it as a lambda VARIABLE via
    # a singleton-array transform evaluates it once per row: lambda
    # vars are bound values, not expressions. Same trick for the hash
    # array before the window pass. 292 s → ~2 s, plan stays map-side.
    def _once(expr: Column, body) -> Column:
        return F.get(F.transform(F.array(expr), body), 0)

    def _grams(t: Column) -> Column:
        idx = F.when(
            F.length(t) >= k,
            F.sequence(F.lit(1), F.length(t) - k + 1),
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(idx, lambda i: _h32(t.substr(i, F.lit(k)), hash_fn))

    def _window_mins(hs: Column) -> Column:
        idx = F.when(
            F.size(hs) >= w,
            F.sequence(F.lit(1), F.size(hs) - w + 1),
        ).otherwise(F.array().cast("array<int>"))
        return F.array_distinct(
            F.transform(idx, lambda j: F.array_min(F.slice(hs, j, w)))
        )

    mins = _once(_once(norm, _grams), _window_mins)
    return df.select(
        F.col(id_col), F.explode_outer(mins).alias("fp")
    )


def winnow_match_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 50,
    hash_fn: str = "md5",
) -> DataFrame:
    """The MOSS match step over :func:`winnow_fingerprints`: pairs of
    documents sharing at least ``min_shared`` selected fingerprints,
    with the shared count — near-verbatim overlap detection (any
    common substring of length ≥ w+k-1 is guaranteed to surface at
    least one shared fingerprint). Same distributed geometry as the
    shingle-Jaccard join: shuffle on fingerprint, ``max_df`` cuts
    non-discriminative hot fingerprints (boilerplate shared by many
    docs) before the pair blowup, count aggregation on the (small)
    pair set."""
    # keep the PERSISTED reference separate from the df-cut rebinding:
    # unpersisting the semi-joined frame would be a no-op and leak the
    # cached fingerprint blocks into the session (review finding,
    # confirmed via getRDDStorageInfo)
    base = winnow_fingerprints(df, id_col, text_col, k, w, hash_fn).filter(
        F.col("fp").isNotNull()
    ).persist()
    fps = base
    if max_df is not None:
        rare = (
            base.groupBy("fp")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("fp")
        )
        fps = base.join(rare, on="fp", how="left_semi")
    a, b = fps.alias("a"), fps.alias("b")
    out = (
        a.join(b, on="fp")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    out = out.localCheckpoint(eager=True)  # release the shared scan
    base.unpersist()
    return out


def simhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_bits: int = 16,
    hash_fn: str = "md5",
) -> DataFrame:
    """SimHash near-dup candidates: docs whose sketches share the top
    ``prefix_bits`` bits land in one bucket and pair up — the cheap
    hamming-prefix filter (full hamming-distance verify happens on the
    tiny candidate set downstream). Bucket-join shuffle only."""
    sk = simhash(df, id_col, text_col, hash_fn=hash_fn).withColumn(
        "bucket", F.shiftright("simhash", 32 - prefix_bits)
    )
    a, b = sk.alias("a"), sk.alias("b")
    return (
        a.join(b, on="bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_bits: int = 16,
    max_hamming: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """SimHash near-duplicates, candidate + verify: prefix-bucket
    candidates (the cheap filter of ``simhash_candidate_pairs``) pass
    through the exact hamming-distance check —
    ``bit_count(xor(a, b)) <= max_hamming`` — entirely in the JVM.
    Bucket-join shuffle + per-candidate popcount; never O(n²).
    Classic Manku/Jain/Das Sarma near-dup detection, with the single
    prefix table as the (documented) recall trade-off: rotations/
    multi-prefix tables extend it the same way the SRP multi-table
    construction does in similarity.py."""
    sk = simhash(df, id_col, text_col, hash_fn=hash_fn).withColumn(
        "bucket", F.shiftright("simhash", 32 - prefix_bits)
    )
    a, b = sk.alias("a"), sk.alias("b")
    return (
        a.join(b, on="bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_neardup_pairs_blocked(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bits: int = 32,
    hash_fn: str = "md5",
) -> DataFrame:
    """SimHash near-duplicates with GUARANTEED full recall — the
    pigeonhole (blocked) construction of Manku/Jain/Das Sarma: split
    the ``n_bits`` sketch into ``max_hamming + 1`` equal blocks; two
    sketches within hamming distance ``max_hamming`` must agree exactly
    on at least one block (d differing bits cannot touch d+1 blocks),
    so bucketing each block into its own table and exact-verifying
    candidates returns EXACTLY the brute-force hamming-ball answer —
    unlike the single-prefix variant (``simhash_neardup_pairs``) whose
    recall depends on where the differing bits fall.

    Cost: shuffle = |docs|·(max_hamming+1) rows of (id, sketch, tbl,
    bucket); per-bucket pair fan-in is corpus/2^block_bits — with a
    32-bit sketch and d=3 that is 8-bit blocks (256 buckets), fine to
    ~10^5 docs per partition-disjoint domain; at larger corpora widen
    the sketch (n_bits=48 → 12-bit blocks, n_bits=60 → 15-bit; the
    packed long + 60-bit base hash cap n_bits at 60) to keep
    buckets sparse.
    All JVM: the sketch rides through the bucket join so the hamming
    verify is a codegen'd ``bit_count(xor)``, no second join."""
    if not 1 <= n_bits <= 60:
        raise ValueError(f"n_bits must be in [1, 60], got {n_bits}")
    n_blocks = max_hamming + 1
    block_bits = n_bits // n_blocks
    sk = simhash(df, id_col, text_col, n_bits, hash_fn)
    entries = F.array(
        *[
            F.struct(
                F.lit(t).cast("int").alias("tbl"),
                F.shiftright("simhash", t * block_bits)
                .bitwiseAND(F.lit((1 << block_bits) - 1))
                .alias("bucket"),
            )
            for t in range(n_blocks)
        ]
    )
    tb = sk.select(
        F.col(id_col), F.col("simhash"), F.explode(entries).alias("e")
    ).select(id_col, "simhash", F.col("e.tbl").alias("tbl"), F.col("e.bucket").alias("bucket"))
    a, b = tb.alias("a"), tb.alias("b")
    return (
        a.join(b, on=["tbl", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# Affine MinHash permutations over the prime field GF(p), p = 2^31-1.
# One (expensive, md5-based) base hash per shingle, then n cheap
# arithmetic permutations h_i(x) = (a_i*x + b_i) mod p -- the classic
# formulation; a_i*x stays < 2^62 so 64-bit arithmetic never overflows.
MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def minhash_coeffs(n_hashes: int, seed: int = 1337) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs shared by the Spark operator and the
    SQL oracle generator."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, MINHASH_P, size=n_hashes)
    b = rng.integers(0, MINHASH_P, size=n_hashes)
    return [(int(x), int(y)) for x, y in zip(a, b)]


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    shingle_n: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """MinHash signature: sig[i] = min over shingles of
    (h32(shingle) % p * a_i + b_i) % p. One md5 per shingle total;
    pure map-side -- no shuffle."""
    hashed = df.select(
        F.col(id_col),
        _shingle_hashes(text_col, shingle_n, hash_fn).alias("_hs"),
    )
    return hashed.select(
        F.col(id_col), minhash_sig_col(F.col("_hs"), n_hashes).alias("sig")
    )


def _shingle_hashes(
    text_col: str, shingle_n: int, hash_fn: str
) -> Column:
    """Base-hash every shingle once (the only md5/xxhash work in the
    MinHash operators)."""
    return F.transform(
        word_shingles(text_col, shingle_n),
        lambda s: _h32(s, hash_fn) % F.lit(MINHASH_P),
    )


def minhash_sig_col(hashes: Column, n_hashes: int) -> Column:
    """The signature as a composable COLUMN over pre-hashed shingles —
    the one implementation behind ``minhash_signature`` and the
    streaming near-dup filter (which must keep its other columns)."""
    coeffs = minhash_coeffs(n_hashes)

    def _perm(a: int, b: int):
        # must be a strictly unary lambda: pyspark counts every
        # parameter (defaults included) as a lambda argument
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)

    return F.array(
        *[
            F.array_min(F.transform(hashes, _perm(a, b)))
            for (a, b) in coeffs
        ]
    )


def _band_candidates(
    sigs: DataFrame, n_hashes: int, n_bands: int, id_col: str
) -> DataFrame:
    """Banded LSH candidate generation over a signature frame: explode
    each signature into (band, band-values) rows, bucket-join, emit
    distinct (id_a < id_b) pairs. The ONE implementation behind both
    ``lsh_candidate_pairs`` and ``lsh_estimated_jaccard`` — a banding
    change cannot silently diverge their candidate sets."""
    if n_hashes % n_bands != 0:
        # same guard as the streaming filter: a non-divisible split
        # silently drops the trailing signature slots from every band
        raise ValueError(
            f"n_hashes ({n_hashes}) must be divisible by n_bands "
            f"({n_bands})"
        )
    rows_per_band = n_hashes // n_bands
    bands = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.slice(
                            "sig", b * rows_per_band + 1, rows_per_band
                        ).alias("vals"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.vals")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, on=["band", "vals"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """MinHash-LSH candidate pairs: split the signature into bands,
    bucket-join on (band_idx, band values). Shuffle volume is
    |docs|·n_bands, and only same-bucket docs ever meet."""
    sigs = minhash_signature(df, id_col, text_col, n_hashes, shingle_n, hash_fn)
    return _band_candidates(sigs, n_hashes, n_bands, id_col)


def lsh_estimated_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """The MinHash payoff: for each LSH candidate pair, ESTIMATE the
    Jaccard similarity as the fraction of agreeing signature slots —
    E[agree/n] = J(a,b), the property MinHash exists for — without
    ever touching the documents again. Candidates and signatures share
    one signature computation (persisted scan); the estimate join
    moves only (id, sig) rows. At 100 TB this replaces the exact
    verify for pipelines that tolerate ±1/√n estimation error, keeping
    the whole dedup decision sketch-resident."""
    sigs = minhash_signature(
        df, id_col, text_col, n_hashes, shingle_n, hash_fn
    ).persist()
    cand = _band_candidates(sigs, n_hashes, n_bands, id_col)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("_sa"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("_sb"))
    agree = F.size(
        F.filter(
            F.zip_with(F.col("_sa"), F.col("_sb"), lambda x, y: x == y),
            lambda t: t,
        )
    )
    out = (
        cand.join(sa, on="id_a")
        .join(sb, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(agree / F.lit(n_hashes), 4).alias("est_jaccard"),
        )
    )
    out = out.localCheckpoint(eager=True)
    sigs.unpersist()
    return out


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 32,
    hash_fn: str = "md5",
) -> DataFrame:
    """SimHash sketch: bit j is the sign of the ±1 vote over all token
    hashes' j-th bits (token multiset, not distinct — classic SimHash).
    Single pass over the token array per row, no shuffle. ``n_bits``
    up to 60: the packed sketch must fit a signed long AND ``_hash_bits``
    supplies at most 60 bits of entropy (15 md5 hex chars / pmod 2^60
    on the xxhash64 path) — bits beyond the base hash's width would
    always vote negative and sit permanently at zero, the same
    degenerate-bit class the long-arithmetic packing fix addressed."""
    if not 1 <= n_bits <= 60:
        raise ValueError(f"n_bits must be in [1, 60], got {n_bits}")
    toks = tokens(text_col)
    # hash each token once, then fold the ±1 bit votes
    hashes = F.transform(toks, lambda t: _hash_bits(t, n_bits, hash_fn))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), n_bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1,
                        F.lit(1),
                    )
                    .otherwise(F.lit(-1))
                    .cast("long")
                    for j in range(n_bits)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    # bit j set iff vote > 0 — each element 2^j is a single power of
    # two (exactly representable in double for any j, then cast to
    # long), and the SUM runs in long arithmetic: the previous packing
    # summed in double, where a running total spanning >= 53 bits
    # silently dropped the low bits
    sh = F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(n_bits - 1)),
            lambda v, j: F.when(
                v > 0, F.pow(F.lit(2.0), j).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col), sh.alias("simhash"))


def doc_neardup_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    min_est_jaccard: float = 0.5,
    hash_fn: str = "md5",
    max_iter: int = 20,
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """Text-side near-duplicate GROUPS — the dedup decision step of a
    training-data pipeline: MinHash-LSH candidates → sketch-resident
    Jaccard estimate (documents never re-read) → edges with estimate ≥
    ``min_est_jaccard`` → connected components → every doc labelled
    with its group's min doc_id (``grp``). Keep-one-per-group is then
    ``filter(doc_id == grp)`` — a map-side predicate, no extra
    shuffle.

    Scale shape: candidate generation is band-bounded (shuffle =
    docs×bands), the estimate join moves (id, sig) rows only, and the
    CC step is size-adaptive (driver union-find under
    ``small_graph_threshold`` edges, distributed min-label propagation
    above — see ``graph.components_from_pairs``)."""
    from dbus_spark.operators.graph import components_from_pairs

    edges = lsh_estimated_jaccard(
        df, id_col, text_col, n_hashes, n_bands, shingle_n, hash_fn
    ).filter(F.col("est_jaccard") >= min_est_jaccard)
    return components_from_pairs(
        edges,
        df.select(F.col(id_col)),
        id_col,
        max_iter=max_iter,
        small_graph_threshold=small_graph_threshold,
    )
