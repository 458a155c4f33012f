"""Streaming NEAR-duplicate filtering — the stateful twin of
``dedup.doc_neardup_groups``.

The exact-dedup stage of the ingest vertical
(``dropDuplicatesWithinWatermark`` on a fingerprint) only collapses
byte-identical re-crawls; a crawl re-ingest also carries *near*
duplicates (boilerplate edits, timestamp stamps). This operator drops
a document when it is a MinHash-LSH near-duplicate (signature
agreement ≥ threshold) of an EARLIER-ARRIVED document, with state
bounded by a rep TTL + per-bucket cap — semantics mirroring
``dropDuplicatesWithinWatermark`` but under approximate equality.

Geometry (the 100 TB shape, reference parity: dbus declares a dedup
store and never builds one — pkg/idempotent/repository.go:1-5):

- map side: one signature per doc (``minhash_sig_col``), exploded
  into ``n_bands`` band rows keyed by xxhash64(band, band-values) —
  the SAME banded candidate scheme as the batch LSH ladder, so a pair
  findable by ``lsh_candidate_pairs`` is findable here;
- state: ``applyInPandasWithState`` over ``pmod(bucket,
  n_state_buckets)`` coarse groups (the ordering operator's
  key-coarsening idiom — a handful of fat state cells instead of one
  tiny cell per LSH bucket). Each cell holds per-bucket rep
  signatures as plain numpy arrays (version-tagged pickle, the
  ordering wire-format contract);
- verdicts: each band row comes back with ``is_dup``; a doc is a
  duplicate iff ANY band says so. All of a doc's band rows are
  produced from the same input batch, so the OR is a plain batch
  aggregation per micro-batch — ``resolve_neardup_verdicts`` inside
  the caller's ``foreachBatch`` (composition shown in
  ``neardup_filter_foreach_batch``).

Semantics and bounds:

- "earlier-arrived" is (ts, id) order: within a batch, rows are
  processed in that order (a doc can be a dup of an earlier doc of
  the SAME batch); across batches, state carries the reps. A dup is
  never added as a rep in the bucket where it matched, so chains
  collapse onto first-seen canonicals (a doc matching only a dropped
  doc in some OTHER band bucket reads as dup-of-dup — still a
  near-dup chain member, by design).
- reps expire ``rep_ttl_ms`` after their last sighting (watermark
  clock) — the dedup guarantee is "within the TTL horizon", exactly
  like dropDuplicatesWithinWatermark's contract, and state stays
  bounded by active-bucket count x cap.
- ``max_reps_per_bucket`` bounds any one cell against degenerate
  buckets (the max_df/max_bucket analog): overflow reps are NOT
  stored (documented under-dedup, never over-drop).

Recall is the banded-LSH bound (same bands as the batch ladder); the
decision rule (signature agreement ≥ ``min_est_jaccard``) is the
``lsh_estimated_jaccard`` estimator, sketch-resident — text is never
re-read from state.
"""

from __future__ import annotations

import pickle
from typing import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from dbus_spark.operators.dedup import (
    MINHASH_P,
    _shingle_hashes,
    minhash_coeffs,
    minhash_sig_col,
)

_STATE_FMT_V1 = b"\x01"

# polynomial-rolling base for combining token hashes into shingle
# hashes (any constant < MINHASH_P works; part of the sig scheme)
_ROLL_B = 1_000_003

# Java \s is ASCII-only and Spark trim strips 0x20 only — the JVM
# tokenization parity lesson (see dedup.shingles_exploded_arrow)
_JAVA_WS = r"[ \t\n\x0b\f\r]+"


def token_hash_arrays(
    texts: pd.Series,
) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """Tokenize-and-hash stage shared by the n-gram kernel and the
    fused LM probe: ``(doc_of, token_hash, notna)`` — one int64 hash
    per token (``hash_pandas_object % MINHASH_P``, the same scheme
    ``text.hash_unigram_lm`` builds its tables with), ``doc_of`` the
    owning text's positional index, ``notna`` False for the single
    NaN token a null text explodes to.  Tokenization is the Java-\\s+
    parity split (see ``dedup.shingles_exploded_arrow``)."""
    toks = (
        texts.reset_index(drop=True)
        .str.strip(" ")
        .str.split(_JAVA_WS, regex=True)
        .explode()
    )
    doc_of_t = toks.index.to_numpy()
    th = (
        pd.util.hash_pandas_object(toks, index=False).to_numpy()
        % np.uint64(MINHASH_P)
    ).astype(np.int64)
    return doc_of_t, th, toks.notna().to_numpy()


def ngram_hash_arrays(
    texts: pd.Series, shingle_n: int
) -> "tuple[np.ndarray, np.ndarray]":
    """Shared n-gram hash kernel: returns ``(doc_of, gram_hash)`` —
    one int64 polynomial-roll hash per in-document token n-gram, with
    ``doc_of`` the (non-decreasing) positional index of the owning
    text.  This is exactly the shingle-hash stage of
    :func:`minhash_sigs_pandas` (same tokenization parity, same roll
    scheme, same null handling), factored out so other map-side
    consumers (streaming decontam's hash mode) get the measured fast
    path instead of re-growing a per-row string-concat loop."""
    doc_of_t, th, notna = token_hash_arrays(texts)
    return _ngram_roll(doc_of_t, th, notna, shingle_n)


def _ngram_roll(
    doc_of_t: np.ndarray,
    th: np.ndarray,
    notna: np.ndarray,
    shingle_n: int,
) -> "tuple[np.ndarray, np.ndarray]":
    """Roll token hashes into in-document n-gram hashes — split from
    :func:`ngram_hash_arrays` so a fused consumer that already holds
    the token stage (the one-pass enrich+policy UDF) pays it once."""
    m = len(th) - (shingle_n - 1)
    if m <= 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    acc = th[:m].copy()
    for k in range(1, shingle_n):
        acc = (acc * _ROLL_B + th[k : m + k]) % MINHASH_P
    # a window is a shingle iff it stays inside one doc; doc_of is
    # non-decreasing, so equal endpoints ⇒ the whole window matches
    valid = doc_of_t[:m] == doc_of_t[shingle_n - 1 : m + shingle_n - 1]
    # a null text explodes to a single NaN token (always alone in
    # its doc): masking the window START kills exactly those
    # windows — matters only for shingle_n == 1, where the NaN
    # "shingle" would otherwise match across null docs
    valid &= notna[:m]
    return doc_of_t[:m][valid], acc[valid]


def minhash_sigs_pandas(
    texts: pd.Series,
    ids: pd.Series,
    n_hashes: int = 16,
    shingle_n: int = 3,
) -> np.ndarray:
    """Vectorized (pandas/numpy) MinHash signatures — the streaming
    path's signature kernel, shared verbatim by the test replica so
    stream decisions and the sequential reference use identical
    sketches. The Catalyst form (``minhash_sig_col``) costs ~0.65 ms
    per document in interpreted HOF evaluation (measured: 8.2 s for a
    12.5k-doc micro-batch — the whole operator's budget); this batches
    the same construction through C kernels. Hashing differs from the
    Catalyst form (``hash_pandas_object`` vs xxhash64), which is fine:
    the stateful operator only ever compares ITS OWN sketches — but it
    also means the signature scheme is part of the checkpoint contract
    (don't change n_hashes/shingle_n/hash on a live checkpoint).

    Documents with fewer than ``shingle_n`` tokens have no shingles;
    they get a per-doc unique sentinel signature so they never match
    anything — near-dup similarity is undefined for them, and 'always
    kept, never stored' is the only non-surprising answer. Integer ids
    keep the original ``-id-1`` sentinel (checkpoint compat); any other
    id dtype (string doc ids are a public-API option) derives it from a
    64-bit hash of the id instead of crashing the Arrow UDF on the
    int64 cast (ADVICE r4)."""
    n = len(texts)
    out = np.empty((n, n_hashes), dtype=np.int64)
    # shingle hash = polynomial roll of the TOKEN hashes — one string
    # hash per token, then pure int64 arithmetic. The r4 form built
    # shingle STRINGS (`tok + " " + shift(-k)`) before hashing: the
    # object-dtype concat was 55% of the kernel (0.22 s of 0.39 s per
    # 12.5k docs, measured r5). Rolling keeps every intermediate
    # < 2^62 (operands < P = 2^31-1), so no int64 overflow. This
    # changes the signature scheme vs r4 — part of the checkpoint
    # contract (don't upgrade across a live checkpoint), same as the
    # hash_pandas_object-vs-xxhash64 note above.
    doc_of, base = ngram_hash_arrays(texts, shingle_n)
    # one (shingles × n_hashes) affine-permutation matrix, then a
    # per-doc segmented min (doc_of is non-decreasing: explode+shift
    # preserves row order)
    coeffs = np.asarray(minhash_coeffs(n_hashes), dtype=np.int64)
    perms = (base[:, None] * coeffs[None, :, 0] + coeffs[None, :, 1]) % (
        MINHASH_P
    )
    have = np.unique(doc_of)
    starts = np.searchsorted(doc_of, have)
    if pd.api.types.is_integer_dtype(ids):
        sent = ids.to_numpy(dtype=np.int64)
    else:  # string/other ids: hash to a non-negative int64
        sent = (
            pd.util.hash_pandas_object(
                ids.reset_index(drop=True), index=False
            ).to_numpy()
            % np.uint64(2**62)
        ).astype(np.int64)
    out[:] = -sent[:, None] - 1  # per-doc sentinel, always negative
    if len(have):
        out[have] = np.minimum.reduceat(perms, starts, axis=0)
    return out


_STATE_SCHEMA = T.StructType([T.StructField("blob", T.BinaryType())])


def _load_cell(state) -> dict:
    (blob,) = state.get
    blob = bytes(blob)
    if blob[:1] == _STATE_FMT_V1:
        raw = pickle.loads(blob[1:])
    else:  # untagged legacy blob (raw pickle starts 0x80)
        raw = pickle.loads(blob)
    return {
        b: (ids, mat.reshape(len(ids), -1), last)
        for b, ids, mat, last in raw
    }


def _save_cell(state, cell: dict) -> None:
    raw = [
        (b, ids, np.ascontiguousarray(mat).reshape(-1), last)
        for b, (ids, mat, last) in cell.items()
    ]
    state.update((_STATE_FMT_V1 + pickle.dumps(raw, protocol=5),))


def _prune_cell(cell: dict, cutoff_ms: int) -> dict:
    out = {}
    for b, (ids, mat, last) in cell.items():
        keep = last >= cutoff_ms
        if keep.all():
            out[b] = (ids, mat, last)
        elif keep.any():
            out[b] = (ids[keep], mat[keep], last[keep])
    return out


def _make_cell_fn(
    out_cols: list[str],
    min_est: float,
    rep_ttl_ms: int,
    max_reps: int,
    ts_col: str = "ts",
):
    def fn(key, pdfs: Iterable[pd.DataFrame], state) -> Iterable[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()
        cutoff = wm - rep_ttl_ms

        if state.hasTimedOut:
            cell = _prune_cell(_load_cell(state), cutoff)
            if cell:
                _save_cell(state, cell)
                state.setTimeoutTimestamp(wm + rep_ttl_ms)
            else:
                state.remove()
            return

        cell = _prune_cell(_load_cell(state), cutoff) if state.exists else {}
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            if cell:
                _save_cell(state, cell)
                state.setTimeoutTimestamp(wm + rep_ttl_ms)
            else:
                state.remove()
            return
        batch = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True, copy=False)
        )
        # earlier-arrived order: (ts, id) — ties break on id
        batch = batch.sort_values(
            [ts_col, "_ndid"], kind="stable"
        ).reset_index(drop=True)
        # byte-identical redeliveries share their doc id (an id names
        # CONTENT, e.g. a hash of it): collapse same-(id, band) rows to
        # the first-arrived copy HERE, before verdicts, or the resolve
        # group for that id would mix one copy's kept row with another
        # copy's dup verdict and drop the document entirely (found via
        # the fused-pipeline invariants, r5). No-op for unique-id
        # streams; cross-batch identical copies are handled by the rep
        # match (agreement 1.0) as before.
        batch = batch.drop_duplicates(
            ["_ndid", "band"], keep="first"
        ).reset_index(drop=True)
        sig_mat = np.stack(batch["_ndsig"].to_numpy()).astype(np.int64)
        ids = batch["_ndid"].to_numpy()
        ts_ms = (
            batch[ts_col].to_numpy().astype("datetime64[ms]").astype(np.int64)
        )
        dup = np.zeros(len(batch), dtype=bool)

        bkts = batch["_ndbkt"].to_numpy()
        # one argsort + split, NOT a per-bucket boolean scan: with U
        # distinct buckets in the batch a `bkts == b` scan per bucket
        # is O(U·n) — measured 10x the whole operator's cost. The
        # stable sort preserves the (ts, id) order within each bucket.
        order = np.argsort(bkts, kind="stable")
        uniq, starts = np.unique(bkts[order], return_index=True)
        bounds = np.append(starts, len(order))
        for u_i in range(len(uniq)):
            b = uniq[u_i]
            rows = order[bounds[u_i]:bounds[u_i + 1]]
            reps = cell.get(b)
            if reps is not None:
                r_ids, r_mat, r_last = reps
            else:
                r_ids = np.array([], dtype=np.int64)
                r_mat = np.empty((0, sig_mat.shape[1]), dtype=np.int64)
                r_last = np.array([], dtype=np.int64)
            # ALL rows vs existing reps in one broadcast compare (the
            # steady-state path: on a re-ingest every row hits here);
            # the residual python loop only walks rows that matched NO
            # existing rep, because in-batch dup decisions depend on
            # which earlier rows survived. Measured: the per-row form
            # was ~4s/batch on the re-ingest fixture, this is ~0.
            if len(r_mat):
                agree = (
                    sig_mat[rows][:, None, :] == r_mat[None, :, :]
                ).mean(axis=2)
                hit_mask = (agree >= min_est).any(axis=1)
                if hit_mask.any():
                    matched = agree[hit_mask] >= min_est  # nb_hit × r
                    upd = np.where(
                        matched, ts_ms[rows][hit_mask, None], np.int64(0)
                    ).max(axis=0)
                    r_last = np.maximum(r_last, upd)
                    dup[rows[hit_mask]] = True
                residual = rows[~hit_mask]
            else:
                residual = rows
            # in-batch novel-vs-novel pass, BLOCKWISE (r5): the per-row
            # python form was O(novel^2) with a numpy call per row — a
            # degenerate first batch funneling one hot bucket crawled.
            # Chunks of 256 keep the forward data dependency (a row is
            # dup iff it matches a SURVIVING earlier row) while doing
            # all signature compares as two vectorized ops per chunk:
            # chunk-vs-accumulated-novel, then a precomputed in-chunk
            # triangle walked with plain bool lookups.
            novel_rows = np.empty(0, dtype=residual.dtype)
            _CHUNK = 256
            for c0 in range(0, len(residual), _CHUNK):
                chunk = residual[c0 : c0 + _CHUNK]
                cs = sig_mat[chunk]
                if len(novel_rows):
                    a = (
                        cs[:, None, :] == sig_mat[novel_rows][None, :, :]
                    ).mean(axis=2)
                    hit_prev = (a >= min_est).any(axis=1)
                else:
                    hit_prev = np.zeros(len(chunk), dtype=bool)
                am = (cs[:, None, :] == cs[None, :, :]).mean(
                    axis=2
                ) >= min_est
                keep_local: list[int] = []
                for j in range(len(chunk)):
                    if hit_prev[j] or (
                        keep_local and am[j, keep_local].any()
                    ):
                        dup[chunk[j]] = True
                    else:
                        keep_local.append(j)
                if keep_local:
                    novel_rows = np.concatenate(
                        [novel_rows, chunk[keep_local]]
                    )
            if len(novel_rows):
                room = max(0, max_reps - len(r_ids))
                take = novel_rows[:room]  # overflow: under-dedup, documented
                if len(take):
                    r_ids = np.concatenate([r_ids, ids[take]])
                    r_mat = np.vstack([r_mat, sig_mat[take]])
                    r_last = np.concatenate([r_last, ts_ms[take]])
            if len(r_ids):
                cell[b] = (r_ids, r_mat, r_last)
            elif b in cell:
                del cell[b]

        if cell:
            _save_cell(state, cell)
            state.setTimeoutTimestamp(wm + rep_ttl_ms)
        else:
            state.remove()
        # emit only rows that can change the resolve outcome: the
        # band-0 row (payload carrier — guarantees every doc appears)
        # plus any dup verdict. A not-dup non-band-0 row contributes
        # nothing to max(is_dup), so shipping it back through Arrow and
        # the resolve groupBy was pure overhead (~n_bands x fewer
        # output rows on a mostly-novel stream; measured r5).
        emit = (batch["band"].to_numpy() == 0) | dup
        out = batch.loc[emit, out_cols].copy()
        out["is_dup"] = dup[emit]
        yield out

    return fn


def streaming_neardup_verdicts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts: str = "ts",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    min_est_jaccard: float = 0.5,
    hash_fn: str = "xxhash64",
    watermark: str = "2 hours",
    rep_ttl_ms: int = 2 * 3600 * 1000,
    n_state_buckets: int = 64,
    max_reps_per_bucket: int = 100_000,
    sig_mode: str = "arrow",
) -> DataFrame:
    """Per-(doc, band) near-dup verdicts: every input row fans out to
    ``n_bands`` state cells; the cells emit back the band-0 row (the
    payload carrier — every doc appears exactly once) plus any row a
    band flagged dup. Resolve with :func:`resolve_neardup_verdicts`
    (a doc is dup iff ANY band says so — all its band rows land in the
    same micro-batch). Shuffle is |docs|·n_bands rows in (text rides
    along once per band, the batch band join's geometry) but only
    ~|docs| + |dup verdicts| rows back out."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if n_hashes % n_bands != 0:
        # a non-divisible split would silently exclude the trailing
        # n_hashes % n_bands signature slots from every band key while
        # the agreement estimate still used them (ADVICE r4)
        raise ValueError(
            f"n_hashes ({n_hashes}) must be divisible by n_bands "
            f"({n_bands}): trailing signature slots would be silently "
            f"excluded from every band key"
        )
    rows_per_band = n_hashes // n_bands
    if sig_mode == "arrow":
        @F.pandas_udf(T.ArrayType(T.LongType()))
        def _sig_udf(texts: pd.Series, ids: pd.Series) -> pd.Series:
            if not len(texts):
                return pd.Series([], dtype=object)
            return pd.Series(
                list(minhash_sigs_pandas(texts, ids, n_hashes, shingle_n))
            )

        sig = _sig_udf(F.col(text_col), F.col(id_col))
    elif sig_mode == "catalyst":
        # the batch ladder's JVM form — ~0.65 ms/doc interpreted HOF
        # evaluation, kept for A/B parity runs. A null text (or any
        # doc with < shingle_n tokens) yields a null / null-element
        # signature from array_min-over-empty; coalesce it to the same
        # per-doc sentinel contract as the arrow kernel instead of
        # crashing np.stack for the whole micro-batch (ADVICE r4).
        raw_sig = minhash_sig_col(
            _shingle_hashes(text_col, shingle_n, hash_fn), n_hashes
        )
        sentinel = (
            -F.pmod(F.xxhash64(F.col(id_col)), F.lit(2**62)) - F.lit(1)
        )
        sig = F.when(
            F.element_at(raw_sig, 1).isNotNull(), raw_sig
        ).otherwise(F.array_repeat(sentinel, n_hashes))
    else:
        raise ValueError(f"sig_mode must be arrow|catalyst: {sig_mode}")
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.lit(b),
                    F.slice("_ndsig", b * rows_per_band + 1, rows_per_band),
                ).alias("bkt"),
            )
            for b in range(n_bands)
        ]
    )
    in_cols = df.columns
    # payload columns ride on the band-0 row ONLY (NULL elsewhere):
    # the state cells need just (id, ts, sig, bucket), so carrying
    # text x n_bands through the shuffle and both Arrow hops is pure
    # waste; resolve reconstructs the doc with first(ignorenulls)
    always = {id_col, ts}
    carried = [
        F.col(c)
        if c in always
        else F.when(F.col("_nde.band") == 0, F.col(c))
        .otherwise(F.lit(None))
        .alias(c)
        for c in in_cols
    ]
    banded = (
        df.withColumn("_ndsig", sig)
        .withColumn("_ndid", F.col(id_col))
        .withColumn("_nde", F.explode(entries))
        .select(
            *carried,
            "_ndsig",
            "_ndid",
            F.col("_nde.band").alias("band"),
            F.col("_nde.bkt").alias("_ndbkt"),
        )
        .withColumn(
            "_ndgrp",
            F.pmod(F.col("_ndbkt"), F.lit(n_state_buckets)).cast("int"),
        )
    )
    out_cols = [*in_cols, "band"]
    out_schema = T.StructType(
        [df.schema[c] for c in in_cols]
        + [
            T.StructField("band", T.IntegerType()),
            T.StructField("is_dup", T.BooleanType()),
        ]
    )
    return (
        banded.withWatermark(ts, watermark)
        .groupBy("_ndgrp")
        .applyInPandasWithState(
            _make_cell_fn(
                out_cols,
                min_est_jaccard,
                rep_ttl_ms,
                max_reps_per_bucket,
                ts_col=ts,
            ),
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def resolve_neardup_verdicts(
    vdf: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Batch-side resolve (inside ``foreachBatch``): collapse a
    micro-batch of band verdicts to the KEPT documents — dup iff any
    band flagged it; payload columns ride only the band-0 row (NULL on
    the others), so ``first(ignorenulls)`` reconstructs the document."""
    carry = [c for c in vdf.columns if c not in (id_col, "band", "is_dup")]
    return (
        vdf.groupBy(id_col)
        .agg(
            *[F.first(c, ignorenulls=True).alias(c) for c in carry],
            F.max("is_dup").alias("_dup"),
        )
        .filter(~F.col("_dup"))
        .drop("_dup")
    )


def neardup_filter_foreach_batch(sink_fn, id_col: str = "doc_id"):
    """Compose resolve + a sink's foreach_batch: pass the result of
    ``IdempotentKeyedSink.foreach_batch()`` (or any (df, epoch) fn)."""

    def fn(batch_df, epoch_id):
        sink_fn(resolve_neardup_verdicts(batch_df, id_col), epoch_id)

    return fn


# ---------------------------------------------------------------------------
# Streaming SemDeDup — the stateful twin of ``similarity.semdedup``
# ---------------------------------------------------------------------------


def _load_emb_cell(state):
    (blob,) = state.get
    blob = bytes(blob)
    raw = pickle.loads(blob[1:] if blob[:1] == _STATE_FMT_V1 else blob)
    ids, mat, last = raw
    return ids, mat.reshape(len(ids), -1), last


def _save_emb_cell(state, ids, mat, last) -> None:
    state.update(
        (
            _STATE_FMT_V1
            + pickle.dumps(
                (ids, np.ascontiguousarray(mat).reshape(-1), last),
                protocol=5,
            ),
        )
    )


def _make_emb_cell_fn(
    out_cols: list[str],
    threshold: float,
    rep_ttl_ms: int,
    max_reps: int,
    ts_col: str,
    id_field: str,
):
    thr = np.float32(threshold)

    def fn(key, pdfs: Iterable[pd.DataFrame], state) -> Iterable[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()
        cutoff = wm - rep_ttl_ms

        def prune(ids, mat, last):
            keep = last >= cutoff
            return (ids[keep], mat[keep], last[keep]) if not keep.all() else (
                ids, mat, last
            )

        if state.hasTimedOut:
            ids, mat, last = prune(*_load_emb_cell(state))
            if len(ids):
                _save_emb_cell(state, ids, mat, last)
                state.setTimeoutTimestamp(wm + rep_ttl_ms)
            else:
                state.remove()
            return

        if state.exists:
            r_ids, r_mat, r_last = prune(*_load_emb_cell(state))
        else:
            r_ids = np.array([], dtype=np.int64)
            r_mat = np.empty((0, 0), dtype=np.float32)
            r_last = np.array([], dtype=np.int64)
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            if len(r_ids):
                _save_emb_cell(state, r_ids, r_mat, r_last)
                state.setTimeoutTimestamp(wm + rep_ttl_ms)
            else:
                state.remove()
            return
        batch = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True, copy=False)
        )
        # earlier-arrived order, then collapse same-id redeliveries
        # inside the batch (an id names content; cross-batch copies
        # match their own rep at cosine ~1.0)
        batch = (
            batch.sort_values([ts_col, id_field], kind="stable")
            .drop_duplicates([id_field], keep="first")
            .reset_index(drop=True)
        )
        # a null vector has no dup evidence: emit as kept, never a rep
        # (a zero-vector rep would burn cap space and match nothing) —
        # and never let one row's null kill the whole micro-batch (the
        # ADVICE-r4 null-signature lesson)
        nullv = batch["_sdvec"].isna()
        if nullv.any():
            null_rows = batch.loc[nullv, out_cols].copy()
            batch = batch.loc[~nullv].reset_index(drop=True)
            if not len(batch):
                if len(r_ids):
                    _save_emb_cell(state, r_ids, r_mat, r_last)
                    state.setTimeoutTimestamp(wm + rep_ttl_ms)
                else:
                    state.remove()
                yield null_rows
                return
        else:
            null_rows = None
        V = np.stack(batch["_sdvec"].to_numpy()).astype(np.float32)
        nrm = np.linalg.norm(V, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0  # zero vectors: cos 0 vs all — always novel
        V /= nrm
        if r_mat.size == 0:
            r_mat = np.empty((0, V.shape[1]), dtype=np.float32)
        ts_ms = (
            batch[ts_col].to_numpy().astype("datetime64[ms]").astype(np.int64)
        )
        dup = np.zeros(len(batch), dtype=bool)
        # steady-state: every row vs existing reps in one matmul
        if len(r_mat):
            sims = V @ r_mat.T
            hit = sims >= thr
            hit_mask = hit.any(axis=1)
            if hit_mask.any():
                upd = np.where(
                    hit[hit_mask], ts_ms[hit_mask, None], np.int64(0)
                ).max(axis=0)
                r_last = np.maximum(r_last, upd)
                dup[hit_mask] = True
            residual = np.flatnonzero(~hit_mask)
        else:
            residual = np.arange(len(batch))
        # in-batch novel-vs-novel, blockwise (forward data dependency:
        # a row is dup iff it matches a SURVIVING earlier row) — the
        # text filter's chunk idiom with matmuls for agreement
        novel = np.empty(0, dtype=np.int64)
        _CHUNK = 256
        for c0 in range(0, len(residual), _CHUNK):
            chunk = residual[c0 : c0 + _CHUNK]
            cs = V[chunk]
            if len(novel):
                hit_prev = ((cs @ V[novel].T) >= thr).any(axis=1)
            else:
                hit_prev = np.zeros(len(chunk), dtype=bool)
            am = (cs @ cs.T) >= thr
            keep_local: list[int] = []
            for j in range(len(chunk)):
                if hit_prev[j] or (keep_local and am[j, keep_local].any()):
                    dup[chunk[j]] = True
                else:
                    keep_local.append(j)
            if keep_local:
                novel = np.concatenate([novel, chunk[keep_local]])
        if len(novel):
            room = max(0, max_reps - len(r_ids))
            take = novel[:room]  # overflow: under-dedup, documented
            if len(take):
                r_ids = np.concatenate(
                    [r_ids, batch[id_field].to_numpy()[take]]
                )
                r_mat = np.vstack([r_mat, V[take]])
                r_last = np.concatenate([r_last, ts_ms[take]])
        if len(r_ids):
            _save_emb_cell(state, r_ids, r_mat, r_last)
            state.setTimeoutTimestamp(wm + rep_ttl_ms)
        else:
            state.remove()
        out = batch.loc[~dup, out_cols]
        if null_rows is not None:
            out = pd.concat([out, null_rows], ignore_index=True)
        yield out.copy()

    return fn


def streaming_semdedup_filter(
    df: DataFrame,
    threshold: float = 0.4,
    dim: int = 64,
    n_centroids: int = 16,
    seed: int = 11,
    centroids: "list[list[float]] | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ts: str = "ts",
    watermark: str = "2 hours",
    rep_ttl_ms: int = 2 * 3600 * 1000,
    max_reps_per_cell: int = 100_000,
) -> DataFrame:
    """Streaming SemDeDup: drop a row whose embedding is a semantic
    duplicate (cosine ≥ ``threshold``) of an EARLIER-ARRIVED row in
    the same coarse cluster — the embedding-side member of the
    streaming dedup family (exact `dropDuplicatesWithinWatermark` →
    MinHash `streaming_neardup_verdicts` → this).

    Returns the KEPT rows directly: unlike the banded MinHash filter
    there is no fan-out — each vector lives in exactly ONE cell
    (argmax centroid dot, the `ivf_assign` rule, computed in the same
    fold-exact Arrow pass as the batch op), so no resolve step and no
    verdict plumbing.  The batch operator can implement the paper's
    keep-farthest-from-centroid rule because it sees all duplicates at
    once; a stream cannot retract an emitted row, so the streaming
    contract is FIRST-ARRIVED-WINS — the same canonical-rep semantics
    as the MinHash filter (pinned by a sequential-replica test over
    arbitrary micro-batch splits).

    Scale shape: state is one float32 unit-vector matrix per cell
    (`n_centroids` IS the shuffle/parallelism knob — SemDeDup at web
    scale runs ~100k clusters, keeping cells small and state per
    group a few MB); every comparison is a float32 matmul; reps
    expire ``rep_ttl_ms`` after last sighting and
    ``max_reps_per_cell`` bounds degenerate cells (overflow rows pass
    through as kept — under-dedup, never over-drop, the family's
    documented cap contract).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from dbus_spark.operators.similarity import (
        _centroid_dots,
        ivf_centroids,
    )

    cents = centroids if centroids is not None else ivf_centroids(
        n_centroids, dim, seed
    )
    in_cols = df.columns
    staged = (
        df.withColumn("_sdots", _centroid_dots(vec_col, cents))
        .withColumn(
            "cell",
            (
                F.array_position(F.col("_sdots"), F.array_max("_sdots")) - 1
            ).cast("int"),
        )
        .drop("_sdots")
        .withColumn("_sdvec", F.col(vec_col).cast("array<float>"))
    )
    out_cols = [*in_cols, "cell"]
    out_schema = T.StructType(
        [df.schema[c] for c in in_cols]
        + [T.StructField("cell", T.IntegerType())]
    )
    return (
        staged.withWatermark(ts, watermark)
        .groupBy("cell")
        .applyInPandasWithState(
            _make_emb_cell_fn(
                out_cols,
                threshold,
                rep_ttl_ms,
                max_reps_per_cell,
                ts_col=ts,
                id_field=id_col,
            ),
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
