"""Unit semantics for the unigram-LM perplexity scorer
(operators/text.py::doc_logppl) and SemDeDup
(operators/similarity.py::semdedup) — the oracle-parity gate covers
value equality at sf0.01; these pin the RULES on constructed inputs."""

import math

import pytest


def _replica_logppl(texts):
    toks = [t.strip(" ").split() if t.strip(" ") else [""] for t in texts]
    # NB: python str.split() drops empties; the operator splits on the
    # Java \s+ regex over trimmed text — the test corpus is single-
    # space separated so the two agree here
    cnt = {}
    for tt in toks:
        for w in tt:
            cnt[w] = cnt.get(w, 0) + 1
    T, V = sum(cnt.values()), len(cnt)

    def lp6(w):
        return round(math.log((cnt[w] + 1) / (T + V)) * 1e6)

    out = {}
    for i, tt in enumerate(toks):
        s = sum(lp6(w) for w in tt)
        out[i] = (len(tt), round(-s / (len(tt) * 1e6), 4))
    return out


def test_doc_logppl_matches_python_replica(spark):
    from dbus_spark.operators.text import doc_logppl

    texts = [
        "the cat sat on the mat",
        "the the the the",
        "zyzzyva qwfp zxcv plugh",
        "the cat",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.logppl)
        for r in doc_logppl(df).collect()
    }
    assert got == _replica_logppl(texts)
    # rare-token doc scores strictly higher perplexity than the
    # common-token doc — the property the quality cut relies on
    assert got[2][1] > got[1][1]


def test_doc_logppl_held_out_lm_oov(spark):
    from dbus_spark.operators.text import doc_logppl, unigram_logprobs

    train = spark.createDataFrame(
        [(0, "a a a b")], "doc_id long, text string"
    )
    lm = unigram_logprobs(train)
    # floor = unseen-token logprob under the trained smoothing
    T, V = 4, 2
    floor = round(math.log(1 / (T + V)) * 1e6)
    score = spark.createDataFrame(
        [(1, "a zz")], "doc_id long, text string"
    )
    with pytest.raises(ValueError):
        doc_logppl(score, lm=lm)  # oov_lp6 is required with a held-out lm
    got = doc_logppl(score, lm=lm, oov_lp6=floor).collect()[0]
    lp_a = round(math.log((3 + 1) / (T + V)) * 1e6)
    assert got.n_tokens == 2
    assert got.logppl == round(-(lp_a + floor) / (2 * 1e6), 4)


def test_semdedup_keeps_farthest_from_centroid(spark):
    from dbus_spark.operators.similarity import semdedup

    cents = [[1.0, 0.0], [0.0, 1.0]]
    deg = lambda d: [math.cos(math.radians(d)), math.sin(math.radians(d))]
    # a 0°, b 15°, c 30°: adjacent cos ≈ .966 > .95, a↔c cos ≈ .866 < .95
    # (a chain); cent_sim ranks c < b < a, so c survives, a and b drop;
    # d sits alone in the other cell and always survives
    rows = [(0, deg(0)), (1, deg(15)), (2, deg(30)), (3, deg(85))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = semdedup(
        df, threshold=0.95, dim=2, centroids=cents
    ).toPandas()
    assert set(kept.vec_id) == {2, 3}
    assert set(kept.cell) == {0, 1}


def test_semdedup_tie_breaks_on_id(spark):
    from dbus_spark.operators.similarity import semdedup

    cents = [[1.0, 0.0], [0.0, 1.0]]
    # identical vectors: identical cent_sim, so the LOWER id survives
    rows = [(7, [1.0, 0.01]), (3, [1.0, 0.01])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = semdedup(df, threshold=0.9, dim=2, centroids=cents).toPandas()
    assert list(kept.vec_id) == [3]
