"""Distributed spherical k-means (operators/clustering.py), feature-
hashed vectors (operators/vectorize.py), and time-decayed event counts
(events.decayed_counts): numpy/md5 driver replicas for the exact paths,
planted-structure recovery for the learned ones, validation surfaces.

The driver entries ``kmeans_assign`` / ``hashed_tf`` / ``decayed_counts``
pin the SQL-expressible halves cross-engine; these tests own training
(float-sum combine order — tolerance-gated, kept out of the hash-compare
path by design, the classifier.py precedent)."""

import datetime
import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import clustering as CL
from search_engine_spark.operators import events as EV
from search_engine_spark.operators import vectorize as VZ

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _np_assign(X, centroids):
    """numpy replica of kmeans_assign's rule: cosine rounded to 6 dp,
    argmax with ties → lowest cluster (np.argmax takes the first max)."""
    C = np.asarray(centroids, dtype=np.float64)
    sims = (X @ C.T) / (np.linalg.norm(X, axis=1)[:, None]
                        * np.linalg.norm(C, axis=1)[None, :])
    sims = np.round(sims, CL.SIM_DECIMALS)
    return sims.argmax(axis=1), sims


def test_assign_matches_numpy_replica(emb):
    centroids = [[float(x) for x in r.embedding]
                 for r in emb.filter(F.col("vec_id").isin([0, 17, 42])).collect()]
    got = {r.vec_id: (r.cluster, r.sim)
           for r in CL.kmeans_assign(emb, centroids).collect()}
    rows = emb.collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    want_c, want_s = _np_assign(X, centroids)
    for i, r in enumerate(rows):
        c, s = got[r.vec_id]
        assert c == want_c[i], f"vec {r.vec_id}"
        assert s == pytest.approx(want_s[i, c], abs=2e-6)


def test_assign_tie_breaks_lowest_cluster(spark):
    e = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    out = CL.kmeans_assign(e, [[2.0, 0.0], [1.0, 0.0]]).collect()[0]
    # both centroids are cosine-identical to the vector → cluster 0 wins
    assert out.cluster == 0 and out.sim == 1.0


def test_seed_centroids_deterministic_and_debiased(emb):
    a = CL.seed_centroids(emb, 5)
    b = CL.seed_centroids(emb, 5)
    assert a == b
    # content-hash order, not id order: the seeds are NOT vec_id 0..4
    ids = {r.vec_id for r in emb.orderBy("vec_id").limit(5).collect()}
    seeded = {tuple(c) for c in a}
    first5 = {tuple(float(x) for x in r.embedding)
              for r in emb.filter(F.col("vec_id").isin(list(ids))).collect()}
    assert seeded != first5
    with pytest.raises(ValueError, match="at least k"):
        CL.seed_centroids(emb.limit(2), 5)


def test_train_matches_numpy_replica(emb):
    sub = emb.filter(F.col("vec_id") < 200)
    init = CL.seed_centroids(sub, 4)
    got = CL.kmeans_train(sub, iters=3, init=init)

    rows = sub.collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    C = [list(c) for c in init]
    for _ in range(3):
        lab, _ = _np_assign(X, C)
        nxt = [list(c) for c in C]
        for j in range(4):
            pts = X[lab == j]
            if len(pts):
                m = pts.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    nxt[j] = list(m / n)
        C = nxt
    for gc, wc in zip(got, C):
        assert gc == pytest.approx(wc, rel=1e-6, abs=1e-9)


def test_train_separates_planted_clusters(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(60):
        base = np.array([10.0, 0.0, 0.0]) if i % 2 == 0 else np.array([0.0, 10.0, 0.0])
        v = base + rng.normal(0, 0.5, 3)
        rows.append((i, [float(x) for x in v]))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = CL.kmeans_train(e, k=2, iters=5)
    lab = {r.vec_id: r.cluster for r in CL.kmeans_assign(e, cents).collect()}
    evens = {lab[i] for i in range(0, 60, 2)}
    odds = {lab[i] for i in range(1, 60, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds


def test_empty_cluster_keeps_centroid(spark):
    e = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1])],
        "vec_id long, embedding array<double>")
    # centroid 1 is anti-aligned with every vector → never assigned
    init = [[1.0, 0.0], [-1.0, 0.0]]
    out = CL.kmeans_train(e, iters=2, init=init)
    assert out[1] == pytest.approx([-1.0, 0.0])


def test_clustering_validation_surface(spark, emb):
    with pytest.raises(ValueError, match="k or init"):
        CL.kmeans_train(emb)
    with pytest.raises(ValueError, match="iters"):
        CL.kmeans_train(emb, k=2, iters=-1)
    with pytest.raises(ValueError, match="non-empty"):
        CL.kmeans_assign(emb, [])
    with pytest.raises(ValueError, match="dim"):
        CL.kmeans_assign(emb, [[1.0, 0.0], [1.0]])
    with pytest.raises(ValueError, match="non-zero"):
        CL.kmeans_assign(emb, [[0.0, 0.0]])
    # iters=0 returns the init unchanged (identity contract)
    assert CL.kmeans_train(emb, iters=0, init=[[1.0] * 64]) == [[1.0] * 64]


def _bucket(term: str, dim: int) -> int:
    h = hashlib.md5((term + VZ.SALT).encode()).hexdigest()[:8]
    return int(h, 16) % dim


def test_hashed_tf_matches_md5_replica(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta  alpha\tgamma"), (2, "beta beta"), (3, "   ")],
        "doc_id long, text string")
    got = {(r.doc_id, r.bucket): r.tf
           for r in VZ.hashed_tf(docs, dim=32).collect()}
    want = {}
    for d, toks in ((1, ["alpha", "beta", "alpha", "gamma"]),
                    (2, ["beta", "beta"])):
        for t in toks:
            k = (d, _bucket(t, 32))
            want[k] = want.get(k, 0) + 1
    assert got == want  # doc 3 (whitespace only) is absent


def test_hashed_vectors_scatter_and_norm(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha")], "doc_id long, text string")
    dim = 64
    ba, bb = _bucket("alpha", dim), _bucket("beta", dim)
    assert ba != bb  # crafted to not collide at dim=64
    raw = VZ.hashed_vectors(docs, dim=dim, normalize=False).collect()[0].x
    assert raw[ba] == 2.0 and raw[bb] == 1.0
    assert sum(raw) == 3.0 and len(raw) == dim
    unit = VZ.hashed_vectors(docs, dim=dim).collect()[0].x
    nrm = math.sqrt(5.0)
    assert unit[ba] == pytest.approx(2.0 / nrm)
    assert unit[bb] == pytest.approx(1.0 / nrm)
    assert math.fsum(x * x for x in unit) == pytest.approx(1.0)
    with pytest.raises(ValueError, match="dim"):
        VZ.hashed_tf(docs, dim=0)


def test_kmeans_over_hashed_vectors(spark):
    """Integration: index-free topic clustering — hash-vectorize two
    planted vocabularies, train k=2, assignments recover the topics."""
    sports = "goal match team score win league play coach"
    cooking = "recipe flour oven bake sugar butter dough whisk"
    rows = [(i, sports if i % 2 == 0 else cooking) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vec = VZ.hashed_vectors(docs, dim=64).cache()
    cents = CL.kmeans_train(vec, k=2, iters=4, vec_col="x", id_col="doc_id")
    lab = {r.vec_id: r.cluster
           for r in CL.kmeans_assign(vec, cents, vec_col="x",
                                     id_col="doc_id").collect()}
    evens = {lab[i] for i in range(0, 40, 2)}
    odds = {lab[i] for i in range(1, 40, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds
    vec.unpersist()


def test_decayed_counts_hand_computed(spark):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 10, "click", 1.0, ""),
        (2, t0 - datetime.timedelta(minutes=60), 10, "click", 1.0, ""),
        (3, t0 - datetime.timedelta(minutes=120), 10, "click", 1.0, ""),
        (4, t0 - datetime.timedelta(minutes=60), 11, "view", 1.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {(r.user_id, r.event_type): (r.n_events, r.decayed_n)
           for r in EV.decayed_counts(ev, half_life_minutes=60).collect()}
    # as_of defaults to max(ts)=t0: weights 1, 1/2, 1/4 and 1/2
    assert out[(10, "click")] == (3, pytest.approx(1.75))
    assert out[(11, "view")] == (1, pytest.approx(0.5))
    # explicit as_of shifts every age by +60 min → halves every weight
    out2 = {(r.user_id, r.event_type): r.decayed_n
            for r in EV.decayed_counts(
                ev, half_life_minutes=60,
                as_of=t0 + datetime.timedelta(minutes=60)).collect()}
    assert out2[(10, "click")] == pytest.approx(0.875)
    with pytest.raises(ValueError, match="half_life"):
        EV.decayed_counts(ev, half_life_minutes=0)
    with pytest.raises(ValueError, match="empty"):
        EV.decayed_counts(ev.limit(0))


def _np_assign_l2(X, centroids):
    """numpy replica of the l2 assignment: argmax of round-6
    −(‖x‖²−2x·c+‖c‖²) (ties → lowest cluster), the engine's exact rule."""
    C = np.asarray(centroids, dtype=np.float64)
    xsq = (X * X).sum(axis=1)[:, None]
    score = -(xsq - 2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :])
    return np.round(score, CL.SIM_DECIMALS).argmax(axis=1)


def test_l2_metric_matches_numpy_replica(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, (50, 6))
    e = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(50)],
        "vec_id long, embedding array<double>")
    init = [list(map(float, X[0])), list(map(float, X[1])),
            list(map(float, X[2]))]
    lab = {r.vec_id: r.cluster
           for r in CL.kmeans_assign(e, init, metric="l2").collect()}
    want = _np_assign_l2(X, init)
    assert [lab[i] for i in range(50)] == list(want)

    got = CL.kmeans_train(e, iters=3, init=init, metric="l2")
    C = [list(c) for c in init]
    for _ in range(3):
        a = _np_assign_l2(X, C)
        nxt = [list(c) for c in C]
        for j in range(3):
            pts = X[a == j]
            if len(pts):
                nxt[j] = list(pts.mean(axis=0))  # plain mean: no normalize
        C = nxt
    for gc, wc in zip(got, C):
        assert gc == pytest.approx(wc, rel=1e-6, abs=1e-9)
    with pytest.raises(ValueError, match="metric"):
        CL.kmeans_assign(e, init, metric="manhattan")


def test_ivf_fit_distributed_matches_full_data_replica(spark, emb):
    """ivf_fit(distributed=True) == numpy L2 Lloyd's over ALL vectors
    from the same hash-ordered init — the beyond-driver-envelope path
    gives the driver-path semantics without collecting the corpus."""
    from search_engine_spark.operators import similarity as SIM

    got = SIM.ivf_fit(emb, n_centroids=4, iters=3, distributed=True)

    rows = emb.collect()
    # replicate _sketch_sample's init: order by md5(str(id)+'ivf_fit')
    order = sorted(rows, key=lambda r: (hashlib.md5(
        (str(r.vec_id) + "ivf_fit").encode()).hexdigest(), r.vec_id))
    C = [[float(x) for x in r.embedding] for r in order[:4]]
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    for _ in range(3):
        a = _np_assign_l2(X, C)
        nxt = [list(c) for c in C]
        for j in range(4):
            pts = X[a == j]
            if len(pts):
                nxt[j] = list(pts.mean(axis=0))
        C = nxt
    assert np.asarray(got) == pytest.approx(np.asarray(C), rel=1e-6, abs=1e-9)
    # the serving stack accepts the distributed fit unchanged
    assigned = SIM.ivf_assign(emb, got)
    assert assigned.select("cell").distinct().count() >= 2


def test_literal_centroid_budget(spark):
    """k x dim beyond MAX_CENTROID_LITERALS refuses with a pointer at
    the ANN catalog artifacts — literal plans of that size break
    codegen; below the bound behavior is unchanged."""
    import pytest

    from search_engine_spark.operators import clustering

    emb = spark.createDataFrame([(1, [1.0, 2.0]), (2, [2.0, 1.0])],
                                "vec_id long, embedding array<double>")
    big_dim = clustering.MAX_CENTROID_LITERALS // 4 + 1
    bad = [[1.0] * big_dim for _ in range(5)]
    with pytest.raises(ValueError, match="MAX_CENTROID_LITERALS"):
        clustering.kmeans_assign(emb, bad)
    with pytest.raises(ValueError, match="MAX_CENTROID_LITERALS"):
        clustering.kmeans_train(emb, init=bad, iters=1)
    # small models are untouched
    out = clustering.kmeans_assign(emb, [[1.0, 0.0], [0.0, 1.0]])
    assert out.count() == 2
