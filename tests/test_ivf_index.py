"""Persisted IVF ANN serving index (round-10 verdict #2): build →
O(delta) append → serve, with the same contract family as the dedup
serving states — append ≡ rebuild under the standing centroids,
probe-all == brute force on everything indexed, strictly-new ids,
drift-triggered rebuild cadence, and physical partition pruning on the
probed lists."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eea_crawler_spark.operators import similarity as SIM

DIM = 16
K = 4


def _mk_vecs(spark, n=200, dim=DIM, seed=7, id_start=0, center=None):
    """Clustered vector corpus: 8 gaussian blobs (or one remote blob
    when ``center`` is given — the drift fixture)."""
    rng = np.random.RandomState(seed)
    if center is None:
        centers = rng.standard_normal((8, dim)) * 3.0
    else:
        centers = np.asarray([center] * 8, dtype=np.float64)
    rows = []
    for i in range(n):
        c = centers[i % 8]
        v = c + 0.15 * rng.standard_normal(dim)
        rows.append((id_start + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """An index built on the base corpus plus a delta appended to it."""
    base = _mk_vecs(spark, n=200, seed=7)
    delta = _mk_vecs(spark, n=40, seed=8, id_start=1000)
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    meta = SIM.build_ivf_index(base, path, n_clusters=8, n_iter=2)
    app = SIM.append_ivf_index(spark, path, delta)
    return base, delta, path, meta, app


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_build_meta_and_append_counts(spark, built):
    base, delta, path, meta, app = built
    assert meta == {"n": 200, "n_clusters": 8, "dim": DIM}
    assert app["appended"] == 40
    spec = SIM.read_ivf_index(spark, path)["spec"]
    assert spec["n"] == 240 and spec["appended"] == 40


def test_ivf_state_serve_equals_in_memory(spark, built):
    """Serving from the persisted lists must equal the in-memory
    operator with the same centroids — pre-pruning to the probed
    partitions removes only rows no query would score."""
    base, delta, path, meta, app = built
    union = base.unionByName(delta)
    queries = union.filter(F.col("vec_id") % 37 == 0)
    centroids = SIM.read_ivf_index(spark, path)["centroids"]
    got = SIM.ivf_topk_state(spark, path, queries, k=K, n_probe=3)
    want = SIM.ivf_topk(
        union, queries, k=K, n_probe=3, centroids=centroids
    )
    assert _rows(got) == _rows(want)


def test_ivf_append_probe_all_equals_bruteforce(spark, built):
    """THE recall pin: probe-all over the appended index == exact
    brute-force top-k over the union — appends never lose a vector."""
    base, delta, path, meta, app = built
    union = base.unionByName(delta)
    queries = union.filter(F.col("vec_id") % 37 == 0)
    got = SIM.ivf_topk_state(spark, path, queries, k=K, n_probe=8)
    want = SIM.brute_force_topk(union, queries, k=K)
    assert _rows(got) == _rows(want)


def test_ivf_append_lists_equal_rebuild_with_same_centroids(spark, built):
    """append ≡ rebuild: the persisted lists equal assigning the union
    under the standing centroids, and the agg relation equals the
    recomputed per-cluster aggregates of the persisted lists."""
    base, delta, path, meta, app = built
    idx = SIM.read_ivf_index(spark, path)
    union = base.unionByName(delta)
    want = sorted(
        (r["vec_id"], r["cluster"])
        for r in SIM.ivf_assign(
            union.select("vec_id", "embedding"), idx["centroids"]
        ).collect()
    )
    got = sorted(
        (r["vec_id"], r["cluster"]) for r in idx["lists"].collect()
    )
    assert got == want
    agg_live = {
        r["cluster"]: (r["cnt"], np.round(np.asarray(r["sums"]), 6).tolist())
        for r in SIM._ivf_cluster_agg(idx["lists"], "embedding").collect()
    }
    agg_stored = {
        r["cluster"]: (r["cnt"], np.round(np.asarray(r["sums"]), 6).tolist())
        for r in idx["agg"].collect()
    }
    assert agg_stored == agg_live


def test_ivf_append_contracts(spark, built):
    base, delta, path, meta, app = built
    # strictly-new ids
    with pytest.raises(ValueError, match="strictly-NEW"):
        SIM.append_ivf_index(spark, path, delta)
    # dim mismatch
    bad = spark.createDataFrame(
        [(9999, [0.0] * (DIM + 1))], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="-d"):
        SIM.append_ivf_index(spark, path, bad)
    # empty batch: no-op
    r = SIM.append_ivf_index(spark, path, delta.filter(F.lit(False)))
    assert r["appended"] == 0 and r["needs_rebuild"] == 0


def test_ivf_drift_trigger_and_rebuild_reset(spark, tmp_path):
    """The rebuild cadence: a delta from a DIFFERENT distribution (a
    remote blob) drags the implied means off the frozen centroids —
    needs_rebuild flips; build_ivf_index IS the rebuild and resets
    both triggers."""
    base = _mk_vecs(spark, n=160, seed=3)
    path = str(tmp_path / "drifty")
    SIM.build_ivf_index(base, path, n_clusters=4, n_iter=2)
    # in-distribution appends: no trigger
    near = _mk_vecs(spark, n=8, seed=4, id_start=2000)
    r1 = SIM.append_ivf_index(spark, path, near)
    assert r1["needs_rebuild"] == 0
    # a big remote blob: fraction and/or drift trips
    far = _mk_vecs(
        spark, n=120, seed=5, id_start=3000,
        center=[25.0] * DIM,
    )
    r2 = SIM.append_ivf_index(spark, path, far)
    assert r2["needs_rebuild"] == 1
    assert (
        r2["appended_fraction"] >= SIM.IVF_REBUILD_APPEND_FRACTION
        or r2["min_centroid_cos"] < SIM.IVF_REBUILD_DRIFT_COS
    )
    # probe-all stays exact even in the flagged state (serving is
    # never wrong, only recall-at-small-n_probe decays)
    union = base.unionByName(near).unionByName(far)
    queries = union.filter(F.col("vec_id") % 53 == 0)
    got = SIM.ivf_topk_state(spark, path, queries, k=K, n_probe=4)
    want = SIM.brute_force_topk(union, queries, k=K)
    assert _rows(got) == _rows(want)
    # the rebuild resets the cadence
    SIM.build_ivf_index(union, path, n_clusters=4, n_iter=2)
    spec = SIM.read_ivf_index(spark, path)["spec"]
    assert spec["appended"] == 0 and spec["n"] == union.count()
    r3 = SIM.append_ivf_index(
        spark, path, _mk_vecs(spark, n=4, seed=6, id_start=9000)
    )
    assert r3["needs_rebuild"] == 0


def test_ivf_state_serve_prunes_partitions(spark, built):
    """The scale property the persisted layout buys: the probed lists
    arrive via partition pruning — the scan's PartitionFilters carry
    the cluster predicate, so unprobed lists are never read."""
    base, delta, path, meta, app = built
    queries = base.filter(F.col("vec_id") == 0)
    df = SIM.ivf_topk_state(spark, path, queries, k=K, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cluster" in m.group(1), plan
