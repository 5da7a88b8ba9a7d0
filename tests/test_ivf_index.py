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


@pytest.mark.slow
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


def _repair_fixture(spark, tmp_path, n_clusters=8):
    base = _mk_vecs(spark, n=200, seed=7)
    path = str(tmp_path / "repairable")
    SIM.build_ivf_index(base, path, n_clusters=n_clusters, n_iter=2)
    return base, path


def _modified(df, offset=20.0):
    return df.withColumn(
        "embedding",
        F.transform(
            "embedding", lambda x: (x * F.lit(-1.0) + F.lit(offset)).cast(
                "float"
            )
        ),
    )


@pytest.mark.slow
def test_ivf_repair_upsert_delete_exact(spark, tmp_path):
    """THE repair pin (round-11 verdict #1): after a partition-local
    repair — modified vectors replaced in place, deleted ids evicted,
    a brand-new id inserted through the same path — probe-all serving
    equals exact brute force over the CORRECTED corpus, and the agg
    relation equals the rewritten lists exactly."""
    base, path = _repair_fixture(spark, tmp_path)
    mod = _modified(base.filter(F.col("vec_id") % 17 == 0))
    new = _mk_vecs(spark, n=3, seed=9, id_start=5000)
    updates = mod.unionByName(new)  # upsert semantics: insert rides too
    doomed = base.filter(F.col("vec_id") % 23 == 0).filter(
        F.col("vec_id") % 17 != 0
    ).select("vec_id")
    r = SIM.repair_ivf_index(
        spark, path, updates=updates, deleted_ids=doomed
    )
    n_mod, n_doomed = mod.count(), doomed.count()
    assert r["reassigned"] == n_mod + 3
    assert r["removed"] == n_mod + n_doomed  # evicted old copies
    corrected = (
        base.join(updates.select("vec_id"), ["vec_id"], "left_anti")
        .join(doomed, ["vec_id"], "left_anti")
        .unionByName(updates)
    )
    queries = corrected.filter(F.col("vec_id") % 37 == 0)
    got = SIM.ivf_topk_state(spark, path, queries, k=K, n_probe=8)
    want = SIM.brute_force_topk(corrected, queries, k=K)
    assert _rows(got) == _rows(want)
    idx = SIM.read_ivf_index(spark, path)
    assert idx["spec"]["n"] == corrected.count()
    agg_live = {
        r["cluster"]: (r["cnt"], np.round(np.asarray(r["sums"]), 6).tolist())
        for r in SIM._ivf_cluster_agg(idx["lists"], "embedding").collect()
    }
    agg_stored = {
        r["cluster"]: (r["cnt"], np.round(np.asarray(r["sums"]), 6).tolist())
        for r in idx["agg"].collect()
    }
    assert agg_stored == agg_live


def test_ivf_repair_retry_is_idempotent(spark, tmp_path):
    """A crashed repair's retry must converge: running the SAME repair
    twice leaves exactly one copy of every updated id and the same
    lists content (step 2 re-evicts whatever a crashed attempt already
    appended — their ids are touched too)."""
    base, path = _repair_fixture(spark, tmp_path)
    mod = _modified(base.filter(F.col("vec_id") % 11 == 0))
    doomed = base.filter(F.col("vec_id") % 31 == 0).filter(
        F.col("vec_id") % 11 != 0
    ).select("vec_id")
    SIM.repair_ivf_index(spark, path, updates=mod, deleted_ids=doomed)
    first = sorted(_rows(
        SIM.read_ivf_index(spark, path)["lists"].select(
            "vec_id", "cluster", "vec_hash"
        )
    ))
    r2 = SIM.repair_ivf_index(spark, path, updates=mod, deleted_ids=doomed)
    again = sorted(_rows(
        SIM.read_ivf_index(spark, path)["lists"].select(
            "vec_id", "cluster", "vec_hash"
        )
    ))
    assert again == first
    assert r2["removed"] == mod.count()  # the retry re-evicts its own rows
    spec = SIM.read_ivf_index(spark, path)["spec"]
    assert spec["n"] == len(first)


def test_ivf_repair_empties_a_partition(spark, tmp_path):
    """Deleting every member of an inverted list must remove its
    partition DIR (dynamic overwrite only rewrites partitions present
    in the writeout) — and serving stays exact afterwards."""
    import os

    base, path = _repair_fixture(spark, tmp_path, n_clusters=4)
    lists = SIM.read_ivf_index(spark, path)["lists"]
    c0 = lists.first()["cluster"]
    # materialize: the lazy plan would chase the files repair deletes
    victim_ids = [
        (r["vec_id"],)
        for r in lists.filter(F.col("cluster") == int(c0))
        .select("vec_id").collect()
    ]
    victims = spark.createDataFrame(victim_ids, "vec_id bigint")
    n_victims = len(victim_ids)
    r = SIM.repair_ivf_index(spark, path, deleted_ids=victims)
    assert r["removed"] == n_victims
    assert not os.path.exists(f"{path}/lists/cluster={int(c0)}")
    survivors = base.join(victims, ["vec_id"], "left_anti")
    queries = survivors.limit(4)
    got = SIM.ivf_topk_state(spark, path, queries, k=K, n_probe=4)
    want = SIM.brute_force_topk(survivors, queries, k=K)
    assert _rows(got) == _rows(want)
    # agg carries no row for the emptied cluster
    agg = SIM.read_ivf_index(spark, path)["agg"]
    assert agg.filter(F.col("cluster") == int(c0)).isEmpty()


def test_ivf_repair_leaves_untouched_partitions_alone(spark, tmp_path):
    """O(stale) means PHYSICAL: a repair touching one cluster must not
    rewrite any file of the other inverted lists."""
    import os

    base, path = _repair_fixture(spark, tmp_path, n_clusters=8)
    lists = SIM.read_ivf_index(spark, path)["lists"]
    c0 = int(lists.first()["cluster"])
    one = lists.filter(F.col("cluster") == c0).select("vec_id").limit(1)
    victim_id = one.first()["vec_id"]

    def _files():
        out = {}
        for d in os.listdir(f"{path}/lists"):
            if not d.startswith("cluster="):
                continue
            full = f"{path}/lists/{d}"
            out[d] = {
                (f, os.path.getmtime(f"{full}/{f}"))
                for f in os.listdir(full)
                if f.endswith(".parquet")
            }
        return out

    before = _files()
    r = SIM.repair_ivf_index(
        spark, path,
        deleted_ids=spark.createDataFrame([(victim_id,)], "vec_id bigint"),
    )
    assert r["removed"] == 1 and r["touched_clusters"] == 1
    after = _files()
    for d in before:
        if d != f"cluster={c0}":
            assert after[d] == before[d], f"{d} was rewritten"
    assert after[f"cluster={c0}"] != before[f"cluster={c0}"]


def test_ivf_repair_contracts(spark, tmp_path):
    base, path = _repair_fixture(spark, tmp_path, n_clusters=4)
    # duplicate update ids: ambiguous — refused
    dup = _modified(base.limit(1)).unionByName(_modified(base.limit(1)))
    with pytest.raises(ValueError, match="unique per id"):
        SIM.repair_ivf_index(spark, path, updates=dup)
    # dim mismatch refused
    bad = spark.createDataFrame(
        [(0, [0.0] * (DIM + 1))], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="-d"):
        SIM.repair_ivf_index(spark, path, updates=bad)
    # nothing to do: exact no-op
    r = SIM.repair_ivf_index(spark, path)
    assert r == {
        "removed": 0, "reassigned": 0, "touched_clusters": 0,
        "appended_fraction": 0.0, "min_centroid_cos": 1.0,
        "needs_rebuild": 0, "prefer_rebuild": 0,
    }
    # deleting ids absent from the index: no-op eviction
    r2 = SIM.repair_ivf_index(
        spark, path,
        deleted_ids=spark.createDataFrame([(777777,)], "vec_id bigint"),
    )
    assert r2["removed"] == 0 and r2["touched_clusters"] == 0


@pytest.mark.slow
def test_ivf_repair_scatter_arbiter(spark, tmp_path):
    """Repair-vs-rebuild arbiter (round-12 verdict #3): the
    prefer_rebuild hint fires exactly on the conjunction — touched
    clusters ≥ half of n_clusters AND projected appended fraction past
    half the rebuild trigger — and with abort_on_prefer_rebuild the
    index is left untouched byte-for-byte for the caller's in-line
    rebuild."""
    base = _mk_vecs(spark, n=120, seed=7)
    scatter = _modified(base.limit(30))  # spreads over all clusters

    def _fresh(path):
        SIM.build_ivf_index(base, str(path), n_clusters=4, n_iter=2)
        return str(path)

    # 1. scatter WITHOUT armed drift (appended=0, projected 30/120=0.25
    # >= 0.125 arm — actually armed; use few mods for the unarmed leg)
    p1 = _fresh(tmp_path / "unarmed")
    few = _modified(base.limit(8))  # projected 8/120 < 0.125
    r1 = SIM.repair_ivf_index(spark, p1, updates=few)
    assert r1["prefer_rebuild"] == 0 and "aborted" not in r1
    # 2. scatter WITH armed drift: hint fires, repair still exact
    p2 = _fresh(tmp_path / "armed")
    r2 = SIM.repair_ivf_index(spark, p2, updates=scatter)
    assert r2["touched_clusters"] >= 2  # genuinely scattered
    assert r2["prefer_rebuild"] == 1 and r2["needs_rebuild"] == 1
    corrected = base.join(
        scatter.select("vec_id"), ["vec_id"], "left_anti"
    ).unionByName(scatter)
    q = base.limit(5)
    got = SIM.ivf_topk_state(spark, p2, q, k=K, n_probe=4)
    want = SIM.brute_force_topk(corrected, q, k=K)
    assert _rows(got) == _rows(want)
    # 3. same shape with the abort: index untouched byte-for-byte
    p3 = _fresh(tmp_path / "aborted")
    import os

    def _tree(p):
        out = {}
        for root, _, files in os.walk(p):
            for f in files:
                full = os.path.join(root, f)
                out[full] = os.path.getmtime(full)
        return out

    before = _tree(p3)
    r3 = SIM.repair_ivf_index(
        spark, p3, updates=scatter, abort_on_prefer_rebuild=True
    )
    assert r3["aborted"] == 1 and r3["prefer_rebuild"] == 1
    assert r3["removed"] == 0 and r3["reassigned"] == 0
    assert _tree(p3) == before
    # serving still reflects the ORIGINAL corpus exactly
    got0 = SIM.ivf_topk_state(spark, p3, q, k=K, n_probe=4)
    want0 = SIM.brute_force_topk(base, q, k=K)
    assert _rows(got0) == _rows(want0)
    # 4. clustered mods with armed drift: no scatter, no hint
    p4 = _fresh(tmp_path / "clustered")
    one_blob = base.filter(F.col("vec_id") % 8 == 0).limit(20)
    near = one_blob.withColumn(
        "embedding",
        F.transform(
            "embedding", lambda x: (x + F.lit(0.01)).cast("float")
        ),
    )  # projected 20/120 >= 0.125, but same-blob ids stay clustered
    r4 = SIM.repair_ivf_index(spark, p4, updates=near)
    if r4["touched_clusters"] < 2:  # the blob landed in one list
        assert r4["prefer_rebuild"] == 0


def test_ivf_repair_refuses_legacy_lists_layout(spark, tmp_path):
    """round-12 ADVICE: repairing a pre-vec_hash lists relation would
    append vec_hash-bearing rows into it, mixing parquet schemas —
    so the nightly leg's '"vec_hash" in lists.columns' detection would
    depend on which footer Spark samples. Legacy layouts are refused
    (the repair_embedding_state discipline)."""
    import shutil

    base, path = _repair_fixture(spark, tmp_path, n_clusters=4)
    # strip vec_hash: rewrite the lists without it, same partitioning
    legacy = (
        spark.read.parquet(f"{path}/lists")
        .select("vec_id", "embedding", "cluster")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(f"{path}/lists")
    legacy.repartition("cluster").write.partitionBy("cluster").parquet(
        f"{path}/lists"
    )
    spark.catalog.refreshByPath(f"{path}/lists")
    with pytest.raises(ValueError, match="legacy"):
        SIM.repair_ivf_index(spark, path, updates=_modified(base.limit(1)))


@pytest.mark.parametrize("n,want_k", [(400, 12), (3200, 57)])
def test_ivf_auto_n_clusters_recall(spark, tmp_path, n, want_k):
    """n_clusters="auto" (round-11 verdict #2): k ≈ √n clamped (the
    band_planes="auto" discipline — resolved k recorded in the spec),
    and a quarter-probe serve over the auto-sized index holds high
    recall@k on a clustered corpus at BOTH sizes."""
    corpus = _mk_vecs(spark, n=n, seed=13)
    path = str(tmp_path / "auto")
    meta = SIM.build_ivf_index(corpus, path, n_clusters="auto", n_iter=2)
    assert meta["n_clusters"] == want_k  # min(round(sqrt(n)), n // 32)
    assert SIM.read_ivf_index(spark, path)["spec"]["n_clusters"] == want_k
    queries = corpus.filter(F.col("vec_id") % (n // 8) == 1)
    n_probe = max(1, want_k // 4)
    got = SIM.ivf_topk_state(spark, path, queries, k=K, n_probe=n_probe)
    want = SIM.brute_force_topk(corpus, queries, k=K)
    got_set = {(r["q_id"], r["vec_id"]) for r in got.collect()}
    want_set = {(r["q_id"], r["vec_id"]) for r in want.collect()}
    recall = len(got_set & want_set) / len(want_set)
    assert recall >= 0.9, f"recall {recall} at n={n}, k={want_k}"


def test_ivf_auto_n_clusters_clamps():
    """The sizing rule's clamps directly (no Spark)."""
    assert SIM._auto_n_clusters(1) == 1
    assert SIM._auto_n_clusters(100) == 3  # n//32 floor rules tiny corpora
    assert SIM._auto_n_clusters(1024) == 32
    assert SIM._auto_n_clusters(1_000_000) == 1000
    assert SIM._auto_n_clusters(10**10) == 4096  # the sharding crossover


def test_ivf_concurrent_writer_refused(spark, tmp_path):
    """Single-writer tripwire (round-11 verdict #8): the spec epoch
    bumps on every append/repair; a maintenance run whose entry-time
    epoch moved before its own spec swap refuses instead of silently
    mixing two runs' aggregates."""
    corpus = _mk_vecs(spark, n=100, seed=14)
    path = str(tmp_path / "ivf")
    SIM.build_ivf_index(corpus, path, n_clusters=4, n_iter=1)
    spec0 = SIM.read_ivf_index(spark, path)["spec"]
    assert spec0["epoch"] == 0
    SIM.append_ivf_index(
        spark, path, _mk_vecs(spark, n=4, seed=15, id_start=1000)
    )
    assert SIM.read_ivf_index(spark, path)["spec"]["epoch"] == 1
    # simulate the interleave: another writer's swap lands mid-run
    with pytest.raises(RuntimeError, match="concurrent"):
        SIM._write_spec_guarded(
            spark, path, {"epoch": 0}, (DIM, 4, 104, 4)
        )
    # repair bumps too
    mod = _modified(corpus.limit(1))
    SIM.repair_ivf_index(spark, path, updates=mod)
    assert SIM.read_ivf_index(spark, path)["spec"]["epoch"] == 2


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
