"""The ANN serving-index leg composed into the pipeline (round 11) —
the vector twin of the dedup leg: bootstrap → O(delta) append →
stale-ledger triggers → serve-with-exclusion, plus the run_sync wiring
over chunk embeddings (the reference's dense_vector serving surface,
dags/lib/elastic.py:107-119)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eea_crawler_spark.pipeline import (
    AnnConfig,
    ann_search,
    run_ann_maintenance,
)


def _mk_vecs(spark, n=120, dim=12, seed=4, id_start=0):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((6, dim)) * 3.0
    rows = [
        (
            f"c{id_start + i}",
            [float(x) for x in centers[i % 6] + 0.1 * rng.standard_normal(dim)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "chunk_id string, embedding array<float>"
    )


@pytest.mark.slow
def test_ann_maintenance_lifecycle(spark, tmp_path):
    acfg = AnnConfig(
        index_path=str(tmp_path / "ivf"),
        n_clusters=4,
        n_iter=1,
        rebuild_stale_fraction=0.2,
        status_path=str(tmp_path / "status"),
    )
    corpus = _mk_vecs(spark, n=120, seed=4)
    # 1. bootstrap: no index yet -> built from the corpus
    r0 = run_ann_maintenance(spark, acfg, None, corpus=corpus)
    assert r0["built"] == 120
    # 2. nightly: fresh ids append, no staleness
    fresh = _mk_vecs(spark, n=10, seed=5, id_start=1000)
    r1 = run_ann_maintenance(spark, acfg, fresh)
    assert r1["appended"] == 10 and r1["stale"] == 0
    assert r1["needs_rebuild"] == 0
    # the appended rows are servable, exactly
    from eea_crawler_spark.operators import similarity as SIM

    q = fresh.limit(3)
    got = ann_search(spark, acfg, q, k=3, n_probe=4).collect()
    want = SIM.brute_force_topk(
        corpus.unionByName(fresh), q, k=3,
        id_col="chunk_id", vec_col="embedding",
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # 2b. an UNCHANGED re-delivery (same id, identical vector — a doc
    # edit re-embeds all its chunks but changes few) is NOT ledgered
    # and stays served
    r1b = run_ann_maintenance(spark, acfg, corpus.limit(4))
    assert r1b["appended"] == 0 and r1b["stale"] == 0
    assert r1b["stale_total"] == 0
    # 3. a MODIFIED id (standing, new vector) is ledgered and excluded
    # from serving — the old vector is never served
    mod = corpus.filter(F.col("chunk_id") == "c0").withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x + F.lit(9.0)).cast("float")),
    )
    r2 = run_ann_maintenance(spark, acfg, mod)
    assert r2["appended"] == 0 and r2["stale"] == 1
    assert r2["stale_total"] == 1
    served = {
        r["chunk_id"]
        for r in ann_search(spark, acfg, corpus.limit(5), k=130,
                            n_probe=4).collect()
    }
    assert "c0" not in served
    # 4. deletions ledger too; enough staleness trips the trigger and
    # the status event lands
    doomed = corpus.filter(
        F.col("chunk_id").isin([f"c{i}" for i in range(1, 30)])
    ).select("chunk_id")
    r3 = run_ann_maintenance(spark, acfg, None, deleted_ids=doomed)
    assert r3["stale"] == 29 and r3["stale_total"] == 30
    assert r3["needs_rebuild"] == 1  # 30/130 >= 0.2
    events = {
        (e["task_name"], e["status"])
        for e in spark.read.parquet(acfg.status_path).collect()
    }
    assert ("ann:ivf", "needs_rebuild") in events
    # 5. rebuild_on_trigger: the in-line rebuild over the live corpus
    # resets the ledger and re-serves the modified id's NEW vector
    live = (
        corpus.filter(~F.col("chunk_id").isin([f"c{i}" for i in range(30)]))
        .unionByName(fresh)
        .unionByName(mod)
    )
    acfg_rb = AnnConfig(
        index_path=acfg.index_path,
        n_clusters=4,
        n_iter=1,
        rebuild_stale_fraction=0.0001,
        rebuild_on_trigger=True,
    )
    extra = _mk_vecs(spark, n=2, seed=6, id_start=2000)
    r4 = run_ann_maintenance(
        spark, acfg_rb, extra, corpus=live.unionByName(extra)
    )
    assert r4["rebuilt"] == 1 and r4["needs_rebuild"] == 0
    assert r4["stale_total"] == 0
    served = {
        r["chunk_id"]
        for r in ann_search(spark, acfg, mod, k=1, n_probe=4).collect()
    }
    # c0's new vector is indexed again (its own nearest is no longer
    # excluded; self-match is excluded by the kernel, so check presence
    # in the index through a probe-all serve over a far query)
    all_ids = {
        r["chunk_id"]
        for r in ann_search(spark, acfg, extra.limit(1), k=200,
                            n_probe=4).collect()
    }
    assert "c0" in all_ids


@pytest.mark.slow
def test_sync_ann_leg_e2e(spark, tmp_path):
    """run_sync wiring: chunk embeddings feed the index (bootstrap on
    first sync, O(delta) append on later ones); deleting a doc removes
    its chunk rows from the chunks table and ledgers them stale."""
    from eea_crawler_spark.pipeline import SyncConfig, SyncPaths, run_sync
    from eea_crawler_spark.sinks import lakehouse as LK
    from tests.test_dedup_pipeline import SITE, DupSite

    paths = SyncPaths(
        raw=str(tmp_path / "raw"),
        searchui=str(tmp_path / "searchui"),
        quarantine=str(tmp_path / "quarantine"),
        status=str(tmp_path / "status"),
        chunks=str(tmp_path / "chunks"),
    )
    acfg = AnnConfig(
        index_path=str(tmp_path / "ivf"), n_clusters=2, n_iter=1
    )
    cfg = SyncConfig(site_url=SITE, site_id="eea", embed=True, ann=acfg)
    site = DupSite()
    d = lambda i: f"{SITE}/d{i}"  # noqa: E731

    r1 = run_sync(spark, cfg, paths, site)
    assert r1["fetched"] == 8
    n_chunks = LK.read_table(spark, paths.chunks).count()
    assert r1["ann_built"] == n_chunks > 0

    # run 2: a new doc arrives -> its chunks APPEND (no rebuild)
    site._add(9, "brand new body " * 30, modified="2024-02-02")
    r2 = run_sync(spark, cfg, paths, site)
    assert r2["ann_appended"] > 0 and r2["ann_rebuilt"] == 0
    assert r2["ann_stale"] == 0

    # run 3: delete a doc -> chunks table loses its rows, index
    # ledgers them stale, serving excludes them
    del site.docs[d(9)]
    r3 = run_sync(spark, cfg, paths, site)
    assert r3["deleted"] == 1
    assert r3["ann_stale"] > 0
    chunk_ids = {
        r["chunk_id"] for r in LK.read_table(spark, paths.chunks).collect()
    }
    assert not any(c.startswith(d(9)) for c in chunk_ids)
    # materialize the query row: the chunks table's files are rewritten
    # by later merges, so a lazy read would dangle
    q_row = (
        LK.read_table(spark, paths.chunks)
        .select("chunk_id", "embedding")
        .first()
    )
    q = spark.createDataFrame(
        [(q_row["chunk_id"], [float(x) for x in q_row["embedding"]])],
        "chunk_id string, embedding array<float>",
    )
    served = {
        r["chunk_id"]
        for r in ann_search(spark, acfg, q, k=500, n_probe=2).collect()
    }
    assert served and not any(c.startswith(d(9)) for c in served)

    # run 4: a doc SHRINKS (600 words -> 80): its re-chunking produces
    # fewer chunks — the vanished chunk ids must leave the chunks
    # table (exact per-doc replacement, the reference rewrites the
    # nlp_250 list wholesale) and join the ANN stale ledger
    site._add(10, "long body word " * 200, modified="2024-04-04")
    r4 = run_sync(spark, cfg, paths, site)
    assert r4["fetched"] == 1
    d10 = {
        r["chunk_id"]
        for r in LK.read_table(spark, paths.chunks)
        .filter(F.col("id") == d(10))
        .collect()
    }
    assert len(d10) >= 2, "fixture must produce a multi-chunk doc"
    site._add(10, "short body " * 8, modified="2024-05-05")
    r5 = run_sync(spark, cfg, paths, site)
    assert r5["fetched"] == 1
    d10_after = {
        r["chunk_id"]
        for r in LK.read_table(spark, paths.chunks)
        .filter(F.col("id") == d(10))
        .collect()
    }
    assert len(d10_after) < len(d10)
    vanished = d10 - d10_after
    assert vanished and r5["ann_stale"] >= len(vanished)
    served = {
        r["chunk_id"]
        for r in ann_search(spark, acfg, q, k=500, n_probe=2).collect()
    }
    assert served.isdisjoint(vanished)


@pytest.mark.slow
def test_ann_repair_in_place_serves_new_vector_same_night(spark, tmp_path):
    """repair_in_place (round-11 verdict #1 — the reference's
    doc_as_upsert semantics): a MODIFIED id's NEW vector serves the
    same nightly run, deletions leave the lists physically, nothing is
    ledgered, and probe-all equals brute force over the corrected
    corpus."""
    import os

    from eea_crawler_spark.operators import similarity as SIM

    acfg = AnnConfig(
        index_path=str(tmp_path / "ivf"), n_clusters=4, n_iter=1,
        repair_in_place=True,
    )
    corpus = _mk_vecs(spark, n=120, seed=4)
    run_ann_maintenance(spark, acfg, None, corpus=corpus)
    # one nightly: 5 fresh inserts + 3 modified + 2 deleted
    fresh = _mk_vecs(spark, n=5, seed=5, id_start=1000)
    mod = corpus.filter(
        F.col("chunk_id").isin(["c0", "c1", "c2"])
    ).withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x + F.lit(9.0)).cast("float")),
    )
    doomed = corpus.filter(F.col("chunk_id").isin(["c5", "c6"])).select(
        "chunk_id"
    )
    r = run_ann_maintenance(
        spark, acfg, fresh.unionByName(mod), deleted_ids=doomed
    )
    assert r["appended"] == 5
    assert r["repaired"] == 3 and r["removed"] == 5  # 3 mod + 2 deleted
    assert r["stale"] == 0 and r["stale_total"] == 0
    assert not os.path.exists(f"{acfg.index_path}/stale_ids")
    corrected = (
        corpus.filter(
            ~F.col("chunk_id").isin(["c0", "c1", "c2", "c5", "c6"])
        )
        .unionByName(mod)
        .unionByName(fresh)
    )
    q = corrected.limit(6)
    got = ann_search(spark, acfg, q, k=4, n_probe=4)
    want = SIM.brute_force_topk(
        corrected, q, k=4, id_col="chunk_id", vec_col="embedding"
    )
    assert [tuple(x) for x in got.collect()] == [
        tuple(x) for x in want.collect()
    ]
    # an UNCHANGED re-delivery still repairs nothing
    r2 = run_ann_maintenance(spark, acfg, corpus.limit(3).filter(
        ~F.col("chunk_id").isin(["c0", "c1", "c2"])
    ))
    assert r2.get("repaired", 0) == 0 and r2["appended"] == 0


@pytest.mark.slow
def test_ann_repair_purges_standing_ledger(spark, tmp_path):
    """Switching a ledgered index to repair_in_place: a re-delivered
    modified id that an earlier exclude-mode night ledgered is repaired
    AND leaves the ledger — serving completeness recovers without a
    rebuild."""
    from eea_crawler_spark.operators import similarity as SIM

    base = AnnConfig(
        index_path=str(tmp_path / "ivf"), n_clusters=2, n_iter=1,
        rebuild_stale_fraction=1.0,
    )
    corpus = _mk_vecs(spark, n=40, dim=8, seed=10)
    run_ann_maintenance(spark, base, None, corpus=corpus)
    mod = corpus.filter(F.col("chunk_id") == "c3").withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x * F.lit(-1.0)).cast("float")),
    )
    r1 = run_ann_maintenance(spark, base, mod)  # exclude mode: ledgered
    assert r1["stale_total"] == 1
    rep_cfg = AnnConfig(
        index_path=base.index_path, n_clusters=2, n_iter=1,
        repair_in_place=True,
    )
    r2 = run_ann_maintenance(spark, rep_cfg, mod)  # re-delivery repairs
    assert r2["repaired"] == 1 and r2["stale_total"] == 0
    got = ann_search(spark, rep_cfg, mod, k=50, n_probe=2)
    live = corpus.filter(F.col("chunk_id") != "c3").unionByName(mod)
    want = SIM.brute_force_topk(
        live, mod, k=50, id_col="chunk_id", vec_col="embedding"
    )
    assert [tuple(x) for x in got.collect()] == [
        tuple(x) for x in want.collect()
    ]


@pytest.mark.slow
def test_ann_repair_crash_leaves_touched_ids_ledgered(
    spark, tmp_path, monkeypatch
):
    """round-12 ADVICE (medium): repair_ivf_index's crash discipline
    requires the touched ids LEDGERED for serve-time exclusion until
    the repair returns. The nightly leg must write them to stale_ids
    BEFORE invoking the repair — a crash mid-repair then leaves the
    possibly-stale ids excluded from serving (never-a-wrong-answer),
    and a successful retry purges them again."""
    import os

    from eea_crawler_spark.operators import similarity as SIM

    acfg = AnnConfig(
        index_path=str(tmp_path / "ivf"), n_clusters=2, n_iter=1,
        repair_in_place=True, rebuild_stale_fraction=1.0,
    )
    corpus = _mk_vecs(spark, n=40, dim=8, seed=11)
    run_ann_maintenance(spark, acfg, None, corpus=corpus)
    mod = corpus.filter(F.col("chunk_id") == "c2").withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x + F.lit(7.0)).cast("float")),
    )
    real_repair = SIM.repair_ivf_index

    def crash_repair(*a, **kw):
        raise RuntimeError("crash mid-repair")

    monkeypatch.setattr(SIM, "repair_ivf_index", crash_repair)
    with pytest.raises(RuntimeError, match="mid-repair"):
        run_ann_maintenance(spark, acfg, mod)
    # the pre-repair ledger write landed: c2 is excluded from serving
    led = {
        r["id"]
        for r in spark.read.parquet(
            f"{acfg.index_path}/stale_ids"
        ).collect()
    }
    assert "c2" in led
    served = {
        r["chunk_id"]
        for r in ann_search(spark, acfg, corpus.limit(3), k=50,
                            n_probe=2).collect()
    }
    assert "c2" not in served
    # successful retry: repaired, ledger purged back to absent, the
    # NEW vector serves
    monkeypatch.setattr(SIM, "repair_ivf_index", real_repair)
    r = run_ann_maintenance(spark, acfg, mod)
    assert r["repaired"] == 1 and r["stale_total"] == 0
    assert not os.path.exists(f"{acfg.index_path}/stale_ids")
    live = corpus.filter(F.col("chunk_id") != "c2").unionByName(mod)
    got = ann_search(spark, acfg, mod, k=50, n_probe=2)
    want = SIM.brute_force_topk(
        live, mod, k=50, id_col="chunk_id", vec_col="embedding"
    )
    assert [tuple(x) for x in got.collect()] == [
        tuple(x) for x in want.collect()
    ]


@pytest.mark.slow
def test_ann_repair_scatter_escalates_to_rebuild(spark, tmp_path):
    """The pipeline honors the repair's prefer_rebuild hint (round-12
    verdict #3): on the scatter-plus-armed-drift shape with
    rebuild_on_trigger and a corpus available, the repair aborts
    untouched and the in-line rebuild takes over — one rebuild instead
    of a full-list-rewrite repair plus an imminent trigger rebuild —
    and serving equals brute force over the corrected corpus."""
    from eea_crawler_spark.operators import similarity as SIM

    acfg = AnnConfig(
        index_path=str(tmp_path / "ivf"), n_clusters=4, n_iter=1,
        repair_in_place=True, rebuild_on_trigger=True,
        rebuild_stale_fraction=1.0,
    )
    corpus = _mk_vecs(spark, n=120, seed=12)
    run_ann_maintenance(spark, acfg, None, corpus=corpus)
    mod = corpus.filter(
        F.col("chunk_id").isin([f"c{i}" for i in range(30)])
    ).withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x + F.lit(9.0)).cast("float")),
    )
    corrected = corpus.join(
        mod.select("chunk_id"), ["chunk_id"], "left_anti"
    ).unionByName(mod)
    r = run_ann_maintenance(spark, acfg, mod, corpus=corrected)
    assert r.get("prefer_rebuild") == 1
    assert r["rebuilt"] == 1 and r["repaired"] == 0
    assert r["stale_total"] == 0 and r["needs_rebuild"] == 0
    q = corrected.limit(5)
    got = ann_search(spark, acfg, q, k=4, n_probe=4)
    want = SIM.brute_force_topk(
        corrected, q, k=4, id_col="chunk_id", vec_col="embedding"
    )
    assert [tuple(x) for x in got.collect()] == [
        tuple(x) for x in want.collect()
    ]


def test_stale_ledger_midswap_crash_never_serves_stale(spark, tmp_path):
    """Round-11 ADVICE (medium): a crash mid-compaction-swap leaves the
    ledger in its __new dir. Serving must STILL exclude the ledgered
    ids (the never-a-wrong-answer contract), and the next nightly's
    append must heal the layout first — a fresh primary would orphan
    the __new ids and lose them at the next compaction."""
    import os
    import shutil

    acfg = AnnConfig(
        index_path=str(tmp_path / "ivf"), n_clusters=2, n_iter=1,
        rebuild_stale_fraction=1.0,
    )
    corpus = _mk_vecs(spark, n=40, dim=8, seed=21)
    run_ann_maintenance(spark, acfg, None, corpus=corpus)
    mod = corpus.filter(F.col("chunk_id") == "c1").withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x + F.lit(7.0)).cast("float")),
    )
    run_ann_maintenance(spark, acfg, mod)
    ledger = f"{acfg.index_path}/stale_ids"
    # simulate the mid-swap crash: primary gone, __new holds the ids
    shutil.move(ledger, f"{ledger}__new")
    served = {
        r["chunk_id"]
        for r in ann_search(spark, acfg, corpus.limit(5), k=50,
                            n_probe=2).collect()
    }
    assert "c1" not in served, "crashed ledger swap must still exclude"
    # next nightly ledgers another id: the append heals first, so the
    # primary ends with BOTH ids (nothing orphaned in __new)
    mod2 = corpus.filter(F.col("chunk_id") == "c2").withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x + F.lit(7.0)).cast("float")),
    )
    r = run_ann_maintenance(spark, acfg, mod2)
    assert r["stale_total"] == 2
    assert not os.path.exists(f"{ledger}__new")
    ids = {r["id"] for r in spark.read.parquet(ledger).collect()}
    assert ids == {"c1", "c2"}


@pytest.mark.slow
def test_rebuild_clears_orphaned_ledger_siblings(spark, tmp_path):
    """A rebuild resets the ledger INCLUDING a crashed compaction's
    __new orphan: otherwise _read_rel would resurrect the ghost ids,
    re-latch needs_rebuild, and exclude freshly re-indexed entries
    from serving forever."""
    import os

    acfg = AnnConfig(
        index_path=str(tmp_path / "ivf"), n_clusters=2, n_iter=1,
        rebuild_stale_fraction=0.01, rebuild_on_trigger=True,
    )
    corpus = _mk_vecs(spark, n=40, dim=8, seed=22)
    run_ann_maintenance(spark, acfg, None, corpus=corpus)
    mod = corpus.filter(F.col("chunk_id") == "c1").withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x + F.lit(5.0)).cast("float")),
    )
    live = corpus.filter(F.col("chunk_id") != "c1").unionByName(mod)
    # the modified id trips the stale trigger; rebuild_on_trigger runs
    # the in-line rebuild — with a crashed compaction's __new orphan
    # already lying around, it must be cleared too
    ledger = f"{acfg.index_path}/stale_ids"
    os.makedirs(f"{ledger}__new", exist_ok=True)
    spark.createDataFrame([("ghost",)], "id string").write.mode(
        "overwrite"
    ).parquet(f"{ledger}__new")
    r = run_ann_maintenance(spark, acfg, mod, corpus=live)
    assert r["rebuilt"] == 1 and r["stale_total"] == 0
    assert not os.path.exists(ledger)
    assert not os.path.exists(f"{ledger}__new")
    # the re-indexed id serves again
    far = _mk_vecs(spark, n=1, dim=8, seed=23, id_start=9000)
    served = {
        r["chunk_id"]
        for r in ann_search(spark, acfg, far, k=50, n_probe=2).collect()
    }
    assert "c1" in served


@pytest.mark.slow
def test_sync_chunk_delete_without_ann(spark, tmp_path):
    """Round-11 ADVICE (low): a deleted doc's chunk rows must leave the
    chunks table even with the ANN leg OFF — the delete was previously
    gated on cfg.ann and the chunks kept polluting search."""
    from pyspark.sql import functions as F

    from eea_crawler_spark.pipeline import SyncConfig, SyncPaths, run_sync
    from eea_crawler_spark.sinks import lakehouse as LK
    from tests.test_dedup_pipeline import SITE, DupSite

    paths = SyncPaths(
        raw=str(tmp_path / "raw"),
        searchui=str(tmp_path / "searchui"),
        quarantine=str(tmp_path / "quarantine"),
        status=str(tmp_path / "status"),
        chunks=str(tmp_path / "chunks"),
    )
    cfg = SyncConfig(site_url=SITE, site_id="eea", embed=True, ann=None)
    site = DupSite()
    d = lambda i: f"{SITE}/d{i}"  # noqa: E731
    run_sync(spark, cfg, paths, site)
    assert (
        LK.read_table(spark, paths.chunks)
        .filter(F.col("id") == d(1)).count() > 0
    )
    del site.docs[d(1)]
    r = run_sync(spark, cfg, paths, site)
    assert r["deleted"] == 1
    assert (
        LK.read_table(spark, paths.chunks)
        .filter(F.col("id") == d(1)).count() == 0
    )


@pytest.mark.slow
def test_ann_maintenance_modified_then_rebuild_serves_new_vector(
    spark, tmp_path
):
    """The staleness contract end-to-end: before rebuild the modified
    id is absent from serving; after rebuild its NEW vector's
    neighbors are served (never the old vector's)."""
    acfg = AnnConfig(
        index_path=str(tmp_path / "ivf"), n_clusters=2, n_iter=1,
        rebuild_stale_fraction=1.0,
    )
    corpus = _mk_vecs(spark, n=40, dim=8, seed=10)
    run_ann_maintenance(spark, acfg, None, corpus=corpus)
    mod = corpus.filter(F.col("chunk_id") == "c3").withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x * F.lit(-1.0)).cast("float")),
    )
    run_ann_maintenance(spark, acfg, mod)
    # absent while stale
    got = {
        r["chunk_id"]
        for r in ann_search(spark, acfg, corpus.limit(8), k=50,
                            n_probe=2).collect()
    }
    assert "c3" not in got
    # rebuild over the live corpus (with the new vector)
    live = corpus.filter(F.col("chunk_id") != "c3").unionByName(mod)
    from eea_crawler_spark.operators import similarity as SIM

    SIM.build_ivf_index(
        live, acfg.index_path, n_clusters=2, n_iter=1,
        id_col="chunk_id", vec_col="embedding",
    )
    from eea_crawler_spark.operators.dedup import _fs_delete

    _fs_delete(spark, f"{acfg.index_path}/stale_ids")
    got = ann_search(spark, acfg, mod, k=50, n_probe=2).collect()
    want = SIM.brute_force_topk(
        live, mod, k=50, id_col="chunk_id", vec_col="embedding"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
