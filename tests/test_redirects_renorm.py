"""Redirect maintenance sweep (d6/d7) + re-normalization (d4) + NLP registry.

Covers the three maintenance surfaces SURVEY §3.2-§3.3 describe:
 - run_redirect_sweep: prefix scan → bulk-partitioned HEAD probe →
   update-only flag merge, with the reference's skip rules (manual
   exclusions untouched, probe errors = not-redirected);
 - run_renormalize: rebuild searchui from raw without crawling, with
   error-doc skip, portal-type filter, and update-only mode;
 - nlp_preprocess_by_site: registry dispatch + 250/50 chunk column.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from eea_crawler_spark.operators import redirects as RD
from eea_crawler_spark.operators import sites as S
from eea_crawler_spark.pipeline import SyncConfig, SyncPaths, run_renormalize, run_sync

PUB = RD.PUBLICATIONS_PREFIX


@pytest.fixture()
def paths(tmp_path):
    return SyncPaths(
        raw=str(tmp_path / "raw"),
        searchui=str(tmp_path / "searchui"),
        quarantine=str(tmp_path / "quarantine"),
        status=str(tmp_path / "status"),
    )


# ---- redirect sweep ------------------------------------------------------


def _searchui_table(spark, path):
    rows = [
        (f"{PUB}/a", None, "A"),          # will redirect → mark
        (f"{PUB}/b", "redirected", "B"),  # still redirects → keep
        (f"{PUB}/c", "redirected", "C"),  # no longer redirects → clear
        (f"{PUB}/d", "manual", "D"),      # manual flag → never touched
        (f"{PUB}/e", None, "E"),          # clean → untouched
        ("https://www.eea.europa.eu/other/x", None, "X"),  # outside prefix
    ]
    spark.createDataFrame(
        rows, "id string, exclude_from_globalsearch string, title string"
    ).write.mode("overwrite").parquet(path)


class HeadProbe:
    """Transport stub: 301 for redirecting urls, raises for broken."""

    def __init__(self, redirecting, broken=()):
        self.redirecting = set(redirecting)
        self.broken = set(broken)
        self.seen = []

    def __call__(self, url):
        self.seen.append(url)
        if url in self.broken:
            raise OSError("probe failed")
        return (301, "") if url in self.redirecting else (200, "")


def test_redirect_sweep_marks_clears_and_skips(spark, paths):
    _searchui_table(spark, paths.searchui)
    probe = HeadProbe(redirecting={f"{PUB}/a", f"{PUB}/b", f"{PUB}/d"})
    res = RD.run_redirect_sweep(spark, paths.searchui, probe)
    assert res["candidates"] == 5  # prefix filter excludes /other/x
    assert res["updated"] == 2  # a marked, c cleared; b unchanged, d manual
    flags = {
        r["id"]: r["exclude_from_globalsearch"]
        for r in spark.read.parquet(paths.searchui).collect()
    }
    assert flags[f"{PUB}/a"] == "redirected"
    assert flags[f"{PUB}/b"] == "redirected"
    assert flags[f"{PUB}/c"] is None
    assert flags[f"{PUB}/d"] == "manual"  # skip_redirect rule
    assert flags[f"{PUB}/e"] is None
    # other columns survive the flag-only merge
    titles = {r["id"]: r["title"] for r in spark.read.parquet(paths.searchui).collect()}
    assert titles[f"{PUB}/a"] == "A" and len(titles) == 6


def test_redirect_probe_error_counts_as_not_redirected(spark, paths):
    _searchui_table(spark, paths.searchui)
    # b's probe now fails → treated as not-redirected → cleared
    probe = HeadProbe(redirecting=set(), broken={f"{PUB}/b"})
    res = RD.run_redirect_sweep(spark, paths.searchui, probe)
    flags = {
        r["id"]: r["exclude_from_globalsearch"]
        for r in spark.read.parquet(paths.searchui).collect()
    }
    assert flags[f"{PUB}/b"] is None and flags[f"{PUB}/c"] is None
    assert res["updated"] == 2


def test_redirect_bulk_partitioning(spark):
    df = spark.range(25).select(
        F.concat(F.lit(f"{PUB}/p"), F.col("id")).alias("id"),
        F.lit(None).cast("string").alias("stored_flag"),
    )
    probed = RD.probe_redirects(df, HeadProbe(set()), bulk_size=10)
    # ceil(25/10) = 3 partitions (the d6 bulk split)
    assert probed.rdd.getNumPartitions() == 3
    assert probed.count() == 25


def test_redirect_sweep_preserves_mor_segments(spark, tmp_path, monkeypatch):
    """The round-6 ADVICE data-loss bug: the sweep read a MOR searchui
    with a plain parquet scan (stale base) and its rewrite rmtree'd the
    segment log — un-compacted upserts/deletes vanished. Now the sweep
    must (a) probe the RESOLVED view, (b) apply flags as a merge that
    keeps every segment-held update and tombstone."""
    from eea_crawler_spark.sinks import lakehouse as LK

    # tiny tables trip the 10% compaction bound on every append; keep
    # the segment log standing so the preservation property is visible
    monkeypatch.setattr(LK, "MOR_COMPACT_FRACTION", 1e9)
    path = str(tmp_path / "searchui_mor")
    base = spark.createDataFrame(
        [
            (f"{PUB}/a", None, "A-stale", 1),
            (f"{PUB}/b", "redirected", "B", 1),
            (f"{PUB}/gone", None, "G", 1),
        ],
        "id string, exclude_from_globalsearch string, title string, indexed_at int",
    )
    LK.merge_upsert(spark, path, base, key="id", order_col="indexed_at", backend="mor")
    # segment 1: /a retitled; segment 2: /gone deleted — neither compacted
    upd = spark.createDataFrame(
        [(f"{PUB}/a", None, "A-fresh", 2)], base.schema
    )
    LK.merge_upsert(spark, path, upd, key="id", order_col="indexed_at", backend="mor")
    LK.merge_delete(
        spark, path, spark.createDataFrame([(f"{PUB}/gone",)], "id string"),
        backend="mor",
    )
    assert LK.is_mor_table(path) and LK._mor_segments(path)

    probe = HeadProbe(redirecting={f"{PUB}/a"})
    res = RD.run_redirect_sweep(spark, path, probe)
    # the tombstoned doc must NOT resurface as a probe candidate
    assert res["candidates"] == 2
    assert res["updated"] == 2  # /a marked, /b cleared

    out = {r["id"]: r for r in LK.read_table(spark, path).collect()}
    assert set(out) == {f"{PUB}/a", f"{PUB}/b"}  # delete survived the sweep
    assert out[f"{PUB}/a"]["exclude_from_globalsearch"] == "redirected"
    assert out[f"{PUB}/a"]["title"] == "A-fresh"  # segment upsert survived
    assert out[f"{PUB}/b"]["exclude_from_globalsearch"] is None
    assert LK.is_mor_table(path)  # layout intact, not converted away


# ---- d4 re-normalization -------------------------------------------------

SITE = "https://stub.example"


class StubSite:
    def __init__(self):
        self.docs = {
            f"{SITE}/d{i}": {"modified": "2024-01-01", "title": f"Doc {i}"}
            for i in range(4)
        }

    def __call__(self, url):
        if "@search" in url:
            if "b_start=0" not in url:
                return 200, json.dumps({"items": [], "batching": {}})
            items = [
                {"@id": k, "@type": "Document", "modified": d["modified"]}
                for k, d in sorted(self.docs.items())
            ]
            return 200, json.dumps({"items": items, "batching": {}})
        d = self.docs.get(url)
        if d is None:
            return 404, "gone"
        return 200, json.dumps(
            {"@id": url, "title": d["title"], "language": "en",
             "review_state": "published"}
        )


@pytest.mark.slow
def test_renormalize_rebuilds_searchui_from_raw(spark, paths):
    site = StubSite()
    run_sync(spark, SyncConfig(site_url=SITE, site_id="eea"), paths, site)

    # wipe searchui, rebuild from raw only — no crawling
    import shutil

    shutil.rmtree(paths.searchui)
    res = run_renormalize(spark, paths)
    assert res["renormalized"] == 4
    rebuilt = {r["id"]: r.asDict() for r in spark.read.parquet(paths.searchui).collect()}
    assert len(rebuilt) == 4
    assert rebuilt[f"{SITE}/d0"]["cluster_name"] == "eea"  # plugins re-ran


@pytest.mark.slow
def test_renormalize_portal_type_filter_and_update_only(spark, paths):
    site = StubSite()
    run_sync(spark, SyncConfig(site_url=SITE, site_id="eea"), paths, site)

    # sync_portal_types mismatch → nothing re-normalized
    res = run_renormalize(spark, paths, portal_types=["News Item"])
    assert res["renormalized"] == 0

    # update-only: drop one id from searchui; renorm must not re-insert it
    searchui = spark.read.parquet(paths.searchui).filter(
        ~F.col("id").endswith("d3")
    )
    from eea_crawler_spark.sinks.indexes import replace_table

    replace_table(searchui, paths.searchui)
    res = run_renormalize(spark, paths, update_only=True)
    assert res["renormalized"] == 3  # d3 stayed deleted
    ids = {r["id"] for r in spark.read.parquet(paths.searchui).collect()}
    assert f"{SITE}/d3" not in ids and len(ids) == 3


# ---- NLP preprocessor registry ------------------------------------------


def test_nlp_registry_dispatch_and_chunks(spark):
    assert {"eea", "sdi"} <= set(S.NLP_PREPROCESSORS)
    words = " ".join(f"w{i}" for i in range(600))
    df = spark.createDataFrame(
        [("a", "eea", words), ("b", "unknown_site", "short text")],
        "id string, site_id string, fulltext string",
    )
    rows = {r["id"]: r for r in S.nlp_preprocess_by_site(df).collect()}
    chunks = [c["text"] for c in rows["a"]["nlp_250"]]
    # 600 words, 250-window, stride 200 → ceil((600-250)/200)+1 = 3 chunks
    assert len(chunks) == 3
    assert chunks[0].split(" ")[0] == "w0" and len(chunks[0].split(" ")) == 250
    # overlap: chunk 2 starts 200 words in (50-word overlap)
    assert chunks[1].split(" ")[0] == "w200"
    assert [c["text"] for c in rows["b"]["nlp_250"]] == ["short text"]  # fallback


# ---- multi-site orchestration + app mutex --------------------------------


@pytest.mark.slow
def test_run_sync_all_multi_site_and_mutex(spark, tmp_path):
    from eea_crawler_spark.pipeline import (
        SyncConfig,
        SyncInProgress,
        app_lock,
        run_sync_all,
    )

    sites = {s: StubSite() for s in ("eea", "energy")}

    def transport(url):
        for sid, stub in sites.items():
            got = stub(url)
            if got[0] != 404 or "@search" in url:
                return got
        return 404, "gone"

    def paths_for(cfg):
        base = tmp_path / cfg.site_id
        return SyncPaths(
            raw=str(base / "raw"),
            searchui=str(base / "searchui"),
            quarantine=str(base / "quarantine"),
            status=str(tmp_path / "status"),
        )

    configs = [
        SyncConfig(site_url=SITE, site_id="eea"),
        SyncConfig(site_url=SITE, site_id="energy"),
    ]
    res = run_sync_all(spark, configs, paths_for, transport, lock_dir=str(tmp_path))
    assert res["eea"]["fetched"] == 4 and res["energy"]["fetched"] == 4
    # per-site state tables isolated; site plugin dispatched per branch
    eea = spark.read.parquet(str(tmp_path / "eea" / "searchui")).collect()
    en = spark.read.parquet(str(tmp_path / "energy" / "searchui")).collect()
    assert {r["cluster_name"] for r in eea} == {"eea"}
    assert {r["cluster_name"] for r in en} == {"energy"}

    # mutex: a held lock rejects a concurrent run, releases cleanly after
    with app_lock(str(tmp_path), "global_search"):
        import pytest as _pytest

        with _pytest.raises(SyncInProgress):
            run_sync_all(spark, configs, paths_for, transport, lock_dir=str(tmp_path))
    res2 = run_sync_all(spark, configs, paths_for, transport, lock_dir=str(tmp_path))
    assert res2["eea"]["fetched"] == 0  # idempotent re-run after release
