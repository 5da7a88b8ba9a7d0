"""Plone listing as a Python DataSource: scan, partitioning, pushdown.

The pruning proofs are behavioral: the stub transport *raises* when a
forbidden portal type is queried or when the quick-mode date predicate
is missing from the URL — if the pushdown didn't happen, the scan task
fails, so a green test means the remote really was spared the work.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from eea_crawler_spark.sources import plone_datasource as DS

SITE = "https://stub.example"


class TwoTypeSite:
    """Listing stub serving two portal types; optional tripwires."""

    def __init__(self, forbidden_types=(), require_since=False):
        self.forbidden = set(forbidden_types)
        self.require_since = require_since
        self.docs = {
            "Document": [("d1", "2024-01-01"), ("d2", "2024-03-01")],
            "News Item": [("n1", "2024-02-01")],
        }

    def __call__(self, url):
        ptype = url.split("portal_type=")[1].split("&")[0].replace("%20", " ")
        if ptype in self.forbidden:
            raise AssertionError(f"partition for {ptype} was not pruned")
        if self.require_since and "modified.query:date=" not in url:
            raise AssertionError("quick-mode predicate was not pushed")
        since = None
        if "modified.query:date=" in url:
            since = url.split("modified.query:date=")[1].split("&")[0]
        if "b_start=0" not in url:
            return 200, json.dumps({"items": [], "batching": {}})
        items = [
            {"@id": f"{SITE}/{doc}", "@type": ptype, "modified": mod}
            for doc, mod in self.docs.get(ptype, [])
            if since is None or mod >= since
        ]
        return 200, json.dumps({"items": items, "batching": {}})


@pytest.fixture()
def register(spark):
    def _reg(key, transport):
        DS.register_transport(key, transport)
        return DS.plone_listing_df(
            spark, SITE, transport_key=key,
            portal_types=["Document", "News Item"],
        )

    return _reg


def test_full_scan_partitions_per_portal_type(spark, register):
    df = register("ds-full", TwoTypeSite())
    assert df.rdd.getNumPartitions() == 2  # one per portal type
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {f"{SITE}/d1", f"{SITE}/d2", f"{SITE}/n1"}
    assert rows[f"{SITE}/n1"]["doc_type"] == "News Item"


def test_doc_type_filter_prunes_partitions(spark, register):
    # the stub raises if the News Item partition is ever queried
    df = register("ds-prune", TwoTypeSite(forbidden_types={"News Item"}))
    got = df.filter(F.col("doc_type") == "Document").collect()
    assert {r["id"] for r in got} == {f"{SITE}/d1", f"{SITE}/d2"}


def test_modified_pushdown_reaches_remote_query(spark, register):
    # the stub raises if the date predicate is missing from the URL
    df = register("ds-quick", TwoTypeSite(require_since=True))
    got = df.filter(F.col("modified") >= "2024-02-01").collect()
    assert {r["id"] for r in got} == {f"{SITE}/d2", f"{SITE}/n1"}


def test_strict_greater_than_stays_exact(spark, register):
    # remote range=min is >=, Spark must restore strictness for >
    df = register("ds-gt", TwoTypeSite())
    got = df.filter(F.col("modified") > "2024-02-01").collect()
    assert {r["id"] for r in got} == {f"{SITE}/d2"}


class FullStubSite(TwoTypeSite):
    """Adds per-doc JSON fetch so run_sync can use the DataSource scan."""

    def __call__(self, url):
        if "@search" in url:
            return super().__call__(url)
        doc = url.rsplit("/", 1)[-1]
        for ptype, docs in self.docs.items():
            if any(d == doc for d, _ in docs):
                return 200, json.dumps(
                    {"@id": url, "title": doc.upper(), "language": "en",
                     "review_state": "published"}
                )
        return 404, "gone"


@pytest.mark.slow
def test_run_sync_through_datasource_scan(spark, tmp_path):
    from eea_crawler_spark.pipeline import SyncConfig, SyncPaths, run_sync

    paths = SyncPaths(
        raw=str(tmp_path / "raw"),
        searchui=str(tmp_path / "searchui"),
        quarantine=str(tmp_path / "quarantine"),
        status=str(tmp_path / "status"),
    )
    cfg = SyncConfig(
        site_url=SITE,
        site_id="eea",
        portal_types=["Document", "News Item"],
        listing_source="datasource",
    )
    r = run_sync(spark, cfg, paths, FullStubSite())
    assert r["fetched"] == 3 and r["normalized"] == 3
    ids = {row["id"] for row in spark.read.parquet(paths.searchui).collect()}
    assert ids == {f"{SITE}/d1", f"{SITE}/d2", f"{SITE}/n1"}
