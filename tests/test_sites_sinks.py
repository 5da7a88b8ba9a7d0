"""Site plugin dispatch + SDI aggregations + sink lifecycle tests."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from eea_crawler_spark.operators import sites as S
from eea_crawler_spark.sinks import indexes as SK


def _ts(h):
    return datetime.datetime(2024, 1, 1, h)


def test_years_from_ranges(spark):
    df = spark.createDataFrame(
        [
            (
                [
                    {"start": "2019-05-01", "end": "2021-02-01"},
                    {"start": "2021-01-01", "end": None},  # open end
                ],
            )
        ],
        "temporal_ranges array<struct<start:string,end:string>>",
    )
    out = df.select(S.years_from_ranges("temporal_ranges").alias("y")).collect()
    assert out[0]["y"] == [2019, 2020, 2021]


def test_merged_year_ranges(spark):
    df = spark.createDataFrame(
        [("a", [1999, 2000, 2001, 2005, 2007, 2008])],
        "id string, years array<int>",
    )
    rows = sorted(
        (r["range_start"], r["range_end"])
        for r in S.merged_year_ranges(df).collect()
    )
    assert rows == [(1999, 2001), (2005, 2005), (2007, 2008)]


def test_sdi_child_rollups(spark):
    df = spark.createDataFrame(
        [
            (
                "s1",
                "sdi",
                "2020-01-01",
                [
                    {"changeDate": "2021-06-01", "format": ["tiff"]},
                    {"changeDate": "2019-01-01", "format": ["csv", "tiff"]},
                ],
            )
        ],
        "id string, site_id string, modified string, "
        "children array<struct<changeDate:string,format:array<string>>>",
    )
    row = S.site_sdi(df).collect()[0]
    assert row["modified"] == "2021-06-01"  # A3 max over children+self
    assert sorted(row["format"]) == ["csv", "tiff"]  # A6 roll-up
    assert row["cluster_name"] == "sdi"


def test_dispatch_unions_per_site_plans(spark):
    df = spark.createDataFrame(
        [
            ("d1", "eea", ["Climate change"], None),
            ("d2", "climate", None, "annually"),
            ("d3", "unknown_site", None, None),
        ],
        "id string, site_id string, themes array<string>, update_frequency string",
    )
    rows = {r["id"]: r for r in S.normalize_by_site(df).collect()}
    assert rows["d1"]["cluster_name"] == "eea"
    assert rows["d1"]["topic"] == "climate"
    assert rows["d2"]["cluster_name"] == "climate"
    assert rows["d2"]["update_frequency_label"] == "Annually"
    assert rows["d3"]["cluster_name"] == "eea"  # default fallback


def test_index_lifecycle(spark, tmp_path):
    table = str(tmp_path / "searchui")
    schema = "id string, payload string, indexed_at timestamp"

    SK.upsert_index(
        spark, table, spark.createDataFrame([("a", "v1", _ts(1)), ("b", "v1", _ts(1))], schema)
    )
    SK.upsert_index(spark, table, spark.createDataFrame([("a", "v2", _ts(2))], schema))
    got = {r["id"]: r["payload"] for r in spark.read.parquet(table).collect()}
    assert got == {"a": "v2", "b": "v1"}

    SK.delete_from_index(spark, table, spark.createDataFrame([("b",)], ["id"]))
    got = {r["id"]: r["payload"] for r in spark.read.parquet(table).collect()}
    assert got == {"a": "v2"}


def test_backup_retention(spark, tmp_path):
    table = str(tmp_path / "t")
    backups = str(tmp_path / "backups")
    spark.createDataFrame([(1,)], ["x"]).write.parquet(table)
    made = [SK.backup_index(table, backups, keep=3) for _ in range(5)]
    kept = sorted(os.listdir(backups))
    assert len(kept) == 3
    assert os.path.basename(made[-1]) in kept  # newest survives


def test_status_events_append(spark, tmp_path):
    path = str(tmp_path / "status")
    SK.status_event(spark, path, "crawl_site", "started")
    SK.status_event(spark, path, "crawl_site", "finished", docs_cnt=42)
    rows = spark.read.parquet(path).orderBy("start_time_ts").collect()
    assert [r["status"] for r in rows] == ["started", "finished"]
    assert rows[1]["docs_cnt"] == 42


def test_es_options_shape():
    opts = SK.es_write_options("data_searchui")
    assert opts["es.mapping.id"] == "id"
    assert opts["es.write.operation"] == "upsert"
