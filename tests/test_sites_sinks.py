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
    assert rows["d1"]["topic"] == ["climate"]  # list-typed, like the reference
    assert rows["d2"]["cluster_name"] == "cca"  # site_climate.py:177
    assert rows["d2"]["update_frequency_label"] == "Annually"
    assert rows["d2"]["themes"] == ["climate-change-adaptation"]
    assert rows["d3"]["cluster_name"] == "eea"  # default fallback


def test_dispatch_is_scan_free(spark, monkeypatch):
    """Plan-building the site dispatch must not run a Spark job (the
    round-1 shape collected distinct(site_id) — a full corpus scan +
    shuffle per sync at scale)."""
    import pyspark.sql.dataframe as D

    df = spark.createDataFrame(
        [("d1", "eea"), ("d2", "sdi")], "id string, site_id string"
    )

    def boom(self):  # any collect during plan build = corpus scan
        raise AssertionError("plan-build must not trigger a job")

    monkeypatch.setattr(D.DataFrame, "collect", boom)
    out = S.normalize_by_site(df)
    out2 = S.nlp_preprocess_by_site(df)
    assert "cluster_name" in out.columns and "nlp_250" in out2.columns


def test_full_site_registry():
    # every reference site plugin has a registered twin
    expected = {
        "eea", "eea_en", "sdi", "sdi_fise", "fise", "climate",
        "climate_advisory_board", "eionet", "wise_marine",
        "wise_freshwater", "forest", "biodiversity", "energy", "noise",
        "industry", "ias", "discomap", "copernicus_land",
        "copernicus_insitu", "copernicus_demo_land",
    }
    assert expected <= set(S.FACETS_NORMALIZERS)
    # the reference's own registry keys dispatch too
    # (dags/normalizers/sites/*.py decorators)
    reference_keys = {
        "eea", "eea_en", "sdi", "sdi_fise", "fise_resource", "fise",
        "climate", "cab", "eionet", "wise_marine", "wise_freshwater",
        "bise", "energy", "noise", "industry", "ias", "discomap",
        "land", "insitu", "land_demo",
    }
    assert reference_keys <= set(S.FACETS_NORMALIZERS)
    # "fise" is the forest site in the reference; the SDI-records
    # plugin lives under "fise_resource"
    assert S.FACETS_NORMALIZERS["fise"] is S.site_forest
    assert S.FACETS_NORMALIZERS["fise_resource"] is S.site_fise


def test_eionet_path_topics(spark):
    df = spark.createDataFrame(
        [
            ("https://eionet.example/etcs/etc-bd/report1", ["old"]),
            ("https://eionet.example/etcs/etc-cme/x", ["old"]),
            ("https://eionet.example/other/page", ["kept"]),
        ],
        "id string, topic array<string>",
    )
    rows = {r["id"].split("/")[-1]: r for r in S.site_eionet(df).collect()}
    assert rows["report1"]["topic"] == ["term4"]
    assert rows["x"]["topic"] == ["term11", "term14"]
    assert rows["page"]["topic"] == ["kept"]
    assert all(r["cluster_name"] == "etc" for r in rows.values())


def test_wise_marine_objectprovides_cleanup(spark):
    df = spark.createDataFrame(
        [
            ("u1", "Document", "T1", None, ["Data set"]),
            ("u2", "Document", "T2", None, ["Data set", "Webpage"]),
            ("u3", "country_factsheet", "Portugal", None, ["Webpage"]),
            ("u4", "Document", "T4", None, ["Shipping and Ports Measure"]),
        ],
        "id string, doc_type string, title string, "
        "spatial array<string>, objectProvides array<string>",
    )
    rows = {r["id"]: r for r in S.site_wise_marine(df).collect()}
    assert rows["u1"]["objectProvides"] == ["Webpage"]  # alone → Webpage
    assert rows["u2"]["objectProvides"] == ["Data set"]  # Webpage dropped
    assert rows["u3"]["spatial"] == ["Portugal"]  # factsheet → spatial
    assert rows["u4"]["exclude_from_globalsearch"] == ["True"]
    assert rows["u1"]["themes"] == ["water", "coast_sea"]


def test_wise_freshwater_bp_codes(spark):
    df = spark.createDataFrame(
        [("u1", ["BP12 - Floodplain restoration", "no code"],
          ["ES3 - Water purification"], ["PO1 - Good status"])],
        "id string, biophysical_impacts array<string>, "
        "ecosystem_services array<string>, policy_objectives array<string>",
    )
    row = S.site_wise_freshwater(df).collect()[0]
    assert row["biophysical_impacts"] == ["Floodplain restoration", "no code"]
    assert row["ecosystem_services"] == ["Water purification"]
    assert row["policy_objectives"] == ["Good status"]
    assert row["cluster_name"] == "wise-freshwater"


def test_wise_freshwater_exclusions_and_renames(spark):
    df = spark.createDataFrame(
        [
            ("u1", "country_profile", "Portugal", None, ["Webpage"],
             [{"title": "WFD"}], ["Italy"]),
            ("u2", "Document", "T", ["ES"], ["Measure"], None, None),
            ("u3", "Document", "T", None, ["Data set", "Webpage"], None, None),
        ],
        "id string, doc_type string, title string, spatial array<string>, "
        "objectProvides array<string>, "
        "legislative_reference array<struct<title:string>>, "
        "country array<string>",
    )
    rows = {r["id"]: r for r in S.site_wise_freshwater(df).collect()}
    assert rows["u1"]["spatial"] == ["Portugal"]  # profile → title
    assert rows["u1"]["legislative_reference"] == ["WFD"]
    assert rows["u1"]["wise_country"] == ["Italy"]
    assert "country" not in rows["u1"].asDict()
    assert rows["u2"]["exclude_from_globalsearch"] == ["True"]  # Measure
    assert rows["u1"]["exclude_from_globalsearch"] is None
    assert rows["u3"]["objectProvides"] == ["Data set"]  # Webpage dropped


def test_forest_drops_data_catalogue_and_topic_pages(spark):
    df = spark.createDataFrame(
        [
            ("https://forest.example/resources/data-catalogue/x", ["Webpage"],
             "Page", None, None, None),
            ("https://forest.example/topics/forests", ["Webpage"],
             "Page", None, None, None),
            ("https://forest.example/articles/a", ["Article"],
             "Page", None, None, None),
            ("https://forest.example/countries/regions/european-union/f",
             ["Country fact sheet"], "Page", None, None, None),
            ("https://forest.example/countries/italy/f",
             ["Country fact sheet"], "Page", None, None, None),
            ("https://forest.example/countries/italy/bio",
             ["Webpage"], "country_biodiversity_factsheet", ["old"],
             "Italy", None),
        ],
        "id string, objectProvides array<string>, doc_type string, "
        "spatial array<string>, parent_title string, places array<string>",
    )
    rows = {r["id"].split("/", 3)[-1]: r for r in S.site_forest(df).collect()}
    assert "resources/data-catalogue/x" not in rows  # P12 drop rule
    assert rows["topics/forests"]["objectProvides"] == ["Topic page"]
    assert rows["topics/forests"]["places"] == ["EU27"]  # default filled
    assert rows["articles/a"]["objectProvides"] == ["Article"]
    assert rows["countries/regions/european-union/f"]["objectProvides"] == [
        "Dashboard"
    ]
    assert rows["countries/italy/f"]["objectProvides"] == [
        "Country fact sheet", "Dashboard"
    ]
    assert rows["countries/italy/bio"]["spatial"] == ["Italy"]  # parent title
    assert all(r["themes"] == ["biodiversity"] for r in rows.values())


def test_copernicus_land_decodes(spark):
    df = spark.createDataFrame(
        [
            (
                "u1",
                "TechnicalLibrary",
                [{"title": "scheme#Land » cover"}, {"title": "scheme#Land » use"},
                 {"title": "Sea"}],
                {"size": 123},
                None,
                None,
                "2021-05-05",
                None,
            )
        ],
        "id string, doc_type string, "
        "taxonomy_technical_library_categorization array<struct<title:string>>, "
        "file struct<size:bigint>, version string, publication_date string, "
        "creation_date string, issued string",
    )
    row = S.site_copernicus_land(df).collect()[0]
    assert row["library_categories_values"] == ["Land » cover", "Land » use", "Sea"]
    assert row["library_categories_facet"] == ["Land", "Sea"]  # »-prefix dedup
    assert row["file_size"] == 123
    assert row["version"] == ""
    assert row["issued"] == "2021-05-05"  # creation_date in the chain
    assert row["year"] == "2021-05-05"


def test_eea_en_sandbox_drop_and_topics(spark):
    df = spark.createDataFrame(
        [
            ("https://eea.example/en/sandbox/p", None),
            ("https://eea.example/en/analysis/a",
             [{"title": "Air"}, {"title": "Water"}]),
        ],
        "id string, topics array<struct<title:string>>",
    )
    rows = S.site_eea_en(df).collect()
    assert len(rows) == 1
    assert rows[0]["topic"] == ["Air", "Water"]


def test_ias_and_energy_objectprovides_rules(spark):
    ias = spark.createDataFrame(
        [
            ("https://ias.example/products/european-statistics/one",
             "Map of spread", ["Webpage"]),
            ("https://ias.example/products/european-statistics/two",
             "Spread stats", ["Webpage"]),
            ("https://ias.example/other", "Map of x", ["Webpage"]),
        ],
        "id string, title string, objectProvides array<string>",
    )
    rows = {r["id"].split("/")[-1]: r for r in S.site_ias(ias).collect()}
    assert rows["one"]["objectProvides"] == ["Map (interactive)"]
    assert rows["two"]["objectProvides"] == ["Dashboard"]
    assert rows["other"]["objectProvides"] == ["Webpage"]

    energy = spark.createDataFrame(
        [
            ("https://e.example/topics/solar/intro", "T", ["Webpage"], None),
            ("https://e.example/data/x", "T", ["Webpage"], "Data"),
        ],
        "id string, title string, objectProvides array<string>, resource_type string",
    )
    erows = {r["id"].split("/")[-1]: r for r in S.site_energy(energy).collect()}
    assert erows["intro"]["objectProvides"] == ["Topic page"]
    assert erows["x"]["objectProvides"] == ["Dashboard"]


def test_discomap_url_prefix_decode(spark):
    df = spark.createDataFrame(
        [
            ("https://discomap.eea.europa.eu/climatechange", ["Webpage"]),
            ("https://discomap.eea.europa.eu/climatechange/?page=Map1", ["Webpage"]),
            ("https://discomap.eea.europa.eu/atlas/?page=Health", ["Webpage"]),
        ],
        "id string, objectProvides array<string>",
    )
    rows = {r["id"]: r for r in S.site_discomap(df).collect()}
    assert rows["https://discomap.eea.europa.eu/climatechange"][
        "objectProvides"] == ["Webpage"]
    assert rows["https://discomap.eea.europa.eu/climatechange/?page=Map1"][
        "objectProvides"] == ["Map (interactive)"]
    atlas = rows["https://discomap.eea.europa.eu/atlas/?page=Health"]
    assert atlas["objectProvides"] == ["Map (interactive)"]
    assert atlas["topic"] == ["Environmental health impacts"]


def test_sdi_fise_decode_tables(spark):
    df = spark.createDataFrame(
        [
            ("u1", "ita", None, "2019", "2018", "asNeeded"),
            ("u2", "nope", "2020", None, None, "weird"),
            ("u3", None, None, None, None, None),
        ],
        "id string, language_code string, publication_year string, "
        "creation_year string, revision_year string, update_frequency_key string",
    )
    rows = {r["id"]: r for r in S.site_sdi_fise(df).collect()}
    assert rows["u1"]["language"] == ["Italian"]  # list form (ref :456-463)
    assert rows["u1"]["country"] == ["Italy"]
    assert rows["u1"]["publicationYear"] == 2019  # creation before revision
    assert rows["u1"]["update_frequency_value"] == "As needed"
    assert rows["u2"]["language"] == ["Unknown"]
    assert rows["u2"]["publicationYear"] == 2020
    assert rows["u2"]["update_frequency_value"] == "weird"  # passthrough
    assert rows["u3"]["publicationYear"] == 2500  # sentinel
    assert rows["u1"]["cluster_name"] == "fise_sdi"


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


class _RecordingWriter:
    """DataFrameWriter stand-in: records the exact format/options/mode
    the serving write issues, `save` is a no-op."""

    def __init__(self, calls):
        self.calls = calls

    def format(self, fmt):
        self.calls["format"] = fmt
        return self

    def options(self, **opts):
        self.calls.setdefault("options", {}).update(opts)
        return self

    def mode(self, m):
        self.calls["mode"] = m
        return self

    def save(self, *a, **kw):
        self.calls["saved"] = True


def test_es_write_contract(spark, monkeypatch):
    """S11 serving-leg contract without the connector jar: es_write must
    issue the es-hadoop write with the search_pipeline.conf:12-29
    semantics — keyed by doc id, doc_as_upsert for the default path
    (``action=update + doc_as_upsert`` in logstash), plain index op for
    the non-upsert path (the ``![update_only]`` branch)."""
    df = spark.createDataFrame([("d1", "t")], "id string, title string")

    for upsert in (True, False):
        calls = {}
        monkeypatch.setattr(
            type(df), "write", property(lambda self, c=calls: _RecordingWriter(c))
        )
        SK.es_write(df, "data_searchui", upsert=upsert)
        assert calls["format"] == "org.elasticsearch.spark.sql"
        assert calls["mode"] == "append" and calls["saved"]
        opts = calls["options"]
        assert opts["es.resource"] == "data_searchui"
        assert opts["es.mapping.id"] == "id"  # document_id => %{id}
        assert opts["es.batch.size.entries"] == "500"
        if upsert:  # doc_as_upsert branch
            assert opts["es.write.operation"] == "upsert"
        else:  # plain index branch
            assert "es.write.operation" not in opts


def test_climate_cca_facets(spark):
    df = spark.createDataFrame(
        [
            (
                "https://cca.example/mission/projects/p1",
                "eea.climateadapt.casestudy",
                ["Other"],
                [{"title": "Italy"}, {"title": "Spain"}],
                [{"title": "Agriculture"}, {"title": "Energy"}],
                [{"token": "heat", "title": "Heat waves"}],
                None,
                "2024-02-02",
            ),
            (
                "https://cca.example/help/faq",
                "Document",
                ["France"],
                [],
                [],
                [],
                "2023-01-01",
                "2024-02-02",
            ),
        ],
        "id string, doc_type string, spatial array<string>, "
        "country array<struct<title:string>>, "
        "sectors array<struct<title:string>>, "
        "health_impacts array<struct<token:string,title:string>>, "
        "issued string, publication_date string",
    )
    rows = {r["id"].split("/")[-1]: r for r in S.site_climate(df).collect()}
    p1, faq = rows["p1"], rows["faq"]
    assert p1["cluster_name"] == "cca"
    assert p1["cca_adaptation_sectors"] == ["Agriculture", "Energy"]
    assert p1["cca_health_impacts"] == ["heat"]  # token variant
    assert p1["spatial"] == ["Italy", "Spain"]  # 'Other' dropped + countries
    assert p1["issued"] == "2024-02-02"  # fallback to publication_date
    assert p1["cca_include_in_mission"] and p1["cca_include_in_search"]
    assert faq["spatial"] == ["France"]  # real spatial kept, no countries
    assert faq["issued"] == "2023-01-01"  # explicit issued wins
    assert not faq["cca_include_in_mission"] and not faq["cca_include_in_search"]


def test_sdi_thesaurus_and_expiry_facets(spark):
    import datetime

    df = spark.createDataFrame(
        [
            (
                "s1",
                [{"title": "Climate mitigation"}, {"title": "Water"}],
                ["soil^erosion^water erosion", "climate"],
                [{"title": "Europe"}],
                [{"url": "https://img/1.png"}],
                None,
                "2020-01-01",
                [{"key": "superseded"}],
                None,
            ),
            (
                "s2",
                None,
                None,
                None,
                None,
                "2024-05-05",
                "2019-01-01",
                [{"key": "onGoing"}],
                "2030-01-01",
            ),
        ],
        "id string, th_eea_topics array<struct<title:string>>, "
        "th_gemet_tree_default array<string>, "
        "th_regions array<struct<title:string>>, "
        "overview array<struct<url:string>>, issued string, "
        "createDate string, cl_status array<struct<key:string>>, "
        "expires string",
    )
    rows = {r["id"]: r for r in S.site_sdi(df).collect()}
    s1, s2 = rows["s1"], rows["s2"]
    assert s1["sdi_topics"] == ["climate", "Water"]  # token rewrite
    assert s1["sdi_gemet"] == ["Water Erosion", "Climate"]  # ^-leaf, titled
    assert s1["sdi_spatial"] == ["Europe"]
    assert s1["overview_url"] == ["https://img/1.png"]
    assert s1["issued"] == "2020-01-01"  # createDate fallback
    two_days_ago = (
        datetime.date.today() - datetime.timedelta(days=2)
    ).isoformat()
    assert s1["expires"] == two_days_ago  # obsolete → expired
    assert s2["issued"] == "2024-05-05"  # explicit issued wins
    assert s2["expires"] == "2030-01-01"  # non-obsolete keeps expires


def test_report_fiche_duplicate_join_and_briefing(spark):
    from eea_crawler_spark.operators.dedup import (
        merge_duplicate_pdf_text,
        report_fiche_duplicates,
    )

    df = spark.createDataFrame(
        [
            (
                "r1", "Report", "Climate report about droughts", "base",
                [
                    {"id": "f1", "doc_type": "Fiche",
                     "description": "Climate report about droughts too"},
                    {"id": "f2", "doc_type": "Fiche",
                     "description": "zzzz qqqq xxxx vvvv wwww"},
                    {"id": "d1", "doc_type": "Document",
                     "description": "Climate report about droughts too"},
                ],
            ),
            ("r2", "Report", "Water quality", "base2", []),
            ("d2", "Document", "Whatever", "base3", None),
        ],
        "id string, doc_type string, description string, pdf_text string, "
        "items array<struct<id:string,doc_type:string,description:string>>",
    )
    out = report_fiche_duplicates(df)
    rows = {r["id"]: r for r in out.collect()}
    assert rows["r1"]["has_duplicate"]
    assert rows["r1"]["duplicate_fiche_ids"] == ["f1"]  # f2 < 0.2, d1 not Fiche
    assert not rows["r2"]["has_duplicate"] and not rows["d2"]["has_duplicate"]

    fiches = spark.createDataFrame(
        [("f1", "FICHE TEXT")], "id string, pdf_text string"
    )
    merged = {r["id"]: r for r in merge_duplicate_pdf_text(out, fiches).collect()}
    assert merged["r1"]["pdf_text"] == "base FICHE TEXT"
    assert merged["r2"]["pdf_text"] == "base2"  # untouched

    # consumer: duplicate Reports become Briefings in the eea plugin
    facets = out.withColumn("objectProvides", F.array(F.lit("Report")))
    rows2 = {r["id"]: r for r in S.site_eea(facets).collect()}
    assert rows2["r1"]["objectProvides"] == ["Report", "Briefing"]
    assert rows2["r2"]["objectProvides"] == ["Report"]


def test_eea_term_fields_and_faq_drop(spark):
    df = spark.createDataFrame(
        [
            ("t1", "Term", "en", "a def", "glossary"),
            ("q1", "helpcenter_faq", "en", "how to", None),
            ("q2", "helpcenter_faq", "de", "wie", None),
        ],
        "id string, doc_type string, language string, description string, "
        "source string",
    )
    rows = {r["id"]: r for r in S.site_eea(df).collect()}
    assert "q1" not in rows  # English FAQ dropped (site_eea:34-35)
    assert "q2" in rows  # non-English FAQ kept
    assert rows["t1"]["term_description"] == "a def"
    assert rows["t1"]["term_source"] == "glossary"


def test_sdi_fise_catalogue_behaviors(spark):
    df = spark.createDataFrame(
        [
            (
                "rec-1",
                [{"organisationObject": {"default": "EEA"}, "email": "x@e.eu"}],
                ["dataset"],
                None,
                "2024-01-02",
                ["2020-01-01"],
                [{"title": "Environment"}],
            ),
            ("rec-2", None, ["service"], "2024-02-02", None, None, None),
            ("rec-3", None, ["other"], None, None, None, None),
        ],
        "id string, "
        "contact array<struct<organisationObject:struct<default:string>,email:string>>, "
        "resourceType array<string>, changeDate string, dateStamp string, "
        "creationDateForResource array<string>, cl_topic array<struct<title:string>>",
    )
    rows = {r["id"]: r for r in S.site_sdi_fise(df).collect()}
    r1 = rows["rec-1"]
    assert r1["organisation_name"] == "EEA" and r1["organisation_email"] == "x@e.eu"
    assert r1["about"].endswith("/api/records/rec-1")
    assert r1["objectProvides"] == ["Spatial dataset"]
    assert rows["rec-2"]["objectProvides"] == ["Data services"]
    assert rows["rec-3"]["objectProvides"] == ["SDI"]  # decode fallback
    assert r1["last_modified"] == "2024-01-02"  # dateStamp fallback used
    assert rows["rec-2"]["last_modified"] == "2024-02-02"  # changeDate wins
    assert r1["created"] == "2020-01-01"
    assert r1["topic"] == ["Environment"]


def test_fix_child_links_nested_fallback(spark):
    df = spark.createDataFrame(
        [
            (
                "p1",
                [
                    {
                        "link": [
                            {"name": None,
                             "nameObject": {"default": "Download"},
                             "description": "explicit",
                             "descriptionObject": {"default": "ignored"}},
                            {"name": "Keep",
                             "nameObject": {"default": "X"},
                             "description": None,
                             "descriptionObject": {"default": "From object"}},
                        ]
                    }
                ],
            )
        ],
        "id string, children array<struct<link:array<struct<"
        "name:string,nameObject:struct<default:string>,"
        "description:string,descriptionObject:struct<default:string>>>>>",
    )
    row = df.select(
        S.fix_child_links(F.col("children")).alias("children")
    ).collect()[0]
    links = row["children"][0]["link"]
    assert links[0]["name"] == "Download"  # fallback applied
    assert links[0]["description"] == "explicit"  # explicit kept
    assert links[1]["name"] == "Keep"
    assert links[1]["description"] == "From object"


def test_eea_en_full_behaviors(spark):
    df = spark.createDataFrame(
        [
            ("https://e/en/viz1", "visualization", "GHG Indicator chart",
             ["Dashboard"], "published", None, "2020-01-01",
             [{"title": "Driver"}], None, None),
            ("https://e/en/file1", "File", "Doc", ["File"], "missing",
             None, "2021-02-02", None, None, None),
            ("https://e/en", "Plone Site", "Root", None, None, None, None,
             None, None, None),
        ],
        "id string, doc_type string, title string, "
        "objectProvides array<string>, hasWorkflowState string, "
        "issued string, creation_date string, "
        "taxonomy_dpsir array<struct<title:string>>, "
        "taxonomy_typology array<struct<title:string>>, "
        "taxonomy_un_sdgs array<struct<title:string>>",
    )
    rows = {r["id"]: r for r in S.site_eea_en(df).collect()}
    assert "https://e/en" not in rows  # Plone Site dropped
    viz = rows["https://e/en/viz1"]
    assert viz["objectProvides"] == ["Dashboard", "Indicator"]
    assert viz["dpsir"] == ["Driver"]
    f = rows["https://e/en/file1"]
    assert f["hasWorkflowState"] == "published"  # missing repaired
    assert f["issued"] == "2021-02-02"  # creation-date fallback


def test_fise_resource_record_shaping(spark):
    df = spark.createDataFrame(
        [("r1", "report", ["air"], [{"label": "Italy"}], ["forests"], "2020")],
        "id string, doc_type string, subjects array<string>, "
        "geolocation array<struct<label:string>>, "
        "resource_topics array<string>, publishing_year string",
    )
    row = S.site_fise(df).collect()[0]
    assert row["cluster_name"] == "fise_sdi"
    assert row["objectProvides"] == ["report"]
    assert row["country"] == ["Italy"]
    assert row["keywords"] == ["air"]
    assert row["publicationYear"] == "2020"
    assert row["topic"] == ["forests"]
    assert row["update_frequency_value"] == "As needed"


def test_energy_country_factsheet_spatial(spark):
    df = spark.createDataFrame(
        [("https://e.example/countries/italy", "Italy",
          ["Country fact sheet"], None, None)],
        "id string, title string, objectProvides array<string>, "
        "spatial array<string>, resource_type string",
    )
    row = S.site_energy(df).collect()[0]
    assert row["spatial"] == ["Italy"]


def test_wise_marine_spm_and_indicator_behaviors(spark):
    df = spark.createDataFrame(
        [
            ("m1", "Document", "Measure X",
             ["Shipping and Ports Measure"], None, None, "published",
             "Ports", ["w"], None),
            ("m2", "Document", "Chart title", ["Indicator"], "old desc",
             "2020-01-01", "published", None, None,
             [{"title": "Pressure"}]),
        ],
        "id string, doc_type string, title string, "
        "objectProvides array<string>, description string, "
        "issued string, hasWorkflowState string, sector string, "
        "theme array<string>, dpsir_type array<struct<title:string>>",
    )
    rows = {r["id"]: r for r in S.site_wise_marine(df).collect()}
    spm = rows["m1"]
    assert spm["exclude_from_globalsearch"] == ["True"]
    assert spm["issued"] == "2023-09-04T07:17:00"  # published default
    assert spm["wm_spm_sector"] == "Ports" and spm["wm_spm_title"] == "Measure X"
    assert spm["wm_theme"] == ["w"]
    ind = rows["m2"]
    assert ind["description"] == "Chart title"  # Indicator: title wins
    assert ind["dpsir"] == ["Pressure"]
    assert ind["wm_spm_sector"] is None  # SPM copies gated to SPM docs


def test_site_plugin_memo_replay_identical(spark):
    """Round-14 site-plugin plan memo (r13 verdict #4): a replayed
    dispatch must produce the IDENTICAL logical plan (modulo expression
    ids) and rows as the recorded first build — across EVERY registered
    plugin at once (the full default dispatch exercises each branch's
    recorder, or its unrecordable fallback)."""
    import re as _re

    df = spark.createDataFrame(
        [
            ("d1", "eea", ["Climate change"], None, "t"),
            ("d2", "climate", None, "annually", "t"),
            ("d3", "wise_freshwater", None, None, "t"),
            ("d4", "unknown_site", None, None, "t"),
        ],
        "id string, site_id string, themes array<string>, "
        "update_frequency string, title string",
    )
    spark.__dict__.pop("_eea_site_memo", None)  # fresh memo
    out1 = S.normalize_by_site(df)  # miss: records per-plugin recipes
    out2 = S.normalize_by_site(df)  # hit: replays them

    def canon(d):
        return _re.sub(
            r"#\d+", "#N",
            d._jdf.queryExecution().optimizedPlan().toString(),
        )

    assert canon(out1) == canon(out2)
    r1 = sorted(map(tuple, out1.collect()))
    r2 = sorted(map(tuple, out2.collect()))
    assert r1 == r2 and len(r1) == 4
    # at least the default plugin recorded (the memo is doing work)
    memo = spark.__dict__["_eea_site_memo"]
    assert any(v is not S._UNRECORDABLE for v in memo.values())
