"""Golden-doc tests for the common_normalizer chain (SURVEY §2.5).

Three fixture envelope docs (FIXTURES.md §2.1/§2.7 shapes) run through
the full chain; assertions are hand-computed expected values per
transform. Plus table-driven unit tests for the builders not exercised
by the chain fixtures (path rules, attr→ct, URL rewriting).
"""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from eea_crawler_spark.functions import normalize as N
from eea_crawler_spark.operators.normalize_chain import (
    DEFAULT_CONFIG,
    RAW_ENVELOPE_SCHEMA,
    common_normalizer,
)


def _env(id_, doc_type, raw, **kw):
    base = dict(
        id=id_,
        doc_type=doc_type,
        raw_value=json.dumps(raw),
        web_html=None,
        status_code=200,
        pdf_text=None,
        original_id=id_,
        site_id="eea",
        errors=[],
        modified="2024-01-01T00:00:00Z",
        site="https://site",
        indexed_at=datetime.datetime(2024, 1, 2, tzinfo=datetime.timezone.utc),
    )
    base.update(kw)
    return base


DOC_ARTICLE = _env(
    "https://site/a1",
    "Article",
    {
        "title": "  Air quality in Europe  ",
        "description": "Overview of air quality.",
        "language": None,
        "language_token": "de",
        "review_state": "published",
        "themes": ["climate"],
        "taxonomy_themes": [{"token": "water", "title": "Water"}],
        "subjects": ["air", "internal", "air"],
        "publishers": ["EEA (European Environment Agency)", "Other Org"],
        "object_provides": ["IDashboard", "INoise"],
        "format": ["text/html"],
        "geo_coverage": {"geolocation": [{"label": "Europe"}]},
        "temporal_coverage": {"temporal": [{"label": "2020-2021"}]},
        "location": '{"features":[{"properties":{"title":"Berlin"}}]}',
    },
    web_html="<html><title>T</title><body><p>Air quality report body.</p></body></html>",
)

DOC_FILE = _env(
    "https://site/f1",
    "File",
    {
        "title": "Data file",
        "description": "",
        "language": "en",
        "review_state": "visible",
        "parent": {"@type": "Report", "title": "Parent", "review_state": "published",
                   "description": "x"},
    },
    pdf_text="PDF body text here",
)

DOC_ARCHIVED = _env(
    "https://site/r1",
    "Assessment",
    {
        "title": "Old assessment",
        "language": "fr",
        "review_state": "archived",
        "expires": None,
    },
)


@pytest.fixture(scope="module")
def normalized(spark):
    df = spark.createDataFrame(
        [DOC_ARTICLE, DOC_FILE, DOC_ARCHIVED], schema=RAW_ENVELOPE_SCHEMA
    )
    rows = common_normalizer(df, DEFAULT_CONFIG).collect()
    return {r["id"]: r.asDict() for r in rows}


def test_chain_is_shuffle_free(spark):
    df = spark.createDataFrame([DOC_ARTICLE], schema=RAW_ENVELOPE_SCHEMA)
    plan = common_normalizer(df, DEFAULT_CONFIG)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_article_golden(normalized):
    d = normalized["https://site/a1"]
    # T10 trim + T5 one-to-many rename
    assert d["title"] == "Air quality in Europe"
    assert d["label"] == "Air quality in Europe"
    assert d["about"] == "https://site/a1"
    # T2 black map + T7 dedup
    assert d["subjects"] == ["air"]
    # T21 themes ∪ taxonomy tokens → label map
    assert d["themes"] == ["Climate change", "Water and marine"]
    # T17 ensure-array + whitelisted interface append
    assert d["objectProvides"] == ["Article", "IDashboard"]
    # T18 language token fallback
    assert d["language"] == "de"
    # T16 / T15 / T11
    assert d["spatial"] == ["Europe"]
    assert d["places"] == ["Europe"]
    assert d["time_coverage"] == ["2020-2021"]
    assert d["locations"] == ["Berlin"]
    # T23 publisher canonicalization (applied via normObj too)
    assert d["publishers"] == ["European Environment Agency", "Other Org"]
    # T13/T14: html tag-strip wins over joined fields; off-language → -1
    assert d["fulltext"] == "TAir quality report body."
    assert d["readingTime"] == -1.0
    # A1 counts
    assert d["items_count_themes"] == 2
    assert d["items_count_subjects"] == 1
    assert d["items_count_format"] == 1
    assert d["items_count_spatial"] == 1


def test_file_golden(normalized):
    d = normalized["https://site/f1"]
    # T19 File+visible inherits parent state
    assert d["review_state"] == "published"
    # T20 pdf format appended to missing format array
    assert d["format"] == ["application/pdf"]
    # T9: description default-filled to "" then nulled as empty
    assert d["description"] is None
    # T12/T14: joined fields + pdf text; en → words/228
    assert d["fulltext"] == "Data file. PDF body text here"
    assert d["readingTime"] == round(6 / 228, 4)


def test_archived_golden(normalized):
    d = normalized["https://site/r1"]
    # T4 normObj on doc_type, propagated into the objectProvides rename
    assert d["objectProvides"] == ["Indicator"]
    # T19 archived without expiry → today - 2 days
    expect = (datetime.date.today() - datetime.timedelta(days=2)).isoformat()
    assert d["expires"] == expect
    assert d["readingTime"] == -1.0


# ---- builder unit tests -------------------------------------------------


def test_ct_by_path_rules(spark):
    rules = [("/data/*", ["Data"]), ("/data/specific", ["Special"]), ("*", ["Page"])]
    df = spark.createDataFrame(
        [("/data/specific",), ("/data/other",), ("/misc",)], ["path"]
    ).select(N.ct_by_path_rules(F.col("path"), rules, ["Fallback"]).alias("ct"))
    assert [r["ct"] for r in df.collect()] == [["Special"], ["Data"], ["Page"]]


def test_ct_by_attr(spark):
    df = spark.createDataFrame([(["Report"], ["GIS Map"]), (["Report"], ["other"])],
                               ["ct", "attrs"])
    out = df.select(
        N.ct_by_attr(F.col("ct"), F.col("attrs"), {"gis map": "Map"}).alias("ct")
    ).collect()
    assert out[0]["ct"] == ["Report", "Map"]
    assert out[1]["ct"] == ["Report"]


def test_url_rewriting(spark):
    df = spark.createDataFrame([("https://site/a/b?q=1#f/",)], ["url"])
    row = df.select(
        N.canon_url(F.col("url")).alias("canon"),
        N.to_api_url(F.col("url"), "https://site", "api").alias("api"),
    ).collect()[0]
    assert row["canon"] == "https://site/a/b"
    assert row["api"] == "https://site/api/a/b?q=1#f/"
    df2 = spark.createDataFrame([("https://site/api/a/b",)], ["url"])
    row2 = df2.select(
        N.strip_api_url(F.col("url"), "https://site", "api").alias("u")
    ).collect()[0]
    assert row2["u"] == "https://site/a/b"


def test_first_n_words_and_sentence_dot(spark):
    from eea_crawler_spark.functions.text import first_n_words

    df = spark.createDataFrame([("a b c d e",)], ["t"])
    assert df.select(first_n_words(F.col("t"), 3).alias("x")).collect()[0]["x"] == "a b c"
    assert (
        df.select(N.sentence_dot(F.col("t")).alias("x")).collect()[0]["x"] == "a b c d e."
    )


def test_join_text_fields_dynamic_discovery(spark):
    """T12's dynamic-key leg (join_text_fields, normalizers.py:162-207):
    title first, ordered props, auto-discovered text/plain + text/html
    dict fields, blacklist, redundancy suppression, dot normalization."""
    import json

    from eea_crawler_spark.functions.text import join_text_fields_py

    raw = json.dumps(
        {
            "title": "My Doc",
            "summary": {"data": "<p>A <b>summary</b></p>"},
            "body": {"content-type": "text/html", "data": "<div>Body text</div>"},
            "notes": {"content-type": "text/plain", "data": "Plain notes"},
            "secret": {"content-type": "text/plain", "data": "hidden"},
            "dup": {"content-type": "text/plain", "data": "Plain notes"},
            "meta": {"content-type": "application/json", "data": "{}"},
        }
    )
    text = join_text_fields_py(raw, ["summary"], ["secret"])
    assert text.startswith("\n\nMy Doc.\n\n")  # title first + dot
    assert "A summary." in text  # explicit prop, html stripped, dot added
    assert "Body text." in text and "Plain notes." in text  # discovered
    assert "hidden" not in text  # blacklisted key
    assert text.count("Plain notes") == 1  # redundant fragment suppressed
    assert "{}" not in text  # non-text mime ignored

    # column form through the chain: same content, ws-normalized
    from eea_crawler_spark.operators.normalize_chain import (
        NormalizerConfig,
        common_normalizer,
    )

    df = spark.createDataFrame(
        [("u1", "Document", "eea", "s", 200, [], "2024-01-01", "2024-01-02",
          None, None, raw)],
        "id string, doc_type string, site_id string, site string, "
        "status_code int, errors array<string>, modified string, "
        "indexed_at string, pdf_text string, web_html string, raw_value string",
    )
    cfg = NormalizerConfig(
        txt_props=["summary"], txt_props_black=["secret"],
        proplist=["id", "title", "fulltext", "readingTime"],
    )
    row = common_normalizer(df, cfg).collect()[0]
    assert row["fulltext"] == (
        "My Doc. A summary. Body text. Plain notes."
    )


def test_data_provenance_recursive_walk(spark):
    """A8 (get_data_provenance, normalizers.py:424-471): nested
    data_provenance nodes at any depth, dedup by full triple,
    chartSources fallback, distinct organisations."""
    import json

    from eea_crawler_spark.functions.normalize import data_provenance_py

    raw = json.dumps(
        {
            "blocks": {
                "b1": {
                    "data_provenance": {
                        "data": [
                            {"link": "l1", "organisation": "EEA", "title": "T1"},
                            {"link": "l1", "organisation": "EEA", "title": "T1"},
                        ]
                    }
                },
                "b2": {
                    "deep": [
                        {
                            "data_provenance": {
                                "data": [
                                    {"link": "l2", "organisation": "Eurostat",
                                     "title": "T2"}
                                ]
                            }
                        }
                    ]
                },
            }
        }
    )
    got = data_provenance_py(raw)
    assert got["data_provenances"] == [
        {"link": "l1", "organisation": "EEA", "title": "T1"},
        {"link": "l2", "organisation": "Eurostat", "title": "T2"},
    ]
    assert got["data_provenances_organisations"] == ["EEA", "Eurostat"]

    # fallback: no data_provenance → chartSources
    raw2 = json.dumps(
        {"viz": {"chartSources": [
            {"chart_source": "EEA", "chart_source_link": "cs1"},
            {"chart_source": "EEA", "chart_source_link": "cs1"},
            {"chart_source": "ETC"},
        ]}}
    )
    got2 = data_provenance_py(raw2)
    assert got2["data_provenances"] == [
        {"link": "cs1", "organisation": "EEA", "title": "EEA"},
        {"link": "no_link", "organisation": "ETC", "title": "ETC"},
    ]

    # through the chain (opt-in flag)
    from eea_crawler_spark.operators.normalize_chain import (
        NormalizerConfig,
        common_normalizer,
    )

    df = spark.createDataFrame(
        [("u1", "Document", "eea", "s", 200, [], "2024-01-01", "2024-01-02",
          None, None, raw)],
        "id string, doc_type string, site_id string, site string, "
        "status_code int, errors array<string>, modified string, "
        "indexed_at string, pdf_text string, web_html string, raw_value string",
    )
    cfg = NormalizerConfig(
        collect_provenance=True,
        proplist=["id", "data_provenances", "data_provenances_organisations"],
    )
    row = common_normalizer(df, cfg).collect()[0]
    assert [p["organisation"] for p in row["data_provenances"]] == [
        "EEA", "Eurostat"
    ]
    assert row["data_provenances_organisations"] == ["EEA", "Eurostat"]


def test_chain_memo_replay_identical(spark):
    """Round-13 plan-build memo: a replayed build must produce the
    IDENTICAL logical plan (modulo expression ids) and results as a
    fresh build, and a config change must key a fresh recipe (no stale
    replay)."""
    import re as _re

    from eea_crawler_spark.operators.normalize_chain import (
        NormalizerConfig,
        common_normalizer,
    )

    rows = [
        ("u1", "Document", "eea", "s", 200, [], "2024-01-01",
         "2024-01-02", None, None,
         '{"title": "T one", "description": "D", "language": "en"}'),
        ("u2", "Article", "eea", "s", 200, [], "2024-01-01",
         "2024-01-02", None, None,
         '{"title": "T two", "description": "E", "language": "de"}'),
    ]
    ddl = (
        "id string, doc_type string, site_id string, site string, "
        "status_code int, errors array<string>, modified string, "
        "indexed_at string, pdf_text string, web_html string, "
        "raw_value string"
    )
    cfg = NormalizerConfig(
        norm_obj={"T one": "T-1"},
        norm_prop={"title": ["title", "label"]},
        proplist=["id", "title", "label", "fulltext", "readingTime"],
    )
    df = spark.createDataFrame(rows, ddl)
    out1 = common_normalizer(df, cfg)          # miss: records the recipe
    out2 = common_normalizer(df, cfg)          # hit: replays it

    def canon_plan(d):
        return _re.sub(
            r"#\d+", "#N", d._jdf.queryExecution().optimizedPlan().toString()
        )

    assert canon_plan(out1) == canon_plan(out2)
    assert sorted(map(tuple, out1.collect())) == sorted(
        map(tuple, out2.collect())
    )

    # a mutated config must NOT replay the stale recipe
    cfg.norm_obj = {"T one": "CHANGED"}
    out3 = common_normalizer(df, cfg)
    vals = {r["title"] for r in out3.collect()}
    assert "CHANGED" in vals and "T-1" not in vals
