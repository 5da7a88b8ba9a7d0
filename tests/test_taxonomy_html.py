"""Taxonomy dimension sources (S15/S16) + HTML extraction stage (T14).

Fixture payloads mirror the reference's live endpoints: a SPARQL
results-JSON document for obligations, a Plone @vocabularies page and
an IMS-VDEX topics.xml for themes. The HTML tests exercise the stdlib
fallback pipeline (trafilatura/lxml absent in this container): main
selector narrowing, selector miss → empty, chrome removal, leaf-text
order, title extraction, and the mapInPandas stage shape.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from eea_crawler_spark.functions import html as H
from eea_crawler_spark.sources import taxonomy as TX

SPARQL_JSON = json.dumps(
    {
        "results": {
            "bindings": [
                {
                    "obl": {"value": "http://rod.example/obligations/104"},
                    "instr": {"value": "http://rod.example/instruments/1"},
                    "instr_label": {"value": "Birds Directive"},
                },
                {
                    "obl": {"value": "http://rod.example/obligations/8"},
                    "instr": {"value": "http://rod.example/instruments/2"},
                },
            ]
        }
    }
)

VOCAB_JSON = json.dumps(
    {
        "items": [
            {"token": "term1", "title": "Air pollution"},
            {"token": "term2", "title": "Old water title"},
        ]
    }
)

TOPICS_XML = """<?xml version="1.0"?>
<vdex xmlns="http://www.imsglobal.org/xsd/imsvdex_v1p0">
  <term>
    <termIdentifier>term2</termIdentifier>
    <caption>
      <langstring language="de">Wasser</langstring>
      <langstring language="en">Water</langstring>
    </caption>
  </term>
  <term>
    <termIdentifier>term3</termIdentifier>
    <caption><langstring language="en">Soil</langstring></caption>
  </term>
</vdex>
"""


def _transport(bodies):
    def t(url):
        for key, body in bodies.items():
            if key in url:
                return 200, body
        return 404, ""

    return t


def test_obligations_dimension(spark):
    t = _transport({"sparql": SPARQL_JSON})
    dim = TX.obligations_df(spark, t, "https://rod.example/sparql?q=...")
    rows = {r["obligation"]: r for r in dim.collect()}
    assert rows["http://rod.example/obligations/104"]["label"] == "Birds Directive"
    assert rows["http://rod.example/obligations/8"]["label"] is None
    assert rows["http://rod.example/obligations/8"]["instrument"].endswith("/2")


def test_theme_taxonomy_merge_defaults_win(spark):
    t = _transport({"vocabularies": VOCAB_JSON, "topics.xml": TOPICS_XML})
    dim = TX.theme_taxonomy_df(
        spark, t, "https://eea.example/api/@vocabularies/themes?b_size=1000",
        "https://raw.example/topics.xml",
    )
    labels = {r["token"]: r["label"] for r in dim.collect()}
    # vocab kept, topics.xml overwrites term2, adds term3
    assert labels == {"term1": "Air pollution", "term2": "Water", "term3": "Soil"}


def test_label_lookup_broadcasts_and_falls_back(spark):
    dim = spark.createDataFrame(
        [("term1", "Air pollution"), ("term2", "Water")], TX.THEMES_SCHEMA
    )
    facts = spark.createDataFrame(
        [("d1", "term1"), ("d2", "term9")], "id string, topic string"
    )
    out = TX.label_lookup(facts, dim, "topic")
    rows = {r["id"]: r["topic_label"] for r in out.collect()}
    assert rows == {"d1": "Air pollution", "d2": "term9"}  # unmapped keeps key
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the dimension never shuffles facts


HTML_DOC = """<html><head><title>  My   Page </title>
<script>var x = "ignore me";</script></head>
<body><nav class="chrome">Menu Home About</nav>
<main id="content"><h1>Heading</h1><p>First <b>bold</b> paragraph.</p>
<div class="ads">Buy now</div><p>Second paragraph.</p></main>
<footer>Contact</footer></body></html>"""


def test_extract_leaf_text_order_and_removal():
    text = H.extract_text(
        HTML_DOC,
        {"main_by_css_selector": "#content", "remove_by_selector": [".ads"]},
    )
    assert text == "Heading First bold paragraph. Second paragraph."


def test_extract_selector_miss_is_empty_and_title():
    assert H.extract_text(HTML_DOC, {"main_by_css_selector": "#nope"}) == ""
    assert H.extract_title(HTML_DOC) == "My Page"
    assert H.extract_title("<p>no title</p>", fallback="FB") == "FB"
    # script/style content never leaks into full-document text
    assert "ignore me" not in H.extract_text(HTML_DOC)


def test_extract_html_stage(spark):
    df = spark.createDataFrame(
        [("a", HTML_DOC), ("b", None)], "id string, web_html string"
    )
    out = H.extract_html_columns(
        df, {"main_by_css_selector": "main", "fallback_title": "FB"}
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows["a"]["extracted_text"].startswith("Heading First")
    assert rows["a"]["html_title"] == "My Page"
    assert rows["b"]["extracted_text"] == "" and rows["b"]["html_title"] == "FB"
    assert out.columns == ["id", "web_html", "extracted_text", "html_title"]
