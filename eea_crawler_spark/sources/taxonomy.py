"""Taxonomy dimension sources: obligations (RDF) + theme taxonomy (XML).

The reference refreshes two lookup dimensions daily and stores them as
Airflow Variables consumed by the normalize chain (J6/T21):

  - **obligations** (S15, dags/d0_update_obligations.py:14-46): SPARQL
    over the rod.eionet RDF graphs — per obligation URL, the linked
    instrument's label and URL.
  - **theme_taxonomy** (S16, dags/d0_update_themetaxonomy.py:15-59):
    the Plone ``@vocabularies/collective.taxonomy.themes`` JSON merged
    with the coremetadata ``topics.xml`` defaults (defaults win — the
    reference loops them second and overwrites).

Spark shape: each becomes a small dimension DataFrame meant to be
**broadcast** into lookup joins (Q25's shape) — at 100 TB of facts the
dimension stays a few hundred rows, so the join never shuffles the
fact table. Parsing is driver-side (the payloads are KBs) against the
same Transport seam as every other source; rdflib-based graph parsing
is gated behind an import-try with the standard
``application/sparql-results+json`` format as the dependency-free
path.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eea_crawler_spark.sources.acquire import Transport

OBLIGATIONS_SCHEMA = "obligation string, label string, instrument string"
THEMES_SCHEMA = "token string, label string"


# ---- S15: obligations ----------------------------------------------------

# the reference's query, reused verbatim against rdflib when available
# (d0_update_obligations.py:20-31)
OBLIGATIONS_SPARQL = """
SELECT ?obl ?instr ?instr_label ?instr_identifier
WHERE {
    ?obl a <http://rod.eionet.europa.eu/schema.rdf#Obligation> .
    ?instr a <http://rod.eionet.europa.eu/schema.rdf#Instrument> .
    ?obl <http://rod.eionet.europa.eu/schema.rdf#instrument> ?obl_instr .
    OPTIONAL {?instr <http://www.w3.org/2000/01/rdf-schema#label> ?instr_label} .
    OPTIONAL {?instr <http://purl.org/dc/terms/identifier> ?instr_identifier} .
    FILTER (?instr = ?obl_instr)
}
"""


def parse_sparql_results_json(body: str) -> list[dict]:
    """``application/sparql-results+json`` → [{obligation, label,
    instrument}] — the endpoint-format twin of the reference's rdflib
    result loop (d0_update_obligations.py:33-38)."""
    data = json.loads(body)
    out = []
    for b in data.get("results", {}).get("bindings", []):
        out.append(
            {
                "obligation": b["obl"]["value"],
                "label": b.get("instr_label", {}).get("value"),
                "instrument": b["instr"]["value"],
            }
        )
    return out


def parse_obligations_rdf(rdf_bodies: list[str]) -> list[dict]:
    """rdflib path (exact reference parity): parse the RDF documents
    and run the reference SPARQL. Raises ImportError when rdflib is
    absent — callers fall back to a SPARQL-JSON endpoint."""
    import rdflib  # gated: not in the base image

    g = rdflib.Graph()
    for body in rdf_bodies:
        g.parse(data=body, format="xml")
    out = []
    for obl, instr, label, _ident in g.query(OBLIGATIONS_SPARQL):
        out.append(
            {
                "obligation": obl.toPython(),
                "label": label.toPython() if label is not None else None,
                "instrument": instr.toPython(),
            }
        )
    return out


def obligations_df(
    spark: SparkSession, transport: Transport, sparql_json_url: str
) -> DataFrame:
    status, body = transport(sparql_json_url)
    rows = parse_sparql_results_json(body) if status == 200 else []
    return spark.createDataFrame(rows, OBLIGATIONS_SCHEMA) if rows else (
        spark.createDataFrame([], OBLIGATIONS_SCHEMA)
    )


# ---- S16: theme taxonomy -------------------------------------------------


def parse_topics_xml(text: str) -> list[dict]:
    """coremetadata topics.xml → [{token, title}]
    (get_default_themes, d0_update_themetaxonomy.py:15-34). Namespace-
    agnostic: IMS VDEX files carry a default namespace the reference
    handled via lxml nsmap."""
    root = ET.fromstring(text)

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    out = []
    for term in root.iter():
        if local(term.tag) != "term":
            continue
        token = title = None
        for child in term:
            if local(child.tag) == "termIdentifier":
                token = child.text
            elif local(child.tag) == "caption":
                for ls in child:
                    if (
                        local(ls.tag) == "langstring"
                        and ls.get("language") == "en"
                    ):
                        title = ls.text
        if token is not None:
            out.append({"token": token, "title": title})
    return out


def parse_vocabulary_json(body: str) -> dict[str, str]:
    """Plone ``@vocabularies`` page → {token: title}
    (d0_update_themetaxonomy.py:38-46)."""
    data = json.loads(body)
    return {it["token"]: it["title"] for it in data.get("items", [])}


def theme_taxonomy_df(
    spark: SparkSession,
    transport: Transport,
    vocab_url: str,
    topics_url: str,
) -> DataFrame:
    """Merged theme dimension; topics.xml defaults overwrite vocabulary
    entries (reference merge order, d0_update_themetaxonomy.py:44-50)."""
    themes: dict[str, str] = {}
    status, body = transport(vocab_url)
    if status == 200:
        themes.update(parse_vocabulary_json(body))
    status, body = transport(topics_url)
    if status == 200:
        for t in parse_topics_xml(body):
            themes[t["token"]] = t["title"]
    rows = [{"token": k, "label": v} for k, v in sorted(themes.items())]
    return spark.createDataFrame(rows, THEMES_SCHEMA) if rows else (
        spark.createDataFrame([], THEMES_SCHEMA)
    )


# ---- J6: the lookup join -------------------------------------------------


def label_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    dim_key: str = "token",
    dim_label: str = "label",
    out_col: str | None = None,
) -> DataFrame:
    """Broadcast lookup join (J6, Q25 shape): resolve ``key_col``
    through the dimension, keeping the key when unmapped (the
    reference's ``.get(token, token)`` fallback). The explicit
    ``broadcast`` pins the strategy regardless of statistics — at scale
    the fact side never moves."""
    out = out_col or f"{key_col}_label"
    dim2 = F.broadcast(
        dim.select(
            F.col(dim_key).alias("__k"), F.col(dim_label).alias("__v")
        )
    )
    return (
        facts.join(dim2, facts[key_col] == dim2["__k"], "left")
        .withColumn(out, F.coalesce(F.col("__v"), F.col(key_col)))
        .drop("__k", "__v")
    )
