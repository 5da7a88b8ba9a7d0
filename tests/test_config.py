"""Production-config construction + reference-mode chain semantics.

Pins the ported config tables (config/*.json, the reference's
``default_normalizers`` / ``sdi_normalizers`` Airflow Variables,
dags/variables.json:1666-1972 and 5606-5671) through
``NormalizerConfig.from_tables`` and the chain behaviors only those
configs exercise: typed normMissing fills, missing-column creation,
the early-snapshot proplist projection (get_attrs_to_delete,
normalizers.py:530-533), and index-time ES null_value substitution.
"""

from __future__ import annotations

import datetime
import json

from eea_crawler_spark.config import (
    load_table,
    production_config,
    sdi_config,
    theme_labels,
)
from eea_crawler_spark.operators.normalize_chain import (
    RAW_ENVELOPE_SCHEMA,
    NormalizerConfig,
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


def test_production_and_sdi_configs_construct():
    for cfg in (production_config(), sdi_config()):
        assert isinstance(cfg, NormalizerConfig)
        assert cfg.reference_mode
        # normProp string values coerced to single-element lists
        assert all(isinstance(v, list) for v in cfg.norm_prop.values())
        assert cfg.norm_prop["@type"] == ["objectProvides"]
        # one-to-many entries survive as-is
        assert cfg.norm_prop["about"] == ["id", "about"]
        assert "//" not in cfg.norm_missing  # comment key never leaks
        assert cfg.null_values["language"] == "en"
        assert len(cfg.proplist) == 31
    prod = production_config()
    assert len(prod.norm_obj) == 201
    assert prod.theme_labels == theme_labels()
    # typed normMissing values pass through untouched
    typed = [v for v in prod.norm_missing.values() if not isinstance(v, str)]
    assert typed  # 0 / -1 / [] style entries exist in production config


def test_load_table_returns_isolated_copies():
    a = load_table("default_normalizers")
    a["normProp"]["@type"] = "CORRUPTED"
    b = load_table("default_normalizers")
    assert b["normProp"]["@type"] == "objectProvides"


def test_reference_mode_chain(spark):
    """One doc through the FULL production config: chain-added fields
    survive projection, missing normMissing keys are created, null
    array elements get the ES null_value default."""
    cfg = production_config()
    doc = _env(
        "https://site/d1",
        "Article",
        {
            "title": "Soil health",
            "description": "About soil.",
            "language": "en",
            "review_state": "published",
            # themes → topic rename; the null element survives to the
            # ES-null_value stage, which substitutes it
            "themes": ["soil", None],
        },
    )
    df = spark.createDataFrame([doc], RAW_ENVELOPE_SCHEMA)
    out = common_normalizer(df, cfg)
    row = out.collect()[0]
    cols = set(out.columns)

    # (a) early-snapshot projection: chain-added fields survive even
    # when absent from proplist (fulltext/readingTime/topic are not in
    # the production proplist — reference normalizers.py:530-533)
    assert "readingTime" in cols
    assert "fulltext" in cols
    assert row["fulltext"] == "Soil health. About soil."
    # pre-existing non-proplist envelope columns are dropped
    assert "raw_value" not in cols
    assert "status_code" not in cols
    # proplist columns that exist are kept
    assert row["id"] == "https://site/d1"

    # (b) norm_missing creates absent keys, typed values included
    # (creator literal; fleschReadingEaseScore typed 0; format's scalar
    # default wraps into the list-typed column)
    assert row["creator"] == "European Environment Agency (EEA)"
    assert row["fleschReadingEaseScore"] == 0
    assert row["format"] == ["text/html"]
    # missing-or-null treated identically (.get(key) is None): places
    # was null (no spatial) → filled with its default
    assert row["places"] == "unknown"

    # (c) ES null_value: null element substituted, present values kept
    # ("soil" → "Soil" via the production normObj value map on the way)
    assert row["topic"] == ["Soil", "Various other issues"]


def test_null_values_semantics(spark):
    """null elements in arrays → default; whole-null columns (≡ fields
    remove_empty stripped) stay null — ES never sees them."""
    cfg = NormalizerConfig(
        proplist=["id", "themes", "description"],
        null_values={"themes": "Various other issues", "description": "x"},
    )
    doc = _env(
        "https://site/d2",
        "Article",
        {"title": "T", "themes": ["climate", None], "description": None},
    )
    df = spark.createDataFrame([doc], RAW_ENVELOPE_SCHEMA)
    row = common_normalizer(df, cfg).collect()[0]
    assert row["themes"] == ["climate", "Various other issues"]
    assert row["description"] is None


def test_site_sync_configs_build():
    """Every registered production site builds a runnable SyncConfig
    with the reference's per-site settings mapped through."""
    from eea_crawler_spark.config import all_site_sync_configs, site_table

    cfgs = all_site_sync_configs()
    assert len(cfgs) == len(site_table()) == 15
    eea = cfgs["eea"]
    assert eea.site_url.endswith("eea.europa.eu")
    assert eea.api_part == "api/SITE"
    assert eea.scrape_pages
    assert any("header" in s for s in eea.html_extract["remove_by_selector"])
    assert eea.nlp and eea.normalizer.txt_props  # whitelist wired in
    assert "GIS Application" in eea.portal_types
    assert eea.pdf_days_limit == 730
    sdi = cfgs["sdi"]
    # sdi_normalizers variant selected via normalizers_variable
    assert sdi.normalizer.norm_prop.get("OrgForResource") == ["organisation"]
    assert sdi.normalizer.txt_props == [
        "resourceTitleObject.default",
        "resourceAbstractObject.default",
    ]
    # overrides pass through (test harness pointing at a stub)
    stub = all_site_sync_configs(site_url="https://stub.example")["eea"]
    assert stub.site_url == "https://stub.example"


# ---- property tier: norm_missing reference semantics vs a direct ----
# ---- Python model of the reference fold (normalizers.py:90-102)  ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from eea_crawler_spark.operators.normalize_chain import (
    _apply_norm_missing_reference,
)

_KEYS = ["k1", "k2", "k3", "k4"]
_NM = {
    "k1": "default-1",  # plain literal
    "k2": "field:k1",  # indirection onto another configured key
    "k3": 7,  # typed literal
    "k5": "created-fresh",  # key with NO column: must be created
    "k6": "field:k9",  # indirection onto a missing column: stays absent
}


def _py_model(doc: dict) -> dict:
    """The reference's apply_norm_missing, verbatim semantics:
    ``clean_data.get(key) is None`` → literal or doc.get(other). One
    typed-engine delta: a typed default filling an EXISTING column
    adapts to the column's type (str here) — the untyped dict fold
    would mix types inside one field, which a columnar schema cannot."""
    out = dict(doc)
    for key, val in _NM.items():
        if out.get(key) is None:
            if isinstance(val, str) and val.startswith("field:"):
                other = val.split("field:")[-1].strip()
                # the chain only creates the column when the source
                # column exists; doc.get(None-valued) stays None either way
                if other in _KEYS:
                    out[key] = doc.get(other)
            else:
                out[key] = str(val) if key in _KEYS else val
    return out


@settings(deadline=None, max_examples=25,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.fixed_dictionaries(
        {k: st.one_of(st.none(), st.text(min_size=1, max_size=8)) for k in _KEYS}
    )
)
def test_norm_missing_reference_matches_python_model(spark, doc):
    cfg = NormalizerConfig(norm_missing=dict(_NM), reference_mode=True)
    df = spark.createDataFrame(
        [tuple(doc[k] for k in _KEYS)],
        ", ".join(f"{k} string" for k in _KEYS),
    )
    row = _apply_norm_missing_reference(df, cfg).collect()[0].asDict()
    expected = _py_model(doc)
    for key in set(_KEYS) | set(_NM):
        got = row.get(key)
        want = expected.get(key)
        assert got == want, (key, got, want, doc)


def test_parse_mem_accepts_spark_byte_grammar():
    """SPARK_GRAFT_DRIVER_MEM went to spark.driver.memory verbatim
    before the SHJ-threshold derivation parsed it — every Spark-valid
    form must stay valid ('12gb' crashed get_spark when the first
    parser accepted only single-letter suffixes)."""
    import pytest as _pytest

    from eea_crawler_spark.session import _parse_mem

    assert _parse_mem("12g") == 12 << 30
    assert _parse_mem("12gb") == 12 << 30
    assert _parse_mem("512m") == 512 << 20
    assert _parse_mem("512MB") == 512 << 20
    assert _parse_mem("1.5g") == int(1.5 * (1 << 30))
    assert _parse_mem("1024") == 1024
    assert _parse_mem(" 8K ") == 8 << 10
    with _pytest.raises(ValueError):
        _parse_mem("")
    with _pytest.raises(ValueError):
        _parse_mem("lots")
