"""Production configuration tables, ported from the reference deployment.

The reference engine is config-driven: its normalize chain reads the
``default_normalizers`` / ``sdi_normalizers`` Airflow Variables and the
Elasticsearch mapping's ``null_value`` defaults
(``dags/variables.json:1666-1972`` and ``5606-5671``;
``elastic_mapping_default`` null_values at ``variables.json:2337`` area).
The JSON files in this package are a verbatim port of that config *data*
(values a migrating user already runs in production):

- ``default_normalizers.json`` — blackMap (4 fields), normMissing (12
  defaults incl. typed values ``0``/``-1``/``[]`` and ``field:``
  indirection), the 201-entry normObj value map (incl. the 24-language
  topic translations, ``variables.json:1699-1901``), normProp renames
  (20, incl. one-to-many), the 31-field proplist, whiteMap.
- ``sdi_normalizers.json`` — the SDI catalogue variant
  (``variables.json:5606-5671``).
- ``theme_taxonomy.json`` — token → label map used by the theme merge
  (``update_from_theme_taxonomy``, normalizers.py:407-422).
- ``null_values.json`` — ES-mapping ``null_value`` defaults
  (language → "en", objectProvides → "Other",
  topic → "Various other issues"). In Elasticsearch these substitute
  *explicit* nulls at index time (missing fields stay missing); the
  Spark chain applies them the same way — only to present-but-null
  values of existing columns.
- ``sites.json`` — the ``app_global_search`` ``Sites`` registry with
  each site's crawl config (url/api part, portal types, scrape +
  trafilatura settings, nlp text props, normalizer variable), the
  engine-relevant subset of the per-site config variables.
  :func:`site_sync_config` turns one entry into a runnable
  ``SyncConfig``.

Loaders return plain dicts; :func:`production_config` /
:func:`sdi_config` assemble them into the engine's
:class:`~eea_crawler_spark.operators.normalize_chain.NormalizerConfig`.
"""

from __future__ import annotations

import copy
import json
import os
from functools import lru_cache

_DIR = os.path.dirname(__file__)


@lru_cache(maxsize=None)
def _load_table_cached(name: str) -> dict:
    with open(os.path.join(_DIR, f"{name}.json"), encoding="utf-8") as f:
        return json.load(f)


def load_table(name: str) -> dict:
    """Load one ported config table by basename.

    Parsed once (cached); callers get a deep copy so mutating a returned
    table can never corrupt the cache for later callers."""
    return copy.deepcopy(_load_table_cached(name))


def theme_labels() -> dict[str, str]:
    """token → label from the ported theme taxonomy."""
    return {tok: v["label"] for tok, v in load_table("theme_taxonomy").items()}


@lru_cache(maxsize=None)
def production_config():
    """The reference's full ``default_normalizers`` as a NormalizerConfig.

    This is what a user migrating from the reference runs: the 201-entry
    normObj map, production renames/proplist, typed missing-value fills,
    taxonomy labels, and ES null_value defaults — with
    ``reference_mode=True`` so the proplist projection uses the
    reference's early-snapshot semantics (fields *added* by
    normalization survive even when not listed;
    ``get_attrs_to_delete`` runs before the chain mutates the doc,
    normalizers.py:528-533).
    """
    from eea_crawler_spark.operators.normalize_chain import NormalizerConfig

    return NormalizerConfig.from_tables(
        load_table("default_normalizers"),
        theme_labels=theme_labels(),
        null_values=load_table("null_values"),
    )


@lru_cache(maxsize=None)
def sdi_config():
    """The SDI catalogue variant (``sdi_normalizers``)."""
    from eea_crawler_spark.operators.normalize_chain import NormalizerConfig

    return NormalizerConfig.from_tables(
        load_table("sdi_normalizers"),
        theme_labels=theme_labels(),
        null_values=load_table("null_values"),
    )


def site_table() -> dict:
    """The production per-site crawl config (``sites.json``): the
    ``app_global_search`` app's ``Sites`` registry resolved through its
    per-site config variables (``dags/variables.json`` —
    ``config_eea``, ``config_sdi_prod``, …), engine-relevant keys only.
    A migrating user's own site variables drop in unchanged."""
    return load_table("sites")


def site_sync_config(site_id: str, **overrides):
    """Build the engine's :class:`~eea_crawler_spark.pipeline.SyncConfig`
    from one ported site entry — the d1→d2 config plumbing
    (``dags/d2_crawl_site.py`` reads the site variable; normalizer
    choice via ``normalizers_variable``, nlp text props via
    ``nlp_preprocessing.text``, scrape + trafilatura settings via
    ``scrape_pages``/``trafilatura``).

    ``overrides`` pass through to ``SyncConfig`` (e.g. a test
    ``site_url`` pointing at a stub)."""
    from dataclasses import replace as dc_replace

    from eea_crawler_spark.pipeline import SyncConfig

    cfg = site_table()[site_id]
    normalizer = (
        sdi_config()
        if cfg.get("normalizers_variable") == "sdi_normalizers"
        else production_config()
    )
    nlp_text = (cfg.get("nlp_preprocessing") or {}).get("text")
    if nlp_text is not None:
        # dynamic-key fulltext discovery (join_text_fields whitelist/
        # blacklist, reference normalizers.py:162-207)
        normalizer = dc_replace(
            normalizer,
            txt_props=list(nlp_text.get("whitelist") or []),
            txt_props_black=list(nlp_text.get("blacklist") or []),
        )
    kw = dict(
        site_url=cfg["url"],
        site_id=site_id,
        # empty url_api_part means NO api segment (get_api_url
        # plone_rest_api.py:30-31, build_queries_list :101-103) —
        # discomap/eionet/ias/noise serve @search at the site root,
        # so '' must pass through, never be coerced to 'api'
        api_part=(cfg.get("url_api_part") or "").strip("/"),
        portal_types=list(cfg.get("portal_types") or ["Document"]),
        languages=list(cfg.get("languages") or []),
        types_blacklist=list(cfg.get("types_blacklist") or []),
        scrape_pages=bool(cfg.get("scrape_pages")),
        scrape_with_js=bool(cfg.get("scrape_with_js")),
        html_extract=dict(cfg.get("trafilatura") or {}),
        pdf_days_limit=int(cfg.get("pdf_days_limit") or 0),
        nlp=nlp_text is not None,
        normalizer=normalizer,
        # production URL plumbing: fetch the API request form of
        # listed URLs, with per-site cache busting
        api_url_rewrite=True,
        fix_items_url=cfg.get("fix_items_url"),
        url_to_parse=cfg.get("url_to_parse"),
        avoid_cache_api=bool(cfg.get("avoid_cache_api")),
        avoid_cache_web=bool(cfg.get("avoid_cache_web")),
    )
    kw.update(overrides)
    return SyncConfig(**kw)


def all_site_sync_configs(**overrides) -> dict:
    """One SyncConfig per registered site (the d0 trigger-all set)."""
    return {sid: site_sync_config(sid, **overrides) for sid in site_table()}
