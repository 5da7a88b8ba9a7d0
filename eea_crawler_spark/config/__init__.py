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
