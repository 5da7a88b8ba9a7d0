"""Normalizer transform library — §2.5 of SURVEY.md, Spark-first.

Re-expresses the reference's per-document transform functions
(``dags/normalizers/lib/normalizers.py``) as *column expressions* built
from pyspark.sql.functions, so the whole normalize chain compiles into
one Catalyst plan (WholeStageCodegen, no Python in the hot path). Each
builder cites the reference behavior it reproduces; none of this is a
code port — the reference mutates Python dicts row-at-a-time, here every
transform is a declarative expression over a fixed-schema DataFrame.

Value maps (normObj, black/white maps, …) become in-plan map literals
via ``F.create_map`` — Catalyst constant-folds the lookups; for very
large maps prefer a broadcast-join against a dimension table (see
operators/normalize_chain.py).

Absent-vs-null: the reference distinguishes missing keys from empty
values and deletes empties (``remove_empty``, normalizers.py:130-145).
Spark columns are fixed-schema, so "absent" is modeled as NULL and
remove_empty becomes null-out; downstream default-fill (normMissing)
keys off NULL, which matches the reference's post-remove_empty view.
"""

from __future__ import annotations

from itertools import chain

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def map_literal(mapping: dict[str, str]) -> Column:
    """A MapType literal for in-plan lookups (constant-folded by Catalyst).

    Built from two one-call ARRAY literals, not per-entry ``F.lit``s:
    plan CONSTRUCTION is py4j-bound (round-13 — the normalize chain's
    build spent 1.4 s in ~9k py4j roundtrips, half of them these map
    entries), and ``F.lit(list)`` ships the whole list in one command.
    ``map_from_arrays(lit, lit)`` folds to the same map literal
    ``create_map`` folded to; lookups are unchanged."""
    if not mapping:
        return F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        )
    return F.map_from_arrays(
        F.lit(list(mapping.keys())), F.lit(list(mapping.values()))
    )


# ---- T2/T3 black/white value maps (normalizers.py:14-51) ----------------


def black_map_array(col: Column, blacklist: list[str]) -> Column:
    """Drop blacklisted values from an array field (normalizers.py:14-31).
    One-call list literal — see ``map_literal`` on py4j-bound builds."""
    return F.array_except(col, F.lit(list(blacklist)))


def black_map_scalar(col: Column, blacklist: list[str]) -> Column:
    """Null a scalar field when its value is blacklisted."""
    return F.when(col.isin(blacklist), F.lit(None)).otherwise(col)


def white_map_array(col: Column, whitelist: list[str]) -> Column:
    """Keep only whitelisted values in an array field (normalizers.py:34-51).

    array_intersect dedups; the reference keeps first occurrence order of
    the whitelist-filtered input, which for deduped inputs (T7 runs in
    the same chain) is equivalent.
    """
    return F.array_intersect(col, F.lit(list(whitelist)))


def white_map_scalar(col: Column, whitelist: list[str]) -> Column:
    return F.when(col.isin(whitelist), col).otherwise(F.lit(None))


# ---- T4 normObj global value rewrite (normalizers.py:54-73) -------------


def norm_obj_array(
    col: Column, mapping: dict[str, str] | Column
) -> Column:
    """Rewrite every array element through the map, identity fallback.

    ``mapping`` may be a prebuilt ``map_literal`` Column: T4 applies the
    SAME map to every string-ish column (~65 at the production config),
    and re-building the literal per column multiplied the py4j build
    cost for identical expressions (round-13; Columns are immutable
    expression trees — sharing one across a projection is sound)."""
    m = mapping if isinstance(mapping, Column) else map_literal(mapping)
    return F.transform(col, lambda x: F.coalesce(m[x], x))


def norm_obj_scalar(
    col: Column, mapping: dict[str, str] | Column
) -> Column:
    m = mapping if isinstance(mapping, Column) else map_literal(mapping)
    return F.coalesce(m[col], col)


# ---- T6 normMissing default fill (normalizers.py:90-102) ----------------


def norm_missing(col: Column, default, other_col: Column | None = None) -> Column:
    """Fill NULL with a literal default, or with another column when the
    config says ``"field:<name>"`` (copy-from indirection)."""
    if other_col is not None:
        return F.coalesce(col, other_col)
    return F.coalesce(col, F.lit(default))


# ---- T7 in-array dedup (normalizers.py:105-115) -------------------------


def dedup_array(col: Column) -> Column:
    """Order-preserving distinct (list(dict.fromkeys(v)) semantics):
    array_distinct keeps first occurrences in order."""
    return F.array_distinct(col)


# ---- T8 remove_extra_webpages (normalizers.py:118-127) ------------------


def remove_extra_value(col: Column, extra: str = "Webpage") -> Column:
    """Drop ``extra`` from the array only when other values exist."""
    return F.when(
        (F.size(col) > 1) & F.array_contains(col, extra), F.array_remove(col, extra)
    ).otherwise(col)


# ---- T9 remove_empty → null-out (normalizers.py:130-145) ----------------


def null_if_empty_string(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(None)).otherwise(col)


def null_if_empty_array(col: Column) -> Column:
    return F.when(F.size(col) == 0, F.lit(None)).otherwise(col)


# ---- T11 add_places (normalizers.py:156-159) — plain column copy --------
# ---- T16 geo/temporal coverage (normalizers.py:309-326) -----------------


def labels_of(col: Column, field: str = "label") -> Column:
    """``[x[field] for x in col]`` — struct-array projection (also T22
    simplify_list / vocab_to_list, normalizers.py:473-479)."""
    return F.transform(col, lambda x: x[field])


# ---- T15 update_locations (normalizers.py:298-306) ----------------------

_GEOJSON_SCHEMA = "STRUCT<features: ARRAY<STRUCT<properties: STRUCT<title: STRING>>>>"


def geojson_titles(col: Column) -> Column:
    """Parse a geoJSON string column → array of feature titles."""
    parsed = F.from_json(col, _GEOJSON_SCHEMA)
    return F.transform(parsed["features"], lambda f: f["properties"]["title"])


# ---- T17 merge_types (normalizers.py:329-345) ---------------------------


def merge_types(object_provides: Column, interfaces: Column, whitelist: list[str]) -> Column:
    """Append whitelisted marker interfaces to objectProvides."""
    keep = F.filter(interfaces, lambda x: x.isin(whitelist))
    return F.array_union(object_provides, keep)


# ---- T18 update_language (normalizers.py:348-350) -----------------------


def update_language(lang: Column, token: Column, default: str = "en") -> Column:
    return F.coalesce(lang, token, F.lit(default))


# ---- T19 fix_state (normalizers.py:353-380) -----------------------------


def fix_state(
    doc_type: Column,
    review_state: Column,
    parent_state: Column,
) -> Column:
    """File + 'visible' inherits the parent's workflow state."""
    return F.when(
        (doc_type == "File") & (review_state == "visible"), F.coalesce(parent_state, review_state)
    ).otherwise(review_state)


def archived_expires(review_state: Column, expires: Column) -> Column:
    """Archived docs without an expiry get expires = today - 2 days
    (normalizers.py:370-374)."""
    return F.when(
        (review_state == "archived") & expires.isNull(),
        F.date_sub(F.current_date(), 2).cast("string"),
    ).otherwise(expires)


# ---- T20 addFormat (normalizers.py:391-400) -----------------------------


def add_pdf_format(fmt: Column, pdf_text: Column) -> Column:
    """Append application/pdf when pdf text was extracted."""
    with_pdf = F.array_union(
        F.coalesce(fmt, F.array().cast("array<string>")),
        F.array(F.lit("application/pdf")),
    )
    return F.when(
        pdf_text.isNotNull() & (F.length(pdf_text) > 0), with_pdf
    ).otherwise(fmt)


# ---- T21 merge_themes + taxonomy lookup (normalizers.py:403-422) --------


def merge_themes(themes: Column, taxonomy_tokens: Column, label_map: dict[str, str]) -> Column:
    """themes ∪ taxonomy tokens, then label-normalize through the map."""
    merged = F.array_union(
        F.coalesce(themes, F.array().cast("array<string>")),
        F.coalesce(taxonomy_tokens, F.array().cast("array<string>")),
    )
    return norm_obj_array(merged, label_map)


# ---- T23 publishers cleanup (normalizers.py:590-605) --------------------

PUBLISHER_CANON = {"EEA (European Environment Agency)": "European Environment Agency"}


def canon_publishers(col: Column, canon: dict[str, str] | None = None) -> Column:
    return dedup_array(norm_obj_array(col, canon or PUBLISHER_CANON))


# ---- T24 path-rule content-type classifier (normalizers.py:622-649) -----


def ct_by_path_rules(
    path: Column, rules: list[tuple[str, list[str]]], fallback: list[str]
) -> Column:
    """Longest-prefix-wins path rules → content-type array.

    ``rules`` entries: (pattern, cts); a pattern ending in ``*`` is a
    prefix match, otherwise exact. Longest-wins is encoded by sorting
    at plan-build time so the generated WHEN chain checks the most
    specific rule first (find_ct_by_rules semantics).
    """
    ordered = sorted(rules, key=lambda r: len(r[0]), reverse=True)
    expr = F.lit(list(fallback)) if fallback else F.array()
    for pattern, cts in reversed(ordered):
        lit_cts = F.lit(list(cts)) if cts else F.array()
        if pattern.endswith("*"):
            cond = path.startswith(pattern[:-1])
        else:
            cond = path == pattern
        expr = F.when(cond, lit_cts).otherwise(expr)
    return expr


# ---- T25 update_ct_by_attr (normalizers.py:662-675) ---------------------


def ct_by_attr(ct: Column, attr: Column, attr_to_ct: dict[str, str]) -> Column:
    """Append the mapped content-type when the (case-insensitive) attr
    value appears in the attribute array."""
    out = ct
    for needle, mapped in attr_to_ct.items():
        hit = F.exists(attr, lambda x: F.lower(x) == needle.lower())
        out = F.when(
            hit, F.array_union(out, F.array(F.lit(mapped)))
        ).otherwise(out)
    return out


# ---- T26 API-url ↔ site-url rewriting (plone_rest_api.py:12-84) ---------


def to_api_url(url: Column, site_url: str, api_part: str) -> Column:
    """Insert the API path segment after the site root."""
    site = site_url.rstrip("/")
    return F.when(
        url.startswith(site),
        F.concat(F.lit(f"{site}/{api_part}"), F.expr(f"substring(url, {len(site) + 1})")),
    ).otherwise(url)


def strip_api_url(url: Column, site_url: str, api_part: str) -> Column:
    site = site_url.rstrip("/")
    return F.replace(url, F.lit(f"{site}/{api_part}/"), F.lit(f"{site}/"))


# ---- T27 URL canonicalization (crawl_plone_restapi.py:264-267) ----------


def canon_url(url: Column) -> Column:
    """Strip query, fragment, and trailing slash before compare."""
    no_q = F.regexp_replace(url, r"[?#].*$", "")
    return F.regexp_replace(no_q, r"/$", "")


# ---- A1 per-array counts (normalizers.py:652-660) -----------------------


def items_count(col: Column) -> Column:
    """size() with the reference's convention: missing array → count 0."""
    return F.coalesce(F.size(col), F.lit(0)).cast("long")


# ---- T12 join_text_fields (normalizers.py:162-207) ----------------------


def sentence_dot(col: Column) -> Column:
    """Ensure each fragment ends with a sentence dot (join_text_fields
    normalization; fragments get '. ' separators without doubling dots)."""
    trimmed = F.trim(col)
    return F.when(
        trimmed.rlike(r"[.!?]$") | (F.length(trimmed) == 0), trimmed
    ).otherwise(F.concat(trimmed, F.lit(".")))


def join_text_fields(fragments: list[Column]) -> Column:
    """Title + ordered text fragments joined with single spaces; NULL
    fragments drop out (concat_ws skips nulls)."""
    return F.concat_ws(" ", *[sentence_dot(f) for f in fragments])


# ---- A8: recursive data-provenance collection ---------------------------

PROVENANCE_DDL = (
    "STRUCT<data_provenances: ARRAY<STRUCT<link: STRING, "
    "organisation: STRING, title: STRING>>, "
    "data_provenances_organisations: ARRAY<STRING>>"
)

# one hard-coded bad value the reference filters out
# (normalizers.py:470)
_PROVENANCE_ORG_BLACKLIST = {
    "/data/visualizations/vis_countryfacts_gfra_vita_disturbances_diseases"
}


def find_all(node, name: str, results: list | None = None) -> list:
    """Recursive key search over a parsed JSON tree (find_all,
    normalizers.py:424-435): every value stored under ``name`` at any
    depth, in document order."""
    if results is None:
        results = []
    if isinstance(node, dict):
        for k, v in node.items():
            if k == name:
                results.append(v)
            else:
                find_all(v, name, results)
    elif isinstance(node, list):
        for v in node:
            find_all(v, name, results)
    return results


def data_provenance_py(raw_json: str | None) -> dict:
    """get_data_provenance (normalizers.py:437-471): collect
    data_provenance[].data entries dedup'd by (link, organisation,
    title); when none exist fall back to chartSources entries; distinct
    organisations order-preserving, minus the hardcoded bad value."""
    import json as _json

    try:
        doc = _json.loads(raw_json) if raw_json else {}
    except ValueError:
        doc = {}
    dps_full: list[dict] = []
    for dp_part in find_all(doc, "data_provenance"):
        if dp_part is None or not isinstance(dp_part, dict):
            continue
        for dp in dp_part.get("data", []) or []:
            key = (dp.get("link"), dp.get("organisation"), dp.get("title"))
            if all(
                key != (s.get("link"), s.get("organisation"), s.get("title"))
                for s in dps_full
            ):
                dps_full.append(
                    {"link": key[0], "organisation": key[1], "title": key[2]}
                )
    if not dps_full:
        for cs_part in find_all(doc, "chartSources"):
            for cs in cs_part or []:
                link = cs.get("chart_source_link", "no_link")
                org = cs.get("chart_source")
                if all(
                    not (link == s["link"] and org == s["organisation"])
                    for s in dps_full
                ):
                    dps_full.append(
                        {"link": link, "organisation": org, "title": org}
                    )
    orgs = list(dict.fromkeys(dp["organisation"] for dp in dps_full))
    return {
        "data_provenances": dps_full,
        "data_provenances_organisations": [
            o for o in orgs if o not in _PROVENANCE_ORG_BLACKLIST
        ],
    }


def data_provenance(raw_col: Column) -> Column:
    """Column form: one Arrow-batched stage over the raw JSON string
    (dynamic keys — same §7.3 rationale as join_text_fields_dynamic)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(PROVENANCE_DDL)
    def _prov(raw: pd.Series) -> pd.DataFrame:
        rows = [data_provenance_py(r) for r in raw]
        return pd.DataFrame(rows)

    return _prov(raw_col)
