"""Acquisition layer: listing scans + per-doc fetch as Spark stages.

Re-expresses the reference's crawl surface (SURVEY §2.1 S1-S8) with the
I/O seam injected, so every stage is testable without a network and
swappable for a real HTTP client in production:

  - S1  paginated Plone-REST ``@search`` listing (query builder +
        driver-side page walk → listing DataFrame)
  - S3  sitemap.xml scan → (url, last_modified)
  - S5  per-doc JSON fetch as a ``mapInPandas`` stage with retry/
        backoff, per-host politeness, and errors[] accumulation —
        errors never fail the row (crawl_plone_restapi.py:232-297)
  - S8  robots.txt parse + wildcard/``$`` rule matching (P4)

Transport = ``Callable[[str], tuple[int, str]]`` (status, body). The
listing walk is driver-side on purpose: one site's listing is a few
thousand rows of (id, modified) — the *documents* are the big data, and
their fetch is the distributed stage. Politeness: the reference got
per-site serialization from Airflow pools (slots=1); here the fetch
stage repartitions by host so each host's requests execute within one
task, with a minimum-interval token wait inside the partition.
"""

from __future__ import annotations

import json
import re
import time
import xml.etree.ElementTree as ET
from collections.abc import Callable, Iterator
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

Transport = Callable[[str], tuple[int, str]]

LISTING_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("doc_type", T.StringType()),
        T.StructField("modified", T.StringType()),
        T.StructField("seo_noindex", T.BooleanType()),
    ]
)

FETCHED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("raw_value", T.StringType()),
        T.StructField("errors", T.ArrayType(T.StringType())),
    ]
)


# ---- S1: Plone-REST listing ---------------------------------------------


def listing_search_base(
    site_url: str, api_part: str, fix_items_url: dict | None = None
) -> str:
    """The site-URL prefix listing queries are issued against
    (build_queries_list, plone_rest_api.py:93-103): ``fix_items_url``
    sites swap their configured prefix (without_api → with_api) and
    never append the api segment; otherwise the ``url_api_part``
    segment is appended only when non-empty — an empty part means the
    site serves ``@search`` at its root (discomap/eionet/ias/noise)."""
    base = site_url.rstrip("/")
    if fix_items_url:
        wo = fix_items_url["without_api"]
        if wo in base:
            base = base.replace(wo, fix_items_url["with_api"])
        return base
    part = (api_part or "").strip("/")
    return f"{base}/{part}" if part else base


def listing_query_url(
    site_url: str,
    api_part: str,
    portal_type: str | None,
    b_start: int = 0,
    b_size: int = 500,
    quick_since: str | None = None,
    fix_items_url: dict | None = None,
    language: str | None = None,
    ts: str | None = None,
) -> str:
    """One page of the ``@search`` listing query
    (build_queries_list, plone_rest_api.py:87-141): metadata_fields for
    the diff join, ``show_inactive`` like the reference, newest-first,
    and the quick-mode ``modified >= since`` pushdown (P13) that makes
    incremental listings cheap on the remote side.

    ``language`` builds the per-language variant (``{site}/{lang}/
    @search`` with no portal_type, :114-118); ``ts`` is the reference's
    listing cache-bust stamp (``&ts=``, :104,111)."""
    base = listing_search_base(site_url, api_part, fix_items_url)
    if language:
        base = f"{base}/{language}"
    url = (
        f"{base}/@search"
        f"?b_size={b_size}&b_start={b_start}"
        "&metadata_fields=modification_date&metadata_fields=modified"
        "&metadata_fields=seo_noindex&show_inactive=true"
        "&sort_on=Date&sort_order=reverse"
    )
    if portal_type:
        url += f"&portal_type={portal_type}"
    if quick_since:
        url += f"&modified.query:date={quick_since}&modified.range=min"
    if ts:
        url += f"&ts={ts}"
    return url


def walk_listing(
    transport: Transport,
    site_url: str,
    api_part: str,
    portal_types: list[str],
    b_size: int = 500,
    quick_since: str | None = None,
    max_pages: int = 10_000,
    fix_items_url: dict | None = None,
    languages: list[str] | None = None,
    ts: str | None = None,
) -> list[dict]:
    """Driver-side page walk (pagination loop plone_rest_api.py:169-187):
    follows ``batching.next`` until exhausted, per portal type, plus one
    un-typed walk per configured language (build_queries_list
    :114-118 — the eea site lists 32 language trees this way). Items
    collapse into an id-keyed dict exactly like the reference's
    ``docs_dict`` (crawl_plone_restapi.py get_docs consumer) — a doc
    listed by both its portal-type and language query appears once,
    last listing wins."""
    by_id: dict[str, dict] = {}

    def _walk(ptype: str | None, language: str | None) -> None:
        b_start = 0
        for _ in range(max_pages):
            status, body = transport(
                listing_query_url(
                    site_url, api_part, ptype, b_start, b_size, quick_since,
                    fix_items_url=fix_items_url, language=language, ts=ts,
                )
            )
            if status != 200:
                break
            page = json.loads(body)
            for it in page.get("items", []):
                by_id[it.get("@id")] = {
                    "id": it.get("@id"),
                    "doc_type": it.get("@type", ptype),
                    "modified": it.get("modified"),
                    "seo_noindex": bool(it.get("seo_noindex", False)),
                }
            if not page.get("batching", {}).get("next"):
                break
            b_start += b_size

    for ptype in portal_types:
        _walk(ptype, None)
    for language in languages or []:
        _walk(None, language)
    return list(by_id.values())


def listing_df(
    spark: SparkSession,
    transport: Transport,
    site_url: str,
    api_part: str = "api",
    portal_types: list[str] | None = None,
    b_size: int = 500,
    quick_since: str | None = None,
    fix_items_url: dict | None = None,
    languages: list[str] | None = None,
    ts: str | None = None,
) -> DataFrame:
    rows = walk_listing(
        transport, site_url, api_part, portal_types or ["Document"], b_size,
        quick_since, fix_items_url=fix_items_url, languages=languages, ts=ts,
    )
    return spark.createDataFrame(rows, LISTING_SCHEMA) if rows else spark.createDataFrame(
        [], LISTING_SCHEMA
    )


# ---- S3: sitemap ---------------------------------------------------------

_SM_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def parse_sitemap(xml_text: str) -> list[dict]:
    """sitemap.xml (or index) → [{url, last_modified}]
    (dags/lib/sitemap.py:76-81 shape)."""
    root = ET.fromstring(xml_text)
    out = []
    for node in root.iter(f"{_SM_NS}url"):
        loc = node.find(f"{_SM_NS}loc")
        mod = node.find(f"{_SM_NS}lastmod")
        if loc is not None and loc.text:
            out.append(
                {"url": loc.text.strip(), "last_modified": mod.text.strip() if mod is not None and mod.text else None}
            )
    return out


def sitemap_df(spark: SparkSession, transport: Transport, site_url: str) -> DataFrame:
    status, body = transport(f"{site_url.rstrip('/')}/sitemap.xml")
    rows = parse_sitemap(body) if status == 200 else []
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("last_modified", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)


# ---- S8/P4: robots.txt ---------------------------------------------------


def parse_robots(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """robots.txt → ordered (pattern, allow) rules for the given agent
    (dags/lib/robots_txt.py:9-75 incl. the wildcard RuleLine patch)."""
    rules: list[tuple[str, bool]] = []
    active = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            active = val == agent or val == "*"
        elif active and key in ("allow", "disallow") and val:
            rules.append((val, key == "allow"))
    return rules


def _robots_regex(pattern: str) -> str:
    # '*' wildcard and '$' end anchor, everything else literal
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return "^" + rx + ("$" if anchored else "")


def robots_allowed(rules: list[tuple[str, bool]]) -> Callable[[str], bool]:
    """Longest-match-wins matcher (test_url semantics,
    robots_txt.py:22-40): most specific rule decides; default allow."""
    compiled = sorted(
        ((re.compile(_robots_regex(p)), len(p), allow) for p, allow in rules),
        key=lambda t: -t[1],
    )

    def check(path: str) -> bool:
        for rx, _, allow in compiled:
            if rx.match(path):
                return allow
        return True

    return check


def robots_verdict(
    rules: list[tuple[str, bool]], url_col: str = "id"
):
    """P4 as a COLUMN: each rule becomes a LIKE/regexp predicate —
    stays in codegen, no UDF; rules ride along as literals. Exposed so
    the sync's fused listing sweep can carry the verdict as a flag
    instead of a filter."""
    path = F.regexp_replace(F.col(url_col), r"^https?://[^/]+", "")
    verdict = F.lit(True)  # default allow
    for pattern, allow in sorted(rules, key=lambda t: len(t[0])):
        verdict = F.when(path.rlike(_robots_regex(pattern)), F.lit(allow)).otherwise(
            verdict
        )
    return verdict


def robots_filter(
    df: DataFrame, rules: list[tuple[str, bool]], url_col: str = "id"
) -> DataFrame:
    """P4 as a plan: ``robots_verdict`` applied as a filter."""
    return df.filter(robots_verdict(rules, url_col))


# ---- S5: distributed per-doc fetch --------------------------------------


def fetch_docs(
    listing: DataFrame,
    transport: Transport,
    retries: int = 3,
    backoff_s: float = 0.0,
    min_interval_s: float = 0.0,
    id_col: str = "id",
    url_of=None,
) -> DataFrame:
    """Per-doc fetch as an Arrow-batched ``mapInPandas`` stage.

    Reference behavior kept: retry ×3 with exponential backoff
    (plone_rest_api.py:144-166), errors accumulated into an ``errors``
    column and never failing the row (crawl_plone_restapi.py:232-244).
    Politeness: repartition by URL host so one host = one task, then a
    minimum-interval wait between requests inside the partition (the
    Airflow slots=1 pool, re-expressed).

    ``transport`` must be picklable (it ships to executors).
    ``url_of`` optionally rewrites the fetched URL (the doc's API form,
    :func:`api_url`) while the ``id`` column keeps the listed id — the
    reference's get_api_url step before fetch_and_prepare_doc.
    """

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_call = 0.0
        for pdf in batches:
            out = {"id": [], "status_code": [], "raw_value": [], "errors": []}
            for doc_id in pdf[id_col]:
                errors: list[str] = []
                status, body = 0, None
                target = url_of(doc_id) if url_of is not None else doc_id
                for attempt in range(retries):
                    wait = last_call + min_interval_s - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                    last_call = time.monotonic()
                    try:
                        status, body = transport(target)
                        if status == 200:
                            break
                        errors.append(f"http:{status}")
                    except Exception as ex:  # noqa: BLE001 — row must survive
                        errors.append(f"web:{type(ex).__name__}")
                    if backoff_s:
                        time.sleep(backoff_s * (2**attempt))
                out["id"].append(doc_id)
                out["status_code"].append(status)
                out["raw_value"].append(body if status == 200 else None)
                out["errors"].append(errors if status != 200 else [])
            yield pd.DataFrame(out)

    host = F.regexp_extract(F.col(id_col), r"^https?://([^/]+)", 1)
    return (
        listing.repartition(host)
        .select(id_col)
        .mapInPandas(_fetch, schema=FETCHED_SCHEMA)
    )


def host_of(url: str) -> str:
    return urlparse(url).netloc


# ---- S6: page scrape for scrape-configured sites -------------------------

SCRAPED_SCHEMA = (
    "id string, web_html string, scrape_errors array<string>"
)


def api_url(doc_id: str, api_part: str, fix_items_url: dict | None = None) -> str:
    """Rewrite a listed doc URL to its API form before fetching
    (get_api_url, dags/lib/plone_rest_api.py:12-48): the
    ``www.eea.europa.eu`` legacy ``/api/`` short-circuit, then
    ``fix_items_url`` sites swap a configured prefix (without_api →
    with_api, e.g. ``/en`` → ``/++api++/en``); otherwise the
    ``url_api_part`` segment (empty = no segment) is inserted after
    the host unless already present."""
    if "www.eea.europa.eu" in doc_id and "/api/" in doc_id:
        return doc_id
    if fix_items_url:
        wo, wi = fix_items_url["without_api"], fix_items_url["with_api"]
        if f"{wo}/" in doc_id:
            return doc_id.replace(wo, wi)
        if doc_id == wo:
            return wi
        return doc_id
    part = (api_part or "").strip("/")
    if not part:
        return doc_id
    if f"/{part}" in doc_id:
        return doc_id
    parts = doc_id.split("/")
    parts.insert(3 if "://" in doc_id else 1, part)
    return "/".join(parts)


def fetch_query_url(
    doc_id: str,
    api_part: str,
    fix_items_url: dict | None = None,
    cache_bust: str | None = None,
) -> str:
    """The per-doc request URL the reference actually issues
    (get_doc_from_plone, plone_rest_api.py:190-199): the API form plus
    ``?expand=object_provides&eea_index=1``, with an optional
    ``&crawler=<stamp>`` cache-buster (``avoid_cache_api`` sites)."""
    url = f"{api_url(doc_id, api_part, fix_items_url)}?expand=object_provides&eea_index=1"
    if cache_bust:
        url = f"{url}&crawler={cache_bust}"
    return url


def no_api_url(
    doc_id: str,
    api_part: str,
    fix_items_url: dict | None = None,
    url_to_parse: str | None = None,
) -> str:
    """Strip the REST-API path back off a doc URL
    (get_no_api_url, dags/lib/plone_rest_api.py:51-84): the scrape
    hits the rendered page, not the API resource.

    Full reference branch set: the ``url_to_parse`` site override wins
    outright; ``fix_items_url`` sites invert their prefix swap
    (with_api → without_api, incl. the secondary ``with_api2`` prefix
    and the exact-URL-equality fallback) and FALL THROUGH to the
    segment strip when no prefix matches; the segment strip removes
    every ``/{api_part}/`` occurrence (the reference splits, not
    replace-first), and ``www.eea.europa.eu`` URLs additionally shed
    legacy ``/api/`` segments."""
    if url_to_parse:
        return url_to_parse
    if fix_items_url:
        wo = fix_items_url.get("without_api", "")
        wi = fix_items_url.get("with_api", "")
        wa2 = fix_items_url.get("with_api2")
        if f"{wo}/" in doc_id:
            return doc_id
        if f"{wi}/" in doc_id:
            return doc_id.replace(wi, wo)
        if wa2 is not None and f"{wa2}/" in doc_id:
            return doc_id.replace(wa2, wo)
        if doc_id in (wo, wi, wa2 or ""):
            return wo
        # no prefix matched: the reference falls through to the strip
    if "://" in doc_id:
        protocol, rest = doc_id.split("://", 1)
    else:
        protocol, rest = None, doc_id
    part = (api_part or "").strip("/")
    ret = "/".join(rest.split(f"/{part}/")) if part else rest
    if "www.eea.europa.eu" in rest and "/api/" in rest:
        ret = "/".join(ret.split("/api/"))
    return f"{protocol}://{ret}" if protocol else ret


def headless_chrome_transport(
    endpoint: str, js: bool = True, opener: Callable | None = None
) -> Transport:
    """Build the ``scrape_with_js`` transport (scrape_with_retry's js
    branch, plone_rest_api.py:206-218): rendered pages come from a
    headless-chrome service via POST ``{"url": …, "js": true,
    "raw": true}`` instead of a plain GET. The returned callable is a
    normal :data:`Transport`, so it plugs into ``scrape_docs`` /
    ``run_sync(scrape_transport=…)`` unchanged and ships to executors.

    ``opener(endpoint, payload_bytes) -> (status, body)`` injects the
    HTTP client (tests use a stub); default is stdlib urllib."""

    def _default_opener(url: str, data: bytes) -> tuple[int, str]:
        import urllib.request

        req = urllib.request.Request(
            url, data=data, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=120) as resp:  # noqa: S310
            return resp.status, resp.read().decode("utf-8", "replace")

    do_open = opener or _default_opener

    def _transport(page_url: str) -> tuple[int, str]:
        payload = json.dumps({"url": page_url, "js": js, "raw": True})
        return do_open(endpoint, payload.encode("utf-8"))

    return _transport


def scrape_docs(
    ids: DataFrame,
    transport: Transport,
    api_part: str = "api",
    retries: int = 5,
    id_col: str = "id",
    fix_items_url: dict | None = None,
    cache_bust: str | None = None,
    url_to_parse: str | None = None,
) -> DataFrame:
    """Distributed page scrape (scrape/scrape_with_retry,
    dags/lib/plone_rest_api.py:205-258): fetch the no-api URL of each
    doc, retry ×5. The row always survives with the errors recorded;
    the caller merges ``scrape_errors`` into the envelope's ``errors``
    so an exhausted retry budget error-quarantines the doc exactly like
    a failed fetch (the reference's @retry rethrows and fails the d3
    run for that doc).

    Same partitioning contract as :func:`fetch_docs`: repartition by
    host so per-host politeness holds inside one task.
    """

    def _scrape(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "web_html": [], "scrape_errors": []}
            for doc_id in pdf[id_col]:
                errors: list[str] = []
                html = None
                s_url = no_api_url(doc_id, api_part, fix_items_url, url_to_parse)
                if cache_bust:
                    # avoid_cache_web sites (plone_rest_api.py:251-256)
                    s_url = f"{s_url}?scrape={cache_bust}"
                for _ in range(retries):
                    try:
                        status, body = transport(s_url)
                        if status == 200:
                            html = body
                            break
                        errors.append(f"scrape_http:{status}")
                    except Exception as ex:  # noqa: BLE001 — row survives
                        errors.append(f"scrape:{type(ex).__name__}")
                out["id"].append(doc_id)
                out["web_html"].append(html)
                out["scrape_errors"].append([] if html is not None else errors)
            yield pd.DataFrame(out)

    host = F.regexp_extract(F.col(id_col), r"^https?://([^/]+)", 1)
    return (
        ids.repartition(host)
        .select(id_col)
        .mapInPandas(_scrape, schema=SCRAPED_SCHEMA)
    )
