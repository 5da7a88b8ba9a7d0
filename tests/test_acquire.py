"""Acquisition layer tests: fake transports, no network."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from eea_crawler_spark.sources import acquire as AQ

SITE = "https://site.example"


def _page(items, has_next):
    return json.dumps(
        {"items": items, "batching": {"next": "yes"} if has_next else {}}
    )


class ListingTransport:
    """Two pages of Documents, one page of Files; picklable."""

    def __call__(self, url: str) -> tuple[int, str]:
        assert "@search" in url and "metadata_fields=modified" in url
        if "portal_type=Document" in url:
            if "b_start=0" in url:
                return 200, _page(
                    [
                        {"@id": f"{SITE}/d{i}", "@type": "Document",
                         "modified": f"2024-01-0{i + 1}"}
                        for i in range(2)
                    ],
                    True,
                )
            return 200, _page(
                [{"@id": f"{SITE}/d2", "@type": "Document", "modified": "2024-01-03",
                  "seo_noindex": True}],
                False,
            )
        return 200, _page(
            [{"@id": f"{SITE}/f0", "@type": "File", "modified": "2024-02-01"}], False
        )


def test_listing_walks_pages_and_types(spark):
    df = AQ.listing_df(
        spark, ListingTransport(), SITE, "api", ["Document", "File"], b_size=2
    )
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {f"{SITE}/d0", f"{SITE}/d1", f"{SITE}/d2", f"{SITE}/f0"}
    assert rows[f"{SITE}/d2"]["seo_noindex"] is True
    assert rows[f"{SITE}/f0"]["doc_type"] == "File"


def test_quick_mode_pushdown_in_url():
    url = AQ.listing_query_url(SITE, "api", "Document", quick_since="2024-03-01")
    assert "modified.query:date=2024-03-01" in url and "modified.range=min" in url


def test_listing_url_reference_params():
    """build_queries_list param parity (plone_rest_api.py:104-121):
    show_inactive, both modified metadata fields, the ts stamp, and the
    per-language un-typed variant."""
    url = AQ.listing_query_url(SITE, "api", "Document", ts="r1")
    assert "show_inactive=true" in url
    assert "metadata_fields=modification_date" in url
    assert "&ts=r1" in url and "portal_type=Document" in url
    # language query: {site}/{api}/{lang}/@search, no portal_type
    lurl = AQ.listing_query_url(SITE, "api", None, language="de")
    assert lurl.startswith(f"{SITE}/api/de/@search?")
    assert "portal_type" not in lurl


class LanguageListingTransport:
    """Documents under the typed walk; one extra doc (plus a repeat of
    d0) under the /de/ language walk."""

    def __call__(self, url: str) -> tuple[int, str]:
        if "/de/@search" in url:
            assert "portal_type" not in url
            return 200, _page(
                [
                    {"@id": f"{SITE}/de/x0", "@type": "Document",
                     "modified": "2024-02-01"},
                    {"@id": f"{SITE}/d0", "@type": "Document",
                     "modified": "2024-01-01"},
                ],
                False,
            )
        return 200, _page(
            [{"@id": f"{SITE}/d0", "@type": "Document", "modified": "2024-01-01"}],
            False,
        )


def test_listing_language_walks_dedup_by_id(spark):
    df = AQ.listing_df(
        spark,
        LanguageListingTransport(),
        SITE,
        "api",
        ["Document"],
        languages=["de"],
    )
    rows = {r["id"] for r in df.collect()}
    # d0 listed by BOTH walks appears once (reference docs_dict)
    assert rows == {f"{SITE}/d0", f"{SITE}/de/x0"}


def test_headless_chrome_transport_request_shape():
    """scrape_with_js request parity (scrape_with_retry js branch,
    plone_rest_api.py:206-218): POST to the hc endpoint with
    {"url":…, "js":true, "raw":true}."""
    seen = {}

    def opener(endpoint, data):
        seen["endpoint"] = endpoint
        seen["payload"] = json.loads(data)
        return 200, "<html>rendered</html>"

    t = AQ.headless_chrome_transport("http://hc:3000/api/render", opener=opener)
    status, body = t("https://site.example/page")
    assert status == 200 and body == "<html>rendered</html>"
    assert seen["endpoint"] == "http://hc:3000/api/render"
    assert seen["payload"] == {
        "url": "https://site.example/page", "js": True, "raw": True,
    }


SITEMAP = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://site.example/a</loc><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://site.example/b</loc></url>
</urlset>"""


def test_sitemap_parse(spark):
    df = AQ.sitemap_df(spark, lambda url: (200, SITEMAP), SITE)
    rows = {r["url"]: r["last_modified"] for r in df.collect()}
    assert rows == {"https://site.example/a": "2024-01-01", "https://site.example/b": None}


ROBOTS = """
User-agent: *
Disallow: /private/
Allow: /private/public*
Disallow: /*.pdf$
"""


def test_robots_matcher_longest_wins():
    check = AQ.robots_allowed(AQ.parse_robots(ROBOTS))
    assert check("/open/page")
    assert not check("/private/x")
    assert check("/private/public/x")  # longer allow overrides
    assert not check("/docs/file.pdf")
    assert check("/docs/file.pdfx")  # $ anchor respected


def test_robots_filter_plan(spark):
    rules = AQ.parse_robots(ROBOTS)
    df = spark.createDataFrame(
        [(f"{SITE}/open/page",), (f"{SITE}/private/x",), (f"{SITE}/private/public/y",)],
        ["id"],
    )
    kept = {r["id"] for r in AQ.robots_filter(df, rules).collect()}
    assert kept == {f"{SITE}/open/page", f"{SITE}/private/public/y"}


class FlakyDocTransport:
    """First call per id fails, second succeeds — retry must recover.

    State lives in a class attribute per-process; with one host the
    fetch runs in a single task/process so this is deterministic.
    """

    seen: dict[str, int] = {}

    def __call__(self, url: str) -> tuple[int, str]:
        n = self.seen.get(url, 0)
        self.seen[url] = n + 1
        if url.endswith("dead"):
            return 500, "nope"
        if n == 0 and url.endswith("flaky"):
            return 503, "try again"
        return 200, json.dumps({"@id": url, "title": "ok"})


def test_fetch_retries_and_error_accumulation(spark):
    listing = spark.createDataFrame(
        [(f"{SITE}/ok",), (f"{SITE}/flaky",), (f"{SITE}/dead",)], ["id"]
    )
    out = {r["id"]: r for r in AQ.fetch_docs(listing, FlakyDocTransport()).collect()}
    assert out[f"{SITE}/ok"]["status_code"] == 200
    assert out[f"{SITE}/ok"]["errors"] == []
    assert out[f"{SITE}/flaky"]["status_code"] == 200  # recovered on retry
    assert json.loads(out[f"{SITE}/flaky"]["raw_value"])["title"] == "ok"
    dead = out[f"{SITE}/dead"]
    assert dead["status_code"] == 500 and dead["raw_value"] is None
    assert dead["errors"] == ["http:500", "http:500", "http:500"]  # never raises


def test_api_url_and_no_api_url_twins():
    """get_api_url / get_no_api_url parity (plone_rest_api.py:10-80):
    api-part insertion after the host, already-api passthrough, and
    the fix_items_url prefix swap + inverse."""
    from eea_crawler_spark.sources.acquire import api_url, no_api_url

    # plain insertion / stripping
    assert (
        api_url("https://site.example/d0", "api/SITE")
        == "https://site.example/api/SITE/d0"
    )
    assert api_url("https://site.example/api/SITE/d0", "api/SITE") == (
        "https://site.example/api/SITE/d0"
    )  # already api: unchanged
    assert (
        no_api_url("https://site.example/api/SITE/d0", "api/SITE")
        == "https://site.example/d0"
    )
    assert api_url("https://site.example/d0", "") == "https://site.example/d0"

    # fix_items_url prefix swap (the eea_en / wise shape)
    fix = {
        "without_api": "https://www.eea.europa.eu/en",
        "with_api": "https://www.eea.europa.eu/++api++/en",
    }
    assert (
        api_url("https://www.eea.europa.eu/en/topics/x", "api", fix)
        == "https://www.eea.europa.eu/++api++/en/topics/x"
    )
    assert api_url("https://www.eea.europa.eu/en", "api", fix) == fix["with_api"]
    assert (
        api_url("https://other.example/x", "api", fix) == "https://other.example/x"
    )  # outside the prefix: untouched
    assert (
        no_api_url("https://www.eea.europa.eu/++api++/en/topics/x", "api", fix)
        == "https://www.eea.europa.eu/en/topics/x"
    )
    assert (
        no_api_url("https://www.eea.europa.eu/en/topics/x", "api", fix)
        == "https://www.eea.europa.eu/en/topics/x"
    )  # already rendered form: unchanged


def test_no_api_url_reference_branches():
    """The get_no_api_url branch set (plone_rest_api.py:51-84) the
    round-3 port missed: url_to_parse override, with_api2, exact-URL
    equality fallback, fall-through to the segment strip, splitting
    ALL api-segment occurrences, and the eea legacy /api/ shed."""
    from eea_crawler_spark.sources.acquire import api_url, no_api_url

    fix = {
        "without_api": "https://water.europa.eu/freshwater",
        "with_api": "https://water.europa.eu/freshwater/++api++",
        "with_api2": "https://water.europa.eu/fresh2/++api++",
    }
    # url_to_parse wins outright
    assert (
        no_api_url("https://x/any", "api", fix, url_to_parse="https://x/home")
        == "https://x/home"
    )
    # with_api2 prefix inverts to without_api
    assert (
        no_api_url("https://water.europa.eu/fresh2/++api++/rivers", "", fix)
        == "https://water.europa.eu/freshwater/rivers"
    )
    # exact equality fallback → without_api. Only reachable when no
    # prefix-containment branch fires first, i.e. shapes where
    # without_api is NOT a prefix of with_api (the eea_en swap)
    fix_en = {
        "without_api": "https://www.eea.europa.eu/en",
        "with_api": "https://www.eea.europa.eu/++api++/en",
        "with_api2": "https://www.eea.europa.eu/api/en",
    }
    for exact in (fix_en["with_api"], fix_en["with_api2"]):
        assert no_api_url(exact, "", fix_en) == fix_en["without_api"]
    # wise shape: with_api == without_api + '/++api++', so the wo/
    # containment branch fires first and the URL passes through —
    # reference-exact (plone_rest_api.py:57-58)
    assert no_api_url(fix["with_api"], "", fix) == fix["with_api"]
    # no prefix matched → falls through to the segment strip
    assert (
        no_api_url("https://other.example/api/x", "api", fix)
        == "https://other.example/x"
    )
    # the strip removes EVERY occurrence (reference splits, not
    # replace-first)
    assert (
        no_api_url("https://s.example/api/a/api/b", "api")
        == "https://s.example/a/b"
    )
    # eea legacy: /api/ segments shed even when url_api_part differs
    assert (
        no_api_url("https://www.eea.europa.eu/api/x", "++api++")
        == "https://www.eea.europa.eu/x"
    )
    # ...and get_api_url's matching short-circuit: /api/ already there
    assert (
        api_url("https://www.eea.europa.eu/api/x", "++api++")
        == "https://www.eea.europa.eu/api/x"
    )


def test_listing_search_base_per_site_shapes():
    """build_queries_list's URL prefix (plone_rest_api.py:93-103) for
    every registered production site shape: empty api parts stay
    segment-free, fix_items_url sites swap without→with_api and never
    append the api part."""
    from eea_crawler_spark.config import site_table
    from eea_crawler_spark.sources.acquire import listing_search_base

    expected = {
        # empty url_api_part → @search at the site root
        "discomap": "https://discomap.eea.europa.eu",
        "eionet": "https://www.eionet.europa.eu",
        "ias": "https://ias.eea.europa.eu",
        "noise": "https://noise.eea.europa.eu",
        # plain api segment appended
        "energy": "https://climate-energy.eea.europa.eu/api",
        "bise": "https://biodiversity.europa.eu/++api++",
        "eea": "http://www.eea.europa.eu/api/SITE",
        # fix_items_url prefix swap, NO api part appended
        "eea_en": "https://www.eea.europa.eu/++api++/en",
        "wise_freshwater": "https://water.europa.eu/freshwater/++api++",
        "wise_marine": "https://water.europa.eu/marine/++api++",
    }
    sites = site_table()
    for sid, want in expected.items():
        cfg = sites[sid]
        got = listing_search_base(
            cfg["url"],
            (cfg.get("url_api_part") or "").strip("/"),
            cfg.get("fix_items_url"),
        )
        assert got == want, f"{sid}: {got} != {want}"


def test_site_sync_config_preserves_empty_api_part():
    """site_sync_config must pass '' through (the round-3 `or 'api'`
    coercion broke discomap/eionet/ias/noise listing + scrape URLs)."""
    from eea_crawler_spark.config import site_sync_config

    assert site_sync_config("discomap").api_part == ""
    assert site_sync_config("energy").api_part == "api"
    # listing leg: the full page URL for an empty-part site has no
    # spurious /api/ segment
    from eea_crawler_spark.sources.acquire import listing_query_url

    url = listing_query_url("https://discomap.eea.europa.eu/", "", "Document")
    assert url.startswith("https://discomap.eea.europa.eu/@search?")
    # fix_items_url listing leg: eea_en lists against the ++api++ form
    cfg = site_sync_config("eea_en")
    url = listing_query_url(
        cfg.site_url, cfg.api_part, "Document", fix_items_url=cfg.fix_items_url
    )
    assert url.startswith("https://www.eea.europa.eu/++api++/en/@search?")


def test_fetch_query_url_and_cache_bust():
    """get_doc_from_plone's request URL: expand params always, crawler
    stamp only for avoid_cache_api sites; scrape side uses ?scrape=."""
    from eea_crawler_spark.sources.acquire import fetch_query_url

    assert fetch_query_url("https://s.example/d0", "api") == (
        "https://s.example/api/d0?expand=object_provides&eea_index=1"
    )
    assert fetch_query_url("https://s.example/d0", "api", cache_bust="r1") == (
        "https://s.example/api/d0?expand=object_provides&eea_index=1&crawler=r1"
    )
