"""Attachment extraction (S7): file-field detection, URL rules, age
guard, converter stage with retry fallback."""

from __future__ import annotations

import json
from datetime import datetime

from eea_crawler_spark.sources import attachments as AT

NOW = datetime(2024, 6, 1)


def test_file_field_markers():
    assert AT.is_file_field(
        {"content-type": "application/pdf", "download": "u", "filename": "f"}
    )
    assert not AT.is_file_field({"content-type": "application/pdf"})
    assert not AT.is_file_field("not a dict")


def test_fix_download_url_classic_vs_en_site():
    classic = "https://www.eea.europa.eu/publications/rep1"
    en = "https://www.eea.europa.eu/en/analysis/rep1"
    dl = "https://www.eea.europa.eu/publications/rep1/@@download/file"
    assert AT.fix_download_url(dl, classic).endswith("at_download/file")
    assert AT.fix_download_url(dl, en) == dl  # /en/ path untouched
    static = dl.replace("@@download/file", "@@download/pdfStatic")
    assert AT.fix_download_url(static, classic) == static  # rendition kept


def test_age_guard():
    assert AT.within_age_limit("2024-05-20T10:00:00", 30, NOW)
    assert not AT.within_age_limit("2024-01-01T00:00:00", 30, NOW)
    assert AT.within_age_limit("2024-01-01", 0, NOW)  # limit 0 = always
    assert AT.within_age_limit(None, 30, NOW)  # missing date = extract
    assert AT.within_age_limit("garbage", 30, NOW)  # unparseable = extract


def test_attachment_urls_file_fields_and_report_pdf():
    doc = {
        "id": "https://www.eea.europa.eu/publications/rep1",
        "@type": "report_pdf",
        "file": {
            "content-type": "application/pdf",
            "download": "https://www.eea.europa.eu/publications/rep1/@@download/file",
            "filename": "r.pdf",
        },
        "image": {  # not an allowed content type
            "content-type": "image/png",
            "download": "https://x/img/@@download/image",
            "filename": "i.png",
        },
        "items": [
            {"@type": "File", "@id": "https://x/child1"},
            {"@type": "Document", "@id": "https://x/child2"},
        ],
    }
    urls = AT.attachment_urls(doc)
    assert "https://x/child1/@@download/file" in urls
    assert any(u.endswith("at_download/file") for u in urls)  # fixed
    assert not any("image" in u for u in urls)
    assert len(urls) == 2


class Converter:
    """Stub converter: fails on at_download (forcing the retry path)."""

    def __init__(self):
        self.calls = []

    def __call__(self, url):
        self.calls.append(url)
        if "at_download" in url:
            return 500, "boom"
        return 200, json.dumps(
            {"documents": [{"text": f"  text-of {url.split('/')[3]}  "}]}
        )


def test_extract_stage_with_retry_and_age_guard(spark):
    def env(doc_id, modified, raw):
        return (doc_id, modified, json.dumps(raw))

    pdf_field = {
        "content-type": "application/pdf",
        "download": "https://www.eea.europa.eu/publications/r/@@download/file",
        "filename": "r.pdf",
    }
    rows = [
        env("https://www.eea.europa.eu/publications/r", "2024-05-30", {
            "id": "https://www.eea.europa.eu/publications/r", "file": pdf_field,
        }),
        env("https://old.example/o", "2020-01-01", {
            "id": "https://old.example/o", "file": pdf_field,
        }),
        env("https://plain.example/p", "2024-05-30", {
            "id": "https://plain.example/p", "title": "no attachments",
        }),
    ]
    df = spark.createDataFrame(rows, "id string, modified string, raw_value string")
    conv = Converter()
    out = AT.extract_attachments(
        df, conv, pdf_days_limit=30, now=NOW
    )
    got = {r["id"]: r for r in out.collect()}
    # fixed at_download url failed → unfixed @@download retried and won
    assert got["https://www.eea.europa.eu/publications/r"]["pdf_text"] == (
        "text-of publications"
    )
    assert got["https://www.eea.europa.eu/publications/r"]["pdf_errors"] == []
    assert got["https://old.example/o"]["pdf_text"] == ""  # age-guarded
    assert got["https://plain.example/p"]["pdf_text"] == ""
    assert out.columns[-2:] == ["pdf_text", "pdf_errors"]


def test_extract_stage_records_errors(spark):
    bad_field = {
        "content-type": "application/pdf",
        "download": "https://always-broken/at_download/x",
        "filename": "b.pdf",
    }
    df = spark.createDataFrame(
        [("https://s/d", "2024-05-30", json.dumps({"id": "https://s/d", "file": bad_field}))],
        "id string, modified string, raw_value string",
    )

    def broken(url):
        raise OSError("down")

    row = AT.extract_attachments(df, broken, now=NOW).collect()[0]
    assert row["pdf_text"] == ""
    assert len(row["pdf_errors"]) == 1 and row["pdf_errors"][0].startswith("pdf:")


def test_run_sync_with_converter_flows_pdf_text(spark, tmp_path):
    """e2e: attachment text reaches the searchui doc's fulltext."""
    from eea_crawler_spark.pipeline import SyncConfig, SyncPaths, run_sync

    site_url = "https://stub.example"
    doc_id = f"{site_url}/report"

    def site(url):
        if "@search" in url:
            if "b_start=0" not in url:
                return 200, json.dumps({"items": [], "batching": {}})
            return 200, json.dumps(
                {"items": [{"@id": doc_id, "@type": "Document",
                            "modified": "2024-01-01"}], "batching": {}}
            )
        return 200, json.dumps(
            {
                "id": doc_id, "@id": doc_id, "title": "Report",
                "language": "en", "review_state": "published",
                "file": {
                    "content-type": "application/pdf",
                    "download": f"{doc_id}/@@download/file",
                    "filename": "r.pdf",
                },
            }
        )

    def converter(url):
        return 200, json.dumps(
            {"documents": [{"text": "EXTRACTED ATTACHMENT BODY"}]}
        )

    paths = SyncPaths(
        raw=str(tmp_path / "raw"),
        searchui=str(tmp_path / "searchui"),
        quarantine=str(tmp_path / "quarantine"),
        status=str(tmp_path / "status"),
    )
    r = run_sync(
        spark, SyncConfig(site_url=site_url, site_id="eea"), paths, site,
        converter=converter,
    )
    assert r["fetched"] == 1
    row = spark.read.parquet(paths.searchui).collect()[0]
    assert "EXTRACTED ATTACHMENT BODY" in row["fulltext"]
