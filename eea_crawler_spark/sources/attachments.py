"""Attachment text extraction (S7): PDF/Word → pdf_text as a stage.

Reference behavior (dags/lib/plone_rest_api.py:261-390):

  - a raw-doc value is a **file field** when it is a dict whose keys
    cover {content-type, download, filename} (:261-271);
  - extraction applies to ``application/pdf`` plus three Word MIME
    types (:280-284), gated by the ``extract_pdf`` flag;
  - ``report_pdf`` docs also extract every ``items[]`` child of
    @type File via ``<id>/@@download/file`` (:297-315);
  - download URLs on the classic EEA site (non-/en/ paths) swap
    ``@@download`` → ``at_download`` unless the URL is a pdfStatic
    rendition (:274-277); on converter failure the unfixed URL is
    retried (:336-344);
  - the converter service returns ``{"documents": [{"text": …}]}``;
    fragments are stripped and newline-joined (:345-350);
  - **age guard** (:365-382): with ``pdf_days_limit`` set, docs whose
    ``modified`` date is older than the limit skip extraction.

Spark shape: one ``mapInPandas`` stage over the raw envelopes — the
converter call is the only I/O and rides the same Transport seam as
every fetch stage (inject a stub in tests, an HTTP client in prod).
Failures land in the row's ``errors`` array, never failing the row.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from eea_crawler_spark.sources.acquire import Transport

FILE_FIELD_MARKERS = {"content-type", "download", "filename"}

CONTENT_TYPES_TO_EXTRACT = [
    "application/pdf",
    "application/msword",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "application/vnd.ms-word.document.macroEnabled.12",
]


def is_file_field(value) -> bool:
    """FIELD_MARKERS check (plone_rest_api.py:261-271)."""
    return isinstance(value, dict) and set(value.keys()) >= FILE_FIELD_MARKERS


def fix_download_url(download_url: str, source_url: str) -> str:
    """Classic-EEA download rewrite (plone_rest_api.py:274-277)."""
    if (
        "www.eea.europa.eu" in source_url
        and "en" not in source_url.split("/")
        and not download_url.endswith("@@download/pdfStatic")
    ):
        return download_url.replace("@@download", "at_download")
    return download_url


def within_age_limit(
    modified: str | None, pdf_days_limit: int, now: datetime
) -> bool:
    """Age guard (plone_rest_api.py:365-382): limit 0 = always extract;
    unparseable/missing date = extract (reference only skips on a
    positive, parsed delta over the limit)."""
    if pdf_days_limit <= 0 or not modified:
        return True
    try:
        mod = datetime.strptime(modified.split("T")[0], "%Y-%m-%d")
    except ValueError:
        return True
    return (now - mod).days <= pdf_days_limit


def attachment_urls(doc: dict) -> list[str]:
    """Download URLs for every extractable attachment of one raw doc:
    file fields with an allowed content type, plus report_pdf File
    children (plone_rest_api.py:297-343). URL fix applied; the unfixed
    URL is the retry fallback handled by the stage."""
    url = doc.get("id") or doc.get("@id") or ""
    out = []
    if doc.get("@type") == "report_pdf":
        for item in doc.get("items", []):
            if isinstance(item, dict) and item.get("@type") == "File":
                out.append(f"{item.get('@id')}/@@download/file")
    for value in doc.values():
        if is_file_field(value) and value.get("content-type") in CONTENT_TYPES_TO_EXTRACT:
            out.append(fix_download_url(value["download"], url))
    return out


def _converter_text(converter: Transport, download_url: str) -> str:
    status, body = converter(download_url)
    if status != 200:
        raise RuntimeError(f"converter:{status}")
    resp = json.loads(body) if isinstance(body, str) else body
    return "\n".join(d["text"].strip() for d in resp["documents"])


EXTRACT_FIELDS = [
    T.StructField("pdf_text", T.StringType()),
    T.StructField("pdf_errors", T.ArrayType(T.StringType())),
]


def extract_attachments(
    df: DataFrame,
    converter: Transport,
    pdf_days_limit: int = 0,
    raw_col: str = "raw_value",
    modified_col: str = "modified",
    now: datetime | None = None,
) -> DataFrame:
    """The stage: adds ``pdf_text`` (+ ``pdf_errors``) to raw envelopes.

    Per row: age guard → attachment URL discovery over the parsed raw
    JSON → converter call per URL with the reference's retry-unfixed
    fallback; fragment texts newline-joined. Pure function of
    (row, converter), so it distributes as mapInPandas.
    """
    now = now or datetime.now()
    out_schema = T.StructType(list(df.schema.fields) + EXTRACT_FIELDS)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, errs = [], []
            for raw, modified in zip(pdf[raw_col], pdf.get(modified_col, [None] * len(pdf))):
                fragments: list[str] = []
                row_errs: list[str] = []
                try:
                    doc = json.loads(raw) if isinstance(raw, str) else (raw or {})
                except ValueError:
                    doc = {}
                if doc and within_age_limit(modified, pdf_days_limit, now):
                    for u in attachment_urls(doc):
                        try:
                            fragments.append(_converter_text(converter, u))
                        except Exception:  # noqa: BLE001 — retry unfixed url
                            try:
                                # undo the at_download rewrite (:336-344)
                                fallback = u.replace("at_download", "@@download")
                                fragments.append(
                                    _converter_text(converter, fallback)
                                )
                            except Exception as ex:  # noqa: BLE001
                                row_errs.append(
                                    f"pdf:{type(ex).__name__}:{u}"
                                )
                texts.append("\n".join(f for f in fragments if f))
                errs.append(row_errs)
            pdf = pdf.copy()
            pdf["pdf_text"] = texts
            pdf["pdf_errors"] = errs
            yield pdf

    return df.mapInPandas(_run, schema=out_schema)
