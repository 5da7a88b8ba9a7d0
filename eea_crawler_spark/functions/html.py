"""HTML main-text extraction as a distributed stage (T14's html leg).

Reference behavior (dags/normalizers/lib/trafilatura_extract.py:66-131):

  1. optional ``main_by_css_selector`` narrows to the main content
     element (selector miss → empty text, :81-90);
  2. ``remove_by_selector`` pre-clean drops chrome elements (:91-104);
  3. ``skip_extract_with_trafilatura`` → plain leaf-text join
     (:106-117, collect_leaf_elements_text :160-185);
  4. else trafilatura.extract(favor_recall=True) (:119-123);
  5. title = ``<title>`` text else config fallback (:126-131).

Spark shape: extraction is a pure function of (html, config), so it
runs as an Arrow-batched ``mapInPandas`` stage — per-partition Python,
no state, linear scale-out. trafilatura/lxml are optional imports
(absent in this container); the fallback is a stdlib-parser pipeline
implementing the same steps with a minimal selector dialect
(``tag`` / ``.class`` / ``#id``), which also serves as the
``skip_extract_with_trafilatura`` path verbatim.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in the test container
    import lxml.html as _lxml_html
    import trafilatura as _trafilatura
except Exception:  # noqa: BLE001
    _lxml_html = None
    _trafilatura = None

_SKIP_CONTENT = {"script", "style", "noscript", "template"}


@dataclass
class _Node:
    tag: str
    attrs: dict[str, str] = field(default_factory=dict)
    # document-ordered mix of text fragments and child nodes — the
    # stdlib stand-in for lxml's text/tail interleaving
    content: list["str | _Node"] = field(default_factory=list)

    @property
    def children(self) -> list["_Node"]:
        return [c for c in self.content if isinstance(c, _Node)]

    @property
    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())


class _TreeBuilder(HTMLParser):
    """Minimal DOM for the fallback path (stdlib only)."""

    _VOID = {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "source", "track", "wbr",
    }

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs))
        self.stack[-1].content.append(node)
        if tag not in self._VOID:
            self.stack.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        self.stack[-1].content.append(data)


def _parse(html: str) -> _Node:
    b = _TreeBuilder()
    b.feed(html)
    return b.root


def _matches(node: _Node, selector: str) -> bool:
    selector = selector.strip()
    if selector.startswith("."):
        return selector[1:] in node.classes
    if selector.startswith("#"):
        return node.attrs.get("id") == selector[1:]
    return node.tag == selector


def _select(root: _Node, selector: str) -> list[_Node]:
    out: list[_Node] = []

    def walk(n: _Node) -> None:
        for c in n.children:
            if _matches(c, selector):
                out.append(c)
            walk(c)

    walk(root)
    return out


def _remove(root: _Node, selector: str) -> None:
    def walk(n: _Node) -> None:
        n.content = [
            c
            for c in n.content
            if not (isinstance(c, _Node) and _matches(c, selector))
        ]
        for c in n.children:
            walk(c)

    walk(root)


def _leaf_text(node: _Node, collected: list[str]) -> None:
    """collect_leaf_elements_text twin (trafilatura_extract.py:160-185):
    document-order text fragments (text/tail interleaving preserved),
    stripped, content of script/style skipped."""
    if node.tag in _SKIP_CONTENT:
        return
    for part in node.content:
        if isinstance(part, _Node):
            _leaf_text(part, collected)
        else:
            s = part.strip()
            if s:
                collected.append(s)


def _find_title(root: _Node) -> str | None:
    hits = _select(root, "title")
    if not hits:
        return None
    texts = [p for p in hits[0].content if isinstance(p, str)]
    return " ".join(" ".join(texts).split()) or None


def extract_text(html: str | None, config: dict | None = None) -> str:
    """Pure extraction function — the unit run inside the stage."""
    config = config or {}
    if not html:
        return html or ""

    if _trafilatura is not None and _lxml_html is not None:  # pragma: no cover
        e = _lxml_html.fromstring(html)
        sel = config.get("main_by_css_selector")
        if sel:
            matches = e.cssselect(sel)
            if not matches:
                return ""
            e = matches[0]
        for selector in config.get("remove_by_selector", []):
            for el in e.cssselect(selector):
                try:
                    el.getparent().remove(el)
                except Exception:  # noqa: BLE001
                    pass
        if config.get("skip_extract_with_trafilatura"):
            return " ".join(" ".join(e.itertext()).split())
        return _trafilatura.extract(_lxml_html.tostring(e), favor_recall=True) or ""

    # stdlib fallback: same step order, leaf-text extraction
    root = _parse(html)
    sel = config.get("main_by_css_selector")
    if sel:
        hits = _select(root, sel)
        if not hits:
            return ""  # reference: selector miss → empty (:86-90)
        root = hits[0]
    for selector in config.get("remove_by_selector", []):
        _remove(root, selector)
    parts: list[str] = []
    _leaf_text(root, parts)
    return " ".join(parts)


def extract_title(html: str | None, fallback: str | None = None) -> str | None:
    """get_title_from_html twin (trafilatura_extract.py:126-131)."""
    if not html:
        return fallback
    try:
        if _lxml_html is not None:  # pragma: no cover
            t = _lxml_html.fromstring(html).find(".//title")
            return t.text if t is not None else fallback
        return _find_title(_parse(html)) or fallback
    except Exception:  # noqa: BLE001
        return fallback


EXTRACTED_FIELDS = [
    T.StructField("extracted_text", T.StringType()),
    T.StructField("html_title", T.StringType()),
]


def extract_html_columns(
    df: DataFrame,
    config: dict | None = None,
    html_col: str = "web_html",
) -> DataFrame:
    """The stage: adds ``extracted_text`` + ``html_title`` via
    ``mapInPandas``. Config (selectors, fallback title) is captured in
    the closure — broadcast once per task, like the reference's per-site
    scrape config."""
    cfg = dict(config or {})
    fallback_title = cfg.get("fallback_title")
    out_schema = T.StructType(list(df.schema.fields) + EXTRACTED_FIELDS)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            htmls = pdf[html_col]
            pdf = pdf.copy()
            pdf["extracted_text"] = [extract_text(h, cfg) for h in htmls]
            pdf["html_title"] = [extract_title(h, fallback_title) for h in htmls]
            yield pdf

    return df.mapInPandas(_run, schema=out_schema)


def extract_text_column(config: dict | None = None):
    """Column form of :func:`extract_text` — an Arrow-batched pandas
    UDF so the trafilatura-style extraction can sit INSIDE the
    normalize chain's fulltext expression (T14's scrape leg,
    reference normalizers.py:260-295) without breaking the chain's
    single-plan shape. NULL html stays NULL (the chain's fallback to
    joined text fields must fire, same as the reference's
    ``if not downloaded`` branch)."""
    from pyspark.sql.functions import pandas_udf

    cfg = dict(config or {})

    @pandas_udf(T.StringType())
    def _extract(htmls: pd.Series) -> pd.Series:
        return pd.Series(
            [None if h is None else extract_text(h, cfg) for h in htmls]
        )

    return _extract
