"""Text-analysis column expressions (JVM-side, no Python UDFs).

Re-expresses the reference's text surface (cleanhtml
``dags/normalizers/lib/normalizers.py:210-216``, readingTime wordcount
``normalizers.py:285-291``, first-100-words ``normalizers.py:585-588``)
plus the training-data-pipeline extensions (language-ID heuristic,
quality scoring, token counting, document fingerprinting). Every helper
returns a Column built from built-in functions so the whole pipeline
stays inside WholeStageCodegen — no Arrow transfer, no Python in the
hot path.

Portability: each expression has a DuckDB-SQL twin in plans/extras.py;
only engine-portable primitives (length/replace/regexp/md5/LIKE) are
used so the oracle hash-compare is exact.
"""

from __future__ import annotations

import string

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish token pattern: runs of alphanumerics, or single non-space symbols.
TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

# Character-class counting is done with ``translate`` (per-char set
# lookup, codegen) instead of a regex: Java's regex engine costs ~1 µs+
# per char on class alternations — measured 22x slower than translate
# for the punctuation count at sf1, the whole reason text_quality ran
# 70x behind DuckDB at sf10. \x0b kept to match Java's \s exactly.
_ALNUM = string.ascii_uppercase + string.ascii_lowercase + string.digits
_WS = " \t\n\x0b\f\r"

# Tiny per-language function-word marker sets for the n-gram/stopword
# language heuristic. Deliberately small and deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "nicht", "ist"),
    "fr": ("le", "les", "et", "une", "est"),
    "es": ("el", "los", "que", "por", "una"),
    "zh": ("的", "是", "了", "在", "我"),
}
LANG_ORDER = ("en", "de", "fr", "es", "zh")

EN_STOPWORDS = ("the", "and", "of", "to", "in", "a", "is", "for", "on", "with")


def clean_html(col: Column) -> Column:
    """Strip HTML tags (reference cleanhtml, normalizers.py:210-216)."""
    return F.regexp_replace(col, "<[^>]*>", "")


def normalize_ws(col: Column) -> Column:
    """Collapse whitespace runs, trim, lowercase — dedup canonical form."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def fingerprint(col: Column) -> Column:
    """Deterministic content fingerprint: md5 over the canonical form."""
    return F.md5(normalize_ws(col).cast("binary"))


def ws_wordcount(col: Column) -> Column:
    """Whitespace word count via length arithmetic (portable, codegen)."""
    return F.length(col) - F.length(F.replace(col, F.lit(" "), F.lit(""))) + 1


def regex_token_count(col: Column) -> Column:
    """BPE-ish token count: alnum runs + individual symbols.

    Same value as ``count(matches of TOKEN_RE))`` but decomposed — the
    alternation in TOKEN_RE forces per-char backtracking (measured 6x
    slower); counting the two branches separately keeps a trivial
    regex for the runs and a translate for the symbols. The DuckDB
    oracle keeps the literal TOKEN_RE form; values are pinned equal.
    """
    return F.regexp_count(col, F.lit(r"[A-Za-z0-9]+")) + punct_count(col)


def reading_time(col: Column, lang: Column, wpm: int = 228) -> Column:
    """readingTime (normalizers.py:289-291): words/228, -1 off-language."""
    return (
        F.when(lang == "en", F.round(ws_wordcount(col) / float(wpm), 4))
        .otherwise(F.lit(-1))
        .cast("double")
    )


def marker_hits_of_tokens(toks: Column, words: tuple[str, ...]) -> Column:
    """Marker count over an already-split token array.

    Value-identical to the padded-LIKE form (which the DuckDB oracle
    twin keeps): a marker w occurs as a standalone word ⟺
    ``' '+col+' ' LIKE '% w %'`` ⟺ ``w ∈ split(col, ' ')``, and both
    formulations count each marker at most once. One hash-probe
    ``array_intersect`` replaces ``len(words)`` full-string scans per
    row — callers that score several marker sets (langid: 5 languages)
    should split once in an inner projection and pass the array."""
    return F.size(
        F.array_intersect(toks, F.lit(list(words)))
    )


def marker_hits(col: Column, words: tuple[str, ...]) -> Column:
    """How many of the marker words occur (as standalone words)."""
    return marker_hits_of_tokens(F.split(col, " "), words)


def lang_scores_of_tokens(toks: Column) -> dict[str, Column]:
    return {
        lang: marker_hits_of_tokens(toks, LANG_MARKERS[lang])
        for lang in LANG_ORDER
    }


def lang_scores(col: Column) -> dict[str, Column]:
    return lang_scores_of_tokens(F.split(F.lower(col), " "))


def lang_id_from_scores(scores: dict[str, Column]) -> Column:
    """Argmax language with fixed priority order; 'und' when no marker
    hits. Callers should materialize the score columns in an inner
    projection first — each score feeds ``greatest`` plus two ``when``
    branches, and codegen CSE does not always reach across them."""
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def lang_id(col: Column) -> Column:
    """Argmax language with fixed priority order; 'und' when no marker hits."""
    return lang_id_from_scores(lang_scores(col))


def punct_count(col: Column) -> Column:
    """Chars outside [A-Za-z0-9\\s] — by deleting the complement set
    with ``translate`` (see _ALNUM note above; value-identical to the
    regexp_replace form the DuckDB twin uses, 22x faster)."""
    return F.length(F.translate(col, _ALNUM + _WS, ""))


def quality_columns(col: Column) -> dict[str, Column]:
    """Quality-scoring features: lengths, ratios, stopword density."""
    n_words = ws_wordcount(col)
    n_nonspace = F.length(F.replace(col, F.lit(" "), F.lit("")))
    stop_hits = marker_hits(F.lower(col), EN_STOPWORDS)
    return {
        "n_chars": F.length(col),
        "n_words": n_words,
        "avg_word_len": F.round(n_nonspace.cast("double") / n_words, 4),
        "punct_ratio": F.round(punct_count(col).cast("double") / F.length(col), 4),
        "stop_hits": stop_hits,
    }


def quality_label(cols: dict[str, Column]) -> Column:
    """Deterministic keep/low-quality verdict from the feature columns."""
    ok = (
        (cols["n_words"] >= 5)
        & (cols["n_words"] <= 100000)
        & (cols["avg_word_len"] >= 2.0)
        & (cols["avg_word_len"] <= 12.0)
        & (cols["punct_ratio"] <= 0.2)
    )
    return F.when(ok, F.lit("ok")).otherwise(F.lit("low"))


def first_n_words(col: Column, n: int = 100) -> Column:
    """First-100-words fallback description (normalizers.py:585-588)."""
    return F.array_join(F.slice(F.split(col, " "), 1, n), " ")


def word_chunks(col: Column, words: int = 250, overlap: int = 50) -> Column:
    """Overlapping word-window chunks (reference NLP split: 250 words,
    overlap 50 — dags/variables.json:2791-2792, nlp.py:65-96).

    Pure expression (split → sequence → slice → array_join): stride =
    words - overlap; chunk i covers words [i*stride+1, i*stride+words].
    Chunk count = (n - words + stride - 1) div stride + 1 for n > words,
    else 1 — integer arithmetic only, so the DuckDB oracle can restate
    it verbatim. Narrow per-row compute: scales with input splits.
    """
    stride = words - overlap
    return word_chunks_of_array(F.split(col, " "), words, overlap)


def word_chunks_of_array(w: Column, words: int = 250, overlap: int = 50) -> Column:
    """``word_chunks`` over an already-split word array. Callers that
    can materialize the split in an inner projection should (codegen
    CSE does not reach inside the transform lambda, so an inline split
    re-evaluates once per chunk)."""
    stride = words - overlap
    n = F.size(w)
    n_chunks = F.when(
        n > words, ((n - words + (stride - 1)) / stride).cast("long") + 1
    ).otherwise(F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.array_join(F.slice(w, i * stride + 1, words), " "),
    )


# ---- T12 dynamic-key text discovery (join_text_fields) -------------------

_TAG_RE = __import__("re").compile("<[^>]*>")


def join_text_fields_py(
    raw_json: str | None,
    txt_props: list[str],
    txt_props_black: list[str],
    include_title: bool = True,
) -> str:
    """The reference's join_text_fields (normalizers.py:162-207) as a
    pure function: title first, then the ordered explicit props (dict
    props read ``.data``, html stripped), then every *discovered* dict
    field whose content-type is text/plain or text/html — dynamic keys
    a fixed-schema plan cannot see, which is why this leg is Python
    (SURVEY §7.3 hard part). Sentence-dot normalization and redundant-
    fragment suppression (substring check) kept verbatim.
    """
    import json as _json

    try:
        doc = _json.loads(raw_json) if raw_json else {}
    except ValueError:
        doc = {}
    if not isinstance(doc, dict):
        doc = {}

    def cleanhtml(s: str) -> str:
        return _TAG_RE.sub("", s or "")

    text = ""
    title = doc.get("title", "no title") or "no title"
    if include_title:
        text += "\n\n" + title + ".\n\n"
    for prop in txt_props:
        prop_v = doc.get(prop, {})
        txt = cleanhtml(prop_v.get("data", "")) if isinstance(prop_v, dict) else cleanhtml(prop_v or "")
        if len(txt) and not txt.endswith("."):
            txt = txt + "."
        if len(txt) and txt not in text:
            text = text + txt + "\n\n"
    for k, v in doc.items():
        if isinstance(v, dict) and k not in txt_props_black:
            txt = ""
            mime = v.get("content-type", "")
            if mime == "text/plain":
                txt = v.get("data", "")
            elif mime == "text/html":
                txt = cleanhtml(v.get("data", ""))
            if len(txt) and txt not in text:
                if not txt.endswith("."):
                    txt = txt + "."
                text = text + "\n\n" + txt + "\n\n"
    return text


def join_text_fields_dynamic(
    raw_col: Column,
    txt_props: list[str],
    txt_props_black: list[str],
) -> Column:
    """Arrow-batched column form of ``join_text_fields_py`` — config
    rides the closure, one Python stage, no shuffle."""
    from pyspark.sql.functions import pandas_udf

    props, black = list(txt_props), list(txt_props_black)

    @pandas_udf("string")
    def _join(raw: pd.Series) -> pd.Series:
        return pd.Series(
            [join_text_fields_py(r, props, black) for r in raw]
        )

    return _join(raw_col)
