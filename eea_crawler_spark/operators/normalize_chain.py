"""The common_normalizer chain as one generated Catalyst plan.

Reproduces the semantics and *order* of the reference's canonical
normalize pipeline (``dags/normalizers/lib/normalizers.py:496-607``,
order documented in SURVEY.md §2.5): flatten → value maps → normObj →
normProp renames → normObj again (renamed fields get value-normalized
too, the reference's double application at normalizers.py:550-552 and
581-583) → default fill → array hygiene → domain enrichments → fulltext
→ counts → proplist projection.

Everything is column expressions over a fixed envelope schema; the
chain builds ONE DataFrame plan (no intermediate actions), so Catalyst
sees the whole pipeline and prunes/pushes across every step. Per-site
plugins compose on top by transforming the returned DataFrame further
(see sites.py); dispatch is a union of per-site plans, not one
mega-WHEN-chain, to keep plan size linear in the site count
(SURVEY.md §7.3).

Scale: the chain is narrow (zero shuffles) — it scales embarrassingly
with input splits. Config maps ride along as expression literals
(constant-folded); only genuinely large taxonomies should become
broadcast dimension joins (J6) instead.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eea_crawler_spark.functions import normalize as N
from eea_crawler_spark.functions import text as TX

# Envelope schema: typed columns from prepare_doc_for_rabbitmq
# (crawl_plone_restapi.py:201-227) with raw_value kept as a JSON string
# (schema-less semantics; parsed lazily below). See FIXTURES.md §2.1.
RAW_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("doc_type", T.StringType()),
        T.StructField("raw_value", T.StringType()),
        T.StructField("web_html", T.StringType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("pdf_text", T.StringType()),
        T.StructField("original_id", T.StringType()),
        T.StructField("site_id", T.StringType()),
        T.StructField("errors", T.ArrayType(T.StringType())),
        T.StructField("modified", T.StringType()),
        T.StructField("site", T.StringType()),
        T.StructField("indexed_at", T.TimestampType()),
    ]
)

# Declared schema for the raw_value JSON blob (FIXTURES.md §2.7). Fields
# absent from a document parse as NULL — matching the reference's
# missing-key handling after remove_empty (SURVEY.md §7.3 absent-vs-null).
RAW_VALUE_DDL = """
    STRUCT<
      `@id`: STRING,
      `@type`: STRING,
      `UID`: STRING,
      title: STRING,
      description: STRING,
      language: STRING,
      language_token: STRING,
      review_state: STRING,
      expires: STRING,
      created: STRING,
      effective: STRING,
      themes: ARRAY<STRING>,
      subjects: ARRAY<STRING>,
      format: ARRAY<STRING>,
      object_provides: ARRAY<STRING>,
      taxonomy_themes: ARRAY<STRUCT<token: STRING, title: STRING>>,
      geo_coverage: STRUCT<geolocation: ARRAY<STRUCT<label: STRING>>>,
      temporal_coverage: STRUCT<temporal: ARRAY<STRUCT<label: STRING>>>,
      location: STRING,
      publishers: ARRAY<STRING>,
      image: STRUCT<scales: STRUCT<icon: STRUCT<download: STRING>,
                                   preview: STRUCT<download: STRING>>>,
      file: STRUCT<`content-type`: STRING, download: STRING,
                   filename: STRING, size: BIGINT>,
      parent: STRUCT<`@type`: STRING, title: STRING,
                     review_state: STRING, description: STRING>
    >
"""


@dataclass
class NormalizerConfig:
    """The config shape of default_normalizers/sdi_normalizers
    (dags/variables.json:1666-1972, 5606-5671), engine-neutral."""

    black_map: dict[str, list[str]] = field(default_factory=dict)
    white_map: dict[str, list[str]] = field(default_factory=dict)
    norm_obj: dict[str, str] = field(default_factory=dict)
    # one-to-many renames: source column -> output columns
    norm_prop: dict[str, list[str]] = field(default_factory=dict)
    # default fill; value "field:<col>" copies another column; values may
    # be typed (0, -1, []) — the reference's normMissing carries all of
    # these (variables.json:1676-1698)
    norm_missing: dict[str, object] = field(default_factory=dict)
    proplist: list[str] = field(default_factory=list)
    # ES-mapping null_value defaults (variables.json:2313,2336,2531).
    # The reference's remove_empty (normalizers.py:130-145) strips
    # whole-null / empty fields before indexing, so in practice ES only
    # ever substitutes null *elements inside present arrays* — the chain
    # stage mirrors exactly that (see _apply_null_values).
    null_values: dict[str, str] = field(default_factory=dict)
    # Reference projection/fill semantics: (a) get_attrs_to_delete
    # snapshots the doc's keys BEFORE the chain mutates it
    # (normalizers.py:530-533), so fields *added* by normalization
    # survive the proplist projection even when unlisted; (b)
    # apply_norm_missing ADDS missing keys (normalizers.py:90-102),
    # not just fills present-but-null ones. Off by default (the compact
    # engine default keeps a strict proplist projection).
    reference_mode: bool = False
    # marker interfaces whitelist for merge_types (normalizers.py:329-345)
    interfaces_whitelist: list[str] = field(default_factory=list)
    theme_labels: dict[str, str] = field(default_factory=dict)
    count_fields: list[str] = field(default_factory=list)
    # T12 dynamic-key discovery (join_text_fields, normalizers.py:162-207):
    # ordered explicit text props + blacklist for the auto-discovered
    # text/plain|text/html dict fields of raw_value. None = off (fulltext
    # falls back to the pure-column title/description join).
    txt_props: list[str] | None = None
    txt_props_black: list[str] = field(default_factory=list)
    # A8 recursive provenance collection over raw_value (find_all /
    # get_data_provenance, normalizers.py:424-471) — opt-in Python stage
    collect_provenance: bool = False
    # T14 scrape leg: when set, fulltext's html branch runs the
    # trafilatura-style extraction (functions/html.py, reference
    # trafilatura_extract.py:66-131) with this site config
    # (main_by_css_selector / remove_by_selector /
    # skip_extract_with_trafilatura) as an Arrow-batched pandas UDF
    # instead of the tag-strip expression. None = expression path.
    html_extract: dict | None = None

    @classmethod
    def from_tables(
        cls,
        table: dict,
        *,
        theme_labels: dict[str, str] | None = None,
        null_values: dict[str, str] | None = None,
        reference_mode: bool = True,
        **overrides,
    ) -> "NormalizerConfig":
        """Build a config from the reference's normalizer-table shape
        (camelCase keys, ``dags/variables.json:1666-1972``).

        The table is treated as read-only — the ``"//"`` comment entry
        is skipped, never popped (loaders cache and share the dict).
        ``normProp`` string values are coerced to single-element lists
        (the reference coerces lazily in apply_norm_prop,
        normalizers.py:83-84 — by mutating its config in place, which
        this port deliberately does not). ``normMissing`` values pass
        through typed (``0``, ``-1``, ``[]`` and ``field:`` strings all
        occur in production config).
        """
        norm_prop = {
            src: ([tgt] if isinstance(tgt, str) else list(tgt))
            for src, tgt in (table.get("normProp") or {}).items()
        }
        return cls(
            black_map={k: list(v) for k, v in (table.get("blackMap") or {}).items()},
            white_map={k: list(v) for k, v in (table.get("whiteMap") or {}).items()},
            norm_obj=dict(table.get("normObj") or {}),
            norm_prop=norm_prop,
            norm_missing=dict(table.get("normMissing") or {}),
            proplist=list(table.get("proplist") or []),
            theme_labels=dict(theme_labels or {}),
            null_values=dict(null_values or {}),
            reference_mode=reference_mode,
            **overrides,
        )


def _is_array(df: DataFrame, name: str) -> bool:
    return isinstance(df.schema[name].dataType, T.ArrayType)


def parse_raw(df: DataFrame) -> DataFrame:
    """T1 flatten: parse raw_value and lift nested fields to dotted
    top-level columns (simplify_elements, normalizers.py:219-236).

    The parsed struct is materialized by an INNER projection (round-13
    optimization, guide §1.2/§4): referencing
    ``from_json(raw_value)[field]`` once per lifted column lets
    Catalyst's per-field schema pruning (OptimizeCsvJsonExprs) rewrite
    each access into its OWN ``from_json`` with a one-field schema —
    the declared-query plan showed seven full JSON parses of
    ``raw_value`` per row, and the production proplist lifts ~25
    fields. The alias is non-cheap and referenced by every lifted
    column, so CollapseProject keeps the boundary and the document
    parses exactly once; field extraction from the materialized struct
    is codegen struct access. Same trick as shingle_arrays' inner
    ``split`` materialization."""
    inner = df.select(
        "*", F.from_json(F.col("raw_value"), RAW_VALUE_DDL).alias("__p")
    )
    p = F.col("__p")
    return inner.select(
        "id",
        "doc_type",
        "site_id",
        "site",
        "status_code",
        "errors",
        "modified",
        "indexed_at",
        "pdf_text",
        "web_html",
        # kept for the T12 dynamic-key discovery leg (dropped by the
        # proplist projection at the end of the chain)
        "raw_value",
        p["title"].alias("title"),
        p["description"].alias("description"),
        p["language"].alias("language"),
        p["language_token"].alias("language_token"),
        p["review_state"].alias("review_state"),
        p["expires"].alias("expires"),
        p["created"].alias("created"),
        p["effective"].alias("effective"),
        p["themes"].alias("themes"),
        p["subjects"].alias("subjects"),
        p["format"].alias("format"),
        p["object_provides"].alias("object_provides"),
        F.transform(p["taxonomy_themes"], lambda x: x["token"]).alias("taxonomy_tokens"),
        p["geo_coverage"]["geolocation"].alias("geolocation"),
        p["temporal_coverage"]["temporal"].alias("temporal"),
        p["location"].alias("location"),
        p["publishers"].alias("publishers"),
        p["image"]["scales"]["icon"]["download"].alias("image.scales.icon.download"),
        p["image"]["scales"]["preview"]["download"].alias("image.scales.preview.download"),
        p["file"]["content-type"].alias("file.content-type"),
        p["parent"]["review_state"].alias("parent.review_state"),
        p["parent"]["title"].alias("parent.title"),
        p["parent"]["description"].alias("parent.description"),
    )


def _apply_value_maps(df: DataFrame, cfg: NormalizerConfig) -> DataFrame:
    """T2/T3 per-field black/white maps (normalizers.py:14-51)."""
    out: dict[str, Column] = {}
    for f_name, bl in cfg.black_map.items():
        if f_name in df.columns:
            c = F.col(f"`{f_name}`")
            out[f_name] = (
                N.black_map_array(c, bl) if _is_array(df, f_name) else N.black_map_scalar(c, bl)
            )
    for f_name, wl in cfg.white_map.items():
        if f_name in df.columns:
            c = out.get(f_name, F.col(f"`{f_name}`"))
            out[f_name] = (
                N.white_map_array(c, wl) if _is_array(df, f_name) else N.white_map_scalar(c, wl)
            )
    return df.withColumns(out) if out else df


def _apply_norm_obj(df: DataFrame, cfg: NormalizerConfig) -> DataFrame:
    """T4: global value rewrite over every string-ish column
    (normalizers.py:54-73 walks all doc fields)."""
    if not cfg.norm_obj:
        return df
    out: dict[str, Column] = {}
    # ONE map literal shared by every column's lookup (round-13): the
    # expression tree is immutable, and rebuilding it per column paid
    # ~2 py4j roundtrips per map entry per column at plan-build time
    m = N.map_literal(cfg.norm_obj)
    for f_spec in df.schema.fields:
        c = F.col(f"`{f_spec.name}`")
        if isinstance(f_spec.dataType, T.StringType):
            out[f_spec.name] = N.norm_obj_scalar(c, m)
        elif isinstance(f_spec.dataType, T.ArrayType) and isinstance(
            f_spec.dataType.elementType, T.StringType
        ):
            out[f_spec.name] = N.norm_obj_array(c, m)
    return df.withColumns(out)


def _apply_norm_prop(df: DataFrame, cfg: NormalizerConfig) -> DataFrame:
    """T5 renames incl. one-to-many (normalizers.py:76-87): emit every
    target as an alias of the source; untargeted columns pass through."""
    if not cfg.norm_prop:
        return df
    renamed_away = {s for s, targets in cfg.norm_prop.items() if s not in targets}
    cols: list[Column] = []
    for f_spec in df.schema.fields:
        if f_spec.name not in renamed_away:
            cols.append(F.col(f"`{f_spec.name}`"))
    for src, targets in cfg.norm_prop.items():
        if src not in df.columns:
            continue
        for tgt in targets:
            if tgt != src:
                cols.append(F.col(f"`{src}`").alias(tgt))
    return df.select(*cols)


def _default_lit(default, col_type: T.DataType | None = None) -> Column:
    """A typed literal for a normMissing default (0, -1, [], "", str),
    adapted to the target column's type when filling an existing column
    (the reference's dicts are untyped — "text/html" on the list-typed
    ``format`` is production config; a typed engine wraps the scalar)."""
    if isinstance(default, list):
        lit = (
            F.array().cast("array<string>")
            if not default
            else F.lit(list(default))
        )
        return lit.cast(col_type) if isinstance(col_type, T.ArrayType) else lit
    lit = F.lit(default)
    if isinstance(col_type, T.ArrayType):
        return F.array(lit.cast(col_type.elementType))
    if col_type is not None:
        # adapt to the existing column's type: otherwise coalesce()
        # unifies the pair upward (string col + int default → bigint)
        # and silently retypes stored values ('0' → 0)
        return lit.cast(col_type)
    return lit


def _apply_norm_missing(df: DataFrame, cfg: NormalizerConfig) -> DataFrame:
    """T6 default fill with field: indirection (normalizers.py:90-102).

    Engine-default placement (post-rename): fills present-but-null
    columns only. Under ``reference_mode`` this stage is a no-op here —
    the reference applies norm_missing AFTER the geo/temporal/places
    enrichments (normalizers.py:585-603 ordering), and its
    ``clean_data.get(key) is None`` check treats missing and null
    identically, so the reference-mode twin runs later in the chain
    (see ``_apply_norm_missing_reference``)."""
    if cfg.reference_mode:
        return df
    out: dict[str, Column] = {}
    for f_name, default in cfg.norm_missing.items():
        if f_name not in df.columns:
            continue
        c = F.col(f"`{f_name}`")
        if isinstance(default, str) and default.startswith("field:"):
            other = default.split(":", 1)[1].strip()
            if other in df.columns:
                out[f_name] = N.norm_missing(c, None, F.col(f"`{other}`"))
        else:
            out[f_name] = N.norm_missing(c, default)
    return df.withColumns(out) if out else df


def _apply_norm_missing_reference(df: DataFrame, cfg: NormalizerConfig) -> DataFrame:
    """apply_norm_missing with full reference semantics
    (normalizers.py:90-102): runs after the enrichment stages, treats
    missing-or-null identically (``clean_data.get(key) is None``), ADDS
    absent keys, and copies via ``field:`` indirection. Placed before
    ``_fulltext`` so chain-computed readingTime/fulltext still win over
    their config defaults, as in the reference's step order."""
    out: dict[str, Column] = {}
    for f_name, default in cfg.norm_missing.items():
        exists = f_name in df.columns
        c = F.col(f"`{f_name}`") if exists else None
        if isinstance(default, str) and default.startswith("field:"):
            other = default.split(":", 1)[1].strip()
            if other in df.columns:
                other_c = F.col(f"`{other}`")
                out[f_name] = F.coalesce(c, other_c) if exists else other_c
            # other column missing too: reference sets None (≡ absent)
        else:
            lit = _default_lit(default, df.schema[f_name].dataType if exists else None)
            out[f_name] = F.coalesce(c, lit) if exists else lit
    return df.withColumns(out) if out else df


def _array_hygiene(df: DataFrame) -> DataFrame:
    """T7 dedup / T8 extra-webpage removal / T9 null-out empties /
    T10 trim, over every column of matching type."""
    out: dict[str, Column] = {}
    for f_spec in df.schema.fields:
        c = F.col(f"`{f_spec.name}`")
        if isinstance(f_spec.dataType, T.ArrayType) and isinstance(
            f_spec.dataType.elementType, T.StringType
        ):
            expr = N.dedup_array(c)
            if f_spec.name == "objectProvides":
                expr = N.remove_extra_value(expr, "Webpage")
            out[f_spec.name] = N.null_if_empty_array(expr)
        elif isinstance(f_spec.dataType, T.StringType):
            out[f_spec.name] = N.null_if_empty_string(F.trim(c))
    return df.withColumns(out)


def _enrich(df: DataFrame, cfg: NormalizerConfig) -> DataFrame:
    """Domain enrichments T11 T15-T21 T23 (presence-guarded)."""
    out: dict[str, Column] = {}
    cols = set(df.columns)
    if "spatial" not in cols and "geolocation" in cols:
        out["spatial"] = N.labels_of(F.col("geolocation"))  # T16
    if "temporal" in cols:
        out["time_coverage"] = N.labels_of(F.col("temporal"))  # T16
    if "location" in cols:
        out["locations"] = N.geojson_titles(F.col("location"))  # T15
    if "language" in cols:
        tok = F.col("language_token") if "language_token" in cols else F.lit(None)
        out["language"] = N.update_language(F.col("language"), tok)  # T18
    if {"doc_type", "review_state"} <= cols:
        parent = (
            F.col("`parent.review_state`")
            if "parent.review_state" in cols
            else F.lit(None)
        )
        out["review_state"] = N.fix_state(F.col("doc_type"), F.col("review_state"), parent)  # T19
        if "expires" in cols:
            out["expires"] = N.archived_expires(
                out["review_state"], F.col("expires")
            )  # T19 archived leg
    if {"format", "pdf_text"} <= cols:
        out["format"] = N.add_pdf_format(F.col("format"), F.col("pdf_text"))  # T20
    if {"themes", "taxonomy_tokens"} <= cols:
        out["themes"] = N.merge_themes(
            F.col("themes"), F.col("taxonomy_tokens"), cfg.theme_labels
        )  # T21
    if "objectProvides" in cols and "object_provides" in cols and cfg.interfaces_whitelist:
        # T17 "ensure array": objectProvides is a scalar when it was
        # renamed from @type (normalizers.py:329-345 wraps it in a list)
        op = F.col("objectProvides")
        if isinstance(df.schema["objectProvides"].dataType, T.StringType):
            op = F.when(op.isNotNull(), F.array(op)).otherwise(
                F.array().cast("array<string>")
            )
        out["objectProvides"] = N.merge_types(
            op,
            F.coalesce(F.col("object_provides"), F.array().cast("array<string>")),
            cfg.interfaces_whitelist,
        )  # T17
    if "publishers" in cols:
        out["publishers"] = N.canon_publishers(F.col("publishers"))  # T23
    df = df.withColumns(out) if out else df
    if "spatial" in df.columns and "places" not in df.columns:
        df = df.withColumn("places", F.col("spatial"))  # T11
    return df


def _fulltext(df: DataFrame, cfg: NormalizerConfig | None = None) -> DataFrame:
    """T12-T14: fulltext from html (tag-strip) else joined text fields,
    plus pdf_text; readingTime = words/228, -1 off-language.

    With ``cfg.txt_props`` set and raw_value present, the joined-text
    leg runs the reference's full dynamic-key discovery
    (join_text_fields, normalizers.py:162-207) as an Arrow-batched
    stage; otherwise it is the pure-column title/description join."""
    cols = set(df.columns)
    if cfg is not None and cfg.txt_props is not None and "raw_value" in cols:
        joined = F.trim(
            F.regexp_replace(
                TX.join_text_fields_dynamic(
                    F.col("raw_value"), cfg.txt_props, cfg.txt_props_black
                ),
                r"\s+",
                " ",
            )
        )
    else:
        fragments = [
            F.col(c)
            for c in ("title", "description")
            if c in cols
        ]
        joined = N.join_text_fields(fragments)
    if "web_html" not in cols:
        html_text = F.lit(None)
    elif cfg is not None and cfg.html_extract is not None:
        from eea_crawler_spark.functions.html import extract_text_column

        html_text = extract_text_column(cfg.html_extract)(F.col("web_html"))
    else:
        html_text = TX.clean_html(F.col("web_html"))
    base = F.when(
        html_text.isNotNull() & (F.length(F.trim(html_text)) > 0), F.trim(html_text)
    ).otherwise(joined)
    with_pdf = F.concat_ws(" ", base, F.col("pdf_text")) if "pdf_text" in cols else base
    df = df.withColumn("fulltext", with_pdf)
    lang = F.col("language") if "language" in cols else F.lit("en")
    return df.withColumn("readingTime", TX.reading_time(F.col("fulltext"), lang))


def _counts(df: DataFrame, cfg: NormalizerConfig) -> DataFrame:
    """A1: items_count_<f> for configured (or all) array fields."""
    targets = cfg.count_fields or [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.ArrayType)
    ]
    out = {
        f"items_count_{name}": N.items_count(F.col(f"`{name}`"))
        for name in targets
        if name in df.columns
    }
    return df.withColumns(out) if out else df


def _apply_null_values(df: DataFrame, cfg: NormalizerConfig) -> DataFrame:
    """ES-mapping ``null_value`` substitution, index-time semantics.

    The reference's remove_empty (normalizers.py:130-145) strips
    whole-null / empty-string / empty-list fields before the doc
    reaches Elasticsearch, so the mapping's ``null_value``
    (variables.json:2313,2336,2531) only ever fires on null *elements
    inside a present array* — remove_empty does not descend into lists.
    This stage mirrors exactly that: null elements of configured array
    columns become the default; whole-null columns (≡ removed/missing
    fields in the reference's dict representation, SURVEY §7.3) stay
    null, as ES never sees them at all."""
    if not cfg.null_values:
        return df
    out: dict[str, Column] = {}
    for f_name, default in cfg.null_values.items():
        if f_name not in df.columns:
            continue
        dt = df.schema[f_name].dataType
        if isinstance(dt, T.ArrayType):
            c = F.col(f"`{f_name}`")
            out[f_name] = F.when(
                c.isNotNull(),
                F.transform(c, lambda x: F.coalesce(x, F.lit(default))),
            )
    return df.withColumns(out) if out else df


def _project(
    df: DataFrame, cfg: NormalizerConfig, pre_cols: set[str] | None = None
) -> DataFrame:
    """P1 proplist projection (normalizers.py:239-252,531-533).

    With ``pre_cols`` (reference_mode): get_attrs_to_delete snapshots
    the key set BEFORE normalization mutates the doc, so only
    *pre-existing* non-proplist columns are dropped — everything the
    chain added (fulltext, readingTime, renames, counts, fills)
    survives even when unlisted."""
    if not cfg.proplist:
        return df
    if pre_cols is not None:
        keep = [
            c
            for c in df.columns
            if c in cfg.proplist or c not in pre_cols
        ]
    else:
        keep = [c for c in cfg.proplist if c in df.columns]
        keep += [
            c for c in df.columns if c.startswith("items_count_") and c not in keep
        ]
    return df.select(*[F.col(f"`{c}`") for c in keep])


# chain-build memo bound: distinct (schema, config) recipes per live
# session. Each recipe is a few hundred Column references; 64 covers
# every config this engine composes many times over while keeping a
# config-churning caller from growing the memo without limit.
_CHAIN_MEMO_MAX = 64


def _freeze(v):
    """Recursively hashable, VALUE-faithful form of a config tree
    (dicts/lists/scalars — everything NormalizerConfig holds). Keys the
    plan-build memo on field values directly instead of repr fidelity
    (round-13 ADVICE: a future field whose repr is identity-based would
    otherwise stale-replay)."""
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple, set)):
        items = sorted(v) if isinstance(v, set) else v
        return tuple(_freeze(x) for x in items)
    return v


class _Recorder:
    """Duck-typed DataFrame stand-in that RECORDS the chain's
    Dataset-level ops (select / withColumn / withColumns) while
    delegating them to the real DataFrame.

    Why (round-13 optimization, guide §1/§4 — the JVM boundary): one
    chain build issues ~6k py4j roundtrips constructing Column
    expression trees (measured 1.1–2.0 s of driver time per build at
    local[32] — larger than the sf0.1 job it plans). The trees depend
    only on (input schema, config) — both decide every stage's
    branches — and unresolved Columns are plain immutable JVM
    expression objects, reusable across DataFrames. So the first build
    per (session, schema, config) records its op sequence and later
    builds replay the prebuilt Columns: ~10× fewer roundtrips, the
    IDENTICAL logical plan (same objects, same order). This caches
    plan STRUCTURE only — never data, paths, or results; every replay
    still scans its own input."""

    __slots__ = ("_df", "_ops")

    def __init__(self, df: DataFrame, ops: list):
        self._df = df
        self._ops = ops

    @property
    def columns(self):
        return self._df.columns

    @property
    def schema(self):
        return self._df.schema

    @property
    def sparkSession(self):
        return self._df.sparkSession

    def _rec(self, name: str, *args) -> "_Recorder":
        self._ops.append((name, args))
        return _Recorder(getattr(self._df, name)(*args), self._ops)

    def select(self, *cols) -> "_Recorder":
        return self._rec("select", *cols)

    def withColumn(self, name: str, col: Column) -> "_Recorder":
        return self._rec("withColumn", name, col)

    def withColumns(self, colsMap: dict) -> "_Recorder":
        return self._rec("withColumns", colsMap)

    def filter(self, condition) -> "_Recorder":
        return self._rec("filter", condition)

    where = filter

    def drop(self, *cols) -> "_Recorder":
        return self._rec("drop", *cols)

    def withColumnRenamed(self, existing: str, new: str) -> "_Recorder":
        return self._rec("withColumnRenamed", existing, new)

    def __getattr__(self, name: str):
        # anything outside the recorded surface must fail LOUDLY at
        # first build (round-13 ADVICE): a silently-delegated Dataset op
        # would run once and be missing from every replay
        raise AttributeError(
            f"_Recorder does not intercept DataFrame.{name}; recorded "
            "plan-build memoization only supports select/withColumn/"
            "withColumns/filter/drop/withColumnRenamed (plus the "
            "columns/schema/sparkSession properties). Either express "
            f"the stage with those ops or add {name!r} to _Recorder."
        )


def common_normalizer(df: DataFrame, cfg: NormalizerConfig) -> DataFrame:
    """The full chain, in reference order (normalizers.py:496-607).

    Input: raw envelope rows (RAW_ENVELOPE_SCHEMA). Output: normalized
    searchui-shaped rows. One declarative plan; zero shuffles.

    Plan-build memo (see _Recorder): keyed by VALUE — (input schema,
    frozen ``dataclasses.asdict(cfg)``) per live session — so a mutated
    config simply keys a fresh recipe; stale replays are impossible by
    construction. The asdict freeze (round-13 ADVICE) keys on field
    VALUES directly rather than repr fidelity, and the memo is bounded
    (oldest-out) so a config-churning caller cannot grow it without
    limit. The memo dies with the session object (no cross-process
    state).
    """
    spark = df.sparkSession
    memo = spark.__dict__.setdefault("_eea_chain_memo", {})
    key = (
        tuple((f.name, f.dataType.simpleString()) for f in df.schema.fields),
        _freeze(dataclasses.asdict(cfg)),
    )
    ops = memo.get(key)
    if ops is not None:
        out = df
        for name, args in ops:
            out = getattr(out, name)(*args)
        return out
    rec = _chain_stages(_Recorder(df, []), cfg)
    while len(memo) >= _CHAIN_MEMO_MAX:
        memo.pop(next(iter(memo)))
    memo[key] = rec._ops
    return rec._df


def _chain_stages(df, cfg: NormalizerConfig):
    """The stage sequence itself — runs on a DataFrame or a _Recorder
    (every stage only touches columns/schema/select/withColumn(s))."""
    df = parse_raw(df)
    # reference_mode: snapshot the pre-mutation column set — the twin of
    # get_attrs_to_delete's early key snapshot (normalizers.py:530-533)
    pre_cols = set(df.columns) if cfg.reference_mode else None
    df = _apply_value_maps(df, cfg)
    df = _apply_norm_obj(df, cfg)  # pass 1 (normalizers.py:550-552)
    df = _apply_norm_prop(df, cfg)
    df = _apply_norm_obj(df, cfg)  # pass 2 over renamed cols (581-583)
    df = _apply_norm_missing(df, cfg)
    df = _array_hygiene(df)
    df = _enrich(df, cfg)
    if cfg.collect_provenance and "raw_value" in df.columns:
        prov = N.data_provenance(F.col("raw_value"))  # A8
        df = df.withColumns(
            {
                "data_provenances": prov["data_provenances"],
                "data_provenances_organisations": prov[
                    "data_provenances_organisations"
                ],
            }
        )
    if cfg.reference_mode:
        # reference placement: after geo/temporal/places enrichments,
        # before the computed readingTime/fulltext (normalizers.py order)
        df = _apply_norm_missing_reference(df, cfg)
    df = _fulltext(df, cfg)
    df = _counts(df, cfg)
    df = _apply_null_values(df, cfg)  # index-time ES null_value twin
    return _project(df, cfg, pre_cols)


# A compact default config in the shape of default_normalizers
# (dags/variables.json:1666-1972) — representative entries, not a copy.
DEFAULT_CONFIG = NormalizerConfig(
    black_map={"subjects": ["internal", "obsolete"]},
    white_map={},
    norm_obj={
        "Assessment": "Indicator",
        "News Item": "News",
        "EEA (European Environment Agency)": "European Environment Agency",
    },
    norm_prop={
        "id": ["id", "about"],
        "title": ["title", "label"],
        "doc_type": ["doc_type", "objectProvides"],
    },
    # no "language" here: T18 update_language owns the 'en' default
    # (token fallback must see NULL, normalizers.py:348-350)
    norm_missing={"description": "", "issued": "field:created"},
    proplist=[
        "id",
        "about",
        "title",
        "label",
        "description",
        "objectProvides",
        "language",
        "review_state",
        "expires",
        "themes",
        "subjects",
        "format",
        "spatial",
        "places",
        "time_coverage",
        "locations",
        "publishers",
        "fulltext",
        "readingTime",
        "site_id",
        "modified",
    ],
    interfaces_whitelist=["IDashboard", "IDataset"],
    theme_labels={"climate": "Climate change", "water": "Water and marine"},
    count_fields=["themes", "subjects", "format", "spatial"],
)
