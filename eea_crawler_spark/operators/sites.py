"""Per-site enrichment plugins + dispatch (SURVEY §2.5 T28, §2.4 A3-A6).

The reference registers a facets-normalizer per site
(``dags/normalizers/registry.py:113-143``) and dispatches by
``site_id``; the 19 plugins are config-heavy derivations on top of
``common_normalizer``. Here the registry holds DataFrame→DataFrame
plan builders; ``normalize_by_site`` filters the corpus per site,
applies that site's plan, and UNIONs the results — plan size stays
linear in the site count instead of one mega-WHEN-chain over every
column (SURVEY §7.3), and Catalyst prunes each branch independently.

Representative plugins are implemented (default eea, sdi, climate);
the remaining sites are config variations of the same builders —
decode tables become CASE/map-literal expressions, path rules reuse
functions/normalize.ct_by_path_rules.

The SDI aggregations are the real operators here:
  A3 max-modified over children   (site_sdi.py:332-342)
  A4 years from date ranges       (site_sdi.py:124-141)
  A5 merged ranges (gaps-islands) (site_sdi.py:84-122)
  A6 format roll-up over children (site_sdi.py:143-151)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

Plugin = Callable[[DataFrame], DataFrame]

FACETS_NORMALIZERS: dict[str, Plugin] = {}


def register_facets_normalizer(site_id: str) -> Callable[[Plugin], Plugin]:
    """Registry decorator (mirrors dags/normalizers/registry.py:113-127)."""

    def wrap(fn: Plugin) -> Plugin:
        FACETS_NORMALIZERS[site_id] = fn
        return fn

    return wrap


# ---- A4: years covered by [{start,end}] date-range structs --------------


def years_from_ranges(ranges: Column) -> Column:
    """Sorted distinct years spanned by the ranges; open-ended bounds
    fall back to the present bound (get_years_from_ranges semantics)."""
    per_range = F.transform(
        ranges,
        lambda r: F.sequence(
            F.year(F.coalesce(r["start"], r["end"]).cast("date")),
            F.year(F.coalesce(r["end"], r["start"]).cast("date")),
        ),
    )
    return F.array_sort(F.array_distinct(F.flatten(per_range)))


# ---- A5: maximal contiguous ranges from a year list (gaps & islands) ----


def merged_year_ranges(
    df: DataFrame, id_col: str = "id", years_col: str = "years"
) -> DataFrame:
    """(id, years[]) → (id, range_start, range_end) rows, one per island.

    Classic year - ROW_NUMBER() island key (the Q28 shape); shuffle on
    the doc id only, so it distributes like every other keyed op.
    """
    y = df.select(F.col(id_col), F.explode(F.array_distinct(years_col)).alias("y"))
    w = W.partitionBy(id_col).orderBy("y")
    grp = (F.col("y") - F.row_number().over(w)).alias("grp")
    return (
        y.select(F.col(id_col), F.col("y"), grp)
        .groupBy(id_col, "grp")
        .agg(F.min("y").alias("range_start"), F.max("y").alias("range_end"))
        .drop("grp")
    )


# ---- A3/A6: child roll-ups ----------------------------------------------


def max_modified_over_children(self_modified: Column, children: Column) -> Column:
    """max(changeDate over children[], self) (get_modified)."""
    child_max = F.array_max(F.transform(children, lambda c: c["changeDate"]))
    return F.greatest(self_modified, F.coalesce(child_max, self_modified))


def formats_over_children(children: Column) -> Column:
    """Distinct formats across children[].format arrays (get_formats)."""
    return F.array_distinct(
        F.flatten(
            F.transform(children, lambda c: F.coalesce(c["format"], F.array()))
        )
    )


# ---- plugins -------------------------------------------------------------


@register_facets_normalizer("eea")
def site_eea(df: DataFrame) -> DataFrame:
    """Default plugin: cluster tag + derived topic facet
    (site_eea_europa_eu.py shape — path/theme-driven facets)."""
    topic = F.when(
        F.array_contains(F.coalesce(F.col("themes"), F.array()), "Climate change"),
        F.lit("climate"),
    ).otherwise(F.lit("various"))
    return df.withColumns({"cluster_name": F.lit("eea"), "topic": topic})


@register_facets_normalizer("sdi")
def site_sdi(df: DataFrame) -> DataFrame:
    """SDI catalogue plugin: child roll-ups + temporal facets
    (site_sdi.py:176-362). Expects optional columns ``children``
    (array<struct<changeDate,format>>) and ``temporal_ranges``
    (array<struct<start,end>>)."""
    out = df
    cols = set(df.columns)
    if {"children", "modified"} <= cols:
        out = out.withColumn(
            "modified",
            max_modified_over_children(F.col("modified"), F.col("children")),
        )
        out = out.withColumn("format", formats_over_children(F.col("children")))
    if "temporal_ranges" in cols:
        out = out.withColumn("years", years_from_ranges(F.col("temporal_ranges")))
    return out.withColumn("cluster_name", F.lit("sdi"))


# decode table lifted in shape from the update-frequency mapping
# (site_sdi_fise.py:352-370) — keys are catalogue codes, values labels
UPDATE_FREQUENCY = {
    "continual": "Continual",
    "daily": "Daily",
    "annually": "Annually",
    "asNeeded": "As needed",
    "irregular": "Irregular",
    "notPlanned": "Not planned",
}


@register_facets_normalizer("climate")
def site_climate(df: DataFrame) -> DataFrame:
    """Climate-adapt plugin: decode-table facet + cluster tag
    (site_climate.py:24-227 shape)."""
    out = df.withColumn("cluster_name", F.lit("climate"))
    if "update_frequency" in df.columns:
        m = F.create_map(
            *[F.lit(x) for kv in UPDATE_FREQUENCY.items() for x in kv]
        )
        out = out.withColumn(
            "update_frequency_label",
            F.coalesce(m[F.col("update_frequency")], F.col("update_frequency")),
        )
    return out


def normalize_by_site(
    df: DataFrame,
    site_col: str = "site_id",
    default: str = "eea",
) -> DataFrame:
    """Dispatch: per-site filtered branch through that site's plugin,
    unioned by name (missing facet columns null-filled). Sites without
    a registered plugin take the default's (registry fallback,
    dags/normalizers/registry.py:138-143)."""
    sites = [r[0] for r in df.select(site_col).distinct().collect()]
    branches: list[DataFrame] = []
    for site in sites:
        plugin = FACETS_NORMALIZERS.get(site, FACETS_NORMALIZERS[default])
        branches.append(plugin(df.filter(F.col(site_col) == site)))
    if not branches:
        return df
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b, allowMissingColumns=True)
    return out
