"""Declared query set Q1-Q32 (SURVEY.md §2.9) as idiomatic DataFrame plans.

Each ``qN(spark, sf_dir)`` builds the logical plan with the DataFrame API
and lets Catalyst pick the physical strategy; ``ORACLE[name]`` carries the
equivalent ANSI SQL (validated to hash-match between Spark 4.1.2 and
DuckDB 1.0.0 during the survey — see SURVEY.md §2.9 conventions).

Portability conventions honored on the Spark side (they were *required*
to achieve byte-identical results during validation):
  - total ORDER BY over output columns with tiebreakers;
  - cast each factor to DECIMAL before multiplying money;
  - CAST(... AS DOUBLE) around AVG(decimal) / mixed CASE branches;
  - FLOOR(double) cast to BIGINT;
  - events.ts handled by sources.tables (nanos → exact micros).

Driver-canonicalization conventions (round 2 — the driver compares the
two sides through a pandas canon where DuckDB DECIMAL/HUGEINT become
float64 while Spark keeps Decimal/BIGINT, so equal values hash apart):
  - every *final output* DECIMAL column is CAST(... AS DOUBLE) on BOTH
    sides (arithmetic still runs in exact decimal; only the declared
    output representation changes);
  - every DuckDB SUM over integers is CAST(... AS BIGINT) to stop the
    HUGEINT→float64 widening (Spark's SUM(int) is already BIGINT).

Scale notes (100 TB posture):
  - dimension sides (region/nation, key-filtered orders) are broadcast so
    the fact-table side never shuffles for the join;
  - aggregations are expressed as single groupBy/agg so Spark plans
    partial (map-side) aggregation automatically;
  - window queries partition by the natural entity key (custkey/user_id)
    — the shuffle is on the key the data would be bucketed by in a real
    deployment.

Capability citations into the reference (/root/reference) are per-query
comments; see SURVEY.md §2 for the operator inventory mapping.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from eea_crawler_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Q1 scan + projection + column pruning (S1,S2,S9,P1,P14,T1,T5,T11) ---
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    return region.select("r_regionkey", "r_name").orderBy("r_regionkey", "r_name")


# --- Q2 conjunctive filter predicates (P8,P11,S9) ---
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000))
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("p"),
        )
        .orderBy("o_orderkey")
    )


# --- Q3 IN-list whitelist (P2,P5,P10) ---
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    return (
        customer.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


# --- Q4 NOT-IN blacklist (P3,P7) ---
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(~F.col("p_brand").isin("Brand#13", "Brand#42"))
        .select("p_partkey", "p_brand")
        .orderBy("p_partkey")
    )


# --- Q5 pattern predicates: prefix / wildcard (P4,P12,T24) ---
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_type").like("%ECO%") | F.col("p_name").like("bl%"))
        .select("p_partkey", "p_type")
        .orderBy("p_partkey", "p_type")
    )


# --- Q6 inner equi join + derived-column filter (J7,P6) ---
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        customer.filter(F.col("c_acctbal") > 9000)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "n_name")
        .orderBy("c_custkey", "n_name")
    )


# --- Q7 multi-way join + group agg (J4 hydration shape; TPC-H Q5 style) ---
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q7_plan(
        spark,
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


# q7's no-wrap enforcement bound (see the two-level sum below): module
# constant so the guard's trip path is testable without an 8.4e7-row
# partition.
_Q7_I64_GUARD = float(2**63 - 1)


def q7_plan(
    spark: SparkSession,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """q7's logical plan over caller-supplied relations.

    Split out so the same plan runs over plain parquet (``q7``) or a
    bucketed lakehouse layout: lineitem and orders bucketed on their
    order key (``sinks.indexes.save_bucketed``) join with ZERO
    fact-side Exchange — the production answer to q7's dominant cost
    at sf100, where shuffling 600M plain-parquet lineitem rows is
    ~15x a single-node shared-memory hash join. Pinned by
    tests/test_skew_bucketing.py::test_q7_bucketed_* and measured by
    scripts/bench_q7_bucketed.py.
    """
    # Money math in integer "e6 units" (price-cents × discount basis
    # points) — the q13 find applied to q7's hot stage: the
    # decimal(18,2) × decimal(9,4) product allocated a BigDecimal per
    # lineitem row in the one stage that touches 600M rows at sf100.
    # rint recovers the exact 2-dp/4-dp integers from the double source
    # columns (fp error ≪ 0.5, and rint is Math.rint in codegen — pure
    # FP, no BigDecimal the way Round(double) allocates); the per-row
    # product ≤ ~1.1e11 is exact in double and casts to long exactly.
    rev_e6 = (
        F.rint(F.col("l_extendedprice") * 100)
        * F.rint((F.lit(1) - F.col("l_discount")) * 10000)
    ).cast("long")
    # join order: reduce the customer side through the broadcast dims
    # FIRST (region filter → ~1/5 of nations → ~1/5 of customers and
    # orders), so the expensive lineitem join sees the already-filtered
    # orders instead of joining 100% of lineitem to 100% of orders and
    # filtering last; the intermediate-size win grows with the region's
    # selectivity. No CBO join reordering exists to do this for us
    # (spark.sql.cbo off by default). The filtered sides carry
    # shuffle_hash hints: their post-join cardinality is unknowable to
    # the static planner (which falls back to sort-merge), but they are
    # 1/5-of-a-dimension builds — hashing them skips the sort of the
    # 100%-side (lineitem at sf10: 60M rows sorted for nothing). Builds
    # stay per-partition-sized at scale because shuffle partitions are
    # sized to input bytes (session.py).
    asia_cust = (
        customer.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "n_name")
    )
    # The filtered build sides (asia_cust, o_asia) are what a CBO/AQE
    # would broadcast: each is ~1/5 of a dimension. When AQE is on
    # (session enables it past ~128 MB input) leave them unhinted — AQE
    # converts the planned sort-merge join to broadcast from runtime
    # shuffle stats while the build side fits the session's adaptive
    # broadcast threshold, and keeps SMJ when it doesn't (sf100:
    # o_asia is 300M rows — broadcasting would OOM the driver). An
    # explicit shuffle_hash hint here was measured WORSE at sf1: AQE
    # honors the hint and skips the broadcast conversion (3.2 s vs
    # 1.2 s). When AQE is off the input is tiny by construction, so
    # force the broadcast the static planner can't infer; this removed
    # the fact-side shuffle of lineitem (q7 1.07 s → 0.63 s at sf0.1).
    # no fallback literal: a harness-supplied session that never set the
    # conf must resolve to Spark's BUILT-IN default (true on 3.2+), not a
    # hardcoded 'false' — which would force F.broadcast(o_asia) (~300M
    # rows at sf100) on exactly the sessions that rely on AQE to protect
    # them. conf.get(key) without a default consults the entry's default.
    try:
        aqe = spark.conf.get("spark.sql.adaptive.enabled") == "true"
    except Exception:  # session predating the conf entry: assume no AQE
        aqe = False
    _build = (lambda df: df) if aqe else F.broadcast
    o_asia = orders.join(
        _build(asia_cust), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "n_name")
    return (
        lineitem.join(
            _build(o_asia), F.col("l_orderkey") == F.col("o_orderkey")
        )
        # two-level sum: the fact stage sums pure int64 per (n_name,
        # map partition) — a partial can't wrap under sane partition
        # sizing (it would take ~8.4e7 rows × max rev_e6 in ONE scan
        # partition; 128 MB splits hold ~1.3e6) — and only the 25×P
        # partial rows meet decimal, so no SF can overflow the total
        # and the per-row path stays whole-stage-codegen long math.
        # Exactness: integer addition is associative; the single
        # decimal division (scale ≥ 6 covers the exact 6-dp rational)
        # then one cast rounds once to double, matching the oracle's
        # decimal-exact sum bit-for-bit. The sizing assumption is
        # ENFORCED, not trusted (round-6 ADVICE): each partial also
        # carries its row count and max |rev_e6|; cnt×max bounds the
        # partial's |sum| from above, so if every group's bound sits
        # under 2^63 no wrap was possible — otherwise the query RAISES
        # instead of returning a silently wrapped figure. Two extra
        # codegen accumulators in the hot stage, no per-row decimal.
        .groupBy("n_name", F.spark_partition_id().alias("__pid"))
        .agg(
            F.sum(rev_e6).alias("__e6"),
            F.count(F.lit(1)).alias("__cnt"),
            F.max(F.abs(rev_e6)).alias("__mx"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(F.col("__e6").cast("decimal(26,0)")).alias("__sum"),
            F.max(
                F.col("__cnt").cast("double") * F.col("__mx").cast("double")
            ).alias("__risk"),
        )
        .select(
            "n_name",
            F.when(
                F.col("__risk") < F.lit(_Q7_I64_GUARD),
                (F.col("__sum") / F.lit(1000000)).cast("double"),
            )
            .otherwise(
                F.raise_error(
                    F.lit(
                        "q7: an int64 partial revenue sum may have wrapped "
                        "(partition too large) — shrink "
                        "spark.sql.files.maxPartitionBytes"
                    )
                )
            )
            .alias("rev"),
        )
        .orderBy("n_name", "rev")
    )


# --- Q8 left outer join + coalesce default-fill (J1,T6,T9,T18) ---
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_orderstatus") == "P"),
            "left",
        )
        .select("c_custkey", F.coalesce(F.col("o_orderkey"), F.lit(-1)).alias("ok"))
        .orderBy("c_custkey", "ok")
    )


# --- Q9 anti join: deletion detection / quarantine (J2,P9,S11,S14) ---
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    pending = orders.filter(F.col("o_orderstatus") == "P")
    return (
        customer.join(pending, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


# --- Q10 semi join: whitelist-by-join (P2) ---
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = _t(spark, sf_dir, "supplier")
    lineitem = _t(spark, sf_dir, "lineitem")
    big = lineitem.filter(F.col("l_quantity") > 49)
    return (
        supplier.join(big, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey", "s_name")
    )


# --- Q11 distinct / dedup-collect (T7,A8) ---
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q12 keyed dedup first-wins (O3,O4) ---
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey")
        .orderBy("o_custkey", "o_orderkey")
    )


# --- Q13 group aggregation sum/avg/count (A1,A2,J3; TPC-H Q1 style) ---
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    # Money sums run in int64 "cents" recovered by PRIMITIVE double
    # math: stored values are exactly 2-dp decimals, so x*100 sits
    # within ~1e-8 of the true integer cents and rint() recovers it
    # exactly (rint's half-even tie at .5 is unreachable — fp error
    # would need to be 0.5). rint, NOT round: Spark's Round on doubles
    # routes through BigDecimal.valueOf per row, the same allocation
    # the decimal(18,2)-cast formulation paid (measured at sf100:
    # decimal cast 15.2 s → round 6.9 s → rint 3.8 s warm; rint is
    # Math.rint in codegen, pure FP). The avg keeps EXACT rational
    # semantics without any per-row decimal: sum of discount-cents is
    # an exact long, and the single per-GROUP decimal division
    # sum/(100*n) reproduces round(avg(decimal),4) half-up to the
    # digit. Overflow headroom: int64 holds ~9.2e18, a cents-sum of
    # 1e5-range prices stays safe past 10^12 rows; beyond that this
    # shape shards the aggregate anyway.
    cents = lambda c: F.rint(F.col(c) * 100).cast("long")  # noqa: E731
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(cents("l_quantity")) / 100.0).alias("sq"),
            (F.sum(cents("l_extendedprice")) / 100.0).alias("sp"),
            F.round(
                F.sum(cents("l_discount")).cast("decimal(38,10)")
                / (F.count(F.lit(1)) * 100),
                4,
            )
            .cast("double")
            .alias("ad"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q14 rollup (A6 + engine coverage) ---
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("st"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("pr"),
            "cnt",
        )
        .orderBy("st", "pr", "cnt")
    )


# --- Q15 having (J3 threshold shape) ---
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 5)
        .orderBy("o_custkey", "cnt")
    )


# --- Q16 conditional value rewrite on rows (T2,T3,T8,T25 scalar form) ---
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.when(F.col("p_size").isin(1, 2, 3), F.lit(None)).otherwise(F.col("p_size")).alias("sz"),
        F.when(F.col("p_brand") == "Brand#11", F.lit("house"))
        .otherwise(F.lower(F.col("p_brand")))
        .alias("b"),
    ).orderBy("p_partkey", F.col("sz").asc_nulls_first(), "b")


# --- Q17 list projection x->x.field analog via join (T16,T22) ---
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    small = orders.filter(F.col("o_orderkey") <= 100)
    return (
        F.broadcast(small)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderkey", "l_linenumber", "l_partkey")
        .orderBy("o_orderkey", "l_linenumber", "l_partkey")
    )


# --- Q18 ranking window + retention top-k (O2,O6) ---
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "s_suppkey", "rnk")
        .orderBy("n_name", "rnk", "s_suppkey")
    )


# --- Q19 global sort + limit with tiebreaker (O1) ---
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # top-k on the RAW column, canonical 2-dp cast only on the 10
    # survivors: the per-row decimal round-trip before the sort cost
    # 2.5x at sf100 (150M rows) for rows that never reach the output.
    # Order is identical — the oracle sorts on the same raw column, and
    # equal raw doubles tie-break on o_orderkey either way. (Data
    # assumption, per review: raw-vs-rounded sort agreement relies on
    # stored values being exactly 2-dp, which holds for TPC-H prices;
    # data with sub-cent noise would need the round inside the sort —
    # the oracle SQL was changed in lockstep so the contract is atomic.)
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("p"),
        )
    )


# --- Q20 set ops: union / intersect / except (O5,T17,T20) ---
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    # reduce-before-exchange: both set ops broadcast the supplier side
    # into a semi/anti join — dedupe its keys first so the broadcast
    # relation is |distinct keys| (25) instead of |supplier| (1.5M rows
    # built single-threaded twice at sf100); the distinct itself is a
    # partial-agg shuffle of ~25 values per partition
    s_keys = supplier.select("s_nationkey").distinct()
    t1 = customer.select(F.col("c_nationkey").alias("x")).intersect(s_keys)
    t2 = nation.select(F.col("n_nationkey").alias("x")).subtract(s_keys)
    return t1.union(t2).orderBy("x")


# --- Q21 string scalar functions (T10,T12,T26,T27,A9) ---
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    return (
        customer.filter(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            F.upper(F.substring("c_name", 1, 8)).alias("a"),
            F.concat(F.trim(F.col("c_name")), F.lit("#"), F.col("c_mktsegment")).alias("b"),
            F.length("c_name").alias("l"),
            F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("r"),
        )
        .orderBy("c_custkey", "a", "b", "l", "r")
    )


# --- Q22 regex strip + dup detection by content prefix key (T13,J5 exact) ---
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    documents = _t(spark, sf_dir, "documents")
    return (
        documents.select(
            F.substring(F.regexp_replace("text", "<[^>]*>", ""), 1, 20).alias("prefix_key")
        )
        .groupBy("prefix_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .orderBy("prefix_key", "n")
    )


# --- Q23 date functions: extract, trunc, range predicate (P13) ---
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate").cast("date") >= F.lit("1995-01-01").cast("date"))
        .groupBy(
            F.year("l_shipdate").alias("y"),
            F.month("l_shipdate").alias("m"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("y", "m", "cnt")
    )


# --- Q24 math scalar functions incl. readingTime shape (T14) ---
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_partkey") <= 1000)
        .select(
            "p_partkey",
            F.round(F.col("p_retailprice") / 228.0, 4).alias("rt"),
            F.floor("p_retailprice").cast("bigint").alias("f"),
            (F.col("p_size") % 7).alias("md"),
            F.abs(F.col("p_size") - 25).alias("ab"),
        )
        .orderBy("p_partkey", "rt", "f", "md", "ab")
    )


# --- Q25 broadcast map lookup / value normalization via dim join
#     (T4,T21,T23,J6,S15,S16) ---
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    nm = (
        F.when(F.col("n_name") == "UNITED STATES", F.lit("USA"))
        .when(F.col("n_name") == "UNITED KINGDOM", F.lit("UK"))
        .otherwise(F.col("n_name"))
    )
    return (
        customer.filter(F.col("c_custkey") <= 300)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", nm.alias("nm"))
        .orderBy("c_custkey", "nm")
    )


# --- Q26 stateful fold / conditional counters (A7,T19) ---
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    done = F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
    open_ = F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
    return (
        orders.groupBy("o_custkey")
        .agg(done.alias("done"), open_.alias("open_"))
        .withColumn("verdict", F.when(F.col("done") >= 2, F.lit("skip")).otherwise(F.lit("ok")))
        .orderBy("o_custkey", "done", "open_", "verdict")
    )


# --- Q27 correlated scalar subquery: max-over-children (A3,J4) ---
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    mx = (
        lineitem.filter(F.col("l_orderkey") <= 200)
        .groupBy("l_orderkey")
        .agg(F.max("l_linenumber").alias("mx"))
    )
    return (
        orders.filter(F.col("o_orderkey") <= 200)
        .join(mx, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .select("o_orderkey", "mx")
        .orderBy("o_orderkey", F.col("mx").asc_nulls_first())
    )


# --- Q28 gaps-and-islands: merged year ranges (A4,A5) ---
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged consecutive-year ranges per customer.

    ONE shuffle: collect the per-customer distinct year set in a single
    hash aggregate (bounded: ≤ the order-date span in years), then find
    the islands with higher-order array functions in codegen. The
    classic window formulation (distinct → row_number window → re-agg,
    the oracle SQL's shape) costs three exchanges of the same keys plus
    a per-key sort — measured 1.35x DuckDB at sf100 where this is the
    map-side-combine-friendly single aggregate of a 150M-row scan.
    """
    orders = _t(spark, sf_dir, "orders")
    ys = F.col("ys")
    n = F.size(ys)
    # island starts: positions whose year doesn't continue the previous
    starts = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda i: (i == 0) | (F.get(ys, i) != F.get(ys, i - 1) + 1),
    )
    # island k spans [ys[starts[k]], ys[starts[k+1]-1]] (last: ys[n-1])
    ranges = F.transform(
        F.col("__starts"),
        lambda s, k: F.struct(
            F.get(ys, s).alias("range_start"),
            F.when(
                k == F.size(F.col("__starts")) - 1, F.get(ys, n - 1)
            )
            .otherwise(F.get(ys, F.get(F.col("__starts"), k + 1) - 1))
            .alias("range_end"),
        ),
    )
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.sort_array(
                F.collect_set(F.year("o_orderdate"))
            ).alias("ys")
        )
        .withColumn("__starts", starts)
        .select("o_custkey", F.explode(ranges).alias("r"))
        .select("o_custkey", "r.range_start", "r.range_end")
        .orderBy("o_custkey", "range_start", "range_end")
    )


# --- Q29 sessionization by inactivity gap (streaming-state analog) ---
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL '30' MINUTE")), 1
    ).otherwise(0)
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        events.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wsum))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("event_id").alias("first_ev"))
        .orderBy("user_id", "session_id", "n_events", "first_ev")
    )


# --- Q30 tumbling window aggregation (streaming window analog) ---
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    hour_ts = F.date_trunc("hour", F.col("ts"))
    return (
        events.groupBy(
            hour_ts.cast("date").alias("d"),
            F.hour(hour_ts).alias("h"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sv"),
        )
        .orderBy("d", "h", "event_type", "cnt", "sv")
    )


# --- Q31 moving-frame window (engine coverage for frame specs) ---
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    return (
        orders.filter(F.col("o_custkey") <= 100)
        .withColumn(
            "mv", F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
        )
        .select("o_custkey", "o_orderkey", "mv")
        .orderBy("o_custkey", "o_orderkey", "mv")
    )


# --- Q32 text metrics: wordcount without array ops (T14 readingTime) ---
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    documents = _t(spark, sf_dir, "documents")
    wc = F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + 1
    reading_time = (
        F.when(F.col("lang") == "en", F.round(wc / 228.0, 4)).otherwise(F.lit(-1)).cast("double")
    )
    return documents.select(
        "doc_id", wc.alias("wc"), reading_time.alias("reading_time")
    ).orderBy("doc_id", "wc", "reading_time")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    f"q{i}": globals()[f"q{i}"] for i in range(1, 33)
}

# Oracle SQL (DuckDB-compatible ANSI), verbatim from SURVEY.md §2.9.
ORACLE: dict[str, str] = {
    "q1": "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey, r_name",
    "q2": """SELECT o_orderkey, o_orderstatus,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p
FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 100000
ORDER BY o_orderkey""",
    "q3": """SELECT c_custkey, c_mktsegment FROM customer
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE') ORDER BY c_custkey""",
    "q4": """SELECT p_partkey, p_brand FROM part
WHERE p_brand NOT IN ('Brand#13', 'Brand#42') ORDER BY p_partkey""",
    "q5": """SELECT p_partkey, p_type FROM part
WHERE p_type LIKE '%ECO%' OR p_name LIKE 'bl%' ORDER BY p_partkey, p_type""",
    "q6": """SELECT c.c_custkey, n.n_name FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > 9000 ORDER BY c.c_custkey, n.n_name""",
    "q7": """SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(9,4))) AS DOUBLE) AS rev
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' GROUP BY n.n_name ORDER BY n.n_name, rev""",
    "q8": """SELECT c.c_custkey, COALESCE(o.o_orderkey, -1) AS ok
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P'
ORDER BY c.c_custkey, ok""",
    "q9": """SELECT c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
ORDER BY c_custkey""",
    "q10": """SELECT DISTINCT s.s_suppkey, s.s_name FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
ORDER BY s.s_suppkey, s.s_name""",
    "q11": """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus""",
    "q12": """SELECT o_custkey, o_orderkey FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders) t WHERE rn = 1 ORDER BY o_custkey, o_orderkey""",
    "q13": """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
       CAST(ROUND(AVG(CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS ad,
       COUNT(*) AS cnt
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q14": """SELECT COALESCE(o_orderstatus, 'ALL') AS st,
       COALESCE(o_orderpriority, 'ALL') AS pr, COUNT(*) AS cnt
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY st, pr, cnt""",
    "q15": """SELECT o_custkey, COUNT(*) AS cnt FROM orders
GROUP BY o_custkey HAVING COUNT(*) >= 5 ORDER BY o_custkey, cnt""",
    "q16": """SELECT p_partkey,
       CASE WHEN p_size IN (1, 2, 3) THEN NULL ELSE p_size END AS sz,
       CASE WHEN p_brand = 'Brand#11' THEN 'house' ELSE lower(p_brand) END AS b
FROM part ORDER BY p_partkey, sz NULLS FIRST, b""",
    "q17": """SELECT o.o_orderkey, l.l_linenumber, l.l_partkey
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey <= 100 ORDER BY o.o_orderkey, l.l_linenumber, l.l_partkey""",
    "q18": """SELECT n_name, s_suppkey, rnk FROM (
  SELECT n.n_name, s.s_suppkey,
         RANK() OVER (PARTITION BY n.n_name ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rnk
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey) t
WHERE rnk <= 3 ORDER BY n_name, rnk, s_suppkey""",
    "q19": """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q20": """SELECT x FROM (
  SELECT c_nationkey AS x FROM customer
  INTERSECT SELECT s_nationkey FROM supplier) t1
UNION ALL
SELECT y FROM (
  SELECT n_nationkey AS y FROM nation
  EXCEPT SELECT s_nationkey FROM supplier) t2
ORDER BY x""",
    "q21": """SELECT c_custkey, upper(substr(c_name, 1, 8)) AS a,
       trim(c_name) || '#' || c_mktsegment AS b,
       length(c_name) AS l, replace(c_name, 'Customer', 'C') AS r
FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey, a, b, l, r""",
    "q22": """SELECT t AS prefix_key, COUNT(*) AS n FROM (
  SELECT substr(regexp_replace(text, '<[^>]*>', ''), 1, 20) AS t FROM documents) d
GROUP BY t HAVING COUNT(*) > 1 ORDER BY prefix_key, n""",
    "q23": """SELECT EXTRACT(YEAR FROM l_shipdate) AS y, EXTRACT(MONTH FROM l_shipdate) AS m,
       COUNT(*) AS cnt
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
GROUP BY 1, 2 ORDER BY y, m, cnt""",
    "q24": """SELECT p_partkey, ROUND(p_retailprice / 228.0, 4) AS rt,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS f, MOD(p_size, 7) AS md, ABS(p_size - 25) AS ab
FROM part WHERE p_partkey <= 1000 ORDER BY p_partkey, rt, f, md, ab""",
    "q25": """SELECT c.c_custkey,
       CASE n.n_name WHEN 'UNITED STATES' THEN 'USA'
                     WHEN 'UNITED KINGDOM' THEN 'UK' ELSE n.n_name END AS nm
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_custkey <= 300 ORDER BY c.c_custkey, nm""",
    "q26": """SELECT o_custkey,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS done,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_,
       CASE WHEN SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) >= 2
            THEN 'skip' ELSE 'ok' END AS verdict
FROM orders GROUP BY o_custkey ORDER BY o_custkey, done, open_, verdict""",
    "q27": """SELECT o.o_orderkey,
       (SELECT MAX(l.l_linenumber) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS mx
FROM orders o WHERE o.o_orderkey <= 200 ORDER BY o.o_orderkey, mx NULLS FIRST""",
    "q28": """SELECT o_custkey, MIN(y) AS range_start, MAX(y) AS range_end FROM (
  SELECT o_custkey, y,
         y - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY y) AS grp
  FROM (SELECT DISTINCT o_custkey, EXTRACT(YEAR FROM o_orderdate) AS y FROM orders) d) t
GROUP BY o_custkey, grp ORDER BY o_custkey, range_start, range_end""",
    "q29": """SELECT user_id, session_id, COUNT(*) AS n_events, MIN(event_id) AS first_ev FROM (
  SELECT user_id, event_id,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM (SELECT user_id, event_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30' MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events) g) s
GROUP BY user_id, session_id ORDER BY user_id, session_id, n_events, first_ev""",
    "q30": """SELECT CAST(date_trunc('hour', ts) AS DATE) AS d, EXTRACT(HOUR FROM date_trunc('hour', ts)) AS h,
       event_type, COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM events GROUP BY 1, 2, 3 ORDER BY d, h, event_type, cnt, sv""",
    "q31": """SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mv
FROM orders WHERE o_custkey <= 100 ORDER BY o_custkey, o_orderkey, mv""",
    "q32": """SELECT doc_id,
       length(text) - length(replace(text, ' ', '')) + 1 AS wc,
       CAST(CASE WHEN lang = 'en'
                 THEN ROUND((length(text) - length(replace(text,' ','')) + 1) / 228.0, 4)
                 ELSE -1 END AS DOUBLE) AS reading_time
FROM documents ORDER BY doc_id, wc, reading_time""",
}
