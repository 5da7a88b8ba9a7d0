"""Skew salting + bucketed co-located joins — the explicit scale levers.

Salting: result equality with the plain join under heavy key skew
(one key owning ~90% of rows), and the salt must actually spread the
hot key across subkeys. Bucketing: two state tables bucketed on id
join with zero Exchange in the plan, while the same join on plain
parquet shuffles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eea_crawler_spark.operators import skew as SK
from eea_crawler_spark.sinks.indexes import read_bucketed, save_bucketed


@pytest.fixture()
def skewed(spark):
    # 900 rows of the hot key, 100 spread over 10 keys
    hot = spark.range(900).select(
        F.lit("hot").alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 10)).alias("k"),
        (F.col("id") + 1000).alias("payload"),
    )
    return hot.unionAll(cold)


@pytest.fixture()
def dim(spark):
    rows = [("hot", "HOT")] + [(f"c{i}", f"C{i}") for i in range(10)]
    return spark.createDataFrame(rows, "k string, label string")


def test_salted_join_equals_plain_join(spark, skewed, dim):
    plain = skewed.join(dim, "k").select("k", "payload", "label")
    salted = SK.salted_join(skewed, dim, "k", n_salts=8).select(
        "k", "payload", "label"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_left_join_preserves_unmatched(spark, skewed, dim):
    missing_dim = dim.filter(F.col("k") != "hot")  # hot key unmatched
    out = SK.salted_join(skewed, missing_dim, "k", n_salts=4, how="left")
    hot_rows = out.filter(F.col("k") == "hot").collect()
    assert len(hot_rows) == 900 and all(r["label"] is None for r in hot_rows)


def test_salt_spreads_hot_key(spark, skewed):
    salts = (
        skewed.filter(F.col("k") == "hot")
        .select(SK.row_salt(skewed, 8).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(salts) == 8  # every subkey occupied
    assert max(r["count"] for r in salts) < 900 * 0.3  # no residual hotspot


def test_salt_is_deterministic(spark, skewed):
    a = skewed.select(SK.row_salt(skewed, 8).alias("s")).collect()
    b = skewed.select(SK.row_salt(skewed, 8).alias("s")).collect()
    assert [r["s"] for r in a] == [r["s"] for r in b]


def test_key_histogram_reports_hot_key(spark, skewed):
    top = SK.key_histogram(skewed, "k", top=3).collect()
    assert top[0]["k"] == "hot" and top[0]["cnt"] == 900
    assert top[0]["share"] == 0.9


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    left = spark.range(1000).select(
        F.concat(F.lit("u"), F.col("id")).alias("id"),
        F.col("id").alias("v1"),
    )
    right = spark.range(500).select(
        F.concat(F.lit("u"), F.col("id")).alias("id"),
        F.col("id").alias("v2"),
    )
    save_bucketed(left, "t_bleft", str(tmp_path / "bl"), n_buckets=8)
    save_bucketed(right, "t_bright", str(tmp_path / "br"), n_buckets=8)
    # disable broadcast so the planner faces the shuffle-vs-bucket
    # choice the big-state join faces at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bl, br = read_bucketed(spark, "t_bleft"), read_bucketed(spark, "t_bright")
        joined = bl.join(br, "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: bucket layout satisfies the join's distribution —
        # no shuffle of either side
        assert "Exchange hashpartitioning" not in plan
        assert "Bucketed: true" in plan
        assert joined.count() == 500

        # control: the identical join on plain parquet must shuffle both
        left.write.mode("overwrite").parquet(str(tmp_path / "pl"))
        right.write.mode("overwrite").parquet(str(tmp_path / "pr"))
        plain = spark.read.parquet(str(tmp_path / "pl")).join(
            spark.read.parquet(str(tmp_path / "pr")), "id"
        )
        pplan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in pplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_q7_bucketed_fact_join_no_shuffle(spark, sf_dir, tmp_path):
    """q7's hydration join on a bucketed lakehouse layout: lineitem and
    orders bucketed on their order key join with zero fact-side
    Exchange, and the result is identical to the plain-parquet plan.

    This is the production shape for the J4 hydration join at 100 TB —
    the sf100 measurement (BASELINE.md) shows the plain layout's
    lineitem shuffle is q7's dominant cost; bucketing removes it."""
    from eea_crawler_spark.plans.queries import q7, q7_plan
    from eea_crawler_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    save_bucketed(li, "t_bli", str(tmp_path / "bli"), key="l_orderkey", n_buckets=8)
    save_bucketed(od, "t_bod", str(tmp_path / "bod"), key="o_orderkey", n_buckets=8)
    prev_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_adapt = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_static)
    # disable broadcast so the planner faces the shuffle-vs-bucket
    # choice the fact join faces at scale (where the build side is far
    # past any broadcast threshold)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = q7_plan(
            spark,
            read_bucketed(spark, "t_bli"),
            read_bucketed(spark, "t_bod"),
            load_table(spark, sf_dir, "customer"),
            load_table(spark, sf_dir, "nation"),
            load_table(spark, sf_dir, "region"),
        )
        rows = bucketed.collect()  # materialize the final adaptive plan
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        # the corpus-sized side rides the bucket layout: lineitem (4x
        # orders, the dominant shuffle at sf100) is never exchanged —
        # its bucketed scan satisfies the join's distribution. With
        # broadcast force-disabled here the o_asia side still aligns
        # itself to lineitem's buckets via one ENSURE_REQUIREMENTS
        # exchange of the 5x-smaller filtered orders projection (in
        # production the dim join broadcasts and o_asia inherits
        # orders' bucketing outright); the n_name aggregate exchange
        # is O(groups).
        assert "hashpartitioning(l_orderkey" not in plan
        assert "Bucketed: true" in plan
        # identical answer to the plain-parquet plan
        expected = q7(spark, sf_dir).collect()
        assert [tuple(r) for r in rows] == [tuple(r) for r in expected]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_static)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_adapt)
        spark.sql("DROP TABLE IF EXISTS t_bli")
        spark.sql("DROP TABLE IF EXISTS t_bod")
