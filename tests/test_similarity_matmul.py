"""Pins for the matmul vector paths vs the column-expression forms.

The similarity operators score Arrow batches with float64 BLAS
matmuls (operators/similarity.py); their contract is that results are
IDENTICAL to the zip_with/aggregate expression form they replaced —
same rounded cosines, same top-k sets, same pair lists. The extras
oracle (test_extras_oracle.py) pins the declared queries against
DuckDB; these tests pin the equivalence directly, on adversarial
vectors the sf corpora don't contain (near-zero norms would divide
loudly, antiparallel vectors exercise the away-from-zero rounding,
ties exercise the id ordering).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eea_crawler_spark.functions.vectors import cosine_rounded
from eea_crawler_spark.operators.similarity import (
    _round_half_up,
    brute_force_topk,
    neardup_pairs,
)


def test_round_half_up_matches_spark_round(spark):
    """_round_half_up must agree with Spark's Round(double, 4) on exact
    grid points, half-way ties, negatives, and ordinary values."""
    vals = [
        0.12345, -0.12345, 0.00005, -0.00005, 0.99995, -0.99995,
        0.5, -0.5, 0.123449999, 0.123450001, 1.0, -1.0, 0.0,
        0.33333333, -0.66666666, 0.87654321,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    expected = [r["r"] for r in df.select(F.round("x", 4).alias("r")).collect()]
    got = [float(x) for x in _round_half_up(np.asarray(vals))]
    assert got == expected


@pytest.fixture(scope="module")
def emb_df(spark):
    """Small corpus with engineered edge cases: duplicate vectors
    (rounded-cosine ties resolved by id), antiparallel pairs (negative
    cosines), near-axis vectors."""
    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    vecs[10] = vecs[3]          # exact duplicate → cos 1.0 tie
    vecs[11] = -vecs[3]         # antiparallel → cos -1.0
    vecs[12] = vecs[5] * 1e-3   # tiny norm, same direction
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _expression_topk(emb, queries, k):
    """The replaced plan: crossJoin + sequential-fold cosine + window."""
    from pyspark.sql.window import Window as W

    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    q = queries.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("c_id").alias("vec_id"),
            cosine_rounded(F.col("q_vec"), F.col("c_vec")).alias("cos"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "rnk", "cos")
        .orderBy("q_id", "rnk", "vec_id")
    )


def test_brute_force_matches_expression_form(spark, emb_df):
    queries = emb_df.filter(F.col("vec_id") < 6)
    got = brute_force_topk(emb_df, queries, k=4).collect()
    expected = _expression_topk(emb_df, queries, k=4).collect()
    assert got == expected


def test_neardup_matches_expression_form(spark, emb_df):
    got = neardup_pairs(emb_df, threshold=0.2).collect()
    a = emb_df.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"))
    b = emb_df.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"))
    expected = (
        a.join(F.broadcast(b), F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            cosine_rounded(F.col("a_vec"), F.col("b_vec")).alias("cos"),
        )
        .filter(F.col("cos") >= 0.2)
        .orderBy("a_id", "b_id", "cos")
        .collect()
    )
    assert got == expected
    # the engineered edges actually appear in the result
    pairs = {(r["a_id"], r["b_id"]): r["cos"] for r in got}
    assert pairs[(3, 10)] == 1.0  # duplicate vector tie
    assert (3, 11) not in pairs   # antiparallel is far below threshold


@pytest.mark.parametrize("block_bytes", [2048, 128])
def test_neardup_blocked_equals_broadcast(spark, emb_df, monkeypatch, block_bytes):
    """neardup_pairs picks its plan by a corpus-size probe: broadcast
    matmul under NEARDUP_BROADCAST_MAX_BYTES, the blocked exact
    all-pairs plan above (no driver materialization). Forcing the gate
    to 0 must route the SAME corpus through the blocked plan with
    bit-identical output — same pairs, same cosines (each surviving
    dot product runs over the same full-dim float64 vectors either
    way; the float32 prescreen only gates candidates). 2048-byte
    blocks exercise single-block stripes (g=1, diagonal AND
    off-diagonal tiles); 128-byte blocks force one-row blocks and
    MULTI-BLOCK stripes (g>1: same-block, intra-stripe and
    cross-stripe block pairs all execute)."""
    from eea_crawler_spark.operators import similarity as SIM

    small = neardup_pairs(emb_df, threshold=0.2).collect()
    monkeypatch.setattr(SIM, "NEARDUP_BROADCAST_MAX_BYTES", 0)
    monkeypatch.setattr(SIM, "NEARDUP_BLOCK_BYTES", block_bytes)
    blocked = SIM.neardup_pairs(emb_df, threshold=0.2).collect()
    assert blocked == small and len(small) > 0


def test_neardup_blocked_zero_norm_rows(spark, monkeypatch):
    """Zero-norm vectors must vanish from the blocked plan's output the
    same way the broadcast plan drops them (NaN cosine fails the
    threshold compare); the f32 prescreen normalizes them to the zero
    row, so they can never spuriously pass either."""
    from eea_crawler_spark.operators import similarity as SIM

    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    want = SIM.neardup_pairs(df, threshold=0.2).collect()
    monkeypatch.setattr(SIM, "NEARDUP_BROADCAST_MAX_BYTES", 0)
    monkeypatch.setattr(SIM, "NEARDUP_BLOCK_BYTES", 64)
    got = SIM.neardup_pairs(df, threshold=0.2).collect()
    assert got == want
    assert {(r["a_id"], r["b_id"]) for r in got} == {(1, 2)}


def test_neardup_blocked_randomized_boundary_stress(spark, monkeypatch):
    """Seeded randomized pin for the f32 prescreen margin: vectors
    engineered to land NEAR the threshold (pairs rotated to cosines in
    [t-3e-4, t+3e-4], where HALF_UP rounding and prescreen slack
    actually decide) must produce bit-identical blocked vs broadcast
    output — a margin bug would drop or add boundary pairs."""
    import numpy as np

    from eea_crawler_spark.operators import similarity as SIM

    rng = np.random.RandomState(11)
    t = 0.4
    base = rng.standard_normal((60, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vid = 0
    for i in range(60):
        rows.append((vid, [float(x) for x in base[i]])); vid += 1
    # boundary partners: rotate a copy of each of 30 vectors to an
    # exact target cosine within ±3e-4 of the threshold
    for i in range(30):
        a = base[i]
        r = rng.standard_normal(32)
        r -= (r @ a) * a
        r /= np.linalg.norm(r)
        c = t + (i - 15) * 4e-5  # sweep across the boundary
        v = c * a + np.sqrt(max(0.0, 1 - c * c)) * r
        rows.append((vid, [float(x) for x in v])); vid += 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    want = SIM.neardup_pairs(df, threshold=t).collect()
    monkeypatch.setattr(SIM, "NEARDUP_BROADCAST_MAX_BYTES", 0)
    monkeypatch.setattr(SIM, "NEARDUP_BLOCK_BYTES", 1024)
    got = SIM.neardup_pairs(df, threshold=t).collect()
    assert got == want
    # the boundary engineering worked: some rotated pairs are in, the
    # sub-threshold ones are out
    cosines = {round(r["cos"], 4) for r in want}
    assert any(abs(c - t) < 3e-4 for c in cosines)


def test_neardup_lsh_subset_and_recall(spark):
    """neardup_pairs_lsh contract: every emitted pair appears in the
    exact operator's output WITH THE SAME cosine (subset property —
    in-bucket verification uses the identical full-dim f64 + HALF_UP
    arithmetic), near-identical pairs (cos → 1) are caught with
    near-certain probability at the default banding, and the output is
    deterministic (seeded planes)."""
    import numpy as np

    from eea_crawler_spark.operators import similarity as SIM

    rng = np.random.RandomState(5)
    base = rng.standard_normal((120, 32))
    rows = [(i, [float(x) for x in base[i]]) for i in range(120)]
    # 20 engineered near-dups: tiny perturbations of existing rows
    for j in range(20):
        v = base[j] + 0.01 * rng.standard_normal(32)
        rows.append((200 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    t = 0.9
    exact = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs(df, threshold=t).collect()
    }
    got = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs_lsh(df, threshold=t).collect()
    }
    # subset with identical cosines
    assert set(got) <= set(exact)
    assert all(exact[k] == v for k, v in got.items())
    # the engineered near-dup pairs (cos ≈ 0.999) are all caught
    planted = {(j, 200 + j) for j in range(20)} & set(exact)
    assert planted and planted <= set(got)
    # overall recall at this threshold is high
    assert len(got) >= 0.9 * len(exact)
    # determinism
    again = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs_lsh(df, threshold=t).collect()
    }
    assert again == got


def test_neardup_lsh_hot_bucket_salt_split(spark):
    """Round-8 VERDICT #1: a bucket far past the per-task cap (the
    boilerplate-duplicate skew shape — near-identical vectors share
    EVERY band bucket) must salt-split into slice-pair tasks with
    identical output. Forcing max_bucket_rows below the duplicate
    cluster size exercises the fan-out on every band; the result must
    equal the uncapped run AND stay a subset of the exact operator with
    identical cosines."""
    import numpy as np

    from eea_crawler_spark.operators import similarity as SIM

    rng = np.random.RandomState(7)
    rows = []
    # one boilerplate cluster of 90 near-identical vectors: all 90 land
    # in the same bucket in every band (bucket size 90 >> cap 16)
    center = rng.standard_normal(24)
    for i in range(90):
        v = center + 0.005 * rng.standard_normal(24)
        rows.append((i, [float(x) for x in v]))
    # plus background noise rows
    for i in range(60):
        rows.append((1000 + i, [float(x) for x in rng.standard_normal(24)]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    t = 0.9
    uncapped = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs_lsh(df, threshold=t).collect()
    }
    capped = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs_lsh(
            df, threshold=t, max_bucket_rows=16
        ).collect()
    }
    assert capped == uncapped
    # the cluster's pair space survived the split intact: the exact
    # operator finds all ~C(90,2) cluster pairs and LSH catches them
    # (cos ≈ 1 ⇒ per-band collision probability ≈ 1)
    exact = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs(df, threshold=t).collect()
    }
    cluster_pairs = {k for k in exact if k[0] < 90 and k[1] < 90}
    assert len(cluster_pairs) > 3000  # the hot-bucket mass is real
    assert cluster_pairs <= set(capped)
    assert set(capped) <= set(exact)
    assert all(exact[k] == v for k, v in capped.items())


def test_neardup_lsh_empty_and_ragged(spark):
    """Round-8 ADVICE: empty corpus short-circuits to an empty result
    (dim probe would otherwise feed hyperplane_planes(0)); ragged
    vector widths fail with a contract message, not a numpy shape
    error deep inside a task."""
    import pytest as _pytest

    from eea_crawler_spark.operators import similarity as SIM

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    out = SIM.neardup_pairs_lsh(empty, threshold=0.9)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["a_id", "b_id", "cos"]

    ragged = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="uniform-width"):
        SIM.neardup_pairs_lsh(ragged, threshold=0.9)


def test_band_buckets_rejects_remainder_planes():
    """Round-8 ADVICE: _band_buckets must refuse a plane count that
    does not split into whole bands instead of silently dropping the
    remainder planes."""
    import numpy as np
    import pytest as _pytest

    from eea_crawler_spark.operators.similarity import _band_buckets

    m = np.ones((3, 4))
    p = np.ones((10, 4))  # 10 planes, bands of 4 → 2 planes dropped
    with _pytest.raises(ValueError, match="do not split"):
        _band_buckets(m, p, 4)
