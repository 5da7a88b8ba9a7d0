"""Connected-components cluster resolution: correctness vs a reference
union-find, convergence speed on adversarial shapes, and the canonical
keep/drop contract."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from eea_crawler_spark.operators.dedup import (
    canonical_docs,
    connected_components,
    ngram_jaccard_pairs,
)


def _union_find_clusters(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Reference implementation: plain union-find, cluster = min id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {node: find(node) for node in parent}


def _run(spark, pairs: list[tuple[int, int]], **kw):
    # driver_max_pairs=0 forces the DISTRIBUTED star contraction —
    # these tests pin the algorithm; the driver fast path is pinned
    # equal in test_cc_driver_path_equals_distributed
    kw.setdefault("driver_max_pairs", 0)
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    out = connected_components(df, **kw).collect()
    return {r["node"]: r["cluster_id"] for r in out}


def test_cc_matches_union_find_random(spark):
    rng = random.Random(7)
    for trial in range(5):
        n = rng.randrange(20, 400)
        m = rng.randrange(1, 3 * n)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        # self-loops and duplicate/reversed pairs are legal input
        pairs += [(x, x) for x in range(0, n, 7)]
        pairs += [(b, a) for a, b in pairs[: m // 3]]
        expect = _union_find_clusters(
            [(a, b) for a, b in pairs if a != b]
        )
        got = _run(spark, pairs)
        assert got == expect, f"trial {trial}"


def test_cc_long_chain_converges_fast(spark):
    # A 300-node path: naive min-propagation needs ~300 rounds; star
    # contraction is O(log n) — max_rounds=12 both proves the speed
    # and pins the algorithm (a propagation rewrite would blow it).
    pairs = [(i, i + 1) for i in range(300)]
    got = _run(spark, pairs, max_rounds=12)
    assert got == {i: 0 for i in range(301)}


def test_cc_hot_hub_and_clique(spark):
    # A star hub (the boilerplate-cluster shape after LSH) and a clique
    hub = [(0, i) for i in range(1, 200)]
    clique = [
        (a, b) for a in range(500, 540) for b in range(a + 1, 540)
    ]
    got = _run(spark, hub + clique)
    assert {got[i] for i in range(200)} == {0}
    assert {got[i] for i in range(500, 540)} == {500}


def test_cc_driver_path_equals_distributed(spark):
    rng = random.Random(21)
    pairs = [(rng.randrange(150), rng.randrange(150)) for _ in range(200)]
    dist = _run(spark, pairs)  # forced star contraction
    fast = _run(spark, pairs, driver_max_pairs=10**6)  # driver union-find
    assert fast == dist and fast


def test_cc_empty_and_string_ids(spark):
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(empty).count() == 0
    sdf = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "doc_a string, doc_b string"
    )
    out = {
        r["node"]: r["cluster_id"]
        for r in connected_components(sdf).collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_cc_nonconvergence_guard(spark):
    pairs = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=1, driver_max_pairs=0)


def test_canonical_docs_contract(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, max_df=20)
    out = canonical_docs(docs, pairs).select(
        "doc_id", "cluster_id", "keep"
    )
    rows = out.collect()
    assert len(rows) == docs.count()  # every doc gets a verdict
    by_id = {r["doc_id"]: r for r in rows}
    expect = _union_find_clusters(
        [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    )
    for did, r in by_id.items():
        assert r["cluster_id"] == expect.get(did, did)
        assert r["keep"] == (r["cluster_id"] == did)
    # exactly one kept doc per cluster
    kept = out.filter("keep").groupBy("cluster_id").count()
    assert kept.filter(F.col("count") != 1).isEmpty()


def test_canonical_docs_keep_by_quality(spark):
    """keep_by picks the cluster's highest-ranked row (min id on
    ties); unpaired docs always keep themselves."""
    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (9, 0.1)],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 4)], "doc_a long, doc_b long"
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in canonical_docs(
            docs, pairs, keep_by="quality"
        ).collect()
    }
    # cluster {1,2,3}: quality tie 2 vs 3 -> min id 2 wins
    assert out[1] == (1, False)
    assert out[2] == (1, True)
    assert out[3] == (1, False)
    assert out[4] == (4, True)  # self-loop only: singleton
    assert out[9] == (9, True)  # unpaired
    # default policy unchanged: first-seen (min id) wins
    out_min = {
        r["doc_id"]: r["keep"]
        for r in canonical_docs(docs, pairs).collect()
    }
    assert out_min == {1: True, 2: False, 3: False, 4: True, 9: True}


def test_cc_releases_superseded_checkpoints(spark):
    """Star-contraction rounds and the driver fast path must not leave
    their per-round localCheckpoint blocks pinned in the block manager
    (session-lifetime leak on repeated corpus-scale runs). The final
    converged relation may stay pinned — the returned DataFrame reads
    from it — so the pin budget is ≤ 1 per distributed run, 0 for the
    driver path."""

    def _pinned() -> int:
        return len(
            spark.sparkContext._jsc.sc().getRDDStorageInfo()
        )

    base = _pinned()
    # long chain: many star rounds => many superseded checkpoints
    chain = [(i, i + 1) for i in range(200)]
    _run(spark, chain)  # distributed path
    assert _pinned() <= base + 1
    df = spark.createDataFrame(chain, "doc_a long, doc_b long")
    connected_components(df).collect()  # driver union-find path
    assert _pinned() <= base + 1


def test_wide_by_respects_large_session_conf(spark):
    """The 4096 cap bounds only the measured min_parts floor — a
    session conf above 4096 must keep its width (the exchange must
    stay the one EnsureRequirements would insert)."""
    from eea_crawler_spark.operators.dedup import _wide_by

    df = spark.range(100).withColumn("k", F.col("id") % 7)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5000")
        assert _wide_by(df, "k").rdd.getNumPartitions() == 5000
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        dp = spark.sparkContext.defaultParallelism
        # measured floor still capped at 4096
        assert (
            _wide_by(df, "k", min_parts=10**6).rdd.getNumPartitions()
            == max(dp, 4096)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _apply_updates(labels: dict[int, int], updates: dict[int, int]):
    merged = dict(labels)
    merged.update(updates)
    return merged


def _incr(spark, base_pairs, delta_pairs, **kw):
    from eea_crawler_spark.operators.dedup import (
        update_connected_components,
    )

    base_labels = _run(spark, base_pairs) if base_pairs else {}
    lab_df = spark.createDataFrame(
        list(base_labels.items()) or [], "node long, cluster_id long"
    )
    delta_df = spark.createDataFrame(
        delta_pairs, "doc_a long, doc_b long"
    )
    updates = {
        r["node"]: r["cluster_id"]
        for r in update_connected_components(
            lab_df, delta_df, **kw
        ).collect()
    }
    return base_labels, updates


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_incremental_matches_full_recompute_random(spark, seed):
    """apply(labels, update(labels, delta)) == CC(base ∪ delta) on
    random graphs — the O(delta) nightly maintenance contract."""
    rng = random.Random(seed)
    n = 60
    all_pairs = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(70)
    ]
    base, delta = all_pairs[:40], all_pairs[40:]
    base_labels, updates = _incr(spark, base, delta)
    got = _apply_updates(base_labels, updates)
    want = _union_find_clusters([p for p in all_pairs if p[0] != p[1]])
    assert got == want
    # updated rows are the bounded set: fresh nodes + members of moved
    # clusters only — nothing else was rewritten
    for node, cid in updates.items():
        assert node not in base_labels or base_labels[node] != cid


def test_cc_incremental_shapes(spark):
    """Adversarial shapes: cluster-merge via a bridge edge, chain
    extension, intra-cluster no-op, bootstrap from empty labels."""
    base = [(1, 2), (2, 3), (10, 11), (20, 21)]
    # bridge merges {1,2,3} with {10,11}; extend chain; new pair
    delta = [(3, 10), (21, 22), (30, 31)]
    base_labels, updates = _incr(spark, base, delta)
    got = _apply_updates(base_labels, updates)
    want = _union_find_clusters(base + delta)
    assert got == want
    # the merged cluster re-rooted every member of the higher root
    assert updates[10] == 1 and updates[11] == 1
    # untouched cluster {20,21} base rows NOT in updates (21→22 chain
    # extension only adds node 22)
    assert updates.get(22) == 20 and 21 not in updates and 20 not in updates
    # intra-cluster edge = pure no-op
    _, noop = _incr(spark, base, [(1, 3)])
    assert noop == {}
    # bootstrap: empty labels == plain connected_components
    _, boot = _incr(spark, [], delta)
    assert boot == _union_find_clusters(delta)


@pytest.mark.parametrize("seed", [3, 4])
def test_cc_incremental_driver_path_equals_distributed(spark, seed):
    """Round-14 fold fast path: update_connected_components with the
    n_pairs gate (driver union-find over the contracted delta) must be
    row-identical to the distributed path on random graphs, including
    merges, chain extensions, intra-cluster no-ops and fresh nodes."""
    rng = random.Random(seed)
    n = 50
    all_pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(60)]
    base, delta = all_pairs[:35], all_pairs[35:]
    base_labels, dist = _incr(spark, base, delta)
    _, drv = _incr(spark, base, delta, n_pairs=len(delta))
    assert drv == dist
    got = _apply_updates(base_labels, drv)
    want = _union_find_clusters([p for p in all_pairs if p[0] != p[1]])
    assert got == want
    # bootstrap (empty labels) and no-op batches through the fast path
    _, boot = _incr(spark, [], delta, n_pairs=len(delta))
    assert boot == _union_find_clusters(
        [p for p in delta if p[0] != p[1]]
    )
    _, noop = _incr(spark, base, [(base[0][0], base[0][1])], n_pairs=1)
    assert noop == {}


def test_canonical_keep_by_null_ordering(spark):
    """The keep_by null contract: unscored docs never beat scored
    siblings; an all-null cluster falls back to min id; exactly one
    keeper per cluster in every mix."""
    docs = spark.createDataFrame(
        [
            # cluster {1,2,3}: only 3 is scored -> 3 wins
            (1, None), (2, None), (3, 0.1),
            # cluster {10,11}: all null -> min id 10 wins
            (10, None), (11, None),
            # cluster {20,21}: scored tie -> min id 20 wins
            (20, 5.0), (21, 5.0),
        ],
        "doc_id long, q double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "doc_a long, doc_b long"
    )
    out = {
        r["doc_id"]: r["keep"]
        for r in canonical_docs(docs, pairs, keep_by="q").collect()
    }
    assert out == {
        1: False, 2: False, 3: True,
        10: True, 11: False,
        20: True, 21: False,
    }


def test_ck_arrays_stats_and_equivalence(spark):
    """Round-13 observe piggyback: CkArrays' checkpoint-time statistics
    must equal the direct aggregate probe, and the operators must
    return identical pairs whether handed a CkArrays, a plain
    checkpointed arrays DataFrame, or nothing."""
    from pyspark.sql import functions as F

    from eea_crawler_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "one two three four five six seven eight"),
            (4, ""),  # empty doc: zero shingles, still a row
        ],
        "doc_id long, text string",
    )
    ck = DD.ck_shingle_arrays(docs)
    probe = (
        DD.shingle_arrays(docs)
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.coalesce(F.sum(F.size("g")), F.lit(0)).alias("s"),
        )
        .first()
    )
    assert ck.stats == (int(probe["c"]), int(probe["s"]))

    plain = DD.shingle_arrays(docs).localCheckpoint(eager=True)
    got_ck = DD.ngram_jaccard_pairs(
        docs, threshold=0.5, max_df=64, arrays=ck
    ).collect()
    got_plain = DD.ngram_jaccard_pairs(
        docs, threshold=0.5, max_df=64, arrays=plain
    ).collect()
    got_none = DD.ngram_jaccard_pairs(docs, threshold=0.5, max_df=64).collect()
    as_tuples = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    assert as_tuples(got_ck) == as_tuples(got_plain) == as_tuples(got_none)
    assert len(got_ck) == 1  # docs 1-2 are near-dups at t=0.5
