"""Incremental (delta-vs-corpus) dedup: the nightly-ingest pipeline
shape (round-8 VERDICT #1).

THE contract pinned here, for every operator in the family: running the
delta form — ``op(new, against=corpus)`` — produces EXACTLY the
self-join over ``new ∪ corpus`` restricted to pairs touching the delta.
The corpora are synthesized with near-dup clusters deliberately
STRADDLING the delta/corpus boundary (delta-delta, delta-corpus and
corpus-corpus pairs all exist), so a candidate-enumeration bug on any
side of the boundary flips the compare. The reference shape honored is
the sync's own J1 diff semantics (crawl_plone_restapi.py:145-161 —
only changed docs pay).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from eea_crawler_spark.operators import dedup as DD
from eea_crawler_spark.operators import similarity as SIM

THRESH = 0.8


def _mk_docs(spark, n_docs=120, seed=3):
    """Synthetic text corpus with near-dup clusters of 6 consecutive
    docs (a fresh 80-word base, then five single-word mutations of it —
    any two members share ≥76 of ≤84 distinct shingles, J ≥ ~0.86).
    Splitting delta/corpus on doc_id % 5 then puts ids 6k and 6k+5·m in
    the same cluster for some k, so delta-delta, delta-corpus AND
    corpus-corpus near-dup pairs all exist (asserted below)."""
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    base = None
    for i in range(n_docs):
        if i % 6 == 0 or base is None:
            base = [vocab[j] for j in rng.randint(0, 300, 80)]
            words = base
        else:
            words = list(base)
            words[(i % 6 - 1) * 3] = vocab[int(rng.randint(0, 300))]
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return df.filter(F.col("doc_id") % 5 == 0), df.filter(
        F.col("doc_id") % 5 != 0
    )


def _touching(pairs, delta_ids):
    return {
        k: v for k, v in pairs.items() if k[0] in delta_ids or k[1] in delta_ids
    }


@pytest.fixture(scope="module")
def text_split(spark):
    new, corpus = _mk_docs(spark)
    delta_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    union = new.unionByName(corpus)
    return new, corpus, union, delta_ids


def _pairset(df, cols=("doc_a", "doc_b", "jaccard")):
    return {
        (r[cols[0]], r[cols[1]]): tuple(r[c] for c in cols[2:]) or r[cols[2]]
        for r in df.collect()
    }


@pytest.mark.parametrize("max_df", [None, 20])
def test_ngram_delta_equals_restricted_self_join(spark, text_split, max_df):
    new, corpus, union, delta_ids = text_split
    full = _pairset(
        DD.ngram_jaccard_pairs(union, threshold=THRESH, max_df=max_df)
    )
    want = _touching(full, delta_ids)
    got = _pairset(
        DD.ngram_jaccard_pairs(
            new, threshold=THRESH, max_df=max_df, against=corpus
        )
    )
    assert got == want
    # the fixture exercises all three pair classes
    assert any(k[0] in delta_ids and k[1] in delta_ids for k in want)
    assert any((k[0] in delta_ids) != (k[1] in delta_ids) for k in want)
    assert any(
        k[0] not in delta_ids and k[1] not in delta_ids for k in full
    )


def test_ngram_delta_with_persisted_state(spark, text_split, tmp_path):
    """The serving layout: corpus arrays persisted once, the delta probe
    reads them instead of re-shingling — output unchanged."""
    new, corpus, union, delta_ids = text_split
    DD.build_text_dedup_state(corpus, str(tmp_path / "state"))
    arrays, sigs = DD.read_text_dedup_state(spark, str(tmp_path / "state"))
    want = _pairset(
        DD.ngram_jaccard_pairs(new, threshold=THRESH, max_df=20, against=corpus)
    )
    got = _pairset(
        DD.ngram_jaccard_pairs(
            new, threshold=THRESH, max_df=20, against=corpus,
            against_arrays=arrays,
        )
    )
    assert got == want


def test_minhash_delta_equals_restricted_self_join(spark, text_split, tmp_path):
    new, corpus, union, delta_ids = text_split
    cols = ("doc_a", "doc_b", "est_jaccard", "jaccard")
    full = {
        (r["doc_a"], r["doc_b"]): (r["est_jaccard"], r["jaccard"])
        for r in DD.minhash_lsh_pairs(union, threshold=THRESH).collect()
    }
    want = _touching(full, delta_ids)
    got = {
        (r["doc_a"], r["doc_b"]): (r["est_jaccard"], r["jaccard"])
        for r in DD.minhash_lsh_pairs(
            new, threshold=THRESH, against=corpus
        ).collect()
    }
    assert got == want and want
    # persisted signatures/arrays: zero corpus-side recompute, same rows
    DD.build_text_dedup_state(corpus, str(tmp_path / "state"))
    arrays, sigs = DD.read_text_dedup_state(spark, str(tmp_path / "state"))
    got2 = {
        (r["doc_a"], r["doc_b"]): (r["est_jaccard"], r["jaccard"])
        for r in DD.minhash_lsh_pairs(
            new, threshold=THRESH, against=corpus,
            against_arrays=arrays, against_sigs=sigs,
        ).collect()
    }
    assert got2 == want


def _mk_vecs(spark, n=160, dim=24, seed=9):
    """Vector corpus with planted near-dups straddling the boundary."""
    rng = np.random.RandomState(seed)
    rows = []
    base = None
    for i in range(n):
        if i % 6 == 0 or base is None:
            base = rng.standard_normal(dim)
            v = base
        else:
            v = base + 0.02 * rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    return df.filter(F.col("vec_id") % 5 == 0), df.filter(
        F.col("vec_id") % 5 != 0
    )


def test_neardup_delta_equals_restricted_self_join(spark, monkeypatch):
    new, state = _mk_vecs(spark)
    delta_ids = {r["vec_id"] for r in new.select("vec_id").collect()}
    union = new.unionByName(state)
    t = 0.9
    full = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs(union, threshold=t).collect()
    }
    want = _touching(full, delta_ids)
    got = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs(new, threshold=t, against=state).collect()
    }
    assert got == want and want
    assert any((k[0] in delta_ids) != (k[1] in delta_ids) for k in want)
    # force the blocked-cross plan (delta past the broadcast gate):
    # bit-identical output, nothing driver-side
    monkeypatch.setattr(SIM, "NEARDUP_BROADCAST_MAX_BYTES", 0)
    monkeypatch.setattr(SIM, "NEARDUP_BLOCK_BYTES", 2048)
    got_blocked = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs(new, threshold=t, against=state).collect()
    }
    assert got_blocked == want


@pytest.mark.slow
def test_neardup_escalation_gate(spark):
    """Round-8 VERDICT #5: past NEARDUP_LSH_ESCALATE_BYTES the exact
    operator delegates to the LSH twin with threshold-derived banding —
    the output becomes a high-recall SUBSET with identical cosines (the
    documented operator-selection rule), and escalate_bytes=None forces
    the exact plan back."""
    new, state = _mk_vecs(spark, n=120)
    df = new.unionByName(state)
    t = 0.9
    exact = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs(df, threshold=t, escalate_bytes=None).collect()
    }
    escalated = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs(df, threshold=t, escalate_bytes=1).collect()
    }
    # escalated == the LSH twin at the derived params, a subset of exact
    nb, bp = SIM._lsh_params_for(t)
    twin = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs_lsh(
            df, threshold=t, n_bands=nb, band_planes=bp
        ).collect()
    }
    assert escalated == twin
    assert set(escalated) <= set(exact)
    assert all(exact[k] == v for k, v in escalated.items())
    # high recall on this near-dup-rich corpus
    assert len(escalated) >= 0.95 * len(exact)
    # low thresholds never escalate (LSH cannot prune there — the
    # documented exactness guard): same output with the gate forced
    low_gate = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs(df, threshold=0.4, escalate_bytes=1).collect()
    }
    low_exact = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs(
            df, threshold=0.4, escalate_bytes=None
        ).collect()
    }
    assert low_gate == low_exact


@pytest.mark.slow
def test_ngram_delta_serving_state(spark, text_split, tmp_path):
    """The FULL serving layout (prefix/prefix_df/hp0 persisted): probe
    output identical to the stateless delta probe and the restricted
    self-join, with the corpus text never passed in at all."""
    new, corpus, union, delta_ids = text_split
    path = str(tmp_path / "state")
    DD.build_text_dedup_state(corpus, path, threshold=THRESH, max_df=20)
    state = DD.read_text_dedup_state_full(spark, path)
    assert {"prefix_df", "hp0", "spec"} <= state.keys()
    full = _pairset(
        DD.ngram_jaccard_pairs(union, threshold=THRESH, max_df=20)
    )
    want = _touching(full, delta_ids)
    got = _pairset(
        DD.ngram_jaccard_pairs(
            new, threshold=THRESH, max_df=20, against_state=state
        )
    )
    assert got == want and want
    # spec mismatch refuses loudly instead of silently diverging
    with pytest.raises(ValueError, match="rebuild the state"):
        DD.ngram_jaccard_pairs(
            new, threshold=0.9, max_df=20, against_state=state
        )
    with pytest.raises(ValueError, match="rebuild the state"):
        DD.ngram_jaccard_pairs(
            new, threshold=THRESH, max_df=21, against_state=state
        )


@pytest.mark.slow
def test_ngram_delta_serving_state_tipped_hot(spark, tmp_path):
    """The hard statistics case: the DELTA tips a shingle's union df
    over max_df, so hot-set membership AND corpus docs' hp counts
    differ from the persisted corpus-only aggregates — the probe's
    tipped-correction must reconstruct the exact union statistics.
    Corpus: a near-dup cluster sharing a boilerplate phrase whose
    corpus df sits exactly AT max_df; delta: near-dups of the cluster
    carrying the same phrase (tipping it) — with a low max_df the
    phrase's shingles are the cluster's ONLY shared prefix entries, so
    an undercounted hp prunes true pairs (the self-join's
    hot-boilerplate proof, re-run against the serving path)."""
    boiler = "alpha beta gamma delta epsilon zeta"
    rng = np.random.RandomState(11)
    vocab = [f"v{i}" for i in range(400)]
    shared = " ".join(vocab[j] for j in rng.randint(0, 400, 30))
    rows = []
    for i in range(40):
        if i < 6:  # the near-dup cluster: boilerplate + shared filler,
            # one mutated word per member (outside the boilerplate);
            # 4 corpus + 2 delta members, so shared shingles' corpus
            # prefix df sits AT max_df=4 — hot only with the delta
            words = (boiler + " " + shared).split()
            words[10 + i % 3] = vocab[int(rng.randint(0, 400))]
            rows.append((i, " ".join(words)))
        else:  # noise docs, no boilerplate, fresh filler
            rows.append(
                (i, " ".join(vocab[j] for j in rng.randint(0, 400, 30)))
            )
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    new = df.filter(F.col("doc_id") % 4 == 0)
    corpus = df.filter(F.col("doc_id") % 4 != 0)
    delta_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    max_df = 4  # cluster: 4 corpus + 2 delta members — delta tips it
    path = str(tmp_path / "state")
    DD.build_text_dedup_state(corpus, path, threshold=0.5, max_df=max_df)
    state = DD.read_text_dedup_state_full(spark, path)

    def _hot(docs_df):
        pre = DD._prefix_relation(DD.shingle_arrays(docs_df), 0.5)
        cnt = pre.groupBy("shingle").count().filter(
            F.col("count") > max_df
        )
        return {r["shingle"] for r in cnt.collect()}

    # the fixture's point: union-hot shingles the corpus-only stats
    # miss MUST exist, or this test silently stops covering the
    # tipped-correction path
    assert _hot(df) - _hot(corpus)
    full = _pairset(
        DD.ngram_jaccard_pairs(df, threshold=0.5, max_df=max_df)
    )
    want = _touching(full, delta_ids)
    got = _pairset(
        DD.ngram_jaccard_pairs(
            new, threshold=0.5, max_df=max_df, against_state=state
        )
    )
    assert got == want and want
    stateless = _pairset(
        DD.ngram_jaccard_pairs(
            new, threshold=0.5, max_df=max_df, against=corpus
        )
    )
    assert stateless == want


@pytest.mark.slow
def test_minhash_delta_serving_state(spark, text_split, tmp_path):
    """Full serving layout for MinHash: the persisted band relation
    (plus arrays/sigs) drives the probe — output identical to the
    stateless delta form; a bands/num_hashes spec mismatch refuses."""
    new, corpus, union, delta_ids = text_split
    path = str(tmp_path / "state")
    DD.build_text_dedup_state(corpus, path, threshold=THRESH, max_df=20)
    state = DD.read_text_dedup_state_full(spark, path)
    assert "bands" in state and state["spec"]["bands"] == 16
    want = {
        (r["doc_a"], r["doc_b"]): (r["est_jaccard"], r["jaccard"])
        for r in DD.minhash_lsh_pairs(
            new, threshold=THRESH, against=corpus
        ).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): (r["est_jaccard"], r["jaccard"])
        for r in DD.minhash_lsh_pairs(
            new, threshold=THRESH, against_state=state
        ).collect()
    }
    assert got == want and want
    with pytest.raises(ValueError, match="rebuild the state"):
        DD.minhash_lsh_pairs(
            new, threshold=THRESH, against_state=state, bands=8
        )
    with pytest.raises(ValueError, match="rebuild the state"):
        DD.minhash_lsh_pairs(
            new, threshold=THRESH, against_state=state, num_hashes=32
        )


@pytest.mark.slow
def test_neardup_lsh_delta_equals_restricted_union(spark, tmp_path):
    """Incremental banded near-dup (the embedding family's SCALE
    incremental form): probe output == neardup_pairs_lsh over the
    union restricted to delta-touching pairs, with the persisted
    partitioned state; every emitted cosine also matches the exact
    operator (subset contract); bucket-cap invariance and spec
    refusal."""
    new, corpus = _mk_vecs(spark, n=200, dim=16, seed=5)
    delta_ids = {r["vec_id"] for r in new.select("vec_id").collect()}
    union = new.unionByName(corpus)
    t, nb, bp = 0.9, 6, 4
    full = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs_lsh(
            union, threshold=t, n_bands=nb, band_planes=bp
        ).collect()
    }
    want = _touching(full, delta_ids)
    path = str(tmp_path / "emb_state")
    SIM.build_embedding_state(corpus, path, n_bands=nb, band_planes=bp)
    state = SIM.read_embedding_state(spark, path)
    got = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs_lsh(
            new, threshold=t, n_bands=nb, band_planes=bp,
            against_state=state,
        ).collect()
    }
    assert got == want and want
    # all three pair classes present (delta-delta, delta-corpus in the
    # output; corpus-corpus only in the full set)
    assert any(k[0] in delta_ids and k[1] in delta_ids for k in want)
    assert any((k[0] in delta_ids) != (k[1] in delta_ids) for k in want)
    assert any(
        k[0] not in delta_ids and k[1] not in delta_ids for k in full
    )
    # subset-of-exact with IDENTICAL cosines (the twin contract)
    exact = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs(
            new, threshold=t, against=corpus, escalate_bytes=None
        ).collect()
    }
    assert set(got) <= set(exact)
    assert all(exact[k] == v for k, v in got.items())
    # cap-invariance: a tiny cap forces every bucket through the
    # slice-pair fan-out — output unchanged
    got_capped = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs_lsh(
            new, threshold=t, n_bands=nb, band_planes=bp,
            against_state=state, max_bucket_rows=2,
        ).collect()
    }
    assert got_capped == got
    with pytest.raises(ValueError, match="rebuild the state"):
        SIM.neardup_pairs_lsh(
            new, threshold=t, n_bands=nb, band_planes=8,
            against_state=state,
        )
    # empty delta short-circuits
    assert (
        SIM.neardup_pairs_lsh(
            new.filter(F.lit(False)), threshold=t, n_bands=nb,
            band_planes=bp, against_state=state,
        ).count()
        == 0
    )


def test_simhash_delta_equals_restricted_self_join(spark, text_split, tmp_path):
    """SimHash incremental form: delta band rows drive the candidate
    join; output == union self-join restricted to delta-touching
    pairs, from raw corpus AND from the persisted band relation."""
    new, corpus, union, delta_ids = text_split
    full = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in DD.simhash_pairs(union).collect()
    }
    want = _touching(full, delta_ids)
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in DD.simhash_pairs(new, against=corpus).collect()
    }
    assert got == want and want
    path = str(tmp_path / "state")
    DD.build_text_dedup_state(corpus, path)
    state = DD.read_text_dedup_state_full(spark, path)
    got2 = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in DD.simhash_pairs(
            new, against_bands=state["simhash"]
        ).collect()
    }
    assert got2 == want


def test_prefix_dedup_delta_equals_restricted_union(spark, tmp_path):
    """Exact-dedup incremental form, including the winner-takeover
    case (a delta doc with a smaller id than the standing key winner
    dethrones it — exactly what the union run would do)."""
    mk = lambda i, t: (i, t)  # noqa: E731
    shared_a = "alpha beta gamma delta epsilon zeta eta theta"
    shared_b = "one two three four five six seven eight nine ten"
    rows = [
        mk(0, shared_a + " tail x"),   # delta (0 % 4 == 0): NEW winner
        mk(5, shared_a + " tail y"),   # corpus: was the key's winner
        mk(9, shared_a + " tail z"),   # corpus: stays dropped, new keep
        mk(2, shared_b + " u"),        # corpus
        mk(3, shared_b + " v"),        # corpus — corpus-corpus dup pair
        mk(8, shared_b + " w"),        # delta: dropped by corpus winner
        mk(7, "completely different text here"),  # corpus unique
        mk(12, "another unique delta document"),  # delta unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = df.filter(F.col("doc_id") % 4 == 0)
    corpus = df.filter(F.col("doc_id") % 4 != 0)
    delta_ids = {0, 8, 12}
    full = {
        (r["dropped_id"], r["keep_id"]): r["key"]
        for r in DD.prefix_dedup(df).collect()
    }
    want = {
        k: v
        for k, v in full.items()
        if k[0] in delta_ids or k[1] in delta_ids
    }
    got = {
        (r["dropped_id"], r["keep_id"]): r["key"]
        for r in DD.prefix_dedup(new, against=corpus).collect()
    }
    assert got == want and want
    # the takeover really happened: 5 and 9 are now dropped under 0
    assert (5, 0) in got and (9, 0) in got and (8, 2) in got
    # corpus-corpus rows on untouched keys are NOT emitted
    assert (3, 2) in full and (3, 2) not in got
    # persisted keys relation: identical output
    path = str(tmp_path / "state")
    DD.build_text_dedup_state(corpus, path)
    state = DD.read_text_dedup_state_full(spark, path)
    got2 = {
        (r["dropped_id"], r["keep_id"]): r["key"]
        for r in DD.prefix_dedup(
            new, against_keys=state["keys"]
        ).collect()
    }
    assert got2 == want
    # state-dict form: identical output, and the spec guards the key
    # length — a probe at a different n would silently mix key lengths
    got3 = {
        (r["dropped_id"], r["keep_id"]): r["key"]
        for r in DD.prefix_dedup(new, against_state=state).collect()
    }
    assert got3 == want
    with pytest.raises(ValueError, match="rebuild the state"):
        DD.prefix_dedup(new, n=10, against_state=state)
    with pytest.raises(ValueError, match="rebuild the state"):
        DD.prefix_dedup(new, against_state={"spec": state["spec"]})


@pytest.mark.slow
def test_embedding_state_auto_band_params(spark, tmp_path):
    """band_planes='auto' (round-9 verdict): the default state must be
    probe-usable for the declared delta — planes sized so expected
    bucket coverage stays well under 1, band count re-derived so
    recall at the threshold holds ≥ ~0.98; the probe picks its params
    up from the spec without the caller re-specifying them."""
    # auto math: planes from 4×expected_delta, bands from the banding
    # calculus at the threshold
    nb, bp = SIM._auto_band_params(
        10**6, expected_delta_rows=50_000, threshold=0.9
    )
    assert 2**bp >= 4 * 50_000  # pruning engages at the declared delta
    assert bp <= 20
    p = 1.0 - np.arccos(0.9) / np.pi
    assert 1.0 - (1.0 - p**bp) ** nb >= 0.98  # recall at threshold
    # undeclared delta defaults to 1% of the corpus
    nb2, bp2 = SIM._auto_band_params(10**6, None, 0.9)
    assert 2**bp2 >= 4 * 10**4
    # end-to-end: auto-built state, probe with NO banding params
    new, corpus = _mk_vecs(spark, n=200, dim=16, seed=5)
    path = str(tmp_path / "emb_state_auto")
    SIM.build_embedding_state(
        corpus, path, expected_delta_rows=40, threshold=0.9
    )
    state = SIM.read_embedding_state(spark, path)
    spec = state["spec"]
    assert 2 ** spec["band_planes"] >= 4 * 40
    got = SIM.neardup_pairs_lsh(
        new, threshold=0.9, against_state=state
    ).collect()
    # planted near-dups straddle the delta boundary: output is
    # non-empty and a subset of the exact probe with equal cosines
    exact = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs(
            new, threshold=0.9, against=corpus, escalate_bytes=None
        ).collect()
    }
    delta_delta = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs(
            new, threshold=0.9, escalate_bytes=None
        ).collect()
    }
    exact.update(delta_delta)
    assert got
    assert all((r["a_id"], r["b_id"]) in exact for r in got)
    assert all(exact[(r["a_id"], r["b_id"])] == r["cos"] for r in got)


def test_neardup_lsh_probe_refuses_full_fan(spark, tmp_path, monkeypatch):
    """The union-FAN path (legacy layout / oversized delta) must refuse
    when the delta occupies ~every bucket (expected coverage ≥ 95%) —
    the round-9 disk-full shape; allow_full_fan=True overrides. The
    pair-verify plan (round 10) is immune: with the default gate the
    same probe succeeds and its output equals the forced fan's."""
    new, corpus = _mk_vecs(spark, n=200, dim=16, seed=5)
    path = str(tmp_path / "emb_state_tiny")
    # 2^3 = 8 buckets per band << the 40-row delta -> coverage ~1
    SIM.build_embedding_state(corpus, path, n_bands=4, band_planes=3)
    state = SIM.read_embedding_state(spark, path)
    # pair plan engages at the default gate: no refusal needed
    got_pair = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs_lsh(
            new, threshold=0.9, against_state=state
        ).collect()
    }
    assert got_pair
    # force the fan path: the valve fires, allow_full_fan overrides,
    # and both plans agree pair-for-pair with identical cosines
    monkeypatch.setattr(SIM, "NEARDUP_DELTA_MATRIX_MAX_BYTES", 0)
    with pytest.raises(ValueError, match="bucket pruning cannot"):
        SIM.neardup_pairs_lsh(new, threshold=0.9, against_state=state)
    got_fan = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs_lsh(
            new, threshold=0.9, against_state=state, allow_full_fan=True
        ).collect()
    }
    assert got_fan == got_pair


@pytest.mark.slow
def test_append_text_dedup_state_equals_rebuild(spark, tmp_path):
    """Nightly state maintenance: append(new batch) must leave every
    persisted relation equal to a full rebuild over the union —
    including the hot-tipping correction to hp0 (a delta pushing a
    corpus-cold shingle over max_df owes old ids their entries in it).
    A later probe against the appended state must equal the probe
    against the rebuilt state."""
    new, corpus = _mk_docs(spark, n_docs=120)
    # a second batch to probe with afterwards
    later, _ = _mk_docs(spark, n_docs=40, seed=77)
    later = later.withColumn("doc_id", F.col("doc_id") + 1000)
    kw = dict(threshold=THRESH, max_df=20)
    p_app = str(tmp_path / "appended")
    p_reb = str(tmp_path / "rebuilt")
    DD.build_text_dedup_state(corpus, p_app, **kw)
    got = DD.append_text_dedup_state(spark, p_app, new)
    assert got["appended"] == new.count()
    DD.build_text_dedup_state(corpus.unionByName(new), p_reb, **kw)
    sa = DD.read_text_dedup_state_full(spark, p_app)
    sr = DD.read_text_dedup_state_full(spark, p_reb)
    assert set(sa.keys()) == set(sr.keys())

    def rows(df, *cols):
        return sorted(
            tuple(r[c] for c in cols) for r in df.collect()
        )

    assert rows(sa["keys"], "id", "key") == rows(sr["keys"], "id", "key")
    assert rows(sa["arrays"], "id", "g") == rows(sr["arrays"], "id", "g")
    assert rows(sa["sigs"], "id", "sig") == rows(sr["sigs"], "id", "sig")
    assert rows(sa["prefix_df"], "shingle", "df") == rows(
        sr["prefix_df"], "shingle", "df"
    )
    assert rows(sa["hp0"], "id", "hp") == rows(sr["hp0"], "id", "hp")
    sh_cols = [c for c in sa["simhash"].columns]
    assert rows(sa["simhash"], *sh_cols) == rows(sr["simhash"], *sh_cols)
    b_cols = [c for c in sa["bands"].columns]
    assert rows(sa["bands"], *b_cols) == rows(sr["bands"], *b_cols)
    assert sa["spec"] == sr["spec"]
    # a later probe sees identical pairs through either state
    pa = _pairset(
        DD.ngram_jaccard_pairs(
            later, threshold=THRESH, max_df=20, against_state=sa
        )
    )
    pr = _pairset(
        DD.ngram_jaccard_pairs(
            later, threshold=THRESH, max_df=20, against_state=sr
        )
    )
    assert pa == pr
    # strictly-new-ids contract: re-appending the same batch raises
    with pytest.raises(ValueError, match="strictly-NEW"):
        DD.append_text_dedup_state(spark, p_app, new)
    # empty batch is a no-op
    assert DD.append_text_dedup_state(
        spark, p_app, new.filter(F.lit(False))
    ) == {"appended": 0, "tipped": 0}


@pytest.mark.slow
def test_append_embedding_state_equals_rebuild(spark, tmp_path):
    """Embedding state append: signed relation and spec equal a full
    rebuild over the union; probes see the appended rows."""
    new, corpus = _mk_vecs(spark, n=200, dim=16, seed=5)
    later = new.withColumn("vec_id", F.col("vec_id") + 5000)
    p_app = str(tmp_path / "emb_app")
    p_reb = str(tmp_path / "emb_reb")
    SIM.build_embedding_state(
        corpus, p_app, expected_delta_rows=40, threshold=0.9
    )
    assert DD.append_embedding_state(spark, p_app, new) == new.count()
    SIM.build_embedding_state(
        corpus.unionByName(new), p_reb, expected_delta_rows=40,
        threshold=0.9,
    )
    sa = SIM.read_embedding_state(spark, p_app)
    sr = SIM.read_embedding_state(spark, p_reb)
    assert sa["spec"] == sr["spec"]
    ra = sorted(
        (r["vec_id"], r["band"], r["bucket"])
        for r in sa["signed"].collect()
    )
    rr = sorted(
        (r["vec_id"], r["band"], r["bucket"])
        for r in sr["signed"].collect()
    )
    assert ra == rr
    pa = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs_lsh(
            later, threshold=0.9, against_state=sa
        ).collect()
    }
    pr = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs_lsh(
            later, threshold=0.9, against_state=sr
        ).collect()
    }
    assert pa == pr and pa


@pytest.mark.slow
def test_repair_embedding_state_equals_rebuild(spark, tmp_path):
    """Embedding-state update-in-place (round 12): evicting modified
    ids partition-locally and re-appending their NEW vectors leaves
    the state relation-by-relation EQUAL to a rebuild over the
    corrected corpus, deletions included — and a later probe through
    the repaired state equals the probe through the rebuilt one."""
    _, corpus = _mk_vecs(spark, n=240, dim=16, seed=6)
    later = corpus.limit(30).withColumn(
        "vec_id", F.col("vec_id") + 9000
    )
    mod = corpus.filter(F.col("vec_id") % 17 == 1).withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x * F.lit(-1.0)).cast("float")),
    )
    doomed = corpus.filter(
        (F.col("vec_id") % 13 == 2) & (F.col("vec_id") % 17 != 1)
    ).select("vec_id")
    p_rep = str(tmp_path / "emb_rep")
    p_reb = str(tmp_path / "emb_reb")
    SIM.build_embedding_state(
        corpus, p_rep, expected_delta_rows=40, threshold=0.9
    )
    r = SIM.repair_embedding_state(
        spark, p_rep, updates=mod, deleted_ids=doomed
    )
    n_mod, n_doomed = mod.count(), doomed.count()
    assert r["reassigned"] == n_mod
    assert r["removed"] == n_mod + n_doomed
    corrected = (
        corpus.join(mod.select("vec_id"), ["vec_id"], "left_anti")
        .join(doomed, ["vec_id"], "left_anti")
        .unionByName(mod)
    )
    assert r["n"] == corrected.count()
    SIM.build_embedding_state(
        corrected, p_reb, expected_delta_rows=40, threshold=0.9
    )
    sa = SIM.read_embedding_state(spark, p_rep)
    sr = SIM.read_embedding_state(spark, p_reb)
    # spec parity up to the band params derived from n (the repair
    # keeps the STANDING banding; the rebuild re-derives from the
    # corrected count) — compare the layout fields that must agree
    assert sa["spec"]["dim"] == sr["spec"]["dim"]
    assert sa["spec"]["n"] == sr["spec"]["n"]
    assert sa["spec"]["n_vb"] == sr["spec"]["n_vb"]
    ra = sorted(
        (r["vec_id"], r["band"], r["bucket"])
        for r in sa["signed"].collect()
    )
    # the rebuilt state's banding params may differ (auto from a
    # different n) — re-sign the corrected corpus under the REPAIRED
    # state's own params for the exact row-set comparison
    SIM.build_embedding_state(
        corrected, str(tmp_path / "emb_same_params"),
        n_bands=sa["spec"]["n_bands"],
        band_planes=sa["spec"]["band_planes"],
        threshold=0.9,
    )
    rr = sorted(
        (r["vec_id"], r["band"], r["bucket"])
        for r in SIM.read_embedding_state(
            spark, str(tmp_path / "emb_same_params")
        )["signed"].collect()
    )
    assert ra == rr
    va = sorted(
        (r["vec_id"], tuple(round(float(x), 6) for x in r["embedding"]))
        for r in sa["vectors"].select("vec_id", "embedding").collect()
    )
    vr = sorted(
        (r["vec_id"], tuple(round(float(x), 6) for x in r["embedding"]))
        for r in sr["vectors"].select("vec_id", "embedding").collect()
    )
    assert va == vr
    pa = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs_lsh(
            later, threshold=0.9, against_state=sa
        ).collect()
    }
    pr = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in SIM.neardup_pairs_lsh(
            later, threshold=0.9, against_state=sr
        ).collect()
    }
    assert pa == pr and pa


@pytest.mark.slow
def test_repair_embedding_state_partition_local(spark, tmp_path):
    """The O(stale) property is PHYSICAL: repairing one id leaves
    every untouched vb bucket's files byte-identical, and refuses
    legacy/duplicate/mis-sized inputs."""
    import os

    _, corpus = _mk_vecs(spark, n=200, dim=16, seed=7)
    p = str(tmp_path / "emb")
    SIM.build_embedding_state(
        corpus, p, expected_delta_rows=40, threshold=0.9
    )
    victim = corpus.limit(1)
    vb = victim.select(
        SIM._vb_col("vec_id").alias("vb")
    ).first()["vb"]

    def _vfiles():
        out = {}
        for d in os.listdir(f"{p}/vectors"):
            if not d.startswith("vb="):
                continue
            full = f"{p}/vectors/{d}"
            out[d] = {
                (f, os.path.getmtime(f"{full}/{f}"))
                for f in os.listdir(full) if f.endswith(".parquet")
            }
        return out

    before = _vfiles()
    mod = victim.withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x + F.lit(3.0)).cast("float")),
    )
    r = SIM.repair_embedding_state(spark, p, updates=mod)
    assert r["reassigned"] == 1 and r["removed"] == 1
    after = _vfiles()
    for d in before:
        if d != f"vb={vb}":
            assert after[d] == before[d], f"{d} was rewritten"
    assert after[f"vb={vb}"] != before[f"vb={vb}"]
    # refusals: duplicate update ids; dim mismatch; legacy layout
    with pytest.raises(ValueError, match="unique per id"):
        SIM.repair_embedding_state(
            spark, p, updates=mod.unionByName(mod)
        )
    bad = spark.createDataFrame(
        [(0, [0.0] * 17)], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="-d"):
        SIM.repair_embedding_state(spark, p, updates=bad)
    import shutil

    legacy = str(tmp_path / "legacy")
    SIM.build_embedding_state(
        corpus, legacy, expected_delta_rows=40, threshold=0.9
    )
    # strip the partitioning: rewrite vectors unpartitioned
    flat = spark.read.parquet(f"{legacy}/vectors").select(
        "vec_id", "embedding"
    ).localCheckpoint(eager=True)
    shutil.rmtree(f"{legacy}/vectors")
    flat.write.parquet(f"{legacy}/vectors")
    with pytest.raises(ValueError, match="legacy"):
        SIM.repair_embedding_state(spark, legacy, updates=mod)


@pytest.mark.slow
def test_dedup_maintenance_embedding_repair_in_place(spark, tmp_path):
    """The composed leg with DedupConfig.repair_in_place: a modified
    doc's FUTURE probes compare against its NEW vector (old-vector
    matches vanish, new-vector matches appear), deletions leave the
    state, unchanged re-deliveries carry no debt, and text methods
    refuse the flag."""
    from eea_crawler_spark.pipeline import (
        DedupConfig,
        run_dedup_maintenance,
    )

    _, corpus = _mk_vecs(spark, n=120, dim=16, seed=8)
    dcfg = DedupConfig(
        state_path=str(tmp_path / "state"),
        clusters_path=str(tmp_path / "clusters"),
        flags_path=str(tmp_path / "flags"),
        method="embedding",
        cos_threshold=0.9,
        expected_delta_rows=20,
        repair_in_place=True,
    )
    from eea_crawler_spark.pipeline import bootstrap_dedup_maintenance

    bootstrap_dedup_maintenance(spark, dcfg, corpus, id_col="vec_id")
    # pick a doc and re-deliver it ORTHOGONALIZED away from everything
    victim = corpus.filter(F.col("vec_id") == 1)
    dim = 16
    mod = victim.withColumn(
        "embedding",
        F.array(
            *[F.lit(float(1000 * (i == 7))).cast("float")
              for i in range(dim)]
        ),
    )
    r = run_dedup_maintenance(spark, dcfg, mod, id_col="vec_id")
    assert r["repaired"] == 1 and r["stale"] == 1
    # future probe with the victim's OLD vector: no pair with the
    # victim id at ~1.0 cosine via its old value — the state holds the
    # NEW vector now, so the old near-identical match is gone
    probe_old = victim.withColumn("vec_id", F.lit(77777).cast("bigint"))
    state = SIM.read_embedding_state(spark, dcfg.state_path)
    pairs_old = {
        (r["a_id"], r["b_id"])
        for r in SIM.neardup_pairs_lsh(
            probe_old, threshold=0.99, against_state=state
        ).collect()
    }
    assert not any(1 in p for p in pairs_old)
    # and a probe WITH the new vector matches it exactly
    probe_new = mod.withColumn("vec_id", F.lit(88888).cast("bigint"))
    pairs_new = {
        (r["a_id"], r["b_id"])
        for r in SIM.neardup_pairs_lsh(
            probe_new, threshold=0.99, against_state=state
        ).collect()
    }
    assert any(1 in p for p in pairs_new)
    # unchanged re-delivery: nothing repaired, nothing ledgered
    r2 = run_dedup_maintenance(
        spark, dcfg, corpus.filter(F.col("vec_id") == 6), id_col="vec_id"
    )
    assert r2["repaired"] == 0 and r2["stale"] == 0
    # deletions leave the state physically
    r3 = run_dedup_maintenance(
        spark, dcfg,
        corpus.filter(F.lit(False)),
        id_col="vec_id",
        deleted_ids=corpus.filter(F.col("vec_id") == 11).select("vec_id"),
    )
    ids = {
        r["vec_id"]
        for r in spark.read.parquet(f"{dcfg.state_path}/vectors")
        .select("vec_id").collect()
    }
    assert 11 not in ids
    # round 13: text methods take the flag too — but a LEGACY state
    # layout (keys without text_hash) refuses loudly instead of
    # silently missing changes
    import shutil

    from eea_crawler_spark.pipeline import bootstrap_dedup_maintenance as BS

    legacy_cfg = DedupConfig(
        state_path=str(tmp_path / "s2"),
        clusters_path=str(tmp_path / "c2"),
        flags_path=str(tmp_path / "f2"),
        method="ngram",
        repair_in_place=True,
    )
    docs = spark.createDataFrame(
        [(f"d{i}", f"some words {i} " * 10) for i in range(6)],
        "id string, fulltext string",
    )
    BS(spark, legacy_cfg, docs)
    flat_keys = spark.read.parquet(
        f"{legacy_cfg.state_path}/keys"
    ).select("id", "key").localCheckpoint(eager=True)
    shutil.rmtree(f"{legacy_cfg.state_path}/keys")
    flat_keys.write.parquet(f"{legacy_cfg.state_path}/keys")
    with pytest.raises(ValueError, match="round-13"):
        run_dedup_maintenance(
            spark, legacy_cfg,
            docs.limit(1).withColumn("fulltext", F.lit("edited body")),
        )


@pytest.mark.parametrize("exact_mode", [False, True])
@pytest.mark.slow
def test_dedup_repair_changed_and_deleted_counts_as_deleted(
    spark, tmp_path, exact_mode
):
    """round-12 ADVICE: a doc present in BOTH the delta (changed
    vector) and deleted_ids must count as DELETED — without the
    anti-join the repair evicts the row then RE-INSERTS it via
    updates, silently undoing the deletion. Pinned for both the
    repair mode and the exact-labels mode (the two call sites)."""
    from eea_crawler_spark.pipeline import (
        DedupConfig,
        bootstrap_dedup_maintenance,
        run_dedup_maintenance,
    )

    _, corpus = _mk_vecs(spark, n=120, dim=16, seed=9)
    sub = str(tmp_path / ("exact" if exact_mode else "repair"))
    dcfg = DedupConfig(
        state_path=f"{sub}/state",
        clusters_path=f"{sub}/clusters",
        flags_path=f"{sub}/flags",
        method="embedding",
        cos_threshold=0.9,
        expected_delta_rows=20,
        repair_in_place=True,
        pairs_path=f"{sub}/pairs" if exact_mode else None,
    )
    bootstrap_dedup_maintenance(spark, dcfg, corpus, id_col="vec_id")
    victim = corpus.filter(F.col("vec_id") == 3)
    mod = victim.withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x + F.lit(5.0)).cast("float")),
    )
    r = run_dedup_maintenance(
        spark, dcfg, mod, id_col="vec_id",
        deleted_ids=victim.select("vec_id"),
    )
    ids = {
        row["vec_id"]
        for row in spark.read.parquet(f"{dcfg.state_path}/vectors")
        .select("vec_id").collect()
    }
    assert 3 not in ids, "deleted id was re-inserted by the repair"
    assert r["repaired"] == 0


@pytest.mark.slow
def test_repair_embedding_spec_n_self_heals_after_crash(
    spark, tmp_path, monkeypatch
):
    """round-12 ADVICE: on a retry after a crash between the vector
    eviction and the spec swap, the touched ids are already evicted
    (n_removed = 0) — the spec row count must be RECOMPUTED from the
    vectors relation, not decremented by this run's removals, or it
    overcounts forever."""
    from eea_crawler_spark.operators import dedup as DD

    _, corpus = _mk_vecs(spark, n=160, dim=16, seed=10)
    n0 = corpus.count()
    p = str(tmp_path / "emb")
    SIM.build_embedding_state(
        corpus, p, expected_delta_rows=40, threshold=0.9
    )
    doomed = corpus.filter(F.col("vec_id") % 11 == 4).select("vec_id")
    n_doomed = doomed.count()
    assert n_doomed > 0
    real_write = DD._write_embedding_spec

    def crash_write(*a, **kw):
        raise RuntimeError("crash before the spec swap")

    monkeypatch.setattr(DD, "_write_embedding_spec", crash_write)
    with pytest.raises(RuntimeError, match="spec swap"):
        SIM.repair_embedding_state(spark, p, deleted_ids=doomed)
    monkeypatch.setattr(DD, "_write_embedding_spec", real_write)
    # the crash left the rows evicted but the spec stale (overcounts)
    assert SIM.read_embedding_state(spark, p)["spec"]["n"] == n0
    r = SIM.repair_embedding_state(spark, p, deleted_ids=doomed)
    assert r["removed"] == 0  # retry finds nothing left to evict
    assert r["n"] == n0 - n_doomed
    st = SIM.read_embedding_state(spark, p)
    assert st["spec"]["n"] == n0 - n_doomed
    assert st["vectors"].count() == n0 - n_doomed


def test_norm_pairs_key_is_collision_proof(spark):
    """round-12 ADVICE: concat_ws('§') pair keys collide for ids
    containing the delimiter ('a§b'+'c' vs 'a'+'b§c'), corrupting the
    keyed eviction/merge of the persisted pair relation. The
    length-prefixed key keeps distinct pairs distinct."""
    from eea_crawler_spark.pipeline import _norm_pairs

    pairs = spark.createDataFrame(
        [("a§b", "c"), ("a", "b§c")],
        "doc_a string, doc_b string",
    )
    rows = _norm_pairs(pairs).collect()
    assert len(rows) == 2
    assert len({r["pair_key"] for r in rows}) == 2


def _text_state_rows(spark, path):
    """Every text-state relation as comparable row sets (the readers
    drop the round-13 layout columns, so repaired and rebuilt states
    compare schema-identically)."""
    st = DD.read_text_dedup_state_full(spark, path)
    out = {
        "arrays": sorted(
            (r["id"], tuple(r["g"])) for r in st["arrays"].collect()
        ),
        "sigs": sorted(
            (r["id"], tuple(r["sig"])) for r in st["sigs"].collect()
        ),
        "keys": sorted(
            (r["id"], r["key"]) for r in st["keys"].collect()
        ),
        "simhash": sorted(
            tuple(r) for r in st["simhash"].collect()
        ),
    }
    for rel in ("bands", "prefix_df", "hp0"):
        if rel in st:
            out[rel] = sorted(tuple(r) for r in st[rel].collect())
    return out


@pytest.mark.slow
def test_repair_text_dedup_state_equals_rebuild(spark, tmp_path):
    """THE text-repair pin (round-12 verdict #1): evicting modified/
    deleted ids partition-locally, healing the prefix statistics by
    restricted recompute, and re-appending the new texts leaves the
    state relation-by-relation EQUAL to a rebuild over the corrected
    corpus — and a later probe through the repaired state equals the
    probe through the rebuilt one."""
    new, corpus = _mk_docs(spark, n_docs=120, seed=3)
    mod = corpus.filter(F.col("doc_id") % 17 == 1).withColumn(
        "text",
        F.concat(F.lit("entirely different edited words now "),
                 F.col("text")),
    )
    doomed = corpus.filter(
        (F.col("doc_id") % 13 == 2) & (F.col("doc_id") % 17 != 1)
    ).select("doc_id")
    p_rep = str(tmp_path / "rep")
    p_reb = str(tmp_path / "reb")
    DD.build_text_dedup_state(
        corpus, p_rep, threshold=THRESH, max_df=20
    )
    r = DD.repair_text_dedup_state(
        spark, p_rep, updates=mod, deleted_ids=doomed
    )
    n_mod, n_doom = mod.count(), doomed.count()
    assert n_mod and n_doom
    assert r["reassigned"] == n_mod
    assert r["removed"] == n_mod + n_doom
    corrected = (
        corpus.join(mod.select("doc_id"), ["doc_id"], "left_anti")
        .join(doomed, ["doc_id"], "left_anti")
        .unionByName(mod)
    )
    DD.build_text_dedup_state(
        corrected, p_reb, threshold=THRESH, max_df=20
    )
    assert _text_state_rows(spark, p_rep) == _text_state_rows(
        spark, p_reb
    )
    probe = new.limit(10)
    pa = _pairset(DD.ngram_jaccard_pairs(
        probe, threshold=THRESH, max_df=20,
        against_state=DD.read_text_dedup_state_full(spark, p_rep),
    ))
    pb = _pairset(DD.ngram_jaccard_pairs(
        probe, threshold=THRESH, max_df=20,
        against_state=DD.read_text_dedup_state_full(spark, p_reb),
    ))
    assert pa == pb and pa


@pytest.mark.slow
def test_repair_text_dedup_state_partition_local(spark, tmp_path):
    """The O(stale) property is PHYSICAL: repairing one id leaves
    every untouched tb bucket's files byte-identical across all five
    row-wise relations, and duplicate/legacy inputs are refused."""
    import os
    import shutil

    _, corpus = _mk_docs(spark, n_docs=120, seed=5)
    p = str(tmp_path / "state")
    DD.build_text_dedup_state(corpus, p, threshold=THRESH, max_df=20)
    victim = corpus.limit(1)
    vtb = victim.select(
        F.pmod(F.xxhash64("doc_id"), F.lit(DD.TB_BUCKETS))
        .cast("int").alias("tb")
    ).first()["tb"]
    rels = ("arrays", "sigs", "keys", "simhash", "bands")

    def _files(rel):
        out = {}
        base = f"{p}/{rel}"
        for d in os.listdir(base):
            if not d.startswith("tb="):
                continue
            out[d] = {
                (f, os.path.getmtime(f"{base}/{d}/{f}"))
                for f in os.listdir(f"{base}/{d}")
                if f.endswith(".parquet")
            }
        return out

    before = {rel: _files(rel) for rel in rels}
    mod = victim.withColumn(
        "text", F.concat(F.lit("brand new words "), F.col("text"))
    )
    r = DD.repair_text_dedup_state(spark, p, updates=mod)
    assert r["removed"] == 1 and r["reassigned"] == 1
    for rel in rels:
        after = _files(rel)
        for d in before[rel]:
            if d != f"tb={vtb}":
                assert after.get(d) == before[rel][d], (
                    f"{rel}/{d} was rewritten"
                )
        assert after.get(f"tb={vtb}") != before[rel].get(f"tb={vtb}")
    with pytest.raises(ValueError, match="unique per id"):
        DD.repair_text_dedup_state(
            spark, p, updates=mod.unionByName(mod)
        )
    legacy = str(tmp_path / "legacy")
    DD.build_text_dedup_state(corpus, legacy, threshold=THRESH)
    flat = spark.read.parquet(f"{legacy}/keys").select(
        "id", "key"
    ).localCheckpoint(eager=True)
    shutil.rmtree(f"{legacy}/keys")
    flat.write.parquet(f"{legacy}/keys")
    with pytest.raises(ValueError, match="legacy"):
        DD.repair_text_dedup_state(spark, legacy, updates=mod)


@pytest.mark.slow
def test_repair_text_crash_retry_heals_aggregates(
    spark, tmp_path, monkeypatch
):
    """Crash discipline: a crash between the row evictions and the
    aggregate swap leaves the durable ``repair_pending`` shingle
    ledger in place; BOTH recovery paths heal exactly — a repair
    retried with the same updates, or a later repair with an EMPTY
    delta (the heal-only path) followed by the re-insert."""
    _, corpus = _mk_docs(spark, n_docs=120, seed=7)
    mod = corpus.filter(F.col("doc_id") % 19 == 1).withColumn(
        "text", F.concat(F.lit("fresh replacement body "), F.col("text"))
    )
    n_mod = mod.count()
    assert n_mod
    corrected = corpus.join(
        mod.select("doc_id"), ["doc_id"], "left_anti"
    ).unionByName(mod)
    p_reb = str(tmp_path / "reb")
    DD.build_text_dedup_state(corrected, p_reb, threshold=THRESH, max_df=20)
    want = _text_state_rows(spark, p_reb)
    evicted_only = str(tmp_path / "evicted_reb")
    DD.build_text_dedup_state(
        corpus.join(mod.select("doc_id"), ["doc_id"], "left_anti"),
        evicted_only, threshold=THRESH, max_df=20,
    )
    real_replace = DD._replace_dir

    def crash_replace(spark_, tmp, dst):
        if dst.endswith("/prefix_df"):
            raise RuntimeError("crash before the aggregate swap")
        return real_replace(spark_, tmp, dst)

    for path_name, heal_then_insert in (("a", False), ("b", True)):
        p = str(tmp_path / path_name)
        DD.build_text_dedup_state(corpus, p, threshold=THRESH, max_df=20)
        monkeypatch.setattr(DD, "_replace_dir", crash_replace)
        with pytest.raises(RuntimeError, match="aggregate swap"):
            DD.repair_text_dedup_state(spark, p, updates=mod)
        monkeypatch.setattr(DD, "_replace_dir", real_replace)
        assert DD._read_rel(spark, p, "repair_pending") is not None
        if heal_then_insert:
            # heal-only pass: empty delta consumes the pending ledger
            r0 = DD.repair_text_dedup_state(spark, p)
            assert r0 == {"removed": 0, "reassigned": 0, "tipped": 0}
            assert DD._read_rel(spark, p, "repair_pending") is None
            assert _text_state_rows(spark, p) == _text_state_rows(
                spark, evicted_only
            )
            app = DD.append_text_dedup_state(spark, p, mod)
            assert app["appended"] == n_mod
        else:
            r = DD.repair_text_dedup_state(spark, p, updates=mod)
            assert r["removed"] == 0 and r["reassigned"] == n_mod
            assert DD._read_rel(spark, p, "repair_pending") is None
        assert _text_state_rows(spark, p) == want


@pytest.mark.slow
def test_dedup_maintenance_text_repair_in_place(spark, tmp_path):
    """The composed leg with repair_in_place over a TEXT method
    (round 13): a modified doc's FUTURE probes compare against its NEW
    text, deletions leave the state physically, and unchanged
    re-deliveries carry no debt — the
    test_dedup_maintenance_embedding_repair_in_place contract on the
    ngram family."""
    from eea_crawler_spark.pipeline import (
        DedupConfig,
        bootstrap_dedup_maintenance,
        run_dedup_maintenance,
    )

    _, corpus = _mk_docs(spark, n_docs=120, seed=8)
    dcfg = DedupConfig(
        state_path=str(tmp_path / "state"),
        clusters_path=str(tmp_path / "clusters"),
        flags_path=str(tmp_path / "flags"),
        method="ngram",
        text_col="text",
        threshold=THRESH,
        max_df=20,
        repair_in_place=True,
    )
    bootstrap_dedup_maintenance(spark, dcfg, corpus, id_col="doc_id")
    victim_id = 1  # doc_id 1 sits in corpus (%5 != 0)
    victim = corpus.filter(F.col("doc_id") == victim_id)
    mod = victim.withColumn(
        "text",
        F.concat_ws(
            " ", *[F.lit(f"zz{i}") for i in range(80)]
        ),
    )
    r = run_dedup_maintenance(spark, dcfg, mod, id_col="doc_id")
    assert r["repaired"] == 1 and r["stale"] == 1
    state = DD.read_text_dedup_state_full(spark, dcfg.state_path)
    # a future probe with the victim's OLD text no longer pairs with
    # it at ~1.0 jaccard; a probe with the NEW text does
    probe_old = victim.withColumn("doc_id", F.lit(77777).cast("bigint"))
    pairs_old = _pairset(DD.ngram_jaccard_pairs(
        probe_old, threshold=THRESH, max_df=20, against_state=state,
    ))
    assert not any(victim_id in p for p in pairs_old)
    probe_new = mod.withColumn("doc_id", F.lit(88888).cast("bigint"))
    pairs_new = _pairset(DD.ngram_jaccard_pairs(
        probe_new, threshold=THRESH, max_df=20, against_state=state,
    ))
    assert any(victim_id in p for p in pairs_new)
    # unchanged re-delivery: nothing repaired, nothing ledgered
    r2 = run_dedup_maintenance(
        spark, dcfg, corpus.filter(F.col("doc_id") == 6),
        id_col="doc_id",
    )
    assert r2["repaired"] == 0 and r2["stale"] == 0
    # deletion leaves the state physically
    run_dedup_maintenance(
        spark, dcfg, corpus.filter(F.lit(False)), id_col="doc_id",
        deleted_ids=corpus.filter(F.col("doc_id") == 11).select("doc_id"),
    )
    ids = {
        row["id"]
        for row in DD.read_text_dedup_state_full(
            spark, dcfg.state_path
        )["keys"].select("id").collect()
    }
    assert 11 not in ids


@pytest.mark.slow
def test_exact_label_maintenance_text_matches_scratch(spark, tmp_path):
    """The exact-labels pin on a TEXT method (round 13): with
    pairs_path + repair_in_place + method='ngram', every night's
    labels AND flags equal a from-scratch bootstrap over the live
    corpus — split, merge, and delete, the same arc as the embedding
    twin."""
    from eea_crawler_spark.pipeline import (
        DedupConfig,
        bootstrap_dedup_maintenance,
        run_dedup_maintenance,
    )

    def blk(k):
        return [f"b{k}w{j}" for j in range(30)]

    def doc(*blocks):
        return " ".join(w for k in blocks for w in blk(k))

    # chain 1-2-3 (adjacent J≈0.32, ends J=0), clique 10-11-12
    # (pairwise J≈0.93), far singletons 20, 21
    rows = [
        (1, doc("A", "B")),
        (2, doc("B", "C")),
        (3, doc("C", "D")),
        (10, doc("E", "F")),
        (11, doc("E", "F") + " extraone"),
        (12, doc("E", "F") + " extratwo"),
        (20, doc("G", "H")),
        (21, doc("I", "J")),
    ]
    corpus = spark.createDataFrame(rows, "doc_id bigint, text string")

    def cfg(base):
        return DedupConfig(
            state_path=str(base / "state"),
            clusters_path=str(base / "clusters"),
            flags_path=str(base / "flags"),
            pairs_path=str(base / "pairs"),
            method="ngram",
            text_col="text",
            threshold=0.3,
            repair_in_place=True,
        )

    inc = cfg(tmp_path / "inc")
    bootstrap_dedup_maintenance(spark, inc, corpus, id_col="doc_id")
    scratch_n = 0

    def check(live_rows):
        nonlocal scratch_n
        scratch_n += 1
        scr = cfg(tmp_path / f"scr{scratch_n}")
        live = spark.createDataFrame(
            live_rows, "doc_id bigint, text string"
        )
        bootstrap_dedup_maintenance(spark, scr, live, id_col="doc_id")
        got_l, got_f = _labels_and_flags(spark, inc)
        want_l, want_f = _labels_and_flags(spark, scr)
        assert got_l == want_l
        assert got_f == want_f

    base_rows = {r[0]: r for r in rows}
    check(list(base_rows.values()))

    # night 1: SPLIT — the chain's middle doc modified away
    mod2 = (2, doc("Z", "W"))
    r1 = run_dedup_maintenance(
        spark, inc,
        spark.createDataFrame([mod2], "doc_id bigint, text string"),
        id_col="doc_id",
    )
    assert r1["repaired"] == 1 and r1["stale_total"] == 0
    base_rows[2] = mod2
    check(list(base_rows.values()))
    got_l, got_f = _labels_and_flags(spark, inc)
    assert 1 not in got_l and 3 not in got_l
    assert got_f[1] == (1, True) and got_f[3] == (3, True)

    # night 2: MERGE — a fresh doc bridges doc 1 and doc 20
    bridge = (30, doc("A", "G"))
    r2 = run_dedup_maintenance(
        spark, inc,
        spark.createDataFrame([bridge], "doc_id bigint, text string"),
        id_col="doc_id",
    )
    assert r2["appended"] == 1
    base_rows[30] = bridge
    check(list(base_rows.values()))
    got_l, _ = _labels_and_flags(spark, inc)
    assert got_l[1] == got_l[20] == got_l[30] == 1

    # night 3: DELETE the bridge — the merge must unwind exactly
    run_dedup_maintenance(
        spark, inc,
        spark.createDataFrame([], "doc_id bigint, text string"),
        id_col="doc_id",
        deleted_ids=spark.createDataFrame([(30,)], "doc_id bigint"),
    )
    del base_rows[30]
    check(list(base_rows.values()))


def _labels_and_flags(spark, dcfg):
    from eea_crawler_spark.sinks import lakehouse as LK

    labels = {
        r["node"]: r["cluster_id"]
        for r in LK.read_table(spark, dcfg.clusters_path)
        .select("node", "cluster_id").collect()
    } if LK.table_exists(dcfg.clusters_path) else {}
    flags = {
        r["id"]: (r["cluster_id"], r["keep"])
        for r in LK.read_table(spark, dcfg.flags_path)
        .select("id", "cluster_id", "keep").collect()
    }
    return labels, flags


@pytest.mark.slow
def test_exact_label_maintenance_matches_scratch(spark, tmp_path):
    """THE exact-labels pin (round 12, closing the monotonicity seam):
    with pairs_path + repair_in_place, every night's labels AND flags
    equal a from-scratch bootstrap over the live corpus — through a
    SPLIT (a chain's middle doc modified away), a MERGE (a fresh doc
    bridging two clusters), and a deletion. Cluster ids are component
    minima in both paths, so the compare is direct."""
    from eea_crawler_spark.pipeline import (
        DedupConfig,
        bootstrap_dedup_maintenance,
        run_dedup_maintenance,
    )

    dim = 8

    def vec(*parts):
        v = np.zeros(dim)
        for i, w in parts:
            v[i] = w
        n = np.linalg.norm(v)
        return [float(x) for x in v / n]

    # chain 1-2-3 (cos(1,2)=cos(2,3)≈0.71, cos(1,3)=0), clique 10-11-12,
    # far singletons 20, 21
    rows = [
        (1, vec((0, 1.0))),
        (2, vec((0, 1.0), (1, 1.0))),
        (3, vec((1, 1.0))),
        (10, vec((2, 1.0))),
        (11, vec((2, 1.0), (3, 0.1))),
        (12, vec((2, 1.0), (4, 0.1))),
        (20, vec((5, 1.0))),
        (21, vec((6, 1.0))),
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )

    def cfg(base):
        return DedupConfig(
            state_path=str(base / "state"),
            clusters_path=str(base / "clusters"),
            flags_path=str(base / "flags"),
            pairs_path=str(base / "pairs"),
            method="embedding",
            cos_threshold=0.7,
            expected_delta_rows=4,
            repair_in_place=True,
        )

    inc = cfg(tmp_path / "inc")
    bootstrap_dedup_maintenance(spark, inc, corpus, id_col="vec_id")
    scratch_n = 0

    def check(live_rows):
        nonlocal scratch_n
        scratch_n += 1
        scr = cfg(tmp_path / f"scr{scratch_n}")
        live = spark.createDataFrame(
            live_rows, "vec_id bigint, embedding array<float>"
        )
        bootstrap_dedup_maintenance(spark, scr, live, id_col="vec_id")
        got_l, got_f = _labels_and_flags(spark, inc)
        want_l, want_f = _labels_and_flags(spark, scr)
        assert got_l == want_l
        assert got_f == want_f

    base_rows = {r[0]: r for r in rows}
    check(list(base_rows.values()))  # bootstrap parity

    # night 1: SPLIT — the chain's middle doc modified away
    mod2 = (2, vec((7, 1.0)))
    delta = spark.createDataFrame(
        [mod2], "vec_id bigint, embedding array<float>"
    )
    r1 = run_dedup_maintenance(spark, inc, delta, id_col="vec_id")
    assert r1["repaired"] == 1 and r1["stale_total"] == 0
    base_rows[2] = mod2
    check(list(base_rows.values()))
    # 1 and 3 must have become singletons (the split the monotone fold
    # cannot produce)
    got_l, got_f = _labels_and_flags(spark, inc)
    assert 1 not in got_l and 3 not in got_l
    assert got_f[1] == (1, True) and got_f[3] == (3, True)

    # night 2: MERGE — a fresh doc bridges doc 1 and doc 20
    bridge = (30, vec((0, 1.0), (5, 1.0)))
    r2 = run_dedup_maintenance(
        spark, inc,
        spark.createDataFrame(
            [bridge], "vec_id bigint, embedding array<float>"
        ),
        id_col="vec_id",
    )
    assert r2["appended"] == 1
    base_rows[30] = bridge
    check(list(base_rows.values()))
    got_l, _ = _labels_and_flags(spark, inc)
    assert got_l[1] == got_l[20] == got_l[30] == 1

    # night 3: DELETE the bridge — the merge must unwind exactly
    r3 = run_dedup_maintenance(
        spark, inc,
        spark.createDataFrame([], "vec_id bigint, embedding array<float>"),
        id_col="vec_id",
        deleted_ids=spark.createDataFrame([(30,)], "vec_id bigint"),
    )
    del base_rows[30]
    check(list(base_rows.values()))
    got_l, got_f = _labels_and_flags(spark, inc)
    assert 30 not in got_l and 30 not in got_f
    assert 1 not in got_l and 20 not in got_l  # singletons again

    # night 4: idempotent re-delivery of an unchanged doc — no-ops
    r4 = run_dedup_maintenance(
        spark, inc,
        spark.createDataFrame(
            [base_rows[10]], "vec_id bigint, embedding array<float>"
        ),
        id_col="vec_id",
    )
    assert r4["repaired"] == 0 and r4["stale_total"] == 0
    check(list(base_rows.values()))


def test_pairs_path_config_refusals(spark, tmp_path):
    from eea_crawler_spark.pipeline import DedupConfig, run_dedup_maintenance

    docs = spark.createDataFrame(
        [("a", "hello world")], "id string, fulltext string"
    )
    bad = DedupConfig(
        state_path=str(tmp_path / "s"),
        clusters_path=str(tmp_path / "c"),
        flags_path=str(tmp_path / "f"),
        pairs_path=str(tmp_path / "p"),
        method="ngram",
    )
    with pytest.raises(ValueError, match="pairs_path"):
        run_dedup_maintenance(spark, bad, docs)
    bad2 = DedupConfig(
        state_path=str(tmp_path / "s2"),
        clusters_path=str(tmp_path / "c2"),
        flags_path=str(tmp_path / "f2"),
        pairs_path=str(tmp_path / "p2"),
        method="embedding",  # but repair_in_place off
    )
    with pytest.raises(ValueError, match="pairs_path"):
        run_dedup_maintenance(
            spark, bad2,
            spark.createDataFrame(
                [], "id string, embedding array<float>"
            ).limit(0),
        )


def test_append_embedding_state_refuses_legacy_layout(spark, tmp_path):
    """A pre-round-10 state (vectors on band rows, no vectors relation)
    must be REFUSED, not silently mixed: appending id-only signed rows
    into it would leave null vec columns on read and skip the
    strictly-new-ids clash check entirely (round-10 ADVICE, medium)."""
    import shutil

    new, corpus = _mk_vecs(spark, n=80, dim=16, seed=11)
    p = str(tmp_path / "legacy")
    SIM.build_embedding_state(
        corpus, p, expected_delta_rows=20, threshold=0.9
    )
    shutil.rmtree(f"{p}/vectors")  # simulate the legacy layout
    with pytest.raises(ValueError, match="legacy"):
        DD.append_embedding_state(spark, p, new)


@pytest.mark.slow
def test_replace_dir_crash_windows_recoverable(spark, tmp_path):
    """_replace_dir crash discipline (round-10 ADVICE): a crash between
    the aside-rename and the swap-in leaves dst missing but __new
    present — readers must recover via the __new fallback instead of
    silently degrading (text state) or crashing (embedding spec)."""
    import os
    import shutil

    new, corpus = _mk_docs(spark, n_docs=60)
    p = str(tmp_path / "txt")
    DD.build_text_dedup_state(corpus, p, threshold=THRESH, max_df=20)
    healthy = DD.read_text_dedup_state_full(spark, p)
    want_df = sorted(
        (r["shingle"], r["df"]) for r in healthy["prefix_df"].collect()
    )
    # simulate the mid-swap window: prefix_df renamed aside (gone),
    # the fully-written __new copy present
    shutil.move(f"{p}/prefix_df", f"{p}/prefix_df__new")
    recovered = DD.read_text_dedup_state_full(spark, p)
    assert "prefix_df" in recovered, "reader must fall back to __new"
    got_df = sorted(
        (r["shingle"], r["df"]) for r in recovered["prefix_df"].collect()
    )
    assert got_df == want_df
    # embedding spec: same window on the swapped spec relation
    vnew, vcorp = _mk_vecs(spark, n=60, dim=16, seed=12)
    pe = str(tmp_path / "emb")
    SIM.build_embedding_state(
        vcorp, pe, expected_delta_rows=15, threshold=0.9
    )
    spec_before = SIM.read_embedding_state(spark, pe)["spec"]
    shutil.move(f"{pe}/spec", f"{pe}/spec__new")
    assert SIM.read_embedding_state(spark, pe)["spec"] == spec_before
    # the next successful swap heals the layout and clears leftovers:
    # restore and run a real swap with a stale __old lying around
    shutil.move(f"{pe}/spec__new", f"{pe}/spec")
    os.makedirs(f"{p}/prefix_df__old/stale", exist_ok=True)
    DD._replace_dir(spark, f"{p}/prefix_df__new", f"{p}/prefix_df")
    assert os.path.exists(f"{p}/prefix_df")
    assert not os.path.exists(f"{p}/prefix_df__new")
    assert not os.path.exists(f"{p}/prefix_df__old")
    again = DD.read_text_dedup_state_full(spark, p)
    assert sorted(
        (r["shingle"], r["df"]) for r in again["prefix_df"].collect()
    ) == want_df


@pytest.mark.slow
def test_append_after_midswap_crash_heals_and_succeeds(spark, tmp_path):
    """Round-11 ADVICE (medium): after a mid-swap crash the aggregates
    sit in their __new dirs; the next append used to resolve them there
    as LAZY reads and then overwrite the same __new paths — Spark
    raises 'Cannot overwrite a path that is also being read from' and
    every subsequent append fails until a manual rename. The append now
    HEALS the layout first (primary missing + __new present → rename
    into place), so the retry succeeds and append ≡ rebuild still
    holds."""
    import os
    import shutil

    new, corpus = _mk_docs(spark, n_docs=60)
    p = str(tmp_path / "crashed")
    DD.build_text_dedup_state(corpus, p, threshold=THRESH, max_df=20)
    # simulate the mid-swap window on BOTH swapped aggregates
    shutil.move(f"{p}/prefix_df", f"{p}/prefix_df__new")
    shutil.move(f"{p}/hp0", f"{p}/hp0__new")
    r = DD.append_text_dedup_state(spark, p, new)
    assert r["appended"] == new.count()
    assert os.path.exists(f"{p}/prefix_df")
    assert not os.path.exists(f"{p}/prefix_df__new")
    # healed-then-appended state equals a clean rebuild over the union
    ref = str(tmp_path / "ref")
    DD.build_text_dedup_state(
        corpus.unionByName(new), ref, threshold=THRESH, max_df=20
    )
    got = DD.read_text_dedup_state_full(spark, p)
    want = DD.read_text_dedup_state_full(spark, ref)
    assert sorted(
        (r["shingle"], r["df"]) for r in got["prefix_df"].collect()
    ) == sorted((r["shingle"], r["df"]) for r in want["prefix_df"].collect())
    assert sorted(
        (r["id"], r["hp"]) for r in got["hp0"].collect()
    ) == sorted((r["id"], r["hp"]) for r in want["hp0"].collect())


def test_append_text_retry_after_partial_crash_is_detected(spark, tmp_path):
    """Crash-retry contract (round-10 ADVICE): ``keys`` is appended
    FIRST among the row-wise appends, so retrying a batch whose first
    attempt crashed after ANY row-wise append trips the strictly-new
    clash check — it can never silently append arrays/sigs twice."""
    new, corpus = _mk_docs(spark, n_docs=60)
    p = str(tmp_path / "crashy")
    DD.build_text_dedup_state(corpus, p, threshold=THRESH, max_df=20)
    # simulate the narrowest crash: the keys append landed (in the
    # round-13 partitioned layout the real append writes), nothing else
    delta_keys = new.select(
        F.col("doc_id").alias("id"),
        F.substring(DD.clean_html(F.col("text")), 1, 20).alias("key"),
        F.xxhash64(F.col("text")).alias("text_hash"),
    ).withColumn("tb", DD._tb_col())
    delta_keys.repartition("tb").write.mode("append").partitionBy(
        "tb"
    ).parquet(f"{p}/keys")
    with pytest.raises(ValueError, match="strictly-NEW"):
        DD.append_text_dedup_state(spark, p, new)
