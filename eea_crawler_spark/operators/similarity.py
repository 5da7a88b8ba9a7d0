"""Similarity search over embedding columns (array<float>).

The reference stores 768-d dense vectors for ES kNN serving
(``dags/variables.json:2319-2327``, ``dags/lib/elastic.py:107-109``);
here the engine itself answers neighbor queries:

  - ``brute_force_topk`` — exact cosine top-k: broadcast the query set
    against the corpus, one narrow pass, per-query window top-k. The
    right baseline whenever |queries| is small enough to broadcast.
  - ``neardup_pairs`` — all corpus pairs above a cosine threshold
    (embedding near-dup dedup); exact, O(n²) — use for modest corpora
    or post-LSH candidate verification.
  - ``hyperplane_lsh_topk`` / ``ivf_topk`` — the approximate scale
    paths: candidates are restricted to the query's hyperplane bucket
    or probed inverted lists. No SQL oracle (recall < 1 by design).

All three top-k operators share ONE fused execution kernel
(``_fused_topk``): the query set is collected driver-side (the
operator contract — |queries| small enough to broadcast; same
legitimacy class as ``ivf_centroids``'s k×dim collect) and an
Arrow-batched ``mapInPandas`` pass scores each corpus batch as a
single float64 BLAS matmul, applies the path's candidate mask (none /
bucket equality / probe-list membership), and emits only the batch's
top-k rows per query — so the final exact window ranks partitions·q·k
rows instead of n·q. zip_with/aggregate higher-order functions are
CodegenFallback: the per-pair fold this replaces measured 2.6× DuckDB
at sf100 on the exact path (matmul: 0.63×), 60 s on the IVF path
(fused: 1.7 s with a prebuilt index). HALF_UP rounding matches
Spark's Round(double) bit-for-bit against the previous expression
form and the DuckDB oracle. (The functions/vectors.py column
expressions remain the cross-engine-deterministic primitive for
shortlist-sized work elsewhere, e.g. the IVF/LSH exactness tests.)

Parallelism comes from input splits (sf100: ~250 files); no
repartition — a corpus small enough to land in one split is one cheap
matmul anyway. Per-batch top-k → global top-k is exact because both
use the same total order (cos desc, id asc). The candidate masks are
also where the 100 TB layout comes from: persisting the corpus
partitioned by its bucket / inverted-list id turns the mask into
physical partition pruning, so a serving scan reads only the probed
partitions instead of masking a full pass.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# single-slice driver-list DataFrames for the k-row spec/centroid/agg
# writes (see _tiny_df's docstring; dedup has no module-level import of
# this module, so the import is cycle-free)
from eea_crawler_spark.operators.dedup import _tiny_df

# neardup_pairs plan gate: below, the corpus matrix is collected and
# broadcast (zero shuffle, one matmul per batch) — bounded by
# spark.driver.maxResultSize and driver memory, so the gate sits well
# under both (the same 64 MiB class as dedup.RESCORE_BROADCAST_MAX_BYTES).
# Above, the blocked exact plan runs: nothing ever materializes on the
# driver, O(n²) work spreads over block-pair tasks.
NEARDUP_BROADCAST_MAX_BYTES = 64 << 20

# Gate for the incremental LSH probe's pair-verify plan: the delta's
# f64 matrix is collected and broadcast so each candidate (delta,
# state) pair is scored exactly once with state vectors shipped ONCE
# per distinct candidate state row. Larger than the exact probe's
# broadcast gate because the payload is a plain numpy broadcast (no
# per-task hash relation) and the alternative — the union fan shipping
# every touched corpus vector once PER BAND — measured a disk-full at
# 1M×768×62 bands (round-10; the ~32 GB transient was the bands×
# multiplicity, not the data size).
NEARDUP_DELTA_MATRIX_MAX_BYTES = 512 << 20
# Block sizing for the blocked plan. The binding memory constraint is
# NOT the input block (rows×dim×8) but the per-sub-pair SIMS MATRIX:
# the tile scorer evaluates one block pair at a time, so its peak is
# block_rows² float32 cells (4096² × 4 B = 67 MB) — an 18k-row block
# (2.6 GB of sims) OOM-killed the box on the first sf10 run, measured.
# Block size is MEASURED, not derived: 4096-row blocks beat 16k-row
# blocks ~2× — the wall is the per-pair post-matmul sweep
# (compare/nonzero over the sims cells, memory-bound) and big blocks
# serialize it into fewer, straggling sub-pairs. For wide vectors the
# byte cap shrinks block_rows, which shrinks the sims quadratically.
NEARDUP_BLOCK_BYTES = 32 << 20
NEARDUP_BLOCK_ROWS = 4096
# Super-tile sizing for the blocked plan: one task owns a g×g tile of
# block pairs (g = blocks per stripe), so each block ships to
# ~n_blocks/g tasks instead of n_blocks — the shuffle volume drops by
# g× while per-sub-pair sims memory stays bounded (the task loops its
# block pairs serially). This caps the packed bytes one tile side may
# hold; g follows from it and the block size.
NEARDUP_TILE_SIDE_BYTES = 64 << 20


def _round_half_up(x: "np.ndarray", digits: int = 4) -> "np.ndarray":
    """Spark's Round(double) semantics (BigDecimal HALF_UP, away from
    zero) vectorized — np.round is HALF_EVEN and would disagree on
    exact .00005 boundaries."""
    scale = 10.0**digits
    return np.sign(x) * np.trunc(np.abs(x) * scale + 0.5) / scale


def _vec_matrix(values) -> "np.ndarray":
    return np.asarray([np.asarray(v, dtype=np.float64) for v in values])


# Prescreen slack for _neardup_cells: HALF_UP at 4 digits means a raw
# score as low as threshold - 0.5e-4 still rounds up to the threshold;
# the extra 1e-6 dwarfs the ~1e-14 float discrepancy between the
# normalized-matmul prescreen and the exact divide-after-dot formula.
_PRESCREEN_MARGIN = 0.51e-4


def _neardup_cells(
    a_mat, a_nrm, b_mat, b_nrm, threshold, extra_mask=None, bn=None
):
    """Cells of the a×b sims space at/above threshold, with EXACT scores.

    The dense formulation made ~7 elementwise passes over every cell
    (outer-product norms, divide, then _round_half_up's abs/scale/
    shift/trunc/sign, then compare) — measured as THE wall of the sf10
    blocked run (round-6 BASELINE: the post-matmul sweep over 4e10
    cells, memory-bound, 345 s). Here the only full-size passes are ONE
    matmul over pre-normalized rows and ONE comparison against
    (threshold - margin); the handful of surviving cells then get the
    ORIGINAL dot/(na*nb) + HALF_UP evaluation, so emitted values are
    bit-identical to the dense path (same per-pair arithmetic,
    independent of batch/block shape) and the margin guarantees the
    prescreen is a superset. Zero-norm rows prescreen to 0 and are
    dropped by the exact filter exactly as the dense NaN path dropped
    them. Returns (ai, bj, cos) exact-filtered at threshold.

    ``bn``: optionally the pre-normalized b-side — chunked callers
    normalize the (large, chunk-invariant) b matrix once per task
    instead of once per chunk.
    """
    with np.errstate(divide="ignore", invalid="ignore"):
        an = a_mat / np.where(a_nrm == 0, 1.0, a_nrm)[:, None]
        if bn is None:
            bn = b_mat / np.where(b_nrm == 0, 1.0, b_nrm)[:, None]
        cand = (an @ bn.T) >= (threshold - _PRESCREEN_MARGIN)
        if extra_mask is not None:
            cand &= extra_mask
        ai, bj = np.nonzero(cand)
        if len(ai) == 0:
            return ai, bj, np.empty(0, dtype=np.float64)
        dots = np.einsum("ij,ij->i", a_mat[ai], b_mat[bj])
        cos = _round_half_up(dots / (a_nrm[ai] * b_nrm[bj]))
    keep = cos >= threshold
    return ai[keep], bj[keep], cos[keep]


def _fused_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    mask_factory=None,
) -> DataFrame:
    """The shared single-pass top-k kernel (module docstring).

    ``mask_factory(q_ids, q_mat, q_nrm)`` — called once, driver-side,
    with the collected query set — returns ``batch_mask(v_mat, v_nrm)``
    (called once per Arrow batch) which returns ``excl(j)``: a boolean
    array marking the batch rows that are NOT candidates for query j.
    ``None`` (exact path) scores every row against every query.
    """
    q_rows = queries.select(id_col, vec_col).collect()
    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"q_id {id_type}, {id_col} {id_type}, cos double"
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], out_schema + ", rnk int"
        ).select("q_id", id_col, "rnk", "cos")
    q_ids = [r[id_col] for r in q_rows]
    q_mat = _vec_matrix(list(r[vec_col]) for r in q_rows)
    q_nrm = np.sqrt((q_mat * q_mat).sum(axis=1))
    batch_mask = (
        mask_factory(q_ids, q_mat, q_nrm) if mask_factory is not None else None
    )

    def _score_batches(batches):
        import pandas as pd

        qn = np.asarray(q_ids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            v_mat = _vec_matrix(pdf[vec_col])
            v_nrm = np.sqrt((v_mat * v_mat).sum(axis=1))
            sims = _round_half_up((v_mat @ q_mat.T) / np.outer(v_nrm, q_nrm))
            excl = batch_mask(v_mat, v_nrm) if batch_mask is not None else None
            out_q, out_id, out_cos = [], [], []
            for j in range(len(q_ids)):
                s = sims[:, j].copy()
                if excl is not None:
                    s[excl(j)] = -np.inf
                s[ids == qn[j]] = -np.inf
                top = np.lexsort((ids, -s))[:k]
                top = top[np.isfinite(s[top])]
                out_q.extend([q_ids[j]] * len(top))
                out_id.extend(ids[top])
                out_cos.extend(s[top])
            yield pd.DataFrame(
                {
                    "q_id": np.asarray(out_q, dtype=qn.dtype),
                    id_col: np.asarray(out_id, dtype=ids.dtype),
                    "cos": np.asarray(out_cos, dtype=np.float64),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        _score_batches, out_schema
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", id_col, "rnk", "cos")
        .orderBy("q_id", "rnk", id_col)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (q_id, vec_id, rnk, cos); self-matches excluded. Cosine is
    rounded to 4 digits *before* ranking so the ordering (and therefore
    the top-k set) is reproducible across engines; vec_id breaks ties.
    Execution: the fused kernel with no candidate mask — every corpus
    row is scored against every query.
    """
    return _fused_topk(corpus, queries, k, id_col, vec_col)


# Operator-selection gate for the near-dup family (the ONE documented
# rule — round-8 VERDICT #5): `neardup_pairs` is EXACT and O(n²) score
# work by contract; past this corpus size (float64 bytes = n·dim·8),
# AND only at thresholds ≥ 0.7 where the cosine-LSH family can
# actually prune, it auto-escalates to `neardup_pairs_lsh` — whose
# output is a SUBSET of the exact pairs with identical cosines,
# recall < 1 by design (~0.996 at cos 0.9 under the derived banding,
# → 1 as cos → 1). Below 0.7 the operator stays exact at any size
# (see the inline rationale at the gate). 2 GiB ≈ 350k rows at 768-d /
# 4M rows at 64-d — past the measured comfort zone of the blocked
# exact plan (sf10-class, ~1 GiB, 32-50 s on this box; the n²
# prescreen alone quadruples per 2× rows). Pass escalate_bytes=None
# to force the exact plan at any size.
NEARDUP_LSH_ESCALATE_BYTES = 2 << 30

# id-hash bucket count for the embedding state's partitioned vectors
# relation (round 12): 64 dirs keeps per-bucket files chunky at the
# measured state sizes (1M×768 ≈ 45 MB/bucket) while making eviction
# touch ≤ |touched ids| dirs. Recorded in the spec (n_vb) so appends
# and repairs hash identically; raising it is a rebuild-time decision.
VB_BUCKETS = 64


def _vb_col(id_col: str, n_vb: int = VB_BUCKETS):
    """The stable id→bucket hash every writer of the partitioned
    vectors relation must share (build, append, repair)."""
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_vb)).cast("int")


def _lsh_params_for(threshold: float) -> tuple[int, int]:
    """(n_bands, band_planes) for an escalated near-dup run: pick the
    band width by threshold regime (wider bands prune harder but need
    more of them at low thresholds), then the band count so a pair AT
    the threshold is caught w.p. ≥ ~0.98 — 1-(1-p^r)^b with
    p = 1 - arccos(t)/π, the standard cosine-LSH banding calculus."""
    r = 8 if threshold >= 0.85 else 6 if threshold >= 0.7 else 4 if threshold >= 0.5 else 3
    p = 1.0 - np.arccos(min(1.0, threshold)) / np.pi
    b = int(np.ceil(np.log(0.02) / np.log(1.0 - p**r)))
    return max(4, min(64, b)), r


def neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    against: DataFrame | None = None,
    escalate_bytes: int | None = NEARDUP_LSH_ESCALATE_BYTES,
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — embedding near-dup.

    ``against``: the INCREMENTAL delta-vs-corpus form — ``corpus`` is
    then the delta of new vectors and ``against`` the standing state
    (id-disjoint by contract). Output equals the full operator over the
    union restricted to pairs touching the delta, with bit-identical
    cosines (pinned in tests/test_incremental_dedup.py): delta×delta
    runs this operator on the delta alone; delta×state runs a broadcast
    (small delta) or blocked-cross plan that never enumerates
    state×state. The escalation gate below does not apply — the
    incremental shape is already linear in the state.

    ``escalate_bytes``: the declared operator-selection gate
    (``NEARDUP_LSH_ESCALATE_BYTES``). A corpus past it delegates to
    ``neardup_pairs_lsh`` with threshold-derived banding
    (``_lsh_params_for``) — output becomes a high-recall SUBSET with
    identical cosines instead of the exact set; ``None`` forces exact.

    Exact and therefore O(n²) score work by construction. Two plans,
    identical output (same float64 matmul over the same full-dim
    vectors, same HALF_UP rounding — pinned by the forced-gate test),
    picked by a one-aggregate corpus probe:

      * small (≤ NEARDUP_BROADCAST_MAX_BYTES of float64): the corpus
        matrix is collected once and broadcast; each Arrow batch of the
        left side scores against it as ONE matmul. Zero shuffle. The
        collect is safe exactly because the gate bounds it far under
        spark.driver.maxResultSize — the round-5 review flagged the
        ungated collect as the one declared operator with a hard
        driver ceiling.
      * large: the blocked exact plan (``_neardup_pairs_blocked``) —
        rows pack into per-block matrix rows, stripes of g blocks form
        super-tile tasks (one task loops a g×g tile of block pairs),
        survivors only leave the task. Nothing touches the driver;
        shuffle volume is corpus_bytes × n_blocks/g (the pair
        materialization, cut g× by the tiling), prescreen matmuls run
        in float32 with a provably-superset margin and exact float64
        re-scoring. For corpora where even that is unpayable,
        ``hyperplane_lsh_topk`` / MinHash buckets are the approximate
        candidate generators.
    """
    if against is not None:
        return _neardup_pairs_delta(
            corpus, against, threshold, id_col, vec_col
        )
    id_type = corpus.schema[id_col].dataType.simpleString()
    schema = f"a_id {id_type}, b_id {id_type}, cos double"
    probe = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size(vec_col)).alias("dim"),
    ).first()
    n_rows, dim = int(probe["n"]), int(probe["dim"] or 0)
    if n_rows == 0:
        return corpus.sparkSession.createDataFrame([], schema)
    if (
        escalate_bytes is not None
        and threshold >= 0.7
        and n_rows * dim * 8 > escalate_bytes
    ):
        # the documented subset-contract seam (module constant above):
        # past the exact plan's declared ceiling, candidates come from
        # banded hyperplane LSH; emitted cosines stay bit-identical.
        # LOW thresholds stay exact at any size: below ~0.7 the cosine
        # LSH family cannot prune (p = 1 - θ/π is so large that bands
        # narrow enough to reach recall collapse to a handful of
        # buckets — the expected Σ|bucket|² verify EXCEEDS the n²
        # exact plan), so escalating would be slower AND lossy;
        # corpus-scale near-dup at such thresholds is inherently
        # all-pairs work.
        n_bands, band_planes = _lsh_params_for(threshold)
        return neardup_pairs_lsh(
            corpus, threshold=threshold, n_bands=n_bands,
            band_planes=band_planes, id_col=id_col, vec_col=vec_col,
        )
    if n_rows * dim * 8 > NEARDUP_BROADCAST_MAX_BYTES:
        return _neardup_pairs_blocked(
            corpus, threshold, id_col, vec_col, n_rows, dim, schema
        )
    rows = corpus.select(id_col, vec_col).collect()
    ids = np.asarray([r[id_col] for r in rows])
    mat = _vec_matrix(list(r[vec_col]) for r in rows)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    bvar = corpus.sparkSession.sparkContext.broadcast((ids, mat, nrm))

    def _pair_batches(batches):
        import pandas as pd

        b_ids, b_mat, b_nrm = bvar.value
        with np.errstate(divide="ignore", invalid="ignore"):
            b_norm = b_mat / np.where(b_nrm == 0, 1.0, b_nrm)[:, None]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_ids = pdf[id_col].to_numpy()
            a_mat = _vec_matrix(pdf[vec_col])
            a_nrm = np.sqrt((a_mat * a_mat).sum(axis=1))
            # a-side chunked: the sims slab is chunk×|corpus| f64 cells
            # — unchunked, an Arrow batch against a gate-limit corpus
            # allocates GBs per worker (measured as the wall of the
            # first 2M-state × 20k-delta cross run); per-pair
            # arithmetic is chunk-invariant, so output is bit-identical
            for s in range(0, len(a_ids), _bcast_chunk(len(b_ids))):
                e = min(s + _bcast_chunk(len(b_ids)), len(a_ids))
                ai, bj, cos = _neardup_cells(
                    a_mat[s:e], a_nrm[s:e], b_mat, b_nrm, threshold,
                    extra_mask=a_ids[s:e, None] < b_ids[None, :],
                    bn=b_norm,
                )
                yield pd.DataFrame(
                    {
                        "a_id": a_ids[s:e][ai],
                        "b_id": b_ids[bj],
                        "cos": cos,
                    }
                )

    return (
        corpus.select(id_col, vec_col)
        .mapInPandas(_pair_batches, schema)
        .orderBy("a_id", "b_id", "cos")
    )


def _bcast_chunk(n_bcast: int) -> int:
    """a-side chunk rows for the broadcast-plan scorers: bounds the
    chunk×|broadcast side| f64 sims slab at ~256 MB per worker (the
    gate-limit corpus is 131k rows at 64-d — unchunked that is a
    multi-GB slab per Arrow batch)."""
    return max(256, (256 << 20) // (8 * max(1, n_bcast)))


def _f32_prescreen_margin(dim: int) -> float:
    """Prescreen slack when the candidate matmul runs in float32.

    HALF_UP at 4 digits admits raw scores down to threshold − 0.5e-4
    (``_PRESCREEN_MARGIN``); on top of that, the float32 normalized
    dot differs from the exact value by at most (d+2)·2⁻²⁴ — one
    rounding per cast component plus the length-d accumulation bound
    γ_d, both over Σ|aᵢ||bᵢ| ≤ 1 for unit vectors (Cauchy-Schwarz);
    any summation order (sequential, pairwise, blocked BLAS) is
    covered. Taken ×4 for headroom: the slack only ever ADDS
    candidates, and every candidate is re-scored exactly in float64,
    so output stays bit-identical to the dense float64 path."""
    return _PRESCREEN_MARGIN + 4 * (dim + 2) * 2.0**-24


def _neardup_cells_f32(a, b, threshold, margin, extra_mask=None):
    """``_neardup_cells`` with a float32 prescreen over PRE-normalized
    block matrices (``a``/``b`` are ``_unpack_block`` tuples). The only
    full-size passes are one sgemm and one compare — half the FLOPs and
    half the memory traffic of the f64 prescreen (the compare sweep is
    memory-bound); survivors get the ORIGINAL float64 dot/(na·nb) +
    HALF_UP evaluation, so emitted values are bit-identical to the
    dense path and the margin (see ``_f32_prescreen_margin``)
    guarantees the prescreen is a superset. Zero-norm rows prescreen
    to 0 and are dropped by the exact filter's NaN compare exactly as
    the dense path drops them."""
    a_ids, a_mat, a_nrm, a_n32 = a
    b_ids, b_mat, b_nrm, b_n32 = b
    cand = (a_n32 @ b_n32.T) >= np.float32(threshold - margin)
    if extra_mask is not None:
        cand &= extra_mask
    ai, bj = np.nonzero(cand)
    if len(ai) == 0:
        return ai, bj, np.empty(0, dtype=np.float64)
    dots = np.einsum("ij,ij->i", a_mat[ai], b_mat[bj])
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = _round_half_up(dots / (a_nrm[ai] * b_nrm[bj]))
    keep = cos >= threshold
    return ai[keep], bj[keep], cos[keep]


_PACK_SCHEMA = "__blk int, n long, ids binary, vecs binary"


def _make_pack(id_col: str, vec_col: str):
    """One-row-per-block packer (stage 1 of the blocked plans): the
    block's ids pickled, its float64 matrix as raw bytes — per-row
    Arrow framing and the python→numpy conversion are paid once per
    BLOCK, everything downstream moves whole blocks."""

    def _pack(key, pdf):
        import pickle

        import pandas as pd

        ids = pdf[id_col].to_numpy()
        mat = np.ascontiguousarray(_vec_matrix(pdf[vec_col]))
        return pd.DataFrame(
            {
                "__blk": [int(key[0])],
                "n": [len(ids)],
                "ids": [pickle.dumps(ids)],
                "vecs": [mat.tobytes()],
            }
        )

    return _pack


def _unpack_packed(row, dim: int):
    """Inverse of ``_make_pack``: (ids, f64 matrix, norms, f32
    pre-normalized matrix) — the `_neardup_cells_f32` block tuple."""
    import pickle

    ids = pickle.loads(row["ids"])
    mat = np.frombuffer(row["vecs"], dtype=np.float64).reshape(
        int(row["n"]), dim
    )
    nrm = np.sqrt((mat * mat).sum(axis=1))
    with np.errstate(divide="ignore", invalid="ignore"):
        n32 = (mat / np.where(nrm == 0, 1.0, nrm)[:, None]).astype(
            np.float32
        )
    return ids, mat, nrm, n32


def _neardup_pairs_blocked(
    corpus: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    n_rows: int,
    dim: int,
    schema: str,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold with NO driver materialization.

    Rows hash into ``n_blocks`` ≈ n_rows / block_rows blocks on
    xxhash64(id) (block membership only partitions the work — every
    unordered doc pair lands in exactly one block pair, so coverage
    and output are independent of the hashing). Three stages:

      1. PACK — one corpus shuffle builds ONE ROW PER BLOCK holding the
         block's ids (pickled) and its float64 matrix as raw bytes.
         Everything downstream moves whole blocks: per-row Arrow
         framing and the per-row python→numpy conversion
         (``_vec_matrix``) — which the previous row-fan-out plan paid
         n_blocks× per row, measured as a large share of the 135 s
         sf10 wall — are paid ONCE per block here.
      2. TILE fan-out — blocks group into stripes of ``g`` blocks;
         one task owns a stripe×stripe SUPER-TILE of block pairs and
         loops them serially (sub-pair sims stay ≤ block_rows²). Each
         block ships to ~n_blocks/g tasks instead of n_blocks: the
         pair-materialization shuffle drops by g× (sf10: 49× corpus →
         11× corpus at g=5). The broadcast side is the tiny tile list,
         never the data.
      3. SCORE — per block pair, a float32 prescreen matmul over
         pre-normalized rows (provably-superset margin,
         ``_f32_prescreen_margin``) and the exact float64 re-score on
         survivors. Each surviving (a, b) dot product runs over the
         same full-dim float64 vectors as the broadcast plan, so the
         two plans are bit-identical (pinned in
         tests/test_similarity_matmul.py).
    """
    spark = corpus.sparkSession
    # block count from three bounds: the sims-matrix row cap (the
    # memory constraint — see NEARDUP_BLOCK_ROWS), the input-byte cap
    # (wide vectors), and enough stripes that tile tasks ≥ ~8 per core.
    par = spark.sparkContext.defaultParallelism
    block_rows = min(
        NEARDUP_BLOCK_ROWS, max(1, NEARDUP_BLOCK_BYTES // (dim * 8))
    )
    n_blocks = max(
        2,
        -(-n_rows // block_rows),
        int(np.ceil((np.sqrt(16 * par + 1) - 1) / 2)),
    )
    block_bytes = block_rows * dim * 8
    g_mem = max(1, NEARDUP_TILE_SIDE_BYTES // max(1, block_bytes))
    t_min = int(np.ceil((np.sqrt(16 * par + 1) - 1) / 2))
    g = int(max(1, min(g_mem, -(-n_blocks // t_min))))
    n_stripes = -(-n_blocks // g)
    tiles_idx = spark.createDataFrame(
        [(i, j) for i in range(n_stripes) for j in range(i, n_stripes)],
        "ti int, tj int",
    )
    blk = corpus.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
        .cast("int")
        .alias("__blk"),
        F.col(id_col),
        F.col(vec_col),
    )

    packed = blk.groupBy("__blk").applyInPandas(
        _make_pack(id_col, vec_col), _PACK_SCHEMA
    )
    # lazy checkpoint: BOTH tile sides consume `packed`, and a union's
    # ReusedExchange dedups only the shuffle — the Python pack stage
    # above it would otherwise execute twice (the whole-corpus
    # conversion paid again). The checkpoint materializes once, in the
    # tile job's first pass.
    packed = packed.localCheckpoint(eager=False)
    packed = packed.withColumn(
        "__stripe", (F.col("__blk") / F.lit(g)).cast("int")
    )
    cols = ["__blk", "n", "ids", "vecs"]
    side_a = packed.join(
        F.broadcast(tiles_idx), F.col("__stripe") == F.col("ti")
    ).select("ti", "tj", F.lit(0).alias("__side"), *cols)
    side_b = packed.join(
        F.broadcast(tiles_idx), F.col("__stripe") == F.col("tj")
    ).select("ti", "tj", F.lit(1).alias("__side"), *cols)
    tagged = side_a.unionByName(side_b)
    margin = _f32_prescreen_margin(dim)

    def _unpack_block(row):
        return _unpack_packed(row, dim)

    def _score_tile(pdf):
        import pandas as pd

        diagonal_tile = pdf["ti"].iloc[0] == pdf["tj"].iloc[0]
        cache: dict[int, tuple] = {}  # diagonal tiles unpack once/block

        def blocks(side):
            rows = pdf[pdf["__side"] == side].sort_values("__blk")
            out = []
            for _, row in rows.iterrows():
                bk = int(row["__blk"])
                if bk not in cache:
                    cache[bk] = _unpack_block(row)
                out.append((bk, cache[bk]))
            return out

        outs = []
        for abk, A in blocks(0):
            for bbk, B in blocks(1):
                if diagonal_tile and abk > bbk:
                    continue  # each unordered block pair scored once
                # same-block pair: the a<b mask canonicalizes AND
                # dedups the mirrored orderings
                mask = A[0][:, None] < B[0][None, :] if abk == bbk else None
                ai, bj, cos = _neardup_cells_f32(A, B, threshold, margin, mask)
                if abk == bbk:
                    lo, hi = A[0][ai], B[0][bj]
                else:
                    # cross-block: every unordered pair occurs exactly
                    # once, in whichever orientation — canonicalize
                    lo = np.minimum(A[0][ai], B[0][bj])
                    hi = np.maximum(A[0][ai], B[0][bj])
                outs.append(pd.DataFrame({"a_id": lo, "b_id": hi, "cos": cos}))
        if not outs:
            return pd.DataFrame({"a_id": [], "b_id": [], "cos": []})
        return pd.concat(outs, ignore_index=True)

    return (
        tagged.groupBy("ti", "tj")
        .applyInPandas(_score_tile, schema)
        .orderBy("a_id", "b_id", "cos")
    )


def _neardup_pairs_delta(
    new: DataFrame,
    state: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact near-dup pairs TOUCHING the delta: delta×delta via the
    exact self operator on the delta alone (escalation off — the delta
    is batch-sized by contract) plus delta×state via a cross plan that
    never enumerates state×state. Same kernels, bit-identical cosines,
    canonical (min, max) ids; ids disjoint across sides by contract
    (equal-id cross hits are dropped defensively)."""
    dd = neardup_pairs(
        new, threshold, id_col, vec_col, escalate_bytes=None
    )
    id_type = new.schema[id_col].dataType.simpleString()
    schema = f"a_id {id_type}, b_id {id_type}, cos double"
    probe = new.agg(
        F.count(F.lit(1)).alias("n"), F.max(F.size(vec_col)).alias("dim")
    ).first()
    n_new, dim = int(probe["n"]), int(probe["dim"] or 0)
    if n_new == 0:
        return dd
    if n_new * dim * 8 <= NEARDUP_BROADCAST_MAX_BYTES:
        # nightly-ingest fast path: the DELTA matrix broadcasts; ONE
        # narrow pass over the state scores each Arrow batch against it
        # as a single matmul — zero state shuffle, the same legitimacy
        # gate as the small-corpus self plan
        rows = new.select(id_col, vec_col).collect()
        d_ids = np.asarray([r[id_col] for r in rows])
        d_mat = _vec_matrix(list(r[vec_col]) for r in rows)
        d_nrm = np.sqrt((d_mat * d_mat).sum(axis=1))
        bvar = new.sparkSession.sparkContext.broadcast((d_ids, d_mat, d_nrm))

        def _cross_batches(batches):
            import pandas as pd

            b_ids, b_mat, b_nrm = bvar.value
            with np.errstate(divide="ignore", invalid="ignore"):
                b_norm = b_mat / np.where(b_nrm == 0, 1.0, b_nrm)[:, None]
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                a_ids = pdf[id_col].to_numpy()
                a_mat = _vec_matrix(pdf[vec_col])
                a_nrm = np.sqrt((a_mat * a_mat).sum(axis=1))
                # chunked a-side: same sims-slab bound (and bit-identity
                # argument) as the self broadcast plan
                for s in range(0, len(a_ids), _bcast_chunk(len(b_ids))):
                    e = min(s + _bcast_chunk(len(b_ids)), len(a_ids))
                    ai, bj, cos = _neardup_cells(
                        a_mat[s:e], a_nrm[s:e], b_mat, b_nrm, threshold,
                        bn=b_norm,
                    )
                    sa, sb = a_ids[s:e][ai], b_ids[bj]
                    keep = sa != sb  # defensive: contract says disjoint
                    sa, sb, cos = sa[keep], sb[keep], cos[keep]
                    yield pd.DataFrame(
                        {
                            "a_id": np.minimum(sa, sb),
                            "b_id": np.maximum(sa, sb),
                            "cos": cos,
                        }
                    )

        dc = state.select(id_col, vec_col).mapInPandas(_cross_batches, schema)
    else:
        sprobe = state.agg(F.count(F.lit(1)).alias("n")).first()
        dc = _neardup_cross_blocked(
            new, state, threshold, id_col, vec_col,
            n_new, int(sprobe["n"]), dim, schema,
        )
    return dd.unionByName(dc).orderBy("a_id", "b_id", "cos")


def _neardup_cross_blocked(
    a_df: DataFrame,
    b_df: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    n_a: int,
    n_b: int,
    dim: int,
    schema: str,
) -> DataFrame:
    """Blocked exact A×B cosine join (the delta×state leg past the
    delta-broadcast gate): both relations pack into one-row-per-block
    matrices, stripes of g blocks form super-tile tasks covering the
    FULL A×B grid (no triangle — the relations are disjoint), and each
    block pair runs the f32-prescreen + exact-f64 kernel of the self
    plan. Shuffle volume: A ships ⌈nb_blocks/g⌉×, B ships
    ⌈na_blocks/g⌉× — for a batch-sized delta the B (state) side ships
    only a handful of copies, never its own pair expansion."""
    spark = a_df.sparkSession
    par = spark.sparkContext.defaultParallelism
    block_rows = min(
        NEARDUP_BLOCK_ROWS, max(1, NEARDUP_BLOCK_BYTES // (dim * 8))
    )
    na_blocks = max(1, -(-n_a // block_rows))
    nb_blocks = max(1, -(-n_b // block_rows))
    block_bytes = block_rows * dim * 8
    g = int(max(1, NEARDUP_TILE_SIDE_BYTES // max(1, block_bytes)))
    # shrink g until the tile grid feeds ~8 tasks per core (or is as
    # fine as the block grid allows)
    t_target = min(8 * par, na_blocks * nb_blocks)
    while g > 1 and (-(-na_blocks // g)) * (-(-nb_blocks // g)) < t_target:
        g -= 1
    sa, sb = -(-na_blocks // g), -(-nb_blocks // g)
    tiles_idx = spark.createDataFrame(
        [(i, j) for i in range(sa) for j in range(sb)], "ti int, tj int"
    )

    def _blocks(df, n_blocks):
        return (
            df.select(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
                .cast("int")
                .alias("__blk"),
                F.col(id_col),
                F.col(vec_col),
            )
            .groupBy("__blk")
            .applyInPandas(_make_pack(id_col, vec_col), _PACK_SCHEMA)
            .withColumn("__stripe", (F.col("__blk") / F.lit(g)).cast("int"))
        )

    cols = ["__blk", "n", "ids", "vecs"]
    side_a = _blocks(a_df, na_blocks).join(
        F.broadcast(tiles_idx), F.col("__stripe") == F.col("ti")
    ).select("ti", "tj", F.lit(0).alias("__side"), *cols)
    side_b = _blocks(b_df, nb_blocks).join(
        F.broadcast(tiles_idx), F.col("__stripe") == F.col("tj")
    ).select("ti", "tj", F.lit(1).alias("__side"), *cols)
    tagged = side_a.unionByName(side_b)
    margin = _f32_prescreen_margin(dim)

    def _score_tile(pdf):
        import pandas as pd

        a_rows = pdf[pdf["__side"] == 0]
        b_rows = pdf[pdf["__side"] == 1]
        outs = []
        for _, ra in a_rows.iterrows():
            A = _unpack_packed(ra, dim)
            for _, rb in b_rows.iterrows():
                B = _unpack_packed(rb, dim)
                ai, bj, cos = _neardup_cells_f32(A, B, threshold, margin)
                sa_, sb_ = A[0][ai], B[0][bj]
                keep = sa_ != sb_  # defensive: contract says disjoint
                outs.append(
                    pd.DataFrame(
                        {
                            "a_id": np.minimum(sa_[keep], sb_[keep]),
                            "b_id": np.maximum(sa_[keep], sb_[keep]),
                            "cos": cos[keep],
                        }
                    )
                )
        if not outs:
            return pd.DataFrame({"a_id": [], "b_id": [], "cos": []})
        return pd.concat(outs, ignore_index=True)

    return tagged.groupBy("ti", "tj").applyInPandas(_score_tile, schema)


# a-side slice for the in-bucket verify: bounds the per-slice sims
# allocation at chunk×|group| cells, so a pathologically skewed bucket
# costs more slices instead of an |bucket|²-cell OOM
LSH_VERIFY_CHUNK = 2048
# Per-task cap on a verify group: a bucket larger than this is
# salt-split into ⌈rows/cap⌉ slices and its pair space covered by
# slice-pair tasks (the exact plan's super-tile trick), so the worst
# crawl-corpus skew — near-identical boilerplate embeddings sharing ALL
# band buckets — degrades to more tasks, never to one task
# materializing the whole bucket (round-8 VERDICT #1). The cap is
# BYTES-derived per dim (ceiling LSH_MAX_BUCKET_ROWS): the measured
# Python-side cost of a group is ~40× its raw vector bytes (Arrow→
# pandas materializes one object cell per row, the scorer widens to
# f64, and worker reuse retains allocator high-water marks across
# groups — a 4000-row 768-d group held ~500 MB per worker and 32
# workers OOM-killed the 1M×768 measurement run), so 16 MB of raw f64
# per group keeps a full complement of workers at a few hundred MB
# each. Every bucket ABOVE the derived cap still gets full pair
# coverage via the slice-pair fan-out; output is cap-invariant
# (pinned).
LSH_MAX_BUCKET_ROWS = 8192
LSH_BUCKET_TARGET_BYTES = 16 << 20


def _lsh_bucket_cap(dim: int) -> int:
    return max(
        1024, min(LSH_MAX_BUCKET_ROWS, LSH_BUCKET_TARGET_BYTES // (dim * 8))
    )


def _band_buckets(
    m: "np.ndarray", p_mat: "np.ndarray", band_planes: int
) -> "np.ndarray":
    """Banded sign-bit buckets: (n, n_bands) int64 — one bucket id per
    band of ``band_planes`` consecutive planes. THE hyperplane-LSH
    bucketing rule, shared by ``hyperplane_lsh_topk`` (one band of all
    its planes) and ``neardup_pairs_lsh`` so the two paths cannot
    drift."""
    if p_mat.shape[0] % band_planes:
        # n_bands = planes // band_planes would silently DROP the
        # remainder planes — a caller bug, not a tunable (round-8 ADVICE)
        raise ValueError(
            f"{p_mat.shape[0]} planes do not split into bands of "
            f"{band_planes}"
        )
    bits = (m @ p_mat.T) >= 0
    n_bands = bits.shape[1] // band_planes
    w = (1 << np.arange(band_planes)).astype(np.int64)
    return (
        bits.reshape(len(m), n_bands, band_planes).astype(np.int64) * w
    ).sum(axis=2)


def _make_sign_batches(
    id_col: str,
    vec_col: str,
    p_mat: "np.ndarray",
    n_bands: int,
    band_planes: int,
    include_vec: bool = True,
):
    """mapInPandas generator for the banded signature pass: one
    (id[, vec], band, bucket) output frame per band per Arrow batch,
    zero-norm rows dropped. One factory shared by the self-join LSH,
    the delta probe, and the persisted embedding state so the
    bucketing arithmetic cannot drift.

    ``include_vec=False`` emits id-only band rows — the round-10
    serving layout and the pair-verify probe never consume vectors on
    band rows, and shipping them anyway multiplied the Arrow transfer
    b× (a 1M×768 auto-banded state build streamed ~190 GB of vector
    copies through Arrow before this flag; column pruning cannot reach
    inside the Python worker)."""

    def _sign_batches(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            v_mat = _vec_matrix(pdf[vec_col])
            keep = (v_mat * v_mat).sum(axis=1) > 0  # zero-norm prefilter
            if not keep.all():
                pdf = pdf[keep].reset_index(drop=True)
                v_mat = v_mat[keep]
            if len(pdf) == 0:
                continue
            buckets = _band_buckets(v_mat, p_mat, band_planes)
            for b in range(n_bands):
                cols = {id_col: pdf[id_col]}
                if include_vec:
                    cols[vec_col] = pdf[vec_col]
                cols["band"] = b
                cols["bucket"] = buckets[:, b]
                yield pd.DataFrame(cols)

    return _sign_batches


def neardup_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_bands: int | None = None,
    band_planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_rows: int | None = None,
    against_state: dict | None = None,
    allow_full_fan: bool = False,
) -> DataFrame:
    """Approximate near-dup pairs: the SCALE twin of ``neardup_pairs``.

    The exact operator is O(n²) score work by contract; this one
    restricts candidates to rows sharing a hyperplane bucket in ANY of
    ``n_bands`` bands of ``band_planes`` sign bits (the banding trick
    MinHash uses, over the cosine-LSH family) and verifies candidates
    with the SAME full-dim float64 dot + HALF_UP arithmetic — so every
    emitted pair also appears in ``neardup_pairs`` output WITH THE
    SAME cosine (subset property, pinned), but recall < 1 by design:
    P(caught) = 1 − (1 − p^r)^b with p = 1 − θ/π, so at the defaults
    a cos-0.9 pair is caught w.p. ~0.996 and recall → 1 as cos → 1,
    while distant pairs rarely collide. No SQL oracle (recall < 1);
    exactness-of-emitted-values and recall are pytest-pinned.

    Scale shape: one vectorized signature pass (a P×dim matmul per
    Arrow batch — P = n_bands·band_planes sign bits, packed into one
    int per band, one output frame per band so worker memory stays
    ~1× the input batch), a shuffle of (band, bucket)-keyed rows —
    O(n·b), never O(n²) — and per-bucket exact verification whose
    EXPECTED cost is Σ|bucket|², controlled by ``band_planes`` (each
    extra plane halves the expected bucket size). Zero-norm rows are
    dropped at signature time — they can never appear in output (NaN
    cosine) and they all sign into ONE bucket per band, the worst skew
    shape.

    SKEW: a bucket past ``max_bucket_rows`` — the COMMON shape on crawl
    corpora, where near-identical boilerplate embeddings share every
    band bucket — is salt-split into ⌈rows/cap⌉ hash slices, and its
    pair space is covered by one task per unordered SLICE PAIR (the
    exact plan's super-tile trick: a row with slice t joins tasks
    (min(i,t), max(i,t)) for every i, so each unordered row pair lands
    in exactly one task). Peak task memory is bounded at ~2·cap rows
    regardless of bucket size; the hot rows' extra shuffle copies
    (⌈rows/cap⌉ per row) stay proportional to the |bucket|²/cap verify
    work the bucket forces anyway. Within a slice-pair task the scorer
    is the same chunked exact kernel, so output and determinism are
    unchanged (subset/recall pins hold across any cap). The bucket-size
    pre-pass re-executes the signature matmul once more — ~n·dim·P
    flops, noise next to the verify shuffle; checkpointing the b×
    corpus-sized signed relation instead was the worse trade. An
    (id, band, bucket)-only shuffle with per-pair vector re-fetch (the
    minhash verify pattern) was considered and REJECTED for the general
    case: it materializes Σ|bucket|²/2 candidate-pair rows through a
    shuffle before scoring — which explodes on exactly the corpora this
    operator exists for (one 2000-row boilerplate bucket × 6 bands is
    already 12M pair rows vs 36 MB of fanned vectors; ~n²/2^planes per
    band on random data) — where the in-bucket verify scores pairs
    without ever materializing them. It pays only when nearly every
    bucket is a singleton. If the b×-vector /tmp footprint ever binds
    on a single box, loop bands sequentially (b small shuffles, 1/b
    peak scratch) rather than switching to pair materialization.
    ``against_state`` (``read_embedding_state``) runs the INCREMENTAL
    delta-vs-corpus form instead: ``corpus`` plays the delta and probes
    the persisted partitioned signed relation — see
    ``_neardup_lsh_delta`` (output = the union self-join restricted to
    delta-touching pairs, pinned).
    """
    if against_state is not None:
        # banding params default FROM THE SPEC — the auto-sized builder
        # picks them, so requiring the caller to re-specify would force
        # every probe site to read the spec first; explicitly-passed
        # values are still validated against it (mismatch raises)
        spec = against_state["spec"]
        return _neardup_lsh_delta(
            corpus, against_state, threshold,
            spec["n_bands"] if n_bands is None else n_bands,
            spec["band_planes"] if band_planes is None else band_planes,
            id_col, vec_col, seed, max_bucket_rows, allow_full_fan,
        )
    if n_bands is None:
        n_bands = 16
    if band_planes is None:
        band_planes = 8
    # one corpus probe: empty short-circuit + uniform-width contract
    # (ragged vectors would fail deep in _vec_matrix with an opaque
    # numpy error; round-8 ADVICE)
    probe = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size(vec_col)).alias("dmin"),
        F.max(F.size(vec_col)).alias("dmax"),
    ).first()
    id_type = corpus.schema[id_col].dataType.simpleString()
    # vectors ride the banded shuffle VERBATIM (input element type, not
    # an array<double> up-cast): at 768-d float32 input the b× vector
    # shuffle halves; the verify's numpy conversion widens to f64 from
    # the same values either way, so output stays bit-identical
    vec_type = corpus.schema[vec_col].dataType.simpleString()
    sig_schema = f"{id_col} {id_type}, {vec_col} {vec_type}, band int, bucket long"
    pair_schema = f"a_id {id_type}, b_id {id_type}, cos double"
    if not probe["n"]:
        return corpus.sparkSession.createDataFrame([], pair_schema)
    if probe["dmin"] != probe["dmax"]:
        raise ValueError(
            f"{vec_col} must be uniform-width: found lengths "
            f"{probe['dmin']}..{probe['dmax']}"
        )
    if max_bucket_rows is None:
        max_bucket_rows = _lsh_bucket_cap(int(probe["dmax"]))
    planes = hyperplane_planes(
        dim=int(probe["dmax"]), n_planes=n_bands * band_planes, seed=seed
    )
    p_mat = np.asarray(planes, dtype=np.float64)
    signed = corpus.select(id_col, vec_col).mapInPandas(
        _make_sign_batches(id_col, vec_col, p_mat, n_bands, band_planes),
        sig_schema,
    )

    # Hot buckets (> cap rows) split into ⌈rows/cap⌉ salt slices; the
    # hot set is tiny by construction (≤ n·b/cap buckets) so the size
    # lookup broadcasts. A row with slice t fans out to one task per
    # unordered slice pair touching t — ``__ns`` copies — which for
    # non-hot buckets (ns=1, slice 0) degenerates to exactly the old
    # one-task-per-bucket plan.
    hot = (
        signed.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") > max_bucket_rows)
        .select(
            "band",
            "bucket",
            F.ceil(F.col("__bn") / F.lit(max_bucket_rows))
            .cast("int")
            .alias("__ns"),
        )
    )
    sliced = (
        signed.join(F.broadcast(hot), ["band", "bucket"], "left")
        .withColumn("__ns", F.coalesce("__ns", F.lit(1)))
        .withColumn(
            "__sl",
            F.pmod(
                F.xxhash64(F.col(id_col), F.lit(seed + 1)), F.col("__ns")
            ).cast("int"),
        )
    )
    tasks = F.transform(
        F.sequence(F.lit(0), F.col("__ns") - 1),
        lambda i: F.struct(
            F.least(i, F.col("__sl")).cast("int").alias("ti"),
            F.greatest(i, F.col("__sl")).cast("int").alias("tj"),
        ),
    )
    fanned = sliced.select(
        id_col, vec_col, "band", "bucket", "__sl", F.explode(tasks).alias("__t")
    ).select(id_col, vec_col, "band", "bucket", "__sl", "__t.ti", "__t.tj")
    # Explicit verify-exchange sizing: the session sizes shuffle
    # partitions from the SCAN bytes, but the signed relation is b× the
    # corpus (vectors ride every band) — at 1M×768-d×12 bands that is
    # ~37 GB through a handful of reduce partitions, and the groupBy's
    # per-task sort spilled the whole volume to disk a second time
    # (measured: the round-9 1M run died on disk, not memory). Sizing
    # the exchange at ~64 MB per task keeps every sort in memory; the
    # group keys stay the partitioning, so no second exchange appears.
    elem = 4 if "float>" in vec_type else 8
    spark = corpus.sparkSession
    fan_parts = max(
        spark.sparkContext.defaultParallelism,
        min(
            4096,
            int(probe["n"]) * n_bands * (int(probe["dmax"]) * elem + 28)
            // (64 << 20)
            + 1,
        ),
    )
    fanned = fanned.repartition(fan_parts, "band", "bucket", "ti", "tj")

    def _verify_group(pdf):
        import pandas as pd

        empty = pd.DataFrame({"a_id": [], "b_id": [], "cos": []})
        if len(pdf) < 2:
            return empty
        diagonal = pdf["ti"].iloc[0] == pdf["tj"].iloc[0]
        if diagonal:
            ids = pdf[id_col].to_numpy()
            mat = _vec_matrix(pdf[vec_col])
            b_ids, b_mat = ids, mat  # b-side = same rows: triangle below
        else:
            a_rows = pdf[pdf["__sl"] == pdf["ti"].iloc[0]]
            b_rows = pdf[pdf["__sl"] == pdf["tj"].iloc[0]]
            if not len(a_rows) or not len(b_rows):
                return empty
            ids = a_rows[id_col].to_numpy()
            mat = _vec_matrix(a_rows[vec_col])
            b_ids = b_rows[id_col].to_numpy()
            b_mat = _vec_matrix(b_rows[vec_col])  # rectangle: disjoint
        nrm = np.sqrt((mat * mat).sum(axis=1))
        b_nrm = (
            nrm if diagonal else np.sqrt((b_mat * b_mat).sum(axis=1))
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            b_norm = b_mat / np.where(b_nrm == 0, 1.0, b_nrm)[:, None]
        outs = []
        # a-side chunked (+ diagonal b-side sliced to [s:]): sims stay
        # ≤ chunk×|group| cells. On the diagonal every POSITION pair
        # (p, q), p < q, is scored exactly once — the positional mask,
        # with min/max id canonicalization after, replaces the id-order
        # mask so the upper-triangle restriction also halves the matmul
        for s in range(0, len(ids), LSH_VERIFY_CHUNK):
            e = min(s + LSH_VERIFY_CHUNK, len(ids))
            if diagonal:
                bs = s
                mask = (
                    np.arange(s, e)[:, None]
                    < np.arange(s, len(ids))[None, :]
                )
            else:
                bs = 0
                mask = None
            ai, bj, cos = _neardup_cells(
                mat[s:e], nrm[s:e], b_mat[bs:], b_nrm[bs:], threshold, mask,
                bn=b_norm[bs:],
            )
            a_ids, bb_ids = ids[s:e][ai], b_ids[bs:][bj]
            outs.append(
                pd.DataFrame(
                    {
                        "a_id": np.minimum(a_ids, bb_ids),
                        "b_id": np.maximum(a_ids, bb_ids),
                        "cos": cos,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    return (
        fanned.groupBy("band", "bucket", "ti", "tj")
        .applyInPandas(_verify_group, pair_schema)
        # a close pair collides in several bands — one row per pair
        # (cos is a pure function of the pair, so distinct is exact)
        .distinct()
        .orderBy("a_id", "b_id", "cos")
    )


def _auto_band_params(
    state_rows: int,
    expected_delta_rows: int | None,
    threshold: float,
) -> tuple[int, int]:
    """(n_bands, band_planes) for a serving state sized so the PROBE's
    bucket pruning actually engages on the declared nightly delta.

    Pruning engages while |delta| ≲ 2^band_planes (per-band expected
    bucket coverage 1 − e^(−|delta|/2^p)); the round-9 campaign showed
    the old fixed 8-plane default builds a state whose probe fan ships
    the full state b× for any realistic delta (two observed
    disk-fulls). So: planes from the delta (2^p ≥ 4·|delta| → coverage
    ≤ 1−e^(−1/4) ≈ 0.22), defaulting the delta to 1% of the corpus
    (the nightly-batch shape this state exists for); then the band
    COUNT from the standard banding calculus so a pair AT the
    threshold is still caught w.p. ≥ ~0.98 — wider bands prune harder
    but need more of them (recall depends on both, so the two must be
    derived together)."""
    if expected_delta_rows is None:
        expected_delta_rows = max(256, state_rows // 100)
    p = int(np.ceil(np.log2(max(4 * expected_delta_rows, 2))))
    p = max(8, min(20, p))
    match = 1.0 - np.arccos(min(1.0, threshold)) / np.pi

    def bands_for(planes: int) -> int:
        return int(np.ceil(np.log(0.02) / np.log(1.0 - match**planes)))

    # recall wins over pruning: at low thresholds wide bands need more
    # than the 96-band cap to hold 0.98 recall (the banding curve is
    # steep in p there), so step the planes DOWN until the band count
    # is feasible — the probe's coverage valve then routes genuinely
    # un-prunable (big delta × low threshold) probes to the exact plan,
    # which is the documented selection rule for that regime anyway.
    while p > 8 and bands_for(p) > 96:
        p -= 1
    return max(4, min(96, bands_for(p))), p


def build_embedding_state(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int | None = None,
    band_planes: int | str = "auto",
    expected_delta_rows: int | None = None,
    threshold: float = 0.9,
    seed: int = 42,
) -> None:
    """Persist the corpus-side LSH relation the incremental embedding
    near-dup probe reads: the banded signed relation (id, vec, band,
    bucket — ``_make_sign_batches``, the same pass the self-join runs)
    written PARTITIONED BY (band, bucket), plus a one-row ``spec``
    (dim, n_bands, band_planes, seed). This is the nightly-ingest
    serving layout for embeddings — "near-dup 50k new vectors against
    5M indexed" pays the corpus's signature pass ONCE here; probes
    read only the partitions whose buckets the delta touches.

    ``band_planes`` defaults to ``"auto"`` (round-9 verdict): the old
    fixed 8-plane default built states whose probe path was unusable
    for typical nightly deltas — any delta past a few ×2⁸ rows
    occupies every bucket and the fan ships the full state b× (two
    observed disk-fulls). Auto derives (band_planes, n_bands) together
    from the corpus size, the declared ``expected_delta_rows``
    (default: 1% of the corpus) and the ``threshold`` the probes will
    run at, via ``_auto_band_params`` — probe-usable by construction
    while holding ≥ ~0.98 recall at the threshold. Pass both
    ``n_bands`` and an integer ``band_planes`` to pin them manually
    (the probe then validates its params against the spec as before).

    Higher plane counts trade pruning granularity against directory
    explosion, so (band, bucket) partitioning is capped at 2^12
    buckets per band and falls back to band-only partitioning past it
    (bucket pruning then rides parquet row-group filters instead of
    directories). Keep in sync with upserts the same way the text
    dedup state is — the relation is keyed by id and banding is a
    deterministic function of the vector (reading it back is
    output-identical to recomputing, pinned)."""
    probe = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size(vec_col)).alias("dmin"),
        F.max(F.size(vec_col)).alias("dmax"),
    ).first()
    if probe["dmin"] != probe["dmax"]:
        raise ValueError(
            f"{vec_col} must be uniform-width: found lengths "
            f"{probe['dmin']}..{probe['dmax']}"
        )
    dim = int(probe["dmax"] or 0)
    if band_planes == "auto":
        n_bands, band_planes = _auto_band_params(
            int(probe["n"]), expected_delta_rows, threshold
        )
    elif n_bands is None:
        n_bands = 16
    id_type = corpus.schema[id_col].dataType.simpleString()
    p_mat = np.asarray(
        hyperplane_planes(dim, n_planes=n_bands * band_planes, seed=seed),
        dtype=np.float64,
    )
    # The persisted band relation is ID-ONLY: carrying the vector on
    # every band row (the self-join's in-flight layout) would amplify
    # the STORED state b× — an auto-sized 1M×768 state at ~40 bands is
    # ~115 GB with vectors on rows vs ~1 GB id-only + the corpus
    # vectors once. The self-join's rejection of id-only (pair-
    # materialization explosion) does not apply to the probe: its
    # candidate set is delta-anchored and collision-bounded, so the
    # per-probe vector re-fetch is one bounded semi-join, not Σ|bucket|²
    # pair rows. include_vec=False keeps the b× copies out of the
    # Arrow transfer too, not just out of the files.
    signed = corpus.select(id_col, vec_col).mapInPandas(
        _make_sign_batches(
            id_col, vec_col, p_mat, n_bands, band_planes,
            include_vec=False,
        ),
        f"{id_col} {id_type}, band int, bucket long",
    )
    if 2 ** band_planes <= 4096:
        (
            signed.repartition("band", "bucket")
            .write.mode("overwrite")
            .partitionBy("band", "bucket")
            .parquet(f"{path}/signed")
        )
    else:
        (
            signed.repartition("band")
            .write.mode("overwrite")
            .partitionBy("band")
            .parquet(f"{path}/signed")
        )
    # vectors PARTITIONED by a stable id-hash bucket (round 12): the
    # wide relation's evictions (repair_embedding_state) then touch
    # only the buckets holding the modified ids — partition-local, the
    # IVF-repair discipline. Readers are unaffected (every consumer
    # selects (id, vec) explicitly); the bucket count rides the spec so
    # appends/repairs hash identically forever.
    (
        corpus.select(id_col, vec_col)
        .withColumn("vb", _vb_col(id_col))
        .repartition("vb")
        .write.mode("overwrite")
        .partitionBy("vb")
        .parquet(f"{path}/vectors")
    )
    _tiny_df(
        corpus.sparkSession,
        [(dim, n_bands, band_planes, seed, int(probe["n"]), VB_BUCKETS)],
        "dim int, n_bands int, band_planes int, seed int, n long, "
        "n_vb int",
    ).write.mode("overwrite").parquet(f"{path}/spec")


def repair_embedding_state(
    spark,
    path: str,
    updates: DataFrame | None = None,
    deleted_ids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """O(stale) update-in-place repair for the embedding dedup serving
    state — the `repair_ivf_index` discipline applied to the second
    stateful family (round-11 "What's wrong #2": staleness previously
    degraded future probes until an O(corpus) rebuild):

      1. locate: the touched ids' OLD vectors read from the vectors
         relation with PHYSICAL partition pruning (`vb` id-hash dirs —
         the round-12 layout) — at most |touched| of the spec's `n_vb`
         buckets scan.
      2. evict signed rows: the old vectors re-sign (banding is a
         deterministic per-row function, the append≡rebuild property),
         giving the EXACT (band, bucket) partitions holding their
         rows; only those partitions rewrite (dynamic overwrite,
         emptied dirs deleted). The band-only layout (band_planes >
         12 — what auto banding lands at production corpus sizes)
         rewrites whole band dirs: still id-only rows, so the wall is
         ~the build's signed pass (measured 38.6 s at 1M×768 for 10k
         mods), never the wide vectors. Cost shape by layout: at
         (band, bucket) layouts the touched-dir count is |mod|×bands
         and FILE OPS dominate for big modify batches (measured 101 s
         for 200 mods over a 20k corpus) — the stale trigger stays
         the arbiter of repair-vs-rebuild there. A tombstone relation
         honored by the probes would make signed eviction O(stale)
         proper, at the price of an exclusion join on every probe —
         deliberately not taken while the measured walls beat the
         composed rebuild by ~10–30×.
      3. evict vector rows: the same anti-join over only the touched
         `vb` buckets.
      4. re-insert: `updates` go through `append_embedding_state`
         (strictly-new now holds) — so an update id absent from the
         state is a plain insert (upsert semantics), and the spec's
         row count lands exactly at n − removed + |updates|.

    After a repair, FUTURE probes compare against the new vectors —
    the state itself never needs the rebuild cadence for freshness.
    What repair does NOT fix by itself: standing cluster labels stay
    monotone between rebuilds (`run_dedup_maintenance` docstring)
    UNLESS the pipeline layer's exact-labels mode is on
    (`DedupConfig.pairs_path` + `_exact_label_maintenance`, which
    persists the pair relation and recomputes affected components) —
    the repair itself never touches labels either way.

    Legacy layouts (unpartitioned vectors / spec without `n_vb`) are
    REFUSED — rebuild with `build_embedding_state` to adopt the
    partitioned layout. Retry-idempotent like the IVF repair: eviction
    re-evicts whatever a crashed attempt appended (their ids are
    touched), re-insert lands one copy.

    Returns ``{"removed", "reassigned", "n"}``."""
    from eea_crawler_spark.operators.dedup import (
        _fs_delete,
        _heal_rel,
        _read_rel,
        _release_local_checkpoint,
        _try_read_parquet,
        _write_embedding_spec,
    )

    _heal_rel(spark, path, "spec")
    spec_df = _read_rel(spark, path, "spec")
    if spec_df is None:
        raise ValueError(f"no spec relation under {path!r} — not an "
                         "embedding state dir")
    spec = spec_df.first().asDict()
    vecs = _try_read_parquet(spark, f"{path}/vectors")
    if vecs is None or "vb" not in vecs.columns or not spec.get("n_vb"):
        raise ValueError(
            "repair_embedding_state needs the round-12 partitioned "
            "vectors layout (vb id-hash dirs + spec n_vb) — this is a "
            "legacy state; rebuild it with build_embedding_state"
        )
    n_vb = int(spec["n_vb"])
    dim = int(spec["dim"])
    if updates is not None:
        updates = updates.select(id_col, vec_col).localCheckpoint(
            eager=True
        )
        probe = updates.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(id_col)).alias("nd"),
            F.min(F.size(vec_col)).alias("dmin"),
            F.max(F.size(vec_col)).alias("dmax"),
        ).first()
        n_updates = int(probe["n"])
        if n_updates:
            if probe["nd"] != n_updates:
                raise ValueError(
                    "repair_embedding_state updates must be unique per "
                    "id — duplicate ids make which-vector-wins ambiguous"
                )
            if probe["dmin"] != probe["dmax"] or int(probe["dmax"]) != dim:
                raise ValueError(
                    f"state holds {dim}-d vectors, updates have "
                    f"{probe['dmin']}..{probe['dmax']}-d"
                )
    else:
        n_updates = 0
    if deleted_ids is not None:
        # narrow projection only — NOT checkpointed (round-14, guide
        # §1.2): the ``touched`` checkpoint below materializes this
        # plan before any eviction rewrites the relations it may
        # derive from, so the separate eager checkpoint job was pure
        # overhead
        deleted_ids = deleted_ids.select(id_col)
    touched = None
    if n_updates:
        touched = updates.select(id_col)
    if deleted_ids is not None:
        touched = (
            deleted_ids if touched is None
            else touched.unionByName(deleted_ids)
        )
    if touched is None:
        if updates is not None:
            _release_local_checkpoint(updates)
        return {"removed": 0, "reassigned": 0, "n": int(spec["n"])}
    # the touched ids' vb bucket set rides the checkpoint job via
    # df.observe (round-14, guide §1.2 — the CkArrays discipline):
    # collect_set over ≤ n_vb ints replaces the separate
    # distinct+collect probe job this pruning set used to cost
    _obs_vb = Observation()
    touched = (
        touched.distinct()
        .observe(
            _obs_vb,
            F.collect_set(_vb_col(id_col, n_vb)).alias("vbs"),
        )
        .localCheckpoint(eager=True)
    )
    vb_vals = sorted(int(v) for v in _obs_vb.get["vbs"])
    # 1. locate the old rows — vb partition pruning bounds the scan;
    # the eviction count rides the checkpoint job (df.observe)
    _obs_old = Observation()
    old = (
        vecs.filter(F.col("vb").isin(vb_vals))
        .join(touched, [id_col], "left_semi")
        .select(id_col, vec_col)
        .observe(_obs_old, F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    n_removed = int(_obs_old.get["c"])
    n_after_evict = int(spec["n"])
    if n_removed:
        n_bands, band_planes = int(spec["n_bands"]), int(spec["band_planes"])
        p_mat = np.asarray(
            hyperplane_planes(
                dim, n_planes=n_bands * band_planes, seed=int(spec["seed"])
            ),
            dtype=np.float64,
        )
        id_type = old.schema[id_col].dataType.simpleString()
        old_signed = old.mapInPandas(
            _make_sign_batches(
                id_col, vec_col, p_mat, n_bands, band_planes,
                include_vec=False,
            ),
            f"{id_col} {id_type}, band int, bucket long",
        )
        part_cols = (
            ["band", "bucket"] if 2 ** band_planes <= 4096 else ["band"]
        )
        pairs = {
            (int(r["band"]), int(r["bucket"]))
            for r in old_signed.select("band", "bucket").distinct().collect()
        }
        signed = spark.read.parquet(f"{path}/signed").withColumns(
            {"band": F.col("band").cast("int"),
             "bucket": F.col("bucket").cast("long")}
        )
        if part_cols == ["band", "bucket"]:
            from functools import reduce

            by_band: dict[int, list] = {}
            for b, k in pairs:
                by_band.setdefault(b, []).append(k)
            pred = reduce(
                lambda a, c: a | c,
                (
                    (F.col("band") == b) & F.col("bucket").isin(ks)
                    for b, ks in by_band.items()
                ),
            )
            touched_parts = pairs
        else:
            bands = sorted({b for b, _ in pairs})
            pred = F.col("band").isin(bands)
            touched_parts = {(b,) for b in bands}
        keep = (
            signed.filter(pred)
            .join(touched, [id_col], "left_anti")
            .localCheckpoint(eager=True)
        )
        survivors = {
            tuple(int(r[c]) for c in part_cols)
            for r in keep.select(*part_cols).distinct().collect()
        }
        mode_before = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        try:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            if survivors:
                (
                    keep.repartition(*part_cols)
                    .write.mode("overwrite")
                    .partitionBy(*part_cols)
                    .parquet(f"{path}/signed")
                )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", mode_before
            )
        for part in touched_parts - survivors:
            sub = "/".join(
                f"{c}={v}" for c, v in zip(part_cols, part)
            )
            _fs_delete(spark, f"{path}/signed/{sub}")
        spark.catalog.refreshByPath(f"{path}/signed")
        _release_local_checkpoint(keep)
        # 3. vector rows leave their (pruned) vb buckets
        vkeep = (
            vecs.filter(F.col("vb").isin(vb_vals))
            .join(touched, [id_col], "left_anti")
            .localCheckpoint(eager=True)
        )
        v_survivors = {
            int(r["vb"]) for r in vkeep.select("vb").distinct().collect()
        }
        try:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            if v_survivors:
                (
                    vkeep.repartition("vb")
                    .write.mode("overwrite")
                    .partitionBy("vb")
                    .parquet(f"{path}/vectors")
                )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", mode_before
            )
        for vb in set(vb_vals) - v_survivors:
            _fs_delete(spark, f"{path}/vectors/vb={vb}")
        spark.catalog.refreshByPath(f"{path}/vectors")
        _release_local_checkpoint(vkeep)
    # Recompute the row count FROM the vectors relation rather than
    # decrementing spec.n by this run's removals (round-12 ADVICE): on
    # a retry after a crash between the eviction and the spec swap the
    # touched ids are already gone, n_removed = 0, and the decrement
    # would never land — spec.n would overcount forever. A parquet
    # count() is a footer-only scan, so this self-heal is cheap.
    vecs_now = _try_read_parquet(spark, f"{path}/vectors")
    n_after_evict = int(vecs_now.count()) if vecs_now is not None else 0
    if n_after_evict != int(spec["n"]):
        _write_embedding_spec(spark, path, spec, n_after_evict)
    reassigned = 0
    if n_updates:
        from eea_crawler_spark.operators.dedup import (
            append_embedding_state,
        )

        reassigned = append_embedding_state(
            spark, path, updates, id_col=id_col, vec_col=vec_col
        )
    for ck in (touched, old, updates, deleted_ids):
        if ck is not None:
            _release_local_checkpoint(ck)
    return {
        "removed": int(n_removed),
        "reassigned": int(reassigned),
        "n": n_after_evict + int(reassigned),
    }


def read_embedding_state(spark, path: str) -> dict:
    """Load the persisted embedding LSH state (build_embedding_state):
    ``{"signed": DataFrame, "vectors": DataFrame | None, "spec": dict}``
    ready to pass as ``against_state`` to ``neardup_pairs_lsh``.
    Partition-column types are re-pinned (directory values infer as
    int) so the probe's union with freshly-signed delta rows lines up.
    ``vectors`` is None for a pre-round-10 state whose signed relation
    still carries vectors on band rows — the probe handles both
    layouts."""
    from pyspark.errors import AnalysisException

    from eea_crawler_spark.operators.dedup import _read_rel

    signed = spark.read.parquet(f"{path}/signed")
    try:
        vectors = spark.read.parquet(f"{path}/vectors")
    except AnalysisException:
        vectors = None
    # spec via _read_rel: append_embedding_state swaps it through a
    # __new tmp dir — recover the mid-swap crash window instead of
    # raising on a missing primary
    spec_df = _read_rel(spark, path, "spec")
    if spec_df is None:
        raise ValueError(f"no spec relation under {path!r} — not an "
                         "embedding state dir")
    return {
        "signed": signed.withColumn(
            "band", F.col("band").cast("int")
        ).withColumn("bucket", F.col("bucket").cast("long")),
        "vectors": vectors,
        "spec": spec_df.first().asDict(),
    }


def _make_pair_verify(id_col: str, vec_col: str, threshold: float, bc):
    """mapInPandas kernel for the incremental probe's pair-verify plan:
    each input row is one candidate STATE vector plus the list of delta
    ids it collided with (``__as``); the delta's (ids, f64 matrix)
    arrives via broadcast. Scoring is ``_neardup_cells`` with a
    per-pair adjacency mask — the same prescreen-then-exact-HALF_UP
    arithmetic as every other near-dup plan, so emitted cosines are
    bit-identical. State rows process in ~1k-row slices and the mask is
    |distinct delta ids in slice| × slice — bounded however hot a
    boilerplate collision gets."""

    def fn(batches):
        import pandas as pd

        d_ids, d_mat = bc.value
        idx = {i: k for k, i in enumerate(d_ids.tolist())}
        d_nrm = np.sqrt((d_mat * d_mat).sum(axis=1))
        for pdf in batches:
            outs = []
            for s in range(0, len(pdf), 1024):
                sub = pdf.iloc[s : s + 1024]
                b_ids = sub[id_col].to_numpy()
                b_mat = _vec_matrix(sub[vec_col])
                b_nrm = np.sqrt((b_mat * b_mat).sum(axis=1))
                lists = sub["__as"].tolist()
                uniq = sorted({a for lst in lists for a in lst})
                rows = [idx[a] for a in uniq]
                pos = {a: k for k, a in enumerate(uniq)}
                mask = np.zeros((len(uniq), len(sub)), dtype=bool)
                for j, lst in enumerate(lists):
                    for a in lst:
                        mask[pos[a], j] = True
                ai, bj, cos = _neardup_cells(
                    d_mat[rows], d_nrm[rows], b_mat, b_nrm, threshold,
                    mask,
                )
                if len(ai):
                    a_sel = np.asarray(uniq)[ai]
                    outs.append(
                        pd.DataFrame(
                            {
                                "a_id": np.minimum(a_sel, b_ids[bj]),
                                "b_id": np.maximum(a_sel, b_ids[bj]),
                                "cos": cos,
                            }
                        )
                    )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return fn


def _neardup_lsh_delta(
    new: DataFrame,
    state: dict,
    threshold: float,
    n_bands: int,
    band_planes: int,
    id_col: str,
    vec_col: str,
    seed: int,
    max_bucket_rows: int | None,
    allow_full_fan: bool = False,
) -> DataFrame:
    """Incremental banded near-dup: pairs TOUCHING the delta only.

    Output equals ``neardup_pairs_lsh(delta ∪ corpus)`` restricted to
    pairs with a delta member (pinned): banding is a deterministic
    per-row function, so the union's buckets are the union of each
    side's buckets, and only buckets the DELTA occupies can produce a
    delta-touching pair — the probe reads exactly those partitions of
    the persisted signed relation (bucket-level semi-join; partition-
    pruned layout) and verifies delta×(bucket members) with the same
    chunked f64 + HALF_UP kernel. The corpus never pays a signature
    pass and corpus×corpus cells are never scored, so probe cost is
    O(Σ_buckets |delta_b|·|bucket|), not Σ|bucket|².

    Skew: the same bytes-derived bucket cap / salt-slice fan-out as
    the self-join; in a slice-pair task the scored legs are
    D(Si)×Sj and D(Sj)×state(Si) (every delta-touching pair exactly
    once), diagonal tasks mask delta-delta to a_id < b_id.

    OPERATOR SELECTION (measured, BASELINE round 9): bucket pruning
    only engages while |delta| ≲ 2^band_planes — past that the delta
    occupies every bucket and the fan ships the whole state b× (the
    self-join's shuffle volume; it filled a single box's disk at
    1M×768×6 bands, a per-node-disk non-issue on a cluster). For a
    delta whose f64 matrix fits the broadcast gate
    (NEARDUP_BROADCAST_MAX_BYTES), prefer the EXACT probe
    ``neardup_pairs(new, against=state)`` — one shuffle-free state
    pass, exact output, faster at this scale. This probe is the
    cluster-scale plan: huge state × large delta, where delta×state
    exact flops are prohibitive and the banded shuffle is the price
    already paid by the self-join it replaces.
    """
    spec = state["spec"]
    if (
        spec["n_bands"] != n_bands
        or spec["band_planes"] != band_planes
        or spec["seed"] != seed
    ):
        raise ValueError(
            "persisted embedding state was built for "
            f"(n_bands={spec['n_bands']}, "
            f"band_planes={spec['band_planes']}, seed={spec['seed']}), "
            f"probe asked for (n_bands={n_bands}, "
            f"band_planes={band_planes}, seed={seed}) — rebuild the "
            "state or drop against_state"
        )
    probe = new.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size(vec_col)).alias("dmin"),
        F.max(F.size(vec_col)).alias("dmax"),
    ).first()
    id_type = new.schema[id_col].dataType.simpleString()
    pair_schema = f"a_id {id_type}, b_id {id_type}, cos double"
    if not probe["n"]:
        return new.sparkSession.createDataFrame([], pair_schema)
    if probe["dmin"] != probe["dmax"]:
        raise ValueError(
            f"{vec_col} must be uniform-width: found lengths "
            f"{probe['dmin']}..{probe['dmax']}"
        )
    dim = int(probe["dmax"])
    if dim != spec["dim"]:
        raise ValueError(
            f"state holds {spec['dim']}-d vectors, delta has {dim}-d"
        )
    # refusal valve (round-9 verdict), FAN PATH ONLY: when the delta
    # occupies essentially every bucket (expected per-band coverage
    # 1 − e^(−|delta|/2^p) ≈ 1) the union-fan probe ships the whole
    # state b× — the self-join's shuffle volume, the shape that filled
    # a box's disk twice in the round-9 campaign. The pair-verify plan
    # below is immune (its candidate volume is delta-anchored id pairs,
    # not per-band vector copies), so the valve only fires when the fan
    # is actually the plan: a legacy vectors-on-band-rows state, or a
    # delta past the broadcast-matrix gate. ``allow_full_fan=True``
    # overrides for the adjudicated cluster-scale case.
    pair_plan = (
        vec_col not in state["signed"].columns
        and state.get("vectors") is not None
        and int(probe["n"]) * dim * 8 <= NEARDUP_DELTA_MATRIX_MAX_BYTES
    )
    import math as _math

    coverage = 1.0 - _math.exp(
        -int(probe["n"]) / float(2 ** band_planes)
    )
    if coverage >= 0.95 and not allow_full_fan and not pair_plan:
        delta_bytes = int(probe["n"]) * dim * 8
        hint = (
            "the delta's f64 matrix fits the broadcast gate — use the "
            "EXACT probe neardup_pairs(new, against=state_vectors)"
            if delta_bytes <= NEARDUP_BROADCAST_MAX_BYTES
            else "rebuild the state with band_planes='auto' and "
            f"expected_delta_rows={int(probe['n'])}"
        )
        raise ValueError(
            f"probe of {probe['n']} rows against a 2^{band_planes}-"
            f"bucket state occupies ~{coverage:.0%} of every band's "
            "buckets — bucket pruning cannot engage and the fan would "
            "ship the whole state per band (the self-join's shuffle "
            f"volume). {hint}; or pass allow_full_fan=True to accept "
            "the full fan"
        )
    if max_bucket_rows is None:
        max_bucket_rows = _lsh_bucket_cap(dim)
    vec_type = new.schema[vec_col].dataType.simpleString()
    p_mat = np.asarray(
        hyperplane_planes(dim, n_planes=n_bands * band_planes, seed=seed),
        dtype=np.float64,
    )
    # the pair plan consumes band rows id-only (its delta-delta leg
    # re-signs with vectors inside the ordinary self-join); only the
    # union-fan plan needs vectors riding the delta's band rows — at
    # auto band counts the difference is b× the delta's Arrow volume
    if pair_plan:
        sig_schema = f"{id_col} {id_type}, band int, bucket long"
    else:
        sig_schema = (
            f"{id_col} {id_type}, {vec_col} {vec_type}, "
            "band int, bucket long"
        )
    signed_new = (
        new.select(id_col, vec_col)
        .mapInPandas(
            _make_sign_batches(
                id_col, vec_col, p_mat, n_bands, band_planes,
                include_vec=not pair_plan,
            ),
            sig_schema,
        )
        .localCheckpoint(eager=True)  # delta-sized: buckets + fan reuse
    )
    delta_buckets = signed_new.select("band", "bucket").distinct()
    touched = state["signed"].join(
        F.broadcast(delta_buckets), ["band", "bucket"], "left_semi"
    )
    if pair_plan:
        # PAIR-VERIFY plan (round 10, the id-only layout's fast path):
        # the union-fan plan ships every touched corpus vector once PER
        # BAND — b× multiplicity that filled this box's disk at
        # 1M×768×62 auto-sized bands. Here the band dimension dies
        # early: distinct candidate (delta, state) id pairs come from
        # the id-only collision join (skinny rows, delta-anchored
        # volume), state vectors are fetched ONCE per distinct
        # candidate state row, and the delta's f64 matrix (gated above)
        # broadcasts so every pair is scored in one mapInPandas pass
        # with the SAME _neardup_cells arithmetic — bit-identical
        # cosines, no per-band vector copies, no bucket-size task
        # hazard (the mask is per-pair, not per-bucket). Delta-delta
        # pairs come from the ordinary self-join on the delta alone
        # (banding is deterministic, so its co-bucket set equals the
        # union's delta-delta co-bucket set).
        dd = neardup_pairs_lsh(
            new, threshold=threshold, n_bands=n_bands,
            band_planes=band_planes, id_col=id_col, vec_col=vec_col,
            seed=seed, max_bucket_rows=max_bucket_rows,
        )
        cand = (
            signed_new.select(F.col(id_col).alias("__a"), "band", "bucket")
            .join(
                touched.select(F.col(id_col).alias("__b"), "band", "bucket"),
                ["band", "bucket"],
            )
            .filter(F.col("__a") != F.col("__b"))
            .select("__a", "__b")
            .distinct()
        )
        grouped = cand.groupBy("__b").agg(
            F.collect_list("__a").alias("__as")
        )
        # Arrow transfer (gated above): a Row-object collect of a 50k
        # ×768 delta built ~GBs of JVM garbage; toPandas streams
        # columnar batches
        pdf = new.select(id_col, vec_col).toPandas()
        d_ids = pdf[id_col].to_numpy()
        d_mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        bc = new.sparkSession.sparkContext.broadcast((d_ids, d_mat))
        # merge hint: the grouped relation's size estimate undershoots
        # (lists of ids compress in stats but explode as a broadcast
        # hash relation of Java objects — observed JVM heap OOM at
        # 50k×62 bands); SMJ spills instead
        verify_in = grouped.hint("merge").join(
            state["vectors"].withColumnRenamed(id_col, "__b"), ["__b"]
        ).select(F.col("__b").alias(id_col), vec_col, "__as")
        ds = verify_in.mapInPandas(
            _make_pair_verify(id_col, vec_col, threshold, bc), pair_schema
        )
        return dd.unionByName(ds).orderBy("a_id", "b_id", "cos")
    if vec_col not in touched.columns:
        # id-only band relation (the round-10 serving layout): attach
        # vectors to the TOUCHED rows only — one id-keyed join whose
        # left side is collision-bounded by the delta, so the re-fetch
        # never approaches the b×-vector amplification the in-flight
        # self-join layout pays (and the stored state avoids entirely)
        if state.get("vectors") is None:
            raise ValueError(
                "state's band relation is id-only but no 'vectors' "
                "relation was persisted — rebuild the state"
            )
        touched = touched.join(
            state["vectors"].select(id_col, vec_col), [id_col]
        )
    union = signed_new.withColumn("__d", F.lit(True)).unionByName(
        touched.select(id_col, vec_col, "band", "bucket").withColumn(
            "__d", F.lit(False)
        )
    )
    # the self-join's cap/salt/fan machinery, over delta-touched
    # buckets only (union row counts — the verify legs below bound the
    # SCORED cells to delta×members, but task memory is the group)
    hot = (
        union.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") > max_bucket_rows)
        .select(
            "band",
            "bucket",
            F.ceil(F.col("__bn") / F.lit(max_bucket_rows))
            .cast("int")
            .alias("__ns"),
        )
    )
    sliced = (
        union.join(F.broadcast(hot), ["band", "bucket"], "left")
        .withColumn("__ns", F.coalesce("__ns", F.lit(1)))
        .withColumn(
            "__sl",
            F.pmod(
                F.xxhash64(F.col(id_col), F.lit(seed + 1)), F.col("__ns")
            ).cast("int"),
        )
    )
    tasks = F.transform(
        F.sequence(F.lit(0), F.col("__ns") - 1),
        lambda i: F.struct(
            F.least(i, F.col("__sl")).cast("int").alias("ti"),
            F.greatest(i, F.col("__sl")).cast("int").alias("tj"),
        ),
    )
    fanned = sliced.select(
        id_col, vec_col, "__d", "band", "bucket", "__sl",
        F.explode(tasks).alias("__t"),
    ).select(
        id_col, vec_col, "__d", "band", "bucket", "__sl",
        "__t.ti", "__t.tj",
    )
    elem = 4 if "float>" in vec_type else 8
    spark = new.sparkSession
    # sized like the self-join's verify exchange (~64 MB/task), from
    # the TOUCHED volume: the state side is pruned to delta-occupied
    # buckets, whose expected per-band coverage is 1 − e^(−|delta|/2^p)
    # — which for any delta larger than a few times the bucket count is
    # ~1, i.e. the fan ships the WHOLE state b× exactly like the
    # self-join (measured: a 1M×768 probe at 8-plane bands filled this
    # box's disk twice — see BASELINE round-9 adjudication; per-node
    # disk on a cluster, and the exact broadcast-cross probe is the
    # right plan for broadcast-sized deltas). spec["n"] records the
    # state rows at build time.
    import math

    coverage = 1.0 - math.exp(-int(probe["n"]) / float(2 ** band_planes))
    touched_rows = int(probe["n"]) + int(
        coverage * float(spec.get("n") or 0)
    )
    fan_parts = max(
        spark.sparkContext.defaultParallelism,
        min(
            4096,
            touched_rows * n_bands * (dim * elem + 28) * 2
            // (64 << 20)
            + 1,
        ),
    )
    fanned = fanned.repartition(fan_parts, "band", "bucket", "ti", "tj")

    def _verify_delta_group(pdf):
        import pandas as pd

        empty = pd.DataFrame({"a_id": [], "b_id": [], "cos": []})
        if len(pdf) < 2 or not pdf["__d"].any():
            return empty
        diagonal = pdf["ti"].iloc[0] == pdf["tj"].iloc[0]
        outs = []

        def score(a_rows, b_rows, mask_fn=None):
            if not len(a_rows) or not len(b_rows):
                return
            a_ids = a_rows[id_col].to_numpy()
            a_mat = _vec_matrix(a_rows[vec_col])
            a_nrm = np.sqrt((a_mat * a_mat).sum(axis=1))
            b_ids = b_rows[id_col].to_numpy()
            b_mat = _vec_matrix(b_rows[vec_col])
            b_nrm = np.sqrt((b_mat * b_mat).sum(axis=1))
            b_state = ~b_rows["__d"].to_numpy()
            with np.errstate(divide="ignore", invalid="ignore"):
                b_norm = b_mat / np.where(b_nrm == 0, 1.0, b_nrm)[:, None]
            for s in range(0, len(a_ids), LSH_VERIFY_CHUNK):
                e = min(s + LSH_VERIFY_CHUNK, len(a_ids))
                mask = (
                    mask_fn(a_ids[s:e], b_ids, b_state)
                    if mask_fn is not None
                    else None
                )
                ai, bj, cos = _neardup_cells(
                    a_mat[s:e], a_nrm[s:e], b_mat, b_nrm, threshold,
                    mask, bn=b_norm,
                )
                sa, sb = a_ids[s:e][ai], b_ids[bj]
                keep = sa != sb  # defensive: sides are id-disjoint by contract
                sa, sb, cos = sa[keep], sb[keep], cos[keep]
                outs.append(
                    pd.DataFrame(
                        {
                            "a_id": np.minimum(sa, sb),
                            "b_id": np.maximum(sa, sb),
                            "cos": cos,
                        }
                    )
                )

        if diagonal:
            # a = delta rows, b = whole group; delta-delta pairs are
            # canonicalized by the id-order mask (each unordered pair
            # scored once), delta-state pairs occur once by b-side role
            score(
                pdf[pdf["__d"]],
                pdf,
                lambda a_ids, b_ids, b_state: (
                    b_state[None, :] | (a_ids[:, None] < b_ids[None, :])
                ),
            )
        else:
            si = pdf[pdf["__sl"] == pdf["ti"].iloc[0]]
            sj = pdf[pdf["__sl"] == pdf["tj"].iloc[0]]
            # every cross-slice delta-touching pair exactly once:
            # D(Si)×Sj covers (delta_i, anything_j); the second leg
            # restricts b to STATE rows so (delta_i, delta_j) is not
            # double-counted
            score(si[si["__d"]], sj)
            score(sj[sj["__d"]], si[~si["__d"]])
        return pd.concat(outs, ignore_index=True) if outs else empty

    return (
        fanned.groupBy("band", "bucket", "ti", "tj")
        .applyInPandas(_verify_delta_group, pair_schema)
        .distinct()
        .orderBy("a_id", "b_id", "cos")
    )


def hyperplane_planes(dim: int, n_planes: int = 12, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (seeded, reproducible across runs)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def _nearest_centroids(
    v_mat: "np.ndarray", v_nrm: "np.ndarray", c_mat: "np.ndarray",
    c_nrm: "np.ndarray", n_probe: int = 1,
) -> "np.ndarray":
    """The ``n_probe`` nearest centroid ids per row — cosine rounded to
    6, ties to the lowest cluster id (stable argsort of -sim == order
    by sim desc, cluster asc). The single nearest rule every IVF leg
    (build, assign, serve) shares."""
    sims = _round_half_up((v_mat @ c_mat.T) / np.outer(v_nrm, c_nrm), 6)
    return np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]


def ivf_centroids(
    corpus: DataFrame,
    n_clusters: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic k-means centroids for the IVF index.

    Init: the n_clusters corpus vectors with the smallest md5(id) —
    a stable pseudo-random sample, no RNG state. Then ``n_iter`` Lloyd
    rounds (``_lloyd_means``), each one distributed ``mapInPandas``
    pass. Only k×dim floats ever reach the driver, so the build is
    cluster-scale-safe.
    """
    seed_rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_clusters)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seed_rows]
    for _ in range(n_iter):
        centroids = _lloyd_means(corpus, centroids, vec_col)
    return centroids


def _lloyd_means(
    corpus: DataFrame, centroids: list[list[float]], vec_col: str
) -> list[list[float]]:
    """One Lloyd round: assign each row to its nearest centroid and
    return the per-cluster means (empty clusters keep their previous
    centroid).

    Assignment + partial sums happen in ONE ``mapInPandas`` pass: each
    Arrow batch scores against the k×dim centroid matrix as a single
    matmul (the per-row zip_with/aggregate cosine fold is
    CodegenFallback — at 2M rows × 16 centroids the interpreted dots
    plus a 128M-row posexplode shuffle for the means made the IVF
    build ~60 s at sf100) and emits one (cluster, count, sum-vector)
    row per cluster it saw. The final exact aggregate then groups
    partitions·k rows instead of n·dim.
    """
    c_mat = np.asarray(centroids, dtype=np.float64)
    c_nrm = np.sqrt((c_mat * c_mat).sum(axis=1))

    def _partials(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            v_mat = _vec_matrix(pdf[vec_col])
            v_nrm = np.sqrt((v_mat * v_mat).sum(axis=1))
            nearest = _nearest_centroids(v_mat, v_nrm, c_mat, c_nrm)[:, 0]
            out = []
            for cl in np.unique(nearest):
                mask = nearest == cl
                out.append(
                    (int(cl), int(mask.sum()), v_mat[mask].sum(axis=0))
                )
            yield pd.DataFrame(out, columns=["cluster", "cnt", "sums"])

    partials = corpus.select(vec_col).mapInPandas(
        _partials, "cluster int, cnt long, sums array<double>"
    )
    # partitions·k partial rows: exploding THESE is trivial
    means = (
        partials.select("cluster", "cnt", F.posexplode("sums"))
        .groupBy("cluster", "pos")
        .agg((F.sum("col") / F.sum("cnt")).alias("v"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda s: s["v"],
            ).alias("centroid")
        )
        .collect()
    )
    by_cluster = {r["cluster"]: list(r["centroid"]) for r in means}
    return [by_cluster.get(i, c) for i, c in enumerate(centroids)]


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
    prefix: str = "",
) -> DataFrame:
    """Attach the ``n_probe`` nearest centroid ids (``_nearest_centroids``
    rule) to each row — the corpus never shuffles.

    Each Arrow batch scores against the k×dim centroid matrix as one
    float64 matmul (``mapInPandas``), replacing the broadcast
    nested-loop join whose per-(row, centroid) zip_with/aggregate
    cosine is CodegenFallback — n·k interpreted dots plus a window
    over n·k scored rows. All input columns pass through unchanged;
    rows are emitted ``n_probe`` times with their probed cluster ids.
    Persisting this output partitioned by ``cluster`` is the serving
    layout: probe masks become physical partition pruning.
    """
    from pyspark.sql.types import IntegerType, StructField, StructType

    c_mat = np.asarray(centroids, dtype=np.float64)
    c_nrm = np.sqrt((c_mat * c_mat).sum(axis=1))
    n_probe = min(n_probe, len(centroids))
    out_schema = StructType(
        corpus.schema.fields + [StructField("cluster", IntegerType())]
    )

    def _assign_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v_mat = _vec_matrix(pdf[vec_col])
            v_nrm = np.sqrt((v_mat * v_mat).sum(axis=1))
            probes = _nearest_centroids(v_mat, v_nrm, c_mat, c_nrm, n_probe)
            idx = np.repeat(np.arange(len(pdf)), n_probe)
            out = pdf.iloc[idx].reset_index(drop=True)
            out["cluster"] = probes.reshape(-1).astype("int32")
            yield out

    return corpus.mapInPandas(_assign_batches, out_schema)


# Fixed layouts of the IVF index's bounded relations (writers below are
# the only producers). Passing them explicitly to every read skips the
# schema-inference job Spark launches per spark.read.parquet — the
# persisted-lifecycle queries re-read these one-row/k-row relations
# ~10× per maintenance pass (round-13; legacy files missing ``epoch``
# read it as null, which the ``or 0`` handling already expects). The
# LISTS relation deliberately stays schema-inferred: its id column type
# is caller-defined and the legacy-layout detection ('"vec_hash" in
# lists.columns') depends on the file footers.
IVF_SPEC_SCHEMA = "dim int, n_clusters int, n long, appended long, epoch long"
IVF_AGG_SCHEMA = "cluster int, cnt long, sums array<double>"
IVF_CENTROIDS_SCHEMA = "cluster int, centroid array<double>"

# Rebuild triggers for the persisted IVF serving index (append_ivf_index):
# flag once appends-since-build pass this fraction of the indexed rows…
IVF_REBUILD_APPEND_FRACTION = 0.25
# …or once any cluster's implied mean (running sums/cnt, maintained in
# the index's agg relation) drifts below this cosine vs its standing
# centroid — the signal that a re-Lloyd would materially move the lists.
IVF_REBUILD_DRIFT_COS = 0.98


def _ivf_cluster_agg(assigned: DataFrame, vec_col: str) -> DataFrame:
    """Per-cluster running aggregates (cluster, cnt, sums) of an
    assigned relation — the drift bookkeeping the append leg maintains.
    Same partial-sums shape as ``_lloyd_means``: one ``mapInPandas``
    pass emits ≤ partitions·k partial rows; the exact combine then
    groups those, never n·dim exploded rows."""

    def _partials(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            v_mat = _vec_matrix(pdf[vec_col])
            cl = pdf["cluster"].to_numpy()
            out = []
            for c in np.unique(cl):
                mask = cl == c
                out.append(
                    (int(c), int(mask.sum()), v_mat[mask].sum(axis=0))
                )
            yield pd.DataFrame(out, columns=["cluster", "cnt", "sums"])

    partials = assigned.select("cluster", vec_col).mapInPandas(
        _partials, "cluster int, cnt long, sums array<double>"
    )
    # ONE aggregation tree for cnt AND sums (round-13 optimization,
    # guide §1.2): the previous cnts⨝sums formulation referenced
    # ``partials`` twice, and Spark re-executes the subtree per branch
    # — the corpus-wide mapInPandas pass ran TWICE (plus a join) for
    # one pair of numbers. Exploded per (cluster, pos), each partial
    # row contributes its cnt exactly once per position, so
    # SUM(cnt) within any (cluster, pos) group IS the cluster's total
    # count (identical across pos — MAX picks the common value).
    # Integer-exact; the float sums take the same per-(cluster,pos)
    # SUM as before.
    return (
        partials.select(
            "cluster", "cnt", F.posexplode("sums").alias("pos", "v")
        )
        .groupBy("cluster", "pos")
        .agg(F.sum("v").alias("v"), F.sum("cnt").alias("c"))
        .groupBy("cluster")
        .agg(
            F.max("c").alias("cnt"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda s: s["v"],
            ).alias("sums"),
        )
        .select("cluster", "cnt", "sums")
    )


def _auto_n_clusters(n: int) -> int:
    """List count for an IVF index sized from the corpus (round-11
    verdict #2 — the ``band_planes="auto"`` calculus for the vector
    index): k ≈ √n balances the two serve-side costs, which meet at
    that point — the driver-side centroid argmax is O(k·dim) per query
    and each probed list scan is O(n/k·dim), so total probe work
    n_probe·n/k + k is minimized near √n (the standard IVF sizing,
    same rule FAISS documents for IndexIVF).

    Clamps, in order:
      * k ≤ n/32 — every inverted list keeps ≥~32 members on average;
        below that the partition-dir + file overhead per list exceeds
        the rows it holds (tiny corpora degrade toward brute force,
        which IS the right plan there);
      * 4 ≤ k ≤ 4096 — the ceiling bounds the partition-directory
        count and the k×dim driver-side aggregate folds (64 MB at
        4096×768 float64 sums, still a bounded gate). CROSSOVER: past
        k=4096 (n ≳ 16M rows per index) the √n rule wants more lists
        than one partitioned directory should hold — shard the corpus
        into multiple IVF indexes by id hash and fan the probe, or
        raise the cap deliberately; the spec records the resolved k
        either way, so append/serve never re-derive it."""
    k = int(round(float(np.sqrt(max(1, n)))))
    k = min(k, max(1, n // 32))
    return max(4, min(4096, k)) if n >= 128 else max(1, k)


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_clusters: int | str = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Persist the IVF ANN serving index — the vector-search mirror of
    the text/embedding dedup serving states, and of the reference's
    dense_vector serving surface (dags/lib/elastic.py:107-119):

      * ``lists``   — the corpus (id, vec) PARTITIONED BY its
        nearest-centroid inverted list: ``ivf_topk_state`` probe masks
        become physical partition pruning.
      * ``centroids`` — the k×dim Lloyd centroids (one row per list).
      * ``agg``     — per-cluster (cnt, sum-vector) running aggregates:
        ``append_ivf_index`` folds each delta in and reads centroid
        drift off them without ever touching the corpus.
      * ``spec``    — (dim, n_clusters, n, appended); ``appended``
        counts rows added since the last full build (the other rebuild
        trigger).

    ``n_clusters="auto"`` sizes k from the corpus count
    (``_auto_n_clusters``, ≈√n clamped — see its crossover note); the
    RESOLVED k is recorded in the spec, so appends and serves never
    re-derive it (the ``band_planes="auto"`` discipline).

    Returns ``{"n", "n_clusters", "dim"}``."""
    spark = corpus.sparkSession
    probe = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size(vec_col)).alias("dmin"),
        F.max(F.size(vec_col)).alias("dmax"),
    ).first()
    if probe["dmin"] != probe["dmax"]:
        raise ValueError(
            f"{vec_col} must be uniform-width: found lengths "
            f"{probe['dmin']}..{probe['dmax']}"
        )
    dim = int(probe["dmax"] or 0)
    if n_clusters == "auto":
        n_clusters = _auto_n_clusters(int(probe["n"]))
    centroids = ivf_centroids(corpus, n_clusters, n_iter, id_col, vec_col)
    assigned = ivf_assign(
        corpus.select(id_col, vec_col), centroids,
        id_col=id_col, vec_col=vec_col, n_probe=1,
    ).withColumn("vec_hash", F.xxhash64(vec_col))
    # vec_hash: a narrow fingerprint of the stored vector, so the
    # pipeline's nightly staleness check (did a re-delivered id's
    # vector actually change?) scans (id, hash) — ~16 B/row — instead
    # of the wide vector column
    (
        assigned.repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{path}/lists")
    )
    # aggregates from the PERSISTED lists so agg ≡ lists exactly;
    # explicit schema — the build just wrote the lists in exactly
    # ``assigned``'s layout, so the footer-inference job the bare read
    # launches is pure overhead (round-14; read_ivf_index keeps
    # inference for legacy-layout detection)
    lists = spark.read.schema(assigned.schema).parquet(
        f"{path}/lists"
    ).withColumn("cluster", F.col("cluster").cast("int"))
    _ivf_cluster_agg(lists, vec_col).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/agg"
    )
    _tiny_df(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    _tiny_df(
        spark,
        [(dim, int(n_clusters), int(probe["n"]), 0, 0)],
        "dim int, n_clusters int, n long, appended long, epoch long",
    ).write.mode("overwrite").parquet(f"{path}/spec")
    return {"n": int(probe["n"]), "n_clusters": int(n_clusters), "dim": dim}


def _checked_spec_row(spec_df, path: str) -> dict:
    """First row of a spec relation with the layout sanity check the
    explicit read schema removed (round-13 ADVICE): a foreign/garbage
    file under ``spec`` reads its missing columns as NULL, which the
    legacy ``or 0`` handling would silently accept — e.g. epoch 0
    defeating the single-writer tripwire. The writer-produced core
    columns are NEVER null, so any null there is layout corruption and
    must fail loudly. ``epoch`` stays nullable (pre-epoch legacy specs
    legitimately lack it)."""
    row = spec_df.first()
    d = row.asDict() if row is not None else {}
    if any(d.get(c) is None for c in ("dim", "n_clusters", "n", "appended")):
        raise ValueError(
            f"spec relation under {path!r} does not hold an IVF spec "
            f"layout (row: {d}) — wrong directory or a foreign writer; "
            "rebuild the index with build_ivf_index"
        )
    return d


def _write_spec_guarded(
    spark, path: str, spec_at_entry: dict, fields: tuple
) -> None:
    """Swap in a maintenance run's new spec with the EPOCH check
    (round-11 verdict #8): the spec carries a monotonic ``epoch``
    bumped by every append/repair; a writer re-reads it immediately
    before its swap and REFUSES when it moved since the run started —
    two concurrent maintainers interleaving list appends with agg/spec
    swaps would silently corrupt the running aggregates. Best-effort
    (a check-to-swap window remains — this is a tripwire for the
    documented single-writer posture, not a lock); legacy specs
    without the column count as epoch 0."""
    from eea_crawler_spark.operators.dedup import _read_rel, _replace_dir

    epoch0 = int(spec_at_entry.get("epoch", 0) or 0)
    now = _read_rel(spark, path, "spec", IVF_SPEC_SCHEMA)
    row = _checked_spec_row(now, path) if now is not None else {}
    if int(row.get("epoch", 0) or 0) != epoch0:
        raise RuntimeError(
            f"concurrent IVF index writer detected under {path!r}: the "
            f"spec epoch moved {epoch0} -> {row.get('epoch')} during "
            "this maintenance run. The lists/aggregates may now hold "
            "an interleaved mix of two runs — rebuild the index "
            "(build_ivf_index) and schedule ONE maintainer per index "
            "(single-writer posture, see AnnConfig)"
        )
    _tiny_df(
        spark,
        [(*fields, epoch0 + 1)],
        "dim int, n_clusters int, n long, appended long, epoch long",
    ).write.mode("overwrite").parquet(f"{path}/spec__new")
    _replace_dir(spark, f"{path}/spec__new", f"{path}/spec")


def read_ivf_index(spark, path: str) -> dict:
    """Load the persisted IVF index: ``{"lists": DataFrame,
    "centroids": list[list[float]], "agg": DataFrame, "spec": dict}``.
    The spec rides ``_read_rel`` (append swaps it through a __new tmp
    dir — same crash-recovery discipline as the dedup states)."""
    from eea_crawler_spark.operators.dedup import _read_rel

    spec_df = _read_rel(spark, path, "spec", IVF_SPEC_SCHEMA)
    if spec_df is None:
        raise ValueError(f"no spec relation under {path!r} — not an "
                         "IVF index dir")
    cent_rows = (
        spark.read.schema(IVF_CENTROIDS_SCHEMA)
        .parquet(f"{path}/centroids")
        .collect()
    )
    by_id = {r["cluster"]: list(r["centroid"]) for r in cent_rows}
    centroids = [by_id[i] for i in range(len(by_id))]
    agg = _read_rel(spark, path, "agg", IVF_AGG_SCHEMA)
    return {
        "lists": spark.read.parquet(f"{path}/lists").withColumn(
            "cluster", F.col("cluster").cast("int")
        ),
        "centroids": centroids,
        "agg": agg,
        "spec": _checked_spec_row(spec_df, path),
    }


def append_ivf_index(
    spark,
    path: str,
    new_vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rebuild_append_fraction: float = IVF_REBUILD_APPEND_FRACTION,
    rebuild_drift_cos: float = IVF_REBUILD_DRIFT_COS,
) -> dict:
    """O(delta) IVF index maintenance (round-10 verdict #2): assign the
    NEW vectors to their nearest STANDING centroid (``ivf_assign`` —
    the exact rule the build and the serve share, so append ≡ rebuild
    with the same centroids, pinned), append them into the
    cluster-partitioned lists, and fold their per-cluster (cnt, sums)
    into the agg relation (k×dim driver-side merge — bounded, never a
    corpus touch).

    Rebuild cadence, same pattern as the dedup stale ledger: appends
    keep serving EXACTLY (every appended row lands in the list its
    assignment rule says, so probe-all == brute force always holds) but
    recall at small n_probe decays as the data distribution drifts away
    from the frozen centroids. Two triggers surface that:
    ``appended/n ≥ rebuild_append_fraction``, or any cluster's implied
    mean (sums/cnt) falling under ``rebuild_drift_cos`` cosine vs its
    standing centroid. ``needs_rebuild`` is reported; the rebuild IS
    ``build_ivf_index`` (which resets both).

    Strictly-new ids only (same contract as the dedup state appends).
    Returns ``{"appended", "appended_fraction", "min_centroid_cos",
    "needs_rebuild"}``."""
    from eea_crawler_spark.operators.dedup import (
        _heal_rel,
        _read_rel,
        _replace_dir,
    )

    # heal crashed swaps before any read resolves to a __new dir this
    # append would overwrite (writer-side heal; _read_rel stays
    # non-mutating for concurrent serve paths)
    for rel in ("spec", "agg"):
        _heal_rel(spark, path, rel)
    idx = read_ivf_index(spark, path)
    spec = idx["spec"]
    probe = new_vecs.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size(vec_col)).alias("dmin"),
        F.max(F.size(vec_col)).alias("dmax"),
    ).first()
    if not probe["n"]:
        return {
            "appended": 0,
            "appended_fraction": float(spec["appended"]) / max(1, spec["n"]),
            "min_centroid_cos": 1.0,
            "needs_rebuild": 0,
        }
    if probe["dmin"] != probe["dmax"] or int(probe["dmax"]) != spec["dim"]:
        raise ValueError(
            f"index holds {spec['dim']}-d vectors, delta has "
            f"{probe['dmin']}..{probe['dmax']}-d"
        )
    if not idx["lists"].select(id_col).join(
        F.broadcast(new_vecs.select(id_col)), [id_col], "left_semi"
    ).isEmpty():
        raise ValueError(
            "append_ivf_index takes strictly-NEW ids; the batch "
            "contains ids already in the index — rebuild the index or "
            "restrict the batch to inserts"
        )
    assigned = ivf_assign(
        new_vecs.select(id_col, vec_col), idx["centroids"],
        id_col=id_col, vec_col=vec_col, n_probe=1,
    ).withColumn("vec_hash", F.xxhash64(vec_col)).localCheckpoint(
        eager=True
    )
    # delta agg BEFORE the lists append (k×dim rows to the driver)
    d_agg = {
        r["cluster"]: (r["cnt"], np.asarray(r["sums"], dtype=np.float64))
        for r in _ivf_cluster_agg(assigned, vec_col).collect()
    }
    # repartition on the partition column before the dynamic-partition
    # append (same file hygiene as the build): one file per touched
    # cluster dir instead of input_tasks × clusters
    assigned.repartition("cluster").write.mode("append").partitionBy(
        "cluster"
    ).parquet(f"{path}/lists")
    # merged running aggregates (driver-side: 2·k rows of dim floats)
    o_agg = {
        r["cluster"]: (r["cnt"], np.asarray(r["sums"], dtype=np.float64))
        for r in (idx["agg"].collect() if idx["agg"] is not None else [])
    }
    dim = int(spec["dim"])
    merged = {}
    for c in set(o_agg) | set(d_agg):
        oc, osum = o_agg.get(c, (0, np.zeros(dim)))
        dc, dsum = d_agg.get(c, (0, np.zeros(dim)))
        merged[c] = (int(oc) + int(dc), osum + dsum)
    _tiny_df(
        spark,
        [
            (int(c), int(cnt), [float(x) for x in sums])
            for c, (cnt, sums) in sorted(merged.items())
        ],
        "cluster int, cnt long, sums array<double>",
    ).write.mode("overwrite").parquet(f"{path}/agg__new")
    _replace_dir(spark, f"{path}/agg__new", f"{path}/agg")
    # drift: implied means vs the frozen centroids
    c_mat = np.asarray(idx["centroids"], dtype=np.float64)
    min_cos = 1.0
    for c, (cnt, sums) in merged.items():
        if cnt <= 0:
            continue
        mean = sums / cnt
        denom = np.linalg.norm(mean) * np.linalg.norm(c_mat[c])
        if denom > 0:
            min_cos = min(min_cos, float(mean @ c_mat[c] / denom))
    n_new = int(spec["n"]) + int(probe["n"])
    appended = int(spec["appended"]) + int(probe["n"])
    frac = appended / max(1, n_new)
    needs_rebuild = (
        frac >= rebuild_append_fraction or min_cos < rebuild_drift_cos
    )
    _write_spec_guarded(
        spark, path, spec,
        (dim, int(spec["n_clusters"]), n_new, appended),
    )
    from eea_crawler_spark.operators.dedup import _release_local_checkpoint

    _release_local_checkpoint(assigned)
    return {
        "appended": int(probe["n"]),
        "appended_fraction": frac,
        "min_centroid_cos": min_cos,
        "needs_rebuild": int(needs_rebuild),
    }


def repair_ivf_index(
    spark,
    path: str,
    updates: DataFrame | None = None,
    deleted_ids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rebuild_append_fraction: float = IVF_REBUILD_APPEND_FRACTION,
    rebuild_drift_cos: float = IVF_REBUILD_DRIFT_COS,
    scatter_cluster_fraction: float = 0.5,
    scatter_drift_arm: float = 0.5,
    abort_on_prefer_rebuild: bool = False,
) -> dict:
    """O(stale) partition-local index repair (round-11 verdict #1) —
    the update-in-place serving semantics of the reference's
    ``doc_as_upsert`` over its dense_vector mapping
    (logstash/pipeline/search_pipeline.conf:19-27,
    dags/lib/elastic.py:107-119), without the O(corpus) Lloyd rebuild:

      1. locate: one NARROW (id, cluster) column scan of the lists
         finds the clusters holding any touched id (update or delete)
         — the wide vector column never reads outside those clusters.
      2. evict: ONLY those cluster partitions are rewritten without
         the touched ids (dynamic partition overwrite — untouched
         lists never rewrite); a partition emptied entirely is deleted.
      3. re-insert: update vectors are assigned to their nearest
         STANDING centroid (the exact build/append rule, so
         probe-all == brute force still holds) and appended — an
         update id absent from the index is therefore a plain insert
         (upsert semantics).
      4. re-aggregate: the affected clusters' (cnt, sums) rows are
         recomputed FROM the rewritten lists (partition-pruned scan),
         unioned with the untouched clusters' standing rows, and
         swapped in — so ``agg ≡ lists`` exactly regardless of crash
         history, and the drift trigger stays honest.

    Cost is O(touched partitions): ≤ min(|touched ids|, n_clusters)
    inverted lists rewrite, plus the one narrow id-column scan in
    step 1. Degenerate case — stale ids spread over ALL clusters —
    costs one full list rewrite, comparable to the rebuild it avoids.

    Repair-vs-rebuild arbiter (round-12 verdict #3): the crossover
    calculus is measured at 1M×768 — scattered repair 31–36 s vs
    rebuild 51–81 s, so repair wins STANDALONE even in the worst
    scatter; but when the drift trigger is also about to fire, the
    rebuild pays ~1.5–2.6× the repair and resets the append/drift debt
    the repair cannot, so one rebuild replaces repair + imminent
    rebuild. The hint ``prefer_rebuild`` therefore fires only on the
    conjunction: |touched clusters| ≥ ``scatter_cluster_fraction`` ×
    n_clusters (the repair degenerates to a full list rewrite) AND the
    projected post-repair appended fraction ≥ ``scatter_drift_arm`` ×
    ``rebuild_append_fraction`` (the trigger is near arming). With
    ``abort_on_prefer_rebuild`` the repair then RETURNS WITHOUT
    touching the index (``aborted=1``, ``needs_rebuild=1``) — safe
    only for callers that keep the touched ids ledgered for serve-time
    exclusion (run_ann_maintenance writes them before invoking) and
    will rebuild promptly; the pipeline requests the abort only when
    it can rebuild in-line.

    Crash discipline: partition commits land one at a time, so a crash
    mid-repair leaves some touched ids evicted and others standing —
    callers keep the ids LEDGERED (serve-time exclusion) until the
    repair returns, and a retry is exactly idempotent: step 2's
    anti-join re-evicts whatever survived (including rows a crashed
    attempt already appended — their ids are touched too), step 3
    re-inserts one copy, step 4 recomputes from what is actually on
    disk.

    Reassigned vectors count toward the ``appended`` drift bookkeeping
    (they are placed against the FROZEN centroids, same as appends).
    Returns ``{"removed", "reassigned", "touched_clusters",
    "appended_fraction", "min_centroid_cos", "needs_rebuild"}``."""
    from eea_crawler_spark.operators.dedup import (
        _fs_delete,
        _heal_rel,
        _release_local_checkpoint,
        _replace_dir,
    )

    for rel in ("spec", "agg"):
        _heal_rel(spark, path, rel)
    idx = read_ivf_index(spark, path)
    spec = idx["spec"]
    dim = int(spec["dim"])
    if "vec_hash" not in idx["lists"].columns:
        # round-12 ADVICE: appending vec_hash rows into a pre-vec_hash
        # lists relation mixes parquet schemas, making the nightly
        # leg's '"vec_hash" in lists.columns' detection depend on which
        # file footer Spark samples — refuse the legacy layout outright
        # (the repair_embedding_state discipline)
        raise ValueError(
            "repair_ivf_index needs a vec_hash-bearing lists layout — "
            "this is a legacy index; rebuild it with build_ivf_index"
        )
    if updates is not None:
        # materialize FIRST: the caller's updates/deleted plans may
        # derive from the very lists this repair rewrites (the nightly
        # leg's changed-vector join does) — a lazy read would chase the
        # evicted files mid-repair
        updates = updates.select(id_col, vec_col).localCheckpoint(
            eager=True
        )
        probe = updates.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(id_col)).alias("nd"),
            F.min(F.size(vec_col)).alias("dmin"),
            F.max(F.size(vec_col)).alias("dmax"),
        ).first()
        n_updates = int(probe["n"])
        if n_updates:
            if probe["nd"] != n_updates:
                raise ValueError(
                    "repair_ivf_index updates must be unique per id — "
                    "duplicate ids make which-vector-wins ambiguous"
                )
            if probe["dmin"] != probe["dmax"] or int(probe["dmax"]) != dim:
                raise ValueError(
                    f"index holds {dim}-d vectors, updates have "
                    f"{probe['dmin']}..{probe['dmax']}-d"
                )
    else:
        n_updates = 0
    if deleted_ids is not None:
        # narrow projection only — NOT checkpointed (round-14, guide
        # §1.2): the ``touched`` checkpoint below materializes this
        # plan before any eviction rewrites the lists it may derive
        # from, so the separate eager checkpoint job was pure overhead
        deleted_ids = deleted_ids.select(id_col)
    touched = None
    if n_updates:
        touched = updates.select(id_col)
    if deleted_ids is not None:
        touched = (
            deleted_ids if touched is None
            else touched.unionByName(deleted_ids)
        )
    if touched is None:
        if updates is not None:
            _release_local_checkpoint(updates)
        return {
            "removed": 0, "reassigned": 0, "touched_clusters": 0,
            "appended_fraction":
                float(spec["appended"]) / max(1, spec["n"]),
            "min_centroid_cos": 1.0, "needs_rebuild": 0,
            "prefer_rebuild": 0,
        }
    touched = touched.distinct().localCheckpoint(eager=True)
    # 1. the narrow locate scan: (id, cluster) only — column pruning
    # keeps the wide vectors out of this full-lists pass. The per-
    # cluster tally rides the same job (round-13): its total IS the
    # eviction count (every located row's id is touched, so every
    # located row is evicted), replacing the separate
    # n_before/keep.count() passes over the touched partitions.
    _located = (
        idx["lists"]
        .join(touched, [id_col], "left_semi")
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    removal_clusters = sorted(int(r["cluster"]) for r in _located)
    n_located = sum(int(r["c"]) for r in _located)
    # the arbiter (docstring calculus): evaluated on the locate scan's
    # output, BEFORE any eviction, so an abort leaves the index
    # untouched byte-for-byte
    n_clusters = int(spec["n_clusters"])
    projected_frac = (int(spec["appended"]) + n_updates) / max(
        1, int(spec["n"])
    )
    prefer_rebuild = (
        len(removal_clusters)
        >= scatter_cluster_fraction * n_clusters
        and projected_frac >= scatter_drift_arm * rebuild_append_fraction
    )
    if prefer_rebuild and abort_on_prefer_rebuild:
        for ck in (touched, updates, deleted_ids):
            if ck is not None:
                _release_local_checkpoint(ck)
        return {
            "removed": 0, "reassigned": 0,
            "touched_clusters": len(removal_clusters),
            "appended_fraction":
                float(spec["appended"]) / max(1, spec["n"]),
            "min_centroid_cos": 1.0,
            "needs_rebuild": 1, "prefer_rebuild": 1, "aborted": 1,
        }
    n_removed = 0
    if removal_clusters:
        # the surviving-cluster set rides the checkpoint job via
        # df.observe (round-14, guide §1.2): collect_set over
        # ≤ n_clusters ints replaces the separate distinct+collect job
        _obs_keep = Observation()
        keep = (
            idx["lists"]
            .filter(F.col("cluster").isin(removal_clusters))
            .join(touched, [id_col], "left_anti")
            .observe(_obs_keep, F.collect_set("cluster").alias("cs"))
            # materialize BEFORE the overwrite: the rewrite reads the
            # same partitions it replaces. Bounded at the touched
            # partitions' rows — the O(stale-partitions) working set.
            .localCheckpoint(eager=True)
        )
        survivors = {int(c) for c in _obs_keep.get["cs"]}
        n_removed = n_located
        mode_before = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        try:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            if survivors:
                (
                    keep.repartition("cluster")
                    .write.mode("overwrite")
                    .partitionBy("cluster")
                    .parquet(f"{path}/lists")
                )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", mode_before
            )
        # dynamic overwrite only touches partitions PRESENT in the
        # writeout — a fully-emptied list must be deleted explicitly,
        # and the manual delete bypasses Spark's file-index cache
        # invalidation (a later read would chase the vanished files)
        for c in set(removal_clusters) - survivors:
            _fs_delete(spark, f"{path}/lists/cluster={c}")
        spark.catalog.refreshByPath(f"{path}/lists")
        _release_local_checkpoint(keep)
    # 3. re-insert the update vectors against the standing centroids
    # (their cluster set rides the checkpoint job via df.observe —
    # round-14, guide §1.2 — replacing the distinct+collect job)
    added_clusters: set = set()
    if n_updates:
        _obs_add = Observation()
        assigned = (
            ivf_assign(
                updates, idx["centroids"], id_col=id_col,
                vec_col=vec_col, n_probe=1,
            )
            .withColumn("vec_hash", F.xxhash64(vec_col))
            .observe(_obs_add, F.collect_set("cluster").alias("cs"))
            .localCheckpoint(eager=True)
        )
        added_clusters = {int(c) for c in _obs_add.get["cs"]}
        assigned.repartition("cluster").write.mode("append").partitionBy(
            "cluster"
        ).parquet(f"{path}/lists")
        _release_local_checkpoint(assigned)
    _release_local_checkpoint(touched)
    if updates is not None:
        _release_local_checkpoint(updates)
    if deleted_ids is not None:
        _release_local_checkpoint(deleted_ids)
    # 4. exact re-aggregation of every affected cluster from the
    # rewritten lists (partition-pruned), untouched clusters keep
    # their standing agg rows
    affected = sorted(set(removal_clusters) | added_clusters)
    # explicit schema: this repair just (re)wrote the lists in exactly
    # idx["lists"]'s layout, so the footer-inference job the bare read
    # launches is pure overhead here (round-14; read_ivf_index keeps
    # inference — there the legacy-layout detection needs footers)
    lists_now = spark.read.schema(idx["lists"].schema).parquet(
        f"{path}/lists"
    ).withColumn("cluster", F.col("cluster").cast("int"))
    fresh_agg = _ivf_cluster_agg(
        lists_now.filter(F.col("cluster").isin(affected)), vec_col
    )
    standing_agg = (
        idx["agg"].filter(~F.col("cluster").isin(affected))
        if idx["agg"] is not None
        else None
    )
    merged_agg = (
        fresh_agg if standing_agg is None
        else standing_agg.unionByName(fresh_agg)
    )
    merged_rows = merged_agg.collect()  # bounded: k rows of dim floats
    _tiny_df(
        spark,
        [
            (int(r["cluster"]), int(r["cnt"]),
             [float(x) for x in r["sums"]])
            for r in sorted(merged_rows, key=lambda r: r["cluster"])
        ],
        "cluster int, cnt long, sums array<double>",
    ).write.mode("overwrite").parquet(f"{path}/agg__new")
    _replace_dir(spark, f"{path}/agg__new", f"{path}/agg")
    # drift over the merged implied means (same calculus as append)
    c_mat = np.asarray(idx["centroids"], dtype=np.float64)
    min_cos = 1.0
    n_total = 0
    for r in merged_rows:
        cnt = int(r["cnt"])
        n_total += cnt
        if cnt <= 0:
            continue
        mean = np.asarray(r["sums"], dtype=np.float64) / cnt
        denom = np.linalg.norm(mean) * np.linalg.norm(c_mat[r["cluster"]])
        if denom > 0:
            min_cos = min(
                min_cos, float(mean @ c_mat[r["cluster"]] / denom)
            )
    appended = int(spec["appended"]) + n_updates
    frac = appended / max(1, n_total)
    needs_rebuild = (
        frac >= rebuild_append_fraction or min_cos < rebuild_drift_cos
    )
    _write_spec_guarded(
        spark, path, spec,
        (dim, int(spec["n_clusters"]), int(n_total), appended),
    )
    return {
        "removed": int(n_removed),
        "reassigned": n_updates,
        "touched_clusters": len(affected),
        "appended_fraction": frac,
        "min_centroid_cos": min_cos,
        "needs_rebuild": int(needs_rebuild or prefer_rebuild),
        "prefer_rebuild": int(prefer_rebuild),
    }


def ivf_topk_state(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: DataFrame | None = None,
) -> DataFrame:
    """Serve ANN top-k from the PERSISTED IVF index: the queries'
    ``n_probe`` nearest lists are computed driver-side (queries are
    broadcast-sized by the family contract) and the lists relation is
    read with ``cluster IN (probed)`` — a physical partition-pruning
    filter, so only the probed inverted lists are scanned at all
    (pinned in tests). Scoring then reuses ``ivf_topk`` with the
    standing centroids: rows outside a given query's own probe set are
    masked per query, so the result is EXACTLY
    ``ivf_topk(full_corpus, queries, centroids=standing, n_probe)`` —
    pre-pruning only removes rows no query probes. With
    ``n_probe >= n_clusters`` it equals ``brute_force_topk`` on
    everything indexed (build + appends), the oracle-checked property.

    ``exclude_ids`` (one column named ``id_col``): indexed entries to
    knock out before scoring — the serve-correctness valve for STALE
    entries (a modified/deleted source row's old vector still sits in
    its list until the next rebuild; serving it would return the OLD
    vector's neighbors). ``pipeline.ann_search`` passes the stale
    ledger here, so staleness degrades to absence, never to a wrong
    answer.

    The exclusion anti-join takes NO broadcast hint on purpose: a
    ledger under the rebuild trigger fraction (default 5% of indexed
    rows) is comfortably inside broadcast range and Spark's size
    estimate broadcasts it (plan-pinned in tests/test_plan_audit.py);
    past ~10⁸ ledgered ids — an index overdue for rebuild by orders of
    magnitude — the estimate falls back to a shuffle join, the correct
    plan in that regime.
    """
    idx = read_ivf_index(spark, path)
    centroids = idx["centroids"]
    n_probe = min(n_probe, len(centroids))
    c_mat = np.asarray(centroids, dtype=np.float64)
    c_nrm = np.sqrt((c_mat * c_mat).sum(axis=1))
    q_rows = queries.select(vec_col).collect()
    if not q_rows:
        return _fused_topk(
            idx["lists"].select(id_col, vec_col).limit(0), queries, k,
            id_col, vec_col,
        )
    q_mat = _vec_matrix(list(r[vec_col]) for r in q_rows)
    q_nrm = np.sqrt((q_mat * q_mat).sum(axis=1))
    probed = sorted(
        int(c)
        for c in np.unique(
            _nearest_centroids(q_mat, q_nrm, c_mat, c_nrm, n_probe)
        )
    )
    pruned = idx["lists"].filter(F.col("cluster").isin(probed)).select(
        id_col, vec_col
    )
    if exclude_ids is not None:
        # no broadcast hint: the exclusion set is ledger-bounded (≤ the
        # rebuild trigger fraction) but can still be large at corpus
        # scale — let the size estimate pick broadcast vs shuffle
        pruned = pruned.join(
            exclude_ids.select(id_col), [id_col], "left_anti"
        )
    return ivf_topk(
        pruned, queries, k=k, n_probe=n_probe, id_col=id_col,
        vec_col=vec_col, centroids=centroids,
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate cosine top-k (the second scale path next to
    hyperplane LSH): corpus rows live in their nearest-centroid
    inverted list; each query probes its ``n_probe`` closest lists, so
    a candidate is scored iff its list is probed. With
    n_probe = n_clusters the result equals ``brute_force_topk``
    exactly (every list probed) — the property the tests pin.

    Output: (q_id, vec_id, rnk, cos), same contract as the other ANN
    operators. Pass precomputed ``centroids`` to reuse an index.

    Execution is the fused kernel with a probe-list mask: per Arrow
    batch, one extra matmul against the centroid matrix assigns each
    row its inverted list, and rows whose list is outside the query's
    probe set are knocked out before ranking. The previous
    cluster-keyed join + per-pair CodegenFallback cosine fold
    evaluated ~(n_probe/n_clusters)·n·q interpreted dots and shuffled
    the candidate pairs through a dropDuplicates — 7.3 s at sf100 even
    with a prebuilt index; fused: 1.7 s.
    """
    if centroids is None:
        centroids = ivf_centroids(corpus, n_clusters, n_iter, id_col, vec_col)
    c_mat = np.asarray(centroids, dtype=np.float64)
    c_nrm = np.sqrt((c_mat * c_mat).sum(axis=1))
    n_probe = min(n_probe, len(centroids))

    def mask_factory(q_ids, q_mat, q_nrm):
        q_probes = _nearest_centroids(q_mat, q_nrm, c_mat, c_nrm, n_probe)

        def batch_mask(v_mat, v_nrm):
            lists = _nearest_centroids(v_mat, v_nrm, c_mat, c_nrm)[:, 0]
            return lambda j: ~np.isin(lists, q_probes[j])

        return batch_mask

    return _fused_topk(corpus, queries, k, id_col, vec_col, mask_factory)


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: candidates share the hyperplane bucket
    (sign-bit signature over ``n_planes`` seeded projections).
    Multi-probe (flipping one bit) would raise recall; kept single-probe
    here for plan clarity. No oracle — approximate by construction.

    Execution is the fused kernel with a bucket-equality mask: per
    Arrow batch, one extra matmul against the P×dim plane matrix
    buckets each row (the per-plane zip_with/aggregate projections
    were CodegenFallback, 24M interpreted dots at sf100), and rows
    whose bucket differs from the query's are knocked out before
    ranking. An earlier bucket-then-join variant measured 3.1 s at
    sf100 — slower than the 1.9 s exact path it is meant to undercut —
    because the embedding column round-tripped through Arrow into a
    join; fused, bucketing is a ~P/q-th of the scoring matmul and
    only top-k rows leave the pass.
    """
    planes = hyperplane_planes(dim, n_planes, seed)
    p_mat = np.asarray(planes, dtype=np.float64)

    def _bucket_of(m: "np.ndarray") -> "np.ndarray":
        # one band spanning all planes — the shared banded rule
        return _band_buckets(m, p_mat, n_planes)[:, 0]

    def mask_factory(q_ids, q_mat, q_nrm):
        q_buckets = _bucket_of(q_mat)

        def batch_mask(v_mat, v_nrm):
            buckets = _bucket_of(v_mat)
            return lambda j: buckets != q_buckets[j]

        return batch_mask

    return _fused_topk(corpus, queries, k, id_col, vec_col, mask_factory)
