"""Training-data pipeline operators as declared queries (beyond §2.9).

Each entry pairs an idiomatic DataFrame plan over the driver's
``documents`` / ``embeddings`` tables with a DuckDB oracle; oracle SQL
for the text ops is *generated from the same Python constants* as the
Spark expressions so the two sides cannot drift. Hash-based operators
(MinHash/SimHash/hyperplane-LSH) are deliberately oracle-less — their
signatures depend on xxhash64, which DuckDB does not share — and get the
driver's rows-only check.

DuckDB dialect notes (why some oracle strings differ in spelling):
  - regexp_replace needs the 'g' flag to replace all (Spark always does);
  - list ops are list_transform/list_sum; generate_series(1, n<1) is
    empty, matching the Spark-side guard for docs shorter than the
    shingle width.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eea_crawler_spark.functions import text as TX
from eea_crawler_spark.operators import dedup as DD
from eea_crawler_spark.operators.dedup import _spread as spread
from eea_crawler_spark.operators import multimodal as MM
from eea_crawler_spark.operators import similarity as SIM
from eea_crawler_spark.operators.normalize_chain import (
    NormalizerConfig,
    common_normalizer,
)
from eea_crawler_spark.sources.tables import load_table

JACCARD_THRESHOLD = 0.8
# Declared path runs WITH the hot-shingle cap (the scale-safe plan): a
# shingle shared by more than max_df docs is excluded from candidate
# enumeration, but Jaccard is still computed over full shingle sets, so
# capped == uncapped at this threshold (pinned in test_extras_oracle and
# hash-checked against the uncapped DuckDB oracle by the driver).
DEDUP_NGRAM_MAX_DF = 20
NEARDUP_COS_THRESHOLD = 0.4
ANN_K = 5
ANN_QUERY_MAX_ID = 10


# ---------- text analysis ----------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Callers compute their narrow per-doc metrics FIRST and order the
    # output with repartition(1).sortWithinPartitions LAST. Measured
    # at sf100 (text_tokens, same window): leading orderBy("doc_id")
    # range-sorts the full text column before a projection that drops
    # it — 13.1 s; trailing orderBy moves narrow rows but its
    # range-partition SAMPLING pass re-executes the expensive
    # projection — 16.0 s; the explicit single-partition sort computes
    # once, moves only the fixed-width output, and skips sampling —
    # 9.7 s. Output rows are metric tuples (≤40 B), so one sort task
    # is fine at any SF where a global total order is meaningful.
    # Same rows, same final order: doc_id is unique.
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .select("doc_id", TX.fingerprint(F.col("text")).alias("fingerprint"))
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            TX.ws_wordcount(F.col("text")).alias("ws_tokens"),
            TX.regex_token_count(F.col("text")).alias("bpe_tokens"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Three-stage projection: split once, score each language once,
    # THEN argmax — inner projections materialize what codegen CSE
    # will not dedupe across greatest/when boundaries (the flat form
    # re-evaluated the 25 marker probes ~4x per row; measured 16 s →
    # at sf100 on this restructure + token-array marker_hits).
    scores = TX.lang_scores_of_tokens(F.col("__toks"))
    inner = (
        _docs(spark, sf_dir)
        .select(
            "doc_id", F.split(F.lower(F.col("text")), " ").alias("__toks")
        )
        .select(
            "doc_id",
            *[scores[lang].alias(f"__s_{lang}") for lang in TX.LANG_ORDER],
        )
    )
    sc = {lang: F.col(f"__s_{lang}") for lang in TX.LANG_ORDER}
    return inner.select(
        "doc_id",
        TX.lang_id_from_scores(sc).alias("pred_lang"),
        F.greatest(*sc.values()).alias("score"),
    ).repartition(1).sortWithinPartitions("doc_id")


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = TX.quality_columns(F.col("text"))
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            cols["n_chars"].alias("n_chars"),
            cols["n_words"].alias("n_words"),
            cols["avg_word_len"].alias("avg_word_len"),
            cols["punct_ratio"].alias("punct_ratio"),
            cols["stop_hits"].alias("stop_hits"),
            TX.quality_label(cols).alias("label"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


CHUNK_WORDS = 40  # testdata docs avg ~54 words; production: 250
CHUNK_OVERLAP = 10  # production: 50 (dags/variables.json:2791-2792)


def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    from eea_crawler_spark.operators.embeddings import chunk_texts

    return chunk_texts(
        docs, words=CHUNK_WORDS, overlap=CHUNK_OVERLAP
    ).orderBy("doc_id", "chunk_idx")


def chunk_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO doc-side spread (the round-3 regression): the embed UDF
    # inherits the scan's partitioning — real input splits provide the
    # width at scale, and chunks, not docs, are the unit the UDF
    # consumes (embed_chunks' target_partitions is the knob for heavy
    # models on narrow inputs)
    docs = load_table(spark, sf_dir, "documents")
    from eea_crawler_spark.operators.embeddings import EMBED_DIM, embed_chunks

    out = embed_chunks(docs, words=CHUNK_WORDS, overlap=CHUNK_OVERLAP)
    # the driver's pandas canon cannot sort/hash list cells — project
    # the vector to per-component double columns (float32→float64 is
    # exact, so the DuckDB oracle's FLOAT4-cast emulation hash-matches).
    # Materialize once (the tiny result), then sort without a range-
    # partition sampling pass — orderBy's sampler re-runs the UDF stage.
    out = out.select(
        "doc_id",
        "chunk_idx",
        *[
            F.col("embedding")[i].cast("double").alias(f"e{i}")
            for i in range(EMBED_DIM)
        ],
    ).localCheckpoint(eager=True)
    return out.coalesce(1).sortWithinPartitions("doc_id", "chunk_idx")


def _chunks_sql() -> str:
    w, ov = CHUNK_WORDS, CHUNK_OVERLAP
    stride = w - ov
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w,
                  len(string_split(text, ' ')) AS n
           FROM documents),
k AS (SELECT doc_id, w,
             CASE WHEN n > {w} THEN (n - {w} + {stride - 1}) // {stride} + 1
                  ELSE 1 END AS nc
      FROM t)
SELECT doc_id, i AS chunk_idx,
       array_to_string(list_slice(w, i * {stride} + 1, i * {stride} + {w}), ' ')
         AS chunk_text
FROM k, UNNEST(generate_series(0, nc - 1)) AS g(i)
ORDER BY doc_id, chunk_idx"""


def _chunk_embed_sql() -> str:
    """SQL twin of the md5 stub embedder, bit-exact: md5 hex → per-pair
    hex parse → centered bytes → sqrt(Σv²) norm (sequential adds, the
    stub's explicit form) → float64 divide → FLOAT4 cast (IEEE
    round-to-nearest, identical to numpy/JVM) → DOUBLE (exact widening,
    matching Spark's float32→double projection)."""
    from eea_crawler_spark.operators.embeddings import EMBED_DIM

    chunks = _chunks_sql().rsplit("ORDER BY", 1)[0]
    hexd = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"
    vs = [
        f"({hexd.format(p=2 * i + 1)} * 16 + {hexd.format(p=2 * i + 2)} - 127.5)"
        for i in range(EMBED_DIM)
    ]
    ss = " + ".join(f"{v}*{v}" for v in vs)
    es = ",\n       ".join(
        f"CAST(CAST({v} / nrm AS FLOAT4) AS DOUBLE) AS e{i}"
        for i, v in enumerate(vs)
    )
    return f"""
WITH c AS ({chunks}),
hh AS (SELECT doc_id, chunk_idx, md5(chunk_text) AS h FROM c),
nn AS (SELECT doc_id, chunk_idx, h,
              CASE WHEN sqrt({ss}) = 0 THEN 1.0 ELSE sqrt({ss}) END AS nrm
       FROM hh)
SELECT doc_id, chunk_idx,
       {es}
FROM nn ORDER BY doc_id, chunk_idx"""


# ---------- dedup ----------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.prefix_dedup(docs)


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(
        docs, threshold=JACCARD_THRESHOLD, max_df=DEDUP_NGRAM_MAX_DF
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(docs, threshold=JACCARD_THRESHOLD)


def dedup_minhash_contained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The strongest driver-checkable invariant MinHash admits (round-6
    VERDICT #4): its banded signatures are xxhash64-based, so the full
    output has no SQL oracle (recall < 1 by design) — but every
    VERIFIED pair carries an exact full-set Jaccard ≥ threshold and
    must therefore appear in the exact n-gram pair set. This query runs
    the whole MinHash pipeline (signatures → bands → candidates →
    verify) and anti-joins the exact pairs: the result is EMPTY iff
    containment holds, and the driver hash-compares that emptiness
    (schema included) against the oracle. Recall itself stays pinned in
    pytest (randomized corpora, test_extras_oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    # one shingle pass serves both legs (round-13 optimization, guide
    # §1.2): the MinHash leg and the exact n-gram leg each shingled the
    # full corpus (and MinHash's verify re-shingled the candidates) —
    # three text passes for one invariant. Shared checkpointed arrays
    # cut that to one; both operators are pinned output-identical with
    # and without `arrays` (test_extras_oracle).
    arr = DD.ck_shingle_arrays(docs)
    mh = DD.minhash_lsh_pairs(
        docs, threshold=JACCARD_THRESHOLD, arrays=arr
    ).select("doc_a", "doc_b", "jaccard")
    exact = DD.ngram_jaccard_pairs(
        docs, threshold=JACCARD_THRESHOLD, max_df=DEDUP_NGRAM_MAX_DF,
        arrays=arr,
    ).select("doc_a", "doc_b")
    # single-pass global sort (the ngram_jaccard_pairs discipline):
    # orderBy's range-partition sampling would execute the two-leg
    # anti-join TWICE just to order a result that is empty-by-invariant
    # (violations would be a handful of rows at any scale)
    return (
        mh.join(exact, ["doc_a", "doc_b"], "left_anti")
        .repartition(1)
        .sortWithinPartitions("doc_a", "doc_b", "jaccard")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.simhash_pairs(docs)


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: connected components over the
    exact n-gram near-dup pairs (alternating star contraction —
    O(log n) rounds of groupBy-min + hash join). Oracle: transitive
    closure via a DuckDB recursive CTE over the SAME pair SQL."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(
        docs, threshold=JACCARD_THRESHOLD, max_df=DEDUP_NGRAM_MAX_DF
    )
    return DD.connected_components(pairs)


def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc keep/drop verdict: every doc labeled with its duplicate
    cluster's min id (itself when unpaired) and ``keep`` = is-the-min —
    the first-seen policy (crawl_sitemap.py:217-220) over the
    transitive closure. The training pipeline's filter is WHERE keep."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(
        docs, threshold=JACCARD_THRESHOLD, max_df=DEDUP_NGRAM_MAX_DF
    )
    return (
        DD.canonical_docs(docs, pairs)
        .select("doc_id", "cluster_id", "keep")
        .orderBy("doc_id", "cluster_id", "keep")
    )


# Delta split for the incremental (delta-vs-corpus) declared queries:
# every 20th doc plays the nightly-ingest batch, the rest the corpus.
DELTA_MOD = 20


def dedup_ngram_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental n-gram dedup (round-8 VERDICT #1): the delta probes
    the corpus instead of re-running the corpus self-join. Oracle: the
    full-pair SQL restricted to pairs touching the delta — the operator
    contract (delta form ≡ restricted self-join) IS the check."""
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % DELTA_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % DELTA_MOD != 0)
    return DD.ngram_jaccard_pairs(
        new, threshold=JACCARD_THRESHOLD, max_df=DEDUP_NGRAM_MAX_DF,
        against=corpus,
    )


def dedup_cluster_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cluster maintenance (round-9 verdict #2): standing
    labels from the corpus-only pair relation, folded with the delta
    probe's pairs via ``update_connected_components`` — O(delta) label
    maintenance whose applied result must equal the full recompute over
    the union. The oracle IS the full recursive-CTE transitive closure
    (same SQL as ``dedup_clusters``), so the driver hash-checks the
    incremental path against the from-scratch answer."""
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % DELTA_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % DELTA_MOD != 0)
    # the corpus shingle arrays feed BOTH legs (round-13 optimization,
    # guide §1.2): the standing-pairs self-join and the delta probe's
    # against-side each shingled the corpus — `arrays`/`against_arrays`
    # share one checkpointed pass, exactly how the nightly pipeline
    # hands the probe its persisted arrays relation
    corpus_arr = DD.ck_shingle_arrays(corpus)
    base_pairs = DD.ngram_jaccard_pairs(
        corpus, threshold=JACCARD_THRESHOLD, max_df=DEDUP_NGRAM_MAX_DF,
        arrays=corpus_arr,
    )
    labels = DD.connected_components(base_pairs).localCheckpoint(eager=True)
    # checkpoint the probe's pairs: the fold consumes its input twice
    # (endpoint set + contracted edges) and would otherwise re-run the
    # whole delta-probe pipeline — the same discipline as
    # run_dedup_maintenance. The pair count rides the checkpoint job
    # via df.observe (round-14, guide §1.2) and gates the fold's
    # driver fast path, exactly how the nightly leg's own count does.
    from pyspark.sql import Observation

    _obs = Observation()
    delta_pairs = (
        DD.ngram_jaccard_pairs(
            new, threshold=JACCARD_THRESHOLD, max_df=DEDUP_NGRAM_MAX_DF,
            against=corpus, against_arrays=corpus_arr,
        )
        .observe(_obs, F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    # eager checkpoint (round-14): ``merged`` consumes the fold's
    # output TWICE (anti-join key set + union leg) — un-checkpointed,
    # the whole fold subtree (label joins included) executed twice per
    # run; the checkpoint is delta-bounded. Same discipline as
    # run_dedup_maintenance's updates checkpoint.
    updates = DD.update_connected_components(
        labels, delta_pairs, n_pairs=int(_obs.get["c"])
    ).localCheckpoint(eager=True)
    merged = labels.join(
        updates.select("node"), ["node"], "left_anti"
    ).unionByName(updates)
    # single-pass global sort: labels hold only PAIRED docs (the
    # near-dup shortlist class, ngram_jaccard_pairs' own final-sort
    # shape); both inputs are checkpointed so orderBy's range-partition
    # sampling re-reads checkpoint blocks, never re-runs the fold —
    # but at gate SF the single-partition sort skips the sampling pass
    # outright, so it stays the plan while the corpus is small and a
    # range-partitioned orderBy takes over past the one-task bound
    # (round-13 verdict #5: a corpus-pair-scale merged set must not
    # sort in one task).
    if corpus_arr.stats[0] <= DD.SINGLE_SORT_MAX_ROWS:
        return merged.repartition(1).sortWithinPartitions(
            "node", "cluster_id"
        )
    return merged.orderBy("node", "cluster_id")


def emb_neardup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding near-dup: delta vectors against the
    standing state — exact pairs touching the delta only."""
    emb = load_table(spark, sf_dir, "embeddings")
    new = emb.filter(F.col("vec_id") % DELTA_MOD == 0)
    state = emb.filter(F.col("vec_id") % DELTA_MOD != 0)
    return SIM.neardup_pairs(
        new, threshold=NEARDUP_COS_THRESHOLD, against=state
    )


# ---------- embeddings / similarity ----------


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_QUERY_MAX_ID)
    return SIM.brute_force_topk(emb, queries, k=ANN_K)


def emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.neardup_pairs(emb, threshold=NEARDUP_COS_THRESHOLD)


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_QUERY_MAX_ID)
    return SIM.hyperplane_lsh_topk(emb, queries, k=ANN_K)


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned ANN (second scale path): nearest-centroid
    inverted lists, queries probe 4 of 16 lists."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_QUERY_MAX_ID)
    return SIM.ivf_topk(emb, queries, k=ANN_K, n_clusters=16, n_probe=4)


def ann_ivf_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted IVF serving index, full lifecycle under the gate
    (round-10 verdict #2): build on the standing corpus, append the
    delta split via the O(delta) maintenance leg, serve PROBE-ALL from
    the partitioned lists — which must equal exact brute-force cosine
    top-k over the union, so the oracle hash-checks build + append +
    serve end-to-end. (Partial-probe recall and partition pruning are
    pinned in tests/test_ivf_index.py; the serving surface mirrors
    dags/lib/elastic.py:107-119.)"""
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    new = emb.filter(F.col("vec_id") % DELTA_MOD == 0)
    corpus = emb.filter(F.col("vec_id") % DELTA_MOD != 0)
    queries = emb.filter(F.col("vec_id") < ANN_QUERY_MAX_ID)
    tmp = tempfile.mkdtemp(prefix="ivf_state_")
    try:
        # gate-sized parameters: probe-all correctness is independent
        # of centroid quality, so one Lloyd iteration over 8 lists
        # keeps the per-rep job count (the cost driver at gate SF) low;
        # scale parameters live in scripts/bench_ivf_index.py
        SIM.build_ivf_index(corpus, tmp, n_clusters=8, n_iter=1)
        SIM.append_ivf_index(spark, tmp, new)
        out = SIM.ivf_topk_state(
            spark, tmp, queries, k=ANN_K, n_probe=8
        )
        # materialize before the index dir is removed — the driver
        # collects AFTER this callable returns
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def ann_ivf_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The O(stale) partition-local repair under the gate (round-11
    verdict #1): build on the standing corpus, append the delta, then
    REPAIR — modified ids (vec_id % 7 == 3, vector reversed) replaced
    in place, deleted ids (vec_id % 11 == 5, unless modified) evicted —
    and serve PROBE-ALL, which must equal exact brute-force cosine
    top-k over the CORRECTED corpus. The oracle states the corrected
    corpus in SQL, so the hash check certifies eviction, re-assignment,
    and the untouched lists end-to-end (the reference's doc_as_upsert
    update-in-place serving, logstash/pipeline/search_pipeline.conf:
    19-27; partition-locality is pinned in tests/test_ivf_index.py)."""
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    new = emb.filter(F.col("vec_id") % DELTA_MOD == 0)
    corpus = emb.filter(F.col("vec_id") % DELTA_MOD != 0)
    queries = emb.filter(F.col("vec_id") < ANN_QUERY_MAX_ID)
    mod = emb.filter(F.col("vec_id") % 7 == 3).withColumn(
        "embedding", F.reverse("embedding")
    )
    doomed = emb.filter(
        (F.col("vec_id") % 11 == 5) & (F.col("vec_id") % 7 != 3)
    ).select("vec_id")
    tmp = tempfile.mkdtemp(prefix="ivf_repair_")
    try:
        SIM.build_ivf_index(corpus, tmp, n_clusters=8, n_iter=1)
        SIM.append_ivf_index(spark, tmp, new)
        SIM.repair_ivf_index(spark, tmp, updates=mod, deleted_ids=doomed)
        out = SIM.ivf_topk_state(spark, tmp, queries, k=ANN_K, n_probe=8)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def emb_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale twin of emb_neardup_pairs: banded hyperplane-LSH
    candidates, exact in-bucket verification (subset of the exact
    output with identical cosines; recall < 1 by design, so no SQL
    oracle — subset/recall pinned in pytest)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.neardup_pairs_lsh(emb, threshold=0.9)


# ---------- normalize chain (SURVEY §2.5 backbone as a declared query) --

# Restricted config for the declared query so every step has an exact
# SQL twin (the full DEFAULT_CONFIG is exercised by golden-doc tests).
NORM_QUERY_CONFIG = NormalizerConfig(
    black_map={"subjects": ["internal"]},
    norm_obj={"Assessment": "Indicator"},
    norm_prop={
        "id": ["id", "about"],
        "title": ["title", "label"],
        "doc_type": ["doc_type", "objectProvides"],
    },
    theme_labels={"climate": "Climate change", "water": "Water and marine"},
    proplist=[
        "id", "about", "title", "label", "description", "objectProvides",
        "language", "themes", "subjects", "fulltext", "readingTime",
    ],
    count_fields=["themes", "subjects"],
)


def _doc_envelopes(docs: DataFrame) -> DataFrame:
    """Deterministic raw envelopes derived from the documents table, so
    the normalize chain has a driver-checkable input (no fixture I/O)."""
    return docs.select(
        F.concat(F.lit("doc:"), F.col("doc_id")).alias("id"),
        F.element_at(
            F.array(F.lit("Article"), F.lit("Assessment"), F.lit("File")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("doc_type"),
        F.to_json(
            F.struct(
                F.concat(F.lit("Doc "), F.col("doc_id")).alias("title"),
                F.substring(F.col("text"), 1, 80).alias("description"),
                F.col("lang").alias("language"),
                F.when(F.col("doc_id") % 2 == 0, F.array(F.lit("climate")))
                .otherwise(F.array(F.lit("water")))
                .alias("themes"),
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.array(F.lit("air"), F.lit("internal"), F.lit("air")),
                )
                .otherwise(F.array(F.lit("air")))
                .alias("subjects"),
                F.lit("published").alias("review_state"),
            )
        ).alias("raw_value"),
        F.lit(None).cast("string").alias("web_html"),
        F.lit(200).alias("status_code"),
        F.lit(None).cast("string").alias("pdf_text"),
        F.concat(F.lit("doc:"), F.col("doc_id")).alias("original_id"),
        F.col("source").alias("site_id"),
        F.array().cast("array<string>").alias("errors"),
        F.lit("2024-01-01").alias("modified"),
        F.lit("https://site").alias("site"),
        F.lit(None).cast("timestamp").alias("indexed_at"),
    )


def normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = common_normalizer(spread(_doc_envelopes(docs)), NORM_QUERY_CONFIG)
    # serialize array columns as JSON text — the driver's pandas canon
    # crashes on list cells (unhashable in sort_values); the oracle twin
    # wraps the same columns in DuckDB's to_json
    from pyspark.sql import types as T

    cols = [
        F.to_json(F.col(f.name)).alias(f.name)
        if isinstance(f.dataType, T.ArrayType)
        else F.col(f.name)
        for f in out.schema.fields
    ]
    return out.select(cols).orderBy("id")


def _normalize_sql() -> str:
    """DuckDB twin of normalize_docs: each chain step restated in SQL."""
    dot = (
        "CASE WHEN trim({x}) ~ '.*[.!?]$' OR length(trim({x})) = 0 "
        "THEN trim({x}) ELSE trim({x}) || '.' END"
    )
    desc = "substr(text, 1, 80)"
    fulltext = f"{dot.format(x='title0')} || ' ' || {dot.format(x='desc0')}"
    wc = f"length({fulltext}) - length(replace({fulltext}, ' ', '')) + 1"
    return f"""
WITH e AS (
  SELECT 'doc:' || doc_id AS id,
         ['Article', 'Assessment', 'File'][(doc_id % 3 + 1)::INT] AS doc_type,
         'Doc ' || doc_id AS title0,
         {desc} AS desc0,
         lang,
         CASE WHEN doc_id % 2 = 0 THEN ['climate'] ELSE ['water'] END AS themes0,
         CASE WHEN doc_id % 5 = 0 THEN ['air'] ELSE ['air'] END AS subjects0,
         text
  FROM documents)
SELECT id, id AS about,
       trim(title0) AS title, trim(title0) AS label,
       trim(desc0) AS description,
       CASE doc_type WHEN 'Assessment' THEN 'Indicator' ELSE doc_type END
         AS "objectProvides",
       coalesce(lang, 'en') AS language,
       to_json(list_transform(themes0,
         t -> CASE t WHEN 'climate' THEN 'Climate change'
                     WHEN 'water' THEN 'Water and marine' ELSE t END)) AS themes,
       to_json(subjects0) AS subjects,
       {fulltext} AS fulltext,
       CAST(CASE WHEN coalesce(lang, 'en') = 'en'
                 THEN ROUND(({wc}) / 228.0, 4) ELSE -1 END AS DOUBLE)
         AS "readingTime",
       CAST(len(themes0) AS BIGINT) AS items_count_themes,
       CAST(len(subjects0) AS BIGINT) AS items_count_subjects
FROM e ORDER BY id"""


# ---------- multimodal ----------


def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return MM.decode_media(MM.documents_as_media(docs)).orderBy("media_id")


# ---------- oracle SQL generation (same constants as the Spark side) ----


def _hits_sql(words: tuple[str, ...], col: str = "text") -> str:
    return " + ".join(
        f"CAST(((' ' || lower({col}) || ' ') LIKE '% {w} %') AS INT)" for w in words
    )


def _langid_sql() -> str:
    score_defs = ",\n         ".join(
        f"{_hits_sql(TX.LANG_MARKERS[lang])} AS s_{lang}" for lang in TX.LANG_ORDER
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in TX.LANG_ORDER) + ")"
    pred = "'und'"
    for lang in reversed(TX.LANG_ORDER):
        pred = (
            f"CASE WHEN s_{lang} > 0 AND s_{lang} = {best} THEN '{lang}' ELSE {pred} END"
        )
    return f"""
WITH s AS (
  SELECT doc_id,
         {score_defs}
  FROM documents)
SELECT doc_id, {pred} AS pred_lang, {best} AS score
FROM s ORDER BY doc_id, pred_lang, score"""


def _quality_sql() -> str:
    stop_hits = _hits_sql(TX.EN_STOPWORDS)
    return f"""
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_words,
         length(replace(text, ' ', '')) AS n_nonspace,
         length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS n_punct,
         {stop_hits} AS stop_hits
  FROM documents),
g AS (
  SELECT doc_id, n_chars, n_words,
         ROUND(CAST(n_nonspace AS DOUBLE) / n_words, 4) AS avg_word_len,
         ROUND(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 4) AS punct_ratio,
         stop_hits
  FROM f)
SELECT doc_id, n_chars, n_words, avg_word_len, punct_ratio, stop_hits,
       CASE WHEN n_words >= 5 AND n_words <= 100000
             AND avg_word_len >= 2.0 AND avg_word_len <= 12.0
             AND punct_ratio <= 0.2
            THEN 'ok' ELSE 'low' END AS label
FROM g ORDER BY doc_id"""


_DOT_SQL = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _ann_sql() -> str:
    nrm = _DOT_SQL.format(a="embedding", b="embedding")
    dot = _DOT_SQL.format(a="q.qe", b="e.embedding")
    return f"""
WITH e AS (SELECT vec_id, embedding, sqrt({nrm}) AS nrm FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS qe, nrm AS qn FROM e
      WHERE vec_id < {ANN_QUERY_MAX_ID}),
scored AS (
  SELECT q.q_id, e.vec_id, ROUND({dot} / (q.qn * e.nrm), 4) AS cos
  FROM e, q WHERE e.vec_id <> q.q_id),
r AS (SELECT q_id, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
      FROM scored)
SELECT q_id, vec_id, rnk, cos FROM r WHERE rnk <= {ANN_K}
ORDER BY q_id, rnk, vec_id"""


def _ann_repair_sql() -> str:
    """Exact brute-force cosine top-k over the CORRECTED corpus — the
    corrections (reverse vec_id%7==3, drop vec_id%11==5 unless
    modified) stated in SQL, so the hash compare certifies the
    partition-local repair end-to-end. Queries keep their ORIGINAL
    vectors (they are external probes; self-matches excluded by id)."""
    nrm = _DOT_SQL.format(a="embedding", b="embedding")
    dot = _DOT_SQL.format(a="q.qe", b="e.embedding")
    return f"""
WITH src AS (
  SELECT vec_id,
         CASE WHEN vec_id % 7 = 3 THEN list_reverse(embedding)
              ELSE embedding END AS embedding
  FROM embeddings
  WHERE NOT (vec_id % 11 = 5 AND vec_id % 7 <> 3)),
e AS (SELECT vec_id, embedding, sqrt({nrm}) AS nrm FROM src),
q AS (SELECT vec_id AS q_id, embedding AS qe, sqrt({nrm}) AS qn
      FROM embeddings WHERE vec_id < {ANN_QUERY_MAX_ID}),
scored AS (
  SELECT q.q_id, e.vec_id, ROUND({dot} / (q.qn * e.nrm), 4) AS cos
  FROM e, q WHERE e.vec_id <> q.q_id),
r AS (SELECT q_id, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
      FROM scored)
SELECT q_id, vec_id, rnk, cos FROM r WHERE rnk <= {ANN_K}
ORDER BY q_id, rnk, vec_id"""


def _neardup_sql() -> str:
    nrm = _DOT_SQL.format(a="embedding", b="embedding")
    dot = _DOT_SQL.format(a="a.embedding", b="b.embedding")
    return f"""
WITH e AS (SELECT vec_id, embedding, sqrt({nrm}) AS nrm FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       ROUND({dot} / (a.nrm * b.nrm), 4) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND({dot} / (a.nrm * b.nrm), 4) >= {NEARDUP_COS_THRESHOLD}
ORDER BY a_id, b_id, cos"""


# The driver's correctness gate records at most 50 declared queries
# (CORRECTNESS_r01/r02 each held exactly 50 entries, truncating the
# declared tail) — so the first 50 names here are all ORACLE-BEARING:
# round 7 gave MinHash a hash-checkable containment invariant
# (dedup_minhash_contained, every verified pair ⊆ the exact n-gram pair
# set — the round-6 VERDICT's prescription), which takes the gated slot;
# the raw dedup_minhash_lsh output (rows-only by design — banded
# xxhash64 signatures have no SQL twin) stays declared as the 51st name
# for bench/users, its bit-identity and recall pinned in pytest.
# dedup_simhash / ann_lsh_topk / ann_ivf_topk remain fully implemented
# and exported (operators/dedup.py, operators/similarity.py) with their
# stronger exactness/recall checks in pytest (test_extras_oracle.py).
EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_fingerprint": text_fingerprint,
    "text_tokens": text_tokens,
    "text_langid": text_langid,
    "text_quality": text_quality,
    "text_chunks": text_chunks,
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_contained": dedup_minhash_contained,
    "ann_cosine_topk": ann_cosine_topk,
    "emb_neardup_pairs": emb_neardup_pairs,
    "mm_decode_stub": mm_decode_stub,
    "normalize_docs": normalize_docs,
    "chunk_embed": chunk_embed,
    # gate-window placement is decided in plans/__init__ (round-10
    # rotation): every oracle-bearing query rides inside the driver's
    # 50-slot window; the rows-only dedup_minhash_lsh and five
    # long-stable scalar filters hold the tail (all still pytest-gated)
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_ngram_delta": dedup_ngram_delta,
    "emb_neardup_delta": emb_neardup_delta,
    "dedup_clusters": dedup_clusters,
    "dedup_canonical": dedup_canonical,
    "dedup_cluster_incr": dedup_cluster_incr,
    "ann_ivf_state": ann_ivf_state,
    "ann_ivf_repair": ann_ivf_repair,
}

# Implemented-but-undeclared (pytest-pinned) query builders, importable
# for ad-hoc use and exercised by tests/test_extras_oracle.py.
UNDECLARED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_simhash": dedup_simhash,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "emb_neardup_lsh": emb_neardup_lsh,
}

EXTRA_ORACLE: dict[str, str] = {
    "text_fingerprint": """
SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
FROM documents ORDER BY doc_id, fingerprint""",
    "text_tokens": f"""
SELECT doc_id,
       length(text) - length(replace(text, ' ', '')) + 1 AS ws_tokens,
       len(regexp_extract_all(text, '{TX.TOKEN_RE}')) AS bpe_tokens
FROM documents ORDER BY doc_id, ws_tokens, bpe_tokens""",
    "text_langid": _langid_sql(),
    "text_quality": _quality_sql(),
    "dedup_exact": """
WITH k AS (SELECT doc_id, substr(regexp_replace(text, '<[^>]*>', '', 'g'), 1, 20) AS key
           FROM documents),
g AS (SELECT key, MIN(doc_id) AS keep_id, COUNT(*) AS c FROM k GROUP BY key)
SELECT k.doc_id AS dropped_id, g.keep_id, k.key AS key
FROM k JOIN g ON k.key = g.key
WHERE g.c > 1 AND k.doc_id <> g.keep_id
ORDER BY dropped_id, keep_id, 3""",
    "dedup_ngram_jaccard": f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT s1.doc_id AS doc_a, s2.doc_id AS doc_b, COUNT(*) AS c
          FROM sh s1 JOIN sh s2 ON s1.s = s2.s AND s1.doc_id < s2.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b,
       ROUND(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE ROUND(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b, jaccard""",
    "ann_cosine_topk": _ann_sql(),
    # probe-all through the persisted index ≡ exact brute force — the
    # same SQL twin checks the whole build/append/serve lifecycle
    "ann_ivf_state": _ann_sql(),
    # probe-all after the partition-local repair == exact brute force
    # over the corrected corpus (corrections stated in the SQL itself)
    "ann_ivf_repair": _ann_repair_sql(),
    "emb_neardup_pairs": _neardup_sql(),
    "mm_decode_stub": """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       md5(text) AS feature,
       CAST(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width
FROM documents ORDER BY media_id""",
    "normalize_docs": _normalize_sql(),
    "text_chunks": _chunks_sql(),
    "chunk_embed": _chunk_embed_sql(),
    # dedup_minhash_lsh / dedup_simhash / ann_lsh_topk / ann_ivf_topk:
    # banded-hash or centroid-based — no SQL oracle (driver rows-only
    # check; recall/exactness pinned in tests).
}

# The containment invariant's oracle: the verified-pairs ⊆ exact-pairs
# claim means the Spark side must produce ZERO rows — expressed as the
# exact-pair query itself under an always-false predicate, so the
# column names AND types the hash compare needs come from the same SQL
# the exact set uses (never hand-declared).
EXTRA_ORACLE["dedup_minhash_contained"] = f"""
SELECT doc_a, doc_b, jaccard
FROM ({EXTRA_ORACLE["dedup_ngram_jaccard"]}) t
WHERE doc_a IS NULL
ORDER BY doc_a, doc_b, jaccard"""

# Incremental-form oracles: the full-pair SQL restricted to pairs
# touching the delta (id % DELTA_MOD == 0) — stating the operator
# contract (delta ≡ restricted self-join) in the oracle itself.
EXTRA_ORACLE["dedup_ngram_delta"] = f"""
SELECT doc_a, doc_b, jaccard
FROM ({EXTRA_ORACLE["dedup_ngram_jaccard"]}) t
WHERE doc_a % {DELTA_MOD} = 0 OR doc_b % {DELTA_MOD} = 0
ORDER BY doc_a, doc_b, jaccard"""

EXTRA_ORACLE["emb_neardup_delta"] = f"""
SELECT a_id, b_id, cos
FROM ({_neardup_sql()}) t
WHERE a_id % {DELTA_MOD} = 0 OR b_id % {DELTA_MOD} = 0
ORDER BY a_id, b_id, cos"""

# Cluster-resolution oracles: the transitive closure of the SAME exact
# pair SQL, as a recursive CTE (reach = every node reachable from
# ``node``; cluster_id = MIN(reach) — the star contraction's fixpoint
# stated declaratively). Tractable at oracle scale; the Spark side is
# the O(log n)-round distributed algorithm.
_CC_CLOSURE = f"""
pr AS ({EXTRA_ORACLE["dedup_ngram_jaccard"]}),
e AS (SELECT doc_a AS u, doc_b AS v FROM pr
      UNION SELECT doc_b, doc_a FROM pr),
r(node, reach) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e) t
  UNION
  SELECT r.node, e.v FROM r JOIN e ON r.reach = e.u
),
cl AS (SELECT node, MIN(reach) AS cluster_id FROM r GROUP BY node)"""

EXTRA_ORACLE["dedup_clusters"] = f"""
WITH RECURSIVE {_CC_CLOSURE}
SELECT node, cluster_id FROM cl ORDER BY node, cluster_id"""

EXTRA_ORACLE["dedup_canonical"] = f"""
WITH RECURSIVE {_CC_CLOSURE}
SELECT d.doc_id,
       COALESCE(cl.cluster_id, d.doc_id) AS cluster_id,
       COALESCE(cl.cluster_id, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN cl ON cl.node = d.doc_id
ORDER BY doc_id, cluster_id, keep"""

# the incremental fold must land on exactly the from-scratch answer:
# same closure oracle as dedup_clusters
EXTRA_ORACLE["dedup_cluster_incr"] = EXTRA_ORACLE["dedup_clusters"]
