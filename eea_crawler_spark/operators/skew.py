"""Skew handling for keyed joins: salting + hot-key detection.

The engine's id-keyed joins (diff join J1, dedup bands, LSH buckets)
hash-partition on the key. At 100 TB a handful of hot keys — one site's
URL prefix, an empty-text fingerprint bucket, a dense LSH band — can
put most of a stage's work on one task. Two mitigations compose here:

  - **AQE skew-join** (on for large inputs, session.py) splits
    oversized *partitions*, which handles moderate skew for free;
  - **salting** handles the degenerate case AQE cannot: one *key*
    bigger than a task. ``salted_join`` spreads each big-side key over
    ``n_salts`` subkeys and replicates the small side ``n_salts``× via
    an explode — the classic replicate-to-balance trade: small-side
    rows × n_salts extra work buys big-side balance. The salt is a
    deterministic hash of the big side's full row (not RNG), so task
    retries and replays land rows identically.

``key_histogram`` is the decision input: measure before salting —
unsalted joins are cheaper when keys are uniform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Per-key row counts with share of total — the skew report used to
    pick ``n_salts`` (a key owning ≫ 1/parallelism of rows is hot)."""
    total = F.sum("cnt").over(W.partitionBy())
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("share", F.round(F.col("cnt") / total, 4))
        .orderBy(F.desc("cnt"), key)
        .limit(top)
    )


def row_salt(df: DataFrame, n_salts: int, exclude: tuple[str, ...] = ()) -> Column:
    """Deterministic salt in [0, n_salts): hash of the full row content
    (minus ``exclude``), so rows of one hot key spread evenly yet land
    identically on retry — never ``rand()``, which replays differently."""
    cols = [F.col(c) for c in df.columns if c not in exclude]
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the big side spread over ``n_salts``
    subkeys. The small side explodes ×n_salts so every (key, salt)
    pair exists; the result equals the plain join row-for-row (pinned
    in tests). Join types: inner and left (big side preserved) — the
    shapes the engine's fact⋈dim and listing⋈state joins use.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    b = big.withColumn("__salt", row_salt(big, n_salts))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")
