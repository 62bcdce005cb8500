"""Entity-id dictionary with hot-key detection (J8 + north_rule skew handling).

The reference enumerates asin/relation ids driver-side
(``/root/reference/src/recommendation/preprocess.py:101-127``).  At 10^12-doc
scale the dictionary build is itself a skewed aggregation: Zipf-hot head
entities dominate.  This module provides:

* :func:`build_dictionary` — deterministic contiguous ids via
  ``distinct -> row_number over (order by key)`` (exact, reproducible);
* :func:`detect_hot_keys` — first-pass frequency sketch that returns the keys
  above a frequency threshold, to be **broadcast** so downstream joins against
  the dictionary hit the broadcast map for the heavy hitters and the shuffled
  dictionary only for the long tail;
* :func:`salted_count` — salted two-phase counting, the groupBy-skew primitive
  (AQE splits skewed *join* partitions but not hot-key aggregation fan-in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

N_SALTS = 16


def build_dictionary(df: DataFrame, key_col: str) -> DataFrame:
    """(key) -> (key, id) with deterministic contiguous ids.

    ``row_number`` over a global order needs a single-partition window — fine
    for dictionary-sized outputs (distinct keys), which is the point of a
    dictionary.  For 10^9+ distinct keys use ``zipWithIndex``-style block ids:
    ``monotonically_increasing_id`` after a repartition, trading contiguity."""
    w = Window.orderBy("key")
    return (
        df.select(F.col(key_col).alias("key"))
        .distinct()
        .withColumn("id", F.row_number().over(w) - 1)
    )


def salted_count(df: DataFrame, key_col: str, n_salts: int = N_SALTS) -> DataFrame:
    """count per key with a salted partial phase: hot keys spread over
    ``n_salts`` reducers before the final combine."""
    partial = (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
        )
        .groupBy(key_col, "_salt")
        .agg(F.count("*").alias("_c"))
    )
    return partial.groupBy(key_col).agg(F.sum("_c").cast("long").alias("cnt"))


def detect_hot_keys(
    df: DataFrame, key_col: str, threshold_ratio: float = 0.001, max_keys: int = 10000
) -> DataFrame:
    """Keys whose frequency exceeds ``threshold_ratio`` of the total — the
    broadcast hot-key dictionary (north_rule).  One salted count pass."""
    total = df.count()
    cut = max(2, int(total * threshold_ratio))
    return (
        salted_count(df, key_col)
        .filter(F.col("cnt") >= cut)
        .orderBy(F.desc("cnt"), F.asc(key_col))
        .limit(max_keys)
    )
