"""Skew-resistant two-stage (salted) aggregation (SURVEY.md §2.K/§4).

At 100 TB a handful of hot keys (empty-region octants, stop-words,
crawl-duplicate hosts) can put one reducer partition hours behind the
rest. AQE's skew-join splitting covers joins; for AGGREGATIONS with
non-algebraic state (collect_list-style) the standard fix is salting:

  stage 1: groupBy(key, salt) — hot keys fan out over N partitions
  stage 2: groupBy(key) merging the partials

For algebraic aggregates (sum/count/min/max/avg) Spark's partial
aggregation already does this implicitly — use salting only when the
merge state is itself large or the aggregate is position-sensitive.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Callable[[], Sequence[Column]],
    merge_aggs: Callable[[], Sequence[Column]],
    n_salts: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-stage aggregation with a deterministic salt.

    ``salt_source`` (a column; defaults to a stable hash of all
    non-key columns is not possible generically, so pass one) buckets
    rows of the same key into ``n_salts`` sub-groups; ``partial_aggs``
    aggregates within (key, salt) and ``merge_aggs`` combines the
    partials per key. Determinism: the salt is a hash, not rand(), so
    retried tasks produce identical partials (exactly-once semantics
    under task retry — rand() would break that).
    """
    if salt_source is None:
        raise ValueError("pass salt_source: a column to derive the salt from")
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    salt = F.pmod(F.xxhash64(src), F.lit(n_salts)).alias("_salt")
    stage1 = df.groupBy(*keys, salt).agg(*partial_aggs())
    return stage1.groupBy(*keys).agg(*merge_aggs())


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """Salted sum/count/avg — the workhorse shape. Output columns:
    total, n, mean."""
    return salted_agg(
        df,
        keys,
        lambda: [
            F.sum(value).alias("_s"),
            F.count(value).alias("_c"),
        ],
        lambda: [
            F.sum("_s").alias("total"),
            F.sum("_c").alias("n"),
            (F.sum("_s") / F.sum("_c")).alias("mean"),
        ],
        n_salts,
        salt_source=value,
    )
