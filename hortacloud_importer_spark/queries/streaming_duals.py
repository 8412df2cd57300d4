"""§2.I — streaming operators, batch duals.

The reference's KTX writer is a genuine single-pass bounded-state
stream over z-slices (ktx_from_rendered_tiff.py:323-391). These are
the oracle-checkable batch duals of the Structured Streaming surface
(the streaming wrappers themselves live in
hortacloud_importer_spark.streaming and are rows-only/e2e-tested —
DuckDB can't run a stream).

Window alignment note: Spark's window() aligns tumbling/sliding
windows to the 1970 epoch; the DuckDB mirrors reproduce that with
integer epoch-microsecond arithmetic, so boundaries match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hortacloud_importer_spark.catalog import table
from hortacloud_importer_spark.operators.exactness import cents
from hortacloud_importer_spark.registry import register

_SUM_CENTS = "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0"


@register(
    "stream_tumbling",
    "I3",
    driver=False,
    oracle=f"""
SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
       COUNT(*) AS n, {_SUM_CENTS} AS sum_value
FROM events GROUP BY 1
""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window (I3): pairs of parent z-slices reduce to one
    child slice (ktx_from_rendered_tiff.py:269-296) ≡ tumbling
    count/time windows. Batch dual of readStream + window(ts, '1 hour');
    map-side partial aggregation applies as usual."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents("value")) / F.lit(100.0)).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@register(
    "stream_sliding",
    "I4",
    driver=False,
    oracle=f"""
SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000 - CAST(k AS BIGINT) * 900000000) AS window_start,
       COUNT(*) AS n, {_SUM_CENTS} AS sum_value
FROM events, UNNEST([0, 1, 2, 3]) AS t(k)
GROUP BY 1
""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (I4): window(ts, '1 hour', '15 min') — each event
    lands in 4 overlapping windows. The DuckDB mirror expands the 4
    aligned starts per event explicitly."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents("value")) / F.lit(100.0)).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@register(
    "stream_session",
    "I4",
    driver=False,
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n, {_SUM_CENTS} AS sum_value
FROM sessions GROUP BY user_id, session_id
""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (I4): session_window(ts, '30 minutes') per user —
    Spark merges events with gaps < 30 min. The DuckDB mirror is the
    classic gaps-and-islands SQL. Output = (user, session start, count,
    sum); the session end is engine-defined (last+gap) so it's not
    compared."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents("value")) / F.lit(100.0)).alias("sum_value"),
        )
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n", "sum_value"
        )
    )


@register(
    "stream_resume",
    "I5",
    oracle="""
SELECT e.user_id, COUNT(*) AS n_pending
FROM events e
WHERE e.event_id NOT IN (SELECT event_id FROM events WHERE event_type = 'purchase')
GROUP BY 1
""",
)
def stream_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental progress / resume (I5): the do_step1 marker +
    dummy_generated sentinel resume (tiff2octree.py:1328-1355) — the
    batch dual is an anti-join of the work list against completed
    work; in streaming this is checkpoint + idempotent foreachBatch."""
    e = table(spark, sf_dir, "events")
    done = e.filter(F.col("event_type") == "purchase").select("event_id")
    return (
        e.join(done, "event_id", "left_anti")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_pending"))
    )


@register(
    "stream_windows",
    "I3+I4",
    oracle=f"""
SELECT 'tumbling' AS facet,
       make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
       CAST(NULL AS BIGINT) AS user_id, COUNT(*) AS n, {_SUM_CENTS} AS sum_value
FROM events GROUP BY 2
UNION ALL
SELECT 'sliding' AS facet,
       make_timestamp((epoch_us(ts) // 900000000) * 900000000 - CAST(k AS BIGINT) * 900000000)
         AS window_start,
       CAST(NULL AS BIGINT) AS user_id, COUNT(*) AS n, {_SUM_CENTS} AS sum_value
FROM events, UNNEST([0, 1, 2, 3]) AS t(k)
GROUP BY 2
UNION ALL
SELECT 'session' AS facet, session_start AS window_start, user_id, n, sum_value
FROM (
  WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
    FROM events
  ),
  sessions AS (
    SELECT user_id, ts, value,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
  )
  SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n, {_SUM_CENTS} AS sum_value
  FROM sessions GROUP BY user_id, session_id
)
""",
)
def stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated I3+I4 driver query, union-with-tag: the batch
    duals of the three streaming window shapes — `tumbling` =
    window(ts, 1h), `sliding` = window(ts, 1h, 15m) (each event in 4
    overlapping windows), `session` = session_window(ts, 30m) per user
    (gaps-and-islands in the DuckDB mirror). The live readStream forms
    of the same aggregations are exercised in tests/test_streaming.py;
    the standalone duals stay registered driver=False."""
    e = table(spark, sf_dir, "events")
    nb = F.lit(None).cast("bigint")
    money = (F.sum(cents("value")) / F.lit(100.0)).alias("sum_value")
    tumbling = (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), money)
        .select(
            F.lit("tumbling").alias("facet"),
            F.col("w.start").alias("window_start"),
            nb.alias("user_id"), "n", "sum_value",
        )
    )
    sliding = (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"), money)
        .select(
            F.lit("sliding").alias("facet"),
            F.col("w.start").alias("window_start"),
            nb.alias("user_id"), "n", "sum_value",
        )
    )
    session = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), money)
        .select(
            F.lit("session").alias("facet"),
            F.col("w.start").alias("window_start"),
            F.col("user_id"), "n", "sum_value",
        )
    )
    return tumbling.unionByName(sliding).unionByName(session)


_DEDUP_W = 60000  # watermark horizon, seconds (ts granularity below)

_STREAM_DEDUP_ORACLE = f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
  WHERE doc_id % 5 = 0
  UNION ALL
  -- a near-in-time repeat (+500 s, inside the watermark horizon):
  -- these must SUPPRESS, unlike the +100000 s re-crawls
  SELECT doc_id + 500 AS doc_id, text FROM documents
  WHERE doc_id % 7 = 0 AND doc_id % 5 <> 0
),
ev AS (
  SELECT MD5(text) AS fp, CAST(doc_id AS BIGINT) AS ts FROM corpus
),
keys AS (
  SELECT fp, list_sort(list(ts)) AS tss FROM ev GROUP BY fp
),
walk AS (
  SELECT fp, tss, 1 AS idx, tss[1] AS last_emit, 1 AS n_emit
  FROM keys
  UNION ALL
  SELECT fp, tss, idx + 1,
         CASE WHEN tss[idx + 1] > last_emit + {_DEDUP_W}
              THEN tss[idx + 1] ELSE last_emit END,
         n_emit + CASE WHEN tss[idx + 1] > last_emit + {_DEDUP_W}
                       THEN 1 ELSE 0 END
  FROM walk WHERE idx < len(tss)
)
SELECT fp,
       CAST(len(tss) AS BIGINT) AS n_records,
       CAST(n_emit AS BIGINT) AS n_emitted,
       tss[1] AS first_ts,
       last_emit AS last_emitted_ts
FROM walk WHERE idx = len(tss)
"""


@register("stream_dedup", "I5+K1", oracle=_STREAM_DEDUP_ORACLE,
          driver=False)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch dual of dropDuplicatesWithinWatermark (the
    streaming_dedup wrapper in streaming/windows.py): per content
    fingerprint, the FIRST record emits and stores state; later
    records are dropped while the stored record is within the
    watermark horizon W and RE-EMIT once it expires (duplicates do
    NOT refresh the state — Spark keeps the emitted record's
    timestamp). The re-crawl corpus makes both behaviors observable:
    near-in-time repeats suppress, the +100000-second re-crawls fall
    past W and re-emit.

    The emission chain is sequential PER KEY but keys are
    independent, so it distributes as one groupBy(fp) plus a bounded
    in-row fold (higher-order aggregate over the per-key timestamp
    array — per-key state is duplicate-count-bounded, the same
    argument as Spark's own dedup state store). The oracle replays
    the identical chain with a recursive CTE."""
    corpus = table(spark, sf_dir, "documents").select("doc_id", "text")
    recrawl = corpus.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near = corpus.filter(
        (F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 5 != 0)
    ).select((F.col("doc_id") + 500).alias("doc_id"), "text")
    ev = (
        corpus.unionByName(recrawl)
        .unionByName(near)
        .select(
            F.md5("text").alias("fp"),
            F.col("doc_id").cast("bigint").alias("ts"),
        )
    )
    per_key = ev.groupBy("fp").agg(
        F.array_sort(F.collect_list("ts")).alias("tss")
    )
    emitted = F.aggregate(
        "tss",
        F.expr("CAST(array() AS array<bigint>)"),
        lambda acc, t: F.when(
            (F.size(acc) == 0)
            | (t > F.element_at(acc, -1) + F.lit(_DEDUP_W)),
            F.concat(acc, F.array(t)),
        ).otherwise(acc),
    )
    return per_key.select(
        "fp",
        F.size("tss").cast("bigint").alias("n_records"),
        F.size(emitted).cast("bigint").alias("n_emitted"),
        F.element_at("tss", 1).alias("first_ts"),
        F.element_at(emitted, -1).alias("last_emitted_ts"),
    )
