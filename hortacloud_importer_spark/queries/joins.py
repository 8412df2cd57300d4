"""§2.C — joins.

The reference never calls a relational join, but three of its dataflow
patterns are joins: channel interleave = coordinate equi-join
(ktx/util.py:242-262), root-metadata application = broadcast join
(ktx_from_rendered_tiff.py:37-58), and the resume mechanism = left
anti join (tiff2octree.py:359-368). Declared here as such, plus the
standard surface. Join-strategy notes for 100 TB are in each
docstring; small dimensions are broadcast explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hortacloud_importer_spark.catalog import table
from hortacloud_importer_spark.operators.exactness import sum_money, sum_money_sql
from hortacloud_importer_spark.registry import register


@register(
    "join_inner",
    "C1",
    oracle=f"""
SELECT c_mktsegment, COUNT(*) AS n, {sum_money_sql("l_extendedprice", "revenue")}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY 1
""",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-way equi-join (C1): channel interleave aligns same-shaped
    arrays on coordinates (ktx/util.py:242-262) ≡ inner equi-join on
    keys. lineitem⋈orders shuffles on orderkey (both large at scale:
    sort-merge, AQE may pick shuffled-hash); customer is small relative
    to facts and Catalyst broadcast-joins it under the threshold."""
    li, o, c = (table(spark, sf_dir, t) for t in ("lineitem", "orders", "customer"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), sum_money("l_extendedprice", "revenue"))
    )


@register(
    "join_grouped",
    "C2",
    oracle="""
WITH parent AS (
  SELECT l_orderkey AS pk, CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
  FROM lineitem GROUP BY 1
)
SELECT l_orderkey, l_linenumber,
       (CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 1000) // total_cents AS share_permille
FROM lineitem JOIN parent ON l_orderkey = pk
""",
)
def join_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-child placement (C2): children join their parent's
    aggregate (8 child blocks → 1 parent cube, tiff2octree.py:227-235,
    407-431). Child rows re-join the per-group aggregate on the same
    key the aggregate was computed on — so the shuffle partitioning is
    reused, no second exchange of the fact side. Integer permille
    keeps the oracle exact."""
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    parent = li.groupBy(F.col("l_orderkey").alias("pk")).agg(
        F.sum(cents).alias("total_cents")
    )
    child = li.select("l_orderkey", "l_linenumber", cents.alias("_c"))
    return (
        child.join(parent, child.l_orderkey == parent.pk)
        .select(
            "l_orderkey",
            "l_linenumber",
            # integer DIV on both sides — double division then cast
            # could round across the floor boundary
            F.expr("(_c * 1000) DIV total_cents").alias("share_permille"),
        )
    )


@register(
    "join_broadcast",
    "C3",
    oracle="""
SELECT r_name, COUNT(*) AS n_nations, MIN(n_name) AS first_nation
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata broadcast (C3): transform.txt read once and applied to
    every block (ktx_from_rendered_tiff.py:37-58) ≡ broadcast(dim) —
    explicit broadcast() hint, no shuffle of the big side."""
    n, r = table(spark, sf_dir, "nation"), table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_nations"), F.min("n_name").alias("first_nation"))
    )


@register(
    "join_anti",
    "C4",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resume anti-join (C4): skip work whose output already exists
    (check_block, tiff2octree.py:359-368) ≡ work-list LEFT ANTI
    committed-outputs. The existing-side is keys-only, so at scale it
    broadcast-anti-joins when small, shuffles otherwise."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return c.join(
        o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_outer",
    "C5",
    driver=False,
    oracle="""
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY 1
""",
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (C5): null-extended non-matches; count(col)
    ignores the nulls so empty customers report 0."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi",
    "C5",
    driver=False,
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (C5): existence check without multiplying rows."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return c.join(
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey"),
        c.c_custkey == F.col("o_custkey"),
        "left_semi",
    ).select("c_custkey", "c_mktsegment")


@register(
    "join_full",
    "C5",
    driver=False,
    oracle="""
WITH a AS (SELECT l_returnflag AS flag, COUNT(*) AS n_f FROM lineitem WHERE l_linestatus='F' GROUP BY 1),
     b AS (SELECT l_returnflag AS flag, COUNT(*) AS n_o FROM lineitem WHERE l_linestatus='O' GROUP BY 1)
SELECT COALESCE(a.flag, b.flag) AS flag, a.n_f, b.n_o
FROM a FULL OUTER JOIN b ON a.flag = b.flag
""",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (C5) of two aggregate sides."""
    li = table(spark, sf_dir, "lineitem")
    a = (
        li.filter(F.col("l_linestatus") == "F")
        .groupBy(F.col("l_returnflag").alias("flag_a"))
        .agg(F.count("*").alias("n_f"))
    )
    b = (
        li.filter(F.col("l_linestatus") == "O")
        .groupBy(F.col("l_returnflag").alias("flag_b"))
        .agg(F.count("*").alias("n_o"))
    )
    return a.join(b, a.flag_a == b.flag_b, "full").select(
        F.coalesce("flag_a", "flag_b").alias("flag"), "n_f", "n_o"
    )


@register(
    "join_asof",
    "C6",
    driver=False,
    oracle="""
SELECT event_id, user_id, o_orderkey AS last_order
FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
WHERE rn = 1
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (C6): for each event, the latest order of that user
    at event time. Equi-join on the key + per-event top-1 window — the
    scalable as-of pattern (the range condition prunes inside the
    equi-join's hash bucket; no cross product)."""
    e, o = table(spark, sf_dir, "events"), table(spark, sf_dir, "orders")
    j = e.join(
        o, (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts), "inner"
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        j.select("event_id", "user_id", "o_orderkey", "o_orderdate")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", F.col("o_orderkey").alias("last_order"))
    )


@register(
    "join_range",
    "C6",
    driver=False,
    oracle="""
SELECT a.event_id, COUNT(b.event_id) AS n_following
FROM events a
JOIN events b
  ON b.user_id = a.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 1 HOUR
WHERE a.event_type = 'error'
GROUP BY 1
""",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join (C6): windowed region reads (A4) generalized
    to value ranges — for each error event, the same user's events in
    the following hour. Keyed equi-join carries the range as a residual
    predicate, so it stays a hash/sort-merge join, not a BNLJ; skewed
    users are AQE's skew-join problem, not a plan change."""
    e = table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("a_id"), F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts")
    )
    b = e.select(
        F.col("event_id").alias("b_id"), F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    cond = (
        (b.b_user == a.a_user)
        & (b.b_ts > a.a_ts)
        & (b.b_ts <= a.a_ts + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        a.join(b, cond, "inner")
        .groupBy(F.col("a_id").alias("event_id"))
        .agg(F.count("b_id").alias("n_following"))
    )


_NULL_B = "CAST(NULL AS BIGINT)"
_NULL_S = "CAST(NULL AS VARCHAR)"


@register(
    "join_suite",
    "C5+C6",
    oracle=f"""
SELECT 'outer' AS facet, c_custkey AS k, COUNT(o_orderkey) AS v, {_NULL_B} AS v2, {_NULL_S} AS s
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY 2
UNION ALL
SELECT 'semi' AS facet, c_custkey AS k, {_NULL_B} AS v, {_NULL_B} AS v2, c_mktsegment AS s
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT 'full' AS facet, {_NULL_B} AS k, a.n_f AS v, b.n_o AS v2,
       COALESCE(a.flag, b.flag) AS s
FROM (SELECT l_returnflag AS flag, COUNT(*) AS n_f FROM lineitem WHERE l_linestatus='F' GROUP BY 1) a
FULL OUTER JOIN (SELECT l_returnflag AS flag, COUNT(*) AS n_o FROM lineitem WHERE l_linestatus='O' GROUP BY 1) b
  ON a.flag = b.flag
UNION ALL
SELECT 'asof' AS facet, event_id AS k, user_id AS v, o_orderkey AS v2, {_NULL_S} AS s
FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) WHERE rn = 1
UNION ALL
SELECT 'range' AS facet, a.event_id AS k, COUNT(b.event_id) AS v, {_NULL_B} AS v2, {_NULL_S} AS s
FROM events a
JOIN events b
  ON b.user_id = a.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
WHERE a.event_type = 'error'
GROUP BY 2
""",
)
def join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated C5+C6 driver query, union-with-tag: `outer` =
    left-outer counts, `semi` = existence semi-join, `full` = full
    outer of two aggregate sides, `asof` = per-event latest-order
    as-of join, `range` = interval self-join. Each facet is the same
    plan as its standalone variant (kept registered driver=False);
    the union pads to one scalar schema (facet, k, v, v2, s) so the
    external canonicalizer can hash it. Facets are independent
    subtrees, so Spark schedules their stages concurrently."""
    nb = F.lit(None).cast("bigint")
    ns = F.lit(None).cast("string")
    outer = join_outer(spark, sf_dir).select(
        F.lit("outer").alias("facet"),
        F.col("c_custkey").alias("k"),
        F.col("n_orders").alias("v"),
        nb.alias("v2"),
        ns.alias("s"),
    )
    semi = join_semi(spark, sf_dir).select(
        F.lit("semi").alias("facet"),
        F.col("c_custkey").alias("k"),
        nb.alias("v"),
        nb.alias("v2"),
        F.col("c_mktsegment").alias("s"),
    )
    full = join_full(spark, sf_dir).select(
        F.lit("full").alias("facet"),
        nb.alias("k"),
        F.col("n_f").alias("v"),
        F.col("n_o").alias("v2"),
        F.col("flag").alias("s"),
    )
    asof = join_asof(spark, sf_dir).select(
        F.lit("asof").alias("facet"),
        F.col("event_id").alias("k"),
        F.col("user_id").alias("v"),
        F.col("last_order").alias("v2"),
        ns.alias("s"),
    )
    rng = join_range(spark, sf_dir).select(
        F.lit("range").alias("facet"),
        F.col("event_id").alias("k"),
        F.col("n_following").alias("v"),
        nb.alias("v2"),
        ns.alias("s"),
    )
    out = outer
    for part in (semi, full, asof, rng):
        out = out.unionByName(part)
    return out
