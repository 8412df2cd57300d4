"""§2.H — scalar function families (string/math/cast/date/array/map/json/null).

Each query exercises one family end-to-end with a DuckDB mirror.
Reference instances cited per function in SURVEY.md §2.H. libm-risky
functions (pow/exp/ln) are avoided in checked outputs — sqrt is
IEEE-exact, integer bit math is exact (see operators.exactness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hortacloud_importer_spark.catalog import table
from hortacloud_importer_spark.registry import register


@register(
    "str_funcs",
    "H1",
    oracle="""
SELECT p_partkey,
       CONCAT('part/', p_brand, '/', p_name) AS path,
       UPPER(p_brand) AS brand_uc,
       SUBSTRING(p_name, 1, 5) AS prefix,
       LENGTH(p_name) AS name_len,
       TRIM(p_type) AS type_trim,
       REGEXP_EXTRACT(p_type, '([A-Z]+)$', 1) AS type_last,
       ARRAY_TO_STRING(STR_SPLIT(p_type, ' '), '_') AS type_joined
FROM part
""",
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (H1): path building "default.{ch}.tif"
    (tiff2octree.py:303), split on ',' (:865), '/'.join of octree paths
    (ktx_from_rendered_tiff.py:153), regex matches (:471-472)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.lit("part/"), "p_brand", F.lit("/"), "p_name").alias("path"),
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_name", 1, 5).alias("prefix"),
        F.length("p_name").alias("name_len"),
        F.trim("p_type").alias("type_trim"),
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("type_last"),
        F.array_join(F.split("p_type", " "), "_").alias("type_joined"),
    )


# Octant-path digit: 1 + x_bit + 2*y_bit + 4*z_bit (tiff2octree.py:263-279).
_OCT_SQL = """
1 + ((l_partkey // 4) % 2) + 2 * ((l_suppkey // 4) % 2) + 4 * ((l_linenumber // 4) % 2)
"""


_REQUANT_SQL = (
    "CAST(CEIL(SQRT(LEAST(GREATEST((l_extendedprice - 900.0) / (80000.0 - 900.0),"
    " 0.0), 1.0)) * 254) AS BIGINT) + 1"
)


@register(
    "math_funcs",
    "H2+H3",
    oracle=f"""
SELECT {_OCT_SQL} AS octant,
       COUNT(*) AS n,
       CAST(MIN(l_orderkey << 2) AS BIGINT) AS min_shl,
       CAST(MAX(l_orderkey >> 1) AS BIGINT) AS max_shr,
       CAST(SUM(CAST(FLOOR(SQRT(l_orderkey)) AS BIGINT)) AS BIGINT) AS sum_isqrt,
       CAST(SUM(CAST(CEIL(l_quantity / 7.0) AS BIGINT)) AS BIGINT) AS sum_ceil,
       CAST(SUM(l_orderkey % 8) AS BIGINT) AS sum_mod,
       CAST(SUM({_REQUANT_SQL}) AS BIGINT) AS sum_requant
FROM lineitem GROUP BY 1
""",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (H2) + cast/requant expression (H3): THE octree
    octant expression — the reference's space-filling partition key
    (octant = 1 + x_bit + 2*y_bit + 4*z_bit, tiff2octree.py:263-279) —
    plus shifts (:228-233), floor/ceil/sqrt (ktx/util.py:36;
    ktx_from_rendered_tiff.py:199,364), pmod, and the uint16→uint8
    requant cast chain (:350-365) summed per octant (the full per-row
    requant stays registered as `cast_requant`, driver=False)."""
    li = table(spark, sf_dir, "lineitem")
    octant = (
        F.lit(1)
        + (F.col("l_partkey") / 4).cast("bigint") % 2
        + 2 * ((F.col("l_suppkey") / 4).cast("bigint") % 2)
        + 4 * ((F.col("l_linenumber") / 4).cast("bigint") % 2)
    )
    norm = (F.col("l_extendedprice") - F.lit(900.0)) / (F.lit(80000.0) - F.lit(900.0))
    requant = F.ceil(F.sqrt(F.least(F.greatest(norm, F.lit(0.0)), F.lit(1.0))) * 254) + 1
    return li.groupBy(octant.alias("octant")).agg(
        F.count("*").alias("n"),
        F.min(F.shiftleft("l_orderkey", 2)).cast("bigint").alias("min_shl"),
        F.max(F.shiftright("l_orderkey", 1)).cast("bigint").alias("max_shr"),
        F.sum(F.floor(F.sqrt("l_orderkey"))).alias("sum_isqrt"),
        F.sum(F.ceil(F.col("l_quantity") / 7.0)).alias("sum_ceil"),
        F.sum(F.col("l_orderkey") % 8).alias("sum_mod"),
        F.sum(requant).alias("sum_requant"),
    )


@register(
    "cast_requant",
    "H3",
    driver=False,
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CEIL(SQRT(LEAST(GREATEST((l_extendedprice - 900.0) / (80000.0 - 900.0), 0.0), 1.0)) * 254) AS BIGINT) + 1 AS requant
FROM lineitem
""",
)
def cast_requant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast / requantization (H3): the uint16→uint8 intensity requant
    (ktx_from_rendered_tiff.py:350-365): normalize into [0,1] between
    black and white level, gamma 0.5 (sqrt — exact in both engines,
    unlike pow), scale to 254 and shift so 0 stays "no data"."""
    li = table(spark, sf_dir, "lineitem")
    norm = (F.col("l_extendedprice") - F.lit(900.0)) / (F.lit(80000.0) - F.lit(900.0))
    clamped = F.least(F.greatest(norm, F.lit(0.0)), F.lit(1.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.ceil(F.sqrt(clamped) * 254) + 1).alias("requant"),
    )


@register(
    "date_funcs",
    "H4",
    oracle="""
SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
       YEAR(o_orderdate) AS yr,
       COUNT(*) AS n,
       CAST(MAX(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2005-01-01')) AS INT) AS max_days_to_2005
FROM orders GROUP BY 1, 2
""",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (H4): timestamps + durations
    (ktx_from_rendered_tiff.py:229, 559-582)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.year("o_orderdate").alias("yr"),
    ).agg(
        F.count("*").alias("n"),
        F.max(F.datediff(F.lit("2005-01-01").cast("date"), F.col("o_orderdate").cast("date")))
        .cast("int")
        .alias("max_days_to_2005"),
    )


@register(
    "array_funcs",
    "H5",
    oracle="""
SELECT l_orderkey,
       ARRAY_TO_STRING(LIST_SORT(LIST(l_linenumber)), ',') AS line_numbers,
       LEN(LIST(l_linenumber)) AS n_lines,
       LIST_SORT(LIST(l_linenumber))[1] AS first_line,
       LIST_SORT(LIST(l_linenumber))[-1] AS last_line,
       LIST_CONTAINS(LIST(l_linenumber), 3) AS has_line3
FROM lineitem GROUP BY 1
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (H5): blockify/interleave/index array ops
    (tiff2octree.py:220-225; ktx/util.py:242-262, 167-169).
    collect_list order is nondeterministic -> sort_array before any
    positional access, mirroring the reference's numpy.sort. The array
    itself is serialized to a CSV string at the query boundary —
    external canonicalizers sort/hash rows and can't hash list cells;
    the serialization also pins element ORDER, which the raw array
    hash wouldn't."""
    li = table(spark, sf_dir, "lineitem")
    arr = F.sort_array(F.collect_list("l_linenumber"))
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.transform(arr, lambda x: x.cast("string")), ",").alias(
            "line_numbers"
        ),
        F.size(arr).cast("bigint").alias("n_lines"),
        F.element_at(arr, 1).alias("first_line"),
        F.element_at(arr, -1).alias("last_line"),
        F.array_contains(F.collect_list("l_linenumber"), 3).alias("has_line3"),
    )


@register(
    "map_funcs",
    "H6",
    driver=False,
    oracle="""
SELECT n_nationkey,
       CAST(n_regionkey AS VARCHAR) AS region_val,
       CAST(n_nationkey * 2 AS VARCHAR) AS scaled_val
FROM nation
""",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map/KV family (H6): KtxHeader key_value_metadata get/set
    (ktx/__init__.py:141-158) and transform.txt parse ≡ str_to_map
    (tiff2octree.py:842-901). Spark builds the kv string, parses it
    back with str_to_map, and extracts values; the oracle computes the
    same values directly — verifying the round-trip."""
    n = table(spark, sf_dir, "nation")
    kv = F.concat_ws(
        ";",
        F.concat(F.lit("region:"), F.col("n_regionkey").cast("string")),
        F.concat(F.lit("scaled:"), (F.col("n_nationkey") * 2).cast("string")),
    )
    m = F.str_to_map(kv, F.lit(";"), F.lit(":"))
    return n.select(
        "n_nationkey",
        F.element_at(m, "region").alias("region_val"),
        F.element_at(m, "scaled").alias("scaled_val"),
    )


@register(
    "json_funcs",
    "H7",
    driver=False,
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(CAST(props->>'$.k' AS BIGINT)) AS n_k
FROM events GROUP BY 1
""",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (H7): zarr attrs read (tiff2octree.py:694-708) ≡
    get_json_object / from_json over the events.props string."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(k).alias("n_k")
    )


@register(
    "null_funcs",
    "H8",
    oracle="""
SELECT l_returnflag,
       COUNT(COALESCE(NULLIF(l_discount, 0), NULLIF(l_tax, 0))) AS n_either,
       CAST(SUM(CASE WHEN NULLIF(l_discount, 0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_disc,
       MAX(COALESCE(NULLIF(l_discount, 0), -1.0)) AS max_or_sentinel
FROM lineitem GROUP BY 1
""",
)
def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null family (H8): the zero-is-NULL discipline — nullif at the
    boundary, coalesce to fall back (the 2nd-max zero-fix,
    ktx/util.py:170), when/otherwise sentinels (nan_to_num dual)."""
    li = table(spark, sf_dir, "lineitem")
    nz_disc = F.nullif(F.col("l_discount"), F.lit(0))
    nz_tax = F.nullif(F.col("l_tax"), F.lit(0))
    return li.groupBy("l_returnflag").agg(
        F.count(F.coalesce(nz_disc, nz_tax)).alias("n_either"),
        F.sum(F.when(nz_disc.isNull(), 1).otherwise(0)).alias("n_zero_disc"),
        F.max(F.coalesce(nz_disc, F.lit(-1.0))).alias("max_or_sentinel"),
    )


@register(
    "func_nested",
    "H6+H7",
    oracle="""
SELECT 'map' AS facet, CAST(n_nationkey AS VARCHAR) AS k,
       CAST(n_regionkey AS VARCHAR) AS a,
       CAST(n_nationkey * 2 AS VARCHAR) AS b
FROM nation
UNION ALL
SELECT 'json' AS facet, event_type AS k,
       CAST(CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS VARCHAR) AS a,
       CAST(COUNT(CAST(props->>'$.k' AS BIGINT)) AS VARCHAR) AS b
FROM events GROUP BY 2
""",
)
def func_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated nested-data driver query, union-with-tag: `map` =
    KV metadata round-trip via str_to_map/element_at (H6, KtxHeader
    key_value_metadata, ktx/__init__.py:141-158; transform.txt parse,
    tiff2octree.py:842-901); `json` = side-car attribute extraction +
    aggregation via get_json_object (H7, zarr attrs,
    tiff2octree.py:694-708). Facets pad to one all-string scalar
    schema. The standalone variants stay registered driver=False."""
    n = table(spark, sf_dir, "nation")
    kv = F.concat_ws(
        ";",
        F.concat(F.lit("region:"), F.col("n_regionkey").cast("string")),
        F.concat(F.lit("scaled:"), (F.col("n_nationkey") * 2).cast("string")),
    )
    m = F.str_to_map(kv, F.lit(";"), F.lit(":"))
    map_f = n.select(
        F.lit("map").alias("facet"),
        F.col("n_nationkey").cast("string").alias("k"),
        F.element_at(m, "region").alias("a"),
        F.element_at(m, "scaled").alias("b"),
    )
    e = table(spark, sf_dir, "events")
    jk = F.get_json_object("props", "$.k").cast("bigint")
    json_f = e.groupBy(F.col("event_type").alias("k")).agg(
        F.sum(jk).cast("string").alias("a"), F.count(jk).cast("string").alias("b")
    ).select(F.lit("json").alias("facet"), "k", "a", "b")
    return map_f.unionByName(json_f)
