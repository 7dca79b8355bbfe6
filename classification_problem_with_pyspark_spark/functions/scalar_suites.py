"""Scalar function suites (SURVEY.md §2.8): string/date/math/array/JSON.

All expressions are JVM-side built-ins (whole-stage codegen) — zero Python
in the row path (SURVEY.md §7.6). Each suite doubles as a dialect map:
the oracle SQL documents the exact DuckDB equivalent of every Spark
function used, including the traps (Spark dayofweek is 1=Sunday vs DuckDB
0=Sunday; Spark log() is natural log = DuckDB ln; Spark split() takes a
regex; DuckDB lists are 1-indexed like element_at).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load


@register(
    "scalar_string_suite",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS segment_lower,
           LENGTH(c_name) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CONCAT_WS('|', c_mktsegment, c_name) AS tagged,
           TRIM(CONCAT(' ', c_name, ' ')) AS trimmed,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits,
           REPLACE(c_name, 'Customer', 'Cust') AS renamed
    FROM customer
    """,
)
def scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions over customer names (SURVEY.md §2.8 'R')."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("renamed"),
    )


@register(
    "scalar_datetime_suite",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           -- DuckDB dayofweek: 0=Sunday; Spark: 1=Sunday → +1 here
           dayofweek(o_orderdate) + 1 AS order_dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def scalar_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions — the reference's dates→features step."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_95"
        ),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "scalar_math_suite",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           ROUND(sqrt(l_extendedprice), 6) AS price_sqrt,
           ROUND(ln(l_extendedprice), 6) AS price_ln,        -- Spark log() = ln
           ROUND(log10(l_extendedprice), 6) AS price_log10,
           ROUND(pow(l_discount, 2), 6) AS disc_sq,
           abs(l_quantity - 25) AS qty_dev,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7
    FROM lineitem
    """,
)
def scalar_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions over lineitem measures (SURVEY.md §2.8)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
    )


@register(
    "scalar_array_suite",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4)
               AS vec_sum,
           ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'max'), 6)
               AS vec_max,
           len(list_filter(embedding, x -> x > 0)) AS positive_cnt
    FROM embeddings
    """,
)
def scalar_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the 64-d embedding column (SURVEY.md §2.8 'N').

    Sums run in DOUBLE on both engines (list_transform cast ↔ Spark
    transform cast) — float32 accumulation would diverge past round(·,4).
    """
    e = load(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.round(F.array_max(as_double), 6).alias("vec_max"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("positive_cnt"),
    )


@register(
    "scalar_json_suite",
    oracle="""
    SELECT event_id,
           event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
                THEN 'high' ELSE 'low' END AS k_bucket
    FROM events
    """,
)
def scalar_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column.

    get_json_object ↔ json_extract_string; both return NULL on missing
    keys. At scale prefer from_json with an explicit schema once per
    column over repeated path extraction.
    """
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        "event_type",
        k.alias("k_val"),
        F.when(k >= 50, "high").otherwise("low").alias("k_bucket"),
    )


@register(
    "scalar_map_suite",
    oracle="""
    SELECT event_id,
           'k,type' AS sorted_keys_csv,
           event_type AS type_val,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           2 AS map_size
    FROM events
    """,
)
def scalar_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions (SURVEY.md §2.8): build a map column from parsed
    event props, then take it apart again — create_map, map_keys,
    element_at, size. Outputs are flattened to scalars because a MapType
    column itself has no cross-engine canonical serialization to hash;
    the DuckDB oracle derives the identical outputs from the map's known
    construction (map semantics themselves are Spark-side tested).
    """
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int").cast("string")
    m = F.create_map(F.lit("type"), F.col("event_type"), F.lit("k"), k)
    return e.select(
        "event_id",
        F.concat_ws(",", F.sort_array(F.map_keys(m))).alias("sorted_keys_csv"),
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "k").cast("int").alias("k_val"),
        F.size(m).alias("map_size"),
    )


@register(
    "scalar_hash_bitwise_suite",
    oracle="""
    SELECT event_id,
           md5(event_type) AS md5_hex,
           sha256(event_type) AS sha256_hex,
           event_id & 255 AS low_byte,
           event_id % 16 AS shard,
           CAST(event_id // 4 AS BIGINT) AS rshift2,
           event_id * 4 AS lshift2
    FROM events
    """,
)
def scalar_hash_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable hash + bitwise functions (SURVEY.md §2.8): md5/sha256 hex
    digests (identical across engines, unlike Spark-private murmur3
    `F.hash` / xxhash64 — the same portability rule the SimHash and
    fingerprint operators rely on) and bit arithmetic for sharding.
    Shifts are expressed as */ by powers of two: DuckDB 1.0 has no native
    shift operator, and on non-negative ids the forms are identical.
    """
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.md5("event_type").alias("md5_hex"),
        F.sha2("event_type", 256).alias("sha256_hex"),
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        (F.col("event_id") % 16).alias("shard"),
        F.floor(F.col("event_id") / 4).cast("long").alias("rshift2"),
        (F.col("event_id") * 4).alias("lshift2"),
    )


@register(
    "scalar_datetime_suite2",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS order_doy,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS order_week_iso,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d')
               AS plus_3_months,
           strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS days_since_1995
    FROM orders
    """,
)
def scalar_datetime_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second datetime family (SURVEY.md §2.8): quarter, day-of-year, ISO
    week, month-end, month arithmetic (add_months clamps to month end on
    both engines — Jan 31 + 3 → Apr 30), ISO-Monday week truncation, and
    day deltas. All calendar integer logic — exactly portable, no
    rounding anywhere.
    """
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofyear("o_orderdate").alias("order_doy"),
        F.weekofyear("o_orderdate").alias("order_week_iso"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias(
            "plus_3_months"
        ),
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias(
            "week_start"
        ),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_1995"
        ),
    )


@register(
    "scalar_regex_extract_suite",
    oracle=r"""
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER)
               AS brand_num,
           regexp_extract(p_type, '^(\w+)', 1) AS type_first_word,
           len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
           length(regexp_replace(p_name, '[^ ]', '', 'g')) + 1 AS n_words
    FROM part
    """,
)
def scalar_regex_extract_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex EXTRACTION family (§2.8 — count/replace are covered by
    llm_pii_scrub; this adds group capture and match enumeration):
    capture-group extraction with a typed cast, anchored first-word
    capture, match counting via regexp_extract_all (Spark) vs
    len(regexp_extract_all) (DuckDB), and the strip-and-measure word
    count idiom. All codegen'd JVM string ops — no shuffle.
    """
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_first_word"),
        # idx=0 — the whole match; the default idx=1 requires a capture group
        F.size(F.regexp_extract_all("p_name", F.lit(r"[aeiou]"), 0)).alias("n_vowels"),
        (F.length(F.regexp_replace("p_name", r"[^ ]", "")) + 1).alias("n_words"),
    )


@register(
    "scalar_inet_suite",
    oracle="""
    WITH ips AS (
        SELECT event_id,
               '10.' || CAST(user_id % 256 AS VARCHAR) || '.'
                     || CAST(event_id % 256 AS VARCHAR) || '.'
                     || CAST((event_id // 256) % 256 AS VARCHAR) AS ip
        FROM events
    ), parts AS (
        SELECT event_id, ip,
               CAST(string_split(ip, '.')[1] AS BIGINT) AS o1,
               CAST(string_split(ip, '.')[2] AS BIGINT) AS o2,
               CAST(string_split(ip, '.')[3] AS BIGINT) AS o3,
               CAST(string_split(ip, '.')[4] AS BIGINT) AS o4
        FROM ips
    )
    SELECT event_id, ip,
           o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS ip_int,
           CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
               || CAST(o3 AS VARCHAR) || '.0/24' AS subnet_24,
           (o1 = 10) OR (o1 = 172 AND o2 >= 16 AND o2 <= 31)
               OR (o1 = 192 AND o2 = 168) AS is_private
    FROM parts
    """,
)
def scalar_inet_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 utility family (log-enrichment staple; Spark ships no inet
    builtins so every pipeline hand-rolls exactly this): dotted-quad →
    uint32 via octet arithmetic, /24 subnet truncation, RFC-1918
    private-range classification. IPs are synthesized deterministically
    from event/user ids (same in-query fixture pattern as llm_pii_scrub);
    the oracle re-derives every transform, so the hash pins the octet
    math — split indexing is 1-based on both engines.

    Shape: pure scan-side string/int expressions, no shuffle.
    """
    e = load(spark, sf_dir, "events")
    ips = e.select(
        "event_id",
        F.concat(
            F.lit("10."),
            (F.col("user_id") % 256).cast("string"),
            F.lit("."),
            (F.col("event_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("event_id") / 256).cast("long") % 256).cast("string"),
        ).alias("ip"),
    )
    sp = F.split("ip", r"\.")
    parts = ips.select(
        "event_id",
        "ip",
        F.element_at(sp, 1).cast("long").alias("o1"),
        F.element_at(sp, 2).cast("long").alias("o2"),
        F.element_at(sp, 3).cast("long").alias("o3"),
        F.element_at(sp, 4).cast("long").alias("o4"),
    )
    return parts.select(
        "event_id",
        "ip",
        (
            F.col("o1") * 16777216 + F.col("o2") * 65536 + F.col("o3") * 256 + F.col("o4")
        ).alias("ip_int"),
        F.concat(
            F.col("o1").cast("string"),
            F.lit("."),
            F.col("o2").cast("string"),
            F.lit("."),
            F.col("o3").cast("string"),
            F.lit(".0/24"),
        ).alias("subnet_24"),
        (
            (F.col("o1") == 10)
            | ((F.col("o1") == 172) & (F.col("o2") >= 16) & (F.col("o2") <= 31))
            | ((F.col("o1") == 192) & (F.col("o2") == 168))
        ).alias("is_private"),
    )
