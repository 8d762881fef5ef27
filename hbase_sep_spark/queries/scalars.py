"""§2.8 Scalar functions — string / date / math / conditional / cast.

All JVM-side built-ins inside whole-stage codegen (no Python in the
row path). Engine-portability rules applied throughout (see
.claude/skills/verify/SKILL.md): computed ints cast to the same width
on both sides, no DATE-typed outputs, transcendental results rounded
to kill libm ulp differences, no round() on exact half-boundaries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hbase_sep_spark.functions import arr_str, json_int, json_int_sql
from hbase_sep_spark.functions.portable import (
    ASCII_FOLD_RE,
    ASCII_FOLD_SQL,
    ASCII_LOWER_SQL,
    ASCII_UPPER_SQL,
    ascii_lower,
    ascii_upper,
)
from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register

SECTION = "2.8"


@register(
    "str_basic",
    oracle=f"""
    SELECT c_custkey,
           {ASCII_UPPER_SQL.format("c_name")} AS name_upper,
           {ASCII_LOWER_SQL.format("c_mktsegment")} AS seg_lower,
           CAST(length(c_name) AS INT) AS name_len,
           concat(c_mktsegment, ':', c_name) AS seg_name,
           trim(concat('  ', c_name, ' ')) AS name_trim,
           substring(c_name, 1, 8) AS name_prefix
    FROM customer
    """,
    section=SECTION,
)
def str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string surface. Case folds are the ASCII translate
    forms, not upper()/lower(): full-Unicode case mapping DIVERGES
    between engines (Java full mappings — 'ß'→"SS", 'İ'→"i"+combining
    dot — vs utf8proc simple mappings; round-10 unicode-enum sweep
    caught exactly this on a mutated c_name/c_mktsegment). length/
    substring/trim/concat are codepoint-identical on both engines and
    stay native."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        ascii_upper("c_name").alias("name_upper"),
        ascii_lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("seg_name"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
    )


@register(
    "str_regex",
    oracle="""
    SELECT p_partkey,
           p_type,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_first_word,
           regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_devoweled,
           CASE WHEN regexp_matches(p_type, 'PROMO|ECONOMY') THEN 1 ELSE 0 END AS is_cheap
    FROM part
    """,
    section=SECTION,
)
def str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract/replace/match. Spark regexp_replace is global by
    default; DuckDB needs the 'g' flag — encoded in the oracle."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_type",
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_first_word"),
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("type_devoweled"),
        F.when(F.col("p_type").rlike("PROMO|ECONOMY"), F.lit(1)).otherwise(F.lit(0)).alias("is_cheap"),
    )


@register(
    "str_split_pad",
    oracle="""
    SELECT p_partkey,
           array_to_string(string_split(p_name, ' '), ',') AS name_words,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
           replace(p_brand, 'Brand#', 'B') AS brand_short,
           CAST(instr(p_name, 'o') AS INT) AS first_o
    FROM part
    """,
    section=SECTION,
)
def str_split_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split/lpad/replace/instr. Spark split() is regex-based, DuckDB
    string_split is literal — safe here because the delimiter is a
    plain space."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        arr_str(F.split("p_name", " ")).alias("name_words"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.instr(F.col("p_name"), "o").alias("first_o"),
    )


@register(
    "date_parts",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(month(l_shipdate) AS INT) AS ship_month,
           CAST(day(l_shipdate) AS INT) AS ship_day,
           CAST(dayofweek(l_shipdate) + 1 AS INT) AS ship_dow,
           CAST(quarter(l_shipdate) AS INT) AS ship_quarter,
           CAST(dayofyear(l_shipdate) AS INT) AS ship_doy
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
    section=SECTION,
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction. Spark dayofweek is 1=Sunday..7, DuckDB
    dayofweek is 0=Sunday..6 — the oracle adds 1 to align."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
        F.dayofmonth("l_shipdate").alias("ship_day"),
        F.dayofweek("l_shipdate").alias("ship_dow"),
        F.quarter("l_shipdate").alias("ship_quarter"),
        F.dayofyear("l_shipdate").alias("ship_doy"),
    )


@register(
    "date_trunc_arith",
    oracle="""
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR AS due_date,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
    FROM orders
    WHERE o_orderkey <= 2000
    """,
    section=SECTION,
)
def date_trunc_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / date_add / datediff / last_day. Date-typed results
    emitted as ISO strings (engine-portable); truncated month kept as
    timestamp (both engines agree there)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    odate = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("order_month"),
        F.date_format(F.date_add(odate, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(odate, F.lit("1995-01-01").cast("date")).alias("days_since_epoch_start"),
        F.date_format(F.last_day(odate), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "math_basic",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           abs(CAST(l_discount AS DOUBLE) - CAST(l_tax AS DOUBLE)) AS abs_diff,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           sqrt(CAST(l_quantity AS DOUBLE)) AS qty_sqrt,
           round(pow(CAST(l_quantity AS DOUBLE), 1.5), 6) AS qty_pow,
           round(ln(CAST(l_extendedprice AS DOUBLE)), 6) AS price_ln,
           CAST(sign(CAST(l_discount AS DOUBLE) - 0.05) AS DOUBLE) AS disc_sign,
           greatest(CAST(l_discount AS DOUBLE), CAST(l_tax AS DOUBLE)) AS max_rate,
           least(CAST(l_discount AS DOUBLE), CAST(l_tax AS DOUBLE)) AS min_rate
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
    section=SECTION,
)
def math_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math built-ins. sqrt is IEEE-correctly-rounded (bitwise equal
    across engines, left unrounded); pow/ln are libm-dependent →
    rounded to 6 dp on both sides."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("abs_diff"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.pow("l_quantity", F.lit(1.5)), 6).alias("qty_pow"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@register(
    "cond_case_coalesce",
    oracle="""
    SELECT c_custkey,
           c_acctbal,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END AS bal_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS seg_masked,
           nullif(c_nationkey, 0) AS nation_or_null
    FROM customer
    """,
    section=SECTION,
)
def cond_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("SUPPRESSED")).alias(
            "seg_masked"
        ),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nation_or_null"),
    )


@register(
    "cast_types",
    oracle=f"""
    SELECT event_id,
           CAST({json_int_sql()} AS BIGINT) AS k_int,
           CAST({json_int_sql()} AS DOUBLE) AS k_double,
           CAST(user_id AS VARCHAR) AS user_str,
           TRY_CAST(trunc(value) AS BIGINT) AS value_trunc,
           CAST(value AS VARCHAR) IS NOT NULL AS value_str_ok
    FROM events
    WHERE event_id <= 2000
    """,
    section=SECTION,
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast lattice: json-string→int→double, int→string, double→int.
    DuckDB CAST(double AS INT) rounds while Spark truncates — both
    sides spell out trunc() to pin the semantics. double→string is
    asserted non-null rather than compared (repr differs). The
    double→int leg is TRY_CAST on both sides: a NaN/Inf measure
    otherwise throws CAST_OVERFLOW under ANSI (round-7 non-finite
    sweep) — garbage degrades to NULL, probed equal engine-to-engine
    for NaN, ±Inf, and beyond-int64 finite doubles."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    k = json_int("props")
    return ev.select(
        "event_id",
        k.cast("long").alias("k_int"),
        k.cast("double").alias("k_double"),
        F.col("user_id").cast("string").alias("user_str"),
        F.expr("TRY_CAST(value AS LONG)").alias("value_trunc"),
        F.col("value").cast("string").isNotNull().alias("value_str_ok"),
    )


@register(
    "str_levenshtein",
    oracle="""
    SELECT a.c_custkey AS key_a,
           b.c_custkey AS key_b,
           CAST(levenshtein({a_fold}, {b_fold}) AS INT) AS edit_dist
    FROM (SELECT * FROM customer WHERE c_custkey <= 30) a
    JOIN (SELECT * FROM customer WHERE c_custkey <= 30) b
      ON a.c_custkey < b.c_custkey
    """.format(
        a_fold=ASCII_FOLD_SQL.format("a.c_name"),
        b_fold=ASCII_FOLD_SQL.format("b.c_name"),
    ),
    section=SECTION,
)
def str_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise edit distance on a bounded slice — the string-distance
    primitive fuzzy dedup builds on (bounded pair space, same blocking
    discipline as the dedup operators). Inputs pass through the
    ASCII_FOLD_RE run-collapse first: the engines COUNT edit units
    differently on non-ASCII strings (UTF-16 units vs codepoints —
    round-10 unicode-enum sweep), and the fold is the identity on the
    ASCII corpus while making hostile names measure identically."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 30)
    a, b = c.alias("a"), c.alias("b")
    fold = lambda col: F.regexp_replace(col, ASCII_FOLD_RE, "#")  # noqa: E731
    return a.join(b, F.col("a.c_custkey") < F.col("b.c_custkey")).select(
        F.col("a.c_custkey").alias("key_a"),
        F.col("b.c_custkey").alias("key_b"),
        F.levenshtein(fold(F.col("a.c_name")), fold(F.col("b.c_name"))).alias(
            "edit_dist"
        ),
    )


@register(
    "scalar_try_safe_arith",
    oracle="""
    SELECT event_id,
           CASE WHEN (user_id % 3) <> 0
                THEN value / CAST(user_id % 3 AS DOUBLE) END AS safe_ratio,
           TRY_CAST(CASE WHEN user_id % 2 = 0
                         THEN CAST(user_id AS VARCHAR)
                         ELSE event_type END AS BIGINT) AS maybe_id
    FROM events
    """,
    section=SECTION,
)
def scalar_try_safe_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe arithmetic: Spark 4 runs under ANSI SQL where
    division by zero and bad casts THROW; `try_divide` / `try_cast`
    give NULL instead — the semantics a lossy-input pipeline needs to
    keep one malformed row from killing a 100 TB job. The oracle
    re-expresses both as the equivalent guarded CASE / TRY_CAST."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.try_divide("value", (F.col("user_id") % 3).cast("double")).alias("safe_ratio"),
        F.expr(
            "try_cast(CASE WHEN user_id % 2 = 0 THEN CAST(user_id AS STRING) "
            "ELSE event_type END AS BIGINT)"
        ).alias("maybe_id"),
    )
