"""Scalar function families (SURVEY.md §2-H) — one query per family.

This module is where the cross-engine trap list lives (§5.4): dayofweek
numbering, DuckDB's DECIMAL floor/ceil, BIGINT extract results, pmod on
negatives, regex dialect corners. Every oracle pins the portable form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from .helpers import r4


@register(
    "str_basic",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           CAST(length(c_name) AS INTEGER) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           substring(c_name, 1, 8) AS name_prefix,
           concat_ws('-', c_mktsegment, c_name) AS seg_name,
           trim('  ' || c_name || ' ') AS name_trimmed
    FROM customer
    """,
    tier="P1",
)
def str_basic(spark, t):
    """upper/lower/length/lpad/substring/concat_ws/trim."""
    c = t["customer"]
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
    )


@register(
    "str_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS first_word,
           regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
           regexp_matches(p_type, 'BRASS$') AS is_brass
    FROM part
    """,
    tier="P1",
)
def str_regex(spark, t):
    """Regex extract/replace/match on a portable pattern subset (anchors,
    classes, no lookaround — both engines are RE2-ish but not identical).
    Note DuckDB regexp_replace needs the 'g' flag to match Spark's
    replace-all semantics."""
    p = t["part"]
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.col("p_type").rlike("BRASS$").alias("is_brass"),
    )


@register(
    "str_distance",
    oracle="""
    SELECT c_custkey,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER) AS lev_building,
           CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INTEGER) AS lev_machinery
    FROM customer
    """,
    tier="P2",
)
def str_distance(spark, t):
    """Levenshtein edit distance (dedup/fuzzy-match building block)."""
    c = t["customer"]
    return c.select(
        "c_custkey",
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev_building"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).alias("lev_machinery"),
    )


@register(
    "date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           CAST(day(o_orderdate) AS INTEGER) AS o_day,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS o_dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS INTEGER) AS days_since_95,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    """,
    tier="P1",
)
def date_parts(spark, t):
    """Date-part extraction + arithmetic. Trap pinned here: Spark
    dayofweek is 1=Sunday, DuckDB dayofweek is 0=Sunday → oracle adds 1."""
    o = t["orders"]
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.dayofweek("o_orderdate").alias("o_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        F.last_day(F.to_date("o_orderdate")).alias("month_end"),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT c_custkey,
           round(abs(c_acctbal), 4) AS abs_bal,
           CAST(sign(c_acctbal) AS DOUBLE) AS sign_bal,
           CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
           CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
           round(sqrt(abs(c_acctbal)), 4) AS sqrt_bal,
           round(ln(CAST(c_custkey + 1 AS DOUBLE)), 4) AS ln_key,
           round(log10(CAST(c_custkey + 1 AS DOUBLE)), 4) AS log10_key,
           round(pow(abs(c_acctbal), 0.3), 4) AS pow_bal,
           round(exp(c_acctbal / 10000.0), 4) AS exp_bal
    FROM customer
    """,
    tier="P1",
)
def math_funcs(spark, t):
    """round/floor/ceil/abs/pow/sqrt/ln/log10/exp/sign over the one column
    with negatives (c_acctbal). DuckDB floor/ceil return DECIMAL and sign
    returns TINYINT → oracle casts to Spark's BIGINT/DOUBLE."""
    c = t["customer"]
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        r4(F.abs(bal)).alias("abs_bal"),
        F.signum(bal).alias("sign_bal"),
        F.floor(bal).alias("floor_bal"),
        F.ceil(bal).alias("ceil_bal"),
        r4(F.sqrt(F.abs(bal))).alias("sqrt_bal"),
        r4(F.log((F.col("c_custkey") + 1).cast("double"))).alias("ln_key"),
        r4(F.log10((F.col("c_custkey") + 1).cast("double"))).alias("log10_key"),
        r4(F.pow(F.abs(bal), F.lit(0.3))).alias("pow_bal"),
        r4(F.exp(bal / 10000.0)).alias("exp_bal"),
    )


@register(
    "cond_funcs",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, SUM(o_totalprice) AS total FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey,
           round(COALESCE(s.total, 0.0), 4) AS spend,
           nullif(c.c_mktsegment, 'BUILDING') AS seg_or_null,
           round(greatest(c.c_acctbal, 1000.0), 4) AS bal_floor_1k,
           round(least(c.c_acctbal, 5000.0), 4) AS bal_cap_5k,
           CASE WHEN s.total IS NULL THEN 'none'
                WHEN s.total < 1000000 THEN 'light'
                WHEN s.total < 3000000 THEN 'regular'
                ELSE 'whale' END AS spend_tier
    FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey
    """,
    tier="P1",
)
def cond_funcs(spark, t):
    """CASE chains, coalesce, nullif, greatest, least — nulls manufactured
    by the left join (fixtures have none at rest)."""
    spend = (
        t["orders"].groupBy("o_custkey").agg(F.sum("o_totalprice").alias("total"))
    )
    c = t["customer"]
    return (
        c.join(spend, c["c_custkey"] == spend["o_custkey"], "left")
        .select(
            "c_custkey",
            r4(F.coalesce(F.col("total"), F.lit(0.0))).alias("spend"),
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
            r4(F.greatest(F.col("c_acctbal"), F.lit(1000.0))).alias("bal_floor_1k"),
            r4(F.least(F.col("c_acctbal"), F.lit(5000.0))).alias("bal_cap_5k"),
            F.when(F.col("total").isNull(), "none")
            .when(F.col("total") < 1000000, "light")
            .when(F.col("total") < 3000000, "regular")
            .otherwise("whale")
            .alias("spend_tier"),
        )
    )


@register(
    "array_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)
             AS n_distinct,
           list_contains(string_split(text, ' '), 'data') AS has_data,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], '|')
             AS first5_sorted
    FROM documents
    """,
    tier="P1",
)
def array_funcs(spark, t):
    """split/size/array_contains/array_distinct/sort_array/slice; the
    slice is emitted '|'-joined (scalar) to stay driver-canonicalizer-safe."""
    toks = F.split("text", " ")
    return t["documents"].select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(
            F.slice(F.sort_array(F.array_distinct(toks)), 1, 5), "|"
        ).alias("first5_sorted"),
    )


@register(
    "array_higher_order",
    oracle="""
    SELECT vec_id,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                'sum'), 4) AS emb_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           round(list_aggregate(
             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
             'sum'), 4) AS sum_sq
    FROM embeddings
    """,
    tier="P2",
)
def array_higher_order(spark, t):
    """transform / filter / aggregate lambdas over the embedding column
    (cast to double first — float/double merge types differ, §1.3)."""
    emb_d = F.col("embedding").cast("array<double>")
    return t["embeddings"].select(
        "vec_id",
        r4(
            F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x)
        ).alias("emb_sum"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
        r4(
            F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("sum_sq"),
    )


@register(
    "map_funcs",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    """,
    tier="P3",
)
def map_funcs(spark, t):
    """Map construction + access (map projected back to scalar columns
    before compare — DuckDB MAP literals aren't portable)."""
    m = F.create_map(
        F.lit("k"), F.get_json_object("props", "$.k").cast("int")
    )
    return t["events"].select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, F.lit("k")).alias("k_val"),
    )


@register(
    "json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_path,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed
    FROM events
    """,
    tier="P1",
)
def json_funcs(spark, t):
    """JSON access both ways: path extraction and typed from_json parse."""
    return t["events"].select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_path"),
        F.from_json("props", "k INT")["k"].alias("k_typed"),
    )


@register(
    "hash_funcs",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
    FROM documents
    """,
    tier="P2",
)
def hash_funcs(spark, t):
    """Deterministic content hashes (dedup keys); hex is lowercase in both
    engines."""
    return t["documents"].select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@register(
    "str_extended",
    oracle="""
    SELECT p_partkey,
           translate(p_type, 'AEIOU', 'aeiou') AS type_devoweled,
           repeat(p_brand, 2) AS brand_twice,
           reverse(p_name) AS name_reversed,
           split_part(p_name, ' ', 1) AS name_first_word,
           CAST(position('BRASS' IN p_type) AS INTEGER) AS brass_pos
    FROM part
    """,
    tier="P2",
)
def str_extended(spark, t):
    """translate/repeat/reverse/split_part/position — the second string
    family (initcap deliberately excluded: absent from DuckDB 1.0, and
    word-boundary rules differ across engines anyway). split_part and
    position agree on the edge cases (missing delimiter → '', missing
    needle → 0) in both engines — verified before pinning."""
    p = t["part"]
    return p.select(
        "p_partkey",
        F.translate("p_type", "AEIOU", "aeiou").alias("type_devoweled"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.reverse("p_name").alias("name_reversed"),
        F.split_part("p_name", F.lit(" "), F.lit(1)).alias("name_first_word"),
        F.instr("p_type", "BRASS").alias("brass_pos"),
    )


@register(
    "bitwise_funcs",
    oracle="""
    SELECT o_orderkey,
           (o_orderkey & 255)::BIGINT AS low_byte,
           (o_orderkey | 4096)::BIGINT AS with_flag,
           xor(o_orderkey, o_custkey)::BIGINT AS key_mix,
           (o_orderkey << 3)::BIGINT AS shl3,
           (o_orderkey >> 2)::BIGINT AS shr2,
           bit_count(o_orderkey)::INTEGER AS popcount,
           (~o_orderkey)::BIGINT AS flipped
    FROM orders
    """,
    tier="P2",
)
def bitwise_funcs(spark, t):
    """&, |, xor, shifts, popcount, complement — the bit-manipulation
    family (bucket masks, flag fields, bitmap indexes all reduce to
    these). Both engines implement them as exact two's-complement
    integer ops, so no rounding layer is needed anywhere."""
    o = t["orders"]
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).cast("bigint").alias("key_mix"),
        F.shiftleft(k, 3).cast("bigint").alias("shl3"),
        F.shiftright(k, 2).cast("bigint").alias("shr2"),
        F.bit_count(k).alias("popcount"),
        F.bitwise_not(k).cast("bigint").alias("flipped"),
    )


@register(
    "encoding_funcs",
    oracle="""
    SELECT p_partkey,
           to_base64(p_name::BLOB) AS name_b64,
           hex(p_brand) AS brand_hex,
           from_base64(to_base64(p_name::BLOB))::VARCHAR AS name_roundtrip,
           md5(p_name) AS name_md5
    FROM part
    """,
    tier="P2",
)
def encoding_funcs(spark, t):
    """base64/hex/md5 encode-decode — the binary-transport family
    (payload IDs, cache keys, fixture fingerprints). Both engines emit
    RFC-4648 base64 and uppercase hex for the same UTF-8 bytes, and the
    base64 roundtrip proves decode parity, not just encode."""
    p = t["part"]
    return p.select(
        "p_partkey",
        F.base64(F.col("p_name").cast("binary")).alias("name_b64"),
        F.hex(F.col("p_brand")).alias("brand_hex"),
        F.unbase64(F.base64(F.col("p_name").cast("binary")))
        .cast("string")
        .alias("name_roundtrip"),
        F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
    )
