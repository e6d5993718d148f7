"""Relational operator coverage over the TPC-H-ish driver tables:
scans + pushed-down filters, broadcast dimension joins, shuffle joins,
partial+final hash aggregation, window functions, sorts/limits,
semi/anti joins, distinct, and event-time tumbling windows.

These exercise the Catalyst paths the spatial engine rides on (the
reference has no joins or windows at all — SURVEY.md §2.3/§2.5); each
query is a direct analogue of a capability box with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style partial+final hash agg with pushed-down filter."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_base_price_c"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (100 - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("sum_disc_price_e4"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim-chain join: region <- nation <- customer, agg."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias("sum_acctbal_c"),
        )
    )


def q_part_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped 5-way star join: the lineitem fact against four
    broadcast dims (part filtered before the join so pruning reaches the
    scan), revenue in exact integer cents-e4 per (region, brand)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "p_brand")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (100 - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def oracle_part_profit() -> str:
    return """
SELECT r_name, p_brand,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size <= 20
GROUP BY r_name, p_brand"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + group + window top-k per priority (sort/limit box)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (100 - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("revenue_e4")
        )
    )
    j = o.join(rev, o.o_orderkey == rev.l_orderkey)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("revenue_e4").desc(), F.col("o_orderkey").asc()
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("o_orderpriority", F.col("rank").cast("long").alias("rank"), "o_orderkey", "revenue_e4")
    )


def q_unshipped_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join box: customers with orders but no 'F' order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    no_f = with_orders.join(
        o.filter(F.col("o_orderstatus") == "F"),
        with_orders.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return no_f.select("c_custkey", "c_name", "c_mktsegment")


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window aggregation (batch form of the
    streaming operator in pydriosm_spark/streaming)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
        )
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (grouping-sets box): per
    (returnflag, linestatus), per returnflag, and grand total."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_price_c"),
        )
    )


def q_part_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct box + string functions: distinct brand/type prefix."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select("p_brand", F.split("p_type", " ").getItem(0).alias("type_head"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def oracle_pricing_summary() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""


def oracle_market_share() -> str:
    return """
SELECT r_name, count(*) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_acctbal_c
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name"""


def oracle_top_orders() -> str:
    return """
WITH rev AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
  FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderpriority,
       CAST(row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY revenue_e4 DESC, o_orderkey ASC) AS BIGINT) AS rank,
       o_orderkey, revenue_e4
FROM orders JOIN rev ON o_orderkey = l_orderkey
QUALIFY rank <= 5"""


def oracle_unshipped_customers() -> str:
    return """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')"""


def oracle_event_windows() -> str:
    return """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events GROUP BY 1, 2"""


def oracle_rollup() -> str:
    return """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)"""


def oracle_part_distinct() -> str:
    return """
SELECT DISTINCT p_brand, string_split(p_type, ' ')[1] AS type_head FROM part"""


def q_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the events stream (batch form; the
    streaming form with applyInPandasWithState is equivalence-tested in
    tests/test_sessions_and_misc.py)."""
    from pydriosm_spark.streaming.sessions import sessionize_batch

    e = _t(spark, sf_dir, "events")
    return sessionize_batch(e).select(
        "user_id",
        "session_start",
        "session_end",
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value_c",
    )


def oracle_sessions() -> str:
    return """
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM s GROUP BY user_id, sid"""


def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every non-signup event matched to the user's latest
    prior-or-simultaneous signup event (union-merge plan — one shuffle,
    no range join)."""
    from pydriosm_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    lefts = e.filter(F.col("event_type") != "signup").select("event_id", "user_id", "ts")
    rights = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_id"))  # dedup equal-ts rights
    )
    j = asof_join(lefts, rights, key="user_id", right_payload=["signup_id"])
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts").alias("signup_ts"),
        F.col("asof_signup_id").cast("long").alias("signup_id"),
    )


def oracle_asof() -> str:
    """Independent implementation: DuckDB's native ASOF JOIN."""
    return """
WITH rights AS (
  SELECT user_id, ts, max(event_id) AS signup_id
  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
),
lefts AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type <> 'signup'
)
SELECT l.event_id, l.user_id, l.ts, r.ts AS signup_ts, r.signup_id
FROM lefts l
ASOF LEFT JOIN rights r ON l.user_id = r.user_id AND l.ts >= r.ts"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): per-user event-type counts as columns."""
    e = _t(spark, sf_dir, "events")
    out = e.groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    # pivot count yields NULL for absent combos; the wide contract is 0
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in EVENT_TYPES],
    )


def oracle_pivot() -> str:
    cols = ",\n       ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
    return f"""
SELECT user_id,
       {cols}
FROM events GROUP BY user_id"""


def q_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window: each event's trailing-1-hour per-user event
    count and value sum (RANGE BETWEEN interval — the window box beyond
    row_number/rank)."""
    e = _t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.round(F.col("value") * 100).cast("long")).over(w).alias("sum_value_c_1h"),
    )


def oracle_rolling() -> str:
    return """
SELECT event_id, user_id, ts,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_value_c_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)"""


def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operators, expressed through the SQL API
    (temp views + spark.sql) — nations that supply but never buy, and
    nations that do both."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("v_supplier")
    return spark.sql(
        """
        SELECT 'both' AS grp, n_key FROM (
          SELECT c_nationkey AS n_key FROM v_customer
          INTERSECT
          SELECT s_nationkey FROM v_supplier
        )
        UNION ALL
        SELECT 'supply_only', n_key FROM (
          SELECT s_nationkey AS n_key FROM v_supplier
          EXCEPT
          SELECT c_nationkey FROM v_customer
        )
        """
    )


def oracle_setops() -> str:
    return """
SELECT 'both' AS grp, n_key FROM (
  SELECT c_nationkey AS n_key FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'supply_only', n_key FROM (
  SELECT s_nationkey AS n_key FROM supplier
  EXCEPT
  SELECT c_nationkey FROM customer
)"""


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the same event
    stream aggregated at two time granularities (hour + day) per
    event_type in ONE pass via GROUPING SETS — the multi-resolution
    rollup a time-series store maintains incrementally."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("v_events")
    return spark.sql(
        """
        SELECT date_trunc('DAY', ts) AS day_start,
               date_trunc('HOUR', ts) AS hour_start,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
        FROM v_events
        GROUP BY GROUPING SETS (
          (date_trunc('DAY', ts), event_type),
          (date_trunc('HOUR', ts), event_type)
        )
        """
    )


def oracle_time_rollup() -> str:
    return """
SELECT date_trunc('day', ts) AS day_start,
       date_trunc('hour', ts) AS hour_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events
GROUP BY GROUPING SETS (
  (date_trunc('day', ts), event_type),
  (date_trunc('hour', ts), event_type)
)"""


_Q_VALUE = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_Q_KEY = (
    "concat_ws(':', l_orderkey, l_linenumber, l_partkey, "
    "CAST(round(l_extendedprice * 100) AS BIGINT))"
)


def q_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of lineitem price (cents) estimated from a
    deterministic bottom-k-by-hash sample — engine-reproducible quantile
    sketching (see operators/sketch.py)."""
    from pydriosm_spark.operators.sketch import sampled_quantiles

    return sampled_quantiles(_t(spark, sf_dir, "lineitem"), _Q_VALUE, _Q_KEY)


def oracle_sketch_quantiles() -> str:
    from pydriosm_spark.operators.sketch import quantile_oracle_sql

    return quantile_oracle_sql("lineitem", _Q_VALUE, _Q_KEY)


def registry() -> dict:
    return {
        "rel_pricing_summary": (q_pricing_summary, oracle_pricing_summary()),
        "rel_market_share": (q_market_share, oracle_market_share()),
        "rel_part_profit": (q_part_profit, oracle_part_profit()),
        "rel_top_orders": (q_top_orders, oracle_top_orders()),
        "rel_semi_anti": (q_unshipped_customers, oracle_unshipped_customers()),
        "rel_event_windows": (q_event_windows, oracle_event_windows()),
        "rel_distinct": (q_part_distinct, oracle_part_distinct()),
        "rel_rollup": (q_rollup, oracle_rollup()),
        "rel_sessions": (q_sessions, oracle_sessions()),
        "rel_asof_join": (q_asof, oracle_asof()),
        "rel_pivot": (q_pivot, oracle_pivot()),
        "rel_rolling": (q_rolling, oracle_rolling()),
        "sketch_quantiles": (q_sketch_quantiles, oracle_sketch_quantiles()),
        "rel_setops": (q_setops, oracle_setops()),
        "rel_time_rollup": (q_time_rollup, oracle_time_rollup()),
    }
