"""Query catalog: every SURVEY.md §2 operator (plus the LLM-data
extensions) expressed as a (PySpark builder, ANSI-SQL oracle) pair over
the driver's TPC-H-ish tables (TESTDATA.md).

Cross-engine exactness rules (so the DuckDB value-hash matches bit-for-
bit — see tests/test_oracle_parity.py which enforces this):
 - Money/measure columns are clean 2-decimals in the data → cast to
   DECIMAL(18,2) BEFORE arithmetic; sums/products stay exact; cast the
   final aggregate to DOUBLE (exact, same IEEE value both engines).
   Never cast a *computed* double to decimal (rounding rules differ).
 - Averages = CAST(exact decimal sum AS DOUBLE) / count — one IEEE
   division, identical both engines.
 - Dot products / ratios: sequential left-to-right double folds in both
   engines (F.aggregate ↔ list_reduce) — identical operation order →
   identical doubles.
 - Hashes: md5-based (portable_hash64 ↔ ('0x'||substr(md5,1,15))::BIGINT
   — verified identical).
 - Timestamps rendered as-is (both engines naive UTC); weekday names via
   date_format('EEEE') ↔ dayname() (verified identical).
 - Every computed column aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.functions.scalars import (
    calendar_decomposition,
    fingerprint,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators import text as tx
from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
    MINHASH_P,
    minhash_components,
    minhash_constants,
    shingles_from_tokens,
    simhash64,
    tokens,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import cosine
from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import (
    salted_latest_per_key,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.transforms import bucketize

DEC = "decimal(18,2)"


def _ntz_micros(ns_col) -> "F.Column":
    # timestamp_micros yields TIMESTAMP_LTZ; cast to NTZ under a pinned
    # UTC session so the value is frozen timezone-independent (matches
    # the other tables' NTZ columns and DuckDB's naive timestamps even
    # if the caller's session uses a different zone later).
    return F.timestamp_micros(ns_col).cast("timestamp_ntz")


def _read_events_raw(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """Load events.parquet WITHOUT normalizing ts; returns (df, ts_dtype).

    events.parquet has shipped with two ts encodings over time:
    TIMESTAMP(NANOS) (readable only as raw int64 via the nanosAsLong
    legacy flag) and plain timestamp[us]. This is the single place
    that probes the loaded dtype — _t() and any query that needs the
    raw column (pushdown-sensitive filters) branch on the returned
    dtype. tests/test_testdata_contract.py names the drifted column if
    the driver ships a third encoding."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df, dict(df.dtypes).get("ts", "")


#: ts encodings the driver has actually shipped; anything else must fail
#: loudly (a silent cast of e.g. string or int32-epoch-seconds would
#: produce NULLs/garbage downstream). Mirrors test_testdata_contract.py.
_KNOWN_EVENTS_TS_TYPES = frozenset({"bigint", "timestamp", "timestamp_ntz"})


def _events_ts_ntz(df: DataFrame, ts_type: str) -> DataFrame:
    """Normalize the raw events ts column to TIMESTAMP_NTZ µs under the
    pinned UTC session, so values are frozen timezone-independent and
    match DuckDB's naive timestamps — whatever the physical encoding.

    Only the encodings the driver has shipped are accepted
    (int64-nanos read as bigint; timestamp[us] as LTZ/NTZ); a new
    encoding raises a named error instead of silently casting."""
    if ts_type == "bigint":  # legacy int64 nanos
        return df.withColumn("ts", _ntz_micros(F.expr("ts div 1000")))
    if ts_type not in _KNOWN_EVENTS_TS_TYPES:
        raise TypeError(
            f"events.ts has unrecognized dtype {ts_type!r}; known encodings: "
            f"{sorted(_KNOWN_EVENTS_TS_TYPES)}. The driver's testdata encoding "
            "drifted — extend _events_ts_ntz/_KNOWN_EVENTS_TS_TYPES and "
            "tests/test_testdata_contract.py for the new encoding."
        )
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        df, ts_type = _read_events_raw(spark, sf_dir)
        return _events_ts_ntz(df, ts_type)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(c: str):
    return F.col(c).cast(DEC)


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    description: str
    survey_ref: str  # SURVEY.md §2 operator ids / extension tag
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


_CATALOG: list[CatalogQuery] = []


def _scratch_warehouse(name: str, sf: str) -> str:
    """Bounded scratch dir for catalog entries that build ManagedTables
    in-query: a fixed path per (entry, sf input, PROCESS), wiped at the
    start of each call and removed at interpreter exit — repeated
    parity/bench/driver runs reuse one footprint per process instead
    of leaking a table copy per invocation (mkdtemp would), and the
    pid component keeps concurrent harness processes from rmtree'ing
    each other's live tables (which a shared fixed path would)."""
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile
    from pathlib import Path

    base = Path(tempfile.gettempdir()) / f"spark_graft_catalog-{os.getpid()}"
    if not base.exists():
        atexit.register(shutil.rmtree, str(base), True)
    root = base / f"{name}-{hashlib.md5(sf.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    root.mkdir(parents=True, exist_ok=True)
    return str(root)


def _q(name, description, survey_ref, oracle):
    def deco(fn):
        _CATALOG.append(CatalogQuery(name, description, survey_ref, fn, oracle))
        return fn

    return deco


# =====================================================================
# Reference surface: scans, filters, predicates (S1, P1-P5)
# =====================================================================

@_q(
    "watermark_filter",
    "Incremental high-watermark pull: rows with cdc_col > stored watermark",
    "S1/P3 (incremental_loop.json:42-50)",
    """
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def q_watermark_filter(spark, sf):
    # Filter on the RAW ts column, with the literal cast to the
    # column's OWN loaded type, so the predicate pushes into the
    # parquet scan (row-group stats skip old files — the point of a
    # high-watermark pull at 100 TB); normalize to NTZ µs only after
    # the filter. Casting the column before filtering would wrap it in
    # a Cast that blocks parquet filter translation for any encoding
    # whose loaded type differs from the cast target (e.g. LTZ files).
    df, ts_type = _read_events_raw(spark, sf)
    if ts_type == "bigint":  # legacy int64 nanos
        wm = F.lit(1_705_276_800 * 1_000_000_000)  # 2024-01-15T00:00:00Z
    else:  # timestamp/timestamp_ntz: UTC session → same instant either way
        wm = F.lit("2024-01-15 00:00:00").cast(ts_type)
    return _events_ts_ntz(df.filter(F.col("ts") > wm), ts_type).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@_q(
    "in_predicate",
    "IN-list predicate",
    "P5 (silver_Dimensions.py:213-215)",
    "SELECT p_partkey, p_name, p_size FROM part WHERE p_size IN (1, 5, 9)",
)
def q_in_predicate(spark, sf):
    return (
        _t(spark, sf, "part")
        .filter(F.col("p_size").isin(1, 5, 9))
        .select("p_partkey", "p_name", "p_size")
    )


@_q(
    "null_predicate",
    "IS NOT NULL predicate + conjunction",
    "P4 (silver_Dimensions.py:206-209)",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
    WHERE o_orderpriority IS NOT NULL AND o_orderstatus = 'F'
    """,
)
def q_null_predicate(spark, sf):
    return (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderpriority").isNotNull() & (F.col("o_orderstatus") == "F"))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
    )


@_q(
    "project_drop",
    "Column drop / projection pushdown (ReadSchema pruned at the scan)",
    "P2 (utils/transformations.py:1-5)",
    "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem",
)
def q_project_drop(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.drop(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_tax",
        "l_linestatus", "l_shipdate",
    )


# =====================================================================
# Scalar functions (F1-F9)
# =====================================================================

@_q(
    "upper_trim",
    "Case normalization cleanse",
    "F1/F2 (silver_Dimensions.py:41; readme.md:91)",
    "SELECT c_custkey, upper(trim(c_name)) AS c_name_clean FROM customer",
)
def q_upper_trim(spark, sf):
    return _t(spark, sf, "customer").select(
        "c_custkey", F.upper(F.trim(F.col("c_name"))).alias("c_name_clean")
    )


@_q(
    "regexp_clean",
    "regexp_replace cleanse",
    "F3 (silver_Dimensions.py:154)",
    "SELECT p_partkey, regexp_replace(p_name, ' ', '_', 'g') AS p_name_clean FROM part",
)
def q_regexp_clean(spark, sf):
    return _t(spark, sf, "part").select(
        "p_partkey", F.regexp_replace("p_name", " ", "_").alias("p_name_clean")
    )


@_q(
    "bucketize",
    "when/otherwise conditional bucketing + group count",
    "F4 (silver_Dimensions.py:151-153)",
    """
    SELECT CASE WHEN p_retailprice < 930 THEN 'low'
                WHEN p_retailprice < 970 THEN 'medium'
                ELSE 'high' END AS price_band,
           count(*) AS n
    FROM part GROUP BY 1
    """,
)
def q_bucketize(spark, sf):
    df = bucketize(
        _t(spark, sf, "part"), "p_retailprice", "price_band", [930, 970],
        ["low", "medium", "high"],
    )
    return df.groupBy("price_band").agg(F.count(F.lit(1)).alias("n"))


@_q(
    "calendar",
    "Calendar decomposition (DimDate derivation)",
    "F9 (initial_load.sql:36-43)",
    """
    SELECT o_orderkey,
           CAST(strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS INT) AS date_key,
           CAST(dayofmonth(CAST(o_orderdate AS DATE)) AS INT) AS day,
           CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS month,
           CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS year,
           dayname(CAST(o_orderdate AS DATE)) AS weekday
    FROM orders
    """,
)
def q_calendar(spark, sf):
    d = F.to_date("o_orderdate")
    parts = calendar_decomposition(d)
    return _t(spark, sf, "orders").select(
        "o_orderkey", *[parts[k].alias(k) for k in ["date_key", "day", "month", "year", "weekday"]]
    )


@_q(
    "concat_naming",
    "String concat (run-file naming pattern)",
    "F6/F7 (incremental_loop.json:87,134-148)",
    """
    SELECT event_id,
           concat(event_type, ' ', strftime(ts, '%Y-%m-%d %H:%M:%S')) AS run_name
    FROM events
    """,
)
def q_concat_naming(spark, sf):
    return _t(spark, sf, "events").select(
        "event_id",
        F.concat_ws(
            " ", F.col("event_type"), F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
        ).alias("run_name"),
    )


@_q(
    "coalesce_nullif",
    "Null/empty coalesce conditional (backfill override semantics)",
    "F8 (incremental_loop.json:45)",
    """
    SELECT coalesce(nullif(event_type, 'error'), 'recovered') AS label,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_coalesce_nullif(spark, sf):
    return (
        _t(spark, sf, "events")
        .select(
            F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("recovered")).alias("label")
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# =====================================================================
# Aggregations (A1-A3 + the implied group-by surface)
# =====================================================================

@_q(
    "max_watermark",
    "Scalar MAX(cdc) watermark refresh",
    "A1 (incremental_loop.json:223-231)",
    "SELECT CAST(max(ts) AS TIMESTAMP) AS cdc FROM events",
)
def q_max_watermark(spark, sf):
    return _t(spark, sf, "events").agg(F.max("ts").alias("cdc"))


@_q(
    "rowcount_gate",
    "Row-count > 0 gate",
    "A2 (incremental_loop.json:162-166)",
    "SELECT count(*) AS rows_copied FROM events WHERE ts > TIMESTAMP '2024-01-25 00:00:00'",
)
def q_rowcount_gate(spark, sf):
    return (
        _t(spark, sf, "events")
        .filter(F.col("ts") > F.lit("2024-01-25 00:00:00").cast("timestamp"))
        .agg(F.count(F.lit(1)).alias("rows_copied"))
    )


@_q(
    "pricing_summary",
    "TPC-H Q1-style pricing summary (flagship agg): exact decimal sums",
    "implied agg surface (SURVEY §2.4) over fact table",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark, sf):
    one = F.lit(1).cast(DEC)
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount"))
    charge = disc_price * (one + _dec("l_tax"))
    return (
        _t(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_q(
    "dedup_distinct",
    "Exact distinct (hash aggregate dedup)",
    "A3 (silver_Dimensions.py:50,86)",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def q_dedup_distinct(spark, sf):
    return _t(spark, sf, "events").select("user_id", "event_type").distinct()


@_q(
    "latest_per_key",
    "Deterministic latest-row-per-key (dropDuplicates done right)",
    "A3/§2.6 window (sequence_by semantics, DimUser.py:24)",
    """
    SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_latest_per_key(spark, sf):
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        _t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_id", "event_type", "ts", "value")
    )


@_q(
    "pivot_manual",
    "Pivoted conditional aggregation (event counts per type)",
    "implied agg surface; pivot",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
    FROM events GROUP BY user_id
    """,
)
def q_pivot_manual(spark, sf):
    e = _t(spark, sf, "events")

    def cnt(t):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))

    return e.groupBy("user_id").agg(
        cnt("click").alias("clicks"),
        cnt("view").alias("views"),
        cnt("purchase").alias("purchases"),
        cnt("error").alias("errors"),
    )


@_q(
    "rollup_hierarchy",
    "ROLLUP over region/nation hierarchy",
    "implied agg surface; grouping sets",
    """
    SELECT r_name, n_name, count(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup_hierarchy(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# =====================================================================
# Joins (J1-J3 shapes)
# =====================================================================

@_q(
    "star_join_revenue",
    "FLAGSHIP: star-schema multi-join revenue rollup (fact ⋈ 4 dims)",
    "J3 (initial_load.sql:26-53 FK graph) + implied agg",
    """
    SELECT r_name, CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS order_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           count(DISTINCT o_orderkey) AS n_orders
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, order_year
    """,
)
def q_star_join_revenue(spark, sf):
    # Join order: dims broadcast onto orders first (narrow build side),
    # then one join against the fact; Catalyst plans the single-column
    # COUNT(DISTINCT) as a two-phase partial aggregation (no expand).
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    one = F.lit(1).cast(DEC)
    rev = _dec("l_extendedprice") * (one - _dec("l_discount"))
    o_dim = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "o_orderkey", "r_name",
            F.year(F.to_date("o_orderdate")).alias("order_year"),
        )
    )
    return (
        li.join(o_dim, li.l_orderkey == o_dim.o_orderkey)
        .groupBy("r_name", "order_year")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@_q(
    "broadcast_dim_join",
    "Broadcast small-dim join + agg",
    "J3 (dims ≤ broadcast threshold → hash-broadcast, SURVEY §4)",
    """
    SELECT p_brand, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_broadcast_dim_join(spark, sf):
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
    )


@_q(
    "semi_join",
    "Left-semi join (EXISTS)",
    "join surface (MERGE subsumes semi/anti, SURVEY §2.5)",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_semi_join(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@_q(
    "anti_join",
    "Left-anti join (NOT EXISTS) — the MERGE insert branch",
    "J1/J2 internals (SURVEY §2.5 note)",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_anti_join(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# =====================================================================
# Windows, sort/limit (§2.6)
# =====================================================================

@_q(
    "topk_customers",
    "Top-K by aggregate with deterministic tiebreak (ORDER BY + LIMIT)",
    "§2.6 sort/limit",
    """
    SELECT c_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 10
    """,
)
def q_topk_customers(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


@_q(
    "window_running_sum",
    "Running sum per key (window frame) — exact decimal then double",
    "§2.6 window",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def q_window_running_sum(spark, sf):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@_q(
    "sessionize",
    "Sessionization: 30-min-gap session ids via lag + cumulative sum",
    "streaming-analog (OLAP pattern; guide §patterns)",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN (epoch_ns(ts) // 1000)
                       - (epoch_ns(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000)
                       > 1800000000 OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    )
    SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions
    FROM g GROUP BY user_id
    """,
)
def q_sessionize(spark, sf):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)

    def us(c):
        # NTZ → µs epoch; the UTC session pinned in _t makes the
        # NTZ→LTZ cast a pure reinterpretation
        return F.unix_micros(c.cast("timestamp"))

    new_sess = F.when(
        prev.isNull() | (us(F.col("ts")) - us(prev) > 1800000000), 1
    ).otherwise(0)
    return (
        _t(spark, sf, "events")
        .withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(F.sum("new_sess").cast("bigint").alias("n_sessions"))
    )


# =====================================================================
# Expectations / quality gates (P6)
# =====================================================================

@_q(
    "quality_gate",
    "expect_all_or_drop gate: violating rows dropped before aggregation",
    "P6 (DimUser.py:3-8,16)",
    """
    SELECT event_type, count(*) AS n
    FROM events
    WHERE user_id IS NOT NULL AND value > 0
    GROUP BY event_type
    """,
)
def q_quality_gate(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.expectations import (
        expect_all_or_drop,
    )

    gated = expect_all_or_drop(
        _t(spark, sf, "events"),
        {"has_user": "user_id IS NOT NULL", "positive_value": "value > 0"},
        observe=False,
    ).df
    return gated.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


# =====================================================================
# SCD semantics as SQL-checkable queries (J1/J2/T6)
# =====================================================================

@_q(
    "scd1_latest_state",
    "SCD1 upsert semantics: last-write-wins state per key over a change stream",
    "J1/T6 (FactStream.py:12-21)",
    """
    SELECT user_id, event_type AS last_event, CAST(ts AS TIMESTAMP) AS last_ts FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_scd1_latest_state(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.transforms import (
        dedup_keep_latest,
    )

    e = _t(spark, sf, "events")
    return dedup_keep_latest(e, ["user_id"], "ts", "event_id").select(
        "user_id",
        F.col("event_type").alias("last_event"),
        F.col("ts").alias("last_ts"),
    )


@_q(
    "scd2_history",
    "SCD2 apply-changes on a change batch: chained validity intervals, "
    "(key,seq) dedup + no-op suppression — full history shape",
    "J2/T6 (DimUser.py:20-29)",
    """
    WITH dedup AS (
      SELECT user_id, event_type, ts FROM (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_type DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ), suppressed AS (
      SELECT * FROM (
        SELECT user_id, event_type, ts,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev_type
        FROM dedup
      ) WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
           CAST(ts AS TIMESTAMP) AS __START_AT,
           CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS TIMESTAMP) AS __END_AT
    FROM suppressed
    """,
)
def q_scd2_history(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import scd2_apply

    batch = _t(spark, sf, "events").select("user_id", "event_type", "ts")
    return scd2_apply(None, batch, keys=["user_id"], seq="ts")


# =====================================================================
# LLM-data extensions: text analysis
# =====================================================================

@_q(
    "doc_token_stats",
    "Token counting + char stats per document",
    "ext:text-analysis",
    r"""
    WITH t AS (
      SELECT doc_id, regexp_replace(trim(text), '\s+', ' ', 'g') AS norm, n_chars
      FROM documents
    )
    SELECT doc_id,
           CAST(len(string_split(norm, ' ')) AS INT) AS n_tokens,
           n_chars,
           CAST(length(norm) - len(string_split(norm, ' ')) + 1 AS DOUBLE)
             / len(string_split(norm, ' ')) AS mean_word_len
    FROM t
    """,
)
def q_doc_token_stats(spark, sf):
    d = _t(spark, sf, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        tx.token_count(t).alias("n_tokens"),
        "n_chars",
        tx.mean_word_length(t).alias("mean_word_len"),
    )


@_q(
    "doc_quality",
    "Heuristic quality scoring (length/punct/word-length bands)",
    "ext:text-analysis (C4/Gopher-style filters)",
    r"""
    WITH m AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\s+')) AS n_tok,
             CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
               / length(text) AS pr,
             CAST(length(regexp_replace(trim(text), '\s+', ' ', 'g'))
                  - len(string_split_regex(trim(text), '\s+')) + 1 AS DOUBLE)
               / len(string_split_regex(trim(text), '\s+')) AS mwl
      FROM documents
    )
    SELECT doc_id,
           (CASE WHEN n_tok >= 5 AND n_tok <= 5000 THEN 1.0 ELSE 0.0 END
            + CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END
            + CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END) / 3.0
             AS quality
    FROM m
    """,
)
def q_doc_quality(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", tx.quality_score(F.col("text")).alias("quality"))


@_q(
    "doc_langid",
    "Language identification (stopword-marker argmax + CJK fallback)",
    "ext:text-analysis",
    r"""
    WITH s AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\s+') AS toks,
             length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk
      FROM documents
    ), sc AS (
      SELECT doc_id,
        len(list_filter(toks, x -> x IN ('der','die','und','das','ein','nicht'))) AS s_de,
        len(list_filter(toks, x -> x IN ('the','and','of','to','a','is'))) AS s_en,
        len(list_filter(toks, x -> x IN ('el','la','de','que','y','los'))) AS s_es,
        len(list_filter(toks, x -> x IN ('le','la','les','et','des','une'))) AS s_fr,
        len(list_filter(toks, x -> x IN ('的','是','了','在','我','有'))) + cjk AS s_zh
      FROM s
    )
    SELECT lang_pred, count(*) AS n FROM (
      SELECT CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
                  WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
                  WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
                  WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
                  WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
                  ELSE 'zh' END AS lang_pred
      FROM sc
    ) GROUP BY lang_pred
    """,
)
def q_doc_langid(spark, sf):
    d = _t(spark, sf, "documents")
    return (
        d.select(tx.detect_language(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "doc_fingerprint_dedup",
    "Exact dedup by md5 fingerprint of normalized text (hash-groupBy)",
    "ext:dedup-exact",
    r"""
    SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def q_doc_fingerprint_dedup(spark, sf):
    d = _t(spark, sf, "documents")
    return (
        d.select(fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# =====================================================================
# LLM-data extensions: near-dup dedup (MinHash / Jaccard / SimHash)
# =====================================================================

def _minhash_oracle(num_hashes: int = 4) -> str:
    comps = ",\n           ".join(
        "list_aggregate(list_transform(sh, "
        f"x -> ({a} * (('0x' || substr(md5('0|' || x), 1, 15))::BIGINT % {MINHASH_P}) + {b}) % {MINHASH_P}"
        f"), 'min') AS mh_{k}"
        for k, (a, b) in ((k, minhash_constants(k)) for k in range(num_hashes))
    )
    return rf"""
    WITH s AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 2, 1) + 1),
               i -> string_split_regex(lower(trim(text)), '\s+')[i] || ' ' ||
                    string_split_regex(lower(trim(text)), '\s+')[i+1] || ' ' ||
                    string_split_regex(lower(trim(text)), '\s+')[i+2]
             )) AS sh
      FROM documents
    )
    SELECT doc_id,
           {comps}
    FROM s
    """


@_q(
    "minhash_signatures",
    "MinHash signature components: one portable md5 per shingle + k "
    "affine universal hashes (a_k·h+b_k mod 2^31-1), min per doc",
    "ext:dedup-minhash",
    _minhash_oracle(4),
)
def q_minhash_signatures(spark, sf):
    d = _t(spark, sf, "documents")
    return minhash_components(d, "text", "doc_id", num_hashes=4, shingle_n=3)


@_q(
    "ngram_jaccard_pairs",
    "Exact unigram-set Jaccard for small-id doc pairs (set ops on arrays)",
    "ext:dedup-jaccard",
    r"""
    WITH s AS (
      SELECT doc_id,
             list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS sh
      FROM documents WHERE doc_id < 30
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    """,
)
def q_ngram_jaccard_pairs(spark, sf):
    d = _t(spark, sf, "documents").filter("doc_id < 30")
    sh = d.select("doc_id", F.array_distinct(tokens(F.col("text"))).alias("sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (inter.cast("double") / union).alias("jaccard"),
        )
    )


@_q(
    "simhash_fingerprints",
    "63-bit SimHash fingerprints (bit-vote over portable shingle hashes)",
    "ext:dedup-simhash",
    r"""
    WITH s AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 1, 1) + 1),
               i -> string_split_regex(lower(trim(text)), '\s+')[i] || ' ' ||
                    string_split_regex(lower(trim(text)), '\s+')[i+1]
             )) AS sh
      FROM documents WHERE doc_id < 100
    ), h AS (
      SELECT doc_id, unnest(sh) AS shingle FROM s
    ), hh AS (
      SELECT doc_id, ('0x' || substr(md5('0|' || shingle), 1, 15))::BIGINT AS hv FROM h
    ), bits AS (
      SELECT doc_id, j,
             SUM(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM hh CROSS JOIN (SELECT unnest(range(0, 63)) AS j) js
      GROUP BY doc_id, j
    )
    SELECT doc_id,
           SUM(CASE WHEN vote > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def q_simhash_fingerprints(spark, sf):
    d = _t(spark, sf, "documents").filter("doc_id < 100")
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        with_simhash,
    )

    return with_simhash(d, "text", "doc_id", shingle_n=2, out_col="simhash")


def _mh_sig_cte_body(num_hashes: int) -> str:
    """The ``sig`` CTE body: per-doc distinct trigram shingles → the k
    portable md5-seeded affine minhash components ``mh_0..mh_{k-1}``.
    The ONE definition of the cross-engine minhash recipe — shared by
    the CC dedup, keep-best, PageRank, and LSH-recall-audit oracles (a
    drift between copies would silently desynchronize them)."""
    comps = ",\n             ".join(
        "list_aggregate(list_transform(sh, "
        f"x -> ({a} * (('0x' || substr(md5('0|' || x), 1, 15))::BIGINT % {MINHASH_P}) + {b}) % {MINHASH_P}"
        f"), 'min') AS mh_{k}"
        for k, (a, b) in ((k, minhash_constants(k)) for k in range(num_hashes))
    )
    return rf"""
      SELECT doc_id, {comps}
      FROM (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 2, 1) + 1),
                 i -> string_split_regex(lower(trim(text)), '\s+')[i] || ' ' ||
                      string_split_regex(lower(trim(text)), '\s+')[i+1] || ' ' ||
                      string_split_regex(lower(trim(text)), '\s+')[i+2]
               )) AS sh
        FROM documents
      )"""


def _mh_bandjoin_sql(num_hashes: int, bands: int) -> str:
    """LSH band-collision join predicate over sig aliases a/b."""
    rpb = num_hashes // bands
    return " OR ".join(
        "(" + " AND ".join(f"a.mh_{bb * rpb + j} = b.mh_{bb * rpb + j}" for j in range(rpb)) + ")"
        for bb in range(bands)
    )


def _minhash_edges_cte(
    num_hashes: int, bands: int, threshold: float, recursive: bool = False
) -> str:
    """Shared DuckDB CTE prefix: minhash signatures → band-bucket
    candidate pairs → estimated-Jaccard gate → symmetric ``edges
    (u, v)`` relation. Used by the CC dedup oracle (recursive=True adds
    the RECURSIVE keyword for the closure CTE that follows) and the
    near-dup-graph PageRank oracle."""
    bandjoin = _mh_bandjoin_sql(num_hashes, bands)
    est = (
        "("
        + " + ".join(f"CASE WHEN a.mh_{k} = b.mh_{k} THEN 1 ELSE 0 END" for k in range(num_hashes))
        + f") / {float(num_hashes)}"
    )
    kw = "WITH RECURSIVE" if recursive else "WITH"
    return rf"""
    {kw} sig AS ({_mh_sig_cte_body(num_hashes)}
    ),
    pairs AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({bandjoin})
      WHERE {est} >= {threshold}
    ),
    edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs)"""


#: Exact trigram-Jaccard ground truth: distinct per-doc word-trigram
#: shingles → per-doc set sizes → brute-force co-occurring pair
#: intersections. The ONE definition of the exact-similarity truth set,
#: shared by the exact_jaccard_pairs oracle and the LSH recall audit.
_EXACT_TRIGRAM_CO_CTES = r"""t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id, unnest(list_transform(
          range(1, greatest(len(toks) - 2, 1) + 1),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM t)
    ), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    co AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )"""


def _minhash_cc_oracle(num_hashes: int, bands: int, threshold: float) -> str:
    """Full DuckDB replay of minhash_dedup: edges (see
    _minhash_edges_cte) → transitive closure via a recursive min-label
    CTE → survivors (component minima)."""
    return _minhash_edges_cte(num_hashes, bands, threshold, recursive=True) + rf""",
    r(node, m) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.m FROM edges e JOIN r ON e.v = r.node
    ),
    losers AS (
      SELECT node AS doc_id FROM r GROUP BY node HAVING min(m) < node
    )
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    """


@_q(
    "minhash_dedup_cc",
    "Transitive-closure near-dup dedup: MinHash-LSH pairs → alternating "
    "large-star/small-star connected components → keep each component's "
    "minimum id (oracle replays the closure with a recursive CTE)",
    "ext:dedup-minhash-cc",
    _minhash_cc_oracle(num_hashes=8, bands=4, threshold=0.5),
)
def q_minhash_dedup_cc(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        minhash_dedup,
    )

    d = _t(spark, sf, "documents")
    return minhash_dedup(
        d, threshold=0.5, num_hashes=8, bands=4, shingle_n=3
    ).select("doc_id")


@_q(
    "dedup_cluster_stats",
    "Near-dup dedup QA report: cluster-size histogram of the MinHash-"
    "LSH connected components (singletons included) — the sanity gate "
    "before a dedup pass deletes a chunk of the corpus: one giant "
    "cluster means a pathological shingle/banding config, not real "
    "duplication. Same CC labels as minhash_dedup_cc, one extra "
    "rollup; all-integer output",
    "extension: dedup QA (cluster-size distribution)",
    _minhash_edges_cte(8, 4, 0.5, recursive=True) + r""",
    r(node, m) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.m FROM edges e JOIN r ON e.v = r.node
    ),
    labels AS (SELECT node, min(m) AS component FROM r GROUP BY node),
    assigned AS (
      SELECT d.doc_id, coalesce(l.component, d.doc_id) AS component
      FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
    ),
    sizes AS (
      SELECT component, count(*) AS cluster_size FROM assigned GROUP BY component
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
)
def q_dedup_cluster_stats(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        connected_components,
        minhash_near_dup_pairs,
    )

    d = _t(spark, sf, "documents")
    pairs = minhash_near_dup_pairs(
        d, num_hashes=8, bands=4, shingle_n=3
    ).filter(F.col("est_jaccard") >= 0.5)
    comp = connected_components(pairs, "id_a", "id_b")
    assigned = d.select("doc_id").join(
        comp, F.col("doc_id") == F.col("node"), "left"
    ).select(
        "doc_id", F.coalesce("component", "doc_id").alias("component")
    )
    sizes = assigned.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).alias("n_docs"),
    ).select(
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        F.col("n_clusters").cast("bigint").alias("n_clusters"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
    )


# =====================================================================
# LLM-data extensions: similarity search
# =====================================================================

@_q(
    "cosine_topk",
    "Exact brute-force cosine top-5 neighbors for 10 query vectors "
    "(sequential double fold → bit-identical both engines)",
    "ext:similarity-bruteforce",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce(list_transform(range(1, len(q.embedding) + 1),
               i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), (a,b) -> a + b)
             / (sqrt(list_reduce(list_transform(range(1, len(q.embedding) + 1),
                  i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), (a,b) -> a + b))
                * sqrt(list_reduce(list_transform(range(1, len(c.embedding) + 1),
                  i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), (a,b) -> a + b)))
               AS cos_sim
      FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM pairs
    ) WHERE rank <= 5
    """,
)
def q_cosine_topk(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = _t(spark, sf, "embeddings")
    return brute_force_topk(emb, emb.filter("vec_id < 10"), k=5)


@_q(
    "embedding_near_dup",
    "Embedding-cosine near-duplicate pairs above threshold (brute force "
    "over small-id slice; LSH path covered by ann_topk_srp)",
    "ext:dedup-embedding",
    """
    WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_reduce(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x,y) -> x + y)
           / (sqrt(list_reduce(list_transform(range(1, len(a.embedding) + 1),
                i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), (x,y) -> x + y))
              * sqrt(list_reduce(list_transform(range(1, len(b.embedding) + 1),
                i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x,y) -> x + y)))
             AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_reduce(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x,y) -> x + y)
          / (sqrt(list_reduce(list_transform(range(1, len(a.embedding) + 1),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), (x,y) -> x + y))
             * sqrt(list_reduce(list_transform(range(1, len(b.embedding) + 1),
               i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x,y) -> x + y)))
          >= 0.30
    """,
)
def q_embedding_near_dup(spark, sf):
    e = _t(spark, sf, "embeddings").filter("vec_id < 200")
    a = e.alias("a")
    b = e.alias("b")
    cos = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.30)
    )


def _sql_dot(a: str, b: str, dim: int = 64) -> str:
    """Sequential left-to-right double dot product over FLOAT[] columns —
    the DuckDB twin of operators.similarity.dot (F.aggregate fold)."""
    return (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE)), "
        "(x, y) -> x + y)"
    )


def _sql_cosine(a: str, b: str, dim: int = 64) -> str:
    return (
        f"{_sql_dot(a, b, dim)} / (sqrt({_sql_dot(a, a, dim)}) * sqrt({_sql_dot(b, b, dim)}))"
    )


def _srp_buckets_cte(n_tables=8, n_planes=4, dim=64) -> str:
    """Shared CTE prefix replaying _seeded_hyperplanes + srp_bucket in
    DuckDB, through the ``buckets (vec_id, t, bucket)`` relation. The
    hyperplanes are re-generated from the same md5 counter stream
    (verified bit-identical: int(md5hex[:15],16)/2^60 ↔
    ('0x'||substr(md5,1,15))::BIGINT/2^60), so buckets, candidates and
    cosines all match."""
    u = " + ".join(
        f"('0x' || substr(md5('srp' || t || '|' || p || '|' || d || '|{r}'), 1, 15))::BIGINT"
        f" / 1152921504606846976.0"
        for r in range(3)
    )
    return f"""
    WITH planes AS (
      SELECT t, p, list(w ORDER BY d) AS wv
      FROM (
        SELECT t, p, d, ({u}) - 1.5 AS w
        FROM range({n_tables}) rt(t), range({n_planes}) rp(p), range({dim}) rd(d)
      )
      GROUP BY t, p
    ),
    projs AS (
      SELECT e.vec_id, pl.t, pl.p,
             list_reduce(list_transform(range(1, {dim + 1}),
               i -> CAST(e.embedding[i] AS DOUBLE) * pl.wv[i]), (a, b) -> a + b) AS proj
      FROM embeddings e, planes pl
    ),
    buckets AS (
      SELECT vec_id, t, SUM(CASE WHEN proj >= 0 THEN 1 << p ELSE 0 END) AS bucket
      FROM projs GROUP BY vec_id, t
    )"""


def _srp_oracle_sql(n_tables=8, n_planes=4, dim=64, k=5, max_qid=10) -> str:
    """DuckDB replay of srp_ann_topk (see _srp_buckets_cte)."""
    return _srp_buckets_cte(n_tables, n_planes, dim) + f""",
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM buckets q JOIN buckets c ON q.t = c.t AND q.bucket = c.bucket
      WHERE q.vec_id < {max_qid} AND q.vec_id <> c.vec_id
    ),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id, {_sql_cosine("a", "b", dim)} AS cos_sim
      FROM cand
      JOIN embeddings a ON a.vec_id = cand.query_id
      JOIN embeddings b ON b.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {k}
    """


def _kmeans_assigned_cte(k=8, n_iter=3, dim=64) -> str:
    """Shared CTE prefix replaying kmeans_fit + ivf_assign in DuckDB,
    through the ``assigned (vec_id, cluster)`` relation. Possible only
    because every float op in the Spark path is a sequential fold with
    a deterministic order (see kmeans_fit's ordered-fold mean): the
    Lloyd iterations are unrolled as CTE pairs (assign → ordered mean),
    bit-identical to the literals Spark embeds."""
    sq = (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        "i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])), (a, b) -> a + b)"
    )
    parts = [f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS c
      FROM emb ORDER BY vec_id LIMIT {k}
    )"""]
    for n in range(1, n_iter + 1):
        parts.append(f""",
    d{n} AS (
      SELECT e.vec_id, c.cluster, {sq} AS dist
      FROM emb e, c{n - 1} c
    ),
    a{n} AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        FROM d{n}
      ) WHERE rn = 1
    ),
    m{n} AS (
      SELECT a.cluster, p.pos,
             list_reduce(list(e.v[p.pos] ORDER BY e.vec_id), (x, y) -> x + y)
               / count(*) AS m
      FROM a{n} a JOIN emb e USING (vec_id), range(1, {dim + 1}) p(pos)
      GROUP BY a.cluster, p.pos
    ),
    c{n} AS (
      SELECT pc.cluster, coalesce(nc.c, pc.c) AS c
      FROM c{n - 1} pc LEFT JOIN (
        SELECT cluster, list(m ORDER BY pos) AS c FROM m{n} GROUP BY cluster
      ) nc USING (cluster)
    )""")
    parts.append(f""",
    dfin AS (
      SELECT e.vec_id, c.cluster, {sq} AS dist
      FROM emb e, c{n_iter} c
    ),
    assigned AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        FROM dfin
      ) WHERE rn = 1
    )""")
    return "".join(parts)


def _ivf_oracle_sql(k=8, n_iter=3, n_probe=3, topk=5, dim=64, max_qid=10) -> str:
    """DuckDB replay of kmeans_fit + ivf_assign + ivf_topk (see
    _kmeans_assigned_cte), then probing and scoring replay
    _probe_clusters / ivf_topk."""
    parts = [_kmeans_assigned_cte(k, n_iter, dim)]
    parts.append(f""",
    probe AS (
      SELECT vec_id AS query_id, cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        FROM dfin WHERE vec_id < {max_qid}
      ) WHERE rn <= {n_probe}
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probe p JOIN assigned a USING (cluster)
      WHERE p.query_id <> a.vec_id
    ),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id, {_sql_cosine("a", "b", dim)} AS cos_sim
      FROM cand
      JOIN embeddings a ON a.vec_id = cand.query_id
      JOIN embeddings b ON b.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {topk}
    """)
    return "".join(parts)


@_q(
    "ann_topk_srp",
    "Approximate NN via SRP-LSH buckets — hyperplanes derived from a "
    "seeded md5 stream, replayed verbatim by the DuckDB oracle",
    "ext:similarity-ann",
    _srp_oracle_sql(),
)
def q_ann_topk_srp(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        srp_ann_topk,
    )

    emb = _t(spark, sf, "embeddings")
    return srp_ann_topk(emb, emb.filter("vec_id < 10"), k=5)


@_q(
    "hard_negative_mining",
    "Contrastive-training hard negatives: for each anchor (vec_id < "
    "15), the 3 corpus vectors most cosine-similar among those with a "
    "DIFFERENT label — the negatives that actually teach the margin. "
    "Broadcast-anchors plan (corpus scans once, never shuffles); the "
    "label inequality rides the join condition so same-label pairs die "
    "before scoring",
    "ext:similarity-contrastive",
    f"""
    WITH anchors AS (
      SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 15
    ),
    scored AS (
      SELECT q.vec_id AS anchor_id, q.label AS anchor_label,
             a.vec_id AS neighbor_id, a.label AS neighbor_label,
             {_sql_cosine("q", "a", 64)} AS cos_sim
      FROM anchors q JOIN embeddings a ON q.label <> a.label
    )
    SELECT anchor_id, anchor_label, neighbor_id, neighbor_label, cos_sim,
           CAST(rnk AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY anchor_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def q_hard_negative_mining(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        hard_negatives,
    )

    emb = _t(spark, sf, "embeddings")
    return hard_negatives(emb, emb.filter("vec_id < 15"), k=3)


def _srp_neardup_oracle_sql(n_tables=8, n_planes=4, dim=64, thr="0.30") -> str:
    """DuckDB replay of near_dup_by_cosine: SRP band-bucket candidate
    pairs (any shared table bucket, id_a < id_b, distinct), then exact
    cosine ≥ threshold — same bit-exact hyperplane stream as
    _srp_buckets_cte, NO top-k cap."""
    return _srp_buckets_cte(n_tables, n_planes, dim) + f""",
    cand AS (
      SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
      FROM buckets x JOIN buckets y
        ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id
    ),
    scored AS (
      SELECT cand.id_a, cand.id_b, {_sql_cosine("a", "b", dim)} AS cos_sim
      FROM cand
      JOIN embeddings a ON a.vec_id = cand.id_a
      JOIN embeddings b ON b.vec_id = cand.id_b
    )
    SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= {thr}
    """


@_q(
    "embedding_near_dup_srp",
    "Embedding-cosine near-duplicate pairs over the FULL corpus via the "
    "uncapped SRP band-bucket pair join (similarity.near_dup_by_cosine): "
    "candidates only within shared LSH buckets — no all-pairs join, no "
    "top-k recall cap; the oracle replays the seeded hyperplane stream "
    "bit-exactly. Contrast embedding_near_dup, which brute-forces a "
    "bounded id slice as the exact baseline",
    "ext:dedup-embedding-srp",
    _srp_neardup_oracle_sql(),
)
def q_embedding_near_dup_srp(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        near_dup_by_cosine,
    )

    emb = _t(spark, sf, "embeddings")
    return near_dup_by_cosine(emb, threshold=0.30)


@_q(
    "ann_topk_ivf",
    "IVF approximate NN: deterministic k-means coarse quantizer + "
    "n_probe inverted-list search; the oracle unrolls the Lloyd "
    "iterations in SQL (ordered-fold means → bit-identical centroids)",
    "ext:similarity-ivf",
    _ivf_oracle_sql(),
)
def q_ann_topk_ivf(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.ivf import (
        ivf_assign,
        ivf_topk,
        kmeans_fit,
    )

    emb = _t(spark, sf, "embeddings")
    centroids = kmeans_fit(emb, k=8, n_iter=3)
    indexed = ivf_assign(emb, centroids)
    return ivf_topk(indexed, emb.filter("vec_id < 10"), centroids, k=5, n_probe=3)


def _pq_oracle_sql(m=4, k_sub=8, n_iter=2, topk=5, dim=64, max_qid=10) -> str:
    """DuckDB replay of pq_fit + pq_encode + pq_adc_topk: the joint
    per-subspace Lloyd unroll (one extra ``s`` dimension over
    _kmeans_assigned_cte's scheme), then code assignment and the
    subspace-ordered ADC fold — bit-identical to the Spark path because
    every reduction is a defined-order sequential double fold."""
    sd = dim // m
    sq = (
        f"list_reduce(list_transform(range(1, {sd + 1}), "
        "i -> (t.sv[i] - c.c[i]) * (t.sv[i] - c.c[i])), (a, b) -> a + b)"
    )
    parts = [f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    sub AS (
      SELECT e.vec_id, s.s, e.v[s.s * {sd} + 1 : (s.s + 1) * {sd}] AS sv
      FROM emb e, range(0, {m}) s(s)
    ),
    c0 AS (
      SELECT s, cluster, sv AS c FROM (
        SELECT s, vec_id, sv,
               row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS cluster
        FROM sub
      ) WHERE cluster < {k_sub}
    )"""]
    for n in range(1, n_iter + 1):
        parts.append(f""",
    d{n} AS (
      SELECT t.vec_id, t.s, c.cluster, {sq} AS dist
      FROM sub t JOIN c{n - 1} c USING (s)
    ),
    a{n} AS (
      SELECT vec_id, s, cluster FROM (
        SELECT vec_id, s, cluster,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cluster) AS rn
        FROM d{n}
      ) WHERE rn = 1
    ),
    m{n} AS (
      SELECT a.s, a.cluster, p.pos,
             list_reduce(list(t.sv[p.pos] ORDER BY t.vec_id), (x, y) -> x + y)
               / count(*) AS mu
      FROM a{n} a JOIN sub t USING (vec_id, s), range(1, {sd + 1}) p(pos)
      GROUP BY a.s, a.cluster, p.pos
    ),
    c{n} AS (
      SELECT pc.s, pc.cluster, coalesce(nc.c, pc.c) AS c
      FROM c{n - 1} pc LEFT JOIN (
        SELECT s, cluster, list(mu ORDER BY pos) AS c
        FROM m{n} GROUP BY s, cluster
      ) nc USING (s, cluster)
    )""")
    parts.append(f""",
    dfin AS (
      SELECT t.vec_id, t.s, c.cluster, {sq} AS dist
      FROM sub t JOIN c{n_iter} c USING (s)
    ),
    codes AS (
      SELECT vec_id, s, cluster FROM (
        SELECT vec_id, s, cluster,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cluster) AS rn
        FROM dfin
      ) WHERE rn = 1
    ),
    qd AS (
      SELECT t.vec_id AS query_id, t.s, c.cluster, {sq} AS d
      FROM sub t JOIN c{n_iter} c USING (s)
      WHERE t.vec_id < {max_qid}
    ),
    adc AS (
      SELECT qd.query_id, cd.vec_id AS neighbor_id,
             list_reduce(list(qd.d ORDER BY qd.s), (a, b) -> a + b) AS adc_dist
      FROM qd JOIN codes cd ON qd.s = cd.s AND qd.cluster = cd.cluster
      WHERE qd.query_id <> cd.vec_id
      GROUP BY qd.query_id, cd.vec_id
    )
    SELECT query_id, neighbor_id, adc_dist, CAST(rnk AS INT) AS rank FROM (
      SELECT query_id, neighbor_id, adc_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, neighbor_id) AS rnk
      FROM adc
    ) WHERE rnk <= {topk}
    """)
    return "".join(parts)


def _ivfpq_oracle_sql(
    kc=4, nc=2, m=2, k_sub=4, npq=2, n_probe=2, topk=5, dim=64, max_qid=10
) -> str:
    """DuckDB replay of the IVF-PQ composite (ivfpq_encode +
    ivfpq_topk): the coarse Lloyd unroll (_kmeans_assigned_cte), the
    residual relation, the PQ unroll ON RESIDUALS (pc*/pd*/pa*/pm* CTE
    family), coarse-list probing, query-residual distance tables and
    the subspace-ordered ADC fold."""
    sd = dim // m
    sq = (
        f"list_reduce(list_transform(range(1, {sd + 1}), "
        "i -> (t.sv[i] - c.c[i]) * (t.sv[i] - c.c[i])), (a, b) -> a + b)"
    )
    parts = [_kmeans_assigned_cte(kc, nc, dim)]
    parts.append(f""",
    res AS (
      SELECT a.vec_id, a.cluster,
             list_transform(range(1, {dim + 1}), i -> e.v[i] - c.c[i]) AS v
      FROM assigned a JOIN emb e USING (vec_id) JOIN c{nc} c USING (cluster)
    ),
    psub AS (
      SELECT r.vec_id, s.s, r.v[s.s * {sd} + 1 : (s.s + 1) * {sd}] AS sv
      FROM res r, range(0, {m}) s(s)
    ),
    pc0 AS (
      SELECT s, code, sv AS c FROM (
        SELECT s, vec_id, sv,
               row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS code
        FROM psub
      ) WHERE code < {k_sub}
    )""")
    for n in range(1, npq + 1):
        parts.append(f""",
    pd{n} AS (
      SELECT t.vec_id, t.s, c.code, {sq} AS dist
      FROM psub t JOIN pc{n - 1} c USING (s)
    ),
    pa{n} AS (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rn
        FROM pd{n}
      ) WHERE rn = 1
    ),
    pm{n} AS (
      SELECT a.s, a.code, p.pos,
             list_reduce(list(t.sv[p.pos] ORDER BY t.vec_id), (x, y) -> x + y)
               / count(*) AS mu
      FROM pa{n} a JOIN psub t USING (vec_id, s), range(1, {sd + 1}) p(pos)
      GROUP BY a.s, a.code, p.pos
    ),
    pc{n} AS (
      SELECT pc.s, pc.code, coalesce(nc2.c, pc.c) AS c
      FROM pc{n - 1} pc LEFT JOIN (
        SELECT s, code, list(mu ORDER BY pos) AS c
        FROM pm{n} GROUP BY s, code
      ) nc2 USING (s, code)
    )""")
    parts.append(f""",
    pdfin AS (
      SELECT t.vec_id, t.s, c.code, {sq} AS dist
      FROM psub t JOIN pc{npq} c USING (s)
    ),
    codes AS (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rn
        FROM pdfin
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT vec_id AS query_id, cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        FROM dfin WHERE vec_id < {max_qid}
      ) WHERE rn <= {n_probe}
    ),
    qres AS (
      SELECT p.query_id, p.cluster,
             list_transform(range(1, {dim + 1}), i -> e.v[i] - c.c[i]) AS v
      FROM probe p JOIN emb e ON e.vec_id = p.query_id
      JOIN c{nc} c USING (cluster)
    ),
    qd AS (
      SELECT t.query_id, t.cluster, t.s, c.code, {sq} AS d
      FROM (
        SELECT query_id, cluster, s.s,
               v[s.s * {sd} + 1 : (s.s + 1) * {sd}] AS sv
        FROM qres, range(0, {m}) s(s)
      ) t JOIN pc{npq} c USING (s)
    ),
    cand AS (
      SELECT p.query_id, p.cluster, a.vec_id AS neighbor_id
      FROM probe p JOIN assigned a USING (cluster)
      WHERE a.vec_id <> p.query_id
    ),
    adc AS (
      SELECT cn.query_id, cn.neighbor_id,
             list_reduce(list(qd.d ORDER BY qd.s), (a, b) -> a + b) AS adc_dist
      FROM cand cn
      JOIN codes cd ON cd.vec_id = cn.neighbor_id
      JOIN qd ON qd.query_id = cn.query_id AND qd.cluster = cn.cluster
             AND qd.s = cd.s AND qd.code = cd.code
      GROUP BY cn.query_id, cn.neighbor_id
    )
    SELECT query_id, neighbor_id, adc_dist, CAST(rnk AS INT) AS rank FROM (
      SELECT query_id, neighbor_id, adc_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, neighbor_id) AS rnk
      FROM adc
    ) WHERE rnk <= {topk}
    """)
    return "".join(parts)


@_q(
    "ann_topk_ivfpq",
    "The FAISS-style IVF-PQ composite index: deterministic coarse "
    "k-means lists, product-quantization codebooks fitted on the "
    "RESIDUALS (vector minus coarse centroid), queries probe n_probe "
    "lists and score candidates by ADC against per-(query, list) "
    "residual distance tables — probe-pruned candidates x m-byte codes "
    "is the architecture that actually serves ANN at 100 TB. Oracle "
    "unrolls coarse fit, residuals, residual-PQ fit, probing and the "
    "ADC fold in one SQL replay",
    "ext:similarity-ivfpq",
    _ivfpq_oracle_sql(),
)
def q_ann_topk_ivfpq(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.ivf import (
        kmeans_fit,
    )
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_topk,
    )

    emb = _t(spark, sf, "embeddings")
    cents = kmeans_fit(emb, k=4, n_iter=2)
    encoded, cbs = ivfpq_encode(emb, cents, m=2, k_sub=4, n_iter=2, dim=64)
    return ivfpq_topk(
        encoded, emb.filter("vec_id < 10"), cents, cbs, k=5, n_probe=2, dim=64
    )


@_q(
    "ann_topk_pq",
    "Product-quantization ANN (Jégou/Douze/Schmid, TPAMI 2011): joint "
    "per-subspace deterministic k-means codebooks (one Lloyd loop for "
    "all m subspaces), corpus compressed to m code ids at scan stage "
    "with no shuffle, queries score via ADC lookup-table folds against "
    "a broadcast query side — the oracle unrolls the per-subspace fit, "
    "the code assignment, and the subspace-ordered ADC sum in SQL",
    "ext:similarity-pq",
    _pq_oracle_sql(),
)
def q_ann_topk_pq(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        pq_fit,
    )

    emb = _t(spark, sf, "embeddings")
    cb = pq_fit(emb, m=4, k_sub=8, n_iter=2, dim=64)
    enc = pq_encode(emb, cb, dim=64)
    return pq_adc_topk(enc, emb.filter("vec_id < 10"), cb, k=5, dim=64)


def _semantic_dedup_oracle_sql(k=8, n_iter=2, dim=64, thr="0.30") -> str:
    cos = _sql_cosine("a", "b", dim)
    return (
        _kmeans_assigned_cte(k, n_iter, dim)
        + f""",
    pairs AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM assigned x JOIN assigned y
        ON x.cluster = y.cluster AND x.vec_id < y.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM (
      SELECT pairs.id_a, pairs.id_b, {cos} AS cos_sim
      FROM pairs
      JOIN embeddings a ON a.vec_id = pairs.id_a
      JOIN embeddings b ON b.vec_id = pairs.id_b
    ) WHERE cos_sim >= {thr}
    """
    )


@_q(
    "semantic_dedup_pairs",
    "SemDeDup-style semantic near-duplicate pairs over the FULL corpus: "
    "a coarse k-means quantizer buckets embeddings, then cosine pairs "
    "are scored only WITHIN each cluster — the all-pairs join never "
    "happens (contrast embedding_near_dup, which brute-forces a bounded "
    "id slice). At 100 TB: pair space shrinks ~k-fold per cluster, the "
    "self-join shuffles once on the cluster key, and cluster becomes a "
    "partition column so each reducer sees one cluster's vectors",
    "extension: curation (semantic dedup over embeddings)",
    _semantic_dedup_oracle_sql(),
)
def q_semantic_dedup_pairs(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.ivf import (
        ivf_assign,
        kmeans_fit,
    )
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        arrow_cosine_scores,
        norm,
    )

    emb = _t(spark, sf, "embeddings")
    centroids = kmeans_fit(emb, k=8, n_iter=2)
    # Norms computed once per ROW below the self-join (2N sqrt-folds
    # instead of 2 per PAIR); pair scoring runs through the vectorized
    # same-accumulation-order Arrow kernel (r13 opt: ~250k in-cluster
    # pairs at sf0.1 made the interpreted HOF fold the dominant cost —
    # 6.5 s → 3.4 s, bit-identical results, oracle-checked).
    clustered = ivf_assign(emb, centroids).select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm"), "cluster"
    )
    a, b = clustered.alias("a"), clustered.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.col("a.embedding").alias("va"),
        F.col("a.nrm").alias("na"),
        F.col("b.embedding").alias("vb"),
        F.col("b.nrm").alias("nb"),
    )
    return arrow_cosine_scores(pairs).filter(F.col("cos_sim") >= 0.30)


@_q(
    "media_features",
    "Multimodal plumbing: binary payloads → Arrow-batched feature "
    "extraction via mapInPandas; the fake decode backend hashes the "
    "payload hex so DuckDB reproduces features in string-space",
    "ext:multimodal",
    """
    WITH m AS (
      SELECT i AS media_id,
             CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             repeat(md5('media' || i), CAST(i % 7 AS INT) + 1) AS payload_hex
      FROM range(100) r(i)
    )
    SELECT media_id, media_type,
           CAST(length(payload_hex) // 2 AS INT) AS n_bytes,
           ('0x' || substr(md5(media_type || '|' || payload_hex), 1, 2))::INT
             / 256.0 AS f0
    FROM m
    """,
)
def q_media_features(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )

    media = synthetic_media(spark, 100)
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.element_at("feature", 1).cast("double").alias("f0"),
    )



# =====================================================================
# Batch 2: set ops, subqueries, JSON, as-of/range joins, window family
# =====================================================================

@_q(
    "set_ops_union",
    "UNION (distinct) of two key sets",
    "set-op surface",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_set_ops_union(spark, sf):
    a = _t(spark, sf, "customer").filter("c_mktsegment = 'BUILDING'").select(
        F.col("c_custkey").alias("custkey")
    )
    b = _t(spark, sf, "orders").filter("o_orderpriority = '1-URGENT'").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@_q(
    "set_ops_intersect",
    "INTERSECT of two key sets",
    "set-op surface",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_set_ops_intersect(spark, sf):
    a = _t(spark, sf, "customer").filter("c_mktsegment = 'BUILDING'").select(
        F.col("c_custkey").alias("custkey")
    )
    b = _t(spark, sf, "orders").filter("o_orderpriority = '1-URGENT'").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@_q(
    "set_ops_except",
    "EXCEPT (distinct) of two key sets",
    "set-op surface",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_set_ops_except(spark, sf):
    a = _t(spark, sf, "customer").filter("c_mktsegment = 'BUILDING'").select(
        F.col("c_custkey").alias("custkey")
    )
    b = _t(spark, sf, "orders").filter("o_orderpriority = '1-URGENT'").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b).distinct()


@_q(
    "like_filter",
    "LIKE pattern filter + substring",
    "string function surface",
    """
    SELECT p_partkey, p_type, substr(p_brand, 7) AS brand_num
    FROM part WHERE p_type LIKE '%%AND%%'
    """,
)
def q_like_filter(spark, sf):
    return (
        _t(spark, sf, "part")
        .filter(F.col("p_type").like("%AND%"))
        .select("p_partkey", "p_type", F.substring("p_brand", 7, 2147483647).alias("brand_num"))
    )


@_q(
    "date_arithmetic",
    "Date difference / truncation arithmetic",
    "date function surface (F7/F9 family)",
    """
    SELECT o_orderstatus,
           CAST(avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS DOUBLE)
             AS avg_ship_days,
           min(date_trunc('month', CAST(o_orderdate AS DATE))) AS first_month
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def q_date_arithmetic(spark, sf):
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    dd = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            (F.sum(dd).cast("double") / F.count(F.lit(1))).alias("avg_ship_days"),
            F.min(F.trunc(F.to_date("o_orderdate"), "month")).alias("first_month"),
        )
    )


@_q(
    "having_filter",
    "GROUP BY ... HAVING post-aggregation predicate",
    "agg surface",
    """
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) >= 12
    """,
)
def q_having_filter(spark, sf):
    return (
        _t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 12)
    )


@_q(
    "scalar_subquery",
    "Scalar subquery threshold (orders above global average price)",
    "subquery surface",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM orders
    ) * 1.5
    """,
)
def q_scalar_subquery(spark, sf):
    o = _t(spark, sf, "orders")
    avg_df = o.agg(
        (F.sum(_dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("__avg")
    )
    return (
        o.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("__avg") * 1.5)
        .select("o_orderkey", "o_totalprice")
    )


@_q(
    "json_extract",
    "JSON field extraction from a string column",
    "semi-structured surface (events.props)",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def q_json_extract(spark, sf):
    return (
        _t(spark, sf, "events")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .filter(F.col("k").isNotNull())
    )


@_q(
    "topk_per_group",
    "Top-3 parts by revenue within each brand (windowed rank)",
    "window surface (top-k per group pattern)",
    """
    SELECT p_brand, p_partkey, revenue, CAST(rnk AS INT) AS rnk FROM (
      SELECT p_brand, p_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             row_number() OVER (
               PARTITION BY p_brand
               ORDER BY CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) DESC,
                        p_partkey ASC) AS rnk
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, p_partkey
    ) WHERE rnk <= 3
    """,
)
def q_topk_per_group(spark, sf):
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    per_part = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), F.col("p_partkey").asc()
    )
    return (
        per_part.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 3")
        .select("p_brand", "p_partkey", "revenue", "rnk")
    )


@_q(
    "rank_dense_ntile",
    "rank / dense_rank / ntile window family",
    "window surface",
    """
    SELECT c_custkey,
           CAST(rank() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS rnk,
           CAST(dense_rank() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS drnk,
           CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS quartile
    FROM customer
    """,
)
def q_rank_dense_ntile(spark, sf):
    """Two-phase global ranks (r13): the naive ``Window.orderBy(...)``
    funnels the whole relation through ONE WindowExec partition — the
    canonical scale-killer. ``distributed_ranks`` range-shuffles on the
    full order key (ties never span ranges), ranks locally, and adds
    broadcast per-range offsets — same values, ``n_ranges``-way
    parallel."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import distributed_ranks

    c = _t(spark, sf, "customer").select("c_custkey", "c_acctbal")
    ranked = distributed_ranks(
        c, [("c_acctbal", "desc"), ("c_custkey", "asc")],
        rank_col="rnk", dense_rank_col="drnk", ntile=(4, "quartile"),
    )
    return ranked.select(
        "c_custkey",
        F.col("rnk").cast("int").alias("rnk"),
        F.col("drnk").cast("int").alias("drnk"),
        F.col("quartile").cast("int").alias("quartile"),
    )


@_q(
    "moving_average",
    "Moving average over a row frame (7 preceding rows)",
    "window surface",
    """
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS moving_avg
    FROM orders
    """,
)
def q_moving_average(spark, sf):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, Window.currentRow)
    )
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        (F.sum(_dec("o_totalprice")).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "moving_avg"
        ),
    )


@_q(
    "asof_join",
    "As-of join: each purchase matched to the user's most recent prior "
    "click (carry-forward window — Spark's as-of composition)",
    "ext:asof-join (OLAP pattern; Spark lacks native as-of)",
    """
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, CAST(asof_click_ts AS TIMESTAMP) AS asof_click_ts FROM (
      SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_click_ts
      FROM events WHERE event_type IN ('click', 'purchase')
    ) WHERE event_type = 'purchase'
    """,
)
def q_asof_join(spark, sf):
    e = _t(spark, sf, "events").filter(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    asof = F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w)
    return (
        e.withColumn("asof_click_ts", asof)
        .filter("event_type = 'purchase'")
        .select("event_id", "user_id", "ts", "asof_click_ts")
    )


@_q(
    "range_join",
    "Range join: order pairs of the same customer within 30 days "
    "(equi-key co-partition + range predicate — the scale-safe shape)",
    "ext:range-join",
    """
    SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND abs(date_diff('day', CAST(a.o_orderdate AS DATE), CAST(b.o_orderdate AS DATE))) <= 30
    """,
)
def q_range_join(spark, sf):
    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    a, b = o.alias("a"), o.alias("b")
    dd = F.abs(F.datediff(F.to_date("a.o_orderdate"), F.to_date("b.o_orderdate")))
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (dd <= 30),
        )
        .select(F.col("a.o_orderkey").alias("key_a"), F.col("b.o_orderkey").alias("key_b"))
    )


@_q(
    "exact_median",
    "Exact percentiles (interpolated median / p90)",
    "agg surface (quantiles)",
    """
    SELECT l_returnflag,
           CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty,
           CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_exact_median(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        )
    )


@_q(
    "cube_agg",
    "CUBE over two dimensions",
    "agg surface (grouping sets)",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_agg(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "count_distinct_groups",
    "Multiple exact COUNT(DISTINCT) per group",
    "agg surface",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def q_count_distinct_groups(spark, sf):
    return (
        _t(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )



# =====================================================================
# Batch 3: array analytics, ordered aggregation, text repetition
# =====================================================================

@_q(
    "embedding_stats",
    "Array-column analytics: per-label vector count and norm extremes "
    "(sequential double folds — order-free comparisons only)",
    "ext:array-analytics",
    """
    SELECT label,
           count(*) AS n_vectors,
           min(sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (a,b) -> a + b))) AS min_norm,
           max(sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (a,b) -> a + b))) AS max_norm
    FROM embeddings GROUP BY label
    """,
)
def q_embedding_stats(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import norm

    return (
        _t(spark, sf, "embeddings")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min(norm(F.col("embedding"))).alias("min_norm"),
            F.max(norm(F.col("embedding"))).alias("max_norm"),
        )
    )


@_q(
    "ordered_string_agg",
    "Deterministic ordered string aggregation per group",
    "agg surface (collect + order)",
    """
    SELECT n_name, string_agg(c_name, '|' ORDER BY c_name) AS members
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 9000
    GROUP BY n_name
    """,
)
def q_ordered_string_agg(spark, sf):
    c = _t(spark, sf, "customer").filter("c_acctbal > 9000")
    n = _t(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias("members"))
    )


@_q(
    "doc_repetition_ratio",
    "Token repetition ratio per document (Gopher-style repetition filter)",
    "ext:text-analysis",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS DOUBLE)
             AS repetition_ratio
    FROM t
    """,
)
def q_doc_repetition_ratio(spark, sf):
    toks = tokens(F.col("text"))
    return _t(spark, sf, "documents").select(
        "doc_id",
        (F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "repetition_ratio"
        ),
    )



@_q(
    "pandas_grouped_rank",
    "Grouped-map Pandas UDF (applyInPandas): per-brand part ranking by "
    "price — Arrow batch path, oracle = row_number window",
    "ext:pandas-udf (§2.8 surface)",
    """
    SELECT p_brand, p_partkey, CAST(rnk AS INT) AS rnk FROM (
      SELECT p_brand, p_partkey,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey ASC) AS rnk
      FROM part
    )
    """,
)
def q_pandas_grouped_rank(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.pandas_ops import (
        rank_within_group,
    )

    return rank_within_group(
        _t(spark, sf, "part"), "p_brand", "p_retailprice", "p_partkey"
    )


@_q(
    "approx_analytics",
    "Approximate aggregates (HLL distinct + quantile sketch), made "
    "oracle-checkable: the query computes exact twins in the same pass "
    "and emits within-5pct booleans; the oracle recomputes the exact "
    "columns and expects the booleans TRUE. Sketch internals stay "
    "engine-specific; the contract is the error bound.",
    "agg surface (approximate)",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS users_within_5pct,
           TRUE AS median_within_5pct
    FROM events GROUP BY event_type
    """,
)
def q_approx_analytics(spark, sf):
    e = _t(spark, sf, "events")
    # TWO aggregations joined on the group key, deliberately (r13 opt):
    # mixing COUNT(DISTINCT) with TypedImperative sketch aggs in ONE
    # groupBy makes Catalyst rewrite phase 1 to key by (event_type,
    # user_id) — building a 16k-register HLL and a 10000-bucket
    # percentile summary PER DISTINCT USER and merging ~25k of them per
    # group (measured 7.7-12.3 s at sf0.1 vs ~1 s split; the before/
    # after plans show the per-user ObjectHashAggregate disappear).
    # Split, each side is one clean two-phase agg; the join is a
    # |groups|-row broadcast. Null-safe equality keeps a NULL group.
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.expr("percentile(value, 0.5)").alias("_exact_median"),
    )
    approx = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("_approx_users"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("_approx_median"),
    ).withColumnRenamed("event_type", "_et")
    agg = exact.join(
        F.broadcast(approx), F.col("event_type").eqNullSafe(F.col("_et"))
    )
    return agg.select(
        "event_type",
        F.col("exact_users").cast("bigint").alias("exact_users"),
        (
            F.abs(F.col("_approx_users") - F.col("exact_users"))
            <= F.greatest(F.lit(1.0), F.col("exact_users") * F.lit(0.05))
        ).alias("users_within_5pct"),
        (
            F.abs(F.col("_approx_median") - F.col("_exact_median"))
            <= F.greatest(F.lit(1e-6), F.abs(F.col("_exact_median")) * F.lit(0.05))
        ).alias("median_within_5pct"),
    )



# =====================================================================
# Batch 5: outer joins, union-all, grouping sets, range frames
# =====================================================================

@_q(
    "left_outer_join",
    "LEFT OUTER join with NULL-extension and null-guarded aggregation",
    "join surface (outer)",
    """
    SELECT c_custkey,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           CAST(coalesce(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_left_outer_join(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast("decimal(28,2)"))
            .cast("double")
            .alias("spend"),
        )
    )


@_q(
    "full_outer_join",
    "FULL OUTER join of two aggregate sides",
    "join surface (outer)",
    """
    WITH buyers AS (
      SELECT o_custkey AS custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
    ), spenders AS (
      SELECT o_custkey AS custkey, count(*) AS n_urgent FROM orders
      WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
    )
    SELECT coalesce(b.custkey, s.custkey) AS custkey,
           b.n_orders, s.n_urgent
    FROM buyers b FULL OUTER JOIN spenders s ON b.custkey = s.custkey
    """,
)
def q_full_outer_join(spark, sf):
    o = _t(spark, sf, "orders")
    buyers = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    spenders = (
        o.filter("o_orderpriority = '1-URGENT'")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    b, sdf = buyers.alias("b"), spenders.alias("s")
    return b.join(sdf, F.col("b.custkey") == F.col("s.custkey"), "full").select(
        F.coalesce(F.col("b.custkey"), F.col("s.custkey")).alias("custkey"),
        F.col("b.n_orders"),
        F.col("s.n_urgent"),
    )


@_q(
    "union_all_counts",
    "UNION ALL (bag semantics) preserved through aggregation",
    "set-op surface",
    """
    SELECT src, count(*) AS n FROM (
      SELECT 'li' AS src FROM lineitem WHERE l_returnflag = 'R'
      UNION ALL
      SELECT 'ord' AS src FROM orders WHERE o_orderstatus = 'F'
    ) GROUP BY src
    """,
)
def q_union_all_counts(spark, sf):
    li = _t(spark, sf, "lineitem").filter("l_returnflag = 'R'").select(F.lit("li").alias("src"))
    o = _t(spark, sf, "orders").filter("o_orderstatus = 'F'").select(F.lit("ord").alias("src"))
    return li.unionAll(o).groupBy("src").agg(F.count(F.lit(1)).alias("n"))


@_q(
    "grouping_sets",
    "Explicit GROUPING SETS (finer than rollup/cube)",
    "agg surface (grouping sets)",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def q_grouping_sets(spark, sf):
    _t(spark, sf, "lineitem").createOrReplaceTempView("__li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@_q(
    "range_frame_window",
    "RANGE-framed window: orders within the prior 7 date_keys (value "
    "range, not row count)",
    "window surface (range frames)",
    """
    SELECT o_orderkey,
           CAST(count(*) OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS BIGINT)
             RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_recent
    FROM orders
    """,
)
def q_range_frame_window(spark, sf):
    dk = F.date_format(F.to_date("o_orderdate"), "yyyyMMdd").cast("bigint")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(dk)
        .rangeBetween(-7, Window.currentRow)
    )
    return _t(spark, sf, "orders").select(
        "o_orderkey", F.count(F.lit(1)).over(w).alias("n_recent")
    )


# =====================================================================
# Catalog batch 6: statistical moments, lag/lead, distribution windows,
# explode/unnest, unpivot — remaining standard analytics surface
# =====================================================================

@_q(
    "stats_moments",
    "Statistical aggregates (variance/stddev/covariance/correlation) via "
    "exact decimal partial sums — bit-identical across engines and "
    "partitionings (plain corr()/stddev() over doubles is summation-order "
    "dependent; this decomposes into exact Σx/Σx²/Σxy then one double "
    "formula on the driver side of the agg)",
    "implied agg surface (SURVEY §2.4); extension: ML-feature profiling",
    """
    SELECT l_returnflag,
           round((sxx - sx*sx/n) / (n-1), 9) AS var_qty,
           round(sqrt((sxx - sx*sx/n) / (n-1)), 9) AS stddev_qty,
           round((sxy - sx*sy/n) / (n-1), 9) AS covar_qty_price,
           round((sxy - sx*sy/n)
             / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n)), 9) AS corr_qty_price
    FROM (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    """,
)
def q_stats_moments(spark, sf):
    x, y = _dec("l_quantity"), _dec("l_extendedprice")
    sums = (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(x * x).cast("double").alias("sxx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum(y * y).cast("double").alias("syy"),
            F.sum(x * y).cast("double").alias("sxy"),
        )
    )
    # round(…, 9): the decimal partial sums are engine-exact, but the
    # final double formula can differ by 1 ulp across engines (FMA /
    # libm codegen); 9 dp is far above ulp noise at these magnitudes.
    return sums.selectExpr(
        "l_returnflag",
        "round((sxx - sx*sx/n) / (n-1), 9) AS var_qty",
        "round(sqrt((sxx - sx*sx/n) / (n-1)), 9) AS stddev_qty",
        "round((sxy - sx*sy/n) / (n-1), 9) AS covar_qty_price",
        "round((sxy - sx*sy/n) / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n)), 9)"
        "  AS corr_qty_price",
    )


@_q(
    "lag_lead_delta",
    "lag/lead: per-customer order-to-order day gaps (sequential diff in "
    "one window pass — no self-join)",
    "SURVEY §2.6 implied windowing; extension: funnel/retention analytics",
    """
    SELECT o_orderkey,
           CAST(date_diff('day',
                lag(CAST(o_orderdate AS DATE)) OVER w,
                CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev,
           CAST(date_diff('day',
                CAST(o_orderdate AS DATE),
                lead(CAST(o_orderdate AS DATE)) OVER w) AS INTEGER) AS days_until_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    """,
)
def q_lag_lead_delta(spark, sf):
    d = F.to_date("o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy(d, "o_orderkey")
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        F.datediff(d, F.lag(d).over(w)).alias("days_since_prev"),
        F.datediff(F.lead(d).over(w), d).alias("days_until_next"),
    )


@_q(
    "percent_rank_cume",
    "Distribution windows: percent_rank + cume_dist of supplier balance "
    "within nation (exact rationals — deterministic doubles)",
    "SURVEY §2.6 implied windowing",
    """
    SELECT s_suppkey,
           percent_rank() OVER w AS bal_pct_rank,
           cume_dist() OVER w AS bal_cume_dist
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
)
def q_percent_rank_cume(spark, sf):
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return _t(spark, sf, "supplier").select(
        "s_suppkey",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    )


@_q(
    "explode_unnest",
    "Array explode with ordinality: embedding vectors → (vec_id, pos, val) "
    "rows (posexplode ≙ unnest + generate_subscripts)",
    "extension: embedding-column preprocessing (BASELINE.json north star)",
    """
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings WHERE vec_id < 50
    """,
)
def q_explode_unnest(spark, sf):
    return (
        _t(spark, sf, "embeddings")
        .filter(F.col("vec_id") < 50)
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select(
            "vec_id",
            (F.col("pos") + 1).cast("int").alias("pos"),
            F.col("val").cast("double").alias("val"),
        )
    )


@_q(
    "unpivot_measures",
    "Unpivot (wide → long): lineitem measures as (measure, value) rows — "
    "Spark stack(); oracle as UNION ALL",
    "extension: metric normalization for feature stores",
    """
    SELECT l_orderkey, l_linenumber, 'qty' AS measure, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
)
def q_unpivot_measures(spark, sf):
    return _t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'qty', l_quantity, 'price', l_extendedprice,"
            " 'discount', l_discount) AS (measure, value)"
        ),
    )


@_q(
    "first_last_in_group",
    "first_value/last_value over an unbounded frame: each order tagged "
    "with its customer's first and latest order price",
    "SURVEY §2.6 implied windowing (SCD 'current version' shape)",
    """
    SELECT o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS latest_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_first_last_in_group(spark, sf):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.to_date("o_orderdate"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("latest_price"),
    )


@_q(
    "levenshtein_match",
    "Fuzzy string match: edit distance against a probe name, nearest "
    "candidates first (entity-resolution primitive)",
    "extension: record linkage / dedup candidate scoring",
    """
    SELECT c_custkey,
           CAST(levenshtein(c_name, 'Customer#000000042') AS INTEGER) AS edit_dist
    FROM customer
    WHERE levenshtein(c_name, 'Customer#000000042') <= 2
    """,
)
def q_levenshtein_match(spark, sf):
    d = F.levenshtein(F.col("c_name"), F.lit("Customer#000000042"))
    return (
        _t(spark, sf, "customer")
        .filter(d <= 2)
        .select("c_custkey", d.cast("int").alias("edit_dist"))
    )


@_q(
    "filtered_agg",
    "Conditional aggregation (FILTER clause): per-nation totals with "
    "segment-scoped sub-aggregates in ONE pass (no self-join)",
    "implied agg surface (SURVEY §2.4)",
    """
    SELECT c_nationkey,
           count(*) AS n_all,
           count(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS n_auto,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                FILTER (WHERE c_acctbal > 0) AS DOUBLE) AS pos_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def q_filtered_agg(spark, sf):
    return (
        _t(spark, sf, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_all"),
            F.count(F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1)).alias("n_auto"),
            F.sum(F.when(F.col("c_acctbal") > 0, _dec("c_acctbal")))
            .cast("double")
            .alias("pos_bal"),
        )
    )


@_q(
    "regexp_extract_groups",
    "Regexp group extraction: pull the numeric id out of the formatted "
    "customer name (parse-don't-split)",
    "F3 family (silver_Dimensions.py:154 regexp surface)",
    """
    SELECT c_custkey,
           CAST(nullif(regexp_extract(c_name, 'Customer#(\\d+)', 1), '') AS BIGINT)
             AS name_id
    FROM customer
    """,
)
def q_regexp_extract_groups(spark, sf):
    # nullif('') → no-match rows become NULL instead of an ANSI cast
    # error ('' is regexp_extract's no-match result in both engines)
    return _t(spark, sf, "customer").select(
        "c_custkey",
        F.nullif(F.regexp_extract(F.col("c_name"), r"Customer#(\d+)", 1), F.lit(""))
        .cast("bigint")
        .alias("name_id"),
    )


@_q(
    "histogram_bins",
    "Fixed-width histogram: order totals bucketed into 500-unit bins "
    "(single scan + group-by; bin math stays in codegen)",
    "F4 family (bucketing) + implied agg surface",
    """
    SELECT CAST(floor(o_totalprice / 500) * 500 AS BIGINT) AS bin_lo,
           count(*) AS n
    FROM orders GROUP BY 1
    """,
)
def q_histogram_bins(spark, sf):
    return (
        _t(spark, sf, "orders")
        .groupBy(
            (F.floor(F.col("o_totalprice") / 500) * 500).cast("bigint").alias("bin_lo")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "deterministic_sample",
    "Reproducible hash-based sampling: keep ~10% of documents by a "
    "portable md5 hash of the id — same rows selected on ANY engine, "
    "ANY partitioning, ANY run (unlike df.sample, whose row set depends "
    "on partition layout). The curation primitive for training-data "
    "subsets at 100 TB: a pure map-side filter, no shuffle, no state.",
    "extension: training-data curation (BASELINE.json north star)",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          % 100 < 10
    """,
)
def q_deterministic_sample(spark, sf):
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("smp|"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return (
        _t(spark, sf, "documents")
        .filter(h % 100 < 10)
        .select("doc_id", "lang")
    )


@_q(
    "dataset_split",
    "Deterministic train/val/test split assignment (80/10/10) by portable "
    "id hash — stable across engines and reruns; counts per split+lang "
    "verify the assignment, label distribution stays per-stratum fair",
    "extension: training-data curation (BASELINE.json north star)",
    """
    SELECT CASE
             WHEN b < 80 THEN 'train'
             WHEN b < 90 THEN 'val'
             ELSE 'test'
           END AS split,
           lang,
           count(*) AS n_docs
    FROM (
      SELECT lang,
             CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
             % 100 AS b
      FROM documents
    )
    GROUP BY split, lang
    """,
)
def q_dataset_split(spark, sf):
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split")
    )
    return (
        _t(spark, sf, "documents")
        .select(split, "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@_q(
    "mode_per_group",
    "Deterministic per-group mode (most frequent event type per user; "
    "ties break to the lexicographically smallest — unlike engine mode() "
    "kernels, reproducible on any engine/partitioning)",
    "agg surface (mode); extension: majority-category curation "
    "(e.g. dominant language per domain)",
    """
    SELECT user_id, event_type AS modal_event, n_events
    FROM (
      SELECT user_id, event_type, count(*) AS n_events,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type ASC) AS rn
      FROM events GROUP BY user_id, event_type
    ) WHERE rn = 1
    """,
)
def q_mode_per_group(spark, sf):
    counts = (
        _t(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", F.col("event_type").alias("modal_event"), "n_events")
    )


@_q(
    "date_spine_gapfill",
    "Gap-filled daily time series: generate the continuous day spine "
    "between min and max event dates and zero-fill days with no events "
    "(sequence + explode ⋈ left join)",
    "extension: time-series analytics (gap filling); SURVEY §2.3 calendar",
    """
    WITH bounds AS (
      SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events
    ),
    days AS (
      SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                         CAST(hi AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    counts AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_events FROM events GROUP BY 1
    )
    SELECT d.day AS day, COALESCE(c.n_events, 0) AS n_events
    FROM days d LEFT JOIN counts c USING (day)
    """,
)
def q_date_spine_gapfill(spark, sf):
    ev = _t(spark, sf, "events").select(F.to_date("ts").alias("day"))
    counts = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n_events"))
    spine = (
        ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    return spine.join(counts, "day", "left").select(
        "day", F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events")
    )


@_q(
    "funnel_conversion",
    "Two-step temporal funnel: of users whose first 'view' exists, how "
    "many later 'purchase' (strictly after that first view) — conditional "
    "temporal aggregation, no engine-specific funnel kernel",
    "extension: behavioral/funnel analytics over the events stream",
    """
    WITH fv AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
      SELECT DISTINCT f.user_id
      FROM fv f JOIN events e
        ON e.user_id = f.user_id AND e.event_type = 'purchase'
       AND e.ts > f.first_view
    )
    SELECT (SELECT count(*) FROM fv) AS n_viewers,
           (SELECT count(*) FROM conv) AS n_converted,
           round(CAST((SELECT count(*) FROM conv) AS DOUBLE)
                 / (SELECT count(*) FROM fv), 9) AS conversion_rate
    """,
)
def q_funnel_conversion(spark, sf):
    ev = _t(spark, sf, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    conv = (
        fv.join(
            purchases,
            (fv.user_id == purchases.user_id) & (purchases.ts > fv.first_view),
            "inner",
        )
        .select(fv.user_id)
        .distinct()
    )
    n_v = fv.agg(F.count(F.lit(1)).alias("n_viewers"))
    n_c = conv.agg(F.count(F.lit(1)).alias("n_converted"))
    return n_v.crossJoin(n_c).select(
        "n_viewers",
        "n_converted",
        F.round(F.col("n_converted").cast("double") / F.col("n_viewers"), 9).alias(
            "conversion_rate"
        ),
    )


@_q(
    "pii_redaction",
    "PII scrub: regex redaction of phone/email/IP patterns with per-row "
    "match counts (pure regexp_replace chain, scan-stage at 100 TB). "
    "Contact strings are derived deterministically from customer fields "
    "(the synthetic corpus carries no natural PII)",
    "extension: training-data curation (PII removal)",
    r"""
    WITH c AS (
      SELECT c_custkey,
             'Contact ' || c_name || ' at '
               || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-'
               || lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-'
               || lpad(CAST((c_custkey * 13) % 10000 AS VARCHAR), 4, '0')
               || ' or ' || lower(replace(c_name, '#', '')) || '@example.com'
               || ' seg ' || c_mktsegment AS contact
      FROM customer
    )
    SELECT c_custkey,
           regexp_replace(
             regexp_replace(contact,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(contact,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
              + len(regexp_extract_all(contact, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
              + len(regexp_extract_all(contact, '\b\d{3}-\d{3}-\d{4}\b'))
              AS INT) AS n_redacted
    FROM c
    """,
)
def q_pii_redaction(spark, sf):
    c = _t(spark, sf, "customer")
    phone = F.concat_ws(
        "-",
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
        F.lpad((F.col("c_custkey") * 7 % 1000).cast("string"), 3, "0"),
        F.lpad((F.col("c_custkey") * 13 % 10000).cast("string"), 4, "0"),
    )
    email = F.concat(
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit(""))),
        F.lit("@example.com"),
    )
    contact = F.concat(
        F.lit("Contact "), F.col("c_name"), F.lit(" at "), phone,
        F.lit(" or "), email, F.lit(" seg "), F.col("c_mktsegment"),
    )
    return c.select(
        "c_custkey",
        tx.redact(contact).alias("scrubbed"),
        tx.redaction_count(contact).alias("n_redacted"),
    )


@_q(
    "doc_chunking",
    "Training-sample chunking: overlapping token windows (size 40, stride "
    "30) per document via split → start-sequence → explode → slice; only "
    "chunk rows ever shuffle, never the full text twice",
    "extension: training-data curation (context-window packing)",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), 30)) AS start FROM t
    )
    SELECT doc_id,
           CAST(start / 30 AS INT) AS chunk_idx,
           CAST(len(toks[start + 1 : start + 40]) AS INT) AS n_tokens,
           array_to_string(toks[start + 1 : start + 40], ' ') AS chunk_text
    FROM s
    """,
)
def q_doc_chunking(spark, sf):
    return tx.chunk_tokens(
        _t(spark, sf, "documents"), chunk_size=40, stride=30
    )


@_q(
    "contamination_check",
    "Train/eval contamination: 5-gram shingle overlap between the "
    "deterministic train (80%) and test (10%) hash-splits — eval docs "
    "sharing any shingle with the train set, with shared-shingle counts "
    "(shingle equi-join; no all-pairs, text never shuffles)",
    "extension: training-data curation (benchmark decontamination)",
    r"""
    WITH t AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % 100 AS b,
             string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, b, shingle FROM (
        SELECT doc_id, b,
               unnest(list_transform(
                 range(1, greatest(len(toks) - 4, 1) + 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                      || ' ' || toks[i+3] || ' ' || toks[i+4]
               )) AS shingle
        FROM t
      )
    ), tr AS (
      SELECT DISTINCT shingle FROM sh WHERE b < 80
    )
    SELECT sh.doc_id AS doc_id, count(*) AS n_shared_shingles
    FROM sh JOIN tr USING (shingle)
    WHERE sh.b >= 90
    GROUP BY sh.doc_id
    """,
)
def q_contamination_check(spark, sf):
    d = _t(spark, sf, "documents")
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    # Tokens materialized as a real column BELOW the explode (an inline
    # tokens() expression re-runs the regex split per element inside the
    # shingle lambda — O(tokens^2) splits per doc), and the md5 split
    # bucket is projected there too so it is computed once per document,
    # not once per exploded shingle.
    pre = d.select("doc_id", b.alias("b"), tokens(F.col("text")).alias("_toks"))
    sh = pre.select(
        "doc_id",
        "b",
        F.explode(shingles_from_tokens(F.col("_toks"), 5)).alias("shingle"),
    )
    train = sh.filter("b < 80").select("shingle").distinct()
    ev = sh.filter("b >= 90")
    return (
        ev.join(train, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


@_q(
    "embedding_normalize",
    "L2 normalization of the embedding column: vector norm and first "
    "normalized component (sequential double folds — identical operation "
    "order both engines; 9 dp rounding absorbs libm ulp drift)",
    "extension: embedding ops (unit-norm preprocessing for cosine ANN)",
    """
    SELECT vec_id,
           round(sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
             (a, b) -> a + b)), 9) AS l2_norm,
           round(CAST(embedding[1] AS DOUBLE)
             / sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
                 i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
                 (a, b) -> a + b)), 9) AS nrm_c0
    FROM embeddings
    """,
)
def q_embedding_normalize(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import norm

    nrm = norm(F.col("embedding"))
    c0 = F.element_at(F.col("embedding"), 1).cast("double")
    return _t(spark, sf, "embeddings").select(
        "vec_id",
        F.round(nrm, 9).alias("l2_norm"),
        F.round(c0 / nrm, 9).alias("nrm_c0"),
    )


@_q(
    "local_supplier_volume",
    "TPC-H Q5 shape: revenue by nation where customer and supplier are "
    "co-national, ASIA, one order year (6-table join; dims broadcast, "
    "facts join on their natural keys)",
    "J3 + implied multi-join agg surface",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY n_name
    """,
)
def q_local_supplier_volume(spark, sf):
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01"))
    )
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").filter("r_name = 'ASIA'")
    one = F.lit(1).cast(DEC)
    rev = _dec("l_extendedprice") * (one - _dec("l_discount"))
    # Suppliers restricted to ASIA via broadcast dims; the only wide
    # shuffle is lineitem ⋈ orders on the order key.
    s_asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    return (
        li.join(F.broadcast(s_asia), li.l_suppkey == s_asia.s_suppkey)
        .join(oc, li.l_orderkey == oc.o_orderkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@_q(
    "shipping_priority",
    "TPC-H Q3 shape: top-10 unshipped orders by revenue for one market "
    "segment (deterministic tie-break on order key)",
    "J3 + top-k surface",
    """
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
      AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
    GROUP BY o_orderkey, order_date, o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_shipping_priority(spark, sf):
    li = _t(spark, sf, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1998-06-01")
    )
    o = _t(spark, sf, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1998-06-01")
    )
    c = _t(spark, sf, "customer").filter("c_mktsegment = 'BUILDING'")
    one = F.lit(1).cast(DEC)
    rev = _dec("l_extendedprice") * (one - _dec("l_discount"))
    return (
        li.join(
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
                "o_orderkey",
                F.to_date("o_orderdate").alias("order_date"),
                "o_orderpriority",
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "order_date", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@_q(
    "top_ngrams",
    "Corpus vocabulary mining: top-20 trigrams by document frequency "
    "(distinct-per-doc explode → count; fully deterministic ordering)",
    "extension: text analysis (vocab/boilerplate mining)",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, ngram FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len(toks) - 2, 1) + 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
               )) AS ngram
        FROM t
      )
    )
    SELECT ngram, count(*) AS n_docs
    FROM sh GROUP BY ngram
    ORDER BY n_docs DESC, ngram ASC
    LIMIT 20
    """,
)
def q_top_ngrams(spark, sf):
    d = _t(spark, sf, "documents")
    # tokens materialized below the explode — see contamination_check.
    return (
        d.select("doc_id", tokens(F.col("text")).alias("_toks"))
        .select(
            "doc_id", F.explode(shingles_from_tokens(F.col("_toks"), 3)).alias("ngram")
        )
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("ngram").asc())
        .limit(20)
    )


@_q(
    "above_avg_orders",
    "Correlated-subquery semantics: orders strictly above their own "
    "customer's average order value (decorrelated to a window aggregate "
    "in Spark — one scan, one shuffle; DuckDB oracle keeps the "
    "decorrelated group-join form)",
    "SQL surface: correlated scalar subquery / decorrelation",
    """
    WITH a AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS cust_avg
      FROM orders GROUP BY o_custkey
    )
    SELECT o_orderkey, o.o_custkey AS o_custkey, o_totalprice, cust_avg
    FROM orders o JOIN a ON o.o_custkey = a.o_custkey
    WHERE o_totalprice > cust_avg
    """,
)
def q_above_avg_orders(spark, sf):
    w = Window.partitionBy("o_custkey")
    cust_avg = (
        F.sum(_dec("o_totalprice")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        _t(spark, sf, "orders")
        .withColumn("cust_avg", cust_avg)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


@_q(
    "stratified_sample",
    "Deterministic stratified sampling: a fixed 20% quota per stratum "
    "(language), members chosen by md5-hash order so the draw is "
    "reproducible across runs and engines. One hash-shuffle on the "
    "stratum key; per-stratum rank via window — the exact-quota shape "
    "that survives 100 TB (a fraction-based sample() can't hit exact "
    "per-class quotas for training-set class balance)",
    "extension: training-data curation (per-class sampling)",
    """
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank,
             count(*) OVER (PARTITION BY lang) AS stratum_n
      FROM documents
    )
    SELECT doc_id, lang, sample_rank, stratum_n
    FROM r WHERE sample_rank <= ceil(stratum_n * 0.2)
    """,
)
def q_stratified_sample(spark, sf):
    d = _t(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    cw = Window.partitionBy("lang")
    return (
        d.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .withColumn("stratum_n", F.count(F.lit(1)).over(cw))
        .filter(F.col("sample_rank") <= F.ceil(F.col("stratum_n") * F.lit(0.2)))
        .select("doc_id", "lang", "sample_rank", "stratum_n")
    )


@_q(
    "tfidf_top_terms",
    "Per-document top-3 salient terms by tf-idf with a LINEAR idf "
    "(score = tf * N / df). Linear rather than log idf is deliberate: "
    "tf*N is an exact int64 product and /df a single IEEE division, so "
    "the score is bit-identical across engines (ln() differs in the "
    "last ulp between JVM Math.log and libm, which would flip "
    "near-tie rankings). Shape at 100 TB: token explode stays in the "
    "scan stage, tf and df are map-side-combined aggs, the tf⋈df join "
    "shuffles on the term key (vocabulary-sized, not corpus-sized), "
    "and N is a 1-row broadcast",
    "extension: text analysis (term salience / keyword extraction)",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
      FROM documents
    ), tok2 AS (
      SELECT doc_id, term FROM tok WHERE term <> ''
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tok2 GROUP BY term
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf AS tf, df.df AS df,
             CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    ), r AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term ASC
      ) AS term_rank
      FROM scored
    )
    SELECT doc_id, term, tf, df, score, term_rank
    FROM r WHERE term_rank <= 3
    """,
)
def q_tfidf_top_terms(spark, sf):
    d = _t(spark, sf, "documents")
    tok = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        tok.select("doc_id", "term").distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("term_rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "term_rank")
    )


@_q(
    "skew_salted_latest",
    "Latest-event-per-user via the two-phase SALTED reducer "
    "(operators/skew.py::salted_latest_per_key): phase 1 keeps the "
    "newest row within each (key, salt) slice so a hot key's rows are "
    "spread across n_salt reducers; phase 2 picks the global newest "
    "from the <= n_salt survivors. Byte-identical result to the plain "
    "window dedup (the oracle), which is the point: the skew-safe "
    "physical shape is a drop-in for the single-reducer-per-key window "
    "that dies on a hot key at 100 TB",
    "A3/§2.6 (skew-aware variant of latest-per-key)",
    """
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_skew_salted_latest(spark, sf):
    e = _t(spark, sf, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    return salted_latest_per_key(e, ["user_id"], "ts", "event_id", n_salt=8)


# =====================================================================
# LLM-data extensions: corpus curation (packing / quotas / budgets / LM)
# =====================================================================

@_q(
    "sequence_packing",
    "Concat-and-chunk sequence packing: documents in deterministic md5 "
    "order are cut into 256-token packs, one independent stream per md5 "
    "shard (no global sort — the window partitions by shard, so "
    "parallelism is n_shards and all sums are exact integers)",
    "extension: training-data curation (sequence packing)",
    r"""
    WITH base AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('pack|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS tok
      FROM documents
    ),
    packed AS (
      SELECT CAST(h % 8 AS INT) AS shard, tok,
             SUM(tok) OVER (PARTITION BY h % 8 ORDER BY h, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM base
    )
    SELECT shard, CAST(floor((cum - tok) / 256) AS BIGINT) AS pack_id,
           count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS pack_tokens
    FROM packed GROUP BY shard, pack_id
    """,
)
def q_sequence_packing(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        sequence_packing,
    )

    return sequence_packing(_t(spark, sf, "documents"), budget=256, n_shards=8)


@_q(
    "quota_per_source",
    "Domain-mix rebalancing: cap every source at 15 documents picked in "
    "portable md5 order — deterministic 'n per domain' sampling, stable "
    "across engines/partitionings/reruns",
    "extension: training-data curation (domain quotas)",
    """
    SELECT doc_id, source, CAST(rn AS INT) AS pick_rank FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CAST(('0x' || substr(md5('quota|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                        doc_id) AS rn
      FROM documents
    ) WHERE rn <= 15
    """,
)
def q_quota_per_source(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        quota_per_group,
    )

    return quota_per_group(_t(spark, sf, "documents"), "source", quota=15)


@_q(
    "token_budget_head",
    "Deterministic corpus subset under a GLOBAL 5000-token budget via a "
    "distributed prefix sum: per-shard running sums + an exclusive "
    "prefix over the n_shards-row totals broadcast back — no global "
    "sort, no driver state; the oracle replays it as one global window",
    "extension: training-data curation (token budgets)",
    r"""
    WITH base AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('budget|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
             CAST(CASE WHEN trim(text) = '' THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS tok
      FROM documents
    )
    SELECT doc_id, CAST(cum AS BIGINT) AS cum_tokens FROM (
      SELECT doc_id,
             SUM(tok) OVER (ORDER BY CAST(h % 16 AS INT), h, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM base
    ) WHERE cum <= 5000
    """,
)
def q_token_budget_head(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        token_budget_head,
    )

    return token_budget_head(_t(spark, sf, "documents"), budget=5000, n_shards=16)


@_q(
    "bigram_lm_score",
    "Corpus-trained add-one-smoothed bigram LM score per document (mean "
    "of p(w2|w1) = (c12+1)/(c1+V)) — the classic LM quality signal, "
    "kept in probability space so every value is a ratio of exact "
    "integers (ln() implementations differ across engines); per-doc "
    "mean is an ordered sequential fold",
    "extension: training-data curation (LM quality scoring)",
    r"""
    WITH ww AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
      FROM documents WHERE trim(text) <> ''
    ),
    bg0 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws)),
               i -> struct_pack(pos := i, w1 := ws[i],
                                bg := ws[i] || ' ' || ws[i + 1]))) AS s
      FROM ww
    ),
    bg AS (SELECT doc_id, s.pos AS pos, s.w1 AS w1, s.bg AS bg FROM bg0),
    c2 AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    v AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(ws) AS w FROM ww)),
    p AS (
      SELECT b.doc_id, b.pos,
             CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE) AS p
      FROM bg b JOIN c2 USING (bg) JOIN c1 USING (w1) CROSS JOIN v
    )
    SELECT doc_id, CAST(count(*) AS INT) AS n_bigrams,
           list_reduce(list(p ORDER BY pos), (a, b) -> a + b) / count(*) AS lm_score
    FROM p GROUP BY doc_id
    """,
)
def q_bigram_lm_score(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        bigram_lm_score,
    )

    return bigram_lm_score(_t(spark, sf, "documents"))


@_q(
    "bm25_topk",
    "Okapi BM25 relevance ranking for a bag-of-words query (k1=1.2, "
    "b=0.75) in ratio-idf mode — the idf stays ((N-df+0.5)/(df+0.5))+1 "
    "without the ln() so every value is plain IEEE arithmetic on exact "
    "integer counts (the log mode exists for production and is pinned "
    "by unit tests instead). Query terms filter BEFORE the token "
    "stream shuffles; df/stats relations broadcast; per-doc fold is "
    "|Q|-bounded; top-20 via TakeOrderedAndProject",
    "extension: full-text relevance ranking (BM25)",
    r"""
    WITH base AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
      FROM documents WHERE trim(text) <> ''
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(ws)) AS BIGINT) AS n_toks
      FROM base
    ),
    dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM base),
    tf AS (
      SELECT doc_id, w, count(*) AS tf
      FROM (SELECT doc_id, unnest(ws) AS w FROM base)
      WHERE w IN ('vector', 'merge', 'spark', 'window')
      GROUP BY doc_id, w
    ),
    df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    sc AS (
      SELECT tf.doc_id, tf.w,
             ((CAST(stats.n_docs AS DOUBLE) - df.df + 0.5)
                / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
             * ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                / (CAST(tf.tf AS DOUBLE)
                   + 1.2 * (1.0 - 0.75
                            + 0.75 * (CAST(dl.dl AS DOUBLE)
                                      / (CAST(stats.n_toks AS DOUBLE)
                                         / CAST(stats.n_docs AS DOUBLE)))))) AS s
      FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN stats
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS INT) AS n_hit_terms,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(s ORDER BY w)),
               (a, b) -> a + b) AS bm25
      FROM sc GROUP BY doc_id
    )
    SELECT doc_id, n_hit_terms, bm25, CAST(rn AS INT) AS sel_rank FROM (
      SELECT doc_id, n_hit_terms, bm25,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn
      FROM agg
    ) WHERE rn <= 20
    """,
)
def q_bm25_topk(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.ranking import (
        bm25_topk,
    )

    return bm25_topk(
        _t(spark, sf, "documents"),
        ["vector", "merge", "spark", "window"],
        idf="ratio",
    )


@_q(
    "lateral_topn_join",
    "Correlated LATERAL subquery (Spark 4 lateral join surface): each "
    "of the 20 highest-balance customers pulls its own top-2 orders by "
    "price inside the lateral body — the per-row-subquery shape that "
    "SQL users reach for before discovering window top-k; Catalyst "
    "decorrelates it to the same join+window plan",
    "§2.5 joins (correlated LATERAL subquery)",
    """
    WITH topc AS (
      SELECT c_custkey FROM customer
      ORDER BY c_acctbal DESC, c_custkey LIMIT 20
    )
    SELECT c.c_custkey, o.o_orderkey,
           CAST(o.o_totalprice AS DOUBLE) AS price
    FROM topc c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) o
    """,
)
def q_lateral_topn_join(spark, sf):
    _t(spark, sf, "customer").createOrReplaceTempView("__cust_lat")
    _t(spark, sf, "orders").createOrReplaceTempView("__ord_lat")
    return spark.sql(
        """
        WITH topc AS (
          SELECT c_custkey FROM __cust_lat
          ORDER BY c_acctbal DESC, c_custkey LIMIT 20
        )
        SELECT c.c_custkey, o.o_orderkey,
               CAST(o.o_totalprice AS DOUBLE) AS price
        FROM topc c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM __ord_lat
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) o
        """
    )


@_q(
    "temperature_mixture_sample",
    "Temperature-flattened domain mixture (the DoReMi/multilingual-"
    "sampling shape at T=2): per-source weights w_i = sqrt(n_i) / "
    "sum_j sqrt(n_j) up-weight small domains; each source then "
    "contributes ceil(300 * w_i) documents (capped at n_i) picked in "
    "portable-md5 order. sqrt is IEEE-correctly-rounded (cross-engine "
    "exact, unlike pow/ln) and the 20-term weight denominator folds in "
    "source order — bit-identical totals. The weight relation is "
    "n_sources rows, broadcast back; selection is one window per "
    "source",
    "extension: training-data curation (mixture reweighting)",
    r"""
    WITH n AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    denom AS (
      SELECT list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(sqrt(CAST(n AS DOUBLE)) ORDER BY source)),
               (a, b) -> a + b) AS d
      FROM n
    ),
    quota AS (
      SELECT n.source,
             CAST(ceil(300 * (sqrt(CAST(n.n AS DOUBLE)) / denom.d)) AS BIGINT)
               AS q
      FROM n CROSS JOIN denom
    )
    SELECT doc_id, source, CAST(rn AS INT) AS pick_rank FROM (
      SELECT d.doc_id, d.source, q.q,
             row_number() OVER (
               PARTITION BY d.source
               ORDER BY CAST(('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                        d.doc_id) AS rn
      FROM documents d JOIN quota q USING (source)
    ) WHERE rn <= q
    """,
)
def q_temperature_mixture_sample(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        temperature_mixture_sample,
    )

    return temperature_mixture_sample(
        _t(spark, sf, "documents"), "source", target_total=300
    )


@_q(
    "zscore_normalize",
    "Per-group z-score standardization: group mean/std from EXACT "
    "decimal partial sums (the stats_moments rule — bit-identical "
    "under any partitioning), the 3-row stats relation broadcast back "
    "onto a ship-date slice, z = round((x - mean) / std, 9) with "
    "pinned operation order (rounded like stats_moments: DuckDB's "
    "decimal-to-double cast double-rounds once the scaled int passes "
    "2^53). The normalization transform row-level twin of the "
    "stats_moments summary entry",
    "extension: feature engineering (group-wise standardization)",
    """
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           CAST(l.l_extendedprice AS DOUBLE) AS price,
           round((CAST(l.l_extendedprice AS DOUBLE) - s.sx / s.n)
                 / sqrt((s.sxx - s.sx * s.sx / s.n) / (s.n - 1)), 9) AS z
    FROM lineitem l JOIN s USING (l_returnflag)
    WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1996-04-01'
    """,
)
def q_zscore_normalize(spark, sf):
    li = _t(spark, sf, "lineitem")
    dp = _dec("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dp).cast("double").alias("sx"),
        F.sum(dp * dp).cast("double").alias("sxx"),
    )
    sliced = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    x = F.col("l_extendedprice").cast("double")
    mean = F.col("sx") / F.col("n")
    std = F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        / (F.col("n") - 1)
    )
    return sliced.join(F.broadcast(s), "l_returnflag").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        x.alias("price"),
        # round(9) like stats_moments: sxx's DECIMAL(38,4) scaled int
        # exceeds 2^53, and DuckDB's decimal->double cast (scaled-int
        # double divided by 10^scale, two roundings) can land 1 ulp off
        # Spark's correctly-rounded cast — observed at sf0.001.
        F.round((x - mean) / std, 9).alias("z"),
    )


@_q(
    "lang_adaptive_filter",
    "Per-language adaptive quality gate: each document is kept only if "
    "its Simpson lexical diversity reaches its OWN language's exact "
    "p25 (rank-selected, percentile_disc semantics with (value, id) "
    "tie-break) — the pattern that stops one global cutoff from "
    "penalizing entire languages. q=0.25 is an exact binary fraction "
    "so ceil(q*n) is engine-independent; thresholds form a 5-row "
    "broadcast relation. At 100 TB swap the exact rank pass for the "
    "mergeable quantile sketch (same broadcast-back shape)",
    "extension: training-data curation (adaptive quality thresholds)",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents
    ),
    c AS (SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
    a AS (
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cnt * cnt) AS BIGINT) AS ss
      FROM c GROUP BY doc_id
    ),
    m AS (
      SELECT a.doc_id, d.lang,
             1.0 - CAST(ss AS DOUBLE) / CAST(n * n AS DOUBLE) AS diversity
      FROM a JOIN documents d USING (doc_id)
    ),
    r AS (
      SELECT doc_id, lang, diversity,
             row_number() OVER (PARTITION BY lang
                                ORDER BY diversity, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM m
    ),
    t AS (
      SELECT lang, diversity AS threshold
      FROM r WHERE rn = CAST(ceil(0.25 * n) AS BIGINT)
    )
    SELECT m.doc_id, m.lang, m.diversity, t.threshold
    FROM m JOIN t USING (lang)
    WHERE m.diversity >= t.threshold
    """,
)
def q_lang_adaptive_filter(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        group_quantile_threshold,
    )

    d = _t(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    c = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    a = c.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"), F.sum(F.col("cnt") * F.col("cnt")).alias("ss")
    )
    m = a.join(d.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "lang",
        (
            F.lit(1.0)
            - F.col("ss").cast("double") / (F.col("n") * F.col("n")).cast("double")
        ).alias("diversity"),
    )
    return group_quantile_threshold(
        m, "lang", "diversity", "doc_id", q=0.25
    ).select("doc_id", "lang", "diversity", "threshold")


@_q(
    "dsir_importance_select",
    "DSIR-style importance resampling (Xie et al. 2023): hashed-unigram "
    "bucket counts over the target slice (lang='en') vs the whole "
    "corpus, per-token smoothed probability ratios from a broadcast "
    "<=1024-row stats relation, per-doc mean via position-ordered fold, "
    "top-50 selection by (score, id). Ratio space instead of the "
    "paper's log-ratios so every value is a quotient of exact-integer "
    "doubles (ln() low bits differ across engines)",
    "extension: training-data curation (importance resampling)",
    r"""
    WITH tw AS (
      SELECT doc_id, lang = 'en' AS is_tgt,
             unnest(list_transform(range(1, len(ws) + 1),
               i -> struct_pack(pos := i, w := ws[i]))) AS s
      FROM (
        SELECT doc_id, lang,
               string_split_regex(lower(trim(text)), '\s+') AS ws
        FROM documents WHERE trim(text) <> ''
      )
    ),
    toks AS (
      SELECT doc_id, is_tgt, s.pos AS pos,
             CAST(('0x' || substr(md5('dsir|' || s.w), 1, 15)) AS BIGINT) % 1024 AS bucket
      FROM tw
    ),
    src AS (SELECT bucket, count(*) AS cs FROM toks GROUP BY bucket),
    tgt AS (SELECT bucket, count(*) AS ct FROM toks WHERE is_tgt GROUP BY bucket),
    tot AS (SELECT count(*) AS ns, count(*) FILTER (is_tgt) AS nt FROM toks),
    stats AS (
      SELECT s.bucket,
             (CAST(coalesce(t.ct, 0) + 1 AS DOUBLE) / CAST(tot.nt + 1024 AS DOUBLE))
             / (CAST(s.cs + 1 AS DOUBLE) / CAST(tot.ns + 1024 AS DOUBLE)) AS r
      FROM src s LEFT JOIN tgt t USING (bucket) CROSS JOIN tot
    ),
    scored AS (
      SELECT toks.doc_id, CAST(count(*) AS INT) AS n_tokens,
             list_reduce(list(stats.r ORDER BY toks.pos), (a, b) -> a + b)
               / count(*) AS dsir_score
      FROM toks JOIN stats USING (bucket)
      GROUP BY toks.doc_id
    )
    SELECT doc_id, n_tokens, dsir_score, CAST(rn AS INT) AS sel_rank FROM (
      SELECT doc_id, n_tokens, dsir_score,
             row_number() OVER (ORDER BY dsir_score DESC, doc_id) AS rn
      FROM scored
    ) WHERE rn <= 50
    """,
)
def q_dsir_importance_select(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        dsir_select,
    )

    return dsir_select(_t(spark, sf, "documents"), target_expr="lang = 'en'")


@_q(
    "duplicated_span_dedup",
    "Substring-level dedup (Lee et al. 2022): every 5-token span "
    "occurring >= 2 times anywhere in the corpus is stripped from each "
    "document — one md5-span explode + one count shuffle + one "
    "flag-join; the per-doc coverage pass is pure array expressions "
    "(nothing quadratic in the corpus). Output: per-doc token counts "
    "and the cleaned text",
    "extension: dedup (duplicated token spans)",
    r"""
    WITH ww AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
      FROM documents WHERE trim(text) <> ''
    ),
    base AS (SELECT doc_id, ws, len(ws) AS n FROM ww),
    win AS (
      SELECT doc_id, i AS s, md5(array_to_string(ws[i:i+4], ' ')) AS fp
      FROM base, unnest(range(1, n - 5 + 2)) r(i)
      WHERE n >= 5
    ),
    cnt AS (SELECT fp, count(*) AS c FROM win GROUP BY fp),
    dup AS (
      SELECT w.doc_id, w.s FROM win w JOIN cnt USING (fp) WHERE cnt.c >= 2
    ),
    toks AS (
      SELECT doc_id, i AS t, ws[i] AS w
      FROM base, unnest(range(1, n + 1)) r(i)
    ),
    cov AS (
      SELECT DISTINCT t.doc_id, t.t
      FROM toks t JOIN dup d
        ON d.doc_id = t.doc_id AND t.t BETWEEN d.s AND d.s + 4
    )
    SELECT t.doc_id,
           CAST(count(*) AS INT) AS n_tokens,
           CAST(sum(CASE WHEN c.t IS NOT NULL THEN 1 ELSE 0 END) AS INT)
             AS n_dup_tokens,
           coalesce(string_agg(CASE WHEN c.t IS NULL THEN t.w END, ' '
                               ORDER BY t.t), '') AS clean_text
    FROM toks t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.t = t.t
    GROUP BY t.doc_id
    """,
)
def q_duplicated_span_dedup(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        duplicated_span_dedup,
    )

    return duplicated_span_dedup(
        _t(spark, sf, "documents"), window=5, min_count=2
    )


@_q(
    "gopher_rule_report",
    "Gopher/CCNet-style filter report: per-rule drop counts (token "
    "floor, mean-word-length band, tagged-language marker check) plus "
    "kept — all counters ride ONE corpus scan with map-side partial "
    "aggregation; adding rules costs nothing at 100 TB",
    "extension: training-data curation (quality-rule filtering)",
    r"""
    WITH t AS (
      SELECT lang,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok,
             CASE WHEN trim(text) = '' THEN 0.0
                  ELSE CAST(length(regexp_replace(trim(text), '\s+', ' ', 'g'))
                            - len(string_split_regex(trim(text), '\s+')) + 1 AS DOUBLE)
                       / len(string_split_regex(trim(text), '\s+')) END AS mwl,
             string_split_regex(lower(trim(text)), '\s+') AS toks,
             trim(text) AS ttext
      FROM documents
    ),
    f AS (
      SELECT (n_tok < 25) AS r_tok,
             (mwl < 4.0 OR mwl > 5.0) AS r_mwl,
             NOT (CASE lang
               WHEN 'en' THEN list_has_any(toks, ['the','and','of','to','a','is'])
               WHEN 'es' THEN list_has_any(toks, ['el','la','de','que','y','los'])
               WHEN 'fr' THEN list_has_any(toks, ['le','la','les','et','des','une'])
               WHEN 'de' THEN list_has_any(toks, ['der','die','und','das','ein','nicht'])
               WHEN 'zh' THEN (list_has_any(toks, ['的','是','了','在','我','有'])
                               OR regexp_matches(ttext, '[一-鿿]'))
               ELSE FALSE END) AS r_lang
      FROM t
    )
    SELECT 'too_few_tokens' AS rule, CAST(sum(CASE WHEN r_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_docs FROM f
    UNION ALL
    SELECT 'mean_word_len_out_of_band', CAST(sum(CASE WHEN r_mwl THEN 1 ELSE 0 END) AS BIGINT) FROM f
    UNION ALL
    SELECT 'missing_lang_marker', CAST(sum(CASE WHEN r_lang THEN 1 ELSE 0 END) AS BIGINT) FROM f
    UNION ALL
    SELECT 'kept', CAST(sum(CASE WHEN NOT (r_tok OR r_mwl OR r_lang) THEN 1 ELSE 0 END) AS BIGINT) FROM f
    """,
)
def q_gopher_rule_report(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.text import (
        gopher_rules,
        rule_filter_report,
    )

    d = _t(spark, sf, "documents")
    return rule_filter_report(d, gopher_rules(F.col("text"), F.col("lang")))


@_q(
    "vocab_build",
    "Tokenizer vocabulary construction: corpus token frequencies → "
    "frequency-ranked contiguous ids (ties by token text), top 1000. "
    "The global ranking runs over the VOCAB relation (Heaps-law "
    "sublinear in corpus size), never the token stream — the corpus "
    "pass is one map-side-combined count",
    "extension: training-data curation (tokenizer vocab)",
    r"""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents WHERE trim(text) <> ''
    ),
    freq AS (SELECT token, count(*) AS n FROM tok GROUP BY token)
    SELECT CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS INT) AS token_id,
           token, CAST(n AS BIGINT) AS freq
    FROM freq
    ORDER BY token_id
    LIMIT 1000
    """,
)
def q_vocab_build(spark, sf):
    d = _t(spark, sf, "documents")
    toks = d.filter(F.trim("text") != "").select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    return (
        freq.withColumn("token_id", F.row_number().over(w))
        .filter(F.col("token_id") <= 1000)
        .select("token_id", "token", "freq")
    )


def _pagerank_oracle(
    num_hashes=8, bands=4, threshold=0.5, damping=0.85, n_iter=5
) -> str:
    """DuckDB replay of graph.pagerank over the minhash near-dup graph:
    unrolled iterations, per-target contributions folded in ascending
    neighbor order (list ORDER BY u) — bit-identical to Spark's
    array_sort + sequential fold. Constants emitted with repr() so both
    engines use the same IEEE doubles."""
    tp = repr(1.0 - damping)
    dp = repr(damping)
    parts = [_minhash_edges_cte(num_hashes, bands, threshold), f""",
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    deg AS (SELECT u AS node, count(*) AS deg FROM edges GROUP BY u),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, 1.0::DOUBLE / nn.n AS r FROM nodes, nn)"""]
    for i in range(1, n_iter + 1):
        parts.append(f""",
    c{i} AS (
      SELECT e.v AS node,
             list_reduce(list(p.r / d.deg ORDER BY e.u), (a, b) -> a + b) AS s
      FROM edges e JOIN r{i - 1} p ON p.node = e.u JOIN deg d ON d.node = e.u
      GROUP BY e.v
    ),
    r{i} AS (
      SELECT n.node,
             {tp}::DOUBLE / nn.n + {dp}::DOUBLE * coalesce(c.s, 0.0::DOUBLE) AS r
      FROM nodes n CROSS JOIN nn LEFT JOIN c{i} c ON c.node = n.node
    )""")
    parts.append(f"""
    SELECT node, r AS pagerank FROM r{n_iter}
    """)
    return "".join(parts)


@_q(
    "neardup_graph_pagerank",
    "PageRank over the MinHash near-duplicate graph (5 unrolled "
    "iterations, damping 0.85): ranks expose hub documents inside "
    "duplicate clusters — the iterative-algorithm pattern beyond "
    "connected components. Per-target rank sums fold in ascending "
    "neighbor order, so every double is bit-identical to the oracle's "
    "unrolled replay",
    "extension: dedup analytics (graph ranking)",
    _pagerank_oracle(),
)
def q_neardup_graph_pagerank(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.graph import (
        pagerank,
        symmetrize,
    )

    d = _t(spark, sf, "documents")
    pairs = minhash_near_dup_pairs(
        d, num_hashes=8, bands=4, shingle_n=3
    ).filter(F.col("est_jaccard") >= 0.5)
    return pagerank(symmetrize(pairs), damping=0.85, n_iter=5).select(
        F.col("node"), F.col("rank").alias("pagerank")
    )


@_q(
    "cluster_balanced_sample",
    "Cluster-balanced corpus sampling: k-means-bucket the embeddings "
    "(same deterministic quantizer as IVF/SemDeDup) and cap every "
    "cluster at 40 vectors picked in portable md5 order — the "
    "embedding-space analogue of domain quotas, used to flatten "
    "semantic mode collapse in training mixes",
    "extension: training-data curation (cluster-balanced sampling)",
    _kmeans_assigned_cte(k=8, n_iter=2)
    + """
    SELECT vec_id, CAST(cluster AS INT) AS cluster,
           CAST(rn AS INT) AS pick_rank
    FROM (
      SELECT vec_id, cluster,
             row_number() OVER (
               PARTITION BY cluster
               ORDER BY CAST(('0x' || substr(md5('quota|' || CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT),
                        vec_id) AS rn
      FROM assigned
    ) WHERE rn <= 40
    """,
)
def q_cluster_balanced_sample(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        quota_per_group,
    )
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.ivf import (
        ivf_assign,
        kmeans_fit,
    )

    emb = _t(spark, sf, "embeddings")
    centroids = kmeans_fit(emb, k=8, n_iter=2)
    clustered = ivf_assign(emb, centroids).select("vec_id", "cluster")
    return quota_per_group(clustered, "cluster", quota=40, id_col="vec_id")


@_q(
    "bloom_decontaminate",
    "Benchmark decontamination via a broadcast Bloom prefilter: bloom "
    "built over the small eval-split shingle set, the big train side "
    "filtered MAP-SIDE at the scan (k bit-probes, no shuffle for the "
    ">99% that miss), tiny survivor set exact-confirmed — bit-identical "
    "to the plain exact join (no false negatives), which is what this "
    "oracle is",
    "extension: training-data curation (sketch-accelerated decontamination)",
    r"""
    WITH t AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % 100 AS b,
             string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, b, shingle FROM (
        SELECT doc_id, b,
               unnest(list_transform(
                 range(1, greatest(len(toks) - 4, 1) + 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                      || ' ' || toks[i+3] || ' ' || toks[i+4]
               )) AS shingle
        FROM t
      )
    ), tr AS (
      SELECT DISTINCT shingle FROM sh WHERE b < 80
    )
    SELECT sh.doc_id AS doc_id, count(*) AS n_shared_shingles
    FROM sh JOIN tr USING (shingle)
    WHERE sh.b >= 90
    GROUP BY sh.doc_id
    """,
)
def q_bloom_decontaminate(spark, sf):
    """Same answer as `contamination_check`, different physics: there
    the train side's distinct() shuffles every train shingle; here the
    Bloom pass drops non-matching train shingles at the scan stage, so
    only the survivor sliver (≈ eval∩train + ~0.24% false positives)
    ever shuffles. At 100 TB the train side is the corpus — this is the
    difference between shuffling terabytes and megabytes."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.bloomfilter import (
        bloom_build,
        bloom_member,
        bloom_relation,
    )

    d = _t(spark, sf, "documents")
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    pre = d.select("doc_id", b.alias("b"), tokens(F.col("text")).alias("_toks"))
    sh = pre.select(
        "doc_id",
        "b",
        F.explode(shingles_from_tokens(F.col("_toks"), 5)).alias("shingle"),
    )  # shingles_from_tokens is per-doc distinct already — no dedup shuffle
    ev = sh.filter("b >= 90")
    bloom = bloom_build(ev, "shingle")
    rel = bloom_relation(spark, bloom)
    train_surv = (
        sh.filter("b < 80")
        .join(F.broadcast(rel))
        .where(bloom_member(F.col("shingle"), bloom, F.col("_bloom_words")))
        .select("shingle")
        .distinct()
    )
    return (
        ev.join(train_surv, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


@_q(
    "ewma_smoothing",
    "Exponentially weighted moving average (α=0.5) of event values per "
    "user over a 20-row frame: list-collect over the ordered frame, "
    "sequential left fold acc*0.5 + x*0.5 — identical operation order "
    "both engines, so doubles match bit-for-bit",
    "extension: time-series smoothing (§2.6 window surface)",
    """
    WITH w AS (
      SELECT event_id, user_id, value,
             list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vals
      FROM events
    )
    SELECT event_id, user_id,
           list_reduce(vals, (a, b) -> a * 0.5 + b * 0.5) AS ewma
    FROM w
    """,
)
def q_ewma_smoothing(spark, sf):
    """EWMA is a sequential recurrence, but over a bounded frame it is
    a per-row fold of the frame's value list — no iteration, no UDF,
    one window shuffle on user_id. The fold seeds with the frame's
    first element (DuckDB list_reduce semantics) so both engines run
    the exact same IEEE op sequence."""
    e = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    vals = F.collect_list("value").over(w)
    ewma = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5),
    )
    # No rounding: the fold is only IEEE * and + on identical operands
    # in identical order, so both engines produce bit-identical doubles
    # — and with α=0.5 every result is a dyadic rational, where
    # round(x, 9) hits half-way ties that Spark (HALF_EVEN-behaving on
    # doubles) and DuckDB (half-away) resolve differently.
    return e.select("event_id", "user_id", ewma.alias("ewma"))


@_q(
    "zorder_cluster",
    "Z-order (Morton) layout key over (custkey, order-day) buckets and "
    "the per-range clustering profile it yields: each of 32 Z-ranges "
    "covers a tight rectangle in BOTH dimensions — the layout that lets "
    "parquet min/max stats prune scans on either column",
    "extension: data layout (multi-dimensional clustering, OPTIMIZE "
    "ZORDER equivalent)",
    """
    WITH z AS (
      SELECT o_orderkey,
             o_custkey % 1024 AS xb,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 1024 AS yb
      FROM orders
    ), zv AS (
      SELECT o_orderkey, xb, yb,
             (SELECT SUM(((xb // CAST(POW(2, i) AS BIGINT)) % 2) * CAST(POW(4, i) AS BIGINT)
                       + ((yb // CAST(POW(2, i) AS BIGINT)) % 2) * 2 * CAST(POW(4, i) AS BIGINT))
                FROM range(10) r(i)) AS zval
      FROM z
    ), buckets AS (
      SELECT xb, yb, CAST(ntile(32) OVER (ORDER BY zval, o_orderkey) AS INT) AS zbucket
      FROM zv
    )
    SELECT zbucket, count(*) AS n,
           min(xb) AS min_x, max(xb) AS max_x,
           min(yb) AS min_y, max(yb) AS max_y
    FROM buckets
    GROUP BY zbucket
    """,
)
def q_zorder_cluster(spark, sf):
    """The profile a `skew.write_zordered` layout produces: rows range-
    partitioned by Z-value; per-partition min/max of BOTH source
    columns stay narrow (vs a single-column sort, where the second
    column's range per file is the full domain). Pure integer
    arithmetic — the oracle recomputes the interleave exactly."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import zorder_key

    o = _t(spark, sf, "orders")
    xb = F.col("o_custkey") % 1024
    yb = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")) % 1024
    zv = o.select(
        "o_orderkey", xb.alias("xb"), yb.cast("bigint").alias("yb")
    ).withColumn("zval", zorder_key(F.col("xb"), F.col("yb"), bits=10))
    # two-phase global ntile (r13): range-shuffled + offset, never one
    # WindowExec partition over all of orders
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import distributed_ranks

    bucketed = distributed_ranks(
        zv, [("zval", "asc"), ("o_orderkey", "asc")], ntile=(32, "zb"),
    )
    return (
        bucketed.select(
            "xb", "yb", F.col("zb").cast("int").alias("zbucket")
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("xb").alias("min_x"),
            F.max("xb").alias("max_x"),
            F.min("yb").alias("min_y"),
            F.max("yb").alias("max_y"),
        )
    )


@_q(
    "embedding_quantize_int8",
    "Symmetric int8 quantization of the embedding column: per-vector "
    "scale = max|v|/127, q_i = floor(v_i/scale + 0.5) — 4x less ANN "
    "candidate-generation I/O, float kept only for re-ranking. Integer "
    "checksums are exact; floor(x+0.5) sidesteps round() tie rules",
    "extension: embedding ops (quantized ANN storage)",
    """
    SELECT vec_id,
           round(greatest(list_aggregate(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE))), 'max'), 1e-30) / 127.0, 9) AS scale9,
           CAST(list_aggregate(list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE)
                        / (greatest(list_aggregate(list_transform(embedding,
                             y -> abs(CAST(y AS DOUBLE))), 'max'), 1e-30) / 127.0)
                        + 0.5) AS BIGINT)), 'sum') AS BIGINT) AS q_sum,
           CAST(floor(CAST(embedding[1] AS DOUBLE)
                / (greatest(list_aggregate(list_transform(embedding,
                     y -> abs(CAST(y AS DOUBLE))), 'max'), 1e-30) / 127.0)
                + 0.5) AS INT) AS q_c0
    FROM embeddings
    """,
)
def q_embedding_quantize_int8(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        quantize_int8,
    )

    emb = _t(spark, sf, "embeddings")
    scale, q = quantize_int8(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.round(scale, 9).alias("scale9"),
        F.aggregate(
            q, F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")
        ).alias("q_sum"),
        F.element_at(q, 1).alias("q_c0"),
    )


@_q(
    "weighted_sample",
    "Length-proportional Bernoulli sampling of documents (p ∝ n_chars): "
    "per-row portable-md5 uniform vs weight ratio — pure map-side "
    "filter, zero shuffles, identical draw on any partitioning/rerun; "
    "the single global max rides a 1-row broadcast",
    "extension: training-data curation (weighted sampling / "
    "length-debiasing a training mix)",
    """
    SELECT doc_id, n_chars
    FROM documents
    WHERE CAST(CAST(('0x' || substr(md5('wsample|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
            / 1152921504606846976.0
          < CAST(n_chars AS DOUBLE)
            / CAST((SELECT max(n_chars) FROM documents) AS DOUBLE)
    """,
)
def q_weighted_sample(spark, sf):
    """Weighted Bernoulli: keep doc with probability n_chars/max(n_chars).
    The uniform is the 60-bit md5 hash scaled to [0,1) — one division;
    the threshold is one division — both IEEE-exact-rounded on identical
    operands, so the kept set is bit-identical across engines (no RNG,
    no partitioning dependence)."""
    d = _t(spark, sf, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wsample|"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    maxn = d.agg(F.max("n_chars").alias("_maxn"))
    return (
        d.join(F.broadcast(maxn))
        .where(
            h.cast("double") / F.lit(float(1 << 60))
            < F.col("n_chars").cast("double") / F.col("_maxn").cast("double")
        )
        .select("doc_id", "n_chars")
    )


@_q(
    "winsorized_stats",
    "Robust per-group stats: discrete P05/P95 via cume_dist (exact rank "
    "arithmetic, no interpolation), values clamped to the band, "
    "decimal-exact winsorized mean — outlier-resistant aggregates for "
    "quality dashboards",
    "extension: robust aggregation (implied §2.4 surface)",
    """
    WITH r AS (
      SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS v,
             cume_dist() OVER (PARTITION BY o_orderpriority
                               ORDER BY CAST(o_totalprice AS DECIMAL(18,2))) AS c
      FROM orders
    ), b AS (
      SELECT o_orderpriority,
             min(CASE WHEN c >= 0.05 THEN v END) AS p05d,
             min(CASE WHEN c >= 0.95 THEN v END) AS p95d
      FROM r GROUP BY o_orderpriority
    )
    SELECT r.o_orderpriority AS o_orderpriority,
           count(*) AS n,
           CAST(min(b.p05d) AS DOUBLE) AS p05,
           CAST(min(b.p95d) AS DOUBLE) AS p95,
           -- CASE, not least/greatest: DuckDB's least/greatest on
           -- decimals returns DOUBLE, losing the exact-sum property
           CAST(SUM(CASE WHEN r.v < b.p05d THEN b.p05d
                         WHEN r.v > b.p95d THEN b.p95d
                         ELSE r.v END) AS DOUBLE) / count(*)
             AS winsor_mean
    FROM r JOIN b USING (o_orderpriority)
    GROUP BY r.o_orderpriority
    """,
)
def q_winsorized_stats(spark, sf):
    """Discrete quantile = smallest value whose cume_dist ≥ p — pure
    rank arithmetic (rank/n comparison), so both engines pick the same
    row with no interpolation-rule drift. Clamping and the mean run in
    DECIMAL(18,2): exact regardless of combine order. Per-group bounds
    are a groups-sized relation, broadcast back onto the facts."""
    o = _t(spark, sf, "orders")
    v = _dec("o_totalprice")
    r = o.select(
        "o_orderpriority",
        v.alias("v"),
        F.cume_dist()
        .over(Window.partitionBy("o_orderpriority").orderBy(v))
        .alias("c"),
    )
    b = r.groupBy("o_orderpriority").agg(
        F.min(F.when(F.col("c") >= 0.05, F.col("v"))).alias("p05d"),
        F.min(F.when(F.col("c") >= 0.95, F.col("v"))).alias("p95d"),
    )
    clamped = F.least(F.greatest(F.col("v"), F.col("p05d")), F.col("p95d"))
    return (
        r.join(F.broadcast(b), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("p05d").cast("double").alias("p05"),
            F.min("p95d").cast("double").alias("p95"),
            (F.sum(clamped).cast("double") / F.count(F.lit(1))).alias("winsor_mean"),
        )
    )


@_q(
    "knn_label_predict",
    "kNN classification over the embedding corpus: exact top-5 cosine "
    "neighbors per query (broadcast queries, corpus scans once), "
    "majority vote on neighbor labels, ties to the smaller label",
    "extension: similarity search (kNN labeling / auto-annotation)",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 = 0),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce(list_transform(range(1, len(q.embedding) + 1),
               i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), (a,b) -> a + b)
             / (sqrt(list_reduce(list_transform(range(1, len(q.embedding) + 1),
                  i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), (a,b) -> a + b))
                * sqrt(list_reduce(list_transform(range(1, len(c.embedding) + 1),
                  i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), (a,b) -> a + b)))
               AS cos_sim
      FROM q JOIN embeddings c ON c.vec_id % 97 <> 0
    ), topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
        FROM pairs
      ) WHERE rank <= 5
    ), votes AS (
      SELECT t.query_id, e.label, count(*) AS votes
      FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
      GROUP BY t.query_id, e.label
    )
    SELECT query_id, label AS predicted_label, votes FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY votes DESC, label ASC) AS rn
      FROM votes
    ) WHERE rn = 1
    """,
)
def q_knn_label_predict(spark, sf):
    """The labeling path a training pipeline uses to propagate labels
    from a seed set to unlabeled data. Reuses brute_force_topk's plan
    (queries broadcast, corpus never shuffles); the vote is a Q×k-row
    aggregation — negligible. Label lookup joins the k-row-per-query
    survivor set back to the corpus by id (broadcast: Q×k rows)."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    corpus = emb.filter(F.col("vec_id") % 97 != 0)
    topk = brute_force_topk(corpus, queries, k=5)
    votes = (
        topk.join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "label"), "neighbor_id"
        )
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), F.col("label").asc())
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
    )


@_q(
    "rolling_distinct_users",
    "Sliding-window distinct-user count per event type (50-event frame) "
    "— rolling reach/active-user metric; frame-local distinct, one "
    "window shuffle on the type key",
    "extension: time-series analytics (§2.6 window surface)",
    """
    SELECT event_id,
           count(DISTINCT user_id) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS n_active
    FROM events
    """,
)
def q_rolling_distinct_users(spark, sf):
    """Spark has no DISTINCT window aggregate — the equivalent exact
    form is size(array_distinct(collect_list)) over the frame: the
    frame is bounded (50 rows), so the per-row array is O(frame), not
    O(partition). Integer result, no float drift."""
    e = _t(spark, sf, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-49, Window.currentRow)
    )
    n = F.size(F.array_distinct(F.collect_list("user_id").over(w)))
    return e.select("event_id", n.cast("bigint").alias("n_active"))


@_q(
    "exact_jaccard_pairs",
    "EXACT corpus-wide trigram-Jaccard self-join (threshold 0.75) via "
    "prefix filtering (PPJoin family): rare-shingle prefixes generate "
    "candidates, hot shingles never do; complete recall with true "
    "Jaccard — the exact counterpart of MinHash-LSH's estimate",
    "extension: dedup (exact set-similarity join, Bayardo WWW'07 / "
    "Xiao WWW'08)",
    "WITH " + _EXACT_TRIGRAM_CO_CTES + """
    SELECT id_a, id_b, inter,
           CAST(inter AS DOUBLE) / (x.n + y.n - inter) AS jacc
    FROM co JOIN sz x ON x.doc_id = co.id_a JOIN sz y ON y.doc_id = co.id_b
    WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.75
    """,
)
def q_exact_jaccard_pairs(spark, sf):
    """The oracle brute-forces every co-occurring pair; the engine path
    proves the prefix filter is lossless — identical pair set, exact
    Jaccard values (one IEEE division per pair, identical operands both
    engines)."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        exact_jaccard_join,
    )

    return exact_jaccard_join(_t(spark, sf, "documents"), threshold=0.75, n=3)


@_q(
    "containment_pairs",
    "EXACT corpus-wide trigram-CONTAINMENT self-join (threshold 0.9) — "
    "the asymmetric dedup Jaccard misses: C(a→b) = |Sa∩Sb|/|Sa| flags "
    "a document (nearly) quoted inside a much larger one regardless of "
    "the size gap. Prefix filter on the CONTAINED side only (hot "
    "shingles leave every prefix, so the unfiltered container side "
    "still generates no hot-key candidates); oracle brute-forces every "
    "directional co-occurring pair",
    "extension: dedup (set-containment join, Bayardo WWW'07 family; "
    "quote/subset removal for crawl corpora)",
    "WITH " + _EXACT_TRIGRAM_CO_CTES + """,
    cod AS (
      SELECT a.doc_id AS id_contained, b.doc_id AS id_container,
             count(*) AS inter
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_contained, id_container, cod.inter,
           CAST(cod.inter AS DOUBLE) / x.n AS containment
    FROM cod JOIN sz x ON x.doc_id = cod.id_contained
    WHERE CAST(cod.inter AS DOUBLE) / x.n >= 0.9
    """,
)
def q_containment_pairs(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        exact_containment_join,
    )

    return exact_containment_join(
        _t(spark, sf, "documents"), threshold=0.9, n=3
    )


@_q(
    "html_boilerplate_strip",
    "HTML → visible-text extraction (the crawl-to-training-text step): "
    "wrap each document in synthetic HTML boilerplate (script + style "
    "+ comment + tags + entities), strip it with native regexp/replace "
    "expressions in one scan-stage projection — no UDF, no shuffle — "
    "and emit the cleaned text + token count. Patterns are "
    "RE2-compatible (no backreferences) so the oracle replays the "
    "transform byte-for-byte in DuckDB",
    "extension: text extraction (operators/text.py strip_html; "
    "boilerplate removal ahead of the doc_quality/dedup stack)",
    r"""
    WITH h AS (
      SELECT doc_id,
             '<html><head><style>p {color: red}</style><!-- hdr --></head>'
             || '<body><h1>Title &amp; &quot;intro&quot;</h1><p>' || text
             || '</p><script type="text/javascript">var a = 1;</script>'
             || '</body></html>' AS x
      FROM documents WHERE doc_id <= 500
    ), s AS (
      SELECT doc_id,
        trim(regexp_replace(
          replace(replace(replace(replace(replace(replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(x, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                '(?s)<!--.*?-->', ' ', 'g'),
              '<[^>]+>', ' ', 'g'),
            '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
            '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
          '\s+', ' ', 'g')) AS clean_text
      FROM h
    )
    SELECT doc_id, clean_text,
           CAST(len(string_split(clean_text, ' ')) AS BIGINT) AS n_toks
    FROM s
    """,
)
def q_html_boilerplate_strip(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.text import strip_html

    d = _t(spark, sf, "documents").filter("doc_id <= 500")
    html = F.concat(
        F.lit(
            "<html><head><style>p {color: red}</style><!-- hdr --></head>"
            '<body><h1>Title &amp; &quot;intro&quot;</h1><p>'
        ),
        F.col("text"),
        F.lit(
            '</p><script type="text/javascript">var a = 1;</script>'
            "</body></html>"
        ),
    )
    return d.select(
        "doc_id",
        strip_html(html).alias("clean_text"),
    ).withColumn(
        "n_toks", F.size(F.split("clean_text", " ")).cast("bigint")
    )


@_q(
    "table_checksum",
    "Order-independent table checksum: XOR of portable per-row md5 "
    "hashes + row count — cross-replica / cross-engine verification "
    "that two copies of a table hold identical rows, in one scan with "
    "map-side partial aggregation and a 1-row result",
    "extension: operational integrity (replication / migration "
    "verification)",
    """
    SELECT count(*) AS n_rows,
           bit_xor(CAST(('0x' || substr(md5(
             CAST(l_orderkey AS VARCHAR) || '|' ||
             CAST(l_linenumber AS VARCHAR) || '|' ||
             l_returnflag || '|' || l_linestatus), 1, 15)) AS BIGINT))
             AS checksum
    FROM lineitem
    """,
)
def q_table_checksum(spark, sf):
    """XOR is commutative+associative, so the checksum is independent
    of partitioning, row order, and combine order — the property that
    makes it valid for comparing a table across engines/replicas. The
    key serialization sticks to int/string columns (float formatting
    is not portable across engines)."""
    li = _t(spark, sf, "lineitem")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    F.col("l_returnflag"),
                    F.col("l_linestatus"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return li.select(h.alias("_h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_h)").alias("checksum"),
    )


@_q(
    "dedup_keep_best",
    "Quality-priority near-dup dedup: MinHash-LSH pairs → connected "
    "components → keep the BEST doc per duplicate cluster (n_chars "
    "desc, doc_id asc tiebreak) — the curation policy training "
    "pipelines actually want (keep the longest capture, not the "
    "smallest crawl id)",
    "ext:dedup-minhash-keep-best",
    _minhash_edges_cte(8, 4, 0.5, recursive=True)
    + """,
    r(node, m) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.m FROM edges e JOIN r ON e.v = r.node
    ),
    comp AS (SELECT node, min(m) AS component FROM r GROUP BY node),
    lab AS (
      SELECT d.doc_id, d.n_chars, coalesce(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT doc_id FROM (
      SELECT doc_id, row_number() OVER (
        PARTITION BY component ORDER BY n_chars DESC, doc_id ASC) AS rk
      FROM lab
    ) WHERE rk = 1
    """,
)
def q_dedup_keep_best(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        minhash_dedup_keep_best,
    )

    d = _t(spark, sf, "documents")
    return minhash_dedup_keep_best(
        d, "n_chars", threshold=0.5, num_hashes=8, bands=4, shingle_n=3
    ).select("doc_id")


@_q(
    "mad_outliers",
    "Per-event-type robust outlier report: discrete lower-median MAD "
    "(row_number selection, no interpolation — the stat is an actual "
    "data value, bit-identical both engines), outlier ⇔ |x−med| > 3·mad",
    "extension: robust aggregation / anomaly detection",
    """
    WITH r AS (
      SELECT event_type, value AS v,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    m AS (SELECT event_type, v AS med FROM r WHERE rn = (n + 1) // 2),
    d AS (
      SELECT r.event_type, r.v, m.med, abs(r.v - m.med) AS dev
      FROM r JOIN m USING (event_type)
    ),
    r2 AS (
      SELECT event_type, med, dev,
             row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d
    ),
    m2 AS (SELECT event_type, dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
    SELECT d.event_type AS event_type, count(*) AS n,
           min(d.med) AS med, min(m2.mad) AS mad,
           CAST(SUM(CASE WHEN d.dev > 3.0 * m2.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM d JOIN m2 USING (event_type)
    GROUP BY d.event_type
    """,
)
def q_mad_outliers(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.transforms import (
        mad_outlier_stats,
    )

    e = _t(spark, sf, "events")
    return mad_outlier_stats(e, "value", "event_type", k=3.0)


@_q(
    "hopping_window_counts",
    "Overlapping (hopping) time windows via the native F.window "
    "slide-duration form: 15-minute windows every 5 minutes over the "
    "event stream — each event lands in exactly 3 windows (map-side "
    "3× expand, ONE shuffle on window start); the batch twin of the "
    "Structured Streaming windowed aggregation",
    "extension: §2.6 windows (hopping/sliding time windows)",
    """
    WITH e AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec
      FROM events
    ),
    x AS (
      SELECT user_id, 300 * k AS ws
      FROM e, unnest(range((sec - 900) // 300 + 1, sec // 300 + 1)) AS t(k)
    )
    SELECT make_timestamp(ws * 1000000) AS window_start,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM x GROUP BY ws
    """,
)
def q_hopping_window_counts(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "n_users")
    )


@_q(
    "token_cooccurrence_lift",
    "PMI-style co-occurrence lift over the top-30 tokens by document "
    "frequency: lift = N·c_ab/(c_a·c_b) (the PMI ratio without the log "
    "— one multiply + one divide, bit-identical doubles). The "
    "heavy-hitter prefilter bounds per-doc pair fan-out at C(30,2) "
    "regardless of vocabulary size",
    "extension: text analysis (collocation mining)",
    r"""
    WITH dt AS (
      SELECT doc_id,
             unnest(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS token
      FROM documents
    ),
    dfreq AS (SELECT token, count(*) AS df FROM dt GROUP BY token),
    top AS (SELECT token, df FROM dfreq ORDER BY df DESC, token ASC LIMIT 30),
    ft AS (SELECT dt.doc_id, dt.token, top.df FROM dt JOIN top USING (token)),
    co AS (
      SELECT a.token AS token_a, b.token AS token_b,
             a.df AS df_a, b.df AS df_b, count(*) AS n_co
      FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2, 3, 4
      HAVING count(*) >= 5
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT token_a, token_b, n_co,
           CAST(n_docs AS DOUBLE) * n_co / (CAST(df_a AS DOUBLE) * df_b) AS lift
    FROM co, n
    """,
)
def q_token_cooccurrence_lift(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.text import (
        cooccurrence_lift,
    )

    return cooccurrence_lift(_t(spark, sf, "documents"), top_n=30, min_co=5)


@_q(
    "neardup_triangles",
    "Triangle count over the MinHash near-dup graph (degree-oriented "
    "wedge algorithm — wedge fan-out bounded by max OUT-degree ≈ √m, "
    "no celebrity-node explosion): the clustered-vs-chained diagnostic "
    "run before committing to transitive-closure dedup. The oracle "
    "counts the same triangles by naive canonical triple join",
    "ext:graph-triangles",
    _minhash_edges_cte(8, 4, 0.25)
    + """,
    c AS (SELECT u, v FROM edges WHERE u < v)
    SELECT count(*) AS n_triangles
    FROM c e1
    JOIN c e2 ON e1.v = e2.u
    JOIN c e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def q_neardup_triangles(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.graph import (
        triangle_count,
    )

    d = _t(spark, sf, "documents")
    pairs = minhash_near_dup_pairs(
        d, num_hashes=8, bands=4, shingle_n=3
    ).filter(F.col("est_jaccard") >= 0.25)
    return triangle_count(pairs)


@_q(
    "pareto_frontier",
    "2-D Pareto frontier maximizing (order value, recency): groupBy-x "
    "max + one running-max window over the DISTINCT-x relation + an "
    "equi-join back — the multi-criteria selection primitive without "
    "the naive O(n²) dominance join (which the oracle happily runs as "
    "NOT EXISTS at sf0.01)",
    "extension: multi-criteria selection (skyline operator)",
    """
    WITH t AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
             CAST(o_orderdate AS DATE) AS odate
      FROM orders
    )
    SELECT o_orderkey, CAST(price AS DOUBLE) AS price, odate
    FROM t p
    WHERE NOT EXISTS (
      SELECT 1 FROM t q
      WHERE q.price >= p.price AND q.odate >= p.odate
        AND (q.price > p.price OR q.odate > p.odate)
    )
    """,
)
def q_pareto_frontier(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.transforms import (
        pareto_frontier_2d,
    )

    o = _t(spark, sf, "orders").select(
        "o_orderkey",
        _dec("o_totalprice").alias("price"),
        F.to_date("o_orderdate").alias("odate"),
    )
    return pareto_frontier_2d(o, "price", "odate").select(
        "o_orderkey", F.col("price").cast("double").alias("price"), "odate"
    )


@_q(
    "column_profile",
    "Single-scan column profiling (null count, distinct count, min/max "
    "per column) — the data-quality primer on an unknown feed; the "
    "1-row aggregate is unpivoted with stack(), no driver loop",
    "extension: data-quality profiling (P6/A4 family)",
    """
    WITH t AS (
      SELECT o_orderkey, o_orderstatus, CAST(o_orderdate AS DATE) AS o_orderdate,
             CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice, o_orderpriority
      FROM orders
    )
    SELECT 'o_orderkey' AS column_name,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_value,
           CAST(max(o_orderkey) AS VARCHAR) AS max_value
    FROM t
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderstatus),
           CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
    FROM t
    UNION ALL
    SELECT 'o_orderdate',
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderdate),
           CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
    FROM t
    UNION ALL
    SELECT 'o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_totalprice),
           CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR)
    FROM t
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderpriority),
           CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
    FROM t
    """,
)
def q_column_profile(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.transforms import (
        table_profile,
    )

    o = _t(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.to_date("o_orderdate").alias("o_orderdate"),
        _dec("o_totalprice").alias("o_totalprice"),
        "o_orderpriority",
    )
    return table_profile(
        o,
        ["o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice",
         "o_orderpriority"],
    )


@_q(
    "cms_heavy_hitters",
    "Count-min sketch frequency estimates for the exact top-10 tokens: "
    "the sketch (4×1024, portable md5 row hashes) is rebuilt "
    "bit-identically by the oracle — demonstrates the broadcastable "
    "fixed-size frequency summary with its one-sided error (est ≥ "
    "exact always; equal when the row dodges collisions)",
    "extension: frequency sketches (Cormode-Muthukrishnan CMS)",
    r"""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents
    ),
    exact AS (
      SELECT token, count(*) AS exact_n FROM tok GROUP BY token
      ORDER BY exact_n DESC, token ASC LIMIT 10
    ),
    ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
    sk AS (
      SELECT ds.d,
             ('0x' || substr(md5('cms' || CAST(ds.d AS VARCHAR) || '|' || tok.token), 1, 15))::BIGINT % 1024 AS b,
             count(*) AS cnt
      FROM tok CROSS JOIN ds
      GROUP BY 1, 2
    )
    SELECT e.token, e.exact_n, min(sk.cnt) AS est_n
    FROM exact e
    CROSS JOIN ds
    JOIN sk ON sk.d = ds.d
           AND sk.b = ('0x' || substr(md5('cms' || CAST(ds.d AS VARCHAR) || '|' || e.token), 1, 15))::BIGINT % 1024
    GROUP BY 1, 2
    """,
)
def q_cms_heavy_hitters(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    d = _t(spark, sf, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    exact = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("token").asc())
        .limit(10)
    )
    sketch = cms_build(tok, "token", depth=4, width=1024)
    return cms_estimate(sketch, exact, "token", depth=4, width=1024)


@_q(
    "retention_cohorts",
    "Weekly cohort retention: users grouped by first-seen week × "
    "activity week offset → distinct-user counts. Two aggregations "
    "(first-seen per user, then cohort cells) + one broadcast-scale "
    "join of the per-user cohort onto the distinct (user, week) "
    "activity relation — the canonical product-analytics rollup",
    "extension: behavioral analytics (cohort retention)",
    """
    WITH a AS (
      SELECT user_id,
             CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
      FROM events GROUP BY 1, 2
    ),
    first_seen AS (
      SELECT user_id, min(week) AS cohort_week FROM a GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST((a.week - f.cohort_week) // 7 AS BIGINT) AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM a JOIN first_seen f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark, sf):
    e = _t(spark, sf, "events")
    a = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    first_seen = a.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        a.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@_q(
    "event_transition_matrix",
    "Per-user event-type transition counts (Markov chain estimation): "
    "lag window per user ordered by time → groupBy (from, to). One "
    "sort-within-user window + one count shuffle; ties broken by "
    "event_id so the sequence is deterministic",
    "extension: behavioral analytics (sequence/transition mining)",
    """
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS prev_type
      FROM events
    )
    SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_event_transition_matrix(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        s.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "regression_per_group",
    "Per-group least-squares trend (order value over days) + Pearson r "
    "from EXACT sums: Σx/Σy/Σxy/Σx²/Σy² accumulate in decimal/bigint "
    "(order-independent, no float drift), then the closed form runs a "
    "fixed sequence of double ops — deterministic where the built-in "
    "corr()'s double accumulation is not. One scan, one shuffle",
    "extension: grouped regression / correlation (implied §2.4 surface)",
    """
    WITH t AS (
      SELECT o_orderpriority,
             CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS x,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
      FROM orders
    ),
    s AS (
      SELECT o_orderpriority, count(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(yc) AS DOUBLE) AS syc,
             CAST(SUM(CAST(x * yc AS DECIMAL(38,0))) AS DOUBLE) AS sxyc,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(yc * yc AS DECIMAL(38,0))) AS DOUBLE) AS syyc
      FROM t GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           ((n * sxyc - sx * syc) / (n * sxx - sx * sx)) / 100 AS slope,
           (syc / 100 - (((n * sxyc - sx * syc) / (n * sxx - sx * sx)) / 100) * sx) / n
             AS intercept,
           (n * sxyc - sx * syc)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syyc - syc * syc)) AS r
    FROM s
    """,
)
def q_regression_per_group(spark, sf):
    """Exactness: y is held as EXACT integer cents (decimal(18,2)·100 →
    bigint), so every per-group sum is a scale-0 integer and its
    double conversion is a single correct rounding in both engines (a
    scale-4 decimal like Σy² converts via int128/10⁴ in DuckDB — two
    roundings — and drifts 2 ulps from Spark's BigDecimal path; cents
    sidestep that). Per-row products stay in bigint range; the sums
    ride decimal(38,0). The closed form then runs the SAME double-op
    sequence on identical operands (sqrt is correctly rounded per
    IEEE-754), so slope/intercept/r are all bit-identical."""
    o = _t(spark, sf, "orders").select(
        "o_orderpriority",
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01"))
        .cast("bigint")
        .alias("x"),
        (_dec("o_totalprice") * 100).cast("bigint").alias("yc"),
    )
    s = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("yc").cast("double").alias("syc"),
        F.sum((F.col("x") * F.col("yc")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxyc"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum((F.col("yc") * F.col("yc")).cast("decimal(38,0)"))
        .cast("double")
        .alias("syyc"),
    )
    n, sx, syc = F.col("n"), F.col("sx"), F.col("syc")
    sxyc, sxx, syyc = F.col("sxyc"), F.col("sxx"), F.col("syyc")
    slope = ((n * sxyc - sx * syc) / (n * sxx - sx * sx)) / 100
    return s.select(
        "o_orderpriority",
        "n",
        slope.alias("slope"),
        ((syc / 100 - slope * sx) / n).alias("intercept"),
        (
            (n * sxyc - sx * syc)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syyc - syc * syc))
        ).alias("r"),
    )


@_q(
    "balanced_shards",
    "Token-balanced output sharding: docs ranked by token count desc "
    "(doc_id tiebreak) and dealt round-robin into 8 shards — the "
    "LPT-style approximation for writing balanced training shards; "
    "report per-shard doc count + token total. The global rank is the "
    "only global step (swap in token_budget_head's two-phase shard "
    "prefix-sum at 100 TB; at catalog scale the window is exact and "
    "cheap)",
    "extension: curation (balanced output sharding)",
    r"""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_tok,
             row_number() OVER (ORDER BY n_tok DESC, doc_id ASC) AS rk
      FROM t
    )
    SELECT CAST((rk - 1) % 8 AS BIGINT) AS shard_id,
           count(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM r GROUP BY 1
    """,
)
def q_balanced_shards(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import distributed_ranks

    d = _t(spark, sf, "documents")
    t = d.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok")
    )
    # two-phase global row_number (r13): range-shuffled + offsets, not
    # one WindowExec partition over every document
    ranked = distributed_ranks(
        t, [("n_tok", "desc"), ("doc_id", "asc")], row_number_col="rk",
    )
    return (
        ranked
        .groupBy(((F.col("rk") - 1) % 8).cast("bigint").alias("shard_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
    )


# =====================================================================
# Catalog batch 8 (round 5 cont.): null-safe join semantics, skew
# diagnostics, lexical diversity, market basket, HLL mergeability,
# feature hashing
# =====================================================================


@_q(
    "null_safe_join",
    "Null-safe equi-join (<=> / IS NOT DISTINCT FROM): customers and a "
    "per-group supplier rollup matched on a NULLable group key where "
    "NULL matches NULL. EqualNullSafe is an extractable equi-join key "
    "(nulls hash like any value), so this stays a BroadcastHashJoin — "
    "the OR-of-IS-NULLs emulation would degrade to a nested-loop join "
    "and cannot survive 100 TB",
    "§2.5 joins (null-handling semantics)",
    """
    WITH c AS (
      SELECT c_custkey, CAST(NULLIF(c_nationkey % 5, 0) AS BIGINT) AS grp
      FROM customer
    ),
    sa AS (
      SELECT CAST(NULLIF(s_nationkey % 5, 0) AS BIGINT) AS grp,
             count(*) AS n_suppliers
      FROM supplier GROUP BY 1
    )
    SELECT c.grp, count(*) AS n_customers,
           CAST(COALESCE(MAX(sa.n_suppliers), 0) AS BIGINT) AS n_suppliers
    FROM c LEFT JOIN sa ON c.grp IS NOT DISTINCT FROM sa.grp
    GROUP BY c.grp
    """,
)
def q_null_safe_join(spark, sf):
    cust = _t(spark, sf, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_nationkey") % 5, F.lit(0)).cast("bigint").alias("grp"),
    )
    supp_agg = (
        _t(spark, sf, "supplier")
        .select(
            F.nullif(F.col("s_nationkey") % 5, F.lit(0)).cast("bigint").alias("grp")
        )
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    joined = cust.join(
        F.broadcast(supp_agg), cust["grp"].eqNullSafe(supp_agg["grp"]), "left"
    )
    return joined.groupBy(cust["grp"].alias("grp")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.coalesce(F.max("n_suppliers"), F.lit(0)).cast("bigint").alias("n_suppliers"),
    )


@_q(
    "skew_key_report",
    "Partition-skew diagnostics for a join/agg key: per-key counts "
    "(map-side partial agg), then the top-5 heaviest keys with their "
    "share of rows and skew ratio (key rows ÷ mean rows/key). The "
    "totals are a 1-row broadcast; the top-5 is a TakeOrdered, never a "
    "full sort — this is the report you run BEFORE choosing salting "
    "factors at 100 TB",
    "extension: scale diagnostics (skew detection; feeds skew.py salting)",
    """
    WITH pk AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_keys FROM pk),
    top AS (SELECT user_id, cnt FROM pk ORDER BY cnt DESC, user_id ASC LIMIT 5)
    SELECT top.user_id, top.cnt,
           CAST(cnt AS DOUBLE) * 100 / n_rows AS share_pct,
           CAST(cnt AS DOUBLE) * n_keys / n_rows AS skew_ratio
    FROM top CROSS JOIN t
    """,
)
def q_skew_key_report(spark, sf):
    per_key = (
        _t(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = per_key.agg(
        F.sum("cnt").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    top = per_key.orderBy(F.col("cnt").desc(), F.col("user_id").asc()).limit(5)
    return top.crossJoin(F.broadcast(tot)).select(
        "user_id",
        "cnt",
        (F.col("cnt").cast("double") * 100 / F.col("n_rows")).alias("share_pct"),
        (F.col("cnt").cast("double") * F.col("n_keys") / F.col("n_rows")).alias(
            "skew_ratio"
        ),
    )


@_q(
    "lexical_diversity",
    "Per-document lexical diversity without transcendentals: Simpson "
    "diversity 1 − Σc²/n² and top-token share from EXACT integer "
    "token counts (entropy's ln() drifts a ulp across engines; the "
    "Simpson index is the same repetition signal from int arithmetic "
    "+ one exact double division). Explode → two hash aggs, both with "
    "map-side partial combine, no joins",
    "extension: text quality (lexical diversity / repetition filter)",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents
    ),
    c AS (SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
    a AS (
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n, count(*) AS u,
             CAST(sum(cnt * cnt) AS BIGINT) AS ss,
             CAST(max(cnt) AS BIGINT) AS maxc
      FROM c GROUP BY doc_id
    )
    SELECT doc_id, n AS n_tokens, u AS distinct_tokens,
           1.0 - CAST(ss AS DOUBLE) / CAST(n * n AS DOUBLE)
             AS simpson_diversity,
           CAST(maxc AS DOUBLE) / n AS top_token_share
    FROM a
    """,
)
def q_lexical_diversity(spark, sf):
    tok = (
        _t(spark, sf, "documents")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    )
    c = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    a = c.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).alias("u"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
        F.max("cnt").alias("maxc"),
    )
    return a.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.col("u").alias("distinct_tokens"),
        (
            F.lit(1.0)
            - F.col("ss").cast("double") / (F.col("n") * F.col("n")).cast("double")
        ).alias("simpson_diversity"),
        (F.col("maxc").cast("double") / F.col("n")).alias("top_token_share"),
    )


@_q(
    "hll_distinct_by_group",
    "Per-group HyperLogLog distinct-user estimates (grouped twin of "
    "hll_distinct_merge): one map-side-combinable (group, idx) max-rho "
    "aggregation whose shuffle is bounded by groups*m rows, estimate "
    "folded per group in fixed idx order with exact powers of two — "
    "joined against the exact per-group distinct for a relative-error "
    "audit column, all bit-deterministic cross-engine",
    "extension: mergeable distinct sketches (grouped HLL)",
    """
    WITH h AS (
      SELECT event_type, user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    rr AS (
      SELECT event_type, h & 255 AS idx,
             CASE WHEN strpos(lpad(bin(h >> 8), 52, '0'), '1') = 0 THEN 53
                  ELSE strpos(lpad(bin(h >> 8), 52, '0'), '1') END AS rho
      FROM h
    ),
    regs AS (SELECT event_type, idx, max(rho) AS reg FROM rr GROUP BY 1, 2),
    est AS (
      SELECT event_type, count(*) AS used_registers,
             list_reduce(
               list_prepend(
                 CAST(0.0 AS DOUBLE),
                 list(CAST(1.0 AS DOUBLE)
                      / CAST((CAST(1 AS BIGINT) << reg) AS DOUBLE)
                      ORDER BY idx)),
               (acc, x) -> acc + x) AS present_sum
      FROM regs GROUP BY event_type
    ),
    ex AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events WHERE user_id IS NOT NULL GROUP BY event_type
    )
    SELECT est.event_type, est.used_registers,
           ((CAST(0.7213 AS DOUBLE)
             / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / 256)) * 256) * 256
             / (est.present_sum + CAST(256 - est.used_registers AS DOUBLE))
             AS raw_estimate,
           ex.exact_distinct
    FROM est JOIN ex USING (event_type)
    """,
)
def q_hll_distinct_by_group(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.sketches import (
        hll_estimate_by,
        hll_registers_by,
    )

    ev = _t(spark, sf, "events")
    regs = hll_registers_by(ev, "event_type", "user_id", m=256)
    est = hll_estimate_by(regs, "event_type", m=256)
    exact = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_distinct"))
    )
    return est.join(exact, "event_type")


@_q(
    "hll_distinct_merge",
    "HyperLogLog mergeability: per-shard register tables combined by "
    "register-wise MAX equal the registers built on the union stream "
    "(max is idempotent+commutative — the property that lets per-day "
    "HLL tables answer cross-day distincts without re-scanning "
    "history). One map-side-combinable agg (shuffle ≤ partitions·m "
    "rows) vs the full-shuffle exact distinct; raw estimate uses only "
    "exact powers of two (shiftleft, no pow/ln) in a fixed fold order "
    "so even the double is bit-identical cross-engine",
    "extension: mergeable distinct sketches (Flajolet HLL, AofA 2007)",
    """
    WITH h AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    rr AS (
      SELECT user_id % 4 AS shard, h & 255 AS idx,
             CASE WHEN strpos(lpad(bin(h >> 8), 52, '0'), '1') = 0 THEN 53
                  ELSE strpos(lpad(bin(h >> 8), 52, '0'), '1') END AS rho
      FROM h
    ),
    shard_regs AS (SELECT shard, idx, max(rho) AS reg FROM rr GROUP BY 1, 2),
    merged AS (SELECT idx, max(reg) AS reg FROM shard_regs GROUP BY idx),
    union_regs AS (SELECT idx, max(rho) AS reg FROM rr GROUP BY idx),
    mis AS (
      SELECT count(*) AS n_bad
      FROM merged m FULL JOIN union_regs u ON m.idx = u.idx
      WHERE m.reg IS DISTINCT FROM u.reg
    ),
    est AS (
      SELECT count(*) AS used_registers,
             list_reduce(
               list_prepend(
                 CAST(0.0 AS DOUBLE),
                 list(CAST(1.0 AS DOUBLE)
                      / CAST((CAST(1 AS BIGINT) << reg) AS DOUBLE)
                      ORDER BY idx)),
               (acc, x) -> acc + x) AS present_sum
      FROM merged
    )
    SELECT est.used_registers,
           (mis.n_bad = 0) AS merged_equals_union,
           ((CAST(0.7213 AS DOUBLE)
             / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / 256)) * 256) * 256
             / (est.present_sum + CAST(256 - est.used_registers AS DOUBLE))
             AS raw_estimate,
           x.exact_distinct
    FROM est CROSS JOIN mis
    CROSS JOIN (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                AS exact_distinct FROM events) x
    """,
)
def q_hll_distinct_merge(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.sketches import (
        hll_estimate,
        hll_idx_rho,
        hll_merge,
        hll_registers,
    )

    e = _t(spark, sf, "events")
    idx, rho = hll_idx_rho(F.col("user_id"))
    # NULL keys excluded like hll_registers does (COUNT DISTINCT
    # semantics) — both sides of the mergeability check must agree
    rr = e.where(F.col("user_id").isNotNull()).select(
        (F.col("user_id") % 4).alias("shard"), idx.alias("idx"), rho.alias("rho")
    )
    shard_regs = rr.groupBy("shard", "idx").agg(F.max("rho").alias("reg"))
    merged = hll_merge(shard_regs.select("idx", "reg"))
    union_regs = hll_registers(e, "user_id")
    cmp = merged.alias("m").join(
        union_regs.alias("u"), F.col("m.idx") == F.col("u.idx"), "full"
    )
    eq = cmp.agg(
        (
            F.sum(
                F.when(F.col("m.reg").eqNullSafe(F.col("u.reg")), 0).otherwise(1)
            )
            == 0
        ).alias("merged_equals_union")
    )
    exact = e.agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return hll_estimate(merged).crossJoin(eq).crossJoin(exact)


@_q(
    "market_basket_pairs",
    "Market-basket co-occurrence: part pairs bought in the same order, "
    "support ≥ 2, ranked by lift = N·c_ab/(c_a·c_b). The pair "
    "generation is a self-equi-join on the order key (fan-out bounded "
    "by lines-per-order², never corpus-quadratic), item counts are a "
    "broadcast dim, N is a 1-row broadcast, and the top-20 is a "
    "TakeOrdered — the relational twin of token_cooccurrence_lift",
    "extension: association analysis (support/lift mining)",
    """
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    item AS (SELECT l_partkey, count(*) AS c_item FROM d GROUP BY 1),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    p AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS c_ab
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, c_ab, ia.c_item AS c_a, ib.c_item AS c_b,
           CAST(c_ab AS DOUBLE) * n_orders
             / CAST(ia.c_item * ib.c_item AS DOUBLE) AS lift
    FROM p
    JOIN item ia ON p.part_a = ia.l_partkey
    JOIN item ib ON p.part_b = ib.l_partkey
    CROSS JOIN n
    WHERE c_ab >= 2
    ORDER BY lift DESC, part_a ASC, part_b ASC
    LIMIT 20
    """,
)
def q_market_basket_pairs(spark, sf):
    li = _t(spark, sf, "lineitem")
    d = li.select("l_orderkey", "l_partkey").distinct()
    item = d.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c_item"))
    n = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    a, b = d.alias("a"), d.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    ia = item.withColumnRenamed("l_partkey", "part_a").withColumnRenamed(
        "c_item", "c_a"
    )
    ib = item.withColumnRenamed("l_partkey", "part_b").withColumnRenamed(
        "c_item", "c_b"
    )
    return (
        p.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "c_ab",
            "c_a",
            "c_b",
            (
                (F.col("c_ab").cast("double") * F.col("n_orders"))
                / (F.col("c_a") * F.col("c_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(20)
    )


@_q(
    "feature_hash_tf",
    "Hashing-trick term-frequency features (Weinberger et al., ICML "
    "2009): tokens hashed into a fixed 64-dim space with a ±1 sign "
    "hash, emitted as sparse COO rows (doc_id, feat_idx, feat_val) — "
    "the vectorizer whose output width is independent of vocabulary "
    "size, so no vocab broadcast/join is ever needed. Explode → one "
    "map-side-combinable agg; zero coordinates (sign cancellation) "
    "drop out, matching the sparse semantics",
    "extension: feature engineering (hashing-trick vectorizer)",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             ('0x' || substr(md5('fh|' || token), 1, 15))::BIGINT & 63
               AS feat_idx,
             CASE WHEN (('0x' || substr(md5('fs|' || token), 1, 15))::BIGINT
                        & 1) = 1
                  THEN 1 ELSE -1 END AS sgn
      FROM tok
    )
    SELECT doc_id, feat_idx, CAST(sum(sgn) AS BIGINT) AS feat_val
    FROM s GROUP BY 1, 2
    HAVING sum(sgn) <> 0
    """,
)
def q_feature_hash_tf(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.functions.scalars import (
        portable_hash64,
    )

    tok = _t(spark, sf, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    feat_idx = portable_hash64(F.concat(F.lit("fh|"), F.col("token"))).bitwiseAND(
        F.lit(63)
    )
    sgn = F.when(
        portable_hash64(F.concat(F.lit("fs|"), F.col("token"))).bitwiseAND(F.lit(1))
        == 1,
        1,
    ).otherwise(-1)
    return (
        tok.select("doc_id", feat_idx.alias("feat_idx"), sgn.alias("sgn"))
        .groupBy("doc_id", "feat_idx")
        .agg(F.sum("sgn").alias("feat_val"))
        .filter(F.col("feat_val") != 0)
    )


@_q(
    "random_projection_jl",
    "Johnson-Lindenstrauss random projection 64→16 dims: seeded pseudo-"
    "gaussian planes (same md5 counter stream as the SRP family, so "
    "the oracle re-derives them bit-exactly), scaled by 1/√16 to "
    "preserve expected distances. Map-side only — no shuffle, no UDF; "
    "the 16 projections are computed BEFORE the explode so the 64-dim "
    "vector never rides a generator. The 4× cheaper vectors feed "
    "downstream ANN/dedup at 100 TB",
    "extension: embedding ops (JL dimensionality reduction)",
    f"""
    WITH planes AS (
      SELECT p, list(w ORDER BY d) AS wv
      FROM (
        SELECT p, d,
          ({" + ".join(
            "('0x' || substr(md5('jl|' || p || '|' || d || '|" + str(r) + "'), 1, 15))::BIGINT"
            " / 1152921504606846976.0"
            for r in range(3)
          )}) - 1.5 AS w
        FROM range(16) rp(p), range(64) rd(d)
      )
      GROUP BY p
    )
    SELECT e.vec_id, pl.p AS out_dim,
           list_reduce(list_transform(range(1, 65),
             i -> CAST(e.embedding[i] AS DOUBLE) * pl.wv[i]),
             (a, b) -> a + b) / 4 AS value
    FROM embeddings e, planes pl
    """,
)
def q_random_projection_jl(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        _seeded_hyperplanes,
    )

    planes = _seeded_hyperplanes(64, 16, seed="jl")
    e = _t(spark, sf, "embeddings")
    projs = []
    for p, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        projs.append(
            F.struct(
                F.lit(p).cast("bigint").alias("out_dim"), (proj / 4).alias("value")
            )
        )
    slim = e.select("vec_id", F.array(*projs).alias("pr"))
    return slim.select("vec_id", F.explode("pr").alias("s")).select(
        "vec_id", F.col("s.out_dim").alias("out_dim"), F.col("s.value").alias("value")
    )


@_q(
    "diversity_sample_srp",
    "Diversity (coreset-style) sampling: one representative per SRP "
    "sign-bucket — embedding-space-spread picks instead of uniform "
    "draws, the cheap alternative to k-means coreset selection. One "
    "map-side bucket computation + one combinable agg; representative "
    "= min vec_id (deterministic). Same seeded hyperplane stream as "
    "ann_topk_srp, replayed bit-exactly by the oracle",
    "extension: curation (diversity sampling via SRP buckets)",
    _srp_buckets_cte(1, 4, 64)
    + """
    SELECT CAST(bucket AS BIGINT) AS bucket, min(vec_id) AS rep_vec_id,
           count(*) AS n_members
    FROM buckets GROUP BY 1
    """,
)
def q_diversity_sample_srp(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        _seeded_hyperplanes,
        srp_bucket,
    )

    planes = _seeded_hyperplanes(64, 4, seed="srp0")
    e = _t(spark, sf, "embeddings")
    b = e.select(
        "vec_id", srp_bucket(F.col("embedding"), planes).cast("bigint").alias("bucket")
    )
    return b.groupBy("bucket").agg(
        F.min("vec_id").alias("rep_vec_id"), F.count(F.lit(1)).alias("n_members")
    )


@_q(
    "quantile_hist_merge",
    "Mergeable quantile summary (fixed-boundary histogram): per-shard "
    "64-bin histograms of order value combined by bin-wise SUM equal "
    "the union-built histogram (a linear sketch, like CMS), and "
    "p50/p90/p99 read off the cumulative counts. Build shuffles ≤ "
    "partitions·bins rows vs the full sort exact quantiles need; "
    "per-day histogram tables answer cross-day quantiles without "
    "rescanning. (KLL is the adaptive-boundary refinement; fixed "
    "$10k bins suit the known price domain.) All-integer arithmetic",
    "extension: mergeable quantile sketches (fixed-bin histogram)",
    """
    WITH c AS (
      SELECT o_orderkey,
             least(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   // 1000000, 63) AS bin
      FROM orders
    ),
    shard_h AS (
      SELECT o_orderkey % 4 AS shard, bin, count(*) AS cnt
      FROM c GROUP BY 1, 2
    ),
    merged AS (SELECT bin, CAST(sum(cnt) AS BIGINT) AS cnt
               FROM shard_h GROUP BY bin),
    union_h AS (SELECT bin, count(*) AS cnt FROM c GROUP BY bin),
    mis AS (
      SELECT count(*) AS n_bad
      FROM merged m FULL JOIN union_h u ON m.bin = u.bin
      WHERE m.cnt IS DISTINCT FROM u.cnt
    ),
    cum AS (
      SELECT bin, cnt,
             sum(cnt) OVER (ORDER BY bin) AS cum_n,
             sum(cnt) OVER () AS total_n
      FROM merged
    ),
    q AS (
      SELECT CAST(min(CASE WHEN cum_n * 100 >= total_n * 50 THEN bin END)
                  * 10000 AS BIGINT) AS est_p50,
             CAST(min(CASE WHEN cum_n * 100 >= total_n * 90 THEN bin END)
                  * 10000 AS BIGINT) AS est_p90,
             CAST(min(CASE WHEN cum_n * 100 >= total_n * 99 THEN bin END)
                  * 10000 AS BIGINT) AS est_p99,
             CAST(count(*) AS BIGINT) AS bins_used
      FROM cum
    )
    SELECT q.bins_used, (mis.n_bad = 0) AS merged_equals_union,
           q.est_p50, q.est_p90, q.est_p99
    FROM q CROSS JOIN mis
    """,
)
def q_quantile_hist_merge(spark, sf):
    o = _t(spark, sf, "orders")
    c = o.select(
        "o_orderkey",
        F.least(
            ((_dec("o_totalprice") * 100).cast("bigint") / F.lit(1000000)).cast(
                "bigint"
            ),
            F.lit(63).cast("bigint"),
        ).alias("bin"),
    )
    shard_h = c.groupBy((F.col("o_orderkey") % 4).alias("shard"), "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    merged = shard_h.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    union_h = c.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    cmp = merged.alias("m").join(
        union_h.alias("u"), F.col("m.bin") == F.col("u.bin"), "full"
    )
    mis = cmp.agg(
        (
            F.sum(
                F.when(F.col("m.cnt").eqNullSafe(F.col("u.cnt")), 0).otherwise(1)
            )
            == 0
        ).alias("merged_equals_union")
    )
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = merged.select(
        "bin",
        F.sum("cnt").over(w_cum).alias("cum_n"),
        F.sum("cnt").over(w_all).alias("total_n"),
    )

    def est(pct):
        return (
            F.min(
                F.when(
                    F.col("cum_n") * 100 >= F.col("total_n") * pct, F.col("bin")
                )
            )
            * 10000
        ).cast("bigint")

    q = cum.agg(
        F.count(F.lit(1)).cast("bigint").alias("bins_used"),
        est(50).alias("est_p50"),
        est(90).alias("est_p90"),
        est(99).alias("est_p99"),
    )
    return q.select("bins_used", "est_p50", "est_p90", "est_p99").crossJoin(mis)


@_q(
    "adaptive_quantile_sketch",
    "Adaptive mergeable quantile sketch — the KLL-style refinement "
    "quantile_hist_merge names: geometric levels with DETERMINISTIC "
    "hash level assignment (P[level>=L] = 2^-L from the portable md5) "
    "instead of KLL's random compaction, capacity-capped at k=512 "
    "retained rows whose cap level ADAPTS to n. Trades KLL's optimal "
    "space for exact mergeability: two shard sketches merged+recapped "
    "are ROW-IDENTICAL to the union-built sketch (audited in the "
    "merged_equals_union column). Build = one map-side level expr + "
    "one <=62-row combinable agg + broadcast cap filter: no data-sized "
    "shuffle at any n; estimates run a <=k-row window. All-bigint, "
    "bit-replayed by the oracle end to end",
    "extension: mergeable quantile sketches (adaptive level sampling)",
    """
    WITH v AS (
      SELECT o_orderkey AS id, o_orderkey % 2 AS shard,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS value
      FROM orders
    ),
    lv AS (
      SELECT shard, value,
             CASE WHEN strpos(lpad(bin(h), 60, '0'), '1') = 0 THEN 60
                  ELSE strpos(lpad(bin(h), 60, '0'), '1') - 1 END AS level
      FROM (SELECT shard, value,
                   ('0x' || substr(md5('lsq|' || CAST(id AS VARCHAR)), 1, 15))::BIGINT AS h
            FROM v)
    ),
    dom AS (SELECT range AS level FROM range(0, 62)),
    sper AS (SELECT shard, level, count(*) AS c FROM lv GROUP BY 1, 2),
    scum AS (
      SELECT s.shard, d.level,
             sum(coalesce(sp.c, 0))
               OVER (PARTITION BY s.shard ORDER BY d.level DESC) AS cnt_ge
      FROM (SELECT DISTINCT shard FROM lv) s CROSS JOIN dom d
      LEFT JOIN sper sp ON sp.shard = s.shard AND sp.level = d.level
    ),
    scap AS (
      SELECT shard, min(CASE WHEN cnt_ge <= 512 THEN level END) AS cap
      FROM scum GROUP BY shard
    ),
    sret AS (
      SELECT lv.shard, lv.value, lv.level
      FROM lv JOIN scap ON lv.shard = scap.shard AND lv.level >= scap.cap
    ),
    fl AS (SELECT max(cap) AS floor FROM scap),
    mper AS (SELECT level, count(*) AS c FROM sret GROUP BY 1),
    mcum AS (
      SELECT d.level, sum(coalesce(mp.c, 0)) OVER (ORDER BY d.level DESC) AS cnt_ge
      FROM dom d LEFT JOIN mper mp ON mp.level = d.level
    ),
    mcap AS (
      SELECT min(CASE WHEN m.cnt_ge <= 512 AND m.level >= f.floor
                      THEN m.level END) AS cap
      FROM mcum m CROSS JOIN fl f
    ),
    merged AS (
      SELECT r.value, r.level FROM sret r CROSS JOIN mcap WHERE r.level >= mcap.cap
    ),
    uper AS (SELECT level, count(*) AS c FROM lv GROUP BY 1),
    ucum AS (
      SELECT d.level, sum(coalesce(up.c, 0)) OVER (ORDER BY d.level DESC) AS cnt_ge
      FROM dom d LEFT JOIN uper up ON up.level = d.level
    ),
    umeta AS (
      SELECT min(CASE WHEN cnt_ge <= 512 THEN level END) AS cap,
             max(cnt_ge) AS n_total
      FROM ucum
    ),
    ubuilt AS (SELECT value, level FROM lv CROSS JOIN umeta
               WHERE lv.level >= umeta.cap),
    mis AS (
      SELECT count(*) AS n_bad FROM
        (SELECT value, level, count(*) AS c FROM merged GROUP BY 1, 2) m
        FULL JOIN
        (SELECT value, level, count(*) AS c FROM ubuilt GROUP BY 1, 2) u
        ON m.value = u.value AND m.level = u.level
      WHERE m.c IS DISTINCT FROM u.c
    ),
    byval AS (SELECT value, count(*) AS c FROM merged GROUP BY 1),
    cum AS (
      SELECT value, sum(c) OVER (ORDER BY value) AS cum, sum(c) OVER () AS tot
      FROM byval
    ),
    q AS (
      SELECT CAST(max(tot) AS BIGINT) AS retained,
             CAST(min(CASE WHEN cum * 100 >= tot * 50 THEN value END)
                  AS BIGINT) AS est_p50,
             CAST(min(CASE WHEN cum * 100 >= tot * 90 THEN value END)
                  AS BIGINT) AS est_p90,
             CAST(min(CASE WHEN cum * 100 >= tot * 99 THEN value END)
                  AS BIGINT) AS est_p99
      FROM cum
    )
    SELECT CAST(um.n_total AS BIGINT) AS n_total, CAST(mc.cap AS INT) AS cap,
           q.retained, (mis.n_bad = 0) AS merged_equals_union,
           q.est_p50, q.est_p90, q.est_p99
    FROM q CROSS JOIN mis CROSS JOIN mcap mc CROSS JOIN umeta um
    """,
)
def q_adaptive_quantile_sketch(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.sketches import (
        lsq_merge,
        lsq_quantiles,
        lsq_sketch,
    )

    o = _t(spark, sf, "orders")
    cents = o.select(
        "o_orderkey", (_dec("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    shards = [
        lsq_sketch(
            cents.where(F.col("o_orderkey") % 2 == i), "cents", "o_orderkey", k=512
        )
        for i in range(2)
    ]
    merged = lsq_merge(*shards)
    union_built = lsq_sketch(cents, "cents", "o_orderkey", k=512)
    mc = merged.groupBy("value", "level").agg(F.count(F.lit(1)).alias("c"))
    uc = union_built.groupBy("value", "level").agg(F.count(F.lit(1)).alias("c"))
    cmp = mc.alias("m").join(
        uc.alias("u"),
        (F.col("m.value") == F.col("u.value"))
        & (F.col("m.level") == F.col("u.level")),
        "full",
    )
    mis = cmp.agg(
        (
            F.sum(F.when(F.col("m.c").eqNullSafe(F.col("u.c")), 0).otherwise(1))
            == 0
        ).alias("merged_equals_union")
    )
    est = lsq_quantiles(merged, pcts=(50, 90, 99))
    return est.crossJoin(mis).select(
        "n_total", "cap", "retained", "merged_equals_union",
        "est_p50", "est_p90", "est_p99",
    )


@_q(
    "table_diff",
    "Snapshot reconciliation: full-outer join of two table versions on "
    "the primary key comparing per-row md5 content hashes → "
    "added/removed/changed/unchanged counts. The comparison ships "
    "(key, hash) pairs only — row width never crosses the wire — and "
    "the join co-partitions on the key: the anti-entropy primitive for "
    "verifying replicas/CDC pipelines at 100 TB. Snapshot B is derived "
    "from orders with deterministic deletes (key%101=0), updates "
    "(key%97=0) and inserts (key%103=0 re-keyed to -k-1 — real "
    "orderkeys are ≥ 0 at every sf, so inserted keys, all ≤ -1, can "
    "never collide; the -1 matters: plain negation would map key 0 "
    "onto itself)",
    "extension: reconciliation (snapshot diff / anti-entropy)",
    """
    WITH a AS (
      SELECT o_orderkey AS k,
             md5(concat_ws('|', o_custkey, o_orderstatus, o_totalprice,
                           o_orderdate, o_orderpriority)) AS h
      FROM orders
    ),
    b_src AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 101 <> 0
      UNION ALL
      SELECT -o_orderkey - 1, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 103 = 0
    ),
    b AS (
      SELECT o_orderkey AS k,
             md5(concat_ws('|', o_custkey, o_orderstatus, o_totalprice,
                           o_orderdate, o_orderpriority)) AS h
      FROM b_src
    )
    SELECT CASE WHEN a.k IS NULL THEN 'added'
                WHEN b.k IS NULL THEN 'removed'
                WHEN a.h <> b.h THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           count(*) AS n
    FROM a FULL JOIN b ON a.k = b.k
    GROUP BY 1
    """,
)
def q_table_diff(spark, sf):
    # The hash only has to be consistent WITHIN each engine (each side
    # compares its own A-hash to its own B-hash), so rendering
    # differences between engines don't matter — but the mutation
    # semantics must match exactly.
    cols = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority"]
    o = _t(spark, sf, "orders")

    def hashed(df):
        return df.select(
            F.col("o_orderkey").alias("k"),
            F.md5(F.concat_ws("|", *cols)).alias("h"),
        )

    a = hashed(o)
    b_kept = o.filter(F.col("o_orderkey") % 101 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 97 == 0, "X").otherwise(
            F.col("o_orderstatus")
        ),
    )
    b_ins = o.filter(F.col("o_orderkey") % 103 == 0).withColumn(
        "o_orderkey", -F.col("o_orderkey") - 1
    )
    b = hashed(b_kept.unionByName(b_ins))
    j = a.alias("a").join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full")
    return j.groupBy(
        F.when(F.col("a.k").isNull(), "added")
        .when(F.col("b.k").isNull(), "removed")
        .when(F.col("a.h") != F.col("b.h"), "changed")
        .otherwise("unchanged")
        .alias("change_type")
    ).agg(F.count(F.lit(1)).alias("n"))


@_q(
    "corpus_ngram_overlap",
    "Corpus-level trigram overlap between two document collections "
    "(containment + Jaccard over distinct token 3-grams) — the corpus "
    "granularity of train/eval contamination measurement, where "
    "contamination_check answers it per-document. ONE shuffle: "
    "presence flags per n-gram via conditional MAX directly on the "
    "exploded stream (no separate distinct — max absorbs duplicates), "
    "then a 1-row combinable agg; ratios are exact-int divisions",
    "extension: corpus analytics (cross-corpus n-gram overlap)",
    r"""
    WITH t AS (
      SELECT CASE WHEN length(source) = 4 THEN 'A' ELSE 'B' END AS corpus,
             string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ), sh AS (
      -- docs below one full trigram are excluded on BOTH engines
      -- (short-doc truncation semantics differ: || propagates NULL
      -- past the end here, concat_ws skips it in Spark)
      SELECT corpus,
             unnest(list_transform(
               range(1, len(toks) - 2 + 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             )) AS ngram
      FROM t WHERE len(toks) >= 3
    ), flags AS (
      SELECT ngram,
             max(CASE WHEN corpus = 'A' THEN 1 ELSE 0 END) AS ha,
             max(CASE WHEN corpus = 'B' THEN 1 ELSE 0 END) AS hb
      FROM sh GROUP BY ngram
    )
    SELECT CAST(sum(ha) AS BIGINT) AS n_a,
           CAST(sum(hb) AS BIGINT) AS n_b,
           CAST(sum(ha * hb) AS BIGINT) AS n_both,
           CAST(sum(ha * hb) AS DOUBLE) / sum(ha) AS containment_a,
           CAST(sum(ha * hb) AS DOUBLE) / (sum(ha) + sum(hb) - sum(ha * hb))
             AS jaccard
    FROM flags
    """,
)
def q_corpus_ngram_overlap(spark, sf):
    d = _t(spark, sf, "documents").select(
        F.when(F.length("source") == 4, "A").otherwise("B").alias("corpus"),
        tokens(F.col("text")).alias("_toks"),
    )
    sh = d.where(F.size("_toks") >= 3).select(
        "corpus", F.explode(shingles_from_tokens(F.col("_toks"), 3)).alias("ngram")
    )
    flags = sh.groupBy("ngram").agg(
        F.max(F.when(F.col("corpus") == "A", 1).otherwise(0)).alias("ha"),
        F.max(F.when(F.col("corpus") == "B", 1).otherwise(0)).alias("hb"),
    )
    return flags.agg(
        F.sum("ha").alias("n_a"),
        F.sum("hb").alias("n_b"),
        F.sum(F.col("ha") * F.col("hb")).alias("n_both"),
        (
            F.sum(F.col("ha") * F.col("hb")).cast("double") / F.sum("ha")
        ).alias("containment_a"),
        (
            F.sum(F.col("ha") * F.col("hb")).cast("double")
            / (F.sum("ha") + F.sum("hb") - F.sum(F.col("ha") * F.col("hb")))
        ).alias("jaccard"),
    )


@_q(
    "bpe_token_estimate",
    "BPE-ish token counting over structured-ish text (events.props "
    "JSON): tokens = letter-runs | digit-runs | single "
    "punctuation/symbol, the GPT-2-pretokenizer-shaped regex that "
    "tracks subword token budgets far better than whitespace counts on "
    "code/JSON/markup. regexp_count stays in codegen at the scan "
    "(alternation branches start on disjoint char classes, so Java "
    "ordered-alternation and RE2 leftmost-longest agree); one "
    "combinable agg per event_type",
    "extension: text analysis (BPE-ish token budget estimation)",
    r"""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(length(regexp_extract_all(props,
             '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
             AS total_bpe_tokens,
           CAST(sum(length(props)) AS BIGINT) AS total_chars,
           CAST(sum(length(props)) AS DOUBLE)
             / sum(length(regexp_extract_all(props,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))
             AS chars_per_token
    FROM events
    GROUP BY event_type
    """,
)
def q_bpe_token_estimate(spark, sf):
    e = _t(spark, sf, "events")
    n_tok = F.regexp_count("props", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    return (
        e.select("event_type", n_tok.alias("t"), F.length("props").alias("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("t").cast("bigint").alias("total_bpe_tokens"),
            F.sum("c").cast("bigint").alias("total_chars"),
            (F.sum("c").cast("double") / F.sum("t")).alias("chars_per_token"),
        )
    )


@_q(
    "forward_fill_locf",
    "Time-series forward fill (LOCF): per-user last non-NULL "
    "observation carried forward over event time via last(..., "
    "ignorenulls) with a running frame — the gap-repair primitive for "
    "sensor/metric streams. One window shuffle on the key; leading "
    "NULLs stay NULL (nothing to carry). NULLs are synthesized "
    "deterministically (event_id % 7) so both engines repair the same "
    "gaps",
    "§2.6 windows (IGNORE NULLS frame functions)",
    """
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           last_value(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS value_filled
    FROM events
    """,
)
def q_forward_fill_locf(spark, sf):
    e = _t(spark, sf, "events")
    gapped = F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
        F.col("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.last(gapped, ignorenulls=True).over(w).alias("value_filled"),
    )


#: log10(1 + 1/d) for d = 1..9 — computed once in Python and embedded
#: as literals on BOTH engines (log10 in-query would drift a ulp).
_BENFORD_P = [
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
]


@_q(
    "benford_first_digit",
    "Benford's-law audit of order totals: first-significant-digit "
    "distribution vs log10(1+1/d) with per-digit chi-square "
    "contributions — the classic fabricated-numbers screen. The digit "
    "comes from the EXACT integer cents (string head of a bigint — "
    "decimal rendering differs across engines, integer rendering "
    "doesn't); expected shares are Python-computed literals, so every "
    "double op replays identically. One map-side-combinable agg + a "
    "1-row broadcast total",
    "extension: data-quality analytics (Benford first-digit test)",
    f"""
    WITH c AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    ),
    d AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             count(*) AS n_obs
      FROM c WHERE cents > 0 GROUP BY 1
    ),
    t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM d),
    -- CAST to DOUBLE: the decimal-literal array would otherwise type
    -- the column DECIMAL(18,17); the cast is the same correctly-rounded
    -- decimal->binary conversion Python's float literal parse does
    e AS (
      SELECT digit, n_obs, n_total,
             CAST([{", ".join(repr(p) for p in _BENFORD_P)}][digit]
                  AS DOUBLE) AS p
      FROM d CROSS JOIN t
    )
    SELECT digit, n_obs,
           p AS expected_share,
           CAST(n_obs AS DOUBLE) / n_total AS observed_share,
           (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * p)
           * (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * p)
           / (CAST(n_total AS DOUBLE) * p)
             AS chi2_term
    FROM e
    """,
)
def q_benford_first_digit(spark, sf):
    o = _t(spark, sf, "orders")
    cents = (_dec("o_totalprice") * 100).cast("bigint")
    d = (
        o.select(cents.alias("cents"))
        .where(F.col("cents") > 0)
        .groupBy(
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("bigint")
            .alias("digit")
        )
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    t = d.agg(F.sum("n_obs").alias("n_total"))
    p = F.element_at(F.array(*[F.lit(x) for x in _BENFORD_P]), F.col("digit").cast("int"))
    n_d = F.col("n_obs").cast("double")
    nt_d = F.col("n_total").cast("double")
    dev = n_d - nt_d * p
    return d.crossJoin(F.broadcast(t)).select(
        "digit",
        "n_obs",
        p.alias("expected_share"),
        (n_d / F.col("n_total")).alias("observed_share"),
        (dev * dev / (nt_d * p)).alias("chi2_term"),
    )


@_q(
    "monthly_revenue_growth",
    "Month-over-month revenue growth: decimal-exact monthly totals, "
    "then lag + ratio over the month sequence — the standard BI trend "
    "query. The months relation is tiny (one row per month), so the "
    "unpartitioned lag window is a single-partition sort of dozens of "
    "rows, NOT a data-sized sort; first month's growth is NULL on both "
    "engines",
    "§2.4/§2.6 (period-over-period trend)",
    """
    WITH m AS (
      SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
               AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT month, revenue, n_orders,
           lag(revenue) OVER (ORDER BY month) AS prev_revenue,
           (revenue - lag(revenue) OVER (ORDER BY month))
             / lag(revenue) OVER (ORDER BY month) AS growth
    FROM m
    """,
)
def q_monthly_revenue_growth(spark, sf):
    o = _t(spark, sf, "orders")
    m = o.groupBy(
        F.date_trunc("month", F.to_date("o_orderdate")).cast("date").alias("month")
    ).agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        "n_orders",
        prev.alias("prev_revenue"),
        ((F.col("revenue") - prev) / prev).alias("growth"),
    )


@_q(
    "string_toolkit",
    "Remaining §2.3 string surface in one scan-stage entry: lpad key "
    "padding, split_part id extraction, translate vowel mapping, "
    "reverse — all JVM-side codegen expressions, no shuffle (the "
    "reference's notebooks lean on exactly this family for naming/"
    "cleansing)",
    "§2.3 scalar functions (string toolkit)",
    """
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
           split_part(c_name, '#', 2) AS name_id,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
           reverse(c_name) AS name_reversed
    FROM customer
    """,
)
def q_string_toolkit(spark, sf):
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_id"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.reverse("c_name").alias("name_reversed"),
    )


@_q(
    "array_toolkit",
    "Array/list surface over the embedding column: slice, element max, "
    "ascending sort of the head — the higher-order-function family that "
    "keeps vector manipulation JVM-side instead of in Python UDFs. "
    "Map-side only, no shuffle; float32 components round-trip "
    "bit-exactly through both engines. The array ops run in the plan; "
    "the output projects their ELEMENTS as double columns because the "
    "driver's canonical compare sorts/hashes cells, which array cells "
    "cannot do (r5: `unhashable type: 'list'`)",
    "§2.3/§2.8 (array higher-order functions)",
    """
    SELECT vec_id,
           CAST(embedding[1] AS DOUBLE) AS h1,
           CAST(embedding[2] AS DOUBLE) AS h2,
           CAST(embedding[3] AS DOUBLE) AS h3,
           CAST(list_max(embedding) AS DOUBLE) AS vmax,
           CAST(list_sort(embedding[1:5])[1] AS DOUBLE) AS s1,
           CAST(list_sort(embedding[1:5])[5] AS DOUBLE) AS s5
    FROM embeddings
    """,
)
def q_array_toolkit(spark, sf):
    e = _t(spark, sf, "embeddings")
    head3 = F.slice("embedding", 1, 3)
    sorted5 = F.sort_array(F.slice("embedding", 1, 5))
    return e.select(
        "vec_id",
        F.element_at(head3, 1).cast("double").alias("h1"),
        F.element_at(head3, 2).cast("double").alias("h2"),
        F.element_at(head3, 3).cast("double").alias("h3"),
        F.array_max("embedding").cast("double").alias("vmax"),
        F.element_at(sorted5, 1).cast("double").alias("s1"),
        F.element_at(sorted5, 5).cast("double").alias("s5"),
    )


@_q(
    "binary_auc_exact",
    "EXACT ROC-AUC of a quantized score vs a binary label via the "
    "Mann-Whitney rank-sum identity with average-rank ties — all "
    "integer arithmetic until one final IEEE division, so the double "
    "is bit-identical on any engine. Scale shape: one map-side-"
    "combinable groupBy onto <=|bins| rows, then a window over that "
    "tiny aggregated relation — the raw predictions never enter a "
    "global sort (what makes exact AUC viable at 100 TB)",
    "extension: eval metrics (distributed exact AUC)",
    """
    WITH b AS (
      SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS bin,
             CASE WHEN label >= 5 THEN 1 ELSE 0 END AS p
      FROM embeddings
      WHERE embedding[1] IS NOT NULL AND label IS NOT NULL
    ), per AS (
      SELECT bin, sum(p) AS pos, sum(1 - p) AS neg FROM b GROUP BY bin
    ), cum AS (
      SELECT pos, neg,
             coalesce(sum(neg) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
      FROM per
    )
    SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           CAST(sum(pos * (2 * neg_below + neg)) AS BIGINT) AS u2,
           CASE WHEN sum(pos) > 0 AND sum(neg) > 0 THEN
             CAST(sum(pos * (2 * neg_below + neg)) AS DOUBLE)
               / CAST(2 * sum(pos) * sum(neg) AS DOUBLE)
           END AS auc
    FROM cum
    """,
)
def q_binary_auc_exact(spark, sf):
    """Score = embedding[0] quantized to 3 decimals (cast float→double
    is exact, one double multiply + floor — identical both engines);
    positive = label >= 5. AUC is exact for the quantized score. u2
    rides decimal(38,0) inside the operator (int64-safe at 100 TB) and
    is cast to bigint here only for the driver's pandas hashing — exact
    at any sf the driver runs."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import binned_auc

    e = _t(spark, sf, "embeddings")
    score_bin = F.floor(F.element_at("embedding", 1).cast("double") * 1000)
    out = binned_auc(e, score_bin, F.col("label") >= 5)
    return out.withColumn("u2", F.col("u2").cast("bigint"))


@_q(
    "interval_islands",
    "Gaps-and-islands: merge each user's overlapping 10-min event "
    "intervals into islands and report per-user coverage (n_islands, "
    "covered us, longest us) — the time-coverage primitive (uptime, "
    "exposure reach) as two per-key window passes + one groupBy; no "
    "O(n^2) self-join, skewed users degrade to a sort never a cross "
    "product. Exact integer us arithmetic end to end",
    "extension: interval algebra (FactStream sessions generalized, "
    "initial_load.sql:45-53)",
    """
    WITH iv AS (
      SELECT user_id,
             epoch_ns(ts) // 1000 AS s,
             epoch_ns(ts) // 1000 + 600000000 AS e,
             event_id
      FROM events
    ), fl AS (
      SELECT user_id, s, e, event_id,
             CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS ni
      FROM iv
    ), isl AS (
      SELECT user_id, s, e,
             sum(ni) OVER (PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM fl
    ), agg AS (
      SELECT user_id, max(e) - min(s) AS span
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(span) AS BIGINT) AS covered,
           CAST(max(span) AS BIGINT) AS longest
    FROM agg GROUP BY user_id
    """,
)
def q_interval_islands(spark, sf):
    """The oracle replays the same lag-free running-max formulation
    with the same (s, event_id) total order in BOTH window stages —
    a tie on s between a new-island row and a continuing row would
    otherwise let the cumsum stage split the island differently."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.intervals import (
        interval_coverage,
    )

    ev = _t(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "user_id",
        us.alias("s"),
        (us + 600_000_000).alias("e"),
        "event_id",
    )
    return interval_coverage(iv, "user_id", "s", "e", "event_id")


@_q(
    "calibration_bins",
    "Reliability-diagram state: per-score-bin sample count and exact "
    "positive fraction (one IEEE division of exact ints per bin, no "
    "cross-bin float accumulation — an ECE finisher would need an "
    "ordered fold, so the entry emits the bins and lets the caller "
    "fold). Same mergeable per-bin-count monoid as binary_auc_exact "
    "(operators/metrics.py::per_bin_counts), so the state also "
    "maintains incrementally via run_auc_drain's auc_bins table",
    "extension: eval metrics (model calibration)",
    """
    SELECT bin,
           CAST(pos + neg AS BIGINT) AS n,
           CAST(pos AS BIGINT) AS n_pos,
           CAST(pos AS DOUBLE) / CAST(pos + neg AS DOUBLE) AS frac_pos
    FROM (
      SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS bin,
             sum(CASE WHEN label >= 5 THEN 1 ELSE 0 END) AS pos,
             sum(CASE WHEN label >= 5 THEN 0 ELSE 1 END) AS neg
      FROM embeddings
      WHERE embedding[1] IS NOT NULL AND label IS NOT NULL
      GROUP BY 1
    )
    """,
)
def q_calibration_bins(spark, sf):
    """Same quantized score + binary label as binary_auc_exact."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import per_bin_counts

    e = _t(spark, sf, "embeddings")
    score_bin = F.floor(F.element_at("embedding", 1).cast("double") * 1000)
    bins = per_bin_counts(e, score_bin, F.col("label") >= 5)
    n = F.col("pos") + F.col("neg")
    return bins.select(
        "bin",
        n.cast("bigint").alias("n"),
        F.col("pos").cast("bigint").alias("n_pos"),
        (F.col("pos").cast("double") / n.cast("double")).alias("frac_pos"),
    )


@_q(
    "roc_points",
    "Full ROC curve points: per score-bin threshold t (predict "
    "positive when bin >= t), cumulative-from-the-top TP/FP counts and "
    "exact TPR/FPR (each ONE IEEE division of exact ints — no "
    "cross-bin float accumulation). Window runs over the ALREADY-"
    "AGGREGATED <=|bins| relation, so raw predictions never globally "
    "sort; completes the eval family with binary_auc_exact / "
    "calibration_bins over the same per-bin-count monoid",
    "extension: eval metrics (ROC curve)",
    """
    WITH per AS (
      SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS bin,
             sum(CASE WHEN label >= 5 THEN 1 ELSE 0 END) AS pos,
             sum(CASE WHEN label >= 5 THEN 0 ELSE 1 END) AS neg
      FROM embeddings
      WHERE embedding[1] IS NOT NULL AND label IS NOT NULL
      GROUP BY 1
    )
    SELECT bin,
           CAST(sum(pos) OVER w AS BIGINT) AS tp,
           CAST(sum(neg) OVER w AS BIGINT) AS fp,
           CASE WHEN sum(pos) OVER t > 0 THEN
             CAST(sum(pos) OVER w AS DOUBLE)
               / CAST(sum(pos) OVER t AS DOUBLE) END AS tpr,
           CASE WHEN sum(neg) OVER t > 0 THEN
             CAST(sum(neg) OVER w AS DOUBLE)
               / CAST(sum(neg) OVER t AS DOUBLE) END AS fpr
    FROM per
    WINDOW w AS (ORDER BY bin DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           t AS (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_roc_points(spark, sf):
    """Same quantized score + binary label as binary_auc_exact; the
    totals ride a whole-partition window frame instead of a second
    aggregate-and-join."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import per_bin_counts

    e = _t(spark, sf, "embeddings")
    score_bin = F.floor(F.element_at("embedding", 1).cast("double") * 1000)
    bins = per_bin_counts(e, score_bin, F.col("label") >= 5)
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tp, fp = F.sum("pos").over(w), F.sum("neg").over(w)
    tot_p, tot_n = F.sum("pos").over(t), F.sum("neg").over(t)
    # one-class slice → rate undefined → NULL both engines (unguarded:
    # ANSI Spark throws DIVIDE_BY_ZERO, DuckDB returns inf/nan)
    return bins.select(
        "bin",
        tp.cast("bigint").alias("tp"),
        fp.cast("bigint").alias("fp"),
        F.when(tot_p > 0, tp.cast("double") / tot_p.cast("double")).alias("tpr"),
        F.when(tot_n > 0, fp.cast("double") / tot_n.cast("double")).alias("fpr"),
    )


_EVAL_BINS_CTE = """per AS (
      SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS bin,
             sum(CASE WHEN label >= 5 THEN 1 ELSE 0 END) AS pos,
             sum(CASE WHEN label >= 5 THEN 0 ELSE 1 END) AS neg
      FROM embeddings
      WHERE embedding[1] IS NOT NULL AND label IS NOT NULL
      GROUP BY 1
    )"""


def _eval_bins(spark, sf):
    """The shared quantized-score (bin, pos, neg) relation every eval
    entry (AUC/ROC/calibration/PR/AP) finishes from."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import per_bin_counts

    e = _t(spark, sf, "embeddings")
    score_bin = F.floor(F.element_at("embedding", 1).cast("double") * 1000)
    return per_bin_counts(e, score_bin, F.col("label") >= 5)


@_q(
    "pr_curve",
    "Precision-recall curve from the SAME per-bin-count monoid as "
    "AUC/ROC/calibration: per score-bin threshold, cumulative-from-"
    "the-top TP/FP and exact precision/recall (each ONE IEEE division "
    "of exact ints). Window runs over the already-aggregated <=|bins| "
    "relation — raw predictions never globally sort; maintained "
    "incrementally for streams by run_auc_drain's bins table",
    "extension: eval metrics (PR curve)",
    f"""
    WITH {_EVAL_BINS_CTE}
    SELECT bin,
           CAST(sum(pos) OVER w AS BIGINT) AS tp,
           CAST(sum(neg) OVER w AS BIGINT) AS fp,
           CAST(sum(pos) OVER w AS DOUBLE)
             / CAST(sum(pos) OVER w + sum(neg) OVER w AS DOUBLE) AS precision,
           CASE WHEN sum(pos) OVER t > 0 THEN
             CAST(sum(pos) OVER w AS DOUBLE)
               / CAST(sum(pos) OVER t AS DOUBLE) END AS recall
    FROM per
    WINDOW w AS (ORDER BY bin DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           t AS (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_pr_curve(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import pr_curve_from_bins

    return pr_curve_from_bins(_eval_bins(spark, sf))


@_q(
    "average_precision",
    "Exact average precision (sklearn step-wise AP on the quantized "
    "bins): AP = sum_b pos_b * tp_b/(tp_b+fp_b) / n_pos. Per-bin term "
    "= one division of exact ints (pos*tp rides decimal(38,0)); the "
    "term sum is a SEQUENTIAL fold in pinned bin-DESC order "
    "(F.aggregate <-> list_reduce) because float addition does not "
    "commute across partitionings — the fold array is the bounded "
    "bins relation, never raw predictions",
    "extension: eval metrics (average precision)",
    f"""
    WITH {_EVAL_BINS_CTE},
    cum AS (
      SELECT bin, pos, neg,
             CAST(CAST(pos AS DECIMAL(38,0))
                  * CAST(sum(pos) OVER w AS DECIMAL(38,0)) AS DOUBLE)
               / CAST(sum(pos) OVER w + sum(neg) OVER w AS DOUBLE) AS term
      FROM per
      WINDOW w AS (ORDER BY bin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           CASE WHEN sum(pos) > 0 THEN
             list_reduce(list(term ORDER BY bin DESC), (a, b) -> a + b)
               / CAST(sum(pos) AS DOUBLE) END AS ap
    FROM cum
    """,
)
def q_average_precision(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import (
        average_precision_from_bins,
    )

    return average_precision_from_bins(_eval_bins(spark, sf))


@_q(
    "auc_by_segment",
    "Sliced model evaluation: exact per-segment ROC-AUC (segments = "
    "label buckets; score = quantized e1, positive = e2 > 0) over the "
    "grouped per-bin-count monoid — the model-governance report a "
    "global AUC hides regressions in. Scale shape BEATS the global "
    "finisher: the cumulative window is PARTITIONED BY segment, so "
    "sliced eval parallelizes across segments instead of funneling "
    "through one partition",
    "extension: eval metrics (per-segment / sliced AUC)",
    """
    WITH b AS (
      SELECT label AS segment,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS bin,
             CASE WHEN CAST(embedding[2] AS DOUBLE) > 0 THEN 1 ELSE 0 END AS p
      FROM embeddings
      WHERE embedding[1] IS NOT NULL AND embedding[2] IS NOT NULL
        AND label IS NOT NULL
    ), per AS (
      SELECT segment, bin, sum(p) AS pos, sum(1 - p) AS neg
      FROM b GROUP BY segment, bin
    ), cum AS (
      SELECT segment, pos, neg,
             coalesce(sum(neg) OVER (PARTITION BY segment ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
      FROM per
    )
    SELECT segment,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           CASE WHEN sum(pos) > 0 AND sum(neg) > 0 THEN
             CAST(sum(pos * (2 * neg_below + neg)) AS DOUBLE)
               / CAST(2 * sum(pos) * sum(neg) AS DOUBLE)
           END AS auc
    FROM cum GROUP BY segment
    """,
)
def q_auc_by_segment(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import (
        grouped_auc_from_bins,
        grouped_per_bin_counts,
    )

    e = _t(spark, sf, "embeddings").withColumn("segment", F.col("label"))
    bins = grouped_per_bin_counts(
        e,
        ["segment"],
        F.floor(F.element_at("embedding", 1).cast("double") * 1000),
        F.element_at("embedding", 2).cast("double") > 0,
    )
    return grouped_auc_from_bins(bins, ["segment"])


@_q(
    "threshold_metrics",
    "Confusion-matrix scorecard per score-bin threshold from the same "
    "per-bin-count monoid: exact cumulative tp/fp/fn/tn plus accuracy, "
    "precision, recall, F1 — each ONE IEEE division of exact ints (F1 "
    "via the single-division identity 2tp/(2tp+fp+fn), never composing "
    "two rounded doubles). The operating-point picker for a trained "
    "filter: read the threshold off the row that hits the target "
    "precision/recall tradeoff",
    "extension: eval metrics (operating-point selection)",
    f"""
    WITH {_EVAL_BINS_CTE}
    SELECT bin,
           CAST(sum(pos) OVER w AS BIGINT) AS tp,
           CAST(sum(neg) OVER w AS BIGINT) AS fp,
           CAST(sum(pos) OVER t - sum(pos) OVER w AS BIGINT) AS fn,
           CAST(sum(neg) OVER t - sum(neg) OVER w AS BIGINT) AS tn,
           CAST(sum(pos) OVER w + (sum(neg) OVER t - sum(neg) OVER w) AS DOUBLE)
             / CAST(sum(pos) OVER t + sum(neg) OVER t AS DOUBLE) AS accuracy,
           CASE WHEN sum(pos) OVER w + sum(neg) OVER w > 0 THEN
             CAST(sum(pos) OVER w AS DOUBLE)
               / CAST(sum(pos) OVER w + sum(neg) OVER w AS DOUBLE) END AS precision_,
           CASE WHEN sum(pos) OVER t > 0 THEN
             CAST(sum(pos) OVER w AS DOUBLE)
               / CAST(sum(pos) OVER t AS DOUBLE) END AS recall_,
           CASE WHEN sum(pos) OVER t > 0
                     AND 2 * sum(pos) OVER w + sum(neg) OVER w
                     + (sum(pos) OVER t - sum(pos) OVER w) > 0 THEN
             CAST(2 * sum(pos) OVER w AS DOUBLE)
               / CAST(2 * sum(pos) OVER w + sum(neg) OVER w
                      + (sum(pos) OVER t - sum(pos) OVER w) AS DOUBLE) END AS f1
    FROM per
    WINDOW w AS (ORDER BY bin DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           t AS (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_threshold_metrics(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import (
        threshold_metrics_from_bins,
    )

    return threshold_metrics_from_bins(_eval_bins(spark, sf))


def _bpe_chain_ctes(n_merges: int = 4, carry_w: bool = False) -> str:
    r"""Shared CTE chain replaying bpe_learn_merges' merge rounds in
    DuckDB: word counts once, then n_merges chained rounds of (pair
    counts → best pair → boundary-padded greedy-single-scan replace).
    replace() continuation semantics verified identical Spark↔DuckDB
    (' a a a a ' → ' aa a a ' on both). ``carry_w=True`` threads the
    raw word through every round so the final s{n} is the word→symbol
    map the encode oracle joins the corpus stream against."""
    w_col = "w, " if carry_w else ""
    parts = [
        rf"""w0 AS (
      SELECT w, count(*) AS wfreq FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        FROM documents) WHERE w <> '' GROUP BY w
    ),
    s0 AS (
      SELECT {w_col}' ' || array_to_string(
               list_transform(range(1, len(w)+1), i -> w[i]), ' ') || ' ' AS sym,
             wfreq
      FROM w0
    )"""
    ]
    for r in range(1, n_merges + 1):
        prev = f"s{r-1}"
        parts.append(
            f""",
    p{r} AS (
      SELECT arr[i] AS a, arr[i+1] AS b, sum(wfreq) AS cnt FROM (
        SELECT string_split(trim(sym), ' ') AS arr, wfreq,
               unnest(range(1, len(string_split(trim(sym), ' ')))) AS i
        FROM {prev})
      GROUP BY 1, 2
    ),
    b{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
    s{r} AS (
      SELECT {w_col}replace(sym,
               ' ' || (SELECT a FROM b{r}) || ' ' || (SELECT b FROM b{r}) || ' ',
               ' ' || (SELECT a FROM b{r}) || (SELECT b FROM b{r}) || ' ') AS sym,
             wfreq
      FROM {prev}
    )"""
        )
    return "".join(parts)


def _bpe_oracle(n_merges: int = 4) -> str:
    """DuckDB replay of bpe_learn_merges over the shared merge-round
    chain (see _bpe_chain_ctes)."""
    selects = "\n    UNION ALL ".join(
        f"SELECT {r} AS merge_rank, a AS lhs, b AS rhs, CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return "WITH " + _bpe_chain_ctes(n_merges) + "\n    " + selects


@_q(
    "bpe_learn_merges",
    "BPE tokenizer induction (Sennrich ACL'16): learn 4 merge rules "
    "from the corpus. The scale gift of BPE training: ONE corpus-sized "
    "word-count job (map-side combinable), then every merge round runs "
    "on the Heaps-law-sized vocabulary relation — the token stream is "
    "never rescanned; best pairs ride 1-row broadcast relations "
    "(the kmeans_fit no-driver-state pattern). Greedy-single-scan "
    "in-round merge semantics, verified identical Spark<->DuckDB",
    "extension: tokenizer training (LLM-pipeline surface)",
    _bpe_oracle(4),
)
def q_bpe_learn_merges(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.bpe import bpe_learn_merges

    return bpe_learn_merges(_t(spark, sf, "documents"), n_merges=4)


def _bpe_encode_oracle(n_merges: int = 4, doc_limit: int = 50) -> str:
    r"""DuckDB replay of bpe_encode: the shared learn chain (carrying
    the word through every round) yields the word→final-symbol map;
    the corpus word stream (positions BEFORE the empty-word filter,
    matching Spark's posexplode-then-filter) joins it, tokens explode
    with within-word positions, ids rank the slice's vocabulary."""
    return rf"""
    WITH {_bpe_chain_ctes(n_merges, carry_w=True)},
    toked AS (
      SELECT w, string_split(trim(sym), ' ') AS toks FROM s{n_merges}
    ),
    stream AS (
      SELECT doc_id, CAST(i AS INT) AS widx, ws[i] AS w FROM (
        SELECT doc_id, ws, unnest(range(1, len(ws)+1)) AS i FROM (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
          FROM documents WHERE doc_id < {doc_limit}))
      WHERE ws[i] <> ''
    ),
    stoked AS (
      SELECT t.w, t.toks FROM toked t
      JOIN (SELECT DISTINCT w FROM stream) sw USING (w)
    ),
    vocab AS (
      SELECT token, CAST(row_number() OVER (ORDER BY token ASC) AS INT) AS token_id
      FROM (SELECT DISTINCT unnest(toks) AS token FROM stoked)
    ),
    enc AS (
      SELECT doc_id, widx, CAST(i AS INT) AS tpos, toks[i] AS token FROM (
        SELECT s.doc_id, s.widx, t.toks, unnest(range(1, len(t.toks)+1)) AS i
        FROM stream s JOIN stoked t USING (w))
    )
    SELECT e.doc_id, e.widx, e.tpos, e.token, v.token_id
    FROM enc e JOIN vocab v USING (token)
    """


@_q(
    "bpe_encode",
    "BPE tokenizer application: replay 4 learned merge rules to "
    "tokenize a 50-doc slice into (doc, word, token-position, token, "
    "token-id) — the half an LLM pipeline actually runs at 100 TB. "
    "Scale shape mirrors training's gift: merges replay on the "
    "DISTINCT-WORD relation (Heaps-law-sized) as chained literal "
    "replace projections, never the token stream; the corpus is "
    "scanned once and joined back word->tokens; the rule table is the "
    "only driver-side state (model-sized)",
    "extension: tokenizer application (LLM-pipeline surface)",
    _bpe_encode_oracle(4, 50),
)
def q_bpe_encode(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.bpe import (
        bpe_encode,
        bpe_learn_merges,
    )

    docs = _t(spark, sf, "documents")
    rules = bpe_learn_merges(docs, n_merges=4)
    return bpe_encode(docs.filter(F.col("doc_id") < 50), rules)


def _lsh_recall_oracle(num_hashes: int = 8, bands: int = 4, threshold: float = 0.5) -> str:
    """DuckDB replay of lsh_recall_audit, composed from the SHARED
    recipe builders: truth from _EXACT_TRIGRAM_CO_CTES (the
    exact_jaccard_pairs oracle's CTEs) + raw band collisions from
    _mh_sig_cte_body/_mh_bandjoin_sql (the _minhash_edges_cte pieces
    WITHOUT the est-Jaccard gate), full outer join, integer rollup."""
    return rf"""
    WITH {_EXACT_TRIGRAM_CO_CTES},
    truth AS (
      SELECT id_a, id_b FROM co
      JOIN sz x ON x.doc_id = co.id_a JOIN sz y ON y.doc_id = co.id_b
      WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= {threshold}
    ),
    sig AS ({_mh_sig_cte_body(num_hashes)}
    ),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        AND ({_mh_bandjoin_sql(num_hashes, bands)})
    ),
    audit AS (
      SELECT coalesce(t.id_a, c.id_a) AS id_a,
             CASE WHEN t.id_a IS NOT NULL THEN 1 END AS _t,
             CASE WHEN c.id_a IS NOT NULL THEN 1 END AS _c
      FROM truth t FULL OUTER JOIN cand c
        ON t.id_a = c.id_a AND t.id_b = c.id_b
    )
    SELECT CAST(sum(_t) AS BIGINT) AS n_true,
           CAST(sum(_c) AS BIGINT) AS n_cand,
           CAST(sum(_t * _c) AS BIGINT) AS n_hit,
           CAST(sum(_t * _c) AS DOUBLE) / CAST(sum(_t) AS DOUBLE) AS recall
    FROM audit
    """


@_q(
    "lsh_recall_audit",
    "Self-audit of MinHash-LSH banding against EXACT ground truth: "
    "band-collision candidate pairs (8 hashes, 4 bands — the CC-dedup "
    "config) vs the exact trigram-Jaccard >= 0.5 pair set from the "
    "prefix-filter join; reports n_true / n_candidates / n_hit and "
    "empirical recall. The audit a 100 TB dedup rollout runs on a "
    "sample before trusting the LSH config corpus-wide",
    "extension: dedup QA (LSH recall vs exact set-similarity)",
    _lsh_recall_oracle(),
)
def q_lsh_recall_audit(spark, sf):
    """Truth = exact_jaccard_join (complete recall by the prefix-filter
    theorem); candidates = raw band collisions BEFORE any est-Jaccard
    gate (minhash_near_dup_pairs returns every collision). One full
    outer join on the canonical (id_a, id_b) key, then a 1-row integer
    aggregate + one final IEEE division."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        exact_jaccard_join,
        minhash_near_dup_pairs,
        shingle_relation,
    )

    docs = _t(spark, sf, "documents")
    # r14 (guide §6 scan reuse): ONE tokenize+shingle pass feeds both the
    # exact-truth side and the MinHash-candidate side (previously each
    # side re-read and re-shingled the corpus); intra-query cache only.
    sh = shingle_relation(docs, n=3).cache()
    truth = exact_jaccard_join(docs, threshold=0.5, n=3, shingles_df=sh).select(
        "id_a", "id_b", F.lit(1).alias("_t")
    )
    cand = minhash_near_dup_pairs(
        docs, num_hashes=8, bands=4, shingles_df=sh
    ).select(
        "id_a", "id_b", F.lit(1).alias("_c")
    )
    both = truth.join(cand, ["id_a", "id_b"], "full")
    return both.agg(
        F.sum("_t").cast("bigint").alias("n_true"),
        F.sum("_c").cast("bigint").alias("n_cand"),
        F.sum(F.col("_t") * F.col("_c")).cast("bigint").alias("n_hit"),
    ).select(
        "n_true",
        "n_cand",
        "n_hit",
        (F.col("n_hit").cast("double") / F.col("n_true").cast("double")).alias("recall"),
    )


# =====================================================================
# Round 9: record-linkage blocking, retrieval QA, agreement stats,
# warehouse DQ scorecard, leakage-safe splits, time-weighted series,
# corpus drift
# =====================================================================

@_q(
    "sorted_neighborhood_pairs",
    "Sorted-neighborhood (SNM) near-dup candidate pairs: block by lang, "
    "sort by normalized 12-char text prefix, pair each doc with its "
    "next 2 sorted neighbors — linear candidates (<= 2n) instead of "
    "n^2, the classic record-linkage blocker complementing MinHash "
    "(catches prefix-close fuzzy dups at strictly linear cost)",
    "extension: dedup candidate generation (Hernández-Stolfo SNM)",
    """
    WITH keyed AS (
      SELECT lang, doc_id AS id_a,
             substr(lower(trim(text)), 1, 12) AS key_a
      FROM documents
    ),
    led AS (
      SELECT lang, id_a, key_a,
             lead(id_a, 1) OVER w AS id_b1, lead(key_a, 1) OVER w AS key_b1,
             lead(id_a, 2) OVER w AS id_b2, lead(key_a, 2) OVER w AS key_b2
      FROM keyed
      WINDOW w AS (PARTITION BY lang ORDER BY key_a ASC, id_a ASC)
    )
    SELECT lang, id_a, id_b1 AS id_b, key_a, key_b1 AS key_b
    FROM led WHERE id_b1 IS NOT NULL
    UNION ALL
    SELECT lang, id_a, id_b2 AS id_b, key_a, key_b2 AS key_b
    FROM led WHERE id_b2 IS NOT NULL
    """,
)
def q_sorted_neighborhood_pairs(spark, sf):
    """Blocked SNM: the sort+lead window partitions by lang — parallel
    across blocks, no single-partition global sort (the 100 TB shape;
    see operators/dedup.py::sorted_neighborhood_candidates)."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        sorted_neighborhood_candidates,
    )

    docs = _t(spark, sf, "documents")
    return sorted_neighborhood_candidates(
        docs,
        id_col="doc_id",
        sort_key=F.substring(F.lower(F.trim(F.col("text"))), 1, 12),
        block_col="lang",
        window=3,
    )


@_q(
    "retrieval_eval_mrr",
    "Retrieval QA scorecard: exact hits@10 / micro precision@10 / "
    "MRR@10 of brute-force cosine top-10 against label-match ground "
    "truth — reciprocal ranks scaled by lcm(1..10)=2520 so every "
    "accumulation is an exact integer (the eval harness for the "
    "ANN stack: run exact + IVF/PQ retrievers through the same scorer "
    "to price an index's recall)",
    "extension: retrieval evaluation (similarity stack QA)",
    """
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 10),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce(list_transform(range(1, len(q.embedding) + 1),
               i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), (a,b) -> a + b)
             / (sqrt(list_reduce(list_transform(range(1, len(q.embedding) + 1),
                  i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), (a,b) -> a + b))
                * sqrt(list_reduce(list_transform(range(1, len(c.embedding) + 1),
                  i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), (a,b) -> a + b)))
               AS cos_sim
      FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM pairs
    ),
    rel AS (
      SELECT q.vec_id AS query_id, c.vec_id AS item_id
      FROM q JOIN embeddings c ON q.label = c.label AND q.vec_id <> c.vec_id
    ),
    per_q AS (
      SELECT r.query_id,
             count(rel.item_id) AS hits,
             min(CASE WHEN rel.item_id IS NOT NULL THEN r.rank END) AS first_rel
      FROM ranked r LEFT JOIN rel
        ON r.query_id = rel.query_id AND r.neighbor_id = rel.item_id
      WHERE r.rank <= 10
      GROUP BY r.query_id
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_queries,
             CAST(sum(hits) AS BIGINT) AS hits_at_k,
             CAST(coalesce(sum(CAST(2520 / first_rel AS BIGINT)), 0) AS BIGINT) AS mrr_num
      FROM per_q
    )
    SELECT n_queries, hits_at_k, mrr_num,
           CAST(2520 AS BIGINT) AS mrr_scale,
           CAST(hits_at_k AS DOUBLE) / CAST(n_queries * 10 AS DOUBLE) AS precision_at_k,
           CAST(mrr_num AS DOUBLE) / CAST(n_queries * 2520 AS DOUBLE) AS mrr
    FROM agg
    """,
)
def q_retrieval_eval_mrr(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import retrieval_eval
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter("vec_id < 10")
    ranked = brute_force_topk(emb, queries, k=10)
    rel = (
        queries.select(F.col("vec_id").alias("query_id"), F.col("label").alias("_ql"))
        .join(
            emb.select(F.col("vec_id").alias("item_id"), F.col("label").alias("_cl")),
            F.col("_ql") == F.col("_cl"),
        )
        .filter(F.col("query_id") != F.col("item_id"))
        .select("query_id", "item_id")
    )
    return retrieval_eval(ranked, rel, k=10)


@_q(
    "cohens_kappa",
    "Cohen's kappa between two rule classifiers on documents (char-"
    "length gate vs whitespace-count gate): chance-corrected agreement "
    "from the contingency table, exact-integer kappa = "
    "(N*agree - sum na*nb) / (N^2 - sum na*nb) with one final IEEE "
    "division — the QA statistic for comparing two labeling pipelines",
    "extension: annotation/filter agreement QA",
    """
    WITH lab AS (
      SELECT CAST(n_chars >= 300 AS VARCHAR) AS a,
             CAST((length(text) - length(replace(text, ' ', ''))) >= 49 AS VARCHAR) AS b
      FROM documents
    ),
    ct AS (SELECT a, b, count(*) AS n FROM lab GROUP BY a, b),
    na AS (SELECT a, sum(n) AS na FROM ct GROUP BY a),
    nb AS (SELECT b, sum(n) AS nb FROM ct GROUP BY b),
    pe AS (SELECT coalesce(sum(na.na * nb.nb), 0) AS pe_num
           FROM na JOIN nb ON na.a = nb.b),
    tot AS (SELECT sum(n) AS n,
                   sum(CASE WHEN a = b THEN n ELSE 0 END) AS agree
            FROM ct)
    SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS agree,
           CAST(pe_num AS BIGINT) AS pe_num,
           CAST(n * agree - pe_num AS BIGINT) AS kappa_num,
           CAST(n * n - pe_num AS BIGINT) AS kappa_den,
           CASE WHEN n * n - pe_num <> 0
                THEN CAST(n * agree - pe_num AS DOUBLE)
                     / CAST(n * n - pe_num AS DOUBLE)
           END AS kappa
    FROM tot, pe
    """,
)
def q_cohens_kappa(spark, sf):
    """Raters: A = n_chars >= 300; B = at-least-49 spaces (a word-count
    proxy deliberately correlated-but-not-identical to A, so the table
    is non-degenerate). Booleans ride as strings through the generic
    categorical operator; outputs cast to bigint (test-scale exact —
    the operator itself accumulates decimal(38,0) for 100 TB)."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import cohens_kappa

    docs = _t(spark, sf, "documents")
    a = F.col("n_chars") >= 300
    b = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    ) >= 49
    out = cohens_kappa(docs, a, b)
    return out.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("agree").cast("bigint").alias("agree"),
        F.col("pe_num").cast("bigint").alias("pe_num"),
        F.col("kappa_num").cast("bigint").alias("kappa_num"),
        F.col("kappa_den").cast("bigint").alias("kappa_den"),
        "kappa",
    )


@_q(
    "integrity_report_tpch",
    "Warehouse DQ scorecard in ONE relation: PK-uniqueness, FK-orphan "
    "(anti-join probes with broadcast parent key sets), NOT-NULL and "
    "empty-text checks across the star schema — the deploy gate is "
    "max(violations) == 0 (re-expresses the reference's per-pipeline "
    "ADF validation lookups declaratively)",
    "P6/A4 expectations surface; extension: warehouse-wide DQ audit",
    """
    SELECT 'orders_pk_dup' AS check_name,
           CAST((SELECT count(*) FROM (
             SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL
             GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT) AS violations
    UNION ALL
    SELECT 'customer_pk_dup',
           CAST((SELECT count(*) FROM (
             SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL
             GROUP BY c_custkey HAVING count(*) > 1)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_orphan_orders',
           CAST((SELECT count(*) FROM lineitem l
             WHERE l.l_orderkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'orders_orphan_customer',
           CAST((SELECT count(*) FROM orders o
             WHERE o.o_custkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'customer_null_nation',
           CAST((SELECT count(*) FROM customer
                 WHERE c_nationkey IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'documents_empty_text',
           CAST((SELECT count(*) FROM documents
                 WHERE trim(text) = '') AS BIGINT)
    """,
)
def q_integrity_report_tpch(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.expectations import (
        fk_orphans,
        integrity_report,
        null_violations,
        pk_duplicates,
    )

    orders = _t(spark, sf, "orders")
    customer = _t(spark, sf, "customer")
    lineitem = _t(spark, sf, "lineitem")
    docs = _t(spark, sf, "documents")
    return integrity_report([
        ("orders_pk_dup", pk_duplicates(orders, "o_orderkey")),
        ("customer_pk_dup", pk_duplicates(customer, "c_custkey")),
        ("lineitem_orphan_orders", fk_orphans(lineitem, "l_orderkey", orders, "o_orderkey")),
        ("orders_orphan_customer", fk_orphans(orders, "o_custkey", customer, "c_custkey")),
        ("customer_null_nation", null_violations(customer, "c_nationkey")),
        ("documents_empty_text", docs.filter(F.trim("text") == "")),
    ])


@_q(
    "grouped_dataset_split",
    "LEAKAGE-SAFE train/val/test split: the 80/10/10 hash is computed "
    "on the GROUP key (user_id), so every event of a user lands in one "
    "split — the group-aware variant of dataset_split that a temporal/"
    "behavioral corpus needs (row-hash splits leak user history across "
    "train and test)",
    "extension: training-data curation (grouped split)",
    """
    SELECT CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM (
      SELECT user_id,
             CAST(('0x' || substr(md5('gsplit|' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
             % 100 AS b
      FROM events
    )
    GROUP BY split
    """,
)
def q_grouped_dataset_split(spark, sf):
    """Same portable md5 bucket as dataset_split, but keyed on user_id
    alone: split membership is a pure function of the group, so no
    group can straddle splits (leakage-free by construction, no
    post-hoc check needed). The hash rides the event scan — no join
    against a separate user relation."""
    ev = _t(spark, sf, "events")
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("gsplit|"), F.col("user_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split")
    return (
        ev.select(split, "user_id")
        .groupBy("split")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )


@_q(
    "time_weighted_average",
    "Per-user TIME-weighted mean of a piecewise-constant signal: each "
    "value holds until the next event, weighted by its holding "
    "interval in exact integer microseconds; per-user ORDERED fold "
    "(sorted array -> sequential sum) keeps the one float reduction "
    "bit-identical across engines and partitionings — the correct "
    "average for irregular telemetry where arithmetic means over-"
    "weight bursts",
    "extension: time-series analytics (irregular-interval aggregation)",
    """
    WITH ordered AS (
      SELECT user_id,
             list(CAST(epoch_us(ts) AS DOUBLE) ORDER BY epoch_us(ts), value, event_id) AS ts_l,
             list(value ORDER BY epoch_us(ts), value, event_id) AS v_l
      FROM events
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(ts_l) AS BIGINT) AS n_events,
           CAST(ts_l[len(ts_l)] - ts_l[1] AS BIGINT) AS span_us,
           CASE WHEN len(ts_l) > 1 AND ts_l[len(ts_l)] > ts_l[1]
                THEN list_reduce(
                       list_transform(range(1, len(ts_l)),
                         i -> v_l[i] * (ts_l[i + 1] - ts_l[i])),
                       (a, b) -> a + b)
                     / (ts_l[len(ts_l)] - ts_l[1])
           END AS twa
    FROM ordered
    """,
)
def q_time_weighted_average(spark, sf):
    """Sort inside the per-user array (sort_array on (ts, value, id)
    structs), fold terms v_i * Δt_i sequentially — identical op
    order to DuckDB's ORDER BY list + list_reduce. Timestamps become
    DOUBLE microseconds BEFORE differencing on both engines (exact:
    30 days of µs < 2^53). One groupBy; per-user state bounded by the
    user's event count (the per-key-array caveat is the operator's
    documented contract, same as pagerank's neighbor fold)."""
    ev = _t(spark, sf, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    grp = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct(ts_us.alias("t"), F.col("value").alias("v"), F.col("event_id").alias("e")))
        ).alias("arr")
    )
    ts_l = F.transform(F.col("arr"), lambda s: s["t"].cast("double"))
    v_l = F.transform(F.col("arr"), lambda s: s["v"])
    n = F.size("arr")
    first_t = F.element_at(ts_l, 1)
    last_t = F.element_at(ts_l, n)
    terms = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.element_at(v_l, i) * (F.element_at(ts_l, i + 1) - F.element_at(ts_l, i)),
    )
    twa = F.when(
        (n > 1) & (last_t > first_t),
        F.aggregate(terms, F.lit(0.0), lambda a, b: a + b) / (last_t - first_t),
    )
    return grp.select(
        "user_id",
        n.cast("bigint").alias("n_events"),
        (last_t - first_t).cast("bigint").alias("span_us"),
        twa.alias("twa"),
    )


@_q(
    "divergent_tokens_chi2",
    "Corpus drift report: top-20 tokens by two-sample chi-square "
    "contribution between the en slice and the rest — per-token exact-"
    "integer inputs into one fixed float expression, ranked on the "
    "vocab relation (no global float reduction, no ln) — what a "
    "curation pipeline runs when a new source lands: WHICH tokens "
    "shifted, not just that something did",
    "extension: corpus distribution-shift QA",
    r"""
    WITH tok AS (
      SELECT (lang = 'en') AS a,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents
      WHERE lang IS NOT NULL AND trim(text) <> ''
    ),
    counts AS (
      SELECT token,
             sum(CASE WHEN a THEN 1 ELSE 0 END) AS c_a,
             sum(CASE WHEN a THEN 0 ELSE 1 END) AS c_b
      FROM tok WHERE token <> '' GROUP BY token
    ),
    withtot AS (
      SELECT token, c_a, c_b,
             sum(c_a) OVER () AS n_a, sum(c_b) OVER () AS n_b
      FROM counts
    ),
    scored AS (
      SELECT token, CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
             CASE WHEN n_a > 0 AND n_b > 0 THEN
               (((CAST(c_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                  - CAST(c_b AS DOUBLE) * CAST(n_a AS DOUBLE))
                 * (CAST(c_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                    - CAST(c_b AS DOUBLE) * CAST(n_a AS DOUBLE)))
                * CAST(n_a + n_b AS DOUBLE))
               / ((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                  * CAST(c_a + c_b AS DOUBLE))
             END AS chi2_term
      FROM withtot
    )
    SELECT CAST(rank AS INT) AS rank, token, c_a, c_b, chi2_term FROM (
      SELECT *, row_number() OVER (ORDER BY chi2_term DESC NULLS LAST, token ASC) AS rank
      FROM scored
    ) WHERE rank <= 20
    """,
)
def q_divergent_tokens_chi2(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.text import divergent_tokens

    docs = _t(spark, sf, "documents")
    return divergent_tokens(docs, in_a=F.col("lang") == "en", top_k=20)


# =====================================================================
# Round 10: stable-file-store table features (partition pruning, CDF,
# delta-log round-trip), n-way Z-order, retrieval denominator fix
# =====================================================================

@_q(
    "zorder3_cluster",
    "THREE-dimensional Z-order (Morton) layout key over (suppkey, "
    "partkey, quantity) buckets and the per-range clustering profile: "
    "each of 32 Z-ranges covers a tight box in ALL THREE dimensions — "
    "the n-way generalization behind compact(zorder_by=[x, y, w]) "
    "(Delta's OPTIMIZE ZORDER BY takes n columns)",
    "extension: data layout (n-dimensional clustering; "
    "operators/skew.py::zorder_key_n)",
    """
    WITH z AS (
      SELECT l_orderkey * 10 + l_linenumber AS rid,
             l_suppkey % 64 AS xb, l_partkey % 64 AS yb,
             CAST(l_quantity AS BIGINT) % 64 AS wb
      FROM lineitem
    ), zv AS (
      SELECT rid, xb, yb, wb,
             (SELECT SUM(((xb // CAST(POW(2, i) AS BIGINT)) % 2) * CAST(POW(8, i) AS BIGINT)
                       + ((yb // CAST(POW(2, i) AS BIGINT)) % 2) * 2 * CAST(POW(8, i) AS BIGINT)
                       + ((wb // CAST(POW(2, i) AS BIGINT)) % 2) * 4 * CAST(POW(8, i) AS BIGINT))
                FROM range(6) r(i)) AS zval
      FROM z
    ), buckets AS (
      SELECT xb, yb, wb,
             CAST(ntile(32) OVER (ORDER BY zval, rid) AS INT) AS zbucket
      FROM zv
    )
    SELECT zbucket, count(*) AS n,
           min(xb) AS min_x, max(xb) AS max_x,
           min(yb) AS min_y, max(yb) AS max_y,
           min(wb) AS min_w, max(wb) AS max_w
    FROM buckets
    GROUP BY zbucket
    """,
)
def q_zorder3_cluster(spark, sf):
    """Pure integer interleave (bit i of column j at position 3i+j) —
    the oracle recomputes it exactly; rid breaks ntile ties."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import zorder_key_n

    li = _t(spark, sf, "lineitem")
    zv = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        (F.col("l_suppkey") % 64).alias("xb"),
        (F.col("l_partkey") % 64).alias("yb"),
        (F.col("l_quantity").cast("bigint") % 64).alias("wb"),
    ).withColumn(
        "zval",
        zorder_key_n([F.col("xb"), F.col("yb"), F.col("wb")], bits=6),
    )
    # two-phase global ntile (r13): no single-partition WindowExec
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import distributed_ranks

    bucketed = distributed_ranks(
        zv, [("zval", "asc"), ("rid", "asc")], ntile=(32, "zb"),
    )
    return (
        bucketed.select(
            "xb", "yb", "wb", F.col("zb").cast("int").alias("zbucket")
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("xb").alias("min_x"), F.max("xb").alias("max_x"),
            F.min("yb").alias("min_y"), F.max("yb").alias("max_y"),
            F.min("wb").alias("min_w"), F.max("wb").alias("max_w"),
        )
    )


@_q(
    "partition_prune_year",
    "Hive-partitioned ManagedTable (partition_by=['o_year']) read "
    "through listing-time partition pruning: only the two probed "
    "years' files are ever opened (the reference's folder-per-run "
    "bronze pruning, readme.md:27, as a first-class table feature), "
    "then a per-year rollup — exact-integer cent sums, one final "
    "division",
    "extension: partitioned tables (sources/tables.py partition_by)",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           count(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS sum_price
    FROM orders
    WHERE year(o_orderdate) BETWEEN 1996 AND 1997
    GROUP BY 1
    """,
)
def q_partition_prune_year(spark, sf):
    """Builds the partitioned table in a temp warehouse, reads through
    read_pruned — the partition-value stats entries skip every file
    outside 1996-97 at LISTING time — and aggregates. The partition
    column itself is reconstructed from the hive paths (data files
    omit it, Delta-style)."""
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    o = _t(spark, sf, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    t = Catalog(spark, _scratch_warehouse("q_part", sf)).table("orders_by_year")
    t.overwrite(o, partition_by=["o_year"])
    pruned = t.read_pruned({"o_year": (1996, 1997)})
    return pruned.groupBy("o_year").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("double") / F.lit(100.0)
        ).alias("sum_price"),
    )


@_q(
    "change_feed_updates",
    "Delta-CDF-style change feed off a file-pruned keyed merge: "
    "upsert a batch (+100 balance on 15 keys, one brand-new key) into "
    "a ManagedTable, then changes_since(v0) pairs the delete+insert of "
    "each touched key into update_pre/update_post and flags the new "
    "key as insert — computed from ONLY the files the merge touched",
    "extension: change data feed (sources/tables.py changes_since)",
    """
    WITH touched AS (SELECT * FROM customer WHERE c_custkey <= 15)
    SELECT c_custkey, 'update_pre' AS _change_type,
           round(c_acctbal, 9) AS acctbal
    FROM touched
    UNION ALL
    SELECT c_custkey, 'update_post', round(c_acctbal + 100.0, 9)
    FROM touched
    UNION ALL
    SELECT 999999, 'insert',
           round((SELECT c_acctbal FROM customer WHERE c_custkey = 1) + 100.0, 9)
    """,
)
def q_change_feed_updates(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    c = _t(spark, sf, "customer")
    t = Catalog(spark, _scratch_warehouse("q_cdf", sf)).table("dim_customer")
    t.overwrite(c.repartition(8, "c_custkey"))
    v0 = t.current_version()
    batch = c.filter("c_custkey <= 15").unionByName(
        c.filter("c_custkey = 1").withColumn(
            "c_custkey", F.lit(999999).cast("long")
        )
    ).withColumn("c_acctbal", F.col("c_acctbal") + F.lit(100.0))
    t.merge_keyed(
        batch, ["c_custkey"],
        lambda cur, b: cur.join(
            b.select("c_custkey"), "c_custkey", "left_anti"
        ).unionByName(b),
    )
    feed = t.changes_since(v0, keys=["c_custkey"])
    return feed.select(
        "c_custkey", "_change_type", F.round("c_acctbal", 9).alias("acctbal")
    )


@_q(
    "delta_log_roundtrip",
    "Full Delta transaction-log round-trip through an INDEPENDENT "
    "reader: overwrite + append + classic checkpoint + keyed merge on "
    "a ManagedTable, then read the result back via sources/deltareader "
    "(public protocol only: _last_checkpoint -> checkpoint parquet -> "
    "tail commits — never the engine's own pointer) and verify the "
    "content against plain SQL",
    "S6 (silver_Dimensions.py:55 format('delta')) — offline stand-in "
    "for the delta-spark read-back",
    """
    SELECT n_nationkey,
           CASE WHEN n_nationkey = 3 THEN 'UPDATED' ELSE n_name END AS n_name,
           n_regionkey
    FROM (
      SELECT n_nationkey, n_name, n_regionkey FROM nation
      UNION ALL
      SELECT n_nationkey + 100, n_name, n_regionkey FROM nation
    )
    """,
)
def q_delta_log_roundtrip(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.deltareader import read_delta
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    n = _t(spark, sf, "nation")
    t = Catalog(spark, _scratch_warehouse("q_dlr", sf)).table("nation_t")
    t.overwrite(n)
    t.append(n.withColumn(
        "n_nationkey", (F.col("n_nationkey") + 100).cast("int")
    ))
    t.write_delta_checkpoint()  # reader must PREFER this and replay the tail
    upd = n.filter("n_nationkey = 3").withColumn("n_name", F.lit("UPDATED"))
    t.merge_keyed(
        upd, ["n_nationkey"],
        lambda cur, b: cur.join(
            b.select("n_nationkey"), "n_nationkey", "left_anti"
        ).unionByName(b),
    )
    return read_delta(spark, t.dir).select("n_nationkey", "n_name", "n_regionkey")


@_q(
    "dml_delete_update",
    "Predicate DML on a ManagedTable (Delta's DELETE/UPDATE verbs, "
    "completing the MERGE triad): DELETE low-value finished orders, "
    "then UPDATE urgent orders' price in place — both as stats-pruned "
    "file rewrites (only files holding a matching row are rewritten; "
    "data-skipping bounds auto-derived from the condition) — and read "
    "the final state back",
    "extension: predicate DML (sources/tables.py delete_where/"
    "update_where; reference gold DML surface DimUser.py:20-29)",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           round(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN o_totalprice + 100000.0
                      ELSE o_totalprice END, 9) AS price
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 50000)
    """,
)
def q_dml_delete_update(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    o = _t(spark, sf, "orders")
    t = Catalog(spark, _scratch_warehouse("q_dml", sf)).table("orders_t")
    t.overwrite(
        o.repartitionByRange(8, "o_orderkey").sortWithinPartitions("o_orderkey")
    )
    t.delete_where("o_orderstatus = 'F' AND o_totalprice < 50000")
    t.update_where(
        "o_orderpriority = '1-URGENT'",
        {"o_totalprice": "o_totalprice + 100000.0"},
    )
    return t.read().select(
        "o_orderkey", "o_orderstatus", "o_orderpriority",
        F.round("o_totalprice", 9).alias("price"),
    )


@_q(
    "dml_change_feed",
    "Change feed across a DELETE + UPDATE chain: a CDF-enabled "
    "ManagedTable materializes EXACT row-level change files per DML "
    "commit (no diffing — the matched set IS the change set), and "
    "changes_since(v0) drains delete rows plus update_pre/update_post "
    "pairs, the rows an incremental gold consumer folds",
    "extension: CDF over predicate DML (sources/tables.py "
    "changes_since; T6/DLT apply-changes deletes DimUser.py:20-29)",
    """
    SELECT n_nationkey, 'delete' AS _change_type,
           round(n_acctbal_like, 9) AS val
    FROM (SELECT n_nationkey, CAST(n_nationkey * 10 AS DOUBLE) AS n_acctbal_like
          FROM nation WHERE n_regionkey = 2)
    UNION ALL
    SELECT n_nationkey, 'update_pre', round(CAST(n_nationkey * 10 AS DOUBLE), 9)
    FROM nation WHERE n_regionkey = 0
    UNION ALL
    SELECT n_nationkey, 'update_post',
           round(CAST(n_nationkey * 10 AS DOUBLE) + 5.0, 9)
    FROM nation WHERE n_regionkey = 0
    """,
)
def q_dml_change_feed(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    n = _t(spark, sf, "nation").select(
        "n_nationkey", "n_regionkey",
        (F.col("n_nationkey") * 10).cast("double").alias("bal"),
    )
    t = Catalog(spark, _scratch_warehouse("q_dmlcf", sf)).table("nation_t")
    t.overwrite(n, enable_cdf=True)
    v0 = t.current_version()
    t.delete_where("n_regionkey = 2")
    t.update_where("n_regionkey = 0", {"bal": "bal + 5.0"})
    feed = t.changes_since(v0, keys=["n_nationkey"])
    return feed.select(
        "n_nationkey", "_change_type", F.round("bal", 9).alias("val")
    )


@_q(
    "bin_packing_roundtrip",
    "Incremental bin-packing OPTIMIZE (Delta auto-compact semantics): "
    "a base snapshot plus four small micro-batch appends, then "
    "compact_small rewrites ONLY the sub-threshold files into one "
    "packed file (right-sized files carried by reference, "
    "dataChange=false commit) — content must be byte-identical to the "
    "plain union",
    "extension: small-file maintenance (sources/tables.py "
    "compact_small; DLT autoOptimize on silver_Dimensions.py:55 sinks)",
    """
    SELECT s_suppkey, s_name, s_nationkey FROM supplier
    UNION ALL
    SELECT s_suppkey + 100000 * b, s_name, s_nationkey
    FROM supplier, (SELECT UNNEST([1,2,3,4]) AS b)
    WHERE s_suppkey < 5
    """,
)
def q_bin_packing_roundtrip(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    t = Catalog(spark, _scratch_warehouse("q_pack", sf)).table("supplier_t")
    t.overwrite(s)
    for b in (1, 2, 3, 4):
        t.append(
            s.filter("s_suppkey < 5").withColumn(
                "s_suppkey", F.col("s_suppkey") + F.lit(100000 * b)
            ).coalesce(1)
        )
    n_before = len(t.data_files())
    t.compact_small(max_file_bytes=64 << 10)
    # the pack must actually have packed (else the entry silently
    # stops exercising the path when testdata sizes drift)
    assert len(t.data_files()) < n_before, "compact_small packed nothing"
    return t.read().select("s_suppkey", "s_name", "s_nationkey")


@_q(
    "check_constraint_gate",
    "Write-side CHECK constraint enforcement (Delta ALTER TABLE ADD "
    "CONSTRAINT): bind acctbal >= -1000 on a ManagedTable, append a "
    "compliant batch (lands), then a violating batch — rejected IN the "
    "write projection (raise_error guard, no extra validation pass) "
    "with the table left exactly at its pre-violation state",
    "extension: CHECK constraints (sources/tables.py add_constraint/"
    "_constraint_guard; P6 expectations done at the storage layer)",
    """
    SELECT c_custkey, c_mktsegment, round(c_acctbal, 9) AS bal FROM customer
    UNION ALL
    SELECT c_custkey + 1000000, c_mktsegment, 0.0 FROM customer
    WHERE c_custkey < 5
    """,
)
def q_check_constraint_gate(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    c = _t(spark, sf, "customer")
    t = Catalog(spark, _scratch_warehouse("q_ckc", sf)).table("cust_t")
    t.overwrite(c)
    t.add_constraint("bal_floor", "c_acctbal >= -1000")
    ok = c.filter("c_custkey < 5").withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(1000000)
    ).withColumn("c_acctbal", F.lit(0.0))
    t.append(ok)
    bad = ok.withColumn("c_acctbal", F.lit(-999999.0)).withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(1000000)
    )
    try:
        t.append(bad)
        raise AssertionError("CHECK constraint failed to reject the batch")
    except Exception as exc:  # noqa: BLE001 — the guard raises in-job
        if "bal_floor" not in str(exc):
            raise
    return t.read().select(
        "c_custkey", "c_mktsegment", F.round("c_acctbal", 9).alias("bal")
    )


@_q(
    "time_travel_asof",
    "TIMESTAMP AS OF time travel: three commits on a ManagedTable "
    "(overwrite + two appends), then read_as_of(second commit's "
    "log timestamp) reconstructs exactly the two-commit snapshot — the "
    "instant-to-version mapping comes from commitInfo timestamps with "
    "Delta's monotonic adjustment, never the engine pointer",
    "extension: time travel (sources/tables.py read_as_of; "
    "delta-protocol commitInfo)",
    """
    SELECT r_regionkey, r_name FROM region
    UNION ALL
    SELECT r_regionkey + 100, r_name FROM region
    """,
)
def q_time_travel_asof(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    r = _t(spark, sf, "region").select("r_regionkey", "r_name")
    t = Catalog(spark, _scratch_warehouse("q_asof", sf)).table("region_t")
    t.overwrite(r)
    t.append(r.withColumn(
        "r_regionkey", (F.col("r_regionkey") + 100).cast("int")
    ))
    t.append(r.withColumn(
        "r_regionkey", (F.col("r_regionkey") + 200).cast("int")
    ))
    # pick the ADJUSTED stamp of the second commit (same monotonic
    # adjustment read_as_of applies), so the mapping is exact even if
    # two commits land in the same millisecond
    stamps = [ts for _, ts in sorted(
        (row.version, row.timestamp) for row in t.history().collect()
    )]
    adj: list[int] = []
    for raw in stamps:
        adj.append(max(raw, adj[-1] + 1) if adj else raw)
    return t.read_as_of(adj[1]).select("r_regionkey", "r_name")


@_q(
    "retrieval_eval_universe",
    "Retrieval scorecard with a FIXED query universe: the retriever "
    "only returned results for 8 of 10 evaluated queries — the "
    "universe re-enters the empty-result queries with contribution 0 "
    "instead of silently inflating precision@k/MRR (the r9-advisor "
    "denominator fix, exercised end to end)",
    "extension: retrieval evaluation (operators/metrics.py "
    "retrieval_eval query_universe)",
    """
    WITH q8 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
    uni AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10),
    qrel AS (SELECT vec_id, label FROM embeddings WHERE vec_id < 10),
    pairs AS (
      SELECT q8.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce(list_transform(range(1, len(q8.embedding) + 1),
               i -> CAST(q8.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), (a,b) -> a + b)
             / (sqrt(list_reduce(list_transform(range(1, len(q8.embedding) + 1),
                  i -> CAST(q8.embedding[i] AS DOUBLE) * CAST(q8.embedding[i] AS DOUBLE)), (a,b) -> a + b))
                * sqrt(list_reduce(list_transform(range(1, len(c.embedding) + 1),
                  i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), (a,b) -> a + b)))
               AS cos_sim
      FROM q8 JOIN embeddings c ON q8.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM pairs
    ),
    rel AS (
      SELECT qrel.vec_id AS query_id, c.vec_id AS item_id
      FROM qrel JOIN embeddings c ON qrel.label = c.label AND qrel.vec_id <> c.vec_id
    ),
    per_q AS (
      SELECT r.query_id,
             count(rel.item_id) AS hits,
             min(CASE WHEN rel.item_id IS NOT NULL THEN r.rank END) AS first_rel
      FROM ranked r LEFT JOIN rel
        ON r.query_id = rel.query_id AND r.neighbor_id = rel.item_id
      WHERE r.rank <= 10
      GROUP BY r.query_id
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_queries,
             CAST(coalesce(sum(coalesce(hits, 0)), 0) AS BIGINT) AS hits_at_k,
             CAST(coalesce(sum(CAST(2520 / first_rel AS BIGINT)), 0) AS BIGINT) AS mrr_num
      FROM uni LEFT JOIN per_q ON uni.query_id = per_q.query_id
    )
    SELECT n_queries, hits_at_k, mrr_num,
           CAST(2520 AS BIGINT) AS mrr_scale,
           CAST(hits_at_k AS DOUBLE) / CAST(n_queries * 10 AS DOUBLE) AS precision_at_k,
           CAST(mrr_num AS DOUBLE) / CAST(n_queries * 2520 AS DOUBLE) AS mrr
    FROM agg
    """,
)
def q_retrieval_eval_universe(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import retrieval_eval
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf, "embeddings")
    uni = emb.filter("vec_id < 10").select(F.col("vec_id").alias("query_id"))
    ranked = brute_force_topk(emb, emb.filter("vec_id < 8"), k=10)
    rel = (
        emb.filter("vec_id < 10")
        .select(F.col("vec_id").alias("query_id"), F.col("label").alias("_ql"))
        .join(
            emb.select(F.col("vec_id").alias("item_id"), F.col("label").alias("_cl")),
            F.col("_ql") == F.col("_cl"),
        )
        .filter(F.col("query_id") != F.col("item_id"))
        .select("query_id", "item_id")
    )
    return retrieval_eval(ranked, rel, k=10, query_universe=uni)


@_q(
    "brier_score",
    "EXACT Brier score (mean squared error of a quantized probability "
    "vs a binary label) from the SAME per-bin (pos, neg) monoid as the "
    "exact AUC — calibration's quadratic view and ranking's AUC view "
    "funded by one mergeable streaming accumulator; all integer "
    "arithmetic until one final IEEE division",
    "extension: eval metrics (exact Brier over the bin monoid)",
    """
    WITH b AS (
      SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS bin,
             CASE WHEN label >= 5 THEN 1 ELSE 0 END AS p
      FROM embeddings
      WHERE embedding[1] IS NOT NULL AND label IS NOT NULL
    ), per AS (
      SELECT bin, sum(p) AS pos, sum(1 - p) AS neg FROM b GROUP BY bin
    )
    SELECT CAST(sum(pos) + sum(neg) AS BIGINT) AS n,
           CAST(sum(pos * (1000 - bin) * (1000 - bin) + neg * bin * bin)
                AS BIGINT) AS brier_num,
           CAST(sum(pos * (1000 - bin) * (1000 - bin) + neg * bin * bin)
                AS DOUBLE)
             / (1000000.0 * CAST(sum(pos) + sum(neg) AS DOUBLE)) AS brier
    FROM per
    """,
)
def q_brier_score(spark, sf):
    """Score = embedding[0] quantized to 3 decimals, positive = label
    >= 5 (the binary_auc_exact conventions — deliberately, so the two
    metrics demonstrably share one drain state). brier_num rides
    decimal(38,0) in the operator (int64-safe past ~1e13 rows); cast
    to bigint here only for the driver's pandas hashing."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import binned_brier

    e = _t(spark, sf, "embeddings")
    score_bin = F.floor(F.element_at("embedding", 1).cast("double") * 1000)
    out = binned_brier(e, score_bin, F.col("label") >= 5)
    return out.withColumn("brier_num", F.col("brier_num").cast("bigint"))


@_q(
    "resample_ffill_daily",
    "Per-user daily-grid resample with forward fill (the as-of view "
    "of an irregular event series): one row per day between a user's "
    "first and last event carrying the most recent event's value — "
    "grid explode + ONE key-partitioned window, never the quadratic "
    "per-point as-of range join",
    "extension: time-series resampling (operators/intervals.py "
    "resample_ffill)",
    """
    WITH obs AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec,
             value, event_id
      FROM events
    ),
    bounds AS (
      SELECT user_id,
             CAST(ceil(CAST(min(sec) AS DOUBLE) / 86400) AS BIGINT) * 86400 AS lo,
             CAST(floor(CAST(max(sec) AS DOUBLE) / 86400) AS BIGINT) * 86400 AS hi
      FROM obs GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(range(lo, hi + 1, 86400)) AS sec
      FROM bounds WHERE hi >= lo
    ),
    u AS (
      SELECT user_id, sec, value, 0 AS is_grid, event_id FROM obs
      UNION ALL
      SELECT user_id, sec, NULL, 1, NULL FROM grid
    ),
    f AS (
      SELECT user_id, sec, is_grid,
             last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY sec, is_grid, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
      FROM u
    )
    SELECT user_id, sec AS grid_sec, value FROM f WHERE is_grid = 1
    """,
)
def q_resample_ffill_daily(spark, sf):
    """Epoch seconds = floor(unix_micros/1e6) (exact in double);
    same-second ties resolve by event_id both engines."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.intervals import resample_ffill

    e = _t(spark, sf, "events")
    sec = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000)
    ).cast("bigint")
    return resample_ffill(
        e, "user_id", sec, "value", step=86400, order_col="event_id"
    )


@_q(
    "asof_join_click",
    "Backward AS-OF join: attach to every purchase the user's most "
    "recent click value at or before it (point-in-time feature "
    "lookup) — the union trick: tag both sides, ONE key-partitioned "
    "window carries the right payload forward, so each key streams "
    "through a single sort instead of the quadratic per-row range "
    "join",
    "extension: as-of / point-in-time join (operators/intervals.py "
    "asof_join)",
    """
    WITH e AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec,
             event_id, value, event_type
      FROM events
    ),
    u AS (
      SELECT user_id, sec, 0 AS side, event_id AS ord,
             struct_pack(v := value) AS p,
             NULL::BIGINT AS l_event_id, NULL::DOUBLE AS l_value
      FROM e WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, sec, 1, NULL, NULL, event_id, value
      FROM e WHERE event_type = 'purchase'
    ),
    f AS (
      SELECT user_id, sec, side, l_event_id, l_value,
             last_value(p IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY sec, side, ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st
      FROM u
    )
    SELECT user_id, sec, l_event_id AS event_id, l_value AS value,
           st.v AS value_click
    FROM f WHERE side = 1
    """,
)
def q_asof_join_click(spark, sf):
    """Right rows at the purchase's own second count as <= (right side
    sorts before left at a tie); same-second click ties resolve by
    event_id in BOTH engines."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.intervals import asof_join

    e = _t(spark, sf, "events").withColumn(
        "sec",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000)
        ).cast("bigint"),
    )
    purchases = e.filter("event_type = 'purchase'").select(
        "user_id", "sec", "event_id", "value"
    )
    clicks = e.filter("event_type = 'click'").select(
        "user_id", "sec", "event_id", "value"
    )
    return asof_join(
        purchases, clicks, "user_id", "sec", "sec",
        value_cols=["value"], order_col="event_id", suffix="_click",
    )


@_q(
    "pack_segments_2048",
    "Segment-level sequence packing (the dataloader's view of GPT-"
    "style concat-and-chunk): per-lang document streams cut every "
    "2048 tokens, one row per (document x pack it crosses) with the "
    "doc-relative token slice — the materialized assignment a "
    "training job reads, exact integers throughout",
    "extension: training-data curation (operators/curation.py "
    "pack_segments)",
    r"""
    WITH d AS (
      SELECT lang, doc_id,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS cnt
      FROM documents
      WHERE text IS NOT NULL
    ),
    c AS (
      SELECT lang, doc_id, cnt,
             coalesce(sum(cnt) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
      FROM d
    ),
    seg AS (
      SELECT lang, doc_id, cnt, st,
             unnest(range(CAST(st // 2048 AS BIGINT),
                          CAST((st + cnt - 1) // 2048 + 1 AS BIGINT))) AS seq_id
      FROM c WHERE cnt > 0
    )
    SELECT lang AS shard, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
           CAST(greatest(st, seq_id * 2048) - st AS BIGINT) AS off_from,
           CAST(least(st + cnt, (seq_id + 1) * 2048) - st AS BIGINT) AS off_to
    FROM seg
    """,
)
def q_pack_segments_2048(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import pack_segments

    docs = _t(spark, sf, "documents")
    return pack_segments(docs, budget=2048, shard_col="lang")



@_q(
    "merge_bloom_pruned",
    "Keyed merge through the per-file Bloom index (r11): the dimension "
    "is HASH-laid-out so min/max ranges prune nothing, the bound "
    "blooms pin touched-file discovery to the files actually holding "
    "the batch's spread keys, and the merged content must be "
    "byte-identical to the plain SQL last-write semantics — proving "
    "the probe path is a pure IO optimization",
    "J1 (DimUser.py:20-29 CDC merge) + Delta delta.bloomFilter.* "
    "analog (sources/tables.py bind_bloom_filters)",
    """
    SELECT c_custkey, c_name,
           CAST(ROUND(c_acctbal * 100) AS BIGINT)
             + CASE WHEN c_custkey % 71 = 3 THEN 100000 ELSE 0 END AS cents
    FROM customer
    """,
)
def q_merge_bloom_pruned(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    c = _t(spark, sf, "customer").select(
        "c_custkey", "c_name",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    t = Catalog(spark, _scratch_warehouse("q_mbp", sf)).table("dim_customer")
    t.bind_bloom_filters(["c_custkey"], bits=16384)
    t.overwrite(c.repartition(8, "c_custkey"))  # hash layout: ranges useless
    batch = c.filter(F.pmod(F.col("c_custkey"), F.lit(71)) == 3).withColumn(
        "cents", F.col("cents") + F.lit(100000)
    )
    t.merge_keyed(
        batch, ["c_custkey"],
        lambda cur, b: cur.join(
            b.select("c_custkey"), "c_custkey", "left_anti"
        ).unionByName(b),
    )
    return t.read()


@_q(
    "delta_retention_roundtrip",
    "Delta log RETENTION round-trip (r11): 12 commits cross the "
    "automatic 10-commit checkpoint cadence, vacuum expires the "
    "commit JSONs below the checkpoint floor, and the INDEPENDENT "
    "public-protocol reader (checkpoint -> tail commits, never the "
    "engine's pointer) must still reconstruct the exact table content "
    "— the bounded-log contract a long-lived streaming sink relies on",
    "S6 (silver_Dimensions.py:55 format('delta')) — log retention + "
    "checkpoint cadence",
    """
    SELECT CAST(n_nationkey + 100 * r.i AS INT) AS n_nationkey,
           n_name, n_regionkey
    FROM nation, range(CAST(0 AS BIGINT), CAST(12 AS BIGINT)) AS r(i)
    """,
)
def q_delta_retention_roundtrip(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.deltareader import read_delta
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    n = _t(spark, sf, "nation")
    t = Catalog(spark, _scratch_warehouse("q_drr", sf)).table("nation_t")

    def slice_i(i: int):
        return n.withColumn(
            "n_nationkey", (F.col("n_nationkey") + 100 * i).cast("int")
        )

    t.overwrite(slice_i(0).coalesce(1))
    for i in range(1, 12):  # delta commits 1..11 — checkpoint lands at 10
        t.append(slice_i(i).coalesce(1))
    t.vacuum(keep=2)  # expires commit JSONs below the checkpoint floor
    return read_delta(spark, t.dir).select("n_nationkey", "n_name", "n_regionkey")


@_q(
    "sql_maintenance_roundtrip",
    "Databricks SQL maintenance verbs through the router (r12): "
    "OPTIMIZE packs the small appends (content-identical), VACUUM "
    "RETAIN 2 VERSIONS prunes history, DESCRIBE HISTORY shows the "
    "OPTIMIZE commit — and the table content is byte-identical to the "
    "plain union throughout",
    "S10 (sources/tables.py Catalog._sql_util; Databricks SQL "
    "OPTIMIZE/VACUUM/DESCRIBE surface)",
    """
    SELECT s_suppkey, s_name FROM supplier
    UNION ALL
    SELECT s_suppkey + 100000 * b, s_name
    FROM supplier, (SELECT UNNEST([1,2,3]) AS b)
    WHERE s_suppkey < 4
    """,
)
def q_sql_maintenance_roundtrip(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    cat = Catalog(spark, _scratch_warehouse("q_sqlmaint", sf))
    t = cat.table("supp")
    t.overwrite(s)
    for b in (1, 2, 3):
        t.append(
            s.filter("s_suppkey < 4").withColumn(
                "s_suppkey", F.col("s_suppkey") + F.lit(100000 * b)
            ).coalesce(1)
        )
    n_before = len(t.data_files())
    cat.sql("OPTIMIZE supp")
    assert len(t.data_files()) < n_before, "OPTIMIZE packed nothing"
    cat.sql("VACUUM supp RETAIN 2 VERSIONS")
    assert t._pointer_state().get("committed_floor", 0) > 0
    ops = [r.operation for r in cat.sql("DESCRIBE HISTORY supp").collect()]
    assert "OPTIMIZE" in ops, ops
    return t.read().select("s_suppkey", "s_name")


@_q(
    "dv_small_delete",
    "Deletion vectors (r12): three 1-row DELETEs tombstone their files "
    "(O(matched rows), ZERO data files rewritten — asserted on inodes) "
    "while a 20%-selectivity DELETE takes the rewrite path; the mixed "
    "DV+rewrite history survives a checkpoint + vacuum and is replayed "
    "by the INDEPENDENT public-protocol reader (remove+add-with-dv "
    "encoding, tombstones subtracted per file)",
    "extension: small-delete DV path (sources/tables.py _read_members/"
    "_resolve_dv; Delta deletionVectors re-expressed as tombstone rows)",
    """
    SELECT c_custkey, c_mktsegment, round(CAST(c_acctbal AS DOUBLE), 9) AS bal
    FROM customer
    WHERE c_custkey NOT IN (7, 77, 117)
      AND c_mktsegment <> 'BUILDING'
    """,
)
def q_dv_small_delete(spark, sf):
    import os as _os

    from end_to_end_azure_databricks_data_engineering_project_spark.sources.deltareader import read_delta
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    c = _t(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    t = Catalog(spark, _scratch_warehouse("q_dv", sf)).table("cust")
    t.overwrite(
        c.repartitionByRange(4, "c_custkey").sortWithinPartitions("c_custkey")
    )
    inodes0 = {f.name: _os.stat(f).st_ino for f in t.data_files()}
    for k in (7, 77, 117):  # 1-row deletes: DV path, no rewrite
        # (keys chosen to exist at every sf incl. sf0.001's 150 rows)
        v = t.delete_where(f"c_custkey = {k}")
        assert t._manifest(v).get("dv_added"), "small delete missed the DV path"
    assert {
        f.name: _os.stat(f).st_ino for f in t.data_files()
    } == inodes0, "a DV delete rewrote a data file"
    v = t.delete_where("c_mktsegment = 'BUILDING'")  # ~20%: rewrite path
    assert t._manifest(v)["removed"], "large delete missed the rewrite path"
    t.write_delta_checkpoint()
    t.vacuum(keep=2)
    # the INDEPENDENT protocol reader is the returned frame
    return read_delta(spark, t.dir).select(
        "c_custkey", "c_mktsegment", F.round("bal", 9).alias("bal")
    )


@_q(
    "sql_merge_roundtrip",
    "MERGE INTO through the SQL router (r12): the Databricks CDC "
    "idiom — WHEN MATCHED AND s.op='D' THEN DELETE / WHEN MATCHED "
    "THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT * — parsed "
    "quote-aware, routed onto merge_keyed (stats/Bloom-pruned file "
    "rewrites), source op column never stored",
    "S10 + J1 (sources/tables.py Catalog._sql_merge; reference "
    "DimUser.py:20-29 semantics as Databricks SQL, "
    "sample_exploration.py:11-13 ad-hoc SQL)",
    """
    SELECT c_custkey, c_mktsegment, round(bal, 9) AS bal FROM (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 10 = 3
                  THEN CAST(c_acctbal AS DOUBLE) + 1000.0
                  ELSE CAST(c_acctbal AS DOUBLE) END AS bal
      FROM customer
      WHERE NOT (c_custkey % 10 = 7)
      UNION ALL
      SELECT c_custkey + 1000000, c_mktsegment, 1.5
      FROM customer WHERE c_custkey % 10 = 1
    )
    """,
)
def q_sql_merge_roundtrip(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    c = _t(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    cat = Catalog(spark, _scratch_warehouse("q_sqlmerge", sf))
    t = cat.table("cust")
    t.overwrite(c.repartitionByRange(4, "c_custkey").sortWithinPartitions("c_custkey"))
    # CDC feed: %10==7 delete, %10==3 update (+1000), %10==1 insert (new key)
    feed = (
        c.filter("c_custkey % 10 = 7").withColumn("op", F.lit("D"))
        .unionByName(
            c.filter("c_custkey % 10 = 3")
            .withColumn("bal", F.col("bal") + 1000.0)
            .withColumn("op", F.lit("U"))
        )
        .unionByName(
            c.filter("c_custkey % 10 = 1")
            .withColumn("c_custkey", F.col("c_custkey") + 1000000)
            .withColumn("bal", F.lit(1.5))
            .withColumn("op", F.lit("I"))
        )
    )
    feed.createOrReplaceTempView("cdc_feed_sqlmerge")
    v = cat.sql(
        "MERGE INTO cust USING (SELECT * FROM cdc_feed_sqlmerge) s "
        "ON cust.c_custkey = s.c_custkey "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert v == t.current_version(), "SQL MERGE committed nothing"
    return t.read().select(
        "c_custkey", "c_mktsegment", F.round("bal", 9).alias("bal")
    )


@_q(
    "sql_time_travel",
    "Time travel through the SQL router (r12): DELETE via SQL DML, "
    "then SELECT ... FROM t VERSION AS OF 0 — the reference rewritten "
    "onto the pre-delete snapshot resolved through the transaction "
    "log's commitInfo (delta version -> engine snapshot), Spark's "
    "parser never sees the AS OF clause",
    "S10 + extension time travel (sources/tables.py "
    "_rewrite_time_travel/read_delta_version)",
    """
    SELECT s_suppkey, s_name, round(CAST(s_acctbal AS DOUBLE), 9) AS bal
    FROM supplier
    """,
)
def q_sql_time_travel(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    s = _t(spark, sf, "supplier").select(
        "s_suppkey", "s_name", F.col("s_acctbal").cast("double").alias("bal")
    )
    cat = Catalog(spark, _scratch_warehouse("q_sqltt", sf))
    t = cat.table("supp")
    t.overwrite(s)
    cat.sql("DELETE FROM supp WHERE s_suppkey % 2 = 0")
    assert t.read().count() < s.count(), "DELETE routed nothing"
    return cat.sql(
        "SELECT s_suppkey, s_name, round(bal, 9) AS bal "
        "FROM supp VERSION AS OF 0"
    )


@_q(
    "gold_delete_propagation",
    "Deletes propagate through the gold drain (r12; ≙ DLT "
    "create_auto_cdc_flow apply_as_deletes): silver UPDATE then DELETE "
    "via predicate DML, one gold_flow drain folds BOTH from the change "
    "feed per commit — updated keys close at the new sequence and "
    "re-open, deleted keys close at their own sequence (history "
    "retained), nothing re-reads the silver table",
    "T6/J2 + r11 DML (streaming/flows.py gold_flow; operators/cdc.py "
    "scd2_apply delete_expr; reference DimUser.py:20-29 "
    "apply_as_deletes)",
    """
    WITH base AS (
      SELECT c_custkey AS k, c_name AS name,
             round(CAST(c_acctbal AS DOUBLE), 9) AS bal
      FROM customer
    )
    SELECT k, name, bal, CAST(1.0 AS DOUBLE) AS start_at,
           CAST(CASE WHEN k % 10 = 0 THEN 2.0
                     WHEN k % 7 = 0 THEN 1.0
                     ELSE NULL END AS DOUBLE) AS end_at
    FROM base
    UNION ALL
    SELECT k, name, round(bal + 100, 9), CAST(2.0 AS DOUBLE), NULL
    FROM base WHERE k % 10 = 0
    """,
)
def q_gold_delete_propagation(spark, sf):
    from pathlib import Path as _P

    from end_to_end_azure_databricks_data_engineering_project_spark.config import TableConfig
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import gold_flow

    c = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").cast("double").alias("bal"),
        F.lit(1.0).alias("updated_at"),
    )
    wh = _scratch_warehouse("q_golddel", sf)
    cat = Catalog(spark, wh)
    silver = cat.table("silver_cust")
    # enable_cdf=True (r14, guide §1.2 — the house's own _nudge_cdf_for_dml
    # guidance): the drain's change feed comes from MATERIALIZED change
    # files written by the DML commits themselves, instead of
    # changes_since re-deriving it by diffing two whole snapshots per
    # commit — at scale that swaps two full-table reads per drained
    # commit for a scan of just the change files. Same feed rows, same
    # gold output (A/B'd identical; oracle green); 54 -> 50 jobs,
    # ~9.5 -> ~7.2 s warm at sf0.1.
    silver.overwrite(
        c.repartitionByRange(4, "k").sortWithinPartitions("k"),
        enable_cdf=True,
    )
    cfg = TableConfig(
        schema_name="gold", table="cust", cdc_col="updated_at",
        keys=("k",), spark_schema=c.schema, scd_type=2,
    )
    state = _P(wh) / "_state"
    state.mkdir(exist_ok=True)
    flow = gold_flow(spark, cfg, cat, str(state))
    flow()  # initial full load (no cursor yet)
    silver.update_where("k % 10 = 0", {"bal": "bal + 100", "updated_at": "2.0"})
    silver.delete_where("k % 10 <> 0 AND k % 7 = 0")
    n = flow()  # change-feed drain: update post-images + delete rows
    assert n > 0, "drain folded nothing — delete propagation not exercised"
    g = cat.table("gold_cust").read()
    return g.select(
        "k", "name", F.round("bal", 9).alias("bal"),
        F.col("__START_AT").alias("start_at"),
        F.col("__END_AT").alias("end_at"),
    )


@_q(
    "sql_ddl_roundtrip",
    "SQL DDL routed onto ManagedTables (r12 verdict missing #3): CTAS "
    "from a query, INSERT INTO VALUES, ALTER TABLE ADD COLUMNS "
    "(additive zero-rewrite schema evolution — old files carry by "
    "reference and read as NULL), UPDATE backfill, final SELECT — the "
    "Databricks notebook workflow (sample_exploration.py:11-13) "
    "end-to-end through Catalog.sql",
    "extension: SQL DDL router (sources/tables.py _sql_ddl)",
    """
    WITH base AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer WHERE c_acctbal > 5000
      UNION ALL
      SELECT -1, 'manual row', 0.0
    )
    SELECT c_custkey, c_name, round(bal, 9) AS bal,
           CASE WHEN bal >= 7500 THEN 'high' ELSE 'low' END AS tier
    FROM base
    """,
)
def q_sql_ddl_roundtrip(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    cat = Catalog(spark, _scratch_warehouse("q_ddl", sf))
    _t(spark, sf, "customer").createOrReplaceTempView("ddl_customer_src")
    cat.sql(
        "CREATE TABLE ddl_demo AS SELECT c_custkey, c_name, "
        "CAST(c_acctbal AS DOUBLE) AS bal FROM ddl_customer_src "
        "WHERE c_acctbal > 5000"
    )
    cat.sql("INSERT INTO ddl_demo VALUES (-1, 'manual row', 0.0)")
    cat.sql("ALTER TABLE ddl_demo ADD COLUMNS (tier STRING)")
    cat.sql(
        "UPDATE ddl_demo SET tier = CASE WHEN bal >= 7500 "
        "THEN 'high' ELSE 'low' END"
    )
    return cat.sql(
        "SELECT c_custkey, c_name, round(bal, 9) AS bal, tier "
        "FROM ddl_demo"
    )


@_q(
    "stream_table_source",
    "ManagedTable as a TRUE readStream source (S7 upgraded from "
    "drain-based): spark.readStream.format('managed_table') over the "
    "public delta log — offsets are log versions, each data file is "
    "one executor-side Arrow-batch partition. Builds a table in two "
    "commits (snapshot + append), drains it availableNow through a "
    "checkpointed parquet sink, returns the sink content — which must "
    "equal the table (exactly-once, no loss, no duplication)",
    "S7 Delta-table streaming source (DimUser.py:7-12)",
    """
    SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS bal
    FROM customer
    """,
)
def q_stream_table_source(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.streamsource import (
        ManagedTableDataSource,
    )
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    from pathlib import Path

    spark.dataSource.register(ManagedTableDataSource)
    wh = _scratch_warehouse("q_streamsrc", sf)
    t = Catalog(spark, wh).table("cust_stream")
    c = _t(spark, sf, "customer").select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("bal")
    )
    t.overwrite(c.filter("c_custkey % 2 = 0"))
    t.append(c.filter("c_custkey % 2 = 1"))
    out = str(Path(wh) / "_sink")
    q = (
        spark.readStream.format("managed_table")
        .option("path", str(t.dir))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(Path(wh) / "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


@_q(
    "sql_table_changes",
    "Databricks' table_changes() CDF SQL function routed onto the "
    "change feed: build a CDF-enabled ManagedTable, append a batch, "
    "merge an update batch (materialized pre/post-image change rows), "
    "DELETE a slice (deletion-vector commit), then read the whole "
    "history back via SELECT ... FROM table_changes('t', 1) — every "
    "commit's row-level changes with Databricks' _change_type / "
    "_commit_version columns, derived from ONLY each commit's own "
    "files (nothing rescans the table)",
    "extension: CDF SQL surface (sources/tables.py table_changes; "
    "Databricks table_changes() over DimUser.py's streaming-table CDF)",
    """
    SELECT n_nationkey + 100 AS n_nationkey, n_name,
           'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
    FROM nation
    UNION ALL
    SELECT n_nationkey, n_name, 'update_preimage', 2
    FROM nation WHERE n_nationkey <= 4
    UNION ALL
    SELECT n_nationkey, 'X' || n_name, 'update_postimage', 2
    FROM nation WHERE n_nationkey <= 4
    UNION ALL
    SELECT n_nationkey + 100, n_name, 'delete', 3
    FROM nation WHERE n_nationkey >= 20
    """,
)
def q_sql_table_changes(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    cat = Catalog(spark, _scratch_warehouse("q_tcsql", sf))
    t = cat.table("nation_cdf")
    t.overwrite(n, enable_cdf=True)                              # delta v0
    t.append(n.withColumn(                                       # v1
        "n_nationkey", (F.col("n_nationkey") + 100).cast("int")
    ))
    upd = n.filter("n_nationkey <= 4").withColumn(
        "n_name", F.concat(F.lit("X"), F.col("n_name"))
    )
    t.merge_keyed(                                               # v2
        upd, ["n_nationkey"],
        lambda cur, b: cur.join(
            b.select("n_nationkey"), "n_nationkey", "left_anti"
        ).unionByName(b),
    )
    t.delete_where("n_nationkey >= 120")                         # v3
    return cat.sql(
        "SELECT n_nationkey, n_name, _change_type, _commit_version "
        "FROM table_changes('nation_cdf', 1)"
    )


@_q(
    "sql_identity_generated",
    "Databricks identity + generated columns end-to-end through the "
    "SQL router: CREATE TABLE with GENERATED ALWAYS AS IDENTITY "
    "(START WITH 10 INCREMENT BY 5) and GENERATED ALWAYS AS (expr), "
    "INSERT ... SELECT omitting both auto columns, then validate: ids "
    "allocated map-side (unique, step-aligned, above the start — "
    "values themselves are partitioning-dependent by Delta's 'unique "
    "but not consecutive' contract, so the oracle checks the "
    "INVARIANTS as booleans), generated values computed exactly, high "
    "water mark committed atomically with the write",
    "extension: identity/generated columns (sources/tables.py "
    "_parse_generated_clauses/_apply_column_policies; Databricks "
    "GENERATED clauses over the reference's dim-table keys, "
    "DimUser.py:14-17)",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_ids,
           TRUE AS ids_aligned,
           TRUE AS ids_above_start,
           TRUE AS gen_exact,
           CAST(sum(CAST(round(c_acctbal * 2.0 * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS sum_bal2
    FROM customer WHERE c_custkey <= 200
    """,
)
def q_sql_identity_generated(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    cat = Catalog(spark, _scratch_warehouse("q_idgen", sf))
    _t(spark, sf, "customer").createOrReplaceTempView("idgen_customer_src")
    cat.sql(
        "CREATE TABLE dim_acct ("
        "  id BIGINT GENERATED ALWAYS AS IDENTITY "
        "    (START WITH 10 INCREMENT BY 5),"
        "  c_custkey BIGINT,"
        "  bal DOUBLE,"
        "  bal2 DOUBLE GENERATED ALWAYS AS (bal * 2.0)"
        ")"
    )
    cat.sql(
        "INSERT INTO dim_acct SELECT c_custkey, "
        "CAST(c_acctbal AS DOUBLE) FROM idgen_customer_src "
        "WHERE c_custkey <= 200"
    )
    return cat.sql(
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(count(DISTINCT id) AS BIGINT) AS n_ids, "
        "bool_and((id - 10) % 5 = 0) AS ids_aligned, "
        "bool_and(id >= 10) AS ids_above_start, "
        "bool_and(bal2 = bal * 2.0) AS gen_exact, "
        "CAST(sum(CAST(round(bal2 * 100) AS BIGINT)) AS DOUBLE) / 100.0 "
        "  AS sum_bal2 "
        "FROM dim_acct"
    )


@_q(
    "sql_column_defaults",
    "Column DEFAULT values + column-list INSERT (Delta "
    "allowColumnDefaults): CREATE TABLE with literal and expression "
    "defaults alongside an identity column, INSERT ... (cols) SELECT "
    "naming only some columns — omitted defaulted columns fill from "
    "their expressions, listed values override, identity allocates, "
    "unlisted default-less columns null-fill. Defaults apply on SQL "
    "INSERT only (DataFrame appends skip them — Delta's scope)",
    "extension: column defaults (sources/tables.py "
    "_parse_generated_clauses CURRENT_DEFAULT + INSERT column-list "
    "mapping; Databricks DEFAULT over the reference's dim loads)",
    """
    SELECT c_custkey, c_name, 'bronze' AS tier,
           round(c_acctbal, 9) AS bal, CAST(NULL AS VARCHAR) AS note
    FROM customer WHERE c_custkey <= 120
    """,
)
def q_sql_column_defaults(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    cat = Catalog(spark, _scratch_warehouse("q_defaults", sf))
    cat.sql(
        "CREATE TABLE cust_d ("
        "  c_custkey BIGINT,"
        "  c_name STRING,"
        "  tier STRING DEFAULT 'bronze',"
        "  bal DOUBLE,"
        "  note STRING"
        ")"
    )
    _t(spark, sf, "customer").createOrReplaceTempView("defaults_src")
    cat.sql(
        "INSERT INTO cust_d (c_custkey, c_name, bal) "
        "SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) "
        "FROM defaults_src WHERE c_custkey <= 120"
    )
    return cat.sql(
        "SELECT c_custkey, c_name, tier, round(bal, 9) AS bal, note "
        "FROM cust_d"
    )


@_q(
    "sql_view_roundtrip",
    "Persistent catalog VIEWs: CREATE VIEW over a ManagedTable, a "
    "second view stacked on the first (fixpoint registration), INSERT "
    "more rows into the base table, read through a FRESH catalog "
    "handle — the views persist in _views.json and re-resolve against "
    "the CURRENT snapshot on every sql() call, so the stacked "
    "aggregate reflects the post-view insert",
    "extension: CREATE/DROP VIEW (sources/tables.py register_views "
    "fixpoint; the Databricks notebook view workflow, "
    "sample_exploration.py:11-13)",
    """
    SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations
    FROM nation WHERE n_nationkey <> 0
    GROUP BY n_regionkey
    """,
)
def q_sql_view_roundtrip(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    wh = _scratch_warehouse("q_views", sf)
    cat = Catalog(spark, wh)
    n = _t(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    t = cat.table("nation_t")
    t.overwrite(n.filter("n_nationkey < 20"))
    cat.sql(
        "CREATE VIEW live_nations AS SELECT * FROM nation_t "
        "WHERE n_nationkey <> 0"
    )
    cat.sql(
        "CREATE VIEW nations_per_region AS SELECT n_regionkey, "
        "CAST(count(*) AS BIGINT) AS n_nations FROM live_nations "
        "GROUP BY n_regionkey"
    )
    n.filter("n_nationkey >= 20").createOrReplaceTempView("late_nations")
    cat.sql("INSERT INTO nation_t SELECT * FROM late_nations")
    return Catalog(spark, wh).sql(  # FRESH handle: views from disk
        "SELECT n_regionkey, n_nations FROM nations_per_region"
    )


@_q(
    "sql_liquid_clustering",
    "Liquid clustering end-to-end through SQL: CREATE TABLE ... "
    "CLUSTER BY (key), INSERT unclustered data, OPTIMIZE "
    "(range-clusters the rewrite on the bound columns — Databricks' "
    "incremental-clustering contract: writes stay cheap, maintenance "
    "makes per-file ranges disjoint so the stats index prunes "
    "sharply), then answer a key-range query through the pruned read "
    "path — identical rows to a plain scan (pruning is lossless)",
    "extension: CLUSTER BY (sources/tables.py cluster_columns/"
    "set_cluster_columns + compact(cluster_by); Databricks liquid "
    "clustering, successor of OPTIMIZE ZORDER)",
    """
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 9) AS price
    FROM orders WHERE o_orderkey BETWEEN 1000 AND 5000
    """,
)
def q_sql_liquid_clustering(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    cat = Catalog(spark, _scratch_warehouse("q_liquid", sf))
    cat.sql(
        "CREATE TABLE ord_lc (o_orderkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE) CLUSTER BY (o_orderkey)"
    )
    _t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    ).repartition(16).createOrReplaceTempView("lc_orders_src")
    cat.sql("INSERT INTO ord_lc SELECT * FROM lc_orders_src")
    cat.sql("OPTIMIZE ord_lc")
    t = cat.table("ord_lc")
    return (
        t.read_pruned({"o_orderkey": (1000, 5000)})
        .filter("o_orderkey BETWEEN 1000 AND 5000")
        .select(
            "o_orderkey", "o_orderstatus",
            F.round("o_totalprice", 9).alias("price"),
        )
    )


@_q(
    "sql_copy_into",
    "COPY INTO routed onto the catalog (file-level exactly-once batch "
    "ingest — the reference's ADF copy activity with per-file tracking "
    "instead of a value watermark): land customer parquet in two "
    "waves, COPY INTO after each (second run loads ONLY the new "
    "files), then re-run a third time — a no-op. Ledger reference "
    "advances atomically with the data commit under the epoch guard, "
    "so replays and concurrent runs can never double-load a file",
    "extension: COPY INTO (sources/tables.py copy_into; Databricks "
    "COPY INTO over incremental_loop.json:42-92's copy semantics)",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows_total,
           CAST(count(*) FILTER (WHERE c_custkey <= 300) AS BIGINT)
             AS rows_first,
           CAST(count(*) FILTER (WHERE c_custkey > 300) AS BIGINT)
             AS rows_second,
           TRUE AS third_noop
    FROM customer WHERE c_custkey <= 400
    """,
)
def q_sql_copy_into(spark, sf):
    from pathlib import Path

    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    wh = _scratch_warehouse("q_copy", sf)
    landing = str(Path(wh) / "landing")
    c = _t(spark, sf, "customer").select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("bal")
    )
    c.filter("c_custkey <= 300").repartition(2).write.mode(
        "overwrite"
    ).parquet(landing + "/wave=1")
    cat = Catalog(spark, wh)
    r1 = cat.sql(
        f"COPY INTO cust_copy FROM '{landing}' FILEFORMAT = PARQUET"
    ).collect()[0]
    c.filter("c_custkey > 300 AND c_custkey <= 400").repartition(1).write.mode(
        "overwrite"
    ).parquet(landing + "/wave=2")
    r2 = cat.sql(
        f"COPY INTO cust_copy FROM '{landing}' FILEFORMAT = PARQUET"
    ).collect()[0]
    r3 = cat.sql(
        f"COPY INTO cust_copy FROM '{landing}' FILEFORMAT = PARQUET"
    ).collect()[0]
    total = cat.table("cust_copy").read().count()
    return spark.createDataFrame(
        [(
            total,
            r1.num_rows_loaded,
            r2.num_rows_loaded,
            r3.num_files_loaded == 0 and r3.num_rows_loaded == 0,
        )],
        "n_rows_total bigint, rows_first bigint, rows_second bigint, "
        "third_noop boolean",
    )


@_q(
    "sql_shallow_clone",
    "CREATE TABLE ... SHALLOW CLONE routed onto the catalog: clone a "
    "nation-derived table by hardlinking its store files (zero data "
    "copy — immutable files make shared inodes safe), then DELETE "
    "from the ORIGINAL — the clone is snapshot-insulated and still "
    "serves every pre-mutation row",
    "extension: SHALLOW CLONE (sources/tables.py clone_to; Databricks "
    "CLONE for dev/test copies of the reference's dim tables)",
    """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def q_sql_shallow_clone(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    cat = Catalog(spark, _scratch_warehouse("q_clone", sf))
    t = cat.table("nation_src")
    t.overwrite(_t(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    ))
    cat.sql("CREATE TABLE nation_clone SHALLOW CLONE nation_src")
    cat.sql("DELETE FROM nation_src WHERE n_nationkey < 10")
    return cat.table("nation_clone").read()


@_q(
    "sql_merge_full_sync",
    "MERGE with WHEN NOT MATCHED BY SOURCE THEN DELETE (Delta's "
    "full-sync idiom): snapshot-sync a dim table to a source — "
    "matched rows update, new rows insert, target rows absent from "
    "the source DELETE. Routed onto a full-scope merge (every target "
    "key is a deletion candidate, so batch-key file pruning is "
    "disabled — Delta reads the whole target for this clause too); "
    "the commit's change feed still derives exactly",
    "extension: MERGE BY SOURCE (sources/tables.py _sql_merge/"
    "merge_keyed full_scope; Databricks full-sync over the "
    "reference's SCD1 dim maintenance, DimUser.py:20-29)",
    """
    SELECT c_custkey, c_name, round(c_acctbal + 1000.0, 9) AS bal
    FROM customer WHERE c_custkey BETWEEN 51 AND 150
    """,
)
def q_sql_merge_full_sync(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    c = _t(spark, sf, "customer").select(
        "c_custkey", "c_name",
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    cat = Catalog(spark, _scratch_warehouse("q_fsync", sf))
    t = cat.table("dim_cust")
    t.overwrite(c.filter("c_custkey <= 100").repartition(4, "c_custkey"))
    c.filter("c_custkey BETWEEN 51 AND 150").withColumn(
        "bal", F.col("bal") + 1000.0
    ).createOrReplaceTempView("fsync_src")
    cat.sql(
        "MERGE INTO dim_cust USING fsync_src ON dim_cust.c_custkey = "
        "fsync_src.c_custkey "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    return t.read().select(
        "c_custkey", "c_name", F.round("bal", 9).alias("bal")
    )


@_q(
    "sql_analyze_stats",
    "ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS routed onto the "
    "catalog: build a ManagedTable from orders, analyze three columns "
    "in ONE aggregation pass (min/max/null count exact, distinct count "
    "via HLL sketch), read the stats back from the committed "
    "analyze_stats property — exact fields compared bit-exactly, the "
    "approximate ndv validated within 10pct of the true distinct count "
    "(boolean the oracle expects TRUE, the approx_analytics pattern)",
    "extension: ANALYZE TABLE (sources/tables.py analyze; Spark's own "
    "ANALYZE verb over the reference's ad-hoc SQL surface, "
    "sample_exploration.py:11-13)",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key,
           CAST(0 AS BIGINT) AS null_ct_status,
           CAST(max(length(o_orderstatus)) AS BIGINT) AS maxlen_status,
           round(min(o_totalprice), 9) AS min_price,
           round(max(o_totalprice), 9) AS max_price,
           TRUE AS ndv_key_close
    FROM orders
    """,
)
def q_sql_analyze_stats(spark, sf):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    cat = Catalog(spark, _scratch_warehouse("q_analyze", sf))
    t = cat.table("orders_t")
    t.overwrite(o)
    cat.sql(
        "ANALYZE TABLE orders_t COMPUTE STATISTICS "
        "FOR COLUMNS o_orderkey, o_orderstatus, o_totalprice"
    )
    st = t.detail()["analyze_stats"]
    exact_ndv = o.select("o_orderkey").distinct().count()
    ndv = st["columns"]["o_orderkey"]["approx_ndv"]
    row = (
        st["num_rows"],
        int(st["columns"]["o_orderkey"]["min"]),
        int(st["columns"]["o_orderkey"]["max"]),
        st["columns"]["o_orderstatus"]["null_count"],
        st["columns"]["o_orderstatus"]["max_len"],
        float(st["columns"]["o_totalprice"]["min"]),
        float(st["columns"]["o_totalprice"]["max"]),
        abs(ndv - exact_ndv) <= 0.1 * exact_ndv,
    )
    return spark.createDataFrame([row], (
        "n_rows bigint, min_key bigint, max_key bigint, "
        "null_ct_status bigint, maxlen_status bigint, "
        "min_price double, max_price double, ndv_key_close boolean"
    )).select(
        "n_rows", "min_key", "max_key", "null_ct_status", "maxlen_status",
        F.round("min_price", 9).alias("min_price"),
        F.round("max_price", 9).alias("max_price"),
        "ndv_key_close",
    )


# ---------------------------------------------------------------------

# The driver verifies queries() in insertion order and caps its run at
# 50 entries per round. Ordering policy: entries with NO green driver
# row against the current testdata (i.e. newly registered) come first,
# then proven entries by staleness of evidence — r3-green-only before
# r4-green — so the 50-entry window always covers every unproven entry
# and re-freshens the least recently checked ones.

# Entries with a green row in CORRECTNESS_r03.json (current testdata).
_R3_GREEN = {
    "range_join", "exact_median", "cube_agg", "embedding_stats",
    "ordered_string_agg", "doc_repetition_ratio", "pandas_grouped_rank",
    "left_outer_join", "full_outer_join", "union_all_counts",
    "grouping_sets", "range_frame_window", "stats_moments",
    "lag_lead_delta", "percent_rank_cume", "explode_unnest",
    "unpivot_measures", "first_last_in_group", "levenshtein_match",
    "filtered_agg", "regexp_extract_groups", "histogram_bins",
    "deterministic_sample", "dataset_split", "ann_topk_srp",
    "ann_topk_ivf", "media_features", "minhash_dedup_cc",
    "pii_redaction", "doc_chunking", "contamination_check",
    "embedding_normalize", "local_supplier_volume", "shipping_priority",
    "top_ngrams", "above_avg_orders", "in_predicate", "null_predicate",
    "project_drop", "upper_trim", "regexp_clean", "bucketize",
    "calendar",
}

# Entries with a green row in CORRECTNESS_r04.json (the round-4
# 50-entry driver window — all passed rows+schema+hash).
_R4_GREEN = {
    "watermark_filter", "concat_naming", "coalesce_nullif",
    "max_watermark", "rowcount_gate", "dedup_distinct", "latest_per_key",
    "pivot_manual", "sessionize", "quality_gate", "scd1_latest_state",
    "scd2_history", "json_extract", "asof_join", "count_distinct_groups",
    "mode_per_group", "date_spine_gapfill", "funnel_conversion",
    "approx_analytics", "pricing_summary", "rollup_hierarchy",
    "star_join_revenue", "broadcast_dim_join", "semi_join", "anti_join",
    "topk_customers", "window_running_sum", "doc_token_stats",
    "doc_quality", "doc_langid", "doc_fingerprint_dedup",
    "minhash_signatures", "ngram_jaccard_pairs", "simhash_fingerprints",
    "cosine_topk", "embedding_near_dup", "semantic_dedup_pairs",
    "set_ops_union", "set_ops_intersect", "set_ops_except",
    "like_filter", "date_arithmetic", "having_filter", "scalar_subquery",
    "topk_per_group", "rank_dense_ntile", "moving_average",
    "stratified_sample", "tfidf_top_terms", "skew_salted_latest",
}


# Entries with a green row in CORRECTNESS_r05.json (the round-5
# 50-entry driver window — all passed rows+schema+hash except
# array_toolkit, whose array-typed cells the driver's pandas
# canonicalization cannot hash; its entry now projects scalars and
# must lead the r6 window as unproven).
_R5_GREEN = {
    "embedding_near_dup_srp", "sequence_packing", "quota_per_source",
    "token_budget_head", "bigram_lm_score", "duplicated_span_dedup",
    "gopher_rule_report", "vocab_build", "neardup_graph_pagerank",
    "cluster_balanced_sample", "bloom_decontaminate", "ewma_smoothing",
    "zorder_cluster", "embedding_quantize_int8", "weighted_sample",
    "winsorized_stats", "knn_label_predict", "rolling_distinct_users",
    "exact_jaccard_pairs", "table_checksum", "dedup_keep_best",
    "mad_outliers", "hopping_window_counts", "token_cooccurrence_lift",
    "neardup_triangles", "pareto_frontier", "column_profile",
    "cms_heavy_hitters", "retention_cohorts", "event_transition_matrix",
    "regression_per_group", "balanced_shards", "null_safe_join",
    "skew_key_report", "lexical_diversity", "hll_distinct_merge",
    "market_basket_pairs", "feature_hash_tf", "random_projection_jl",
    "diversity_sample_srp", "quantile_hist_merge", "table_diff",
    "corpus_ngram_overlap", "bpe_token_estimate", "forward_fill_locf",
    "benford_first_digit", "monthly_revenue_growth", "string_toolkit",
    "in_predicate",
}

# Entries with a green row in CORRECTNESS_r06.json (the round-6
# 50-entry driver window — every sampled entry passed
# rows+schema+hash with no errors).
_R6_GREEN = {
    "ann_topk_ivf", "ann_topk_ivfpq", "ann_topk_pq", "ann_topk_srp",
    "array_toolkit", "bm25_topk", "bucketize", "calendar",
    "contamination_check", "cube_agg", "dataset_split",
    "deterministic_sample", "doc_chunking", "doc_repetition_ratio",
    "dsir_importance_select", "embedding_normalize", "embedding_stats",
    "exact_median", "explode_unnest", "filtered_agg",
    "first_last_in_group", "full_outer_join", "grouping_sets",
    "hard_negative_mining", "histogram_bins", "hll_distinct_by_group",
    "lag_lead_delta", "lang_adaptive_filter", "lateral_topn_join",
    "left_outer_join", "levenshtein_match", "local_supplier_volume",
    "media_features", "minhash_dedup_cc", "null_predicate",
    "ordered_string_agg", "pandas_grouped_rank", "percent_rank_cume",
    "pii_redaction", "project_drop", "range_frame_window", "range_join",
    "regexp_clean", "regexp_extract_groups", "stats_moments",
    "temperature_mixture_sample", "union_all_counts",
    "unpivot_measures", "upper_trim", "zscore_normalize",
}

# Entries with a green row in CORRECTNESS_r07.json (the round-7
# 50-entry driver window — every sampled entry passed
# rows+schema+hash with no errors, including the round's new
# adaptive_quantile_sketch).
_R7_GREEN = {
    "above_avg_orders", "adaptive_quantile_sketch", "anti_join",
    "approx_analytics", "asof_join", "broadcast_dim_join",
    "coalesce_nullif", "concat_naming", "cosine_topk",
    "count_distinct_groups", "date_arithmetic", "date_spine_gapfill",
    "dedup_distinct", "doc_fingerprint_dedup", "doc_langid",
    "doc_quality", "doc_token_stats", "embedding_near_dup",
    "having_filter", "json_extract", "latest_per_key", "like_filter",
    "max_watermark", "minhash_signatures", "mode_per_group",
    "moving_average", "ngram_jaccard_pairs", "pivot_manual",
    "pricing_summary", "quality_gate", "rank_dense_ntile",
    "rollup_hierarchy", "rowcount_gate", "scalar_subquery",
    "scd1_latest_state", "scd2_history", "semantic_dedup_pairs",
    "semi_join", "sessionize", "set_ops_except", "set_ops_intersect",
    "set_ops_union", "shipping_priority", "simhash_fingerprints",
    "star_join_revenue", "top_ngrams", "topk_customers",
    "topk_per_group", "watermark_filter", "window_running_sum",
}

# Entries with a green row in CORRECTNESS_r08.json (the round-8
# 50-entry driver window — every sampled entry passed
# rows+schema+hash with no errors, including all six r8 additions).
_R8_GREEN = {
    "balanced_shards", "bigram_lm_score", "binary_auc_exact",
    "bloom_decontaminate", "bpe_learn_merges", "calibration_bins",
    "cluster_balanced_sample", "cms_heavy_hitters", "column_profile",
    "dedup_keep_best", "duplicated_span_dedup", "embedding_near_dup_srp",
    "embedding_quantize_int8", "event_transition_matrix",
    "ewma_smoothing", "exact_jaccard_pairs", "feature_hash_tf",
    "funnel_conversion", "gopher_rule_report", "hll_distinct_merge",
    "hopping_window_counts", "in_predicate", "interval_islands",
    "knn_label_predict", "lexical_diversity", "lsh_recall_audit",
    "mad_outliers", "market_basket_pairs", "neardup_graph_pagerank",
    "neardup_triangles", "null_safe_join", "pareto_frontier",
    "quota_per_source", "random_projection_jl", "regression_per_group",
    "retention_cohorts", "roc_points", "rolling_distinct_users",
    "sequence_packing", "skew_key_report", "skew_salted_latest",
    "stratified_sample", "table_checksum", "tfidf_top_terms",
    "token_budget_head", "token_cooccurrence_lift", "vocab_build",
    "weighted_sample", "winsorized_stats", "zorder_cluster",
}

#: green-evidence rounds, oldest first — ordering sorts proven entries
#: by the LAST round that checked them (stalest evidence first).
_R9_GREEN = {
    "ann_topk_ivf", "ann_topk_ivfpq", "ann_topk_pq", "ann_topk_srp",
    "auc_by_segment", "average_precision", "benford_first_digit",
    "bpe_encode", "bpe_token_estimate", "bucketize", "calendar",
    "cohens_kappa", "corpus_ngram_overlap", "cube_agg",
    "dedup_cluster_stats", "divergent_tokens_chi2",
    "diversity_sample_srp", "doc_repetition_ratio", "embedding_stats",
    "exact_median", "forward_fill_locf", "full_outer_join",
    "grouped_dataset_split", "grouping_sets", "hard_negative_mining",
    "integrity_report_tpch", "lag_lead_delta", "left_outer_join",
    "media_features", "minhash_dedup_cc", "monthly_revenue_growth",
    "null_predicate", "ordered_string_agg", "pandas_grouped_rank",
    "percent_rank_cume", "pr_curve", "project_drop",
    "quantile_hist_merge", "range_frame_window", "range_join",
    "regexp_clean", "retrieval_eval_mrr", "sorted_neighborhood_pairs",
    "stats_moments", "string_toolkit", "table_diff",
    "threshold_metrics", "time_weighted_average", "union_all_counts",
    "upper_trim",
}


# Entries with a green row in CORRECTNESS_r10.json.
_R10_GREEN = {
    "anti_join", "array_toolkit", "asof_join_click", "bm25_topk",
    "brier_score", "broadcast_dim_join", "change_feed_updates",
    "coalesce_nullif", "concat_naming", "contamination_check",
    "dataset_split", "dedup_distinct", "delta_log_roundtrip",
    "deterministic_sample", "doc_chunking", "dsir_importance_select",
    "embedding_normalize", "explode_unnest", "filtered_agg",
    "first_last_in_group", "histogram_bins", "hll_distinct_by_group",
    "lang_adaptive_filter", "lateral_topn_join", "latest_per_key",
    "levenshtein_match", "local_supplier_volume", "max_watermark",
    "pack_segments_2048", "partition_prune_year", "pii_redaction",
    "pivot_manual", "pricing_summary", "quality_gate",
    "regexp_extract_groups", "resample_ffill_daily",
    "retrieval_eval_universe", "rollup_hierarchy", "rowcount_gate",
    "scd1_latest_state", "semi_join", "sessionize", "star_join_revenue",
    "temperature_mixture_sample", "topk_customers", "unpivot_measures",
    "watermark_filter", "window_running_sum", "zorder3_cluster",
    "zscore_normalize",
}


# Entries green in the round-11 driver sample.
_R11_GREEN = {
    "above_avg_orders", "adaptive_quantile_sketch", "approx_analytics",
    "asof_join", "bigram_lm_score", "bin_packing_roundtrip",
    "check_constraint_gate", "cosine_topk", "count_distinct_groups",
    "date_arithmetic", "date_spine_gapfill",
    "delta_retention_roundtrip", "dml_change_feed", "dml_delete_update",
    "doc_fingerprint_dedup", "doc_langid", "doc_quality",
    "doc_token_stats", "duplicated_span_dedup", "embedding_near_dup",
    "embedding_near_dup_srp", "funnel_conversion", "gopher_rule_report",
    "having_filter", "in_predicate", "json_extract", "like_filter",
    "merge_bloom_pruned", "minhash_signatures", "mode_per_group",
    "moving_average", "ngram_jaccard_pairs", "quota_per_source",
    "rank_dense_ntile", "scalar_subquery", "scd2_history",
    "semantic_dedup_pairs", "sequence_packing", "set_ops_except",
    "set_ops_intersect", "set_ops_union", "shipping_priority",
    "simhash_fingerprints", "skew_salted_latest", "stratified_sample",
    "tfidf_top_terms", "time_travel_asof", "token_budget_head",
    "top_ngrams", "topk_per_group",
}

# Entries green in the round-12 driver sample.
_R12_GREEN = {
    "above_avg_orders", "adaptive_quantile_sketch", "approx_analytics",
    "asof_join", "bin_packing_roundtrip", "check_constraint_gate",
    "cosine_topk", "count_distinct_groups", "date_arithmetic",
    "date_spine_gapfill", "delta_retention_roundtrip",
    "dml_change_feed", "dml_delete_update", "doc_fingerprint_dedup",
    "doc_langid", "doc_quality", "doc_token_stats", "dv_small_delete",
    "embedding_near_dup", "embedding_near_dup_srp", "funnel_conversion",
    "gold_delete_propagation", "having_filter", "in_predicate",
    "json_extract", "like_filter", "merge_bloom_pruned",
    "minhash_signatures", "mode_per_group", "moving_average",
    "ngram_jaccard_pairs", "rank_dense_ntile", "scalar_subquery",
    "scd2_history", "semantic_dedup_pairs", "sequence_packing",
    "set_ops_except", "set_ops_intersect", "set_ops_union",
    "shipping_priority", "simhash_fingerprints", "skew_salted_latest",
    "sql_maintenance_roundtrip", "sql_merge_roundtrip",
    "sql_time_travel", "stratified_sample", "tfidf_top_terms",
    "time_travel_asof", "top_ngrams", "topk_per_group",
}

_GREEN_ROUNDS: list[set[str]] = [
    _R3_GREEN, _R4_GREEN, _R5_GREEN, _R6_GREEN, _R7_GREEN, _R8_GREEN,
    _R9_GREEN, _R10_GREEN, _R11_GREEN, _R12_GREEN,
]


def _last_green(name: str) -> int:
    """Most recent round (index into _GREEN_ROUNDS, 1-based) with a
    green driver row for this entry; 0 = never proven on the current
    testdata."""
    for i in range(len(_GREEN_ROUNDS), 0, -1):
        if name in _GREEN_ROUNDS[i - 1]:
            return i
    return 0


def _ordered_catalog() -> dict[str, CatalogQuery]:
    # Stable sort: unproven entries (last_green 0) lead the driver's
    # 50-entry window, then proven ones by staleness of evidence;
    # catalog registration order breaks ties.
    ordered = sorted(_CATALOG, key=lambda q: _last_green(q.name))
    return {q.name: q for q in ordered}


CATALOG: dict[str, CatalogQuery] = _ordered_catalog()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle.strip() for name, q in CATALOG.items() if q.oracle}
