"""S1 live: the JDBC incremental pull executed against a real database.

The reference's core ingestion act is an ADF ForEach that string-builds
``SELECT * FROM {schema}.{table} WHERE {cdc_col} > '{watermark}'`` and
runs it source-side on Azure SQL (``Azure ADF/adf/pipeline/
incremental_loop.json:42-50``). Every prior round exercised the query
BUILDER only; these tests run the full chain — ``watermark_query`` →
``read_jdbc`` → ``ingest_table`` → bronze + watermark advance — against
an embedded Apache Derby database (the Derby jars ship on the Spark
classpath), including a second incremental pull and a range-partitioned
parallel read. Table shape = DimUser (``initial_load.sql:8-16``)."""

from __future__ import annotations

import pytest

from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLE_BY_NAME
from end_to_end_azure_databricks_data_engineering_project_spark.sources.ingest import ingest_table
from end_to_end_azure_databricks_data_engineering_project_spark.sources.readers import (
    read_jdbc,
    watermark_query,
)
from end_to_end_azure_databricks_data_engineering_project_spark.sources.watermark import WatermarkStore

# Derby uppercases unquoted identifiers; the source table is created with
# quoted lowercase columns (matching DIM_USER_SCHEMA), so the cdc column
# reference in the pushed-down query text must be quoted too. Azure SQL
# is case-insensitive, so the reference passes it bare — the identifier
# spelling is a per-source-dialect caller concern, not engine logic.
CDC_COL = '"updated_at"'


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """Embedded Derby DB holding DimUser with two initial rows."""
    tmp = tmp_path_factory.mktemp("derby")
    jvm = spark._jvm
    jvm.java.lang.System.setProperty("derby.stream.error.file", str(tmp / "derby.log"))
    url = f"jdbc:derby:{tmp}/db;create=true"
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        'CREATE TABLE APP.DIMUSER ("user_id" INT PRIMARY KEY,'
        ' "user_name" VARCHAR(255), "country" VARCHAR(255),'
        ' "subscription_type" VARCHAR(50), "start_date" DATE,'
        ' "end_date" DATE, "updated_at" TIMESTAMP)'
    )
    for i, ts in [(1, "2024-01-05 10:00:00"), (2, "2024-02-01 09:30:00")]:
        st.executeUpdate(
            f"INSERT INTO APP.DIMUSER VALUES ({i}, 'u{i}', 'US', 'Free',"
            f" DATE('2023-12-01'), NULL, TIMESTAMP('{ts}'))"
        )
    yield {"url": url, "stmt": st}
    st.close()
    conn.close()


def _pull(spark, store, url):
    """One ForEach iteration with a LIVE jdbc source: Lookup watermark →
    source-side pushdown query → read."""
    cfg = TABLE_BY_NAME["dim_user"]
    wm = store.effective_watermark(cfg.table, cfg.from_date)
    q = watermark_query("APP", "DIMUSER", CDC_COL, wm)
    return cfg, q, read_jdbc(spark, url, q)


def test_initial_and_incremental_pull_land_in_bronze(spark, tmp_path, derby):
    store = WatermarkStore(tmp_path / "state")
    bronze = str(tmp_path / "bronze")

    # pull 1: fresh watermark (EPOCH) → full load of both rows
    cfg, q, src = _pull(spark, store, derby["url"])
    assert "\"updated_at\" > '1900-01-01 00:00:00'" in q
    res = ingest_table(spark, cfg, src, bronze, store, run_ts="r1")
    assert res.rows == 2
    assert store.read("dim_user") == "2024-02-01 09:30:00"
    landed = spark.read.parquet(res.landed_path)
    assert sorted(r.user_id for r in landed.collect()) == [1, 2]
    # declared schema enforced on the landed batch (nullability is a
    # parquet-reader detail; names + types are the contract)
    assert landed.dtypes == spark.createDataFrame([], cfg.spark_schema).dtypes

    # a row is updated source-side after the pull
    derby["stmt"].executeUpdate(
        "UPDATE APP.DIMUSER SET \"subscription_type\" = 'Premium',"
        " \"updated_at\" = TIMESTAMP('2024-03-15 08:00:00')"
        ' WHERE "user_id" = 1'
    )

    # pull 2: watermark predicate excludes unchanged rows SOURCE-SIDE
    cfg, q, src = _pull(spark, store, derby["url"])
    assert "\"updated_at\" > '2024-02-01 09:30:00'" in q
    # the predicate travels in the executed source query, not a Spark
    # post-filter: it is visible in the JDBC scan's relation text
    plan = src._jdf.queryExecution().executedPlan().toString()
    assert "2024-02-01 09:30:00" in plan and "JDBCRelation" in plan
    res2 = ingest_table(spark, cfg, src, bronze, store, run_ts="r2")
    assert res2.rows == 1
    got = spark.read.parquet(res2.landed_path).collect()
    assert [(r.user_id, r.subscription_type) for r in got] == [(1, "Premium")]
    assert store.read("dim_user") == "2024-03-15 08:00:00"

    # pull 3: nothing new → empty pull, no bronze dir, watermark holds
    cfg, q, src = _pull(spark, store, derby["url"])
    res3 = ingest_table(spark, cfg, src, bronze, store, run_ts="r3")
    assert res3.rows == 0 and res3.landed_path is None
    assert store.read("dim_user") == "2024-03-15 08:00:00"


def test_range_partitioned_parallel_pull(spark, derby):
    """The scale path: partitionColumn range-split pull (≙ ADF parallel
    copy). Four key-range partitions over the same table must return
    exactly the full-table result."""
    df = read_jdbc(
        spark,
        derby["url"],
        # partitionColumn requires dbtable (Spark restriction), so the
        # watermark predicate rides a pushed-down subquery alias
        query=None,
        partition_options={
            "dbtable": "APP.DIMUSER",
            "partitionColumn": '"user_id"',
            "lowerBound": "0",
            "upperBound": "10",
            "numPartitions": "4",
        },
    )
    assert df.rdd.getNumPartitions() == 4
    assert sorted(r.user_id for r in df.collect()) == [1, 2]


def test_read_jdbc_rejects_ambiguous_relation_spec(spark):
    """Misuse fails fast with a named error, not Spark's opaque JDBC
    option-conflict stack (r7 advisor)."""
    url = "jdbc:derby:memory:unused"
    with pytest.raises(ValueError, match="partitionColumn with a pushed"):
        read_jdbc(
            spark, url, "SELECT 1 FROM t",
            partition_options={"partitionColumn": "id"},
        )
    with pytest.raises(ValueError, match="requires partition_options"):
        read_jdbc(spark, url, None)
    with pytest.raises(ValueError, match="mutually exclusive"):
        read_jdbc(
            spark, url, "SELECT 1 FROM t",
            partition_options={"dbtable": "t"},
        )
