"""End-to-end medallion run of the reference's two-phase CDC scenario
(FIXTURES.md): initial load → full pipeline → incremental batch → full
pipeline → assert SCD2 history / SCD1 upsert / quality-gate shapes."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLE_BY_NAME
from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import END_AT, START_AT
from end_to_end_azure_databricks_data_engineering_project_spark.operators.transforms import (
    bucketize,
    dedup_keep_latest,
    normalize_case,
    regexp_clean,
)
from end_to_end_azure_databricks_data_engineering_project_spark.sources.ingest import ingest_all
from end_to_end_azure_databricks_data_engineering_project_spark.sources.watermark import WatermarkStore
from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
    build_medallion_pipeline,
)

T0 = dt.datetime(2025, 1, 1)
T1 = dt.datetime(2025, 6, 1)


def _cleansers():
    """≙ the silver notebook's per-table cleanses (silver_Dimensions.py)."""
    return {
        "dim_user": lambda df: dedup_keep_latest(
            normalize_case(df, "user_name"), ["user_id"], "updated_at"
        ),
        "dim_artist": lambda df: dedup_keep_latest(df, ["artist_id"], "updated_at"),
        "dim_track": lambda df: regexp_clean(
            bucketize(df, "duration_sec", "duration_flag", [150, 300], ["low", "medium", "high"]),
            "track_name", "-", " ",
        ),
    }


@pytest.fixture()
def sources_phase1(spark):
    users = spark.createDataFrame(
        [(i, f"user {i}", "US", "Free", None, None, T0) for i in range(1, 11)],
        "user_id int, user_name string, country string, subscription_type string,"
        " start_date date, end_date date, updated_at timestamp",
    )
    tracks = spark.createDataFrame(
        [(i, f"track-{i}", i % 3 + 1, "alb", 100 + i * 40, None, T0) for i in range(1, 6)],
        "track_id int, track_name string, artist_id int, album_name string,"
        " duration_sec int, release_date date, updated_at timestamp",
    )
    facts = spark.createDataFrame(
        [(i, i % 10 + 1, i % 5 + 1, 20250101, 60, "Mobile", T0) for i in range(1, 21)],
        "stream_id long, user_id int, track_id int, date_key int,"
        " listen_duration int, device_type string, stream_timestamp timestamp",
    )
    return {"dim_user": users, "dim_track": tracks, "fact_stream": facts}


def _run_pipeline(spark, sources, tmp_path):
    cfgs = [TABLE_BY_NAME[t] for t in sources]
    store = WatermarkStore(tmp_path / "state")
    ingest_all(spark, cfgs, sources, str(tmp_path / "bronze"), store)
    pipe, catalog = build_medallion_pipeline(
        spark, cfgs, str(tmp_path / "bronze"), str(tmp_path / "warehouse"),
        str(tmp_path / "state"), _cleansers(),
    )
    pipe.run_all()
    return catalog


def test_two_phase_medallion(spark, tmp_path, sources_phase1):
    catalog = _run_pipeline(spark, sources_phase1, tmp_path)

    gold_user = catalog.table("gold_dim_user").read()
    assert gold_user.count() == 10
    assert gold_user.filter(F.col(END_AT).isNotNull()).count() == 0
    # silver cleanse applied before gold: names uppercased
    assert gold_user.filter(F.col("user_name").startswith("USER")).count() == 10

    # ---- phase 2: updates + new keys + a NULL-key row (quality gate) ----
    users2 = sources_phase1["dim_user"].union(
        spark.createDataFrame(
            [
                (1, "user 1", "US", "Premium", None, None, T1),   # update
                (2, "user 2", "US", "Family", None, None, T1),    # update
                (11, "user 11", "DE", "Free", None, None, T1),    # new key
                (None, "ghost", "XX", "Free", None, None, T1),    # dropped by gate
            ],
            sources_phase1["dim_user"].schema,
        )
    )
    facts2 = sources_phase1["fact_stream"].union(
        spark.createDataFrame(
            [(1, 1, 1, 20250601, 120, "Desktop", T1), (21, 2, 2, 20250601, 30, "Mobile", T1)],
            sources_phase1["fact_stream"].schema,
        )
    )
    sources2 = {"dim_user": users2, "dim_track": sources_phase1["dim_track"], "fact_stream": facts2}
    catalog = _run_pipeline(spark, sources2, tmp_path)

    gold_user = catalog.table("gold_dim_user").read()
    # updated keys → 2 versions (closed + open); new key → 1; ghost dropped
    v = gold_user.groupBy("user_id").count().collect()
    counts = {r.user_id: r["count"] for r in v}
    assert counts[1] == 2 and counts[2] == 2 and counts[11] == 1
    assert None not in counts
    closed = {r.user_id for r in gold_user.filter(F.col(END_AT).isNotNull()).collect()}
    assert closed == {1, 2}
    open_1 = gold_user.filter((F.col("user_id") == 1) & F.col(END_AT).isNull()).first()
    assert open_1.subscription_type == "Premium" and open_1[START_AT] == T1

    # SCD1 fact: upsert — 21 unique stream_ids, stream 1 last-write-wins
    gold_fact = catalog.table("gold_fact_stream").read()
    assert gold_fact.count() == 21
    s1 = gold_fact.filter("stream_id = 1").first()
    assert s1.listen_duration == 120 and s1.device_type == "Desktop"

    # idempotent re-run: nothing new → no change
    before = gold_user.count()
    catalog = _run_pipeline(spark, sources2, tmp_path)
    assert catalog.table("gold_dim_user").read().count() == before


def test_streaming_silver_variant(spark, tmp_path, sources_phase1):
    """True Structured-Streaming silver (availableNow trigger + foreachBatch)."""
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import silver_stream

    cfg = TABLE_BY_NAME["dim_user"]
    store = WatermarkStore(tmp_path / "state")
    ingest_all(spark, [cfg], sources_phase1, str(tmp_path / "bronze"), store)
    catalog = Catalog(spark, str(tmp_path / "warehouse"))
    q = silver_stream(
        spark, cfg, str(tmp_path / "bronze"), catalog, str(tmp_path / "ckpt"),
        cleanse=lambda df: normalize_case(df, "user_name"),
    )
    q.awaitTermination(120)
    out = catalog.table("silver_dim_user").read()
    assert out.count() == 10
    assert out.filter(F.col("user_name").startswith("USER")).count() == 10


def test_silver_replay_after_crash_is_exactly_once(spark, tmp_path, sources_phase1):
    """Crash window between silver append and ledger commit (ADVICE r1):
    replaying the same drain must NOT duplicate rows — the table commit
    records the drain epoch and skips the already-applied batch."""
    import json as _json
    from pathlib import Path

    store = WatermarkStore(tmp_path / "state")
    cfgs = [TABLE_BY_NAME["dim_user"]]
    ingest_all(spark, cfgs, sources_phase1, str(tmp_path / "bronze"), store)
    pipe, catalog = build_medallion_pipeline(
        spark, cfgs, str(tmp_path / "bronze"), str(tmp_path / "wh"),
        str(tmp_path / "state"), _cleansers(),
    )
    pipe.run_all()
    silver = catalog.table("silver_dim_user")
    n0, v0 = silver.read().count(), silver.current_version()
    assert n0 == 10

    # simulate the crash: the sink write committed, the ledger did not
    ledger_path = Path(tmp_path / "state" / "autoload_dim_user" / "ingested_files.json")
    committed = _json.loads(ledger_path.read_text())
    ledger_path.unlink()

    pipe.run_all()  # replay drains the same files at the same epoch
    assert silver.read().count() == n0  # no duplicates
    assert silver.current_version() == v0  # append skipped entirely
    assert set(_json.loads(ledger_path.read_text())) == set(committed)


def test_rescued_column_promoted_to_typed_silver(spark, tmp_path, sources_phase1):
    """Schema-evolution e2e (≙ Autoloader rescue → operator-approved
    addNewColumns, silver_Dimensions.py:27-28): phase 1 lands the
    declared schema; phase 2's source grows a NEW column. The drain
    rescues it into _rescued_data, the declared promotion lifts it into
    a typed first-class silver column (evolve=True append), phase-1
    rows read back NULL for it, and the rescue residual stays clean."""
    from pyspark.sql import types as T

    # phase 1: declared schema only
    store = WatermarkStore(tmp_path / "state")
    cfgs = [TABLE_BY_NAME["dim_user"]]
    ingest_all(spark, cfgs, sources_phase1, str(tmp_path / "bronze"), store)
    promotions = {"dim_user": [("loyalty_tier", T.StringType())]}
    pipe, catalog = build_medallion_pipeline(
        spark, cfgs, str(tmp_path / "bronze"), str(tmp_path / "wh"),
        str(tmp_path / "state"), _cleansers(), promotions=promotions,
    )
    pipe.run_all()
    silver = catalog.table("silver_dim_user")
    got1 = silver.read()
    # the standing promotion declares the column even before any source
    # row carries it — all NULL, schema already widened
    assert dict(got1.dtypes)["loyalty_tier"] == "string"
    assert got1.where(F.col("loyalty_tier").isNotNull()).count() == 0

    # phase 2: the SOURCE grows a column the declared schema lacks
    users2 = spark.createDataFrame(
        [(12, "user 12", "US", "Premium", None, None, T1, "gold"),
         (13, "user 13", "DE", "Free", None, None, T1, "bronze")],
        "user_id int, user_name string, country string, subscription_type string,"
        " start_date date, end_date date, updated_at timestamp, loyalty_tier string",
    )
    ingest_all(spark, cfgs, {"dim_user": users2}, str(tmp_path / "bronze"), store)
    pipe.run_all()

    out = catalog.table("silver_dim_user").read()
    assert out.count() == 12
    tiers = {r.user_id: r.loyalty_tier for r in out.collect()}
    assert tiers[12] == "gold" and tiers[13] == "bronze"
    assert all(tiers[i] is None for i in range(1, 11))  # phase-1 rows
    # promoted field was REMOVED from the rescue residual before drop,
    # so nothing else leaks: the rescue column never reaches silver
    assert "_rescued_data" not in out.columns
    # and the typed column keeps working downstream: ad-hoc SQL over it
    catalog.register_views()
    n = spark.sql(
        "SELECT count(*) AS n FROM silver_dim_user WHERE loyalty_tier = 'gold'"
    ).collect()[0].n
    assert n == 1


def test_rescued_column_promoted_in_streaming_silver(spark, tmp_path, sources_phase1):
    """The streaming silver variant honors the same promotion contract
    as the batch drain (r8 review: the two modes of the silver refine
    must produce the same data for the same bronze input)."""
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import silver_stream
    from pyspark.sql import types as T

    cfg = TABLE_BY_NAME["dim_user"]
    store = WatermarkStore(tmp_path / "state")
    users = sources_phase1["dim_user"].withColumn(
        "loyalty_tier",
        F.when(F.col("user_id") == 1, F.lit("gold")),
    )
    ingest_all(spark, [cfg], {"dim_user": users}, str(tmp_path / "bronze"), store)
    catalog = Catalog(spark, str(tmp_path / "warehouse"))
    q = silver_stream(
        spark, cfg, str(tmp_path / "bronze"), catalog, str(tmp_path / "ckpt"),
        promote=[("loyalty_tier", T.StringType())],
    )
    q.awaitTermination(120)
    out = catalog.table("silver_dim_user").read()
    assert out.count() == 10
    assert dict(out.dtypes)["loyalty_tier"] == "string"
    tiers = {r.user_id: r.loyalty_tier for r in out.collect()}
    assert tiers[1] == "gold"
    assert all(tiers[i] is None for i in range(2, 11))
    assert "_rescued_data" not in out.columns


def test_gold_cursor_survives_equal_cdc_timestamp(spark, tmp_path, sources_phase1):
    """Gold drains by silver TABLE VERSION, not a value watermark
    (ADVICE r1, flows.py strict-'>' boundary): a row appended to silver
    later but with a cdc value EQUAL to the previously drained max must
    still be applied to gold."""
    store = WatermarkStore(tmp_path / "state")
    cfgs = [TABLE_BY_NAME["dim_user"]]
    ingest_all(spark, cfgs, sources_phase1, str(tmp_path / "bronze"), store)
    pipe, catalog = build_medallion_pipeline(
        spark, cfgs, str(tmp_path / "bronze"), str(tmp_path / "wh"),
        str(tmp_path / "state"), _cleansers(),
    )
    pipe.run_all()
    gold = catalog.table("gold_dim_user")
    assert gold.read().count() == 10

    # Late-arriving silver row whose updated_at TIES the drained max (T0)
    silver = catalog.table("silver_dim_user")
    late = spark.createDataFrame(
        [(999, "USER 999", "US", "Free", None, None, T0)],
        silver.read().schema,
    )
    silver.append(late)

    pipe.run_all()
    got = gold.read().filter(F.col("user_id") == 999)
    assert got.count() == 1  # a value watermark would have dropped it

    # re-draining with no new silver commits is a no-op
    pipe.run_all()
    assert gold.read().filter(F.col("user_id") == 999).count() == 1
    assert gold.read().count() == 11


def test_streaming_silver_quarantine_routes_bad_rows(spark, tmp_path):
    """quarantine=True: rule-violating rows land in quarantine_<table>
    tagged with the violated rule names; good rows reach silver; the
    two sides partition the batch exactly."""
    import dataclasses

    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import silver_stream

    cfg = dataclasses.replace(
        TABLE_BY_NAME["dim_user"],
        expectations={
            "valid_key": "user_id IS NOT NULL",
            "known_tier": "subscription_type IN ('Free', 'Premium')",
        },
    )
    users = spark.createDataFrame(
        [(1, "a", "US", "Free", None, None, T0),
         (2, "b", "US", "Gold", None, None, T0),      # bad tier
         (None, "c", "US", "Premium", None, None, T0),  # bad key
         (4, "d", "US", "Premium", None, None, T0)],
        "user_id int, user_name string, country string, subscription_type string,"
        " start_date date, end_date date, updated_at timestamp",
    )
    store = WatermarkStore(tmp_path / "state")
    ingest_all(spark, [cfg], {"dim_user": users}, str(tmp_path / "bronze"), store)
    catalog = Catalog(spark, str(tmp_path / "warehouse"))
    q = silver_stream(
        spark, cfg, str(tmp_path / "bronze"), catalog,
        str(tmp_path / "ckpt_q"), quarantine=True,
    )
    q.awaitTermination(120)

    silver = catalog.table("silver_dim_user").read()
    quar = catalog.table("quarantine_dim_user").read()
    assert sorted(r.user_id for r in silver.collect()) == [1, 4]
    got = {r.user_name: sorted(r["_failed_expectations"]) for r in quar.collect()}
    assert got == {"b": ["known_tier"], "c": ["valid_key"]}
    assert "_failed_expectations" not in silver.columns


def test_partitioned_silver_flow(spark, tmp_path, sources_phase1):
    """TableConfig.partition_by: the silver table is created hive-
    partitioned (the reference's directory-layout pruning as a silver
    feature); incremental drains append into the bound partitioning
    automatically and listing-time pruning works on the result."""
    import dataclasses

    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import silver_flow

    cfg = dataclasses.replace(TABLE_BY_NAME["dim_user"], partition_by=("country",))
    store = WatermarkStore(tmp_path / "state")
    ingest_all(spark, [cfg], {"dim_user": sources_phase1["dim_user"]},
               str(tmp_path / "bronze"), store)
    cat = Catalog(spark, tmp_path / "wh")
    run = silver_flow(spark, cfg, str(tmp_path / "bronze"), cat,
                      str(tmp_path / "state"))
    assert run() == 10
    t = cat.table("silver_dim_user")
    assert t.partition_columns() == ["country"]
    names = t._resolve(t.current_version())[0]
    assert names and all(n.startswith("country=US/") for n in names)

    # incremental batch from a new country drains into its own partition
    users2 = spark.createDataFrame(
        [(100 + i, f"user {100 + i}", "DE", "Premium", None, None, T1)
         for i in range(3)],
        "user_id int, user_name string, country string, subscription_type"
        " string, start_date date, end_date date, updated_at timestamp",
    )
    ingest_all(spark, [cfg], {"dim_user": users2}, str(tmp_path / "bronze"), store)
    assert run() == 3
    assert t.read().count() == 13
    pruned = t.pruned_files({"country": ("DE", "DE")})
    assert len(pruned) < len(t.data_files())
    got = t.read_pruned({"country": ("DE", "DE")})
    assert got.count() == 3 and set(got.columns) == set(t.read().columns)
