"""Gold-layer analytics over the Spotify star schema — the queries the
reference's gold layer exists to serve (readme.md:8 "ready for
analytics"; SURVEY §7.2 M1 flagship). All run against the engine's gold
ManagedTables (current SCD2 versions + SCD1 fact).

Each takes the Catalog produced by the medallion pipeline and returns a
DataFrame; dims are broadcast (≤ thousands of rows vs the fact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import END_AT
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


def _current(catalog: Catalog, name: str) -> DataFrame:
    """Current (open) SCD2 versions of a gold dimension."""
    df = catalog.table(name).read()
    if END_AT in df.columns:
        df = df.filter(F.col(END_AT).isNull())
    return df


def top_genres_by_listen_time(catalog: Catalog, per: str = "month") -> DataFrame:
    """FLAGSHIP (SURVEY §7.2 M1): total listen time per genre per month —
    FactStream ⋈ DimTrack ⋈ DimArtist ⋈ DimDate → groupBy → sum."""
    fact = catalog.table("gold_fact_stream").read()
    track = _current(catalog, "gold_dim_track")
    artist = _current(catalog, "gold_dim_artist")
    ddate = _current(catalog, "gold_dim_date")
    return (
        fact.join(F.broadcast(track), "track_id")
        .join(F.broadcast(artist), "artist_id")
        .join(F.broadcast(ddate), "date_key")
        .groupBy("genre", "year", per)
        .agg(
            F.sum("listen_duration").alias("total_listen_sec"),
            F.count(F.lit(1)).alias("n_streams"),
        )
        .orderBy(F.col("total_listen_sec").desc())
    )


def listener_activity(catalog: Catalog) -> DataFrame:
    """Streams + listen time per user with their current subscription."""
    fact = catalog.table("gold_fact_stream").read()
    user = _current(catalog, "gold_dim_user")
    return (
        fact.join(F.broadcast(user), "user_id")
        .groupBy("user_id", "user_name", "subscription_type")
        .agg(
            F.count(F.lit(1)).alias("n_streams"),
            F.sum("listen_duration").alias("total_listen_sec"),
        )
    )


def device_mix_by_weekday(catalog: Catalog) -> DataFrame:
    fact = catalog.table("gold_fact_stream").read()
    ddate = _current(catalog, "gold_dim_date")
    return (
        fact.join(F.broadcast(ddate), "date_key")
        .groupBy("weekday")
        .pivot("device_type", ["Mobile", "Desktop", "Smart Speaker"])
        .count()
    )


def subscription_history_churn(catalog: Catalog) -> DataFrame:
    """SCD2 payoff query: users whose subscription changed (≥2 versions),
    with previous → current transition (the reference inspects exactly
    this by hand, silver_Dimensions.py:206-215)."""
    user = catalog.table("gold_dim_user").read()
    closed = user.filter(F.col(END_AT).isNotNull()).select(
        "user_id",
        F.col("subscription_type").alias("prev_type"),
        F.col(END_AT).alias("changed_at"),
    )
    current = user.filter(F.col(END_AT).isNull()).select(
        "user_id", F.col("subscription_type").alias("curr_type"), "__START_AT"
    )
    return closed.join(current, ["user_id"]).filter(
        F.col("changed_at") == F.col("__START_AT")
    ).select("user_id", "prev_type", "curr_type", "changed_at")
