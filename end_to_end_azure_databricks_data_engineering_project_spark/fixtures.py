"""Deterministic two-phase Spotify-shaped fixture generator (FIXTURES.md).

Mirrors the reference's only end-to-end scenario: ``initial_load.sql``
(500/500/500/365/1000 rows) then ``incremental_load.sql`` (50 updates +
20 new users, 50 artist updates, 50 track updates, 300 new facts), plus
the edge cases the merge must survive: in-batch duplicate keys,
out-of-order sequences, a NULL business key (quality gate), and an
unexpected extra column (rescue path). Seeded — same data every run.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession

from end_to_end_azure_databricks_data_engineering_project_spark.config import (
    DIM_ARTIST_SCHEMA,
    DIM_DATE_SCHEMA,
    DIM_TRACK_SCHEMA,
    DIM_USER_SCHEMA,
    FACT_STREAM_SCHEMA,
)

T0 = dt.datetime(2025, 1, 1, 0, 0, 0)
T1 = dt.datetime(2025, 6, 1, 0, 0, 0)

COUNTRIES = ["US", "DE", "FR", "IN", "BR", "JP"]
GENRES = ["Pop", "Rock", "Jazz", "Classical", "Hip-Hop", "Electronic"]
SUBS = ["Free", "Premium", "Family"]
DEVICES = ["Mobile", "Desktop", "Smart Speaker"]


def phase1(spark: SparkSession, scale: float = 1.0) -> dict[str, DataFrame]:
    rng = random.Random(42)
    n_user, n_art, n_trk, n_fact = (
        int(500 * scale), int(500 * scale), int(500 * scale), int(1000 * scale),
    )
    users = [
        (i, f"user {i}", rng.choice(COUNTRIES), rng.choice(SUBS),
         dt.date(2023, 10, 1) + dt.timedelta(days=rng.randint(0, 700)), None,
         T0 - dt.timedelta(minutes=rng.randint(0, 10000)))
        for i in range(1, n_user + 1)
    ]
    artists = [
        (i, f"artist {i}", rng.choice(GENRES), rng.choice(COUNTRIES),
         T0 - dt.timedelta(minutes=rng.randint(0, 10000)))
        for i in range(1, n_art + 1)
    ]
    tracks = [
        (i, f"track-{i}-mix", rng.randint(1, n_art), f"album {i % 60}",
         rng.randint(105, 342), dt.date(2020, 1, 1) + dt.timedelta(days=rng.randint(0, 2000)),
         T0 - dt.timedelta(minutes=rng.randint(0, 10000)))
        for i in range(1, n_trk + 1)
    ]
    base = dt.date(2024, 10, 7)
    dates = [
        (int((base + dt.timedelta(days=d)).strftime("%Y%m%d")), base + dt.timedelta(days=d),
         (base + dt.timedelta(days=d)).day, (base + dt.timedelta(days=d)).month,
         (base + dt.timedelta(days=d)).year, (base + dt.timedelta(days=d)).strftime("%A"))
        for d in range(365)
    ]
    facts = [
        (i, rng.randint(1, int(n_user * 1.05)), rng.randint(1, int(n_trk * 1.05)),
         dates[rng.randrange(365)][0], rng.randint(15, 309), rng.choice(DEVICES),
         T0 - dt.timedelta(minutes=rng.randint(0, 10000)))
        for i in range(1, n_fact + 1)
    ]
    return {
        "dim_user": spark.createDataFrame(users, DIM_USER_SCHEMA),
        "dim_artist": spark.createDataFrame(artists, DIM_ARTIST_SCHEMA),
        "dim_track": spark.createDataFrame(tracks, DIM_TRACK_SCHEMA),
        "dim_date": spark.createDataFrame(dates, DIM_DATE_SCHEMA),
        "fact_stream": spark.createDataFrame(facts, FACT_STREAM_SCHEMA),
    }


def phase2(spark: SparkSession, scale: float = 1.0) -> dict[str, DataFrame]:
    """Incremental batch: everything has cdc > T0 (plus planted edges)."""
    rng = random.Random(43)
    n_user = int(500 * scale)
    n_upd = max(int(50 * scale), 2)
    n_new = max(int(20 * scale), 2)

    users = [
        (k, f"user {k}", rng.choice(COUNTRIES), "Premium", None, None,
         T1 + dt.timedelta(minutes=k))
        for k in range(1, n_upd + 1)  # 50 updates → Premium
    ] + [
        (n_user + j, f"user {n_user + j}", rng.choice(COUNTRIES), "Premium", None, None,
         T1 + dt.timedelta(minutes=1000 + j))
        for j in range(1, n_new + 1)  # 20 new premium users
    ]
    # planted edge cases (FIXTURES.md): dup key in batch, out-of-order, NULL key
    users += [
        (1, "user 1", "US", "Family", None, None, T1 + dt.timedelta(minutes=2000)),  # 2nd change for key 1
        (2, "user 2", "US", "Free", None, None, T0 - dt.timedelta(days=1)),  # stale
        (None, "ghost", "XX", "Free", None, None, T1 + dt.timedelta(minutes=1)),  # gate
    ]
    artists = [
        (k, f"artist {k}", rng.choice(GENRES), rng.choice(COUNTRIES),
         T1 + dt.timedelta(minutes=k))
        for k in range(1, n_upd + 1)
    ]
    tracks = [
        (k, f"track-{k}-remix", rng.randint(1, n_user), f"album {k % 60}",
         rng.randint(105, 342), dt.date(2025, 1, 1), T1 + dt.timedelta(minutes=k))
        for k in range(1, n_upd + 1)
    ]
    n_fact_new = max(int(300 * scale), 5)
    facts = [
        (1000000 + i, rng.randint(1, n_user), rng.randint(1, n_user),
         20241007, rng.randint(15, 309), rng.choice(DEVICES),
         T1 + dt.timedelta(seconds=i))
        for i in range(1, n_fact_new + 1)
    ]
    return {
        "dim_user": spark.createDataFrame(users, DIM_USER_SCHEMA),
        "dim_artist": spark.createDataFrame(artists, DIM_ARTIST_SCHEMA),
        "dim_track": spark.createDataFrame(tracks, DIM_TRACK_SCHEMA),
        "fact_stream": spark.createDataFrame(facts, FACT_STREAM_SCHEMA),
    }
