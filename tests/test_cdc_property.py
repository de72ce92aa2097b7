"""Property-based SCD2/SCD1 testing: random change-batch sequences are
applied through the Spark engine AND a trivially-correct pure-Python
model; histories must match exactly.

Covers the hard-part matrix of SURVEY §7.4 by construction: duplicate
(key,seq) collisions, multiple changes per key per batch, stale/replayed
rows, no-op changes, interleaved batches."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import (
    END_AT,
    START_AT,
    scd1_merge,
    scd2_apply,
)

SEQS = [dt.datetime(2025, 1, 1) + dt.timedelta(days=d) for d in range(5)]
KEYS = [1, 2, 3]
VALS = ["a", "b", "c"]

row_st = st.tuples(st.sampled_from(KEYS), st.sampled_from(VALS), st.sampled_from(SEQS))
batch_st = st.lists(row_st, min_size=1, max_size=6)
batches_st = st.lists(batch_st, min_size=1, max_size=3)


def model_scd2(batches):
    """Reference implementation: per key, an append-only chain of
    accepted (seq, val) versions."""
    state: dict[int, list[tuple[dt.datetime, str]]] = {}
    for batch in batches:
        dedup: dict[tuple[int, dt.datetime], str] = {}
        for k, v, s in batch:
            key = (k, s)
            # engine tiebreak: max value wins for (key,seq) collisions
            dedup[key] = max(dedup[key], v) if key in dedup else v
        per_key: dict[int, list[tuple[dt.datetime, str]]] = {}
        for (k, s), v in dedup.items():
            per_key.setdefault(k, []).append((s, v))
        for k, changes in per_key.items():
            chain = state.setdefault(k, [])
            open_seq = chain[-1][0] if chain else None
            prev_val = chain[-1][1] if chain else None
            for s, v in sorted(changes):
                if open_seq is not None and s <= open_seq:
                    continue  # stale / replay
                if prev_val is not None and v == prev_val:
                    continue  # no-op suppression
                chain.append((s, v))
                open_seq, prev_val = s, v
    expected = set()
    for k, chain in state.items():
        for i, (s, v) in enumerate(chain):
            end = chain[i + 1][0] if i + 1 < len(chain) else None
            expected.add((k, v, s, s, end))
    return expected


def model_scd1(batches):
    state: dict[int, tuple[dt.datetime, str]] = {}
    for batch in batches:
        dedup: dict[tuple[int, dt.datetime], str] = {}
        for k, v, s in batch:
            key = (k, s)
            dedup[key] = max(dedup[key], v) if key in dedup else v
        per_key: dict[int, list[tuple[dt.datetime, str]]] = {}
        for (k, s), v in dedup.items():
            per_key.setdefault(k, []).append((s, v))
        for k, changes in per_key.items():
            s, v = max(changes)  # latest seq wins within the batch
            cur = state.get(k)
            # batch wins ties with existing state (engine: _EXISTING asc)
            if cur is None or s >= cur[0]:
                state[k] = (s, v)
    return {(k, v, s) for k, (s, v) in state.items()}


@pytest.mark.slow
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(batches=batches_st)
def test_scd2_matches_model(spark, batches):
    target = None
    for batch in batches:
        df = spark.createDataFrame(batch, "k int, v string, ts timestamp")
        target = scd2_apply(target, df, keys=["k"], seq="ts")
        target = spark.createDataFrame(target.collect(), target.schema)  # pin
    got = {
        (r.k, r.v, r.ts, r[START_AT], r[END_AT]) for r in target.collect()
    }
    assert got == model_scd2(batches)


@pytest.mark.slow
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(batches=batches_st)
def test_scd1_matches_model(spark, batches):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import _dedup_key_seq

    cur = None
    for batch in batches:
        df = spark.createDataFrame(batch, "k int, v string, ts timestamp")
        d = _dedup_key_seq(df, ["k"], "ts")
        if cur is None:
            w = Window.partitionBy("k").orderBy(F.col("ts").desc())
            cur = d.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1").drop("__rn")
        else:
            cur = scd1_merge(cur, d, ["k"], "ts")
        cur = spark.createDataFrame(cur.collect(), cur.schema)  # pin
    got = {(r.k, r.v, r.ts) for r in cur.collect()}
    assert got == model_scd1(batches)
