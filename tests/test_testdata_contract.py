"""Testdata-encoding contract: assert the loaded dtypes of every
column the catalog's `_t()` adapter serves.

Exists because the driver regenerates /root/testdata between rounds and
has changed encodings before (events.ts went TIMESTAMP(NANOS)-as-int64
→ timestamp[us] between r2 and r3, silently breaking 19 catalog
entries). A failure here names the drifted table/column instead of
surfacing as dozens of opaque AnalysisExceptions downstream.

If a failure fires: fix `_t()` in
end_to_end_azure_databricks_data_engineering_project_spark/plans/queries.py
to adapt to the new encoding, then update the expectation here.
"""

from __future__ import annotations

import os

import pytest

from end_to_end_azure_databricks_data_engineering_project_spark.plans.queries import _t

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# table -> {column: allowed loaded dtypes (spark simpleString)}
# Only columns the engine depends on structurally; extra columns in the
# files are fine. Sets allow known-good historical encodings that `_t`
# adapts (events.ts: bigint was the legacy nanos encoding).
_EXPECTED: dict[str, dict[str, set[str]]] = {
    "events": {
        "event_id": {"bigint"},
        "ts": {"timestamp", "timestamp_ntz", "bigint"},
        "user_id": {"bigint"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"bigint"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_returnflag": {"string"},
        "l_shipdate": {"timestamp", "timestamp_ntz", "date"},
    },
    "orders": {
        "o_orderkey": {"bigint"},
        "o_custkey": {"bigint"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp", "timestamp_ntz", "date"},
    },
    "customer": {
        "c_custkey": {"bigint"},
        "c_nationkey": {"int"},
        "c_acctbal": {"double"},
    },
    "supplier": {"s_suppkey": {"bigint"}, "s_nationkey": {"int"}},
    "part": {"p_partkey": {"bigint"}, "p_size": {"int"}},
    "nation": {"n_nationkey": {"int"}, "n_regionkey": {"int"}},
    "region": {"r_regionkey": {"int"}},
    "documents": {
        "doc_id": {"bigint"},
        "text": {"string"},
        "lang": {"string"},
    },
    "embeddings": {
        "vec_id": {"bigint"},
        "embedding": {"array<float>", "array<double>"},
        "label": {"int"},
    },
}


@pytest.mark.parametrize("table", sorted(_EXPECTED))
def test_loaded_dtypes_match_contract(spark, table):
    if not os.path.exists(f"{SF_DIR}/{table}.parquet"):
        pytest.skip(f"{SF_DIR}/{table}.parquet not present")
    # The legacy TIMESTAMP(NANOS) encoding this contract allows
    # ('bigint' for events.ts) only loads with the nanosAsLong flag —
    # set it here so that encoding reaches the friendly assertion below
    # instead of throwing at schema load (don't rely on another test
    # having leaked the conf into the shared session).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    dtypes = dict(spark.read.parquet(f"{SF_DIR}/{table}.parquet").dtypes)
    for col, allowed in _EXPECTED[table].items():
        assert col in dtypes, (
            f"TESTDATA DRIFT: {table}.{col} missing — driver changed the "
            f"schema; update _t()/queries and this contract."
        )
        assert dtypes[col] in allowed, (
            f"TESTDATA DRIFT: {table}.{col} loaded as {dtypes[col]!r}, "
            f"expected one of {sorted(allowed)} — driver changed the "
            f"encoding; adapt _t() in plans/queries.py first."
        )


def test_events_ts_normalizes_to_ntz(spark):
    # Whatever the physical encoding, `_t` must serve TIMESTAMP_NTZ.
    assert dict(_t(spark, SF_DIR, "events").dtypes)["ts"] == "timestamp_ntz"


def test_unknown_events_ts_encoding_fails_loudly(spark):
    # A driver encoding we've never seen (e.g. string, int32 epoch
    # seconds) must raise a named error, not silently cast to NULLs.
    from end_to_end_azure_databricks_data_engineering_project_spark.plans.queries import _events_ts_ntz

    df = spark.createDataFrame([("2024-01-01 00:00:00",)], ["ts"])
    with pytest.raises(TypeError, match="unrecognized dtype 'string'"):
        _events_ts_ntz(df, "string")
