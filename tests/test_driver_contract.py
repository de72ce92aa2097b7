"""Exercises __spark_entry__ the way the driver will: a plain session
(no engine-tuned confs), including a NON-UTC session timezone — results
must still match the DuckDB oracle exactly."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_entry_returns_rows_with_stable_schema(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"r_name", "order_year", "revenue", "n_orders"}


def test_queries_and_oracles_cover_each_other(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # the vast majority of the surface must be oracle-checked
    assert len(oracles) >= 0.85 * len(qs)


@pytest.mark.parametrize("tz", ["America/Los_Angeles", "Asia/Tokyo"])
def test_timestamp_queries_survive_non_utc_session(spark, tz):
    """The driver's session may run in any timezone; event-time results
    must still hash-match the (timezone-naive) DuckDB oracle."""
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        qs = entrymod.queries()
        oracles = entrymod.oracle_sql()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
        )
        for name in ["max_watermark", "watermark_filter", "latest_per_key"]:
            sdf = qs[name](spark, SF_DIR)
            srows = sorted(
                tuple(str(v) for v in r) for r in sdf.collect()
            )
            drows = sorted(
                tuple(str(v) for v in r) for r in con.execute(oracles[name]).fetchall()
            )
            # align column order: both sorted by name
            scols = sdf.columns
            perm = sorted(range(len(scols)), key=lambda i: scols[i])
            dnames = [d[0] for d in con.execute(oracles[name]).description]
            dperm = sorted(range(len(dnames)), key=lambda i: dnames[i])
            srows = sorted(tuple(t[i] for i in perm) for t in srows)
            drows = sorted(tuple(t[i] for i in dperm) for t in drows)
            assert srows == drows, name
        con.close()
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)


def test_stats_moments_partitioning_independent(spark):
    """The statistical-moments query folds exact decimal partial sums, so
    its double outputs must be bit-identical under any partitioning —
    the property that makes it safe on a 1000-executor cluster."""
    from end_to_end_azure_databricks_data_engineering_project_spark.plans.queries import CATALOG

    q = CATALOG["stats_moments"].spark
    base = {tuple(map(str, r)) for r in q(spark, SF_DIR).collect()}
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    for n_parts in (1, 7, 64):
        view = lineitem.repartition(n_parts)
        view.createOrReplaceTempView("__li_repart")
        import end_to_end_azure_databricks_data_engineering_project_spark.plans.queries as qmod

        orig = qmod._t
        try:
            qmod._t = lambda s, sf, name, _o=orig: (
                s.table("__li_repart") if name == "lineitem" else _o(s, sf, name)
            )
            got = {tuple(map(str, r)) for r in q(spark, SF_DIR).collect()}
        finally:
            qmod._t = orig
        assert got == base, n_parts


def test_deterministic_sample_partitioning_independent(spark):
    """Hash-based sampling must select the SAME rows under any partition
    layout (df.sample does not) — the property that makes subsets
    reproducible on a 1000-executor cluster."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("smp|"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    base = {r.doc_id for r in docs.filter(h % 100 < 10).select("doc_id").collect()}
    for n_parts in (1, 13):
        got = {
            r.doc_id
            for r in docs.repartition(n_parts)
            .filter(h % 100 < 10)
            .select("doc_id")
            .collect()
        }
        assert got == base, n_parts
    assert 0 < len(base) < docs.count()


def test_dataset_split_disjoint_exhaustive(spark):
    """Every document lands in exactly one of train/val/test."""
    from end_to_end_azure_databricks_data_engineering_project_spark.plans.queries import CATALOG

    rows = CATALOG["dataset_split"].spark(spark, SF_DIR).collect()
    total = sum(r.n_docs for r in rows)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert total == n_docs
    assert {r.split for r in rows} == {"train", "val", "test"}


def test_verification_window_covers_unproven_entries():
    """The driver verifies queries() in insertion order, capped at 50
    entries per round. Contract: every entry WITHOUT a green driver row
    against the current testdata (i.e. newly registered this round)
    must sit inside the first 50 — otherwise its first run never gets
    driver-checked — and stalest-evidence entries (r3-green-only) come
    before the r4-green tail so the window refreshes them."""
    from end_to_end_azure_databricks_data_engineering_project_spark.plans.queries import (
        _last_green,
        CATALOG,
    )

    order = list(CATALOG)
    window = set(order[:50])
    unproven = [n for n in order if _last_green(n) == 0]
    missing = [n for n in unproven if n not in window]
    assert not missing, (
        f"entries lacking current-testdata evidence fall outside the "
        f"driver's 50-entry window: {missing}"
    )
    # unproven entries lead the window outright; proven entries follow
    # in non-decreasing last-green round (stalest evidence first)
    assert order[: len(unproven)] == unproven
    rounds = [_last_green(n) for n in order]
    assert rounds == sorted(rounds)


def test_catalog_outputs_are_driver_hashable(spark):
    """The driver canonicalizes results with pandas sort_values + a
    value hash, which dies on array/map/struct cells (r5:
    `unhashable type: 'list'` on array_toolkit). Every oracle-checked
    entry must therefore project only atomic columns — run the array
    ops in the plan, project their elements out."""
    from pyspark.sql import types as T

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = {}
    for name in oracles:
        schema = qs[name](spark, SF_DIR).schema
        nested = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if nested:
            bad[name] = nested
    assert not bad, f"driver-unhashable output columns: {bad}"


def test_stratified_sample_partitioning_independent(spark):
    """The stratified draw is md5-ordered, so the selected rows must be
    identical regardless of the input's physical partitioning."""
    from end_to_end_azure_databricks_data_engineering_project_spark.plans.queries import CATALOG

    q = CATALOG["stratified_sample"].spark
    base = sorted(tuple(r) for r in q(spark, SF_DIR).collect())

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for n in (1, 16):
        shuffled = d.repartition(n)
        shuffled.createOrReplaceTempView("_strat_probe")
        w = (
            shuffled.selectExpr(
                "doc_id", "lang",
                "row_number() OVER (PARTITION BY lang"
                " ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS sample_rank",
                "count(*) OVER (PARTITION BY lang) AS stratum_n",
            )
            .where("sample_rank <= ceil(stratum_n * 0.2)")
        )
        got = sorted(tuple(r) for r in w.collect())
        assert got == base, f"stratified draw changed under repartition({n})"
