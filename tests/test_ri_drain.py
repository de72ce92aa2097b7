"""Deferred referential-integrity drain (late-arriving dimensions):
orphan parking, curing, exactly-once replay, crash windows, spec guard,
retention sweep, and equivalence with the one-shot batch computation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
from end_to_end_azure_databricks_data_engineering_project_spark.streaming import flows
from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
    prune_ri_orphans,
    run_ri_drain,
)

SPEC = "orders.custkey->customer.custkey"


def _children(spark, rows):
    return spark.createDataFrame(rows, "order_id long, custkey long, amount double")


def _parents(spark, keys):
    return spark.createDataFrame([(k, f"c{k}") for k in keys], "custkey long, name string")


def _drain(cat, spark, epoch, child_rows, parent_keys):
    return run_ri_drain(
        cat, _children(spark, child_rows), _parents(spark, parent_keys),
        epoch=epoch, child_key="custkey", parent_key="custkey", ri_spec=SPEC,
    )


def test_orphan_park_and_cure_cycle(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    # epoch 1: children for customers 1,2,3; only parent 1 exists
    got = _drain(cat, spark, 1, [(10, 1, 5.0), (11, 2, 6.0), (12, 3, 7.0)], [1])
    assert got == {"orphans": 2, "cured": 0, "parents": 1}
    orphans = {r.custkey for r in cat.table("ri_orphans").read().collect()}
    assert orphans == {2, 3}

    # epoch 2: parent 2 arrives (no new children) -> child 11 cured
    got = _drain(cat, spark, 2, [], [2])
    assert got == {"orphans": 1, "cured": 1, "parents": 2}
    cured = cat.table("ri_cured").read().collect()
    assert [
        (r["order_id"], r["custkey"], r["__orphan_since"], r["__cured_epoch"])
        for r in cured
    ] == [(11, 2, 1, 2)]
    assert {r.custkey for r in cat.table("ri_orphans").read().collect()} == {3}

    # epoch 3: child + its parent in the SAME batch -> never orphaned,
    # never "cured" (it was never parked)
    got = _drain(cat, spark, 3, [(13, 4, 8.0)], [4])
    assert got == {"orphans": 1, "cured": 0, "parents": 3}


def test_replay_is_exactly_once(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    _drain(cat, spark, 1, [(10, 1, 5.0), (11, 2, 6.0)], [1])
    got = _drain(cat, spark, 2, [(12, 3, 7.0)], [2])
    assert got["cured"] == 1
    before_orphans = sorted(
        tuple(r) for r in cat.table("ri_orphans").read().collect()
    )
    before_cured = sorted(tuple(r) for r in cat.table("ri_cured").read().collect())
    # full replay of epoch 2 (at-least-once foreachBatch)
    got = _drain(cat, spark, 2, [(12, 3, 7.0)], [2])
    assert got["orphans"] == -1 and got["cured"] == 0
    assert sorted(tuple(r) for r in cat.table("ri_orphans").read().collect()) == before_orphans
    assert sorted(tuple(r) for r in cat.table("ri_cured").read().collect()) == before_cured


def test_crash_between_cure_and_orphan_drain_replays_clean(spark, tmp_path, monkeypatch):
    cat = Catalog(spark, tmp_path / "wh")
    _drain(cat, spark, 1, [(10, 1, 5.0), (11, 2, 6.0)], [])

    # crash epoch 2 AFTER the cured append + parent drain, BEFORE the
    # orphan drain commits
    real = flows._merge_state_drain

    def exploding(catalog, table_name, *a, **k):
        if table_name == "ri_orphans":
            raise RuntimeError("simulated crash before orphan commit")
        return real(catalog, table_name, *a, **k)

    monkeypatch.setattr(flows, "_merge_state_drain", exploding)
    with pytest.raises(RuntimeError, match="simulated crash"):
        _drain(cat, spark, 2, [(12, 3, 7.0)], [1])
    monkeypatch.setattr(flows, "_merge_state_drain", real)

    # replay epoch 2: cured append no-ops on its epoch guard, parent
    # drain no-ops, orphan drain completes — final state as if no crash
    got = _drain(cat, spark, 2, [(12, 3, 7.0)], [1])
    assert got["orphans"] == 2  # custkey 2 (from e1) + 3 (new)
    assert {r.custkey for r in cat.table("ri_orphans").read().collect()} == {2, 3}
    cured = cat.table("ri_cured").read().collect()
    assert len(cured) == 1 and cured[0].custkey == 1  # appended once, pre-crash


def test_matches_one_shot_batch_computation(spark, tmp_path):
    # idempotent-monoid property: drained orphan state == anti-join of
    # ALL children against ALL parents, however the batches were sliced
    cat = Catalog(spark, tmp_path / "wh")
    all_children = [(i, i % 7, float(i)) for i in range(60)]
    all_parents = [0, 1, 2, 3]
    for e, lo in enumerate(range(0, 60, 20), start=1):
        _drain(cat, spark, e, all_children[lo:lo + 20],
               all_parents[e - 1:e])
    got = sorted(
        (r.order_id, r.custkey)
        for r in cat.table("ri_orphans").read().collect()
    )
    want = sorted(
        (oid, ck) for oid, ck, _ in all_children if ck not in {0, 1, 2}
    )
    assert got == want


def test_ri_spec_guard(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    _drain(cat, spark, 1, [(10, 1, 5.0)], [1])
    with pytest.raises(ValueError, match="ri_spec"):
        run_ri_drain(
            cat, _children(spark, [(11, 2, 6.0)]), _parents(spark, [2]),
            epoch=2, child_key="custkey", parent_key="custkey",
            ri_spec="lineitem.orderkey->orders.orderkey",
        )


def test_prune_drops_dead_orphans(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    _drain(cat, spark, 1, [(10, 8, 5.0)], [])
    _drain(cat, spark, 2, [(11, 9, 6.0)], [])
    assert prune_ri_orphans(cat, cutoff_epoch=1) == 1
    left = cat.table("ri_orphans").read().collect()
    assert [(r["order_id"], r["__orphan_since"]) for r in left] == [(11, 2)]
    # a pruned orphan's parent arriving later cures nothing (the row
    # was swept as a data-quality reject)
    got = _drain(cat, spark, 3, [], [8])
    assert got["cured"] == 0


def test_null_fk_children_are_skipped_not_parked(spark, tmp_path):
    # NULL FKs are optional, not violations (the fk_orphans semantic)
    # — and no parent could ever cure a NULL key, so parking it would
    # break the true-orphan state bound
    cat = Catalog(spark, tmp_path / "wh")
    got = run_ri_drain(
        cat,
        _children(spark, [(10, 1, 5.0), (11, None, 6.0), (12, 3, 7.0)]),
        _parents(spark, [1]),
        epoch=1, child_key="custkey", parent_key="custkey", ri_spec=SPEC,
    )
    assert got["orphans"] == 1  # only custkey=3; the NULL row is skipped
    assert {r.custkey for r in cat.table("ri_orphans").read().collect()} == {3}


def test_ri_stream_e2e_late_dim_cures(spark, tmp_path):
    """Real Structured Streaming wiring: fact files → foreachBatch
    run_ri_drain with checkpointed epoch ids; dims fold in incrementally
    via the version cursor, and a dim arriving AFTER its fact cures the
    parked orphan on the next drain."""
    from pyspark.sql import types as T

    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import ri_stream

    schema = T.StructType([
        T.StructField("order_id", T.LongType()),
        T.StructField("custkey", T.LongType()),
        T.StructField("amount", T.DoubleType()),
    ])
    src = tmp_path / "facts"
    cat = Catalog(spark, tmp_path / "wh")
    dims = cat.table("silver_customer")

    def drain():
        q = ri_stream(
            spark, str(src), schema, cat, str(tmp_path / "ck"),
            dims_table="silver_customer", child_key="custkey",
            parent_key="custkey", ri_spec=SPEC,
        )
        q.awaitTermination(120)

    # batch 1: facts for customers 1 and 2; only dim 1 exists
    dims.overwrite(_parents(spark, [1]))
    spark.createDataFrame([(10, 1, 5.0), (11, 2, 6.0)], schema).write.parquet(
        str(src / "run=1")
    )
    drain()
    assert {r.custkey for r in cat.table("ri_orphans").read().collect()} == {2}
    # the fold cursor IS the parents table's commit-atomic watermark
    assert cat.table("ri_parent_keys").applied_epoch("ri_parents") == (
        dims.current_version() + 1
    )

    # dim 2 arrives (appended to the dims table), plus a new fact file
    # for customer 3 (still parentless)
    dims.append(_parents(spark, [2]))
    spark.createDataFrame([(12, 3, 7.0)], schema).write.parquet(str(src / "run=2"))
    drain()
    assert {r.custkey for r in cat.table("ri_orphans").read().collect()} == {3}
    cured = cat.table("ri_cured").read().collect()
    assert [r.custkey for r in cured] == [2]

    # restart with no new facts: exactly-once, nothing moves
    before_o = sorted(tuple(r) for r in cat.table("ri_orphans").read().collect())
    before_c = sorted(tuple(r) for r in cat.table("ri_cured").read().collect())
    drain()
    assert sorted(tuple(r) for r in cat.table("ri_orphans").read().collect()) == before_o
    assert sorted(tuple(r) for r in cat.table("ri_cured").read().collect()) == before_c

    # the stream bound its checkpoint as the epoch authority: a direct
    # batch drain (sentinel identity) must now be refused
    with pytest.raises(ValueError, match="ri_stream_id"):
        _drain(cat, spark, 99, [(13, 4, 8.0)], [4])


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

slices_st = st.tuples(
    st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=12),
    st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=5),
    st.integers(min_value=1, max_value=4),  # number of drain epochs
)


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=slices_st)
def test_ri_drain_orphans_invariant_under_slicing(spark, tmp_path_factory, data):
    """Idempotent-monoid property, hypothesis-driven: however children
    and parents are sliced across drain epochs, the final orphan state
    equals the one-shot anti-join of all children vs all parents."""
    child_keys, parent_keys, n_epochs = data
    cat = Catalog(spark, tmp_path_factory.mktemp("wh"))
    children = [(100 + i, k, float(i)) for i, k in enumerate(child_keys)]
    # deal rows round-robin into epochs (any deterministic slicing works)
    c_slices = [children[e::n_epochs] for e in range(n_epochs)]
    p_slices = [parent_keys[e::n_epochs] for e in range(n_epochs)]
    for e in range(n_epochs):
        _drain(cat, spark, e + 1, c_slices[e], p_slices[e])
    if cat.table("ri_orphans").exists():
        got = sorted(
            (r.order_id, r.custkey)
            for r in cat.table("ri_orphans").read().collect()
        )
    else:
        got = []
    want = sorted(
        (oid, ck) for oid, ck, _ in children if ck not in set(parent_keys)
    )
    assert got == want


def test_replayed_fact_epoch_still_folds_newer_parents(spark, tmp_path):
    """The review-caught crash window: fact epoch 1 fully applies, the
    stream crashes before committing offsets, dims advance, epoch 1
    replays carrying the NEWER dim rows. The parents fold rides its own
    epoch authority (parents_epoch), so those dims still fold and their
    cures still log — with a shared epoch they would be dropped forever."""
    cat = Catalog(spark, tmp_path / "wh")
    run_ri_drain(
        cat, _children(spark, [(10, 1, 5.0), (11, 2, 6.0)]),
        _parents(spark, []), epoch=1, parents_epoch=1,
        child_key="custkey", parent_key="custkey", ri_spec=SPEC,
    )
    assert {r.custkey for r in cat.table("ri_orphans").read().collect()} == {1, 2}
    # replay of fact epoch 1, but dims advanced (parents_epoch 2, dim 1)
    got = run_ri_drain(
        cat, _children(spark, [(10, 1, 5.0), (11, 2, 6.0)]),
        _parents(spark, [1]), epoch=1, parents_epoch=2,
        child_key="custkey", parent_key="custkey", ri_spec=SPEC,
    )
    assert got["orphans"] == -1  # fact epoch replay: orphan drain no-op
    assert got["parents"] == 1  # but the newer dim FOLDED
    assert got["cured"] == 1    # and its cure is logged exactly once
    assert [r.custkey for r in cat.table("ri_cured").read().collect()] == [1]
    # the next real drain reconciles the orphan state via the anti-join
    got = run_ri_drain(
        cat, _children(spark, []), _parents(spark, []),
        epoch=2, parents_epoch=2,
        child_key="custkey", parent_key="custkey", ri_spec=SPEC,
    )
    assert {r.custkey for r in cat.table("ri_orphans").read().collect()} == {2}
    # and the cure was NOT double-logged
    assert cat.table("ri_cured").read().count() == 1


def test_recreated_checkpoint_fails_loudly(spark, tmp_path):
    """Delete-and-recreate of the SAME checkpoint path restarts epoch
    numbering invisibly to a path-only binding — the bound checkpoint
    GENERATION (query id) turns that into a loud refusal."""
    import shutil

    from pyspark.sql import types as T
    from pyspark.errors import StreamingQueryException

    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import ri_stream

    schema = T.StructType([
        T.StructField("order_id", T.LongType()),
        T.StructField("custkey", T.LongType()),
        T.StructField("amount", T.DoubleType()),
    ])
    src = tmp_path / "facts"
    cat = Catalog(spark, tmp_path / "wh")
    cat.table("silver_customer").overwrite(_parents(spark, [1]))
    spark.createDataFrame([(10, 1, 5.0), (11, 2, 6.0)], schema).write.parquet(
        str(src / "run=1")
    )

    def drain():
        q = ri_stream(
            spark, str(src), schema, cat, str(tmp_path / "ck"),
            dims_table="silver_customer", child_key="custkey",
            parent_key="custkey", ri_spec=SPEC,
        )
        q.awaitTermination(120)

    drain()
    assert {r.custkey for r in cat.table("ri_orphans").read().collect()} == {2}
    # operator wipes the checkpoint to "reprocess" — epochs restart at 0
    shutil.rmtree(tmp_path / "ck")
    spark.createDataFrame([(12, 3, 7.0)], schema).write.parquet(str(src / "run=2"))
    with pytest.raises(StreamingQueryException, match="ri_stream_id"):
        drain()


def test_ri_stream_dims_rebuild_barrier_falls_back_to_full_read(spark, tmp_path):
    """A dims OVERWRITE (snapshot rewrite) between drains breaks the
    appended_since delta — the fold must fall back to the full dim
    snapshot and still cure, never silently miss the rewritten keys."""
    from pyspark.sql import types as T

    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import ri_stream

    schema = T.StructType([
        T.StructField("order_id", T.LongType()),
        T.StructField("custkey", T.LongType()),
        T.StructField("amount", T.DoubleType()),
    ])
    src = tmp_path / "facts"
    cat = Catalog(spark, tmp_path / "wh")
    dims = cat.table("silver_customer")
    dims.overwrite(_parents(spark, [1]))

    def drain():
        q = ri_stream(
            spark, str(src), schema, cat, str(tmp_path / "ck"),
            dims_table="silver_customer", child_key="custkey",
            parent_key="custkey", ri_spec=SPEC,
        )
        q.awaitTermination(120)

    spark.createDataFrame([(10, 1, 5.0), (11, 2, 6.0)], schema).write.parquet(
        str(src / "run=1")
    )
    drain()
    assert {r.custkey for r in cat.table("ri_orphans").read().collect()} == {2}

    # dims REBUILT (overwrite = snapshot barrier, delta not derivable)
    # with the missing parent now present
    dims.overwrite(_parents(spark, [1, 2]))
    spark.createDataFrame([(12, 3, 7.0)], schema).write.parquet(str(src / "run=2"))
    drain()
    assert {r.custkey for r in cat.table("ri_orphans").read().collect()} == {3}
    assert [r.custkey for r in cat.table("ri_cured").read().collect()] == [2]


def test_higher_parents_epoch_does_not_double_log_cures(spark, tmp_path):
    """Review-caught double-cure window: after a replayed fact epoch
    folds newer parents (step 3's orphan drain no-ops on its epoch
    guard, so the just-cured row stays PARKED in ri_orphans), a later
    drain at a HIGHER parents epoch re-runs the cure step against the
    committed parent set — without the already-cured anti-join it would
    re-match the parked row and append it to ri_cured again, and the
    downstream fact replay would duplicate the row."""
    cat = Catalog(spark, tmp_path / "wh")
    run_ri_drain(
        cat, _children(spark, [(10, 1, 5.0), (11, 2, 6.0)]),
        _parents(spark, []), epoch=1, parents_epoch=1,
        child_key="custkey", parent_key="custkey", ri_spec=SPEC,
    )
    # replayed fact epoch carrying a newer dim: cure logs, orphan 1
    # stays parked (fact-epoch guard no-ops the orphan drain)
    run_ri_drain(
        cat, _children(spark, [(10, 1, 5.0), (11, 2, 6.0)]),
        _parents(spark, [1]), epoch=1, parents_epoch=2,
        child_key="custkey", parent_key="custkey", ri_spec=SPEC,
    )
    assert cat.table("ri_cured").read().count() == 1
    assert {r.custkey for r in cat.table("ri_orphans").read().collect()} == {1, 2}
    # subsequent drain at a higher parents epoch: must NOT re-cure
    got = run_ri_drain(
        cat, _children(spark, []), _parents(spark, []),
        epoch=2, parents_epoch=3,
        child_key="custkey", parent_key="custkey", ri_spec=SPEC,
    )
    assert got["cured"] == 0
    cured = cat.table("ri_cured").read().collect()
    assert [(r["order_id"], r["__cured_epoch"]) for r in cured] == [(10, 2)]
    # the orphan drain (fresh fact epoch) reconciles the parked row
    assert {r.custkey for r in cat.table("ri_orphans").read().collect()} == {2}
    # and a GENUINELY new orphan cured later still logs exactly once
    got = run_ri_drain(
        cat, _children(spark, []), _parents(spark, [2]),
        epoch=3, parents_epoch=4,
        child_key="custkey", parent_key="custkey", ri_spec=SPEC,
    )
    assert got["cured"] == 1
    assert cat.table("ri_cured").read().count() == 2
