"""Incremental IVF-PQ index drain: model freezing via commit-atomic
properties, exactly-once appends, split-vs-union equivalence, and
querying the drained index."""

from __future__ import annotations

import pytest

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
    ann_index_model,
    run_ann_index_drain,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _cat(spark, tmp_path):
    return Catalog(spark, tmp_path / "wh")


@pytest.mark.slow
def test_drain_split_equals_union_encode(spark, tmp_path, emb):
    """Model fits on the FIRST batch and freezes; draining the rest in
    a second epoch must leave exactly the rows ivfpq_encode_with
    produces for the union under that same frozen model."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.pq import (
        ivfpq_encode_with,
    )

    cat = _cat(spark, tmp_path)
    b1 = emb.filter("vec_id < 100")
    b2 = emb.filter("vec_id >= 100 AND vec_id < 200")
    n1 = run_ann_index_drain(cat, b1, epoch=1)
    n2 = run_ann_index_drain(cat, b2, epoch=2)
    assert n1 == 100 and n2 == 100
    cents, cbs = ann_index_model(cat)
    expect = {
        (r.vec_id, r.cluster, tuple(r.codes))
        for r in ivfpq_encode_with(
            emb.filter("vec_id < 200"), cents, cbs
        ).select("vec_id", "cluster", "codes").collect()
    }
    got = {
        (r.vec_id, r.cluster, tuple(r.codes))
        for r in cat.table("ann_index").read().collect()
    }
    assert got == expect


def test_drain_replay_is_noop(spark, tmp_path, emb):
    cat = _cat(spark, tmp_path)
    b = emb.filter("vec_id < 50")
    assert run_ann_index_drain(cat, b, epoch=1) == 50
    assert run_ann_index_drain(cat, b, epoch=1) == -1
    assert cat.table("ann_index").read().count() == 50


def test_drain_model_shape_mismatch_fails_loudly(spark, tmp_path, emb):
    cat = _cat(spark, tmp_path)
    run_ann_index_drain(cat, emb.filter("vec_id < 50"), epoch=1, m=2, k_sub=4)
    with pytest.raises(ValueError, match="never mix"):
        run_ann_index_drain(
            cat, emb.filter("vec_id >= 50"), epoch=2, m=4, k_sub=4
        )


@pytest.mark.slow
def test_query_drained_index_matches_direct_encode(spark, tmp_path, emb):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.pq import (
        ivfpq_encode_with,
        ivfpq_topk,
    )

    cat = _cat(spark, tmp_path)
    run_ann_index_drain(cat, emb.filter("vec_id < 150"), epoch=1)
    run_ann_index_drain(cat, emb.filter("vec_id >= 150"), epoch=2)
    cents, cbs = ann_index_model(cat)
    q = emb.filter("vec_id < 5")
    via_index = sorted(
        map(tuple, ivfpq_topk(cat.table("ann_index").read(), q, cents, cbs, k=4).collect())
    )
    direct = sorted(
        map(
            tuple,
            ivfpq_topk(
                ivfpq_encode_with(emb, cents, cbs), q, cents, cbs, k=4
            ).collect(),
        )
    )
    assert via_index == direct


def test_model_accessor_before_first_drain_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no bound ivfpq_model"):
        ann_index_model(_cat(spark, tmp_path))


def test_drain_lost_replay_race_returns_noop(spark, tmp_path, emb, monkeypatch):
    """If the epoch lands between the drain's pre-check and its append
    (concurrent replay), append commits nothing — the drain must report
    -1, not the batch size, and must NOT block on the never-fired
    observation."""
    from end_to_end_azure_databricks_data_engineering_project_spark.sources import tables as tbl

    cat = _cat(spark, tmp_path)
    b = emb.filter("vec_id < 40")
    assert run_ann_index_drain(cat, b, epoch=1) == 40
    # simulate the race: the pre-check sees "not applied" but the table
    # actually has epoch 1 applied, so append's internal guard skips
    real = tbl.ManagedTable.applied_epoch
    calls = {"n": 0}

    def lying_applied_epoch(self, key):
        calls["n"] += 1
        if calls["n"] == 1:  # only the drain's pre-check is lied to
            return None
        return real(self, key)

    monkeypatch.setattr(tbl.ManagedTable, "applied_epoch", lying_applied_epoch)
    assert run_ann_index_drain(cat, b, epoch=1) == -1
    assert cat.table("ann_index").read().count() == 40
