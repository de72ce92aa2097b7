"""Property test: under ANY sequence of table operations (append /
overwrite / compact / restore / epoch-replayed append), the emitted
Delta log keeps its invariants — contiguous versions, stable table id,
protocol+metaData at commit 0, and full-log replay == the current
snapshot's exact file set."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import ManagedTable

# op stream: each element drives one table operation
ops_st = st.lists(
    st.sampled_from(["append", "overwrite", "compact", "restore", "replay"]),
    min_size=1,
    max_size=8,
)


def _invariants(t: ManagedTable) -> None:
    d = deltalog.log_dir(t.dir)
    versions = sorted(int(p.stem) for p in d.glob("*.json"))
    assert versions == list(range(len(versions))), versions
    actions0 = deltalog.read_actions(t.dir, 0)
    assert any("protocol" in a for a in actions0)
    assert any("metaData" in a for a in actions0)
    ids = set()
    live: set[str] = set()
    for v in versions:
        for a in deltalog.read_actions(t.dir, v):
            if "metaData" in a:
                ids.add(a["metaData"]["id"])
            if "remove" in a:
                assert a["remove"]["path"] in live, (
                    f"commit {v} removes a path that was not live"
                )
                live.discard(a["remove"]["path"])
            if "add" in a:
                live.add(a["add"]["path"])
    assert len(ids) == 1  # stable table id (no restart happened here)
    snap = {f"{f.parent.name}/{f.name}" for f in t.data_files()}
    assert live == snap


@pytest.mark.slow
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ops=ops_st)
def test_delta_log_invariants_under_any_op_sequence(spark, tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("wh")
    t = ManagedTable(spark, root, "orders")
    n = 0

    def df(k):
        return spark.range(10 * k, 10 * k + 10).selectExpr(
            "id", "CAST(id % 7 AS STRING) AS user", "CAST(id AS DOUBLE) AS amount"
        )

    t.overwrite(df(n)); n += 1
    epoch = 0
    for op in ops:
        if op == "append":
            epoch += 1
            t.append(df(n), epoch=epoch, epoch_key="s"); n += 1
        elif op == "overwrite":
            t.overwrite(df(n)); n += 1
        elif op == "compact":
            t.compact(target_partitions=1)
        elif op == "restore":
            cur = t.current_version()
            if cur > 0:
                # restore to the previous COMMITTED version
                committed = t._pointer_state()["committed"]
                if len(committed) >= 2:
                    t.restore(committed[-2])
        elif op == "replay":
            # at-least-once replay of the last epoch: must be a no-op
            if epoch > 0:
                assert t.append(df(n), epoch=epoch, epoch_key="s") is None
        _invariants(t)
