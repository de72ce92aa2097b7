"""Model-based ManagedTable fuzzing: under ANY random sequence of
append / overwrite / keyed-merge / compact / restore / vacuum /
epoch-replay, the table's content must equal a trivially-correct pure-
Python model, and at the end of every sequence the INDEPENDENT public-
protocol reader must reconstruct the same content through whatever
checkpoint/retention state the sequence left behind.

This is the r11 machinery's integration fuzzer: sequences are long
enough to cross the automatic 10-commit checkpoint cadence, vacuum
exercises log expiry + the staged-claim sparing rules, and merges mix
file-pruned rewrites (with bloom-indexed discovery bound on the key)
into the history. The delta-log invariants are floor-aware: commit
files form a contiguous range from the retention floor to the head.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import ManagedTable

op_st = st.one_of(
    st.tuples(st.just("append"), st.just(0)),
    st.tuples(st.just("overwrite"), st.just(0)),
    st.tuples(st.just("merge"), st.integers(min_value=0, max_value=3)),
    st.tuples(st.just("delete"), st.integers(min_value=0, max_value=3)),
    st.tuples(st.just("update"), st.integers(min_value=0, max_value=3)),
    st.tuples(st.just("compact"), st.just(0)),
    st.tuples(st.just("pack"), st.just(0)),
    st.tuples(st.just("restore"), st.just(0)),
    st.tuples(st.just("vacuum"), st.integers(min_value=1, max_value=3)),
    st.tuples(st.just("replay"), st.just(0)),
)
ops_st = st.lists(op_st, min_size=4, max_size=14)


def _rows(k: int) -> dict[int, tuple[int, str, float]]:
    return {i: (i, str(i % 7), float(i)) for i in range(10 * k, 10 * k + 6)}


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ops=ops_st)
def test_table_content_matches_model_under_any_sequence(
    spark, tmp_path_factory, ops
):
    root = tmp_path_factory.mktemp("wh")
    t = ManagedTable(spark, root, "fuzz")
    t.bind_bloom_filters(["id"], bits=1024)

    def df(rows: dict):
        return spark.createDataFrame(
            sorted(rows.values()), "id long, user string, amount double"
        )

    n = 0
    model = _rows(n)
    t.overwrite(df(model).coalesce(1))
    n += 1
    snapshots = {t.current_version(): dict(model)}  # committed history
    epoch = 0

    def check():
        got = sorted(tuple(r) for r in t.read().collect())
        want = sorted(model.values())
        assert got == want, (got, want)

    for op, arg in ops:
        if op == "append":
            epoch += 1
            new = _rows(n)
            n += 1
            v = t.append(df(new).coalesce(1), epoch=epoch, epoch_key="s")
            assert v is not None
            model.update(new)
            snapshots[v] = dict(model)
        elif op == "overwrite":
            new = _rows(n)
            n += 1
            v = t.overwrite(df(new).coalesce(1))
            model = dict(new)
            snapshots[v] = dict(model)
        elif op == "merge":
            # modify `arg+1` existing keys (last-write merge semantics)
            keys = sorted(model)[: arg + 1]
            batch = {i: (i, "M", -1.0 * i) for i in keys}
            v = t.merge_keyed(
                df(batch), ["id"],
                lambda cur, b: cur.join(
                    b.select("id"), "id", "left_anti"
                ).unionByName(b),
            )
            assert v is not None
            model.update(batch)
            snapshots[v] = dict(model)
        elif op == "delete":
            # predicate DML: delete a contiguous id range of existing keys
            keys = sorted(model)[: arg + 1]
            v = t.delete_where(f"id >= {keys[0]} AND id <= {keys[-1]}")
            assert v is not None
            for k in list(model):
                if keys[0] <= k <= keys[-1]:
                    del model[k]
            if not model:  # table may not go empty: re-seed
                new = _rows(n)
                n += 1
                epoch += 1
                v = t.append(df(new).coalesce(1), epoch=epoch, epoch_key="s")
                model.update(new)
            snapshots[v] = dict(model)
        elif op == "update":
            # predicate DML: residue-class update, may match nothing
            v = t.update_where(
                f"id % 4 = {arg}", {"user": "'U'", "amount": "amount + 0.5"}
            )
            matched = {k for k in model if k % 4 == arg}
            if matched:
                assert v is not None
                for k in matched:
                    i, u, a = model[k]
                    model[k] = (i, "U", a + 0.5)
                snapshots[v] = dict(model)
            else:
                assert v is None  # no-match DML never commits
        elif op == "compact":
            v = t.compact(target_partitions=1)
            snapshots[v] = dict(model)  # content-identical
        elif op == "pack":
            # bin-packing OPTIMIZE: content-identical, may be a no-op
            v = t.compact_small(max_file_bytes=1 << 20)
            if v is not None:
                snapshots[v] = dict(model)
        elif op == "restore":
            committed = t._pointer_state()["committed"]
            targets = [v for v in committed[:-1] if v in snapshots]
            if targets:
                target = targets[-1]
                v = t.restore(target)
                model = dict(snapshots[target])
                snapshots[v] = dict(model)
        elif op == "vacuum":
            t.vacuum(keep=arg)
            floor = t._pointer_state().get("committed_floor", 0)
            snapshots = {v: s for v, s in snapshots.items() if v >= floor}
        elif op == "replay":
            if epoch > 0:  # at-least-once replay: must be a no-op
                assert (
                    t.append(df(_rows(n)).coalesce(1), epoch=epoch, epoch_key="s")
                    is None
                )
        check()

    # end-of-sequence: the INDEPENDENT protocol reader reconstructs the
    # same content through whatever checkpoint/expiry state remains
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.deltareader import read_delta

    got = sorted(tuple(r) for r in read_delta(spark, t.dir).collect())
    assert got == sorted(model.values())
    # floor-aware delta-log invariants: contiguous from the retention
    # floor to the head; _last_checkpoint (if any) names a real file at
    # or above the floor, never above the head
    rec = t._pointer_state()["delta"]
    floor = rec.get("log_floor", 0)
    versions = [int(p.stem) for p in deltalog.commit_files(t.dir)]
    assert versions == list(range(floor, rec["version"] + 1)), (
        floor, rec["version"], versions
    )
    lc = deltalog.log_dir(t.dir) / "_last_checkpoint"
    if lc.exists():
        import json as _json

        cv = _json.loads(lc.read_text())["version"]
        assert floor <= cv <= rec["version"]
        assert (deltalog.log_dir(t.dir) / f"{cv:020d}.checkpoint.parquet").exists()
