"""CLI driver (≙ the reference's daily job: notebook → DLT pipeline →
wheel entrypoint, ``resources/spotify_dab.job.yml:17-34``).

    python -m end_to_end_azure_databricks_data_engineering_project_spark run-all [workdir]

Runs the full medallion demo on the deterministic two-phase fixture:
phase-1 ingest → silver → gold, then phase-2 (incremental) ingest →
silver → gold, then prints the reference's own spot-check queries
(SCD2 history, per-key versions — ``silver_Dimensions.py:206-215``).
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark import fixtures
from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLES
from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import END_AT
from end_to_end_azure_databricks_data_engineering_project_spark.operators.transforms import (
    bucketize,
    dedup_keep_latest,
    normalize_case,
    regexp_clean,
)
from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark
from end_to_end_azure_databricks_data_engineering_project_spark.sources.ingest import ingest_all
from end_to_end_azure_databricks_data_engineering_project_spark.sources.watermark import WatermarkStore
from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
    build_medallion_pipeline,
    run_report_hook,
)

CLEANSERS = {
    # ≙ silver_Dimensions.py per-table cleanses
    "dim_user": lambda df: dedup_keep_latest(
        normalize_case(df, "user_name"), ["user_id"], "updated_at"
    ),
    "dim_artist": lambda df: dedup_keep_latest(df, ["artist_id"], "updated_at"),
    "dim_track": lambda df: regexp_clean(
        bucketize(df, "duration_sec", "duration_flag", [150, 300], ["low", "medium", "high"]),
        "track_name", "-", " ",
    ),
}


def run_all(workdir: str, scale: float = 0.2) -> None:
    spark = get_spark("medallion-demo")
    root = Path(workdir)
    store = WatermarkStore(root / "state")
    cfgs = list(TABLES)

    for phase_name, sources in (
        ("phase 1 (initial)", fixtures.phase1(spark, scale)),
        ("phase 2 (incremental)", fixtures.phase2(spark, scale)),
    ):
        results = ingest_all(spark, cfgs, sources, str(root / "bronze"), store)
        pipe, catalog = build_medallion_pipeline(
            spark, cfgs, str(root / "bronze"), str(root / "warehouse"),
            str(root / "state"), CLEANSERS,
        )
        # run ledger + failure events (≙ reference readme.md:8 alerting)
        flow_rows = pipe.run_all(
            on_event=run_report_hook(spark, catalog, run_id=phase_name)
        )
        print(f"== {phase_name}")
        for r in results:
            print(f"   ingest {r.table:12s} rows={r.rows:6d} wm→ {r.watermark_after}")
        for name, n in flow_rows.items():
            print(f"   flow   {name:22s} rows={n}")

    # ≙ the reference's manual SCD2 spot checks (silver_Dimensions.py:206-215)
    gold_user = catalog.table("gold_dim_user").read()
    print("== SCD2 check: superseded versions (END_AT not null):",
          gold_user.filter(F.col(END_AT).isNotNull()).count())
    print("== SCD2 check: versions for user_id 1:")
    for row in gold_user.filter("user_id = 1").orderBy("__START_AT").collect():
        print("  ", row.subscription_type, row["__START_AT"], row[END_AT])
    print("== SCD1 fact rows:", catalog.table("gold_fact_stream").read().count())
    failed = catalog.table("pipeline_runs").read().filter("status = 'failed'")
    print("== pipeline_runs ledger: failed flows:", failed.count())


def run_sql(warehouse: str, statement: str) -> None:
    """Ad-hoc SQL over an existing warehouse (≙ the reference's ad-hoc
    notebook queries, ``silver_Dimensions.py:206-215``) — including the
    Delta DML verbs: ``DELETE FROM t WHERE …`` / ``UPDATE t SET …
    WHERE …`` route to the table's pruned-rewrite DML and print the
    committed version; everything else prints its result rows."""
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    spark = get_spark("sql")
    out = Catalog(spark, warehouse).sql(statement)
    if out is None or isinstance(out, int):
        print(f"committed version: {out}")
    else:
        out.show(100, truncate=False)


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run-all"
    if cmd == "run-all":
        workdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="medallion_")
        run_all(workdir)
    elif cmd == "sql" and len(sys.argv) > 3:
        run_sql(sys.argv[2], sys.argv[3])
    else:
        print(__doc__)
        print("    python -m end_to_end_azure_databricks_data_engineering_project_spark sql <warehouse> <statement>")
        sys.exit(2)


if __name__ == "__main__":
    main()
