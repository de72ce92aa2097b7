"""Data-quality expectations with drop-on-violation and metrics.

Re-expresses DLT's ``@dlt.expect_all_or_drop`` (reference
``src/gold/dlt/transformations/DimUser.py:3-8,16`` —
``{"rule 1": "user_id IS NOT NULL"}``; metrics surfaced per
``readme.md:119-120``) on public Spark:

 - rules are SQL boolean expressions over the row;
 - violating rows are dropped before the sink;
 - pass/drop counts per rule are surfaced via ``DataFrame.observe``
   (computed *inside* the job — zero extra passes over the data, works
   identically on streaming micro-batches via QueryListener).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class ExpectationResult:
    df: DataFrame
    observation: Observation | None
    rules: dict[str, str]

    def metrics(self) -> dict[str, int]:
        """Per-rule violation counts + total rows seen. Blocks until the
        observed DataFrame has been executed by an action."""
        if self.observation is None:
            return {}
        return dict(self.observation.get)


def expect_all_or_drop(
    df: DataFrame, rules: dict[str, str], *, observe: bool = True
) -> ExpectationResult:
    """Drop rows violating ANY rule; observe per-rule violation counts.

    ≙ dlt.expect_all_or_drop. The combined predicate stays in codegen;
    `observe` aggregates ride the same scan.
    """
    if not rules:
        return ExpectationResult(df, None, rules)
    keep = None
    metrics = [F.count(F.lit(1)).alias("rows_seen")]
    for name, rule in rules.items():
        cond = F.expr(rule)
        keep = cond if keep is None else keep & cond
        metrics.append(
            F.sum(F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)).alias(
                f"violations__{name}"
            )
        )
    obs: Observation | None = None
    if observe:
        obs = Observation()
        df = df.observe(obs, *metrics)
    # NULL rule results count as violations (SQL three-valued logic).
    return ExpectationResult(df.filter(F.coalesce(keep, F.lit(False))), obs, rules)


def expect_all_or_quarantine(
    df: DataFrame, rules: dict[str, str]
) -> tuple[DataFrame, DataFrame]:
    """Route instead of drop: returns ``(passed, quarantined)`` where
    quarantined rows carry a ``_failed_expectations`` array naming every
    violated rule — the DLT quarantine-table pattern, which keeps bad
    rows debuggable and replayable instead of silently gone.

    The failure array is computed once per row in codegen (NULL rule
    results count as failures, matching ``expect_all_or_drop``'s
    three-valued-logic stance); both outputs are filters over the same
    scan, so writing passed rows to the sink and quarantined rows to a
    side table costs one extra pass at most — and none if the caller
    persists the tagged frame."""
    if not rules:
        return df, df.limit(0).withColumn(
            "_failed_expectations", F.array().cast("array<string>")
        )
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(F.expr(rule), F.lit(False)), F.lit(name))
                for name, rule in rules.items()
            ]
        )
    )
    tagged = df.withColumn("_failed_expectations", failed)
    passed = tagged.filter(F.size("_failed_expectations") == 0).drop(
        "_failed_expectations"
    )
    quarantined = tagged.filter(F.size("_failed_expectations") > 0)
    return passed, quarantined


def expect_all(df: DataFrame, rules: dict[str, str]) -> ExpectationResult:
    """Warn-only variant (≙ dlt.expect_all): keep all rows, observe counts."""
    if not rules:
        return ExpectationResult(df, None, rules)
    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("rows_seen")]
    for name, rule in rules.items():
        cond = F.expr(rule)
        metrics.append(
            F.sum(F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)).alias(
                f"violations__{name}"
            )
        )
    return ExpectationResult(df.observe(obs, *metrics), obs, rules)


def integrity_report(checks: list[tuple[str, DataFrame]]) -> DataFrame:
    """Constraint-violation report over a set of named single-count
    checks — the warehouse-wide DQ scorecard the reference models as
    per-pipeline ADF validation activities (`Azure ADF/adf/pipeline/
    incremental_loop.json` gates each copy on a lookup) re-expressed as
    ONE declarative relation: every row is (check_name, violations),
    and the deploy gate is ``max(violations) == 0``.

    Each entry is (name, df) where ``df`` is any DataFrame whose ROW
    COUNT is the violation count — build them with the helpers below
    (``pk_duplicates``, ``fk_orphans``, ``null_violations``) or any
    ad-hoc predicate. The union of per-check aggregates lets Catalyst
    plan each check independently (broadcast the dim side of an FK
    probe, map-side-combine the PK groupBy) while the caller still
    gets one actionable relation.
    """
    if not checks:
        raise ValueError("integrity_report: no checks given")
    parts = [
        df.agg(F.count(F.lit(1)).cast("bigint").alias("violations")).select(
            F.lit(name).alias("check_name"), "violations"
        )
        for name, df in checks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pk_duplicates(df: DataFrame, *key_cols: str) -> DataFrame:
    """Key groups that violate primary-key uniqueness (count > 1).
    NULL keys are violations of a different check (``null_violations``)
    and are excluded here so the two reports don't double-count.
    One map-side-combinable groupBy."""
    nn = df
    for c in key_cols:
        nn = nn.filter(F.col(c).isNotNull())
    return (
        nn.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
    )


def fk_orphans(child: DataFrame, fk_col: str, parent: DataFrame, pk_col: str) -> DataFrame:
    """Child rows whose non-NULL FK has no parent row (referential-
    integrity orphans; NULL FKs are legitimately optional and skipped).
    LEFT ANTI join — with a dimension-sized parent Spark broadcasts
    the parent's key set, so the probe is a map-only pass over the
    child (no fact-table shuffle)."""
    keys = parent.select(F.col(pk_col).alias(fk_col)).distinct()
    return child.filter(F.col(fk_col).isNotNull()).join(keys, fk_col, "left_anti")


def null_violations(df: DataFrame, col: str) -> DataFrame:
    """Rows violating a NOT NULL expectation on ``col``."""
    return df.filter(F.col(col).isNull())
