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
