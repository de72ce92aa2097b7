"""SCD Type-1 / Type-2 CDC apply-changes (the gold layer's engine).

Re-expresses DLT's ``create_auto_cdc_flow`` (reference
``src/gold/dlt/transformations/DimUser.py:20-29`` — keys, sequence_by,
stored_as_scd_type ∈ {1,2}; FactStream.py:12-21 for SCD1) as pure
DataFrame→DataFrame transforms plus a ManagedTable sink. Semantics
implemented (SURVEY.md §7.3's hard parts):

 - **last-write-wins by sequence** with deterministic tie-breaks;
 - **multiple changes per key in one batch** — SCD2 chains validity
   intervals within the batch (change_i.__END_AT = change_{i+1}.seq);
 - **out-of-order / replayed input** — batch rows with sequence ≤ the
   current open version are stale and ignored (this also makes replay
   after a crashed-but-uncommitted run idempotent);
 - **no-op change suppression** — a change identical to its predecessor
   version (all attributes except the sequence column) creates no new
   SCD2 version;
 - SCD2 system columns ``__START_AT``/``__END_AT`` typed as the
   sequence column's type (timestamp or date — DimDate sequences by a
   DATE, reference DimDate.py:18).

Physical shape: everything is ONE hash shuffle on the business keys
(union → window over keys) plus the sink write — no per-row Python, no
driver loops. On Delta the same transform feeds MERGE; here the
ManagedTable snapshot swap provides the atomic commit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import ManagedTable

START_AT = "__START_AT"
END_AT = "__END_AT"
_ORD = "__ord"
_EXISTING = "__is_existing"


def _dedup_key_seq(batch: DataFrame, keys: Sequence[str], seq: str) -> DataFrame:
    """Collapse exact (key, sequence) collisions deterministically."""
    others = [c for c in batch.columns if c not in keys and c != seq]
    w = Window.partitionBy(*keys, seq).orderBy(*[F.col(c).desc_nulls_last() for c in others] or [F.lit(1)])
    return batch.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1").drop("__rn")


def scd1_merge(
    current: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    seq: str,
    delete_expr: str | None = None,
    except_cols: Sequence[str] = (),
    erase: bool = False,
) -> DataFrame:
    """Upsert: one row per key, highest sequence wins; batch wins ties.

    ≙ Delta ``MERGE ... whenMatchedUpdateAll whenNotMatchedInsertAll``
    guarded by ``s.seq >= t.seq`` (reference FactStream.py:12-21).
    ``delete_expr`` ≙ apply_as_deletes: if the winning change for a key
    is a delete, the key is removed. ``except_cols`` ≙ DLT's
    except_column_list: batch-only helper columns (e.g. the CDC op
    flag) visible to ``delete_expr`` but never stored. ``erase`` is
    accepted for signature parity with ``scd2_apply`` but is a no-op
    here — SCD1 keeps no history, so close IS erasure."""
    cols = [c for c in current.columns if c not in set(except_cols)]
    is_del = F.expr(delete_expr) if delete_expr else F.lit(False)
    unioned = (
        current.select(*cols)
        .withColumn(_EXISTING, F.lit(1)).withColumn("__del", F.lit(False))
    ).unionByName(
        # __del computed BEFORE the projection so delete_expr may
        # reference batch-only columns (e.g. a CDC `op` column)
        batch.withColumn("__del", F.coalesce(is_del, F.lit(False)))
        .select(*cols, "__del")
        .withColumn(_EXISTING, F.lit(0))
    )
    w = Window.partitionBy(*keys).orderBy(F.col(seq).desc(), F.col(_EXISTING).asc())
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .filter(~F.col("__del"))
        .select(*cols)
    )


def scd2_apply(
    target: DataFrame | None,
    batch: DataFrame,
    keys: Sequence[str],
    seq: str,
    track_history_except: Sequence[str] = (),
    delete_expr: str | None = None,
    except_cols: Sequence[str] = (),
    erase: bool = False,
) -> DataFrame:
    """Apply a change batch to an SCD2 history table; returns the new
    full history (closed versions + re-derived open/chained versions).

    ``target`` carries ``__START_AT``/``__END_AT``; None means first load.

    ``track_history_except`` ≙ DLT's ``track_history_except_column_list``
    (create_auto_cdc_flow signature, reference DimUser.py:20-29): changes
    confined to those columns do NOT open a new version (suppressed like
    no-ops; the current version keeps its recorded values).

    ``delete_expr`` ≙ DLT's ``apply_as_deletes``: batch rows satisfying
    the predicate close the key's open version at their sequence without
    opening a new one (history retained; later changes re-open the key).
    A delete whose sequence TIES the open version still closes it (the
    change-feed case: silver ``delete_where`` removes a row without
    bumping its cdc column, so the delete event arrives at the row's own
    sequence — version order, not the tied value, says it is later); a
    delete strictly below the watermark stays stale-dropped.

    ``except_cols`` ≙ DLT's except_column_list: batch-only helper
    columns (the CDC op flag) visible to ``delete_expr``, never stored.

    ``erase=True`` is the GDPR mode: a key whose delete WINS the
    sequencing (ties with the open version included, same rule as
    close) has its ENTIRE history removed — close is not erasure. A
    delete that LOSES to a newer row-state is stale-dropped like any
    other change: the drain path synthesizes delete rows from change
    feeds, where a merge collapsing duplicate silver rows emits
    old-sequence removals that are NOT logical deletes, and replay
    safety requires a replayed old batch never purge a key that was
    since re-created. A genuinely backdated erasure request should be
    applied as a curated batch whose delete carries a current sequence.
    """
    exc = set(except_cols)
    data_cols = [c for c in batch.columns if c not in exc]
    if target is not None:
        # LOUD on a batch missing target data columns (scd1_merge's
        # behavior): projecting history onto the batch's column set
        # would silently NULL the missing column for every rewritten
        # row, including untouched keys co-located in touched files.
        missing = [
            c for c in target.columns
            if c not in (START_AT, END_AT) and c not in data_cols
        ]
        if missing:
            raise ValueError(
                f"scd2_apply: batch is missing target column(s) {missing}; "
                "a CDC batch must carry every data column of the dimension "
                "(add them, or drop them from the table first)"
            )
    attr_cols = [c for c in data_cols if c not in keys and c != seq]
    tracked_cols = [c for c in attr_cols if c not in set(track_history_except)]
    seq_type = dict(batch.dtypes)[seq]

    batch = _dedup_key_seq(batch, keys, seq)
    is_del = F.expr(delete_expr) if delete_expr else F.lit(False)
    b = (
        batch.withColumn(_ORD, F.col(seq).cast(seq_type))
        .withColumn(_EXISTING, F.lit(0))
        .withColumn("__is_delete", F.coalesce(is_del, F.lit(False)))
        .drop(*exc)
        .withColumn(START_AT, F.col(seq))
    )

    if target is not None and START_AT in target.columns:
        hist = target.filter(F.col(END_AT).isNotNull())
        cur = (
            target.filter(F.col(END_AT).isNull())
            .select(*data_cols, START_AT)
            .withColumn(_ORD, F.col(START_AT).cast(seq_type))
            .withColumn(_EXISTING, F.lit(1))
            .withColumn("__is_delete", F.lit(False))
        )
        combined = cur.unionByName(b)
        # Closed-history high-water mark per key: after a DELETE closed
        # the key there is no open row, so the open-version guard alone
        # would let a replayed/late row (seq <= the delete's) resurrect
        # the deleted key with stale data. max(END_AT) over closed rows
        # is the last event sequence applied to the key.
        hist_hwm = hist.groupBy(*keys).agg(
            F.max(F.col(END_AT).cast(seq_type)).alias("__hist_ord")
        )
        combined = combined.join(hist_hwm, list(keys), "left")
    else:
        hist = None
        combined = b.withColumn("__hist_ord", F.lit(None).cast(seq_type))

    key_part = Window.partitionBy(*[F.col(k) for k in keys])
    # Drop batch rows at-or-before the key's high-water mark: the open
    # version's sequence, or — when a delete left no open row — the last
    # closed END_AT (greatest skips NULLs; NULL hwm = brand-new key).
    cur_ord = F.max(F.when(F.col(_EXISTING) == 1, F.col(_ORD))).over(key_part)
    hwm = F.greatest(cur_ord, F.col("__hist_ord"))
    live = (
        combined.withColumn("__hwm", hwm)
        .filter(
            (F.col(_EXISTING) == 1)
            | F.col("__hwm").isNull()
            | (F.col(_ORD) > F.col("__hwm"))
            # a delete TYING the open version's sequence still closes it
            # (version order says it came later); upserts stay strict-'>'
            # so replayed rows can never resurrect
            | (F.col("__is_delete") & (F.col(_ORD) >= F.col("__hwm")))
        )
        .drop("__hist_ord", "__hwm")
    )
    if erase and delete_expr:
        # GDPR scope = keys whose LAST surviving event is a delete —
        # computed post-stale-drop so a stale duplicate-collapse
        # removal can never purge a live key, and pre-suppression so
        # collapsed back-to-back deletes still count; a later re-insert
        # in the same batch legitimately re-creates the key (no purge).
        w_last = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
            F.col(_ORD).desc(), F.col(_EXISTING).asc()
        )
        erased = F.broadcast(
            live.withColumn("__rn", F.row_number().over(w_last))
            .filter((F.col("__rn") == 1) & F.col("__is_delete"))
            .select(*keys)
            .distinct()
        )
    else:
        erased = None

    # No-op suppression on TRACKED attrs only; the delete flag is part of
    # the identity so a change after a delete always re-opens, and
    # back-to-back deletes collapse to one. Sequence ties order the
    # existing open row FIRST (desc on the flag) so a same-sequence
    # delete closes it rather than racing it.
    w_seq = key_part.orderBy(F.col(_ORD).asc(), F.col(_EXISTING).desc())
    attrs = F.struct(
        *[F.col(c) for c in tracked_cols], F.col("__is_delete")
    )
    live = (
        live.withColumn("__prev_attrs", F.lag(attrs).over(w_seq))
        .filter(
            # null-safe: no predecessor (lag NULL) never equals attrs
            (F.col(_EXISTING) == 1) | ~F.col("__prev_attrs").eqNullSafe(attrs)
        )
        .drop("__prev_attrs")
    )

    # Chain validity intervals: END_AT = next change's sequence (NULL =
    # open). Delete rows close their predecessor via lead(), then vanish.
    w_seq2 = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(_ORD).asc(), F.col(_EXISTING).desc()
    )
    versions = (
        live.withColumn(END_AT, F.lead(F.col(seq)).over(w_seq2))
        .filter(~F.col("__is_delete"))
        .select(*data_cols, START_AT, END_AT)
    )
    if hist is not None:
        versions = hist.select(*data_cols, START_AT, END_AT).unionByName(versions)
    if erased is not None:
        # GDPR: purge the key's whole history, closed versions included
        versions = versions.join(erased, list(keys), "left_anti")
    return versions


def apply_changes(
    table: ManagedTable,
    batch: DataFrame,
    keys: Sequence[str],
    sequence_by: str,
    scd_type: int = 2,
    track_history_except: Sequence[str] = (),
    delete_expr: str | None = None,
    except_columns: Sequence[str] = (),
    delete_mode: str = "close",
    key_bounds=None,
) -> None:
    """≙ dlt.create_auto_cdc_flow: merge ``batch`` into ``table``.

    Pure-transform + atomic snapshot swap; callable directly on a batch
    DataFrame or from ``foreachBatch`` on a stream. Optional
    ``track_history_except`` (≙ track_history_except_column_list),
    ``delete_expr`` (≙ apply_as_deletes) and ``except_columns``
    (≙ except_column_list: helper columns visible to ``delete_expr``
    but never stored) mirror the DLT signature.

    ``delete_mode``: ``"close"`` (default, DLT apply_as_deletes — SCD2
    closes the open version, history retained; SCD1 removes the row by
    last-write-wins) or ``"erase"`` (GDPR right-to-be-forgotten: the
    key's ENTIRE history is purged, ignoring sequence ordering — a
    stale-stamped erasure request still erases).

    ``key_bounds`` (r14): optional raw ``{key: (min, max)}`` the caller
    already aggregated over ``batch`` — forwarded to ``merge_keyed`` so
    file-prune discovery skips its own bounds pass. Valid for the SCD1
    path too: ``_dedup_key_seq`` only drops duplicate rows, which
    cannot move a min or max.

    Sink path: ``ManagedTable.merge_keyed`` — both SCD merges are
    key-local (a key's outcome depends only on its own rows), so the
    sink rewrites ONLY the data files containing a batch key and
    hardlinks the rest, exactly like a file-pruned Delta MERGE. An
    incremental batch against a huge table no longer rewrites the
    table."""
    if delete_mode not in ("close", "erase"):
        raise ValueError(
            f"unsupported delete_mode {delete_mode!r} (close | erase)"
        )
    erase = delete_mode == "erase"
    if scd_type == 1:
        dedup = _dedup_key_seq(batch, keys, sequence_by)
        table.merge_keyed(
            dedup,
            keys,
            lambda cur, b: scd1_merge(
                cur, b, keys, sequence_by, delete_expr,
                except_cols=except_columns, erase=erase,
            ),
            key_bounds=key_bounds,
        )
    elif scd_type == 2:
        table.merge_keyed(
            batch,
            keys,
            lambda cur, b: scd2_apply(
                cur if START_AT in cur.columns else None,
                b,
                keys,
                sequence_by,
                track_history_except,
                delete_expr,
                except_cols=except_columns,
                erase=erase,
            ),
            key_bounds=key_bounds,
        )
    else:
        raise ValueError(f"unsupported scd_type {scd_type}")
