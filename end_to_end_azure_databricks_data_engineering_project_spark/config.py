"""Table metadata records driving ingestion and CDC modeling.

Re-expresses the reference's per-table metadata list (the ADF ForEach
input, reference ``Docs/loop_input.json:1-33`` and the pipeline
parameters at ``Azure ADF/adf/pipeline/incremental_loop.json:322-358``)
plus the star-schema DDL (``Load sql scripts/initial_load.sql:7-53``)
as plain Python: a ``TableConfig`` per table with its declared Spark
schema, business key(s), CDC (high-watermark) column, and SCD type for
the gold layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass(frozen=True)
class TableConfig:
    """One ingestion/modeling unit (≙ one ``loop_input.json`` record)."""

    schema_name: str
    table: str
    cdc_col: str
    keys: tuple[str, ...]
    spark_schema: T.StructType
    scd_type: int = 2  # gold modeling: 2 = history dim, 1 = upsert fact
    from_date: str = ""  # backfill override of the stored watermark
    expectations: dict[str, str] = field(default_factory=dict)
    # hive-partition the SILVER table on these columns (creation-time
    # declaration, Delta semantics — the reference's bronze relies on
    # directory layout for pruning, readme.md:27; this makes the same
    # layout a first-class silver feature with listing-time pruning)
    partition_by: tuple[str, ...] = ()
    # gold handling when the silver change feed carries DELETES
    # (silver delete_where / merge removals): 'propagate' (DLT
    # apply_as_deletes — SCD2 closes the open version, SCD1 removes
    # the row), 'erase' (GDPR right-to-be-forgotten: the key's whole
    # SCD2 history is purged; close isn't erasure), or 'ignore'
    # (upsert-only, the pre-r12 behavior)
    on_delete: str = "propagate"

    @property
    def qualified_name(self) -> str:
        return f"{self.schema_name}.{self.table}"


def _struct(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# Star schema from reference `Load sql scripts/initial_load.sql:7-53`
# (INT→Integer, BIGINT→Long, VARCHAR→String, DATE→Date, DATETIME→Timestamp).
DIM_USER_SCHEMA = _struct(
    ("user_id", T.IntegerType()),
    ("user_name", T.StringType()),
    ("country", T.StringType()),
    ("subscription_type", T.StringType()),
    ("start_date", T.DateType()),
    ("end_date", T.DateType()),
    ("updated_at", T.TimestampType()),
)

DIM_ARTIST_SCHEMA = _struct(
    ("artist_id", T.IntegerType()),
    ("artist_name", T.StringType()),
    ("genre", T.StringType()),
    ("country", T.StringType()),
    ("updated_at", T.TimestampType()),
)

DIM_TRACK_SCHEMA = _struct(
    ("track_id", T.IntegerType()),
    ("track_name", T.StringType()),
    ("artist_id", T.IntegerType()),
    ("album_name", T.StringType()),
    ("duration_sec", T.IntegerType()),
    ("release_date", T.DateType()),
    ("updated_at", T.TimestampType()),
)

DIM_DATE_SCHEMA = _struct(
    ("date_key", T.IntegerType()),
    ("date", T.DateType()),
    ("day", T.IntegerType()),
    ("month", T.IntegerType()),
    ("year", T.IntegerType()),
    ("weekday", T.StringType()),
)

FACT_STREAM_SCHEMA = _struct(
    ("stream_id", T.LongType()),
    ("user_id", T.IntegerType()),
    ("track_id", T.IntegerType()),
    ("date_key", T.IntegerType()),
    ("listen_duration", T.IntegerType()),
    ("device_type", T.StringType()),
    ("stream_timestamp", T.TimestampType()),
)

# ≙ reference Docs/loop_input.json — the metadata-driven ingestion list,
# extended with keys/scd_type/expectations the gold layer needs
# (expectations ≙ dlt.expect_all_or_drop, reference DimUser.py:3-8).
TABLES: tuple[TableConfig, ...] = (
    TableConfig("source", "dim_user", "updated_at", ("user_id",), DIM_USER_SCHEMA,
                scd_type=2, expectations={"valid_key": "user_id IS NOT NULL"}),
    TableConfig("source", "dim_artist", "updated_at", ("artist_id",), DIM_ARTIST_SCHEMA,
                scd_type=2, expectations={"valid_key": "artist_id IS NOT NULL"}),
    TableConfig("source", "dim_track", "updated_at", ("track_id",), DIM_TRACK_SCHEMA,
                scd_type=2, expectations={"valid_key": "track_id IS NOT NULL"}),
    TableConfig("source", "dim_date", "date", ("date_key",), DIM_DATE_SCHEMA,
                scd_type=2, expectations={"valid_key": "date_key IS NOT NULL"}),
    TableConfig("source", "fact_stream", "stream_timestamp", ("stream_id",), FACT_STREAM_SCHEMA,
                scd_type=1, expectations={"valid_key": "stream_id IS NOT NULL"}),
)

TABLE_BY_NAME: dict[str, TableConfig] = {c.table: c for c in TABLES}
