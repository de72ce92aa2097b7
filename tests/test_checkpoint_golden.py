"""Checkpoint-parquet conformance (r11 verdict #7): pin the classic
Delta checkpoint's physical schema against a COMMITTED golden fixture.

The ``delta-spark`` import stays environment-blocked (offline build),
so the in-repo protocol reader is the only consumer that exercises the
checkpoint — and it is deliberately forgiving (``.get`` lookups). This
test is the strict half: a future engine change that drifts a field
name or type in the checkpoint (which a stock reader would reject)
fails HERE against the golden file instead of slipping through the
forgiving reader. Field shapes per the public protocol spec:
https://github.com/delta-io/delta/blob/master/PROTOCOL.md#checkpoints
(the ``add.dv`` list is this engine's documented deletion-vector
extension; everything else is stock).
"""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

GOLDEN = Path(__file__).parent / "fixtures" / "checkpoint_schema.golden.txt"


@pytest.fixture()
def table(spark, tmp_path):
    return Catalog(spark, tmp_path / "wh").table("t")


def test_checkpoint_schema_matches_golden(spark, table):
    import pyarrow.parquet as pq

    table.overwrite(
        spark.range(5).select(F.col("id").alias("k"), F.lit("v").alias("val")),
        enable_cdf=True,
    )
    table.append(
        spark.range(5, 8).select(F.col("id").alias("k"), F.lit("w").alias("val"))
    )
    p = table.write_delta_checkpoint()
    got = str(pq.read_schema(p)).strip()
    want = GOLDEN.read_text().strip()
    assert got == want, (
        "checkpoint parquet schema drifted from the committed golden "
        "fixture — if the change is INTENTIONAL (a protocol-conformant "
        "extension), regenerate tests/fixtures/checkpoint_schema.golden.txt "
        "and say why in the commit; otherwise a stock Delta reader would "
        f"reject this checkpoint.\nGOT:\n{got}\nWANT:\n{want}"
    )


def test_checkpoint_required_fields_present(spark, table):
    """Spot-check the protocol-mandated field NAMES independently of
    the full golden diff (a sharper error when something is missing)."""
    import pyarrow.parquet as pq

    table.overwrite(
        spark.range(3).select(F.col("id").alias("k"))
    )
    p = table.write_delta_checkpoint()
    schema = pq.read_schema(p)
    top = set(schema.names)
    assert {"protocol", "metaData", "add", "remove"} <= top
    add_fields = {f.name for f in schema.field("add").type}
    assert {
        "path", "partitionValues", "size", "modificationTime", "dataChange",
    } <= add_fields
    meta_fields = {f.name for f in schema.field("metaData").type}
    assert {
        "id", "format", "schemaString", "partitionColumns", "configuration",
    } <= meta_fields
    proto_fields = {f.name for f in schema.field("protocol").type}
    # readerFeatures/writerFeatures (r13): the table-features protocol
    # form the DV extension rides on — PROTOCOL.md checkpoint schema
    # carries them as optional list<string> columns
    assert {
        "minReaderVersion", "minWriterVersion",
        "readerFeatures", "writerFeatures",
    } == proto_fields
