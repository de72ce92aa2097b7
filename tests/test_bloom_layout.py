"""Bloom-prefilter joins, Z-order layout, and int8 quantization.

Correctness contracts:
 - bloom_semi_join ≡ plain exact left_semi (no false negatives; false
   positives removed by the confirm join) — on data engineered so the
   bloom actually drops most of the big side.
 - zorder_key is the textbook Morton interleave (checked against a
   pure-Python bit-interleave) and write_zordered files cover tight
   rectangles in BOTH dimensions.
 - quantize_int8 stays in [-127, 127], reconstructs within scale/2 per
   element, and is exact on the max-|v| element.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.bloomfilter import (
    BloomFilter,
    bloom_build,
    bloom_member,
    bloom_relation,
    bloom_semi_join,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import quantize_int8
from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import (
    write_zordered,
    zorder_key,
)


def test_bloom_no_false_negatives(spark):
    small = spark.createDataFrame([(f"key{i}",) for i in range(200)], "k: string")
    bloom = bloom_build(small, "k")
    rel = bloom_relation(spark, bloom)
    hits = (
        small.join(F.broadcast(rel))
        .where(bloom_member(F.col("k"), bloom, F.col("_bloom_words")))
        .count()
    )
    assert hits == 200  # every inserted key must test positive


def test_bloom_prefilter_drops_most_misses(spark):
    small = spark.createDataFrame([(f"key{i}",) for i in range(100)], "k: string")
    big = spark.range(20_000).select(F.concat(F.lit("other"), "id").alias("k"))
    bloom = bloom_build(small, "k")
    rel = bloom_relation(spark, bloom)
    survivors = (
        big.join(F.broadcast(rel))
        .where(bloom_member(F.col("k"), bloom, F.col("_bloom_words")))
        .count()
    )
    # 16 bits/item, k=4 → ~0.24% fp rate; allow 10x headroom.
    assert survivors < 20_000 * 0.025


def test_bloom_semi_join_equals_exact(spark):
    small = spark.createDataFrame(
        [(f"key{i}",) for i in range(0, 300, 3)], "k: string"
    )
    big = spark.range(5_000).select(
        F.concat(F.lit("key"), (F.col("id") % 1000).cast("string")).alias("k"),
        F.col("id").alias("payload"),
    )
    got = sorted(
        (r.k, r.payload) for r in bloom_semi_join(big, small, "k").collect()
    )
    want = sorted(
        (r.k, r.payload)
        for r in big.join(small.distinct(), "k", "left_semi").collect()
    )
    assert got == want and len(got) > 0


def test_bloom_build_bounds_small_side(spark):
    small = spark.range(100).select(F.col("id").cast("string").alias("k"))
    try:
        bloom_build(small, "k", max_items=10)
    except ValueError as e:
        assert "max_items" in str(e)
    else:
        raise AssertionError("expected ValueError for oversized small side")


def _py_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_bit_interleave(spark):
    rows = [(x, y) for x in (0, 1, 5, 17, 255, 1023) for y in (0, 2, 9, 512, 1023)]
    df = spark.createDataFrame(rows, "x: long, y: long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _py_morton(x, y, 10), (x, y)


def test_write_zordered_files_cover_tight_rectangles(spark, tmp_path):
    # A 64x64 grid: 4096 points. With 16 files, a Z-sorted layout keeps
    # every file inside a small sub-square; a y-ignorant layout would
    # give most files the full y-range.
    grid = (
        spark.range(4096)
        .select((F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y"))
    )
    path = str(tmp_path / "zordered")
    write_zordered(grid, path, "x", "y", bits=6, n_files=16)
    import glob

    spans = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        pdf = spark.read.parquet(f).agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")
        ).collect()[0]
        spans.append((pdf[1] - pdf[0] + 1, pdf[3] - pdf[2] + 1))
    assert len(spans) >= 8
    # Every file's bounding rectangle is far smaller than the 64x64
    # domain in BOTH dims (Z-order guarantee; a linear sort on x would
    # give y-span 64 for every file).
    assert all(sx <= 32 and sy <= 32 for sx, sy in spans), spans


def test_quantize_int8_reconstruction(spark):
    rows = [
        (1, [0.5, -1.0, 0.25, 0.125]),
        (2, [100.0, -50.0, 3.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector: guard, no NULL/NaN
    ]
    df = spark.createDataFrame(rows, "vec_id: int, embedding: array<float>")
    scale, q = quantize_int8(F.col("embedding"))
    out = df.select("vec_id", scale.alias("s"), q.alias("q"), "embedding").collect()
    for r in out:
        assert all(-127 <= v <= 127 for v in r.q), r
        maxabs = max(abs(v) for v in r.embedding)
        if maxabs > 0:
            # max-|v| element maps to ±127 exactly; all elements
            # reconstruct within half a quantization step.
            assert 127 in [abs(v) for v in r.q]
            for orig, qi in zip(r.embedding, r.q):
                assert abs(qi * r.s - orig) <= r.s / 2 + 1e-12
        else:
            assert r.q == [0, 0, 0, 0] and not math.isnan(r.s)


def test_bloom_words_are_signed64(spark):
    small = spark.createDataFrame([(str(i),) for i in range(3000)], "k: string")
    bloom = bloom_build(small, "k")
    assert isinstance(bloom, BloomFilter)
    assert all(-(1 << 63) <= w < (1 << 63) for w in bloom.words)
    assert bloom.m == 64 * len(bloom.words)


def test_zorder_key_high_bits_exact(spark):
    """Bit extraction must be exact INTEGER arithmetic: IEEE-double
    division rounds past 2^53, so a 1-column interleave with bits in
    54..62 silently corrupted Z-values under the old (c / 2^i) form
    (r10 advisor finding). Check against Python's arbitrary-precision
    ints at the int64 edge."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import zorder_key_n

    bits = 60
    vals = [0, 1, (1 << 53) + 1, (1 << 57) + 12345, (1 << 60) - 1]
    df = spark.createDataFrame([(v,) for v in vals], "x: long")
    got = {
        r["x"]: r["z"]
        for r in df.select(
            "x", zorder_key_n([F.col("x")], bits).alias("z")
        ).collect()
    }
    # n=1 interleave is the identity permutation of the low `bits` bits
    for v in vals:
        expect = sum(((v >> i) % 2) * (1 << i) for i in range(bits))
        assert got[v] == expect == v, (v, got[v])
