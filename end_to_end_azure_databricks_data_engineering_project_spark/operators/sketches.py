"""Frequency sketches for corpus statistics: count-min.

Why a sketch when exact group-by works: at 100 TB the exact token-count
relation is Heaps-law-sized (fine), but SHIPPING it to every consumer
is not — a count-min sketch is a fixed (depth × width) table
(depth·width rows, thousands, broadcastable) that answers point
frequency queries with one-sided error: est ≥ exact always,
est ≤ exact + εN with probability 1−δ for width = ⌈e/ε⌉,
depth = ⌈ln 1/δ⌉ (Cormode & Muthukrishnan, J.Alg 2005).

Hashes are the engine's portable md5 scheme (functions/scalars.
portable_hash64), so the whole sketch — build and probe — is
bit-replayable in any SQL engine: the catalog oracle rebuilds the
identical sketch in DuckDB and gets the identical estimates.

Scale shape: the build explodes each key row ×depth (map-side), then
ONE hash aggregation onto (depth, bucket) — partial aggregation caps
per-partition state at depth·width counters, so shuffle volume is
bounded by partitions·depth·width regardless of corpus size. Probes
broadcast the (small) key set against the (small) sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.functions.scalars import (
    portable_hash64,
)


def _bucket(key, d: int, width: int):
    """Row d's bucket for a key: portable md5 hash of 'cms{d}|{key}'."""
    return portable_hash64(F.concat(F.lit(f"cms{d}|"), key)) % width


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch of the ``key_col`` stream → (d, b, cnt) rows
    (at most depth·width of them; absent (d, b) cells are zero)."""
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(key, d, width).alias("b"))
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``keys`` (any other columns ride
    along): min over the depth rows of each key's bucket counts.
    Returns the input columns + ``est_n``. The key set and the sketch
    are both small — the probe is a broadcast equi-join, the corpus is
    never touched."""
    for reserved in ("d", "b", "cnt", "__cms_rid"):
        if reserved in keys.columns:
            raise ValueError(
                f"cms_estimate: keys must not carry a column named "
                f"{reserved!r} (clashes with the sketch join internals)"
            )
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(key, d, width).alias("b"))
            for d in range(depth)
        ]
    )
    # per-ROW tag so duplicate key rows stay distinct through the
    # group-back (groupBy on the key columns alone would collapse them,
    # breaking the 'returns the input columns' row-for-row contract);
    # the tag is internal only — values never surface.
    tagged = keys.withColumn("__cms_rid", F.monotonically_increasing_id())
    probes = (
        tagged.select("*", F.explode(cells).alias("c"))
        .select("*", F.col("c.d").alias("d"), F.col("c.b").alias("b"))
        .drop("c")
    )
    joined = probes.join(F.broadcast(sketch), ["d", "b"], "left")
    return (
        joined.groupBy("__cms_rid", *keys.columns)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_n"))
        .drop("__cms_rid")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with the SAME (depth, width,
    hash family): cell-wise sum. CMS is a linear sketch, so
    merge(sketch(A), sketch(B)) == sketch(A ⊎ B) exactly — the property
    that makes per-partition / per-day sketches maintainable
    incrementally (build on each micro-batch, merge into the running
    summary; never re-scan history)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "b").agg(F.sum("cnt").alias("cnt"))


# ---------------------------------------------------------------------
# HyperLogLog (Flajolet et al., AofA 2007): mergeable distinct-count
# registers. Exact distinct of a high-cardinality key at 100 TB is one
# full shuffle of every distinct value; the HLL summary is m registers
# (m=256 → ~6.5% std error) that (a) build with ONE map-side-combinable
# aggregation whose shuffle volume is ≤ partitions·m rows, and (b)
# merge across shards/days by register-wise MAX — max is idempotent and
# commutative, so merge(hll(A), hll(B)) == hll(A ∪ B) EXACTLY, the
# property that makes per-day register tables maintainable without
# re-scanning history.
#
# Portability: registers derive from the engine's md5 scheme
# (portable_hash64 → 60-bit value; the low log2(m) bits pick the
# register, the remaining 60 - log2(m) bits give rho = leading-zero
# count + 1 via lpad(bin(w)) + strpos — every step replays
# bit-identically in DuckDB, verified primitive-by-primitive). The raw estimate α·m²/Σ2^−M uses
# only exact powers of two (shiftleft, not pow) and a fixed fold order,
# so even the double-valued estimate is bit-identical cross-engine.
# ---------------------------------------------------------------------

#: the portable md5 hash is 60 bits; the register index consumes
#: log2(m) of them and rho is counted over the remaining 60 - log2(m).
_HLL_HASH_BITS = 60


def _hll_alpha(m: int) -> float:
    """The single home for m validation + the alpha_m bias constant
    (Flajolet et al. 2007): tabulated values for m = 16/32/64, the
    closed-form asymptote for m >= 128. Every HLL entry point funnels
    through this so the global and grouped estimators can never
    drift."""
    assert m & (m - 1) == 0 and 16 <= m <= 256, (
        "m must be a power of two in [16, 256] (alpha_m is tabulated "
        "down to 16; smaller register counts have no standard bias term)"
    )
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_idx_rho(key, m: int = 256):
    """(register index, rho) column pair for a key expression — the
    per-row map-side part of the HLL build. The rho window is the
    60-bit hash minus the log2(m) index bits, so any power-of-two m
    ≤ 256 counts leading zeros over the correct width."""
    _hll_alpha(m)  # validates m
    bits = m.bit_length() - 1
    w_bits = _HLL_HASH_BITS - bits
    h = portable_hash64(key.cast("string"))
    idx = h.bitwiseAND(F.lit(m - 1))
    w = F.shiftrightunsigned(h, bits)
    pos = F.instr(F.lpad(F.bin(w), w_bits, "0"), "1")
    rho = F.when(pos == 0, F.lit(w_bits + 1)).otherwise(pos)
    return idx, rho


def hll_registers(df: DataFrame, key_col: str, m: int = 256) -> DataFrame:
    """HLL registers of ``key_col``: (idx, reg) rows, at most m of them
    (absent idx ≡ register 0). m must be a power of two ≤ 256.

    NULL keys are excluded, matching COUNT(DISTINCT) semantics — a
    NULL would otherwise hash to a (NULL, NULL) register row that
    poisons the estimate fold."""
    idx, rho = hll_idx_rho(F.col(key_col), m)
    return (
        df.where(F.col(key_col).isNotNull())
        .select(idx.alias("idx"), rho.alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").alias("reg"))
    )


def hll_registers_by(
    df: DataFrame, group_col: str, key_col: str, m: int = 256
) -> DataFrame:
    """Per-group HLL registers: (<group_col>, idx, reg) — at most m rows
    per group. One map-side-combinable aggregation; the shuffle carries
    ≤ partitions·groups·m rows regardless of input size (the property
    that makes per-day/per-domain distinct sketches cheap at 100 TB)."""
    idx, rho = hll_idx_rho(F.col(key_col), m)
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.col(group_col), idx.alias("idx"), rho.alias("rho"))
        .groupBy(group_col, "idx")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate_by(
    registers: DataFrame, group_col: str, m: int = 256
) -> DataFrame:
    """One (<group_col>, used_registers, raw_estimate) row per group —
    the grouped twin of ``hll_estimate``, same raw-estimate-only,
    fixed-fold-order determinism contract."""
    alpha = _hll_alpha(m)
    term = F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), reg)").cast("double")
    agg = registers.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("used_registers"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("idx"), term.alias("t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("present_sum"),
    )
    denom = F.col("present_sum") + (F.lit(m) - F.col("used_registers")).cast("double")
    return agg.select(
        group_col,
        "used_registers",
        (F.lit(alpha * m * m) / denom).alias("raw_estimate"),
    )


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Register-wise max across HLL summaries built with the same m —
    exactly the registers the union stream would have produced."""
    out = registers[0]
    for r in registers[1:]:
        out = out.unionByName(r)
    return out.groupBy("idx").agg(F.max("reg").alias("reg"))


def hll_estimate(registers: DataFrame, m: int = 256) -> DataFrame:
    """Raw HLL distinct estimate α_m·m²/Σ_j 2^−M_j (no small/large-range
    correction — the corrections need ln(), which drifts a ulp across
    engines; the raw estimate is exact-double-deterministic). Absent
    registers contribute 2⁰ = 1 each. Returns one row
    (used_registers, raw_estimate)."""
    alpha = _hll_alpha(m)
    # 2^-reg as 1/shiftleft(1,reg): exact powers of two, no pow().
    # (F.shiftleft only takes a literal bit count — use the SQL form.)
    term = F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), reg)").cast("double")
    agg = registers.agg(
        F.count(F.lit(1)).alias("used_registers"),
        # fold in ascending idx order → identical summation order in any
        # engine that replays the same sorted fold
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("idx"), term.alias("t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("present_sum"),
    )
    denom = F.col("present_sum") + (F.lit(m) - F.col("used_registers")).cast("double")
    return agg.select(
        "used_registers",
        (F.lit(alpha * m * m) / denom).alias("raw_estimate"),
    )


# ---------------------------------------------------------------------------
# Level-sampling quantile sketch (KLL-style levels, deterministic)
# ---------------------------------------------------------------------------
#
# The adaptive-boundary refinement `quantile_hist_merge`'s fixed 64-bin
# histogram names: summary values ADAPT to the distribution instead of
# pre-carved domain bins, so heavy-tailed 100 TB columns keep resolution
# where the mass is. Structure follows KLL (Karnin, Lang, Liberty,
# FOCS'16): geometric levels, level-L items carry weight 2^L, capacity-
# bounded summary. One deliberate deviation: KLL promotes items by
# RANDOM pairwise compaction; here an item's level is the leading-zero
# count of its portable md5 (P[level >= L] = 2^-L), i.e. deterministic
# bottom-k-style level sampling (Gibbons & Matias, SIGMOD'98 lineage).
# What that trades: KLL's optimal O(1/eps) space becomes a uniform-
# sample bound — rank error <= eps*n w.p. 1-d for k = O(ln(1/d)/eps^2).
# What it buys (the properties this engine's sketch discipline
# requires): bit-determinism under any partitioning, EXACT mergeability
# (merge(sketch(A), sketch(B)) is row-identical to sketch(A UNION B) —
# KLL's random compaction cannot promise that), and full cross-engine
# SQL replay for the catalog oracle.
#
# Scale shape: build = one map-side level computation + one combinable
# <=61-row-per-partition level-count agg + one broadcast cap attach +
# one filter; the only data-sized shuffle is none at all. Retained rows
# <= k forever; estimates run a <=k-row window. Merge unions retained
# rows (<= #sketches * k) and recaps — constant work, never rescans.


def _lsq_level(key) -> "F.Column":
    """Deterministic level: leading zeros of the 60-bit portable hash,
    so P[level >= L] = 2^-L. Replayed in DuckDB as
    ``strpos(lpad(bin(h), 60, '0'), '1') - 1`` (60 when no '1')."""
    h = portable_hash64(key)
    pos = F.instr(F.lpad(F.bin(h), 60, "0"), "1")
    return F.when(pos == F.lit(0), F.lit(60)).otherwise(pos - 1).cast("int")


def _lsq_cap(rows: DataFrame, k: int) -> DataFrame:
    """One-row (cap, n_total) relation: cap is the smallest level L
    (over the FULL 0..61 domain, not just levels present in the data —
    a present-level min would overstate the weight exponent when a
    level is empty) such that the retained count |{level >= L}| is
    <= k; n_total falls out of the same cumulation (cnt_ge at level 0
    counts every row), so the build scans the data exactly twice
    (this <=61-row combinable agg + the retain filter)."""
    from pyspark.sql import Window

    spark = rows.sparkSession
    dom = spark.range(62).select(F.col("id").cast("int").alias("level"))
    per = rows.groupBy("level").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.col("level").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        dom.join(per, "level", "left")
        .select("level", F.coalesce("c", F.lit(0)).alias("c"))
        .withColumn("cnt_ge", F.sum("c").over(w))
    )
    # level 61 has cnt_ge = 0 <= k always, so min() never returns NULL
    return cum.agg(
        F.min(F.when(F.col("cnt_ge") <= F.lit(k), F.col("level"))).alias("cap"),
        F.max("cnt_ge").cast("bigint").alias("n_total"),
    )


def lsq_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 512,
    salt: str = "lsq|",
) -> DataFrame:
    """Build the sketch: retained rows ``(value, level, cap, n_total,
    k)`` — every row with level >= cap, where cap is the smallest level
    keeping <= k rows. cap / n_total / k are constants riding a one-row
    broadcast relation (house pattern: model state is never an
    expression tree). NULL values are excluded, matching SQL
    percentile semantics. ``k >= 64`` recommended: retained count
    concentrates in (k/2, k], and the eps*n rank-error bound needs
    k = O(ln(1/d)/eps^2) samples.

    Known representational assumption (r7 advisor): the (cap, n_total,
    k) metadata rides only the retained rows, so a sketch whose
    retained set is EMPTY while n_total > 0 would be indistinguishable
    from an empty-input sketch in ``lsq_merge`` (its n_total folds as
    0). Reaching that state requires > k rows ALL landing on level
    cap-1 with NONE above it; with independent hash levels
    (P[level >= L+1 | level >= L] = 1/2) that has probability
    2^-(k+1)-ish — < 1e-154 at the k=512 default — so it is accepted
    rather than paid for with a sentinel meta row on every sketch."""
    rows = (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.col(value_col).cast("bigint").alias("value"),
            _lsq_level(
                F.concat(F.lit(salt), F.col(id_col).cast("string"))
            ).alias("level"),
        )
    )
    meta = _lsq_cap(rows, k)
    return (
        rows.crossJoin(F.broadcast(meta))
        .where(F.col("level") >= F.col("cap"))
        .select("value", "level", "cap", "n_total", F.lit(k).alias("k"))
    )


def lsq_merge(*sketches: DataFrame) -> DataFrame:
    """Union retained rows and recap. Row-for-row IDENTICAL to building
    one sketch over the unioned inputs: every input cap is <= the
    union's cap (more rows can only push the cap up), so every row the
    union build would retain is present in some input sketch, and the
    recap (searched from max(input caps) upward — below that the union
    counts are truncated) lands on exactly the union build's cap. All
    inputs must share one k; a mismatch merges at max(k) (documented
    caller error)."""
    from pyspark.sql import Window

    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    rows = u.select("value", "level")
    # each input's (cap, n_total, k) constants ride its rows; recover
    # one row per input (NULL-safe for an empty-input sketch), then fold
    metas = sketches[0].agg(
        F.max("cap").alias("cap"),
        F.max("n_total").alias("n"),
        F.max("k").alias("k"),
    )
    for s in sketches[1:]:
        metas = metas.unionByName(
            s.agg(
                F.max("cap").alias("cap"),
                F.max("n_total").alias("n"),
                F.max("k").alias("k"),
            )
        )
    folded = metas.agg(
        F.coalesce(F.max("cap"), F.lit(0)).cast("int").alias("floor"),
        F.sum(F.coalesce(F.col("n"), F.lit(0))).cast("bigint").alias("n_total"),
        F.coalesce(F.max("k"), F.lit(0)).cast("int").alias("k"),
    )
    spark = rows.sparkSession
    dom = spark.range(62).select(F.col("id").cast("int").alias("level"))
    per = rows.groupBy("level").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.col("level").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        dom.join(per, "level", "left")
        .select("level", F.coalesce("c", F.lit(0)).alias("c"))
        .withColumn("cnt_ge", F.sum("c").over(w))
        .crossJoin(F.broadcast(folded))
        .where((F.col("level") >= F.col("floor")) & (F.col("cnt_ge") <= F.col("k")))
    )
    meta = cum.agg(
        F.min("level").alias("cap"),
        F.max("n_total").cast("bigint").alias("n_total"),
        F.max("k").cast("int").alias("k"),
    )
    return (
        rows.crossJoin(F.broadcast(meta))
        .where(F.col("level") >= F.col("cap"))
        .select("value", "level", "cap", "n_total", "k")
    )


def lsq_quantiles(sketch: DataFrame, pcts: tuple[int, ...] = (50, 90, 99)) -> DataFrame:
    """One-row quantile readout: for each integer percentile p, the
    smallest retained value whose retained-sample cumulative count
    reaches p% of the retained total (the classic sample quantile —
    NOT cum*2^cap vs n_total, which leaves top percentiles unreachable
    whenever the sample mass 2^cap*retained undershoots n). All-bigint
    arithmetic, bit-exact in any engine that replays the same cum
    ordering. Returns (n_total, cap, retained, est_p<p>...); estimates
    are NULL only for an empty sketch."""
    from pyspark.sql import Window

    byval = sketch.groupBy("value", "cap", "n_total").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = byval.withColumn("cum", F.sum("c").over(w)).withColumn(
        "tot", F.sum("c").over(w_all)
    )
    aggs = [
        F.coalesce(F.max("n_total"), F.lit(0)).cast("bigint").alias("n_total"),
        F.coalesce(F.max("cap"), F.lit(0)).cast("int").alias("cap"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("retained"),
    ]
    for p in pcts:
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.col("tot") * F.lit(p),
                    F.col("value"),
                )
            )
            .cast("bigint")
            .alias(f"est_p{p}")
        )
    return cum.agg(*aggs)
