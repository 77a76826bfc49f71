"""Deterministic distributed sketches.

The reference's index-stats job builds per-field HyperLogLog sketches
at ingest (warehouse/index-stats/.../StatsHyperLogMapper.java,
HyperLogFieldSummary) and merges them server-side.  Spark's native
``approx_count_distinct`` is the same idea (HLL++), but its sketch is
engine-private — no cross-engine oracle can check it, so the driver
gate can only do a rows-only check on that path.

``hll_estimate`` is a from-scratch HLL whose every step is exact
integer arithmetic on md5 bits, identical in Spark SQL and DuckDB SQL:

- hash     = md5(value): top 32 bits ``hi``, next 32 ``lo`` (both
             engines agree on md5 bit-for-bit);
- bucket   = top ``b`` bits of ``hi`` (m = 2^b registers);
- w        = the next 54 bits; rho = leading-zero count of w + 1 =
             55 - bitlen(w), where bitlen is the LENGTH OF THE BINARY
             STRING (Spark ``conv(w,10,2)`` ↔ DuckDB ``bin(w)`` — both
             render without leading zeros, so their lengths agree; no
             log2, whose FP rounding differs across engines near
             power-of-two boundaries; w = 0 renders "0" on both, so
             rho caps at wbits rather than wbits+1 — a spec choice
             applied identically on both sides);
- register = max(rho) per bucket — this groupBy IS the sketch merge:
             partial aggregation merges per-task sketches map-side,
             so a 100 TB scan ships at most m rows per task, and
             incremental ingest unions new data then re-maxes;
- sum      = Σ 2^(54-rho) held as a 64-bit INTEGER (scaled by 2^54, so
             the harmonic-mean denominator is exact — a double sum
             would be partition-order-dependent);
- estimate = alpha_m·m²·2^54 / sum, one double division from identical
             integers → bit-identical, then half-up-rounded.

The small-range LinearCounting correction (raw ≤ 2.5m and empty
registers exist → m·ln(m/zeros), Flajolet et al. '07) IS applied —
without it the raw estimate floors at ~0.72·m for tiny n.  Its ln()
runs on an identical double ratio on both engines and the result is
rounded to 2 decimals, so a sub-ulp libm difference cannot flip the
hash check except on a measure-zero boundary (the same acceptance
every rounded float aggregate in entries.py already makes).  The
large-range (2^32) correction is irrelevant at a 54-bit hash width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_POW54 = 1 << 54


def _melt(df: DataFrame, value_cols: list[str]) -> DataFrame:
    """(field, v) rows from the named columns, cast to string, nulls
    dropped — the shared per-field fan-out every sketch builds on (the
    struct array is the generator input, computed once per row).

    The input is projected to the named columns and spread across the
    cluster default parallelism FIRST: every sketch downstream of the
    melt is md5-per-row CPU work, and a small parquet table arrives as
    ONE split, serializing all of it onto one core (r11 measured: the
    CMS/HLL/KMV keys ran their whole hash pass single-task)."""
    from datawave_spark.util import spread
    pairs = F.array(*[
        F.struct(F.lit(f).alias("field"),
                 F.col(f).cast("string").alias("v"))
        for f in value_cols])
    return (spread(df.select(*value_cols), sized=True)
            .select(F.explode(pairs).alias("p"))
            .select("p.field", "p.v")
            .filter(F.col("v").isNotNull()))


def _cms_bucket(j: int, v, w: int):
    """CMS row-j bucket of value column ``v`` — exists exactly ONCE so
    sketch build and lookup cannot drift on salt format / prefix width
    / modulus (a drift would make lookups return silent collision
    garbage, not an error)."""
    return F.pmod(F.conv(F.substring(
        F.md5(F.concat(F.lit(f"cms{j}:"), v)), 1, 8),
        16, 10).cast("long"), F.lit(w))


def hll_constant(b: int) -> float:
    """alpha_m * m^2 * 2^54 as ONE Python float — embed this exact
    literal on both engine sides so the final division is the only FP
    op and is performed on identical operands."""
    m = 1 << b
    if b >= 7:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif b == 6:
        alpha = 0.709
    elif b == 5:
        alpha = 0.697
    else:
        alpha = 0.673
    return float(alpha * m * m * _POW54)


def _hll_core(frame: DataFrame, group_cols: list[str],
              b: int) -> DataFrame:
    """Shared md5-bit HLL over a frame with columns ``group_cols + [v]``
    (``v`` string, nulls already dropped) → one sketch row per group:
    (group..., sketch_sum, nonzero_buckets, estimate).  The register
    groupBy is the sketch merge — map-side partial max ships ≤ m rows
    per task per group."""
    m = 1 << b
    c = hll_constant(b)
    hi = F.conv(F.substring(F.md5("v"), 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(F.md5("v"), 9, 8), 16, 10).cast("long")
    w = ((hi.bitwiseAND(F.lit((1 << (32 - b)) - 1))
          * F.lit(1 << 30)) + F.shiftright(lo, 2)).alias("w")
    # window width: (32-b) remaining hi bits + 30 lo bits — 54 for the
    # b=8 the entries use; the constant below rescales for other b
    wbits = (32 - b) + 30
    bitlen = F.length(F.conv(F.col("w").cast("string"), 10, 2))
    rho = (F.lit(wbits + 1) - bitlen).alias("rho")
    hashed = frame.select(*group_cols,
                          F.shiftright(hi, 32 - b).alias("b"), w)
    regs = (hashed.select(*group_cols, "b", rho)
            .groupBy(*group_cols, "b").agg(F.max("rho").alias("mr")))
    scale = F.lit(1 << wbits).cast("long")
    term = F.pow(F.lit(2.0),
                 (F.lit(wbits) - F.least(F.col("mr"), F.lit(wbits)))
                 .cast("double")).cast("long")
    aggd = (regs.groupBy(*group_cols)
            .agg(F.sum(term).alias("present_sum"),
                 F.count(F.lit(1)).alias("present")))
    # constant rescaled to the actual window width
    c_w = c * (float(1 << wbits) / float(_POW54))
    total = (F.col("present_sum")
             + (F.lit(m) - F.col("present")) * scale)
    raw = F.lit(c_w) / total
    zeros = F.lit(m) - F.col("present")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)).otherwise(raw)
    est = F.floor(corrected * 100 + F.lit(0.5)) / 100
    return aggd.select(
        *group_cols, total.alias("sketch_sum"),
        F.col("present").cast("int").alias("nonzero_buckets"),
        est.alias("estimate"))


def hll_estimate(df: DataFrame, value_cols: list[str],
                 b: int = 8) -> DataFrame:
    """Per-field deterministic HLL: (field, sketch_sum, nonzero_buckets,
    estimate).  ``value_cols`` are melted to (field, value) rows first
    (the generator input is computed once per row), so one pass sketches
    every field — the index-stats job shape."""
    return _hll_core(_melt(df, value_cols), ["field"], b)


def hll_group_estimate(df: DataFrame, group_cols: list[str],
                       value_col: str, b: int = 8) -> DataFrame:
    """One deterministic HLL sketch PER GROUP — the facet table's
    (facet value → cardinality sketch) pair (reference ingest
    FacetHandler.java:52 stores a HyperLogLog next to each facet
    count).  Same md5-bit register math as :func:`hll_estimate`, so a
    DuckDB oracle replays it bit-for-bit; the register groupBy keys on
    (group..., bucket) — m rows per group after map-side combine, a
    facet-table-sized shuffle at any corpus size."""
    from datawave_spark.util import spread
    frame = spread(df.select(*group_cols,
                             F.col(value_col).cast("string").alias("v"))
                   .filter(F.col("v").isNotNull()), sized=True)
    return _hll_core(frame, group_cols, b)


def cms_sketch(df: DataFrame, value_col: str, w: int = 1024,
               d: int = 4) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan '05) as a DataFrame:
    (row j, bucket, cnt) — d·w cells regardless of input size.  Unlike
    Misra-Gries, CMS cell counts are SUMS, so the sketch is
    partitioning/order-invariant (deterministic across engines) and
    mergeable by cell-wise addition — build per-day sketches at ingest,
    add them for any date range.  Hashes are md5-salted per row so the
    DuckDB oracle replays cells bit-for-bit."""
    from datawave_spark.util import spread
    v = F.col(value_col).cast("string")
    rows = F.array(*[
        F.struct(F.lit(j).alias("j"), _cms_bucket(j, F.col("__v"),
                                                  w).alias("bucket"))
        for j in range(d)])
    # project to the value column and spread BEFORE the d md5s per row
    # — a one-split local scan would otherwise hash the whole table on
    # one core (r11; no-op on already-wide scans)
    return (spread(df.filter(v.isNotNull()).select(v.alias("__v")), sized=True)
            .select(F.explode(rows).alias("c"))
            .groupBy(F.col("c.j").alias("j"),
                     F.col("c.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_lookup(sketch: DataFrame, values: list[str], w: int = 1024,
               d: int = 4) -> DataFrame:
    """Point-query the sketch: est(v) = min over rows j of
    cell[j, h_j(v)] (0 when the cell is absent).  The probe set is a
    tiny literal frame joined against the d·w-row sketch — broadcast
    either way; never touches the raw data."""
    spark = sketch.sparkSession
    from datawave_spark.util import local_frame
    probes = local_frame(spark, [(x,) for x in values], "v string")
    cells = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 _cms_bucket(j, F.col("v"), w).alias("bucket"))
        for j in range(d)])
    keyed = probes.select("v", F.explode(cells).alias("c")) \
        .select("v", F.col("c.j").alias("j"),
                F.col("c.bucket").alias("bucket"))
    joined = keyed.join(sketch, ["j", "bucket"], "left") \
        .fillna({"cnt": 0})
    return joined.groupBy("v").agg(F.min("cnt").alias("est"))


def kmv_cardinality(df: DataFrame, value_cols: list[str],
                    k: int = 64) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct sketch: keep the k
    smallest 32-bit md5 hashes of the DISTINCT values; the kth smallest
    t estimates cardinality as (k-1)·2^32/t (Bar-Yossef et al. '02).
    Deterministic (mins of a fixed hash), mergeable (union = min-k of
    the combined bottom-k sets — supports set-operation estimates HLL
    registers cannot), and exact below k (fewer than k distinct hashes
    → report the count itself).  Output: (field, n_kept, threshold,
    estimate).

    Scale: the distinct dedups map-side via partial aggregation; the
    per-field bottom-k is TWO-PHASE (salted sub-partition rank, then a
    rank over the surviving n_salts·k rows) so no reducer ever sorts a
    whole field's distinct hashes, and only k rows per field survive
    to the result."""
    melted = _melt(df, value_cols)
    h = F.conv(F.substring(F.md5("v"), 1, 8), 16, 10).cast("long")
    # two-phase bottom-k: a single Window.partitionBy(field) would
    # funnel EVERY distinct hash of a field through one reducer (the
    # hot-key blowup this repo avoids everywhere else).  Phase 1 takes
    # the bottom-k within (field, hash-salt) sub-partitions — each
    # bounded and parallel; phase 2 re-ranks the surviving
    # n_salts*k rows per field.  min-of-mins is exact, so the result
    # is identical to the global sort.
    n_salts = 64
    distinct_h = melted.select("field", h.alias("h")).distinct()
    w1 = Window.partitionBy("field", "__s").orderBy("h")
    partial = (distinct_h
               .withColumn("__s", F.pmod(F.col("h"), F.lit(n_salts)))
               .withColumn("__rn", F.row_number().over(w1))
               .filter(F.col("__rn") <= k).drop("__rn"))
    w2 = Window.partitionBy("field").orderBy("h")
    botk = (partial.withColumn("__rn", F.row_number().over(w2))
            .filter(F.col("__rn") <= k))
    agg = botk.groupBy("field").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("threshold"))
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.floor(F.lit(float(k - 1)) * F.lit(float(1 << 32))
                / F.col("threshold") * 100 + F.lit(0.5)) / 100)
    return agg.select("field", "n_kept", "threshold",
                      est.alias("estimate"))
