"""Count-min sketch as a DataFrame (Cormode & Muthukrishnan 2005).

The sketch is a (depth x width) counter grid: row i counts collisions of
``hash_i(key) % width``. Frequency estimate = min over rows — always an
OVERestimate (never under), off by at most ``eps * N`` with probability
``1 - delta`` for ``width = ceil(e/eps)``, ``depth = ceil(ln(1/delta))``.

Spark-first shape: the grid IS a DataFrame ``(depth, bucket, cnt)`` of
at most depth*width rows, built with one explode + one groupBy — state
is O(d*w) regardless of input size, the whole point of a sketch at
100 TB (an exact groupBy on a heavy-tailed key column shuffles the full
vocabulary; the sketch shuffles into a fixed-size grid). Sketches over
table shards MERGE by unioning the grids and re-summing — used by
``cms_merge`` — so per-partition/per-day sketches roll up without
touching raw data again.

Estimates are a pure function of the input MULTISET (xxhash64 is
deterministic, the grid sum is order/partitioning independent), so
results are reproducible across cluster layouts — asserted in tests.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_params(eps: float, delta: float) -> tuple[int, int]:
    """(depth, width) for an eps/delta guarantee."""
    return math.ceil(math.log(1.0 / delta)), math.ceil(math.e / eps)


def _bucket(key: Column, depth_idx: Column, width: int) -> Column:
    # xxhash64 seeded by the row index gives depth pairwise-independent
    # hash functions; pmod keeps the bucket non-negative.
    return F.pmod(F.xxhash64(key, depth_idx), F.lit(width))


def cms_build(
    df: DataFrame, key_col: str, eps: float = 0.005, delta: float = 0.01
) -> DataFrame:
    """Sketch the frequency distribution of ``key_col`` → grid
    ``(depth, bucket, cnt)``. One explode (xd) + one fixed-size groupBy."""
    depth, width = cms_params(eps, delta)
    rows = F.array(*[F.lit(i) for i in range(depth)])
    return (
        df.select(F.col(key_col).alias("_k"), F.explode(rows).alias("depth"))
        .select("depth", _bucket(F.col("_k"), F.col("depth"), width).alias("bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME (eps, delta): grids add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("depth", "bucket").agg(F.sum("cnt").alias("cnt"))


# ---------------------------------------------------------------------------
# Portable-hash variant: the SAME sketch computable by any engine
# ---------------------------------------------------------------------------
#
# xxhash64 pins the default sketch to Spark. The portable variant hashes
# keys with two Horner-fold polynomial hashes over character codes (mod
# two large primes) combined Kirsch–Mitzenmacher style:
#   bucket_i = (h1 + i * (1 + h2)) % width
# Every term is exact int64 arithmetic on code points, so DuckDB (or any
# SQL engine with string splitting + a list fold) reproduces the grid
# bit-for-bit — which upgrades the sketch from rows-only checking to a
# full hash-checked oracle (x05). Pairwise independence is weaker than
# seeded xxhash64; the eps*N overestimate bound still holds (CMS needs
# only that each row's hash spread collisions), asserted in tests.

_P1, _P2 = 1_000_000_007, 998_244_353


def _portable_hash(key: Column, mult: int, prime: int) -> Column:
    codes = F.transform(F.split(key, ""), lambda c: F.ascii(c).cast("bigint"))
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * mult + c) % prime,
    )


def portable_hash(key: Column, mult: int = 31, prime: int = _P1) -> Column:
    """Engine-portable Horner-fold string hash (exact int64 arithmetic
    over character codes mod a large prime) — the shared primitive
    behind every hash-checked sketch/dedup oracle twin (x05, d09, x06).
    ``sql_portable_hash`` is its DuckDB twin."""
    return _portable_hash(key, mult, prime)


def sql_portable_hash(key_sql: str, mult: int = 31, prime: int = _P1) -> str:
    """DuckDB twin of ``portable_hash`` (identical integer fold)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({key_sql}, ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"(a, c) -> (a * {mult} + c) % {prime})"
    )


def _portable_bucket(key: Column, depth_idx: Column, width: int) -> Column:
    h1 = _portable_hash(key, 31, _P1)
    h2 = _portable_hash(key, 131, _P2)
    return (h1 + depth_idx * (F.lit(1) + h2)) % F.lit(width)


def sql_portable_bucket(key_sql: str, depth_sql: str, width: int) -> str:
    """DuckDB twin of ``_portable_bucket`` (identical integer math)."""
    h1 = sql_portable_hash(key_sql, 31, _P1)
    h2 = sql_portable_hash(key_sql, 131, _P2)
    return f"(({h1} + ({depth_sql}) * (1 + {h2})) % {width})"


def cms_build_portable(
    df: DataFrame,
    key_col: str,
    depth: int,
    width: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``cms_build`` on the portable hash family; (depth, width) given
    directly so the oracle can embed the same constants.

    The character fold is the expensive half, so it runs once per
    DISTINCT key (pre-aggregate to (key, cnt), hash the vocabulary,
    weight the grid by cnt) and once total per key — h1/h2 are computed
    as columns before the depth explode instead of re-folding per depth
    row. Algebraically identical grid (sum of per-key counts), ~3·|keys
    per distinct| less hash work.

    ``group_cols`` builds one independent grid per group value in the
    SAME pass (output gains those columns) — a caller sketching many
    join candidates batches them through one shuffle instead of one
    plan subtree per candidate (r12, guide §2.3 'aggregate before you
    shuffle'). Empty tuple = the original single-grid behavior."""
    g = list(group_cols)
    rows = F.array(*[F.lit(i) for i in range(depth)])
    per_key = df.groupBy(*g, F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    hashed = per_key.select(
        *g,
        "_c",
        _portable_hash(F.col("_k"), 31, _P1).alias("_h1"),
        _portable_hash(F.col("_k"), 131, _P2).alias("_h2"),
    )
    return (
        hashed.select(*g, "_c", "_h1", "_h2", F.explode(rows).alias("depth"))
        .select(
            *g,
            "depth",
            ((F.col("_h1") + F.col("depth") * (F.lit(1) + F.col("_h2"))) % F.lit(width)).alias(
                "bucket"
            ),
            "_c",
        )
        .groupBy(*g, "depth", "bucket")
        .agg(F.sum("_c").alias("cnt"))
    )


def cms_estimate_portable(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int, width: int
) -> DataFrame:
    """``cms_estimate`` on the portable hash family."""
    rows = F.array(*[F.lit(i) for i in range(depth)])
    probes = keys.select(F.col(key_col), F.explode(rows).alias("depth")).select(
        key_col,
        "depth",
        _portable_bucket(F.col(key_col), F.col("depth"), width).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
        .select(key_col, "depth", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    eps: float = 0.005,
    delta: float = 0.01,
) -> DataFrame:
    """Point-frequency estimates for ``keys[key_col]`` → columns
    ``(key_col, est)``. est >= true count always; est <= true + eps*N
    w.p. 1-delta. The probe re-derives each key's depth buckets and
    joins the grid (broadcast — the grid is O(d*w) small by design)."""
    depth, width = cms_params(eps, delta)
    rows = F.array(*[F.lit(i) for i in range(depth)])
    probes = keys.select(F.col(key_col), F.explode(rows).alias("depth")).select(
        key_col, "depth", _bucket(F.col(key_col), F.col("depth"), width).alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
        # an empty bucket means the key was never seen: count 0
        .select(key_col, "depth", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (portable hash family — oracle-checkable end to end)
# ---------------------------------------------------------------------------
#
# The filter is a DataFrame of SET BIT POSITIONS (<= m rows), the
# mergeable/distributed representation: build is one explode+distinct,
# union of filters is a distinct over their bit tables, and a probe is
# an equi-join against a broadcast of the bits. Classic guarantee: no
# false negatives ever; false-positive rate ~ (1 - e^(-k·n/m))^k. On
# the portable hash family the whole build -> probe -> verdict path is
# exact integer math DuckDB replays bit-for-bit (x06).


def bloom_build(df: DataFrame, key_col: str, m_bits: int, k_hashes: int) -> DataFrame:
    """Set-bit table ``(bit)`` of a Bloom filter over the key column.
    Bit i of key = Kirsch–Mitzenmacher combination of the two portable
    Horner hashes, like the CMS grid."""
    rows = F.array(*[F.lit(i) for i in range(k_hashes)])
    return (
        df.select(F.col(key_col).alias("_k"))
        .distinct()
        .select("_k", F.explode(rows).alias("_i"))
        .select(_portable_bucket(F.col("_k"), F.col("_i"), m_bits).alias("bit"))
        .distinct()
    )


def bloom_probe(
    bits: DataFrame, probes: DataFrame, key_col: str, m_bits: int, k_hashes: int
) -> DataFrame:
    """``(key_col, claimed_member)`` for each probe key: member iff all
    k bit positions are set. The bit table is broadcast (<= m rows by
    construction), so the probe is a map-side join at any scale."""
    rows = F.array(*[F.lit(i) for i in range(k_hashes)])
    pos = probes.select(F.col(key_col)).distinct().select(
        key_col,
        F.explode(rows).alias("_i"),
    ).select(
        key_col, _portable_bucket(F.col(key_col), F.col("_i"), m_bits).alias("bit")
    )
    return (
        pos.join(F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left")
        .groupBy(key_col)
        .agg((F.count(F.col("_set")) == F.lit(k_hashes)).alias("claimed_member"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog (portable hash family — oracle-checkable end to end)
# ---------------------------------------------------------------------------
#
# x03 uses Spark's real Datasketches HLL (the production estimator, with
# proper 64-bit hashing); its binary sketch layout is engine-specific,
# so it carries a rows-only driver check. This variant rebuilds the HLL
# register grid on the portable hash family so DuckDB replays the whole
# build -> merge -> estimate path bit-for-bit (the x05/x06 trick applied
# to distinct counting). Register index = h1 mod m; the rank is the
# leading-zero count of h2 folded into HLL_K bits, computed via the
# length of the minimal binary string (identical `bin()` semantics in
# Spark and DuckDB). The harmonic denominator Sum(2^-rho) is kept as the
# EXACT integer Sum(2^(K+1-rho)) (every term and the total fit a
# bigint), so the only floating-point step is one literal/bigint
# division both engines perform on identical IEEE doubles.

HLL_P = 8  # m = 256 registers: stderr ~ 1.04/sqrt(256) = 6.5%
HLL_M = 1 << HLL_P
HLL_K = 20  # rank domain bits; rho in [1, K+1]
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# full numerator of the raw estimate: alpha * m^2 * 2^(K+1), one literal
HLL_EST_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_K + 1))


def hll_registers_portable(df: DataFrame, key_col: str, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Portable-hash HLL register maxima over ``key_col``: one row per
    (group, reg) with reg in [0, HLL_M) and rho in [1, HLL_K+1].
    Duplicate keys are absorbed by the max — no pre-dedup pass. Register
    rows are the mergeable state: max-combine register frames from
    shards/epochs and re-estimate without rescanning."""
    h1 = _portable_hash(F.col(key_col), 31, _P1)
    h2 = _portable_hash(F.col(key_col), 131, _P2)
    w = h2 % F.lit(1 << HLL_K)
    rho = F.when(w > 0, F.lit(HLL_K + 1) - F.length(F.bin(w))).otherwise(
        F.lit(HLL_K + 1)
    )
    return (
        df.select(*group_cols, (h1 % HLL_M).alias("reg"), rho.alias("_rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("_rho").alias("rho"))
    )


def hll_estimate_portable(registers: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Raw HLL estimate per group from register rows: exact-integer
    harmonic numerator, then alpha*m^2*2^(K+1) / S as the single
    floating-point step (``raw_est``; no small-range linear-counting
    branch — ln() is libm-dependent and would break oracle portability,
    and x03 remains the production estimator)."""
    scale = 1 << (HLL_K + 1)
    per = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_nset"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {HLL_K + 1} - rho)")
        ).alias("_s_set"),
    )
    s_total = (
        F.col("_s_set") + (F.lit(HLL_M) - F.col("_nset")) * F.lit(scale)
    ).cast("bigint")
    return per.select(
        *group_cols,
        F.col("_nset").cast("long").alias("regs_set"),
        s_total.alias("harmonic_num"),
        (F.lit(HLL_EST_NUM) / s_total).alias("raw_est"),
    )


# ---------------------------------------------------------------------------
# Equi-width histogram quantile sketch (the x08 core, shared with the
# streaming twin — both fold the same bins and pick quantiles the same way)
# ---------------------------------------------------------------------------


def histogram_bins(
    values: DataFrame, value_col: str, mn: float, width: float, nbins: int
) -> DataFrame:
    """Per-bin counts ``(bin, cnt)`` of ``value_col`` against FIXED edges
    ``mn + i*width``: floor((x - mn)/width) clamped into [0, nbins-1].
    With fixed edges the histogram is a mergeable sketch — partials from
    shards/micro-batches add up to the whole (used by the streaming
    twin; the batch x08 derives the edges from one min/max aggregate)."""
    b = F.floor((F.col(value_col).cast("double") - F.lit(float(mn))) / F.lit(float(width)))
    return (
        values.select(
            F.least(F.greatest(b, F.lit(0)), F.lit(nbins - 1)).cast("bigint").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantiles_from_histogram(hist: DataFrame, w: DataFrame, qs: tuple[float, ...]) -> DataFrame:
    """Quantile estimates from an equi-width histogram.

    ``hist``: ``(bin, cnt)`` counts; ``w``: ONE row ``(mn, width, n)``
    (bin edges + total count). For each q the estimate is the upper edge
    of the smallest bin whose cumulative count reaches ceil(q*n) —
    error bounded by one bin width. The cumulative window runs over the
    aggregated histogram (<= nbins rows), never raw data; output:
    ``(q, bin, cum_count, est_value)``. Shared by the batch x08 query
    and the streaming histogram store so batch/stream parity holds by
    construction."""
    from pyspark.sql import Window as W

    from ..plans.money import fround

    cum = hist.select(
        "bin", F.sum("cnt").over(W.orderBy("bin")).cast("bigint").alias("cum_count")
    )
    spark = hist.sparkSession
    qdf = spark.range(1).select(
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    tgt = qdf.crossJoin(F.broadcast(w)).select(
        "q", F.ceil(F.col("q") * F.col("n")).cast("bigint").alias("target")
    )
    pick = (
        F.broadcast(tgt)
        .join(cum, F.col("cum_count") >= F.col("target"))
        .groupBy("q")
        .agg(F.min("bin").alias("bin"))
    )
    return (
        pick.join(cum, "bin")
        .crossJoin(F.broadcast(w))
        .select(
            "q",
            F.col("bin").cast("bigint").alias("bin"),
            "cum_count",
            fround(F.col("mn") + (F.col("bin") + 1) * F.col("width"), 4).alias(
                "est_value"
            ),
        )
    )


# ---------------------------------------------------------------------------
# KMV (K-minimum-values) distinct sketch (Bar-Yossef et al. 2002;
# Beyer et al. SIGMOD'07) — shared by the x09 batch query and the
# streaming KMV store. KMV is MERGEABLE: the K smallest of a union is
# the K smallest of the union of per-shard K-smallest sets, so
# per-batch sketches fold without touching raw data again.
# ---------------------------------------------------------------------------

KMV_P = 1_000_000_007
# order-scrambling affine map: the raw Horner fold hashes short tokens
# small (and short tokens are the cross-source common words), which
# would bias a K-MINIMUM estimator; the affine map mod P randomizes
# rank order (the same fix t28's priorities use)
KMV_MIX, KMV_ADD = 1_103_515_245, 12_345


def kmv_hash(col: Column) -> Column:
    """Rank-scrambled engine-portable hash for K-minimum sketches."""
    return (
        portable_hash(col, 31, KMV_P) * F.lit(KMV_MIX) + F.lit(KMV_ADD)
    ) % F.lit(KMV_P)


def kmv_sketch(hv: DataFrame, key_cols: list[str], k: int) -> DataFrame:
    """Keep the ``k`` smallest DISTINCT hash values per key group —
    the whole sketch state: k rows per group regardless of input."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*key_cols).orderBy("hv")
    return (
        hv.distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(*key_cols, "hv")
    )


def kmv_estimate(sk: DataFrame, key_cols: list[str], k: int) -> DataFrame:
    """(keys, n_sk, kth_hash, est_distinct): (k-1)·P/h_(k) when the
    sketch is full, else the exhaustive exact count (n < k means the
    sketch IS the distinct set)."""
    ag = sk.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sk"),
        F.max("hv").alias("kth_hash"),
    )
    est = F.when(F.col("n_sk") < k, F.col("n_sk").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(KMV_P)) / F.col("kth_hash").cast("double")
    )
    return ag.select(*key_cols, "n_sk", "kth_hash", est.alias("est_distinct"))


# ---------------------------------------------------------------------------
# Bottom-k row sample: a fixed-size mergeable UNIFORM sample of rows,
# the quantile-estimation counterpart of the KMV distinct sketch
# ---------------------------------------------------------------------------

BOTTOMK_M = 2147483647  # 2^31 - 1 (MINSTD modulus)
BOTTOMK_A = 48271  # MINSTD multiplier; (key % M) * A < 2^47 fits int64


def bottomk_hash(key: Column) -> Column:
    """Deterministic int64 scramble of a unique integer row key (MINSTD
    step). Uniform-ish over [0, M); good enough for sampling, and —
    unlike xxhash64 — exact-integer reproducible by any engine."""
    return ((key.cast("bigint") % BOTTOMK_M) * BOTTOMK_A) % BOTTOMK_M


def bottomk_sample(
    df: DataFrame, group_col: str, key_col: str, value_col: str, k: int
) -> DataFrame:
    """Keep the ``k`` rows with the smallest scrambled row-key hash per
    group — a uniform k-row sample whose MERGE is exact: the bottom-k
    of a union equals the bottom-k of the union of per-shard bottom-k
    sets (same argument as KMV), so the sample is a fixed-size
    mergeable summary. Columns out: (group, hv, key, value, k) — k
    rides in the state so readers never guess it (the Misra-Gries
    lesson from round-8 ADVICE)."""
    from pyspark.sql import Window as W

    hv = df.select(
        F.col(group_col).alias("grp"),
        bottomk_hash(F.col(key_col)).alias("hv"),
        F.col(key_col).cast("bigint").alias("key"),
        F.col(value_col).cast("bigint").alias("val"),
    )
    w = W.partitionBy("grp").orderBy("hv", "key")
    return (
        hv.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("grp", "hv", "key", "val", F.lit(k).cast("int").alias("k"))
    )


def bottomk_quantiles(sample: DataFrame, pcts: tuple[int, ...] = (50, 90, 99)) -> DataFrame:
    """Exact type-1 quantile fences over each group's sampled values
    (the q93 integer ceil-division discipline on a <= k-row frame). k
    comes from the state rows, never a parameter that can drift from
    the writer's."""
    from pyspark.sql import Window as W

    wc = W.partitionBy("grp").orderBy("val", "key")
    wn = W.partitionBy("grp")
    cum = sample.select(
        "grp",
        "val",
        F.row_number().over(wc).alias("cum"),
        F.count(F.lit(1)).over(wn).alias("n"),
        F.max("k").over(wn).alias("k"),
    )
    aggs = [
        F.max("n").cast("bigint").alias("n_sample"),
        F.max("k").cast("int").alias("k"),
    ]
    for p in pcts:
        thr = F.expr(f"({p} * n + 99) div 100")
        aggs.append(
            F.min(F.when(F.col("cum") >= thr, F.col("val")))
            .cast("bigint")
            .alias(f"p{p}_est")
        )
    return cum.groupBy("grp").agg(*aggs)


# ---------------------------------------------------------------------------
# Priority sample (Duffield-Lund-Thorup): fixed-size WEIGHTED sample
# whose tau-threshold estimator is unbiased for any subset sum
# ---------------------------------------------------------------------------


def priority_of(key: Column, w: Column) -> Column:
    """Priority w/u with u = (MINSTD(key)+1)/M in (0,1] — deterministic,
    engine-portable 'randomness', identical IEEE division of exact
    int64 products (w*M must stay under 2^53)."""
    return (
        w.cast("double")
        * BOTTOMK_M
        / ((key.cast("bigint") % BOTTOMK_M) * BOTTOMK_A % BOTTOMK_M + 1)
    )


def priority_sample(
    df: DataFrame, group_col: str, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Keep the k+1 highest-priority rows per group — the whole sketch
    state. Carrying k+1 (not k) makes the summary MERGEABLE: the
    top-(k+1) of a union equals the top-(k+1) of the union of
    per-shard top-(k+1) sets, and row k+1 is exactly the tau the
    estimator needs. Columns out: (grp, key, w, p, k)."""
    from pyspark.sql import Window as W

    pri = df.select(
        F.col(group_col).alias("grp"),
        F.col(key_col).cast("bigint").alias("key"),
        F.col(weight_col).cast("bigint").alias("w"),
    ).withColumn("p", priority_of(F.col(key_col), F.col(weight_col)))
    wr = W.partitionBy("grp").orderBy(F.col("p").desc(), "key")
    return (
        pri.withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") <= k + 1)
        .select("grp", "key", "w", "p", F.lit(k).cast("int").alias("k"))
    )


def priority_estimate(sample: DataFrame) -> DataFrame:
    """Tau-threshold subset-sum estimate from a (merged) priority
    sample: tau = the (k+1)-th priority, estimate = sum over the top-k
    of max(w, tau), each term quantized to 1e-3 into DECIMAL(38,0)
    before the sum (tau carries w*M/h headroom past int64). k comes
    from the state rows."""
    from pyspark.sql import Window as W

    wr = W.partitionBy("grp").orderBy(F.col("p").desc(), "key")
    ranked = sample.withColumn("_rn", F.row_number().over(wr)).filter(
        F.col("_rn") <= F.col("k") + 1
    )
    tau = ranked.groupBy("grp").agg(
        F.max(F.when(F.col("_rn") == F.col("k") + 1, F.col("p"))).alias("t")
    )
    return (
        ranked.filter(F.col("_rn") <= F.col("k"))
        .join(F.broadcast(tau), "grp")
        .select(
            "grp",
            "k",
            F.floor(
                F.greatest(F.col("w").cast("double"), F.coalesce("t", F.lit(0.0)))
                * 1000.0
                + F.lit(0.5)
            )
            .cast("decimal(38,0)")
            .alias("tq"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sample"),
            F.max("k").cast("int").alias("k"),
            (F.sum("tq").cast("double") / 1000.0).alias("est_total"),
        )
    )


def broadcast_decision(
    build_rows, row_bytes: int = 128, threshold_bytes: int = 131072
):
    """Join-strategy pick from an (estimated or exact) build-side row
    count: 'broadcast' when rows x row_bytes fits under the threshold,
    'shuffle' otherwise — the same rule Spark's planner applies with
    table statistics (spark.sql.autoBroadcastJoinThreshold), exposed
    here so sketch-derived cardinalities (CMS join-size estimates, KMV
    distinct counts) can drive the pick BEFORE any statistics exist.
    ``build_rows`` is a Column; returns a string Column."""
    est_bytes = build_rows.cast("bigint") * F.lit(row_bytes)
    return F.when(est_bytes <= F.lit(threshold_bytes), F.lit("broadcast")).otherwise(
        F.lit("shuffle")
    )


def cms_steered_join(
    probe: DataFrame,
    build: DataFrame,
    on,
    key_col: str | None = None,
    grid: DataFrame | None = None,
    depth: int = 4,
    width: int = 1024,
    row_bytes: int = 128,
    threshold_bytes: int = 131072,
) -> DataFrame:
    """Inner equi-join whose PHYSICAL strategy is picked from sketch
    statistics at plan-build time — the step that makes x18's readout
    actually steer a plan (VERDICT r10 #4). The build side's exact row
    count is recovered from its CMS grid (every depth row of the grid
    sums to N, so one depth's bucket sum IS the count — no data scan
    beyond the sketch build) and fed through ``broadcast_decision``:
    under the threshold the join is planned as ``probe.join(
    F.broadcast(build))`` (BroadcastHashJoin), over it as a plain
    shuffle join (SortMergeJoin under AQE/planner defaults when the
    auto-broadcast threshold doesn't fire).

    ``grid`` lets a caller hand in a PRE-BUILT mergeable grid — e.g.
    the streaming CMS pair state (``read_cms_pair_state``) built where
    the data lives — in which case the decision costs one driver
    action over a depth x width sketch, never a scan of ``build``.
    That is the 100 TB shape: sketches ride along with ingest, the
    planner consults KB of state before any table statistics exist.
    The single collected row is bounded state (one bigint), the same
    discipline as the kmeans centroid collects."""
    df, _ = cms_steered_join_with_strategy(
        probe, build, on, key_col, grid, depth, width, row_bytes, threshold_bytes
    )
    return df


def cms_grid_counts(grids: DataFrame, group_col: str = "pair") -> dict:
    """Recover every group's build-side row count from ONE grouped CMS
    grid frame with a single driver action: each depth row of a grid
    sums to N, so depth 0's bucket sum per group IS that group's exact
    count. Bounded state — one bigint per group (r12: lets the x22
    audit replace one sketch job + collect per candidate pair with one
    batched action; the same discipline as ``cms_steered_join``'s
    single collected row)."""
    return {
        r[group_col]: r["n"]
        for r in grids.filter(F.col("depth") == 0)
        .groupBy(group_col)
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n"))
        .collect()
    }


def cms_steered_join_with_strategy(
    probe: DataFrame,
    build: DataFrame,
    on,
    key_col: str | None = None,
    grid: DataFrame | None = None,
    depth: int = 4,
    width: int = 1024,
    row_bytes: int = 128,
    threshold_bytes: int = 131072,
    build_rows: int | None = None,
) -> tuple[DataFrame, str]:
    """``cms_steered_join`` returning ``(joined, strategy)`` so a
    caller (the x22 audit query) can report WHICH physical strategy the
    sketch picked alongside the join's result.

    ``build_rows`` lets a caller hand in an ALREADY-RECOVERED build
    count (e.g. x22 recovers all five candidate pairs' counts from one
    grouped grid build with a single driver action — r12, guide §2.3):
    the decision arithmetic is unchanged, the per-call sketch job and
    collect are skipped."""
    if build_rows is not None:
        n_build = int(build_rows)
    else:
        if grid is None:
            if key_col is None:
                key_col = on if isinstance(on, str) else list(on)[0]
            grid = cms_build_portable(
                build.select(F.col(key_col).cast("string").alias("k")), "k", depth, width
            )
        n_build = (
            grid.filter(F.col("depth") == 0)
            .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n"))
            .collect()[0]["n"]
        )
    if n_build * row_bytes <= threshold_bytes:
        return probe.join(F.broadcast(build), on), "broadcast"
    return probe.join(build, on), "shuffle"
