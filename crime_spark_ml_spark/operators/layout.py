"""Z-order (morton) data layout for multi-dimensional scan pruning.

The 100 TB problem this solves: a parquet scan prunes row groups by
min/max statistics, but a table sorted by ONE column only has tight
stats on that column — a filter on any other dimension reads
everything. Interleaving the bits of two (or more) dimension keys into
a single morton code and range-sorting the write by it gives every row
group a tight bounding box in ALL interleaved dimensions, so a
multi-dimensional box query skips most of the file bytes. This is the
layout strategy behind Delta's OPTIMIZE ZORDER BY; here it is plain
Spark: uniform binning via ``width_bucket``, bit interleaving as a
fold of JVM bitwise expressions (whole-stage codegen, no UDF),
``repartitionByRange`` + ``sortWithinPartitions`` on the key, one
ordinary parquet write. Nothing depends on a table format.

``scan_output_rows`` measures the effect honestly: it executes a
filtered scan and reads the scan node's ``numOutputRows`` metric —
rows that survived row-group pruning — rather than trusting the plan
text. tests/test_layout.py asserts a 2-D box query on the z-ordered
layout scans strictly fewer rows than the same query on a
single-column-sorted layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def interleave_bits_n(cols: list[Column], bits: int) -> Column:
    """Morton-interleave the low ``bits`` bits of N non-negative
    integer columns, round-robin: column c's bit i lands at position
    ``i*N + (N-1-c)`` (earlier columns take the more-significant slot
    within each round, so for N=2 this is the classic a→2i+1, b→2i).
    Pure bitwise JVM expressions — N*bits shift/and/or terms, all
    inside whole-stage codegen; N*bits <= 63 keeps the key in a long."""
    n = len(cols)
    if n < 2:
        raise ValueError(f"need at least 2 columns, got {n}")
    if not 1 <= bits or n * bits > 63:
        raise ValueError(
            f"bits must be >= 1 with n_cols*bits <= 63, got {n} cols x {bits} bits"
        )
    key = F.lit(0).cast("long")
    for i in range(bits):
        for c, col in enumerate(cols):
            bit = F.shiftright(col.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + (n - 1 - c)))
    return key


def interleave_bits(a: Column, b: Column, bits: int) -> Column:
    """Two-column morton interleave (a's bit i lands at 2i+1, b's at
    2i) — the N=2 case of interleave_bits_n, kept as the common-path
    API. bits<=31 keeps the key in a long."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    return interleave_bits_n([a, b], bits)


def zorder_key(
    df: DataFrame,
    cols: tuple[str, ...],
    bits: int = 12,
    binning: str = "uniform",
) -> Column:
    """Morton key over two or more numeric columns, each binned into
    [0, 2^bits). (The production OPTIMIZE ZORDER BY shape takes any
    column count; each extra dimension dilutes per-dimension locality —
    2^bits bins each — so 2-4 columns is the useful range, same
    guidance as Delta's.)

    ``binning="uniform"``: equal-width bins between observed min/max
    (one bounded agg — four scalars reach the driver, never data).
    Right when the dimensions are roughly evenly spread.

    ``binning="quantile"``: equal-POPULATION bins from approxQuantile
    boundaries — the Delta OPTIMIZE ZORDER shape (range-partition ids).
    A skewed dimension under uniform binning collapses most rows into
    a few bins, so most row groups share the same bounding box and
    nothing prunes; quantile bins keep every bin ~equally full
    regardless of distribution. Costs one approxQuantile pass per
    column (boundaries are 2^bits-1 doubles driver-side) and caps bits
    at 8 — 256 bins/dim = 65k tiles, plenty, and bin assignment is a
    JVM filter-count over the literal boundary array (O(2^bits)
    comparisons per row, codegen-friendly, no UDF)."""
    if binning not in ("uniform", "quantile"):
        raise ValueError(f"binning must be 'uniform' or 'quantile', got {binning!r}")
    if len(cols) < 2:
        raise ValueError(f"need at least 2 columns, got {len(cols)}")
    if binning == "quantile":
        if bits > 8:
            raise ValueError(f"quantile binning caps bits at 8, got {bits}")
        nbins = 1 << bits
        probs = [i / nbins for i in range(1, nbins)]
        # ONE quantile pass for all dimensions (approxQuantile takes a
        # column list) — N separate calls would scan the input N times
        all_bounds = df.stat.approxQuantile(list(cols), probs, 0.001)

        def binned_q(c: str, raw_bounds: list[float]) -> Column:
            # dedupe: repeated values produce equal quantiles; equal
            # boundaries would double-count in the filter rank
            bounds = sorted(set(raw_bounds))
            arr = F.array(*[F.lit(float(b)) for b in bounds])
            return F.size(
                F.filter(arr, lambda b: b < F.col(c).cast("double"))
            ).cast("long")

        return interleave_bits_n(
            [binned_q(c, all_bounds[i]) for i, c in enumerate(cols)], bits
        )

    # one bounded agg for every dimension's min/max — 2*N scalars
    # reach the driver, never data
    stats = df.agg(
        *[f for c in cols for f in (F.min(c), F.max(c))]
    ).collect()[0]
    nbins = 1 << bits

    def binned(c: str, mn, mx) -> Column:
        if mn is None or mx is None or mx <= mn:
            return F.lit(0)
        # width_bucket returns 1..nbins+1 (nbins+1 for col == mx exactly)
        return F.least(
            F.lit(nbins - 1),
            F.width_bucket(
                F.col(c).cast("double"),
                F.lit(float(mn)),
                F.lit(float(mx)),
                F.lit(nbins),
            )
            - 1,
        )

    return interleave_bits_n(
        [binned(c, stats[2 * i], stats[2 * i + 1]) for i, c in enumerate(cols)],
        bits,
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    bits: int = 12,
    n_files: int = 8,
    row_group_bytes: int | None = None,
    binning: str = "uniform",
) -> None:
    """Write ``df`` z-ordered by ``cols``: range-partition on the
    morton key (each output file covers a contiguous key range, i.e. a
    bounding box), sort within partitions (tight row-group stats
    inside each file), drop the key before writing. At cluster scale
    ``n_files`` is the rewrite parallelism; ``row_group_bytes``
    shrinks parquet row groups for fine-grained skipping (default
    128 MiB is tuned for real files, far too coarse for test
    fixtures)."""
    keyed = df.withColumn("__zkey", zorder_key(df, cols, bits, binning))
    writer = (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
    )
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", row_group_bytes)
    writer.parquet(path)


def scan_output_rows(df: DataFrame) -> int:
    """Execute ``df`` and return the scan node's post-pruning row
    count (``numOutputRows`` summed over parquet scan leaves) — the
    rows actually decoded after row-group/file skipping, the honest
    measure of a layout's pruning power."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    if plan.nodeName().startswith("AdaptiveSparkPlan"):
        plan = plan.executedPlan()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if node.nodeName().startswith("Scan"):
            total += node.metrics().apply("numOutputRows").value()
    return total


def skipping_report(
    spark: SparkSession, path: str, predicate: str
) -> dict[str, int]:
    """Rows scanned vs rows matched for ``predicate`` over the parquet
    at ``path`` (scanned == matched would be perfect pruning)."""
    scanned = scan_output_rows(spark.read.parquet(path).filter(predicate))
    matched = spark.read.parquet(path).filter(predicate).count()
    total = spark.read.parquet(path).count()
    return {"rows_total": total, "rows_scanned": scanned, "rows_matched": matched}
