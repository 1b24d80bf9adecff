"""Product quantization (PQ) ANN — the compressed-codes scale path.

IVF (ml/ivf.py) prunes WHICH vectors a query scores; PQ shrinks WHAT
is stored and scored: each d-dim vector becomes ``m`` uint8-sized
codes (one per d/m-dim subspace, each quantized against its own
k-centroid codebook), so a 64-dim float corpus (256 B/row) becomes
m=8 codes (8 B/row) — a 100 TB embedding store fits hot in ~3 TB of
executor memory. Search is asymmetric distance computation (ADC,
Jégou et al., TPAMI 2011): per query, precompute an m×k lookup table
of exact subspace distances, then every corpus row scores with m
table lookups — no float math per candidate.

Spark mapping (everything DataFrame ops, no Python in the hot path):
- **train**: m seeded Lloyd's fits on a BOUNDED driver-side sample
  (numpy) — the codebook is m×k×(d/m) doubles, kilobytes; training
  it distributed would be pure scheduler overhead (the PCA-eigensolve
  split: Spark bounds the sample, the driver fits the tiny model).
- **encode**: a pure narrow map — per subspace, an argmin over k
  literal-array distances evaluated in codegen. Zero shuffles; the
  100 TB encode is scan → project → write.
- **search**: the query-side LUT is built the same way (tiny), then
  corpus_codes ⋈ broadcast(LUT) scores via a pure JVM zip_with/
  aggregate expression over the code array. The corpus never
  shuffles; per-query top-k is a partitioned window.

At 100 TB: encode once, store ``(id, codes)`` bucketed by id
(sources/writers.write_bucketed); combine with IVF cell assignment so
a probe scans nprobe/k of the code table with LUT scoring.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _fold_lit(value, schema: str) -> F.Column:
    """A complex-typed constant as ONE Catalyst node: ``from_json`` on
    a literal string is constant-folded at optimization time into a
    single Literal, so the plan carries O(1) nodes instead of an
    O(elements) CreateArray tree. Load-bearing at the r9 sqrt-n
    geometry: the per-cell literal trees made analysis + codegen the
    dominant build cost (measured 33.6 s planning for a 447×64
    centroid argmin vs 4.0 s folded; per-row evaluation is the same
    interpreted HOF fold either way). json round-trips binary64
    exactly (repr shortest-round-trip on the Python side, strtod on
    the JVM side), so distances are bit-identical to the unrolled
    form. Not for NaN/Inf payloads — quantizer models are finite by
    construction."""
    return F.from_json(F.lit(json.dumps(value)), schema)


@dataclass
class PqModel:
    codebooks: DataFrame  # sub int, code int, cvec array<double>
    m: int
    k: int
    sub_dim: int
    # (m, k, sub_dim) float64 codebook array, carried so hot paths
    # (encode UDF, driver-side LUTs) never re-collect the kilobyte
    # codebooks relation — a LOCAL-relation collect still costs a full
    # py4j/analysis round-trip (~0.4 s measured). None on models built
    # by hand; _codebook_np falls back to one collect then.
    cb_np: object = None


def _sq_l2(a: str, b: str) -> F.Column:
    """Sequential double-precision squared L2 distance (JVM-side)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


_MAX_TRAIN_ROWS = 200_000  # ~100 MB of float64 at dim 64
_SAMPLE_BUCKETS = 1_000_000  # hash-sampling granularity


def _collect_train_sample_info(
    df: DataFrame, col: str, fraction: float | None, seed: int
) -> tuple[list, bool]:
    """(rows, covers_all): `_collect_train_sample` plus a flag that is
    True only when the returned rows PROVABLY are the whole input (the
    under-cap limit-probe, or an explicit fraction that keeps every
    hash bucket). build_ivfpq uses the flag to derive the PQ residual
    training set driver-side instead of re-running the assignment
    subplan as a second corpus pass."""
    rows, covers_all = _collect_train_sample_impl(df, col, fraction, seed)
    return rows, covers_all


def _collect_train_sample(
    df: DataFrame, col: str, fraction: float | None, seed: int
) -> list:
    """Collect the single-column training sample, bounded at
    _MAX_TRAIN_ROWS whichever path is taken — the quantizer-training
    contract is 'works at any corpus size with bounded driver memory'.

    Sampling is HASH-based (keep iff xxhash64(value, seed) mod 1e6
    lands under the keep fraction), not ``DataFrame.sample``: the RDD
    sampler seeds per partition, so its sampled SET depends on split
    layout — the fitted centroids would differ between an 8-core and a
    32-core run of the same corpus. Content hashing is deterministic
    across layouts, engines, and runs (same property the md5 samplers
    in plans/datapipe rely on).

    An explicit ``fraction`` that still exceeds the cap fails loudly
    (a silent multi-GB collect would OOM the driver); with none given,
    the under-cap fast path is a single limit-probe job, and only an
    over-cap corpus pays the extra count to derive the auto fraction."""
    return _collect_train_sample_impl(df, col, fraction, seed)[0]


def _collect_train_sample_impl(
    df: DataFrame, col: str, fraction: float | None, seed: int
) -> tuple[list, bool]:
    if fraction is not None:
        if not 0.0 < fraction <= 1.0:
            raise ValueError(f"sample_fraction must be in (0, 1], got {fraction}")
        keep = max(1, int(_SAMPLE_BUCKETS * fraction))
        rows = (
            df.where(F.pmod(F.xxhash64(F.col(col), F.lit(seed)), _SAMPLE_BUCKETS) < keep)
            .limit(_MAX_TRAIN_ROWS + 1)
            .collect()
        )
        if len(rows) > _MAX_TRAIN_ROWS:
            raise ValueError(
                f"training sample exceeds {_MAX_TRAIN_ROWS} rows at "
                f"sample_fraction={fraction}; pass a smaller fraction"
            )
        # keep >= bucket count means the hash filter kept everything
        return rows, keep >= _SAMPLE_BUCKETS
    rows = df.limit(_MAX_TRAIN_ROWS + 1).collect()
    if len(rows) <= _MAX_TRAIN_ROWS:
        return rows, True  # limit-probe returned the whole input
    n = df.count()
    keep = max(1, int(_SAMPLE_BUCKETS * (_MAX_TRAIN_ROWS / n) * 0.95))
    # if the 0.95-headroom hash sample still overshoots the cap, keep
    # the cap-many SMALLEST full hashes (TakeOrderedAndProject — the
    # driver never holds more than the cap): content-determined, so the
    # truncated set is layout-independent like the filter itself. Ties
    # need a full 64-bit collision, i.e. (in practice) equal vectors —
    # interchangeable under the caller's sort-before-fit.
    h = F.xxhash64(F.col(col), F.lit(seed))
    return (
        df.where(F.pmod(h, _SAMPLE_BUCKETS) < keep)
        .orderBy(h)
        .limit(_MAX_TRAIN_ROWS)
        .collect()
    ), False


def _chunked_argmin(X, C, chunk: int = 8192):
    """Nearest-center index per row via explicit diff-square distances,
    processed in row blocks so peak memory is O(chunk·k·d) instead of
    O(n·k·d) (~1.6 GB at the 200k-row cap). Same arithmetic per
    element as the unchunked form — assignments are bit-identical."""
    import numpy as np

    out = np.empty(len(X), dtype=np.int64)
    for s in range(0, len(X), chunk):
        blk = X[s : s + chunk]
        out[s : s + chunk] = ((blk[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    return out


def _lloyd(X, k: int, seed: int, iters: int = 25):
    """Seeded k-means++ + Lloyd's on a driver-side sample (numpy).
    Deterministic for a given (X, k, seed); X is pre-sorted by the
    caller so the result is independent of Spark partition order.
    Seeding keeps a running min-d2 vector (distance only to the newest
    center per step — O(n·d), not O(n·k·d) with a giant temporary);
    the probabilities, and therefore the drawn centers, are identical
    to the recompute-everything form."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = len(X)
    centers = [X[rng.randint(n)]]
    d2 = ((X - centers[0]) ** 2).sum(1)
    for _ in range(min(k, n) - 1):
        total = d2.sum()
        p = d2 / total if total > 0 else np.full(n, 1.0 / n)
        c = X[rng.choice(n, p=p)]
        centers.append(c)
        d2 = np.minimum(d2, ((X - c) ** 2).sum(1))
    while len(centers) < k:  # degenerate: fewer points than centroids
        centers.append(centers[0])
    C = np.asarray(centers, dtype=np.float64)
    for _ in range(iters):
        assign = _chunked_argmin(X, C)
        newC = np.vstack(
            [X[assign == c].mean(0) if (assign == c).any() else C[c] for c in range(k)]
        )
        if np.allclose(newC, C):
            break
        C = newC
    return C


# ----------------------------------------------------------- numpy twins
# Vectorized (Arrow pandas-UDF) twins of the Catalyst HOF expressions.
# The JVM higher-order functions (zip_with/aggregate/transform) are
# CodegenFallback — every element op is an interpreted, boxed lambda
# call, which makes the O(k_cells·dim) assignment and O(m·k·sub_dim)
# encode folds THE dominant per-row cost of an index build (guide §4.2:
# hand whole batches to vectorized native code). Each numpy helper
# reproduces its JVM twin's arithmetic ELEMENT-FOR-ELEMENT in the same
# order — every step is one correctly-rounded IEEE-754 double op in
# both engines — so assignments, residuals, codes and LUT entries are
# bit-identical to the expression forms (pinned in tests/test_pq.py).


def _np_rows(series) -> "object":
    """pandas Series of array cells → (n, dim) float64 matrix.
    float32 → float64 is exact, matching the JVM CAST(x AS DOUBLE)."""
    import numpy as np

    return np.array([np.asarray(v, dtype=np.float64) for v in series], dtype=np.float64)


def _np_l2_normalize(X):
    """numpy twin of functions.vectors.l2_normalize: sequential double
    fold for the norm (acc = ((0+v0²)+v1²)+…), sqrt, elementwise
    divide; zero-norm rows pass through unchanged. Bit-identical."""
    import numpy as np

    acc = np.zeros(len(X))
    for i in range(X.shape[1]):
        acc += X[:, i] * X[:, i]
    n = np.sqrt(acc)
    out = X.copy()
    nz = n != 0.0  # NaN norms divide (NaN != 0.0), like the JVM CASE
    out[nz] = X[nz] / n[nz, None]
    return out


def _np_sq_dists_seq(X, C):
    """(n, k) squared-L2 matrix via the SAME sequential per-dimension
    fold as _sq_l2 — acc += (x_i − c_i)² one dimension at a time, each
    step a correctly-rounded double multiply + add — so distances are
    bit-identical to the JVM zip_with/aggregate fold. (Distinct from
    _chunked_argmin, whose pairwise-summed distances define the
    TRAINING math inside _lloyd and must stay as they are.)"""
    import numpy as np

    acc = np.zeros((X.shape[0], C.shape[0]))
    for i in range(X.shape[1]):
        d = X[:, i, None] - C[None, :, i]
        acc += d * d
    return acc


def _codebook_np(model: PqModel):
    """model.codebooks as an (m, k, sub_dim) float64 array: the cached
    ``cb_np`` when the model carries one (train/_fit/load paths), else
    one collect of the kilobyte local relation."""
    import numpy as np

    if model.cb_np is not None:
        return model.cb_np
    cb: dict[int, list] = {}
    for r in model.codebooks.collect():  # bounded: m*k rows
        cb.setdefault(r.sub, [None] * model.k)[r.code] = [float(x) for x in r.cvec]
    return np.asarray(
        [[cb[j][c] for c in range(model.k)] for j in range(model.m)], dtype=np.float64
    )


def _np_pq_codes(R, CB):
    """(n, m) int32 code matrix: per subspace, argmin over the k
    codebook entries by the sequential fold — first minimum wins =
    lowest code on ties, the same contract as pq_code_expr's
    array_min over (d, code) structs."""
    import numpy as np

    m, _, sub_dim = CB.shape
    codes = np.empty((len(R), m), dtype=np.int32)
    for j in range(m):
        codes[:, j] = _np_sq_dists_seq(
            R[:, j * sub_dim : (j + 1) * sub_dim], CB[j]
        ).argmin(1)
    return codes


def pq_codes_udf(model: PqModel):
    """Arrow pandas-UDF twin of ``pq_code_expr``: vec → array<int> of
    m codes, bit-identical (same sequential fold, same lowest-code tie
    break), but evaluated as one numpy pass per Arrow batch instead of
    m·k interpreted HOF folds per row. NULL vectors yield NULL codes
    (the expression form's NULL propagation)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    CB = _codebook_np(model)

    @pandas_udf("array<int>")
    def _codes(batch: pd.Series) -> pd.Series:
        import numpy as np

        mask = batch.notna().to_numpy()
        out: list = [None] * len(batch)
        if mask.any():
            codes = _np_pq_codes(_np_rows(batch[mask]), CB)
            for pos, row in zip(np.flatnonzero(mask), codes):
                out[pos] = row
        return pd.Series(out, dtype=object)

    return _codes


def argmin_cid_udf(pairs: list[tuple[int, list[float]]]):
    """Arrow pandas-UDF twin of ``argmin_cid_expr``: vec → nearest
    centroid id, bit-identical (sequential fold distances; ties fall
    to the smaller cid — centroids are sorted by cid and argmin keeps
    the first minimum). NULL vectors yield NULL."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    srt = sorted(pairs)
    cids = np.asarray([int(c) for c, _ in srt], dtype=np.int64)
    C = np.asarray([[float(x) for x in cv] for _, cv in srt], dtype=np.float64)

    @pandas_udf("int")
    def _assign(batch: pd.Series) -> pd.Series:
        mask = batch.notna().to_numpy()
        out: list = [None] * len(batch)
        if mask.any():
            won = cids[_np_sq_dists_seq(_np_rows(batch[mask]), C).argmin(1)]
            for pos, c in zip(np.flatnonzero(mask), won):
                out[pos] = int(c)
        return pd.Series(out, dtype=object)

    return _assign


def _fit_codebooks(spark, X, m: int, k: int, seed: int) -> PqModel:
    """m seeded per-subspace Lloyd's fits on a SORTED (n, dim) float64
    sample — the driver-side half of train_pq, callable directly when
    the caller already holds the training matrix (build_ivfpq's
    driver-side residual shortcut)."""
    import numpy as np

    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_dim = dim // m
    rows: list[tuple[int, int, list[float]]] = []
    subs = []
    for j in range(m):
        C = _lloyd(X[:, j * sub_dim : (j + 1) * sub_dim], k, seed + j)
        subs.append(C)
        rows.extend((j, code, [float(x) for x in C[code]]) for code in range(k))
    codebooks = spark.createDataFrame(rows, "sub int, code int, cvec array<double>")
    return PqModel(
        codebooks=codebooks,
        m=m,
        k=k,
        sub_dim=sub_dim,
        cb_np=np.asarray(subs, dtype=np.float64),
    )


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    seed: int = 0,
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
) -> PqModel:
    """Fit m per-subspace codebooks on a DRIVER-SIDE sample.

    The codebook is m×k×(d/m) doubles — kilobytes — so training it
    with distributed KMeans would spend hundreds of scheduler jobs on
    a model that fits in a page; like the PCA eigensolve
    (plans/mlplans.py), the right split is: Spark bounds the sample
    (``sample_fraction``), numpy fits the tiny model, Spark applies
    it everywhere (pq_encode is a narrow map). The collected sample
    is sorted before fitting, so codebooks do not depend on partition
    order; with no ``sample_fraction`` given, a corpus above the row
    cap is automatically down-sampled to it (bounded driver memory at
    any corpus size).

    The dimension check runs on the collected sample — the former
    separate ``.first()`` probe was a full extra execution of the
    upstream plan whenever an exchange sat between source and sample
    (measured: one whole assignment pass of the IVFPQ build)."""
    import numpy as np

    rows = _collect_train_sample(corpus.select(vec_col), vec_col, sample_fraction, seed)
    if not rows:
        raise ValueError("train_pq: empty training sample (empty corpus?)")
    X = np.asarray(sorted(tuple(r[0]) for r in rows), dtype=np.float64)
    return _fit_codebooks(corpus.sparkSession, X, m=m, k=k, seed=seed)


def _sq_l2_cols(a: F.Column, b: F.Column) -> F.Column:
    """Column form of _sq_l2 — same Catalyst aggregate/zip_with ops,
    same sequential double-precision fold, so distances are bit-equal
    to the name-based variant."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sq_l2_lit(vec: str | F.Column, offset: int, values: list[float]) -> F.Column:
    """Squared L2 distance between ``vec[offset+1 .. offset+len]``
    and a LITERAL vector, as a zip_with/aggregate fold. (An unrolled
    sum-of-squares variant was measured strictly worse: it moves the
    work from interpreted HOF eval into a multi-megabyte Catalyst tree
    whose optimization + codegen dwarf the row math. The HOF form is
    plan-cheap and the per-row cost parallelizes across input
    splits.)"""
    col = F.col(vec) if isinstance(vec, str) else vec
    return _sq_l2_cols(
        F.slice(col, offset + 1, len(values)),
        F.array(*[F.lit(v) for v in values]),
    )


def argmin_cid_expr(
    pairs: list[tuple[int, list[float]]], vec: str | F.Column
) -> F.Column:
    """Nearest-centroid id over LITERAL (cid, centroid) pairs as one
    row-local expression: array_min over (distance, cid) structs. The
    tie-break contract — smaller distance wins, equal distances fall
    to the smaller cid (struct ordering) — is load-bearing for the
    flat/two-level assignment agreement and for probe determinism, so
    every assignment site (build_ivf, two_level_assign_expr,
    append_ivfpq, split_oversized_cells, the scale harness) routes
    through this one definition.

    The (cid, centroid) table rides as ONE folded literal (_fold_lit)
    rather than per-centroid expression subtrees — same zip_with/
    aggregate distance fold in the same order, so assignments are
    bit-identical to the unrolled form, but the plan stays O(1) in
    k_cells (at sqrt-n cell counts the unrolled tree's analysis +
    codegen dominated the whole build)."""
    col = F.col(vec) if isinstance(vec, str) else vec
    dim = len(pairs[0][1])
    cents = _fold_lit(
        [{"c": int(c), "v": [float(x) for x in cv]} for c, cv in pairs],
        "array<struct<c:int,v:array<double>>>",
    )
    return (
        F.array_min(
            F.transform(
                cents,
                lambda s: F.struct(
                    _sq_l2_cols(F.slice(col, 1, dim), s["v"]).alias("d"),
                    s["c"].alias("c"),
                ),
            )
        )
        .getField("c")
        .cast("int")
    )


def pq_code_expr(model: PqModel, vec: str | F.Column) -> F.Column:
    """The m-code array as ONE row-local column expression — nearest
    codebook entry per subspace, argmin over k literal-vector distances
    (the codebook is m×k rows, kilobytes, collected once). Callers
    project it next to whatever columns must ride along (ivfpq keeps
    ``cid`` beside the codes with no join).

    ``vec`` may be a Column (e.g. a lambda variable): when the input
    vector is itself a computed expression, wrap the call as
    ``element_at(transform(array(<expr>), v -> pq_code_expr(m, v)), 1)``
    so the expression is evaluated ONCE per row — otherwise Catalyst's
    projection collapse inlines it into all m*k distance subtrees
    (measured: 4x the row work and seconds of codegen per fresh
    codebook on the IVFPQ residual path)."""
    cb: dict[int, list[list[float]]] = {}
    for r in model.codebooks.collect():  # bounded: m*k rows
        cb.setdefault(r.sub, [None] * model.k)[r.code] = [float(x) for x in r.cvec]
    col = F.col(vec) if isinstance(vec, str) else vec
    # whole codebook as ONE folded literal (sub -> code -> vector):
    # plan size O(m) instead of O(m*k*sub_dim) — see _fold_lit
    cbs = _fold_lit(
        [[cb[j][c] for c in range(model.k)] for j in range(model.m)],
        "array<array<array<double>>>",
    )

    def code_for(j: int) -> F.Column:
        # array_min over (d, code) structs orders lexicographically —
        # one evaluation per distance (array_position(.., array_min(..))
        # would compute every aggregate twice), lowest code on ties;
        # the transform index IS the code (codebook list is
        # code-ordered), same tie contract as the unrolled form
        best = F.array_min(
            F.transform(
                F.element_at(cbs, j + 1),
                lambda cv, i: F.struct(
                    _sq_l2_cols(
                        F.slice(col, j * model.sub_dim + 1, model.sub_dim), cv
                    ).alias("d"),
                    i.alias("c"),
                ),
            )
        )
        return best.getField("c").cast("int")

    return F.array(*[code_for(j) for j in range(model.m)])


def pq_encode(
    corpus: DataFrame,
    model: PqModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> length m): a PURE NARROW MAP — zero
    shuffles, encoding 100 TB is scan → vectorized encode → write.

    r9: the per-row math moved from the interpreted Catalyst HOF chain
    (pq_code_expr — m·k boxed zip_with/aggregate folds per row,
    CodegenFallback) to ONE numpy pass per Arrow batch (pq_codes_udf,
    guide §4.2). Codes are bit-identical (same sequential fold, same
    lowest-code tie break — pinned in tests/test_pq.py); only the two
    projected columns cross the Python boundary."""
    return corpus.select(
        F.col(id_col).alias("id"), pq_codes_udf(model)(F.col(vec_col)).alias("codes")
    )


def _pq_luts_local(
    queries: DataFrame, model: PqModel, id_col: str, vec_col: str
) -> DataFrame:
    """(query_id, lut array<array<double>>) as a LOCAL relation: per
    query, the m×k table of exact subspace distances, computed on the
    driver. Bounded by the ADC broadcast contract — the nq·m·k-double
    LUT table must broadcast anyway, and the collected query vectors
    are strictly smaller than it (k ≥ 1 codebook entries per
    sub-vector). Each pd entry is the same sequential double fold as
    the former _sq_l2 expression, so values are bit-identical. NULL
    query vectors are skipped (they can never rank: every lookup
    against them is undefined)."""
    import numpy as np
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    CB = _codebook_np(model)
    m, _, sub_dim = CB.shape
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()
    out = []
    for r in q_rows:
        if r.qv is None:
            continue
        qv = np.asarray([float(x) for x in r.qv], dtype=np.float64)
        lut = [
            [
                float(d)
                for d in _np_sq_dists_seq(
                    qv[None, j * sub_dim : (j + 1) * sub_dim], CB[j]
                )[0]
            ]
            for j in range(m)
        ]
        out.append((r.query_id, lut))
    schema = StructType(
        [
            StructField("query_id", queries.schema[id_col].dataType),
            StructField("lut", ArrayType(ArrayType(DoubleType()))),
        ]
    )
    return queries.sparkSession.createDataFrame(out, schema)


def pq_topk(
    corpus_codes: DataFrame,
    model: PqModel,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: (query_id, cand_id, adist, rank), rank 1 = nearest
    (smallest approximate squared L2). The corpus side is the code
    table only; each row costs m integer lookups into the broadcast
    per-query LUT.

    r9: the LUT is computed DRIVER-SIDE (_pq_luts_local) — it is a
    kilobyte model-sized table by the broadcast contract, and the
    former posexplode → broadcast-join → two collect_list groupBys
    spent three tiny shuffle stages per probe on data the driver can
    produce in microseconds. Values are bit-identical (same sequential
    fold per (sub, code) entry)."""
    lut_rows = _pq_luts_local(queries, model, id_col, vec_col)
    scored = (
        corpus_codes.crossJoin(F.broadcast(lut_rows))
        .where(F.col("id") != F.col("query_id"))
        .withColumn(
            "adist",
            F.round(
                F.aggregate(
                    F.zip_with(
                        "codes",
                        "lut",
                        lambda c, row: F.element_at(row, c.cast("int") + F.lit(1)),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy("adist", "id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("cand_id"), "adist", "rank")
    )
