"""IVF×PQ (IVFADC) — the composed ANN scale path both module headers
promise (ml/ivf.py: "persist ``assign`` partitioned by cell_id";
ml/pq.py: "combine with IVF cell assignment so a probe scans nprobe/k
of the code table with LUT scoring").

The composition is the classic IVFADC layout (Jégou et al., TPAMI
2011): a coarse k-cell quantizer routes every vector to a cell, PQ
quantizes the RESIDUAL (vector − cell centroid) into m codes, and the
store is ``(id, codes)`` parquet partitioned by ``cid``. A probe then

  1. scores the query against the broadcast k×dim centroid table and
     keeps its ``nprobe`` nearest cells,
  2. builds one m×k lookup table PER (query, probed cell) from the
     query's residual against that cell — kilobytes, broadcast,
  3. reads ONLY the probed cells' files (directory-level partition
     pruning — ``PartitionFilters`` on cid, nprobe/k of the corpus),
  4. scores each code row with m integer LUT lookups (pure JVM
     zip_with/aggregate — no float math per candidate, no Python),
  5. takes per-query top-k with a rank window; Spark's
     WindowGroupLimit pushes the ``rank <= k`` limit below the
     exchange, so each scan partition forwards at most k candidate
     rows per query instead of its whole cell.

Why residuals: within a cell, vectors share the centroid's offset, so
quantizing (vec − centroid) spends the codebook's 16 entries per
subspace on LOCAL structure — measurably better recall than coding
absolute vectors with the same bit budget, at zero extra search cost
(the LUT absorbs the centroid shift).

At 100 TB: the corpus never shuffles — encode writes once
(partitionBy cid), and every probe is a pruned scan + broadcast hash
join. The only exchange in the probe plan carries already-scored,
group-limited candidate rows keyed by query_id.

Metric contract (r8): this is a COSINE index — build/append/probe all
L2-normalize, so ADC-L2 is monotone in cosine and the raw shortlist
ranks like the exact-cosine truth (SCALE.md "r8: the metric fix").
Sizing (r9): ``build_ivfpq``'s default ``k_cells=None`` derives
~sqrt(n) via ``ivf.suggest_k_cells`` — linear n/constant sizing lets
a cell straddle modal clusters and collapses raw-ADC recall (the r8
`cells` experiment). Scale ``nprobe`` with the cell count (e.g.
``k_cells // 4`` probes ~25% of the corpus) when overriding.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import l2_normalize
from .ivf import build_ivf
from .pq import PqModel, _sq_l2, _sq_l2_lit, _sliced, pq_code_expr, train_pq


@dataclass
class IvfPqIndex:
    centroids: DataFrame  # cid int, cvec array<double>
    pq: PqModel  # codebooks fit on residuals
    coded: DataFrame  # id, codes array<int>, cid


def _residuals(assigned: DataFrame, centroids: DataFrame) -> DataFrame:
    """(id, cid, rvec = vec − centroid[cid]); centroid table broadcast."""
    return assigned.join(F.broadcast(centroids), "cid").select(
        "id",
        "cid",
        F.zip_with(
            "vec", "cvec", lambda x, y: x.cast("double") - y.cast("double")
        ).alias("rvec"),
    )


def build_ivfpq(
    corpus: DataFrame,
    k_cells: int | None = None,
    m: int = 8,
    k: int = 16,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction: float | None = None,
) -> IvfPqIndex:
    """``train_fraction`` bounds BOTH KMeans fits (coarse cells and
    residual codebooks) at scale — quantizers converge on a sample;
    assignment and encoding still touch every row.

    ``k_cells=None`` (the default) derives ~sqrt(n) cells from one
    corpus count via ``ivf.suggest_k_cells`` — the r8 `cells`
    experiment showed constant/linear sizing lets a cell straddle
    modal clusters and collapses raw-ADC recall (0.000 at 32 cells
    over 64 latent clusters), so the default must not be a small
    constant. The count is metadata-cheap on a parquet source; callers
    that already hold a row count can pass
    ``k_cells=suggest_k_cells(n)`` to skip the extra action.

    The index is a COSINE-metric index: vectors are L2-normalized
    before coarse assignment and residual encoding, so the ADC-L2
    distance is monotone in cosine (||u−v||² = 2−2·cos on the unit
    sphere) and the raw ADC shortlist ranks like the exact-cosine
    truth the recall harness measures against. Without this the ADC
    ordering on an unnormalized corpus tracks magnitude, not angle —
    the r7 recall curve's ~random raw-ADC ranking (SCALE_r07.json).
    exact_rerank is cosine and therefore unaffected."""
    from .ivf import suggest_k_cells

    if k_cells is None:
        k_cells = suggest_k_cells(corpus.count())
    corpus = corpus.withColumn(vec_col, l2_normalize(vec_col))
    ivf = build_ivf(
        corpus,
        k=k_cells,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        sample_fraction=train_fraction,
    )
    res = _residuals(ivf.assigned, ivf.centroids)
    # sampling happens inside train_pq (hash-based, layout-independent,
    # bounded) — a pre-sample here would be a second, divergent sampler
    pq = train_pq(res, m=m, k=k, seed=seed, vec_col="rvec", sample_fraction=train_fraction)
    # cid rides along through the narrow-map encode — a join back on id
    # would shuffle the whole corpus for a column it already has.
    # The one-element-array transform BINDS the residual: without it,
    # projection collapse inlines rvec's zip_with into all m*k distance
    # subtrees (measured 4x row work + seconds of codegen per build)
    codes = F.element_at(
        F.transform(F.array(F.col("rvec")), lambda rv: pq_code_expr(pq, rv)), 1
    )
    coded = res.select("id", "cid", codes.alias("codes"))
    return IvfPqIndex(centroids=ivf.centroids, pq=pq, coded=coded)


def persist_ivfpq(index: IvfPqIndex, path: str) -> None:
    """Cell-partitioned code store + tiny sidecar tables. The code
    table is ~m bytes of payload per row (vs 8·dim for floats); the
    centroid/codebook sidecars are kilobytes, written driver-side
    (sources/writers.write_sidecar — a Spark write job on a kilobyte
    local relation costs seconds of pure overhead)."""
    from ..sources.writers import write_sidecar

    # repartition by cid before the partitioned write: without it every
    # input split emits a file into every cell directory — input_splits
    # × k_cells files (measured 64 vs 16 on the fixture; at cluster
    # scale that's millions of tiny files). The ENCODE stays
    # shuffle-free; this one organization shuffle moves the m-byte CODE
    # table (a few % of corpus bytes), not vectors, and caps the layout
    # at one file per cell.
    index.coded.repartition("cid").write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(f"{path}/coded")
    write_sidecar(index.centroids, f"{path}/centroids")
    write_sidecar(index.pq.codebooks, f"{path}/codebooks")
    # staleness bookkeeping for append_ivfpq/needs_retrain: n_base is
    # the row count the quantizers were trained against (parquet-footer
    # count — metadata-only, no data scan)
    spark = index.coded.sparkSession
    n_base = spark.read.parquet(f"{path}/coded").count()
    _write_stats(spark, path, n_base=n_base, n_appended=0)


_METRIC = "cosine"  # r8 format: vectors/residuals stored L2-normalized


def _write_stats(spark: SparkSession, path: str, n_base: int, n_appended: int) -> None:
    # the metric stamp is the on-disk FORMAT marker: r8 changed the
    # stored bytes (normalized vectors/residuals), so a loader must be
    # able to tell a cosine-format store from a pre-r8 raw-L2 one
    from ..sources.writers import write_sidecar

    write_sidecar(
        spark.createDataFrame(
            [(n_base, n_appended, _METRIC)],
            "n_base bigint, n_appended bigint, metric string",
        ),
        f"{path}/stats",
    )


def _check_metric(path: str) -> None:
    """Fail loudly on a store whose contents don't match this code's
    metric contract. A pre-r8 index holds UNNORMALIZED vectors; r8+
    code appending to / probing it with normalized vectors returns
    silently wrong rankings — the exact failure a format marker
    exists to prevent. Missing sidecar or missing/mismatched marker →
    rebuild with build_ivfpq + persist_ivfpq."""
    import os

    from ..sources.writers import read_sidecar_rows

    if not os.path.exists(f"{path}/stats"):
        raise ValueError(
            f"no stats sidecar at {path}/stats — index predates the "
            f"metric-stamped format and its vectors are not "
            f"L2-normalized; rebuild it with build_ivfpq/persist_ivfpq"
        )
    metric = read_sidecar_rows(f"{path}/stats")[0].get("metric")
    if metric != _METRIC:
        raise ValueError(
            f"index at {path} was built with metric="
            f"{metric if metric else '<unstamped>'}; this code reads/"
            f"writes {_METRIC}-format stores (L2-normalized) — rebuild "
            f"it with build_ivfpq/persist_ivfpq"
        )


def ivfpq_staleness(spark: SparkSession, path: str) -> dict:
    """{n_base, n_appended, staleness}: how much of the store was coded
    by quantizers that never saw it. Appended vectors are assigned and
    PQ-coded with centroids/codebooks fit before they arrived, so as
    the appended mass grows the codebooks drift off the data
    distribution and recall decays — staleness = n_appended / n_base is
    the retrain signal. Indexes persisted before stats existed read as
    fresh (n_base = current count, n_appended = 0)."""
    import os

    from ..sources.writers import read_sidecar_rows

    if os.path.exists(f"{path}/stats"):
        row = read_sidecar_rows(f"{path}/stats")[0]  # driver-side, no job
        n_base, n_appended = int(row["n_base"]), int(row["n_appended"])
    else:  # pre-stats index: treat current contents as the trained base
        n_base = spark.read.parquet(f"{path}/coded").count()
        n_appended = 0
    return {
        "n_base": n_base,
        "n_appended": n_appended,
        "staleness": n_appended / n_base if n_base else float("inf"),
    }


def needs_retrain(spark: SparkSession, path: str, max_staleness: float = 0.25) -> bool:
    """Retrain trigger: True once the appended fraction exceeds
    ``max_staleness``. The caller owns the retrain itself (build_ivfpq
    over the full corpus + persist_ivfpq to a fresh path, then swap) —
    keeping the trigger separate from the act means the expensive
    rebuild can be scheduled, batched, or vetoed."""
    return ivfpq_staleness(spark, path)["staleness"] > max_staleness


def append_ivfpq(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incremental maintenance — the piece a production 100 TB ANN
    store needs beyond build-once: encode NEW vectors with the
    PERSISTED quantizers (no retrain) and append them to their cells.

    Same shape as the build path: assignment is a zero-shuffle
    literal-argmin over the k collected centroids (kilobytes), the
    residual PQ encode is a narrow map, and the write appends only the
    touched cid partition directories — existing files are never
    rewritten, and probes pick the new rows up on their next pruned
    scan with no index-wide operation. Id uniqueness is the caller's
    contract (append does not dedup against the store). Returns the
    updated staleness dict; check ``needs_retrain`` (or the returned
    staleness) to schedule a full rebuild."""
    from .pq import argmin_cid_expr

    index = load_ivfpq(spark, path)
    cents = sorted(index.centroids.collect(), key=lambda r: r.cid)  # k rows
    if not cents:
        raise ValueError(f"no centroids at {path}/centroids — not an IVFPQ index")
    before = ivfpq_staleness(spark, path)
    # same cosine-metric normalization as the build path — appended
    # rows must live on the same unit sphere the quantizers were fit on
    vecs = new_vectors.select(
        F.col(id_col).alias("id"), l2_normalize(vec_col).alias("vec")
    )
    assigned = vecs.withColumn(
        "cid", argmin_cid_expr([(r.cid, list(r.cvec)) for r in cents], "vec")
    )
    res = _residuals(assigned, index.centroids)
    # same residual-binding as build_ivfpq (see comment there)
    codes_new = F.element_at(
        F.transform(F.array(F.col("rvec")), lambda rv: pq_code_expr(index.pq, rv)), 1
    )
    coded_new = res.select("id", "cid", codes_new.alias("codes"))
    # same file-per-cell organization shuffle as persist_ivfpq
    coded_new.repartition("cid").write.mode("append").partitionBy("cid").parquet(
        f"{path}/coded"
    )
    # appended count from footer metadata (no data scan, no cache of
    # the encode plan): everything beyond n_base is appended mass
    total = spark.read.parquet(f"{path}/coded").count()
    _write_stats(
        spark, path, n_base=before["n_base"], n_appended=total - before["n_base"]
    )
    return ivfpq_staleness(spark, path)


def load_ivfpq(spark: SparkSession, path: str) -> IvfPqIndex:
    """Model geometry (m, k, sub_dim) is derived from the codebook
    table itself, so the parquet layout is self-describing.

    The sidecars are read DRIVER-SIDE (read_sidecar_rows — pyarrow,
    milliseconds, zero Spark jobs) and rebuilt as LOCAL relations: a
    probe's latency path pays no scheduler round-trips for kilobyte
    model tables, the geometry derivation is plain Python instead of
    an aggregation job per load, and the explicit python-int/float
    rebuild normalizes any pre-schema-preserving sidecar's widened
    types. Spark's parquet reader still works on the same directories
    for any external consumer."""
    from ..sources.writers import read_sidecar_rows

    _check_metric(path)  # refuse pre-cosine (unnormalized) stores
    coded = spark.read.parquet(f"{path}/coded").select(
        "id", "codes", F.col("cid").cast("int").alias("cid")
    )
    cent_rows = read_sidecar_rows(f"{path}/centroids")
    cb_rows = read_sidecar_rows(f"{path}/codebooks")
    if not cent_rows or not cb_rows:
        raise ValueError(f"empty centroid/codebook sidecars at {path}")
    centroids = spark.createDataFrame(
        [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in cent_rows],
        "cid int, cvec array<double>",
    )
    codebooks = spark.createDataFrame(
        [
            (int(r["sub"]), int(r["code"]), [float(x) for x in r["cvec"]])
            for r in cb_rows
        ],
        "sub int, code int, cvec array<double>",
    )
    pq = PqModel(
        codebooks=codebooks,
        m=max(r["sub"] for r in cb_rows) + 1,
        k=max(r["code"] for r in cb_rows) + 1,
        sub_dim=max(len(r["cvec"]) for r in cb_rows),
    )
    return IvfPqIndex(centroids=centroids, pq=pq, coded=coded)


def _probe_luts(
    index: IvfPqIndex,
    queries: DataFrame,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(query_id, cid, lut): for each query's nprobe nearest cells, the
    m×k table of exact subspace distances from the query's residual in
    that cell. Size nq·nprobe·m·k doubles — always broadcastable."""
    # queries are normalized onto the index's unit sphere (the build
    # path normalizes the corpus — cosine-metric index)
    q = queries.select(
        F.col(id_col).alias("query_id"), l2_normalize(vec_col).alias("qv")
    )
    probed = (
        q.crossJoin(F.broadcast(index.centroids))
        .withColumn("cd", _sq_l2("qv", "cvec"))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("cd", "cid")
            ),
        )
        .where(F.col("crank") <= nprobe)
        .select(
            "query_id",
            "cid",
            F.zip_with(
                "qv", "cvec", lambda x, y: x.cast("double") - y.cast("double")
            ).alias("qr"),
        )
    )
    return (
        _sliced(probed, "qr", index.pq.m, index.pq.sub_dim)
        .join(F.broadcast(index.pq.codebooks), "sub")
        .withColumn("pd", _sq_l2("subvec", "cvec"))
        .groupBy("query_id", "cid", "sub")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "pd"))), lambda s: s["pd"]
            ).alias("row")
        )
        .groupBy("query_id", "cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "row"))), lambda s: s["row"]
            ).alias("lut")
        )
    )


def _score_topk(coded: DataFrame, luts: DataFrame, k: int) -> DataFrame:
    """Broadcast-join the (query, cell) LUTs onto the code table on cid
    — the IVF scan — and rank by the ADC distance sum."""
    scored = (
        coded.join(F.broadcast(luts), "cid")
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


def ivfpq_topk(
    index: IvfPqIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """In-memory probe: same output schema as brute_force_topk /
    lsh_topk / ivf_topk / pq_topk — all five are swappable."""
    luts = _probe_luts(index, queries, nprobe, id_col, vec_col)
    return _score_topk(index.coded, luts, k)


def probe_ivfpq(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Persisted probe — the 100 TB path: the probed cell set (at most
    min(k_cells, nq·nprobe) ints, collected driver-side) becomes a
    literal ``cid IN (...)`` predicate on the partitioned code store,
    so the scan reads nprobe/k_cells of the files via directory-level
    pruning (``PartitionFilters`` in the scan node) instead of
    scanning the corpus and filtering."""
    index = load_ivfpq(spark, path)
    luts = _probe_luts(index, queries, nprobe, id_col, vec_col)
    # ONE evaluation of the LUT plan: collect the kilobyte table
    # (nq·nprobe rows), derive the probed-cell IN-list in Python, and
    # re-ship the rows as a LOCAL relation for the broadcast. The
    # former flow ran the plan twice (distinct-collect for the cells,
    # then again under the broadcast) — a full scheduler round-trip of
    # pure overhead on the per-search latency path. No .cache() so no
    # storage-memory leak per probe.
    lut_rows = luts.collect()
    cells = sorted({int(r.cid) for r in lut_rows})
    pruned = index.coded.where(F.col("cid").isin(cells))
    return _score_topk(pruned, spark.createDataFrame(lut_rows, luts.schema), k)


def exact_rerank(
    shortlist: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact re-rank of an ADC shortlist (the Faiss IndexRefineFlat
    step): fetch the ORIGINAL vectors for the shortlist's candidates
    only and keep the top-k by exact cosine. Output schema matches
    brute_force_topk, so refined probes stay swappable with the rest
    of the ANN family.

    Scale shape: the (query_id, cand_id) shortlist is nq·k·expand rows
    — kilobytes — so it BROADCASTS onto one corpus scan
    (BroadcastHashJoin keyed by id, no corpus shuffle); an id-sorted or
    z-ordered corpus layout (operators/layout.py) additionally turns
    the broadcast id set into row-group pruning. Queries broadcast the
    same way. Recall can only improve: every true neighbor the
    unrefined top-k finds is in the shortlist, and exact-cosine
    ordering never ranks >k items above a true top-k member."""
    from ..functions.vectors import cosine

    cand = shortlist.select("query_id", "cand_id")
    fetched = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("ce")
    ).join(F.broadcast(cand), "cand_id")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"))
    scored = fetched.join(F.broadcast(q), "query_id").withColumn(
        "cos", F.round(cosine("qe", "ce"), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def ivfpq_topk_refined(
    index: IvfPqIndex,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    expand: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC + exact re-rank: ADC shortlist of k·expand, then
    ``exact_rerank`` on the originals — the standard recall knob that
    costs nq·k·expand exact distances instead of a wider nprobe's
    extra cell scans."""
    shortlist = ivfpq_topk(
        index, queries, k=k * expand, nprobe=nprobe, id_col=id_col, vec_col=vec_col
    )
    return exact_rerank(shortlist, corpus, queries, k, id_col, vec_col)


def probe_ivfpq_refined(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    expand: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Persisted-store probe with exact re-rank: the pruned-scan ADC
    shortlist (probe_ivfpq) followed by ``exact_rerank`` against the
    original-vector table."""
    shortlist = probe_ivfpq(
        spark, path, queries, k=k * expand, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col,
    )
    return exact_rerank(shortlist, corpus, queries, k, id_col, vec_col)


def cell_sizes(spark: SparkSession, path: str) -> dict[int, int]:
    """{cid: rows} for the persisted store — one metadata-cheap group
    count over the code table (m-byte rows), the imbalance monitor
    that drives ``split_oversized_cells``."""
    return {
        int(r.cid): int(r.n)
        for r in spark.read.parquet(f"{path}/coded")
        .groupBy("cid")
        .agg(F.count("*").alias("n"))
        .collect()
    }


def split_oversized_cells(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    max_rows: int,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Hierarchical-coarse-quantizer maintenance: split every cell
    holding more than ``max_rows`` vectors into two sub-cells — the
    production fix for k-means cell imbalance (SCALE.md measured a
    4x max/p50 tail at 64 cells; a probe landing in a fat cell scans
    that multiple of the median). Each fat cell gets a seeded 2-means
    on a bounded driver-side sample of ITS vectors, its members are
    re-assigned by literal argmin and re-encoded as residuals against
    their new centroid with the UNCHANGED global PQ codebooks, and the
    store gains two fresh cid partitions.

    ``corpus`` is the system of record (id → vector): codes are
    re-derived from source vectors, never round-tripped through the
    lossy PQ decode. Only fat cells' members are touched — the rest of
    the store's files are never rewritten or read beyond the size
    count.

    Commit protocol (ordering matters): (1) append the new cid
    partitions, (2) rewrite the centroids sidecar — the COMMIT POINT,
    since probes route by the centroid table and a cid absent from it
    is never scanned (PartitionFilters prune it), (3) delete the old
    cell directories (bookkeeping GC — required for load_ivfpq /
    staleness counts, unreachable by probes either way). A crash
    before (2) leaves the old index fully intact; between (2) and (3)
    probes are already correct and only the orphan GC remains.

    Splitting iterates: a 2-means halves a fat cell, and a child that
    is still over the cap re-enters the next pass — the hierarchical
    refinement converges in O(log2(n_fat/max_rows)) passes. A cell
    whose 2-means makes no progress (every member lands in one child —
    e.g. more than ``max_rows`` IDENTICAL vectors, which no geometry
    separates) is recorded under ``"unsplittable"`` and left intact
    rather than looping or failing the whole maintenance job.

    Returns {"split": [{cid, n, into}, ...], "unsplittable": [cids],
    "k_cells": new count}.
    """
    import os
    import shutil

    import numpy as np

    from ..sources.writers import write_sidecar
    from .pq import _collect_train_sample, _lloyd, argmin_cid_expr

    if max_rows < 2:
        raise ValueError(f"max_rows must be >= 2, got {max_rows}")
    index = load_ivfpq(spark, path)
    sizes = cell_sizes(spark, path)
    centroid_map = {
        int(r.cid): [float(x) for x in r.cvec] for r in index.centroids.collect()
    }
    # same cosine-metric normalization as build/append/probe: split
    # cells get 2-means centroids and PQ residuals on the SAME unit
    # sphere the quantizers were fit on — without this, probes route
    # and score normalized queries against split-cell geometry trained
    # on raw magnitudes (the r7 magnitude-ranking bug, reintroduced
    # only for split cells, with the correctly-coded originals deleted
    # at the commit point)
    vecs = corpus.select(F.col(id_col).alias("id"), l2_normalize(vec_col).alias("vec"))
    # next id from BOTH tables: an empty cell (centroid present, zero
    # coded rows — _lloyd pads degenerate fits with duplicate centers
    # that lose every argmin tie) holds the max cid in centroids only;
    # deriving from sizes alone would hand its cid to a new child and
    # silently overwrite the existing centroid
    next_cid = max(max(sizes), max(centroid_map)) + 1
    split_info: list[dict] = []
    unsplittable: list[int] = []
    gc_dirs: list[int] = []

    fat = sorted(c for c, n in sizes.items() if n > max_rows)
    while fat:
        cid = fat.pop(0)
        coded_store = spark.read.parquet(f"{path}/coded")
        members = coded_store.where(F.col("cid") == cid).select("id")
        cell_vecs = vecs.join(members, "id")
        n_covered = cell_vecs.count()
        if n_covered != sizes[cid]:
            # the old cell directory is DELETED after re-encode — an
            # inner join that silently drops members absent from the
            # corpus (e.g. appended vectors when the caller passes the
            # original source) would be silent data loss
            raise ValueError(
                f"corpus covers {n_covered}/{sizes[cid]} members of cell "
                f"{cid} — pass the full system-of-record (base + appended "
                f"vectors) to split_oversized_cells"
            )
        sample = _collect_train_sample(cell_vecs.select("vec"), "vec", None, seed)
        X = np.asarray(sorted(tuple(r.vec) for r in sample), dtype=np.float64)
        C2 = _lloyd(X, 2, seed)
        cid_a, cid_b = next_cid, next_cid + 1
        next_cid += 2
        pair = [(cid_a, [float(x) for x in C2[0]]), (cid_b, [float(x) for x in C2[1]])]
        assigned = cell_vecs.withColumn("cid", argmin_cid_expr(pair, "vec"))
        child_n = {
            int(r.cid): int(r.n)
            for r in assigned.groupBy("cid").agg(F.count("*").alias("n")).collect()
        }
        if len(child_n) < 2:  # no geometric progress: all members in one child
            unsplittable.append(int(cid))
            next_cid -= 2
            continue
        sub_cents = spark.createDataFrame(pair, "cid int, cvec array<double>")
        res = _residuals(assigned, sub_cents)
        # same residual-binding as build_ivfpq (see comment there)
        codes = F.element_at(
            F.transform(F.array(F.col("rvec")), lambda rv: pq_code_expr(index.pq, rv)),
            1,
        )
        coded_new = res.select("id", "cid", codes.alias("codes"))
        coded_new.repartition("cid").write.mode("append").partitionBy("cid").parquet(
            f"{path}/coded"
        )
        del centroid_map[cid]
        centroid_map[cid_a], centroid_map[cid_b] = pair[0][1], pair[1][1]
        split_info.append({"cid": int(cid), "n": sizes[cid], "into": [cid_a, cid_b]})
        gc_dirs.append(int(cid))
        for c in (cid_a, cid_b):  # children over the cap re-enter the queue
            sizes[c] = child_n[c]
            if child_n[c] > max_rows:
                fat.append(c)
    if not split_info:
        return {
            "split": [],
            "unsplittable": unsplittable,
            "k_cells": len(centroid_map),
        }
    # commit point: probes route by this table from here on
    write_sidecar(
        spark.createDataFrame(
            sorted((c, v) for c, v in centroid_map.items()),
            "cid int, cvec array<double>",
        ),
        f"{path}/centroids",
    )
    for cid in gc_dirs:  # orphan GC
        shutil.rmtree(os.path.join(path, "coded", f"cid={cid}"))
    return {
        "split": split_info,
        "unsplittable": unsplittable,
        "k_cells": len(centroid_map),
    }
