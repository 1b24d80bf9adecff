"""Similarity search over embedding columns (``array<float>``).

- **brute_force_topk**: exact cosine top-k of a (small, broadcast)
  query set against the full corpus — the correctness baseline. One
  scan, no shuffle of the corpus side; per-query top-k via a
  partitioned window.
- **sign_lsh_buckets / lsh_topk**: random-hyperplane (SRP) LSH — the
  scale path. Hyperplane weights are ±1 derived from xxhash64(table,
  plane, dim): deterministic, computed inline JVM-side, no stored
  model. Candidates come from bucket equality joins over L tables;
  exact cosine re-ranks candidates only. Corpus bucketing is a narrow
  map; the join shuffles only (bucket, id) pairs.

At 100 TB the brute-force path is a deliberate full-scan benchmark;
LSH (or the IVF variant in ml/ivf.py) is what runs in production —
both return the same schema so they're swappable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, norm


def _cos_from_norms(a: str, b: str, an: str, bn: str) -> F.Column:
    """cosine(a, b) with the two norms read from precomputed columns —
    bit-identical to functions.vectors.cosine (same folds, same
    product, same try_divide), but each row's norm is computed ONCE
    instead of once per pair (r9: 3 interpreted HOF folds per scored
    pair → 1)."""
    return F.try_divide(dot(a, b), F.col(an) * F.col(bn))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    match_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact top-k cosine neighbors (excluding self) per query.

    ``match_cols`` turns this into *filtered* search: a candidate
    scores only when it agrees with the query on every listed metadata
    column (the production "search within tenant/label/language"
    constraint). The filter becomes part of the join condition — an
    equi-join key instead of a post-filter — so with a partitioned
    corpus the non-matching slices are never scanned, and the
    broadcast stays queries-sized either way."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qe"),
        norm(vec_col).alias("qn"),
        *[F.col(c).alias(f"q_{c}") for c in match_cols],
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("ce"),
        norm(vec_col).alias("cn"),
        *[F.col(col) for col in match_cols],
    )
    if match_cols:
        cond = [F.col(col) == F.col(f"q_{col}") for col in match_cols]
        joined = c.join(F.broadcast(q), cond)
    else:
        joined = c.crossJoin(F.broadcast(q))
    scored = (
        joined.where(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", F.round(_cos_from_norms("qe", "ce", "qn", "cn"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


# hyperplane-weight literal width: vectors up to this many dims take
# the folded-literal fast path; longer ones fall back to per-row hash
# derivation (identical weights either way — same xxhash64 family)
_LSH_DIM_CAP = 256


def _bucket_expr(vec_col: str, planes: int, table: int) -> F.Column:
    """SRP bucket id: ``planes`` sign bits packed into an int. Plane p
    weight for dim d = ±1 from xxhash64('t#p#d') — deterministic and
    DATA-INDEPENDENT, so (r9) the weight table is computed driver-side
    (functions.hashing.xxh64, pinned bit-identical to the JVM
    expression) and folded into the plan as ONE literal: the former
    inline derivation re-ran concat + xxhash64 per (row, plane, dim) —
    tables·planes·dim interpreted hash calls per row (measured: the
    dominant cost of every LSH consumer). The projection keeps the
    same zip-order sequential double fold, so bucket ids are
    bit-identical. Vectors longer than _LSH_DIM_CAP use the original
    per-row derivation (same weights, any width)."""
    import json

    from ..functions.hashing import xxh64

    slow_proj = (
        f"p -> CASE WHEN aggregate(sequence(0, size({vec_col}) - 1), CAST(0.0 AS DOUBLE), "
        f"(acc, d) -> acc + IF(pmod(xxhash64(concat('{table}', '#', CAST(p AS STRING), '#', "
        f"CAST(d AS STRING))), 2) = 0, 1.0, -1.0) * CAST(element_at({vec_col}, d + 1) AS DOUBLE)) "
        f">= 0 THEN 1L ELSE 0L END"
    )
    W = [
        [
            1.0 if xxh64(f"{table}#{p}#{d}".encode()) & 1 == 0 else -1.0
            for d in range(_LSH_DIM_CAP)
        ]
        for p in range(planes)
    ]
    wlit = f"from_json('{json.dumps(W)}', 'array<array<double>>')"
    fast_proj = (
        f"p -> CASE WHEN aggregate(zip_with({vec_col}, "
        f"slice(element_at({wlit}, p + 1), 1, size({vec_col})), "
        f"(x, w) -> w * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), "
        f"(acc, v) -> acc + v) >= 0 THEN 1L ELSE 0L END"
    )
    # empty/corrupt vectors bucket to 0 instead of blowing up:
    # sequence(0, size-1) on size=0 yields [0, -1] and element_at(_, 0)
    # throws under ANSI — guard before evaluating the projection
    return F.expr(
        f"IF(size({vec_col}) < 1, 0L, "
        f"IF(size({vec_col}) > {_LSH_DIM_CAP}, "
        f"aggregate(transform(sequence(0, {planes - 1}), {slow_proj}), 0L, (acc, b) -> acc * 2 + b), "
        f"aggregate(transform(sequence(0, {planes - 1}), {fast_proj}), 0L, (acc, b) -> acc * 2 + b)))"
    )


def sign_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    planes: int = 4,
    tables: int = 8,
) -> DataFrame:
    """Append bucket ids for L hash tables: array ``lsh_buckets[t]``."""
    buckets = F.array(*[_bucket_expr(vec_col, planes, t) for t in range(tables)])
    return df.withColumn("lsh_buckets", buckets)


def _cap_buckets(df: DataFrame, max_bucket: int) -> DataFrame:
    """Skew guard (ported from dedup.minhash_lsh_candidates, which
    solved the same problem at operators/dedup.py:153-158): a bucket of
    b members yields O(b²) join pairs, so one degenerate bucket — e.g.
    zero/constant embeddings that land in bucket 0 of EVERY table —
    goes quadratic at scale. Buckets above the cap are dropped via a
    count window over the bucket key; the window's shuffle partitioning
    is reused by the equality join that follows, so the guard costs no
    extra shuffle. Dropped members still meet through their other,
    non-degenerate tables."""
    w = Window.partitionBy("t", "bucket")
    return (
        df.withColumn("__bucket_n", F.count("*").over(w))
        .where(F.col("__bucket_n") <= max_bucket)
        .drop("__bucket_n")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 4,
    tables: int = 8,
    max_bucket: int = 1000,
) -> DataFrame:
    """Approximate top-k: candidates = bucket collisions in any table,
    re-ranked by exact cosine. Recall grows with ``tables`` and falls
    with ``planes`` (tested ≥0.5@k=5 vs brute force on the fixture,
    whose vectors are near-uniform random — the hardest case for LSH;
    clustered real-world embeddings bucket far better). Corpus buckets
    above ``max_bucket`` are dropped before the candidate join (see
    ``_cap_buckets``) — queries whose only collisions sat in a dropped
    bucket lose those candidates, which is the standard LSH trade: a
    bucket that large is not discriminative anyway."""
    # norms ride from before the table explode: one fold per row
    # instead of one per (table, candidate) pair; distinct() gains two
    # functionally-dependent columns, so its row set is unchanged
    cb = _cap_buckets(
        sign_lsh_buckets(corpus, vec_col, planes, tables)
        .select(
            F.col(id_col).alias("cand_id"),
            F.col(vec_col).alias("ce"),
            norm(vec_col).alias("cn"),
            F.posexplode("lsh_buckets").alias("t", "bucket"),
        ),
        max_bucket,
    )
    qb = (
        sign_lsh_buckets(queries, vec_col, planes, tables)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qe"),
            norm(vec_col).alias("qn"),
            F.posexplode("lsh_buckets").alias("t", "bucket"),
        )
    )
    # cosine is scored BEFORE the duplicate-collision dedup: cos is a
    # pure function of the pair, so distinct() over (ids, cos) yields
    # exactly the rows the former distinct-then-score produced — but
    # the dedup exchange now carries 3 narrow columns instead of two
    # embedding payloads per row (guide §2.3: shuffle keys and
    # metadata, not payloads)
    cands = (
        cb.join(F.broadcast(qb), ["t", "bucket"])
        .where(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", F.round(_cos_from_norms("qe", "ce", "qn", "cn"), 6))
        .select("query_id", "cand_id", "cos")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 4,
    tables: int = 8,
    max_bucket: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH candidates +
    exact-cosine threshold (id_a < id_b). Buckets above ``max_bucket``
    are dropped before the self-join (see ``_cap_buckets``) — without
    the cap one degenerate bucket makes the b²/2 pair expansion
    quadratic at scale. Members of a dropped bucket still pair through
    their other tables; bit-identical embeddings (which collide in ALL
    tables) belong to the exact-dedup path, not this one."""
    # norms computed once per corpus row before the explode (see
    # lsh_topk) — distinct() gains functionally-dependent columns only
    b = _cap_buckets(
        sign_lsh_buckets(corpus, vec_col, planes, tables).select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("e"),
            norm(vec_col).alias("n"),
            F.posexplode("lsh_buckets").alias("t", "bucket"),
        ),
        max_bucket,
    )
    # threshold + score BEFORE the dedup: cos is pair-determined, so
    # distinct() over (id_a, id_b, cos) equals the former
    # distinct-then-score rows — and the dedup exchange shrinks from
    # every colliding candidate pair CARRYING BOTH EMBEDDINGS to just
    # the few over-threshold (id, id, cos) triples (guide §2.3)
    pairs = (
        b.alias("a")
        .join(b.alias("b"), ["t", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                F.try_divide(
                    F.expr(
                        "aggregate(zip_with(a.e, b.e, (x, y) -> "
                        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
                    ),
                    F.col("a.n") * F.col("b.n"),
                ),
                6,
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .distinct()
    )
    return pairs.select("id_a", "id_b", "cos")


def kcenter_select(corpus: DataFrame, k: int) -> DataFrame:
    """Greedy k-center (Gonzalez maxmin) over (vec_id, embedding):
    seed at MIN(vec_id), then k-1 lazy rounds each picking the point
    with the largest min cosine distance to the selected set (ties by
    vec_id). The selected set stays a <=k-row broadcast; each round
    costs one corpus pass — nothing quadratic ever materializes.
    Returns (round, vec_id, maxmin_dist_r), the radius sequence being
    the standard 2-approximation coverage certificate. Used by
    plans/datapipe.dp_coreset_kcenter and the scale harness."""
    seed_id = corpus.agg(F.min("vec_id")).first()[0]
    sel = corpus.where(F.col("vec_id") == seed_id).select(
        F.col("vec_id").alias("s_id"), F.col("embedding").alias("s_emb")
    )
    out = [
        corpus.where(F.col("vec_id") == seed_id).select(
            F.lit(1).cast("int").alias("round"),
            "vec_id",
            F.lit(None).cast("double").alias("maxmin_dist_r"),
        )
    ]
    for r in range(1, k):
        dists = corpus.crossJoin(F.broadcast(sel)).select(
            "vec_id",
            (F.lit(1.0) - cosine("embedding", "s_emb")).alias("d"),
        )
        best = (
            dists.groupBy("vec_id")
            .agg(F.min("d").alias("md"))
            .orderBy(F.col("md").desc(), "vec_id")
            .limit(1)
        )
        out.append(
            best.select(
                F.lit(r + 1).cast("int").alias("round"),
                "vec_id",
                F.round("md", 6).alias("maxmin_dist_r"),
            )
        )
        sel = sel.unionByName(
            corpus.join(
                F.broadcast(best.select(F.col("vec_id").alias("b_id"))),
                F.col("vec_id") == F.col("b_id"),
            ).select(
                F.col("vec_id").alias("s_id"),
                F.col("embedding").alias("s_emb"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("round")
