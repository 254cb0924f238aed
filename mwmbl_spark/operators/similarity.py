"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Query side is tiny and broadcast; the corpus scan is a single pass,
  the per-pair kernel is a JVM higher-order function (zip_with +
  aggregate), no shuffle until the final per-query top-k window.
- ``lsh_bucket_topk``: the scale path — deterministic sign-bit LSH
  (random-hyperplane family with md5-derived hyperplanes) buckets the
  corpus; each query probes only its own bucket(s). Approximate; recall
  vs the brute-force baseline is pytest-gated (tests/test_similarity.py).

At 10^12 rows the brute-force plan is a full scan per query batch
(still linear, embarrassingly parallel); the LSH plan prunes the scan
to matching buckets via a shuffle-free broadcast semi join on bucket id.

- ``ivf_topk``: the IVF (coarse-quantizer) scale path — deterministic
  Lloyd training (seed centroids = hash-smallest vec_ids, distributed
  assignment + elementwise-mean refit), then queries probe only the
  ``n_probe`` nearest centroids' inverted lists. Centroid count rises
  with corpus size (sqrt(N) rule of thumb); the probe plan broadcasts
  centroids and queries, so the corpus shuffles exactly once per
  training iteration (groupBy cluster) and never at query time beyond
  the candidate top-k window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark.operators.dedup import hash60


def _dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product in float64 (matches the oracle's
    list_dot_product summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_sim(a: Column, b: Column) -> Column:
    a64 = F.transform(a, lambda x: x.cast("double"))
    b64 = F.transform(b, lambda x: x.cast("double"))
    return _dot(a64, b64) / (F.sqrt(_dot(a64, a64)) * F.sqrt(_dot(b64, b64)))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).
    -> (query_id, vec_id, sim, rank); ties broken by vec_id."""
    q = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
    )
    pairs = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb")).join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id", "vec_id", cosine_sim(F.col("emb"), F.col("q_emb")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("sim", 6).alias("sim"), "rank")
    )


N_HYPERPLANE_BITS = 8


def _sign_projections(vec: Column, n_bits: int = N_HYPERPLANE_BITS) -> Column:
    """array<double> of <v, h_j> per hyperplane j, where h_j has
    components (+1|-1) derived from md5(j || ':' || dim) — code-derived
    constants, no training data, same projections everywhere."""
    def proj(j: int) -> Column:
        signed = F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda x, i: x.cast("double")
            * F.when(
                F.pmod(hash60(F.concat(F.lit(f"{j}:"), i.cast("string"))), F.lit(2)) == 1,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        )
        return F.aggregate(signed, F.lit(0.0), lambda acc, x: acc + x)

    return F.array(*[proj(j) for j in range(n_bits)])


def _bucket_of_projs(projs: Column, n_bits: int = N_HYPERPLANE_BITS) -> Column:
    out = F.lit(0)
    for j in range(n_bits):
        out = out + F.when(F.element_at(projs, j + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out.cast("int")


def _sign_bucket(vec: Column, n_bits: int = N_HYPERPLANE_BITS) -> Column:
    """Deterministic sign-bit bucket: bit j = sign of <v, h_j>.
    Implemented as JVM expressions end to end."""
    return _bucket_of_projs(_sign_projections(vec, n_bits), n_bits)


def _probe_buckets(projs: Column, n_probe: int, n_bits: int = N_HYPERPLANE_BITS) -> Column:
    """Multi-probe bucket list (Lv et al., 'Multi-Probe LSH', VLDB'07):
    the query's own bucket plus the buckets obtained by flipping its
    n_probe-1 LEAST-CONFIDENT bits (smallest |projection| — the planes
    the vector sits closest to, where a near neighbor most likely lands
    on the other side). Lifts recall at the same index/build cost: only
    the query side fans out, the corpus keeps one bucket per vector."""
    base = _bucket_of_projs(projs, n_bits)
    if n_probe <= 1:
        return F.array(base)
    # bit indices ordered by |proj| ascending (struct sort on (|p|, j))
    order = F.transform(
        F.array_sort(
            F.zip_with(
                projs,
                F.sequence(F.lit(0), F.lit(n_bits - 1)),
                lambda p, j: F.struct(F.abs(p).alias("a"), j.alias("j")),
            )
        ),
        lambda s: s["j"],
    )
    pow2 = F.array(*[F.lit(1 << j) for j in range(n_bits)])
    flips = [
        base.bitwiseXOR(F.element_at(pow2, F.element_at(order, i + 1) + 1)).cast("int")
        for i in range(min(n_probe - 1, n_bits))
    ]
    return F.array(base, *flips)


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = N_HYPERPLANE_BITS,
    n_probe: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    sign-bit bucket, plus (``n_probe`` > 1) the Hamming-adjacent buckets
    of its least-confident bits — multi-probe LSH. Probe buckets are
    distinct and a corpus vector lives in exactly one bucket, so no
    (query, vec) pair is scored twice. Same output shape as
    cosine_topk; only the tiny broadcast query side fans out."""
    bucketed = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("emb"),
        _sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    q = (
        embeddings.where(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_emb"),
            _sign_projections(F.col(vec_col), n_bits).alias("projs"),
        )
        .select(
            "query_id",
            "q_emb",
            F.explode(_probe_buckets(F.col("projs"), n_probe, n_bits)).alias("q_bucket"),
        )
    )
    pairs = bucketed.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = pairs.select(
        "query_id", "vec_id", cosine_sim(F.col("emb"), F.col("q_emb")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("sim", 6).alias("sim"), "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file coarse quantizer)
# ---------------------------------------------------------------------------

def _to64(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def ivf_train(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic distributed Lloyd iterations -> (cid, centroid
    array<double>). Seeds = the ``n_centroids`` vectors with the
    smallest md5-derived id hash (data-independent, reproducible —
    no RNG, same centroids on any cluster / partitioning)."""
    seeds = (
        embeddings.select(
            F.col(id_col).alias("vec_id"), _to64(F.col(vec_col)).alias("c")
        )
        .withColumn("h", hash60(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(n_centroids)
    )
    cents = seeds.select(
        (F.row_number().over(Window.orderBy("h", "vec_id")) - 1).alias("cid"), "c"
    )
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), _to64(F.col(vec_col)).alias("v")
    )
    for _ in range(n_iters):
        assigned = _ivf_assign(corpus, cents)
        refit = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("c")
            )
        )
        # empty clusters keep their previous centroid
        cents = (
            cents.select("cid", F.col("c").alias("c_old"))
            .join(refit, "cid", "left")
            .select("cid", F.coalesce("c", "c_old").alias("c"))
            .localCheckpoint(eager=True)  # cut the per-iteration lineage
        )
    return cents


def _ivf_assign(corpus: DataFrame, cents: DataFrame) -> DataFrame:
    """argmax-cosine cluster id per vector — NO shuffle, NO window.

    The centroids are tiny (~sqrt(N) by the IVF sizing rule): collect
    them, L2-normalize driver-side, and fold them into ONE array
    literal; assignment is then a per-row argmax of <v, c'_j> (cosine
    argmax is invariant to the row vector's own norm, so per-row
    normalization drops out entirely). Ties break to the smallest cid
    via the struct max on (sim, -cid), matching the previous
    row_number(sim DESC, cid ASC) semantics.

    The round-2 implementation ranked the N×C crossJoin through a
    window partitioned by the near-unique vec_id — a full shuffle+sort
    of N×C rows per Lloyd iteration and per probe. This plan keeps
    every row in its scan partition (asserted shuffle-free in
    tests/test_plan_quality.py). If C*d outgrows a comfortable plan
    literal (>~1e6 values), switch to groupBy(vec_id).agg(max_by(...))
    over the broadcast join — partial-agg, still no window sort."""
    import math

    rows = sorted(cents.collect(), key=lambda r: r["cid"])
    normed = []
    for r in rows:
        n = math.sqrt(sum(x * x for x in r["c"]))
        normed.append([x / n if n > 0 else 0.0 for x in r["c"]])
    cent_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for c in normed])
    scores = F.transform(cent_lit, lambda c: _dot(F.col("v"), c))
    best = F.array_max(
        F.zip_with(
            scores,
            F.sequence(F.lit(0), F.lit(len(normed) - 1)),
            lambda s, i: F.struct(s.alias("sim"), (-i).alias("ncid")),
        )
    )
    return corpus.select("vec_id", "v", (-best["ncid"]).cast("int").alias("cid"))


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via IVF probe: score only the corpus vectors
    assigned to each query's ``n_probe`` nearest centroids. Same output
    shape as cosine_topk; recall is pytest-gated vs the exact baseline.
    Pass a pre-trained ``centroids`` frame to skip training (the
    production shape: train once, probe per batch)."""
    cents = centroids if centroids is not None else ivf_train(
        embeddings, n_centroids, n_iters, id_col, vec_col
    )
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), _to64(F.col(vec_col)).alias("v")
    )
    assigned = _ivf_assign(corpus, cents)
    q = corpus.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q_emb")
    )
    qsims = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "q_emb", "cid", cosine_sim(F.col("q_emb"), F.col("c")).alias("csim")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cid"))
    probes = (
        qsims.withColumn("rnk", F.row_number().over(wq))
        .where(F.col("rnk") <= n_probe)
        .select("query_id", "q_emb", "cid")
    )
    pairs = assigned.join(
        F.broadcast(probes),
        (assigned["cid"] == probes["cid"]) & (assigned["vec_id"] != probes["query_id"]),
    ).select("query_id", "vec_id", "v", "q_emb")
    scored = pairs.select(
        "query_id", "vec_id", cosine_sim(F.col("v"), F.col("q_emb")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("sim", 6).alias("sim"), "rank")
    )
