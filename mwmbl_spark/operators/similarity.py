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

- ``pq_topk`` (+ ``pq_train``/``pq_encode``): the memory-compression
  scale path — product quantization with asymmetric distance
  computation and optional exact refine; see the PQ section below.
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


# ---------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric distance computation — the
# memory-compression scale path (Jégou/Douze/Schmid, "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011; public method).
#
# The corpus is L2-normalized, each d-dim vector split into ``m``
# subvectors, and each subvector replaced by the id of its nearest
# codeword from a per-subspace codebook (k-means in L2) — m small ints
# instead of d floats (d=1024 float32 -> m=8 bytes is 512x). Queries
# stay exact: per query a m x k lookup table of
# <query-subvector, codeword> dot products is precomputed driver-side
# (tiny: m*k doubles per query), and a vector's approximate cosine is
# the sum of m table lookups — a pure JVM expression over the codes
# column, scan-proportional, no shuffle before the final top-k window.
# ``refine`` re-scores the ADC top candidates with exact cosine (the
# standard ADC+refine serving shape: the codes column prunes, the
# original vectors — fetched for only refine*|queries| rows — decide).
# ---------------------------------------------------------------------------


def _unit(vec: Column) -> Column:
    """L2-normalize (zero vectors pass through): cosine == dot on the
    normalized corpus, which is what ADC approximates additively."""
    n = F.sqrt(_dot(vec, vec))
    return F.when(n > 0, F.transform(vec, lambda x: x / n)).otherwise(vec)


def _collect_codebook(codebooks: DataFrame) -> list[list[list[float]]]:
    """-> cbl[sub_id][cid] = codeword (dense, validated)."""
    by: dict[int, dict[int, list[float]]] = {}
    for r in codebooks.collect():
        by.setdefault(int(r["sub_id"]), {})[int(r["cid"])] = [float(x) for x in r["cw"]]
    return [[by[s][c] for c in sorted(by[s])] for s in sorted(by)]


def _flat_codebook(cbl: list[list[list[float]]]):
    """The whole codebook as ONE numpy-backed array literal (plus the
    matching half-norm literal): a single Literal node each, however
    large m*k*d grows. Building the codebook from m*k*d individual
    F.lit/F.array nodes costs tens of seconds of Catalyst/codegen per
    plan (measured flat in data size — pure compile cost); the flat
    form compiles in milliseconds. Layout: codeword (s, c) occupies
    flat[(s*k + c)*sub : +sub]."""
    import numpy as np

    k = len(cbl[0])
    sub = len(cbl[0][0])
    flat = np.array([x for s in cbl for cw in s for x in cw], dtype=np.float64)
    hn = np.array(
        [0.5 * sum(x * x for x in cw) for s in cbl for cw in s], dtype=np.float64
    )
    return F.lit(flat), F.lit(hn), k, sub


def _nearest_code(
    sv: Column, sub_idx: int, flat_lit: Column, hn_lit: Column,
    k: int, sub: int,
) -> Column:
    """Nearest codeword id within STATIC subspace ``sub_idx``: argmin
    L2 == argmax (<sv, cw> - |cw|^2/2); ties break to the smallest cid
    (struct max on (score, -cid), the _ivf_assign convention).
    Codewords come from the flat literal via constant-foldable slices —
    the expression tree stays tiny at any codebook size, per-row work
    is k dots, and assignment needs no join, shuffle, or window. Keep
    the index static: a per-row (Column) index defeats constant folding
    and was measured ~7x slower."""
    idx = F.lit(sub_idx)
    scores = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: _dot(
            sv, F.slice(flat_lit, ((idx * k + j) * sub + 1).cast("int"), sub)
        )
        - F.get(hn_lit, ((idx * k) + j).cast("int")),
    )
    best = F.array_max(
        F.zip_with(
            scores,
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda s, i: F.struct(s.alias("score"), (-i).alias("ncid")),
        )
    )
    return (-best["ncid"]).cast("int")


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace deterministic Lloyd -> (sub_id, cid, cw
    array<double>). Seeds = the ``k_codes`` hash-smallest vectors'
    subvectors (the ivf_train convention: data-independent, no RNG,
    identical on any partitioning). One train per corpus epoch; the
    per-iteration shuffle is the refit groupBy over m*N subvector rows.
    """
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), _unit(_to64(F.col(vec_col))).alias("v")
    )
    first = corpus.select(F.size("v").alias("d")).first()
    if first is None:
        raise ValueError("pq_train: empty embeddings input")
    d = int(first["d"])
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    sub = d // m
    subs = corpus.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.slice("v", i * sub + 1, sub) for i in range(m)])
        ).alias("sub_id", "sv"),
    )
    seeds = (
        corpus.select("vec_id")
        .withColumn("h", hash60(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(k_codes)
        .select(
            "vec_id",
            (F.row_number().over(Window.orderBy("h", "vec_id")) - 1).alias("cid"),
        )
    )
    cb = subs.join(F.broadcast(seeds), "vec_id").select(
        "sub_id", "cid", F.col("sv").alias("cw")
    ).localCheckpoint(eager=True)
    for _ in range(n_iters):
        flat_lit, hn_lit, k_, sub_ = _flat_codebook(_collect_codebook(cb))
        # assignment with STATIC subspace indices (the encode shape):
        # constant-foldable slice offsets into the flat literal are
        # ~7x faster per row than the dynamic sub_id form (measured —
        # dynamic indexing defeats constant folding and re-slices the
        # codebook literal per comparison); codes and subvectors then
        # explode together for the refit
        codes_arr = F.array(
            *[
                _nearest_code(
                    F.slice("v", i * sub + 1, sub), i, flat_lit, hn_lit, k_, sub_
                )
                for i in range(m)
            ]
        )
        slices_arr = F.array(*[F.slice("v", i * sub + 1, sub) for i in range(m)])
        assigned = corpus.select(
            F.posexplode(
                F.arrays_zip(codes_arr.alias("cid"), slices_arr.alias("sv"))
            ).alias("sub_id", "z")
        ).select("sub_id", F.col("z.cid").alias("cid"), F.col("z.sv").alias("sv"))
        refit = (
            assigned.select("sub_id", "cid", F.posexplode("sv").alias("pos", "x"))
            .groupBy("sub_id", "cid", "pos")
            .agg(F.avg("x").alias("mu"))
            .groupBy("sub_id", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mu"))),
                    lambda s: s["mu"],
                ).alias("cw")
            )
        )
        cb = (
            cb.select("sub_id", "cid", F.col("cw").alias("cw_old"))
            .join(refit, ["sub_id", "cid"], "left")
            .select("sub_id", "cid", F.coalesce("cw", "cw_old").alias("cw"))
            .localCheckpoint(eager=True)  # cut per-iteration lineage
        )
    return cb


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (vec_id, codes array<int>): all m codes computed in ONE
    per-row expression over static slices — no explode, no shuffle
    (plan-asserted in tests); at scale this is the column you persist
    next to (or instead of) the raw vectors."""
    cbl = _collect_codebook(codebooks)
    m = len(cbl)
    flat_lit, hn_lit, k_, sub = _flat_codebook(cbl)
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), _unit(_to64(F.col(vec_col))).alias("v")
    )
    codes = [
        _nearest_code(F.slice("v", i * sub + 1, sub), i, flat_lit, hn_lit, k_, sub)
        for i in range(m)
    ]
    return corpus.select("vec_id", F.array(*codes).alias("codes"))


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = 8,
    k_codes: int = 16,
    n_iters: int = 3,
    refine: int | None = None,
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via PQ/ADC, same output shape as cosine_topk.

    Per query the m x k lookup table of subspace dot products is
    computed driver-side and broadcast; a corpus vector's approximate
    cosine is sum(lut[sub_id][codes[sub_id]]) — one zip_with+aggregate
    over the codes column. ``refine=None`` returns ADC estimates as
    ``sim``; ``refine=R`` re-scores each query's ADC top-R with exact
    cosine (joining original vectors for only R*|queries| rows) and
    returns exact sims — recall then depends only on the true neighbors
    reaching the ADC top-R, the standard two-stage serving shape.
    Pass pre-trained ``codebooks`` (+ pre-encoded ``codes``) in
    production: train/encode once per corpus epoch, probe per batch."""
    cb = codebooks if codebooks is not None else pq_train(
        embeddings, m, k_codes, n_iters, id_col, vec_col
    )
    cbl = _collect_codebook(cb)
    m = len(cbl)
    sub = len(cbl[0][0])
    codes_df = codes if codes is not None else pq_encode(embeddings, cb, id_col, vec_col)
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), _unit(_to64(F.col(vec_col))).alias("v")
    )
    qrows = corpus.where(F.col("vec_id").isin(query_ids)).collect()
    spark = embeddings.sparkSession
    luts = []
    for r in qrows:
        q = [float(x) for x in r["v"]]
        lut = [
            [
                sum(a * b for a, b in zip(q[i * sub : (i + 1) * sub], cw))
                for cw in cbl[i]
            ]
            for i in range(m)
        ]
        luts.append((int(r["vec_id"]), lut))
    qdf = spark.createDataFrame(luts, "query_id long, lut array<array<double>>")
    pairs = codes_df.crossJoin(F.broadcast(qdf)).where(
        F.col("vec_id") != F.col("query_id")
    )
    approx = F.aggregate(
        F.zip_with(F.col("codes"), F.col("lut"), lambda c, row: F.get(row, c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pairs.select("query_id", "vec_id", approx.alias("adc_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_sim"), F.asc("vec_id"))
    shortlist = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= (refine if refine is not None else k)
    )
    if refine is None:
        return shortlist.where(F.col("rank") <= k).select(
            "query_id", "vec_id", F.round("adc_sim", 6).alias("sim"), "rank"
        )
    # exact re-rank over the ORIGINAL float vectors through cosine_sim —
    # the same expression (and summation order) as cosine_topk, so a
    # corpus-covering shortlist reproduces the brute-force baseline bit
    # for bit (tests + the pq_refine_topk contract rely on this)
    raw = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb")
    )
    qvec = raw.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    exact = (
        shortlist.select("query_id", "vec_id")
        .join(raw, "vec_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id", "vec_id",
            cosine_sim(F.col("emb"), F.col("q_emb")).alias("sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("sim", 6).alias("sim"), "rank")
    )
