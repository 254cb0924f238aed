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

from mwmbl_spark.operators.dedup import DEFAULT_BAND_CAP, hash60

# embedding_near_duplicates' sign-bucket cap: same constant, same
# rationale as the minhash/simhash band cap (dedup.DEFAULT_BAND_CAP).
DEFAULT_BUCKET_CAP = DEFAULT_BAND_CAP


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
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).
    -> (query_id, vec_id, sim, rank); ties broken by vec_id.

    ``allowed`` (round-5, FILTERED vector search): an (id_col) relation
    restricting the CANDIDATE set — metadata-filtered retrieval
    ("nearest neighbors among label=3 docs"). The filter is a left-semi
    join applied BEFORE scoring, so pushdown reaches the parquet scan
    when the predicate is a column filter; query vectors are looked up
    in the unfiltered table (a query need not satisfy its own filter)."""
    q = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
    )
    corpus = embeddings
    if allowed is not None:
        corpus = corpus.join(allowed.select(id_col), id_col, "left_semi")
    pairs = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb")).join(
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



def _allowed_ids(allowed: DataFrame, id_col: str) -> DataFrame:
    """Normalize a metadata filter relation to a (vec_id) key frame for
    the pre-scoring left-semi join every ANN path shares."""
    return allowed.select(F.col(id_col).alias("vec_id"))


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
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    sign-bit bucket, plus (``n_probe`` > 1) the Hamming-adjacent buckets
    of its least-confident bits — multi-probe LSH. Probe buckets are
    distinct and a corpus vector lives in exactly one bucket, so no
    (query, vec) pair is scored twice. Same output shape as
    cosine_topk; only the tiny broadcast query side fans out.

    ``allowed`` (round-6, FILTERED ANN): an (id_col) relation semi-
    joined against the bucketed corpus BEFORE the bucket join — filtered
    buckets are smaller, never post-filtered, so the top-k is exact
    within the probed buckets of the filtered set. Selective filters
    thin the buckets; raise ``n_probe`` to recover recall."""
    bucketed = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("emb"),
        _sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    if allowed is not None:
        bucketed = bucketed.join(_allowed_ids(allowed, id_col), "vec_id", "left_semi")
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
    smallest md5-derived id hash (data-independent, no RNG).
    Reproducible run-to-run FOR A FIXED INPUT PARTITIONING: the Arrow
    partials are reduced in sorted (sub_id, cid, pid) order, so a
    different partition layout changes float-sum association and can
    move trained centroids at the ulp level (assignments of borderline
    vectors may differ; repartition to a fixed width before training
    when cross-layout bit-identity matters). Each
    iteration is ONE Arrow pass emitting per-partition (sum, count)
    partials + an O(C*partitions) driver reduce — no shuffle (see
    _arrow_lloyd_partials; assignment argmaxes cosine, i.e. dot
    against L2-normalized centroids, the _ivf_assign convention;
    refit means stay unnormalized)."""
    import numpy as np

    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), _to64(F.col(vec_col)).alias("v")
    )
    seed_rows = (
        corpus.withColumn("h", hash60(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(n_centroids)
        .collect()
    )
    cbl = [[[float(x) for x in r["v"]] for r in seed_rows]]  # m=1, sub=d
    vcol = corpus.select("v").localCheckpoint(eager=True)
    for _ in range(n_iters):
        rows = _arrow_lloyd_partials(vcol, np.array(cbl), "cos").collect()
        cbl = _reduce_partials(rows, cbl)
    vcol.unpersist(blocking=True)
    return embeddings.sparkSession.createDataFrame(
        [(c, cw) for c, cw in enumerate(cbl[0])], "cid int, c array<double>"
    )


def _chunked_argmax_pd_factory(mat, offsets=None, m: int | None = None):
    """Arrow argmax kernel shared by assignment and PQ encoding,
    BIT-IDENTICAL to the expression forms (_ivf_assign's struct-max /
    _nearest_code): scores sum products via np.cumsum along the dim
    axis — the same left-fold float association as Spark's aggregate —
    and np.argmax's first-max tie rule equals the struct max on
    (score, -cid) (both pick the smallest id). Vectorized in row
    chunks so a 2M-row corpus is dense numpy work instead of
    interpreted HOF evaluation (round-6: the 2M hybrid bench measured
    the expression encode dominating ivfpq build cost).

    ``mat`` (k, d): one codeword table -> pandas_udf int (assignment).
    ``mat`` (m, k, sub) with ``m`` set -> pandas_udf array<int> (one
    code per subspace; ``offsets`` is the (m, k) half-norm table
    subtracted after the fold, the _nearest_code score)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    mat = np.asarray(mat, dtype=np.float64)
    offs = None if offsets is None else np.asarray(offsets, dtype=np.float64)
    chunk_rows = 1024

    def _chunks(vs):
        vals = list(vs)
        for i in range(0, len(vals), chunk_rows):
            yield np.array(
                [np.asarray(v, dtype=np.float64) for v in vals[i:i + chunk_rows]]
            )

    if m is None:

        @pandas_udf(IntegerType())
        def assign_pd(vs):
            import pandas as pd

            out = []
            for a in _chunks(vs):
                scores = np.cumsum(a[:, None, :] * mat[None, :, :], axis=2)[:, :, -1]
                out.extend(np.argmax(scores, axis=1).astype("int32"))
            return pd.Series(out, dtype="int32")

        return assign_pd

    k, sub = mat.shape[1], mat.shape[2]

    @pandas_udf(ArrayType(IntegerType()))
    def codes_pd(vs):
        import pandas as pd

        out = []
        for a in _chunks(vs):
            r3 = a.reshape(a.shape[0], m, sub)
            prods = r3[:, :, None, :] * mat[None, :, :, :]
            scores = np.cumsum(prods, axis=3)[..., -1]
            if offs is not None:
                scores = scores - offs[None, :, :]
            out.extend(list(np.argmax(scores, axis=2).astype("int32")))
        return pd.Series(out)

    return codes_pd


def _ivf_assign(corpus: DataFrame, cents: DataFrame) -> DataFrame:
    """argmax-cosine cluster id per vector — NO shuffle, NO window.

    The centroids are tiny (~sqrt(N) by the IVF sizing rule): collect
    and L2-normalize them driver-side; assignment is a per-row argmax
    of <v, c'_j> (cosine argmax is invariant to the row vector's own
    norm, so per-row normalization drops out entirely). Ties break to
    the smallest cid (np.argmax first-max — identical to the former
    struct max on (sim, -cid) and the row_number(sim DESC, cid ASC)
    reference, pinned in tests/test_plan_quality.py).

    Round-6: the argmax runs in the Arrow kernel
    (_chunked_argmax_pd_factory) instead of a C-way HOF expression —
    Catalyst HOFs evaluate interpreted and projection collapse
    re-inlined the normalize lineage into every centroid's dot,
    making corpus-grain assignment the ivfpq build bottleneck at 2M
    docs. Still shuffle-free (plan-asserted): ArrowEvalPython is a
    projection, not an Exchange."""
    import math

    rows = sorted(cents.collect(), key=lambda r: r["cid"])
    normed = []
    for r in rows:
        n = math.sqrt(sum(x * x for x in r["c"]))
        normed.append([x / n if n > 0 else 0.0 for x in r["c"]])
    assign_pd = _chunked_argmax_pd_factory(normed)
    return corpus.select("vec_id", "v", assign_pd(F.col("v")).alias("cid"))


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
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via IVF probe: score only the corpus vectors
    assigned to each query's ``n_probe`` nearest centroids. Same output
    shape as cosine_topk; recall is pytest-gated vs the exact baseline.
    Pass a pre-trained ``centroids`` frame to skip training (the
    production shape: train once, probe per batch).

    ``allowed`` (round-6): metadata filter semi-joined against the
    assigned corpus BEFORE probing/scoring (never post-filtered).
    Training still sees the full corpus — the quantizer is a corpus
    artifact, the filter is a per-query predicate."""
    cents = centroids if centroids is not None else ivf_train(
        embeddings, n_centroids, n_iters, id_col, vec_col
    )
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), _to64(F.col(vec_col)).alias("v")
    )
    assigned = _ivf_assign(corpus, cents)
    if allowed is not None:
        assigned = assigned.join(_allowed_ids(allowed, id_col), "vec_id", "left_semi")
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
    normalized corpus, which is what ADC approximates additively.

    EXPRESSION form — use only at query-batch grain. Catalyst
    projection collapse re-inlines the O(d) norm aggregate into every
    element's division (O(d^2) interpreted evaluation per row, HOFs
    never codegen) and again into every downstream consumer; at corpus
    grain use ``_unit_corpus``, whose Arrow barrier stops the collapse
    (round-6: the 2M-doc hybrid bench found ivfpq_train spending
    half an hour inside this expression's interpreted eval)."""
    n = F.sqrt(_dot(vec, vec))
    return F.when(n > 0, F.transform(vec, lambda x: x / n)).otherwise(vec)


def _unit_pd_factory():
    """Arrow-barrier L2 normalizer, BIT-IDENTICAL to ``_unit``: the
    squared norm sums via ``np.cumsum`` (sequential left-fold — the
    same float association as Spark's ``aggregate`` and the oracles'
    ordered ``list_aggregate``; ``np.sum``'s pairwise blocking would
    drift at the ulp and break the value-gated ANN contracts), and the
    division is the same elementwise ``x / sqrt(nsq)``."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    @pandas_udf(ArrayType(DoubleType()))
    def _unit_pd(vecs):
        import numpy as np
        import pandas as pd

        out = []
        for v in vecs:
            a = np.asarray(v, dtype=np.float64)
            nsq = float(np.cumsum(a * a)[-1]) if a.size else 0.0
            out.append(a / np.sqrt(nsq) if nsq > 0 else a)
        return pd.Series(out)

    return _unit_pd


def _arrow_lloyd_partials(corpus: DataFrame, cb_np, metric: str) -> DataFrame:
    """One Lloyd iteration's assignment + per-partition partial sums in a
    single Arrow pass — the map-side combine shape MLlib's KMeans uses
    (treeAggregate of per-partition (sum, count) pairs), here as
    mapInPandas so the inner loop is numpy matmuls instead of N*d
    exploded rows through two shuffled groupBys (the first-cut refit:
    ~15 s/iteration at 20k x 64-d; this path is sub-second).

    ``corpus`` must have a single ``v`` array<double> column; ``cb_np``
    is the (m, k, sub) float64 codebook (m=1, sub=d for IVF).
    ``metric``: 'l2' assigns by argmax(<sv, cw> - |cw|^2/2) — nearest-
    in-L2, the PQ convention; 'cos' assigns by argmax(<v, cw/|cw|>) —
    the _ivf_assign convention (row norm drops out of the argmax). Ties
    break to the smallest cid (np.argmax first-max == the struct-max
    (score, -cid) convention of the expression paths).

    Output: (pid, sub_id, cid, s array<double>, n long) partial sums —
    at most m*k rows per partition, so the driver-side reduce in
    ``_reduce_partials`` is O(m*k*partitions), never O(N).
    """
    import numpy as np

    m, k, sub = cb_np.shape
    if metric == "cos":
        norms = np.sqrt(np.einsum("mks,mks->mk", cb_np, cb_np))
        cb_assign = cb_np / np.where(norms > 0, norms, 1.0)[:, :, None]
        hn = np.zeros((m, k))
    else:
        cb_assign = cb_np
        hn = 0.5 * np.einsum("mks,mks->mk", cb_np, cb_np)

    def gen(it):
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        s_acc = np.zeros((m, k, sub))
        n_acc = np.zeros((m, k), dtype=np.int64)
        for pdf in it:
            if not len(pdf):
                continue
            vr = np.stack(pdf["v"].to_numpy()).reshape(len(pdf), m, sub)
            scores = np.einsum("nms,mks->nmk", vr, cb_assign) - hn[None]
            cids = scores.argmax(axis=2)  # (n, m); first max = smallest cid
            for i in range(m):
                onehot = cids[:, i, None] == np.arange(k)[None, :]
                s_acc[i] += onehot.T.astype(np.float64) @ vr[:, i, :]
                n_acc[i] += onehot.sum(axis=0)
        rows = [
            (pid, i, c, s_acc[i, c].tolist(), int(n_acc[i, c]))
            for i in range(m)
            for c in range(k)
            if n_acc[i, c]
        ]
        yield pd.DataFrame(rows, columns=["pid", "sub_id", "cid", "s", "n"])

    return corpus.mapInPandas(
        gen, schema="pid int, sub_id int, cid int, s array<double>, n long"
    )


def _reduce_partials(rows, cbl: list[list[list[float]]]) -> list[list[list[float]]]:
    """Fold the tiny partial-sum frame into new codewords driver-side.
    Partials are summed in sorted (sub_id, cid, pid) order so the float
    accumulation order — hence the trained codebook — is deterministic
    for a given input partitioning. Empty clusters keep their previous
    codeword (the expression path's coalesce(cw, cw_old) convention)."""
    acc: dict[tuple[int, int], tuple[list[float], int]] = {}
    for r in sorted(rows, key=lambda r: (r["sub_id"], r["cid"], r["pid"])):
        key = (int(r["sub_id"]), int(r["cid"]))
        if key in acc:
            s, n = acc[key]
            acc[key] = ([a + b for a, b in zip(s, r["s"])], n + int(r["n"]))
        else:
            acc[key] = ([float(x) for x in r["s"]], int(r["n"]))
    return [
        [
            [x / acc[(i, c)][1] for x in acc[(i, c)][0]] if (i, c) in acc else cw
            for c, cw in enumerate(subspace)
        ]
        for i, subspace in enumerate(cbl)
    ]


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
        [x for row in _half_norms(cbl) for x in row], dtype=np.float64
    )
    return F.lit(flat), F.lit(hn), k, sub


def _half_norms(cbl: list[list[list[float]]]) -> list[list[float]]:
    """|cw|^2/2 per (subspace, code) — ONE arithmetic shared by the
    expression literal and the Arrow kernel (Python left-fold sum), so
    the two encode paths subtract bit-identical offsets."""
    return [[0.5 * sum(x * x for x in cw) for cw in s] for s in cbl]


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
    normalize: bool = True,
) -> DataFrame:
    """Per-subspace deterministic Lloyd -> (sub_id, cid, cw
    array<double>). Seeds = the ``k_codes`` hash-smallest vectors'
    subvectors (the ivf_train convention: data-independent, no RNG;
    like ivf_train, trained codewords are deterministic only for a
    fixed input partitioning — the partial reduce sums floats in
    (sub_id, cid, pid) order). One train per corpus epoch; each
    iteration is ONE Arrow pass over the corpus emitting per-partition
    (sum, count) partials plus an O(m*k*partitions) driver reduce — no
    per-iteration shuffle at all (see _arrow_lloyd_partials).
    ``normalize=False`` trains on the raw vectors — the IVF-PQ residual
    path, where the input is already a residual in unit-sphere space."""
    import numpy as np

    vexpr = _to64(F.col(vec_col))
    corpus = (
        _unit_corpus(embeddings, id_col, vec_col)  # Arrow barrier, see _unit
        if normalize
        else embeddings.select(F.col(id_col).alias("vec_id"), vexpr.alias("v"))
    )
    first = corpus.select(F.size("v").alias("d")).first()
    if first is None:
        raise ValueError("pq_train: empty embeddings input")
    d = int(first["d"])
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    sub = d // m
    seed_rows = (
        corpus.withColumn("h", hash60(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(k_codes)
        .collect()
    )
    cbl = [
        [[float(x) for x in r["v"][i * sub : (i + 1) * sub]] for r in seed_rows]
        for i in range(m)
    ]
    # materialize the normalized corpus once: every iteration re-scans
    # it, and at web scale train runs on a bounded sample anyway
    vcol = corpus.select("v").localCheckpoint(eager=True)
    for _ in range(n_iters):
        rows = _arrow_lloyd_partials(vcol, np.array(cbl), "l2").collect()
        cbl = _reduce_partials(rows, cbl)
    vcol.unpersist(blocking=True)
    return embeddings.sparkSession.createDataFrame(
        [(i, c, cw) for i, s in enumerate(cbl) for c, cw in enumerate(s)],
        "sub_id int, cid int, cw array<double>",
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
    arrow: bool = True,
) -> DataFrame:
    """-> (vec_id, codes array<int>): all m codes per row, no explode,
    no shuffle (plan-asserted in tests); at scale this is the column
    you persist next to (or instead of) the raw vectors.

    ``arrow=True`` (round-6 default) computes the codes in the chunked
    numpy kernel — corpus-grain encoding is dense matmul work, and the
    HOF expression form evaluates interpreted (the 2M-doc bench found
    it dominating ivfpq build). ``arrow=False`` keeps the expression
    path (_nearest_code over static slices) as the bit-parity twin;
    tests/test_training_ops.py pins arrow == expression codes."""
    cbl = _collect_codebook(codebooks)
    m = len(cbl)
    vexpr = _to64(F.col(vec_col))
    corpus = (
        _unit_corpus(embeddings, id_col, vec_col)  # Arrow barrier, see _unit
        if normalize
        else embeddings.select(F.col(id_col).alias("vec_id"), vexpr.alias("v"))
    )
    if arrow:
        codes_pd = _chunked_argmax_pd_factory(cbl, offsets=_half_norms(cbl), m=m)
        return corpus.select("vec_id", codes_pd(F.col("v")).alias("codes"))
    flat_lit, hn_lit, k_, sub = _flat_codebook(cbl)
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
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via PQ/ADC, same output shape as cosine_topk.

    ``allowed`` (round-6, FILTERED ANN): semi-joined against the codes
    column BEFORE ADC scoring — the shortlist is drawn entirely from
    the filtered set, so no over-fetch is needed for post-filter
    attrition (there is none); ``refine`` re-ranks filtered candidates
    only. Codebooks still train on the full corpus.

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
    if allowed is not None:
        codes_df = codes_df.join(_allowed_ids(allowed, id_col), "vec_id", "left_semi")
    corpus = _unit_corpus(embeddings, id_col, vec_col)
    qrows = corpus.where(F.col("vec_id").isin(query_ids)).collect()
    spark = embeddings.sparkSession
    # LUTs for the whole query batch in one einsum: (Q, m, sub) x
    # (m, k, sub) -> (Q, m, k). Driver cost is a dense matmul, not a
    # Python loop — flat to 10k+ query batches.
    import numpy as np

    cb_np = np.array(cbl, dtype=np.float64)
    luts = []
    if qrows:
        qm = np.stack([np.asarray(r["v"], dtype=np.float64) for r in qrows])
        lut_all = np.einsum("qms,mks->qmk", qm.reshape(len(qrows), m, sub), cb_np)
        luts = [
            (int(r["vec_id"]), lut_all[qi].tolist())
            for qi, r in enumerate(qrows)
        ]
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
    return _exact_rerank(shortlist, embeddings, query_ids, k, id_col, vec_col)


def _exact_rerank(
    shortlist: DataFrame,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact re-rank of a (query_id, vec_id) shortlist over the ORIGINAL
    float vectors through cosine_sim — the same expression (and
    summation order) as cosine_topk, so a corpus-covering shortlist
    reproduces the brute-force baseline bit for bit (tests + the
    pq_refine_topk / ivfpq_refine_topk contracts rely on this)."""
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


# ---------------------------------------------------------------------------
# IVF-PQ (IVFADC) — coarse quantizer + product quantization of RESIDUALS
# (Jégou/Douze/Schmid, TPAMI 2011, §III; public method). The coarse
# centroid absorbs the vector's position on the sphere, the PQ codebook
# only has to model the (much lower-energy) residual v - c(v), so the
# same m bytes/vector buy materially better ADC fidelity than plain PQ
# on unclustered data. Query-time: probe the n_probe nearest coarse
# lists; within a list, approx <q, v> = <q, c> (per-probe constant,
# computed driver-side) + sum_i lut_q[i][code_i] (shared residual LUT).
# The corpus-side plan is identical in shape to pq_topk's: a broadcast
# probe frame joined on the tiny cid key, one scan over the codes
# column, no shuffle before the final per-query top-k window.
# ---------------------------------------------------------------------------


def _residuals(unit_corpus: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cid, r): residual of each unit vector against its
    assigned coarse centroid (assignment = cosine argmax, the
    _ivf_assign convention; the residual reference point is the RAW
    mean centroid, matching the query-side offset <q, c>)."""
    assigned = _ivf_assign(unit_corpus, cents)
    return assigned.join(F.broadcast(cents), "cid").select(
        "vec_id", "cid", F.zip_with("v", "c", lambda a, b: a - b).alias("r")
    )


def _unit_corpus(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Corpus-grain normalize behind an Arrow barrier (see _unit): one
    vectorized pass, and the ArrowEvalPython node is a projection
    barrier, so downstream HOF consumers (assign/residual/encode) see a
    plain column instead of re-inlining the norm lineage."""
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        _unit_pd_factory()(_to64(F.col(vec_col))).alias("v"),
    )


def ivfpq_train(
    embeddings: DataFrame,
    n_centroids: int = 16,
    m: int = 8,
    k_codes: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """-> (centroids, residual codebooks). The coarse quantizer trains
    on the L2-normalized corpus (so centroids live where the cosine
    geometry is); the PQ codebooks train on residuals with
    normalize=False (a residual is a displacement, not a direction —
    re-normalizing it would destroy the decomposition)."""
    unit = _unit_corpus(embeddings, id_col, vec_col)
    cents = ivf_train(unit, n_centroids, n_iters, id_col="vec_id", vec_col="v")
    # materialize residuals ONCE: pq_train fires several actions (dim
    # check, seed collect, corpus checkpoint) and each would otherwise
    # re-evaluate the C-way argmax + centroid join lineage over the
    # whole corpus
    resid = _residuals(unit, cents).localCheckpoint(eager=True)
    cb = pq_train(
        resid, m, k_codes, n_iters, id_col="vec_id", vec_col="r", normalize=False
    )
    resid.unpersist(blocking=True)
    return cents, cb


def ivfpq_encode(
    embeddings: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (vec_id, cid, codes array<int>): coarse list id + m residual
    codes, all per-row expressions over a broadcast centroid join —
    no shuffle (the pq_encode static-slice shape)."""
    cbl = _collect_codebook(codebooks)
    m = len(cbl)
    resid = _residuals(_unit_corpus(embeddings, id_col, vec_col), centroids)
    codes_pd = _chunked_argmax_pd_factory(cbl, offsets=_half_norms(cbl), m=m)
    return resid.select("vec_id", "cid", codes_pd(F.col("r")).alias("codes"))


def ivfpq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    n_iters: int = 3,
    refine: int | None = None,
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via IVFADC, same output shape as cosine_topk.

    ``allowed`` (round-6, FILTERED ANN — the production predicate+ANN
    mode): the filter is semi-joined against the ENCODED corpus before
    ADC scoring, so probed lists shrink to their filtered members and
    the ADC shortlist contains only allowed ids — filter-then-score,
    never score-then-filter, hence no over-fetch multiplier for
    attrition. Residual recall risk is probe-side only (a selective
    filter can empty a probed list); raise ``n_probe`` for very
    selective filters. With probe-all + corpus-covering ``refine`` the
    result is exactly ``cosine_topk(allowed=)`` (the
    ivfpq_filtered_topk contract). Train/encode remain corpus
    artifacts, unfiltered.

    Driver-side per query (all tiny): the m x k residual LUT, and the
    per-probe constant <q, c> for the n_probe coarse centroids nearest
    by cosine (desc, cid asc — the ivf_topk probe convention). The
    broadcast probe frame joins the codes column on cid, so only probed
    lists are scored; ``refine=R`` re-ranks the ADC top-R exactly via
    _exact_rerank (probe-all + corpus-covering R reproduces the
    brute-force baseline bit for bit — the ivfpq_refine_topk contract).
    Pass pre-trained ``centroids``/``codebooks`` (+ ``codes``) in
    production: train/encode per corpus epoch, probe per batch."""
    import numpy as np

    if centroids is None or codebooks is None:
        centroids, codebooks = ivfpq_train(
            embeddings, n_centroids, m, k_codes, n_iters, id_col, vec_col
        )
    codes_df = (
        codes
        if codes is not None
        else ivfpq_encode(embeddings, centroids, codebooks, id_col, vec_col)
    )
    if allowed is not None:
        codes_df = codes_df.join(_allowed_ids(allowed, id_col), "vec_id", "left_semi")
    cbl = _collect_codebook(codebooks)
    m = len(cbl)
    sub = len(cbl[0][0])
    cvecs = [
        (int(r["cid"]), [float(x) for x in r["c"]])
        for r in sorted(centroids.collect(), key=lambda r: int(r["cid"]))
    ]
    unit = _unit_corpus(embeddings, id_col, vec_col)
    qrows = unit.where(F.col("vec_id").isin(query_ids)).collect()
    # whole-batch driver math as dense matmuls (flat to 10k+ queries):
    # residual LUTs (Q, m, k) by einsum, centroid dots (Q, C) by GEMM;
    # probe order = cosine desc, cid asc (centroids sorted by cid above,
    # so stable argsort on -cosine lands ties on the smaller cid)
    probe_rows = []
    if qrows:
        cb_np = np.array(cbl, dtype=np.float64)
        cmat = np.array([c for _, c in cvecs], dtype=np.float64)
        cnorm = np.linalg.norm(cmat, axis=1)
        cnorm_safe = np.where(cnorm > 0, cnorm, 1.0)
        qm = np.stack([np.asarray(r["v"], dtype=np.float64) for r in qrows])
        lut_all = np.einsum("qms,mks->qmk", qm.reshape(len(qrows), m, sub), cb_np)
        dots = qm @ cmat.T  # (Q, C) offsets <q, c_raw>
        csim = np.where(cnorm > 0, dots / cnorm_safe, 0.0)
        order = np.argsort(-csim, axis=1, kind="stable")
        for qi, r in enumerate(qrows):
            lut = lut_all[qi].tolist()
            for ci in order[qi, :n_probe]:
                cid = cvecs[int(ci)][0]
                probe_rows.append(
                    (int(r["vec_id"]), cid, float(dots[qi, ci]), lut)
                )
    qdf = embeddings.sparkSession.createDataFrame(
        probe_rows,
        "query_id long, cid int, offset double, lut array<array<double>>",
    )
    pairs = codes_df.join(F.broadcast(qdf), "cid").where(
        F.col("vec_id") != F.col("query_id")
    )
    approx = F.col("offset") + F.aggregate(
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
    return _exact_rerank(shortlist, embeddings, query_ids, k, id_col, vec_col)


def cluster_assign_exact(
    embeddings: DataFrame,
    centroid_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus topic clustering against FIXED exemplar centroids (corpus
    vectors chosen by id — the cross-engine-pinnable form; ``ivf_train``
    + ``_ivf_assign`` is the learned-centroid path): (vec_id, cid, sim),
    cid j = argmax-cosine against ``centroid_ids[j]``'s vector, ties to
    the smallest cid.

    Training-pipeline use: topic buckets for mixture balancing
    (feed cid into sampling.temperature_mix / quota_sample exactly like
    a language column). Shuffle-free like _ivf_assign: centroids fold
    into plan literals, each row computes k cosines in place — but
    through the FULL ``cosine_sim`` expression (dot / (sqrt·sqrt), the
    oracle's own operation order) rather than pre-normalized literals,
    so scores are bitwise-reproducible in ANSI SQL (contract
    cluster_assign)."""
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb")
    )
    got = {
        r["vec_id"]: [float(x) for x in r["emb"]]
        for r in corpus.where(F.col("vec_id").isin(list(centroid_ids))).collect()
    }
    missing = [i for i in centroid_ids if i not in got]
    if missing:
        raise ValueError(f"centroid ids not in corpus: {missing}")
    sims = F.array(
        *[
            cosine_sim(
                F.col("emb"), F.array(*[F.lit(x) for x in got[src]])
            )
            for src in centroid_ids
        ]
    )
    best = F.array_max(
        F.zip_with(
            sims,
            F.sequence(F.lit(0), F.lit(len(centroid_ids) - 1)),
            lambda s, i: F.struct(s.alias("sim"), (-i).alias("ncid")),
        )
    )
    return corpus.select(
        "vec_id",
        (-best["ncid"]).cast("int").alias("cid"),
        F.round(best["sim"], 6).alias("sim"),
    )


def cluster_profile(
    assignments: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-cluster rollup for mixture planning: (cid, n_docs, share
    [, avg_tokens]) — one map-side-combined aggregation; the optional
    docs join adds mean token counts (the budget temperature_mix
    weights against)."""
    from mwmbl_spark.functions.tokenize import tokenize_pd

    a = assignments
    if docs is not None:
        a = a.join(
            docs.select(
                F.col(id_col).alias("vec_id"),
                F.size(tokenize_pd(F.col(text_col))).alias("n_tokens"),
            ),
            "vec_id",
        )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if docs is not None:
        aggs.append(F.avg("n_tokens").alias("avg_tokens"))
    prof = a.groupBy("cid").agg(*aggs)
    total = F.sum("n_docs").over(Window.partitionBy())
    return prof.withColumn(
        "share", F.round(F.col("n_docs") / total, 6)
    ).orderBy("cid")


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = N_HYPERPLANE_BITS,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (doc_a, doc_b, sim) for
    same-sign-bucket vector pairs with cosine >= threshold — the
    embedding-space sibling of minhash_near_duplicates, with the same
    output shape so pairs pipe straight into resolve_duplicate_groups /
    apply_dedup.

    The deterministic sign-bucket (md5-derived hyperplanes, shared with
    lsh_bucket_topk) prunes the quadratic pair space to within-bucket
    self-joins: one shuffle of (id, vector, bucket) on the bucket key,
    ~N^2/2^n_bits candidate pairs instead of N^2. Near-duplicates agree
    on high-|projection| planes with probability -> 1, so recall loss
    concentrates on borderline pairs (split-plane near-ties) — raise
    n_bits with corpus size (2^n_bits ~ N/target_bucket) and/or run
    multiple plane families unioned if the threshold is low.
    ``bucket_cap`` reuses cap_bands and DEFAULTS ON (the minhash/simhash
    sibling convention, DEFAULT_BAND_CAP): one degenerate sign-bucket —
    the all-zeros embedding, any constant-embedding run, a dead encoder
    — would otherwise turn the self-join silently quadratic. Capped
    buckets are dropped WHOLE with a logged WARNING, never silently;
    pass ``bucket_cap=None`` only when the bucket histogram is known."""
    bucketed = embeddings.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("emb"),
        _sign_bucket(F.col(vec_col), n_bits).alias("band_key"),
    )
    if bucket_cap is not None:
        from mwmbl_spark.operators.dedup import cap_bands

        bucketed = cap_bands(bucketed, bucket_cap)
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = a.join(b, "band_key").where(F.col("a.doc_id") < F.col("b.doc_id"))
    sim = cosine_sim(F.col("a.emb"), F.col("b.emb"))
    return (
        pairs.where(sim >= F.lit(threshold))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(sim, 6).alias("sim"),
        )
    )
