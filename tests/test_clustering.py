"""Exemplar/learned topic clustering (operators/similarity.py:
cluster_assign_exact / cluster_profile).

Gates: brute-force cosine-argmax parity on synthetic vectors, the
smallest-cid tie-break, learned-path (ivf_train + _ivf_assign) rank
agreement with the exact expression, and profile arithmetic.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mwmbl_spark.operators.similarity import (
    _ivf_assign,
    cluster_assign_exact,
    cluster_profile,
    ivf_train,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(17)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)]) for i in range(200)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


CENTS = [3, 50, 121]


def _brute(rows, cents):
    cvs = {r["vec_id"]: list(r["embedding"]) for r in rows if r["vec_id"] in cents}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    out = {}
    for r in rows:
        sims = [cos(list(r["embedding"]), cvs[c]) for c in cents]
        best = max(range(len(cents)), key=lambda j: (sims[j], -j))
        out[r["vec_id"]] = (best, round(sims[best], 6))
    return out


def test_exact_assignment_matches_bruteforce(spark, emb):
    rows = emb.collect()
    want = _brute(rows, CENTS)
    got = {
        int(r["vec_id"]): (int(r["cid"]), float(r["sim"]))
        for r in cluster_assign_exact(emb, CENTS).collect()
    }
    assert got == want
    # exemplars land in their own cluster at sim ~ 1
    for j, src in enumerate(CENTS):
        assert got[src][0] == j and got[src][1] == 1.0


def test_tie_breaks_to_smallest_cid(spark):
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # centroids 0 and 1 are IDENTICAL vectors: every doc ties between
    # cid 0 and cid 1 and must pick 0 over 1
    got = {
        int(r["vec_id"]): int(r["cid"])
        for r in cluster_assign_exact(df, [0, 1, 2]).collect()
    }
    assert got[0] == 0 and got[1] == 0
    assert got[2] == 2
    assert got[3] == 0  # exact 45-degree tie between cid 0 and cid 2


def test_missing_centroid_raises(spark, emb):
    with pytest.raises(ValueError, match="999"):
        cluster_assign_exact(emb, [3, 999])


def test_learned_path_rank_agreement(spark, emb):
    """_ivf_assign (pre-normalized literals, dot argmax) must agree with
    the full-cosine expression on non-tie data when given the same
    centroid vectors."""
    cents = ivf_train(emb, n_centroids=4, n_iters=2)
    via_ivf = {
        int(r["vec_id"]): int(r["cid"])
        for r in _ivf_assign(
            emb.select("vec_id", F.col("embedding").alias("v")), cents
        ).collect()
    }
    rows = sorted(cents.collect(), key=lambda r: r["cid"])

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    for r in emb.collect():
        sims = [cos(list(r["embedding"]), list(c["c"])) for c in rows]
        best = max(range(len(rows)), key=lambda j: (sims[j], -j))
        assert via_ivf[int(r["vec_id"])] == best


def test_cluster_profile(spark):
    a = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1)], "vec_id long, cid int"
    ).select("vec_id", "cid", F.lit(1.0).alias("sim"))
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b"), (2, "a"), (3, "x y z w")],
        "doc_id long, text string",
    )
    prof = {
        int(r["cid"]): (int(r["n_docs"]), float(r["share"]), float(r["avg_tokens"]))
        for r in cluster_profile(a, docs).collect()
    }
    assert prof[0] == (3, 0.75, 2.0)
    assert prof[1] == (1, 0.25, 4.0)
    # shares sum to 1
    assert abs(sum(v[1] for v in prof.values()) - 1.0) < 1e-9
