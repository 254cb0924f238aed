"""Training-data operators: dedup families, similarity search, text
analysis, multimodal plumbing."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mwmbl_spark.functions.text_quality import (
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    token_counts,
)
from mwmbl_spark.multimodal import (
    attach_fake_payload,
    decode_image_meta,
    decode_image_real,
    frame_sample_stub,
    resize_stub,
)
from mwmbl_spark.operators.dedup import (
    exact_duplicates,
    minhash_near_duplicates,
    simhash,
    simhash_near_duplicates,
)
from mwmbl_spark.operators.similarity import cosine_topk, lsh_bucket_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup
        (3, "completely different text about spark engines"),
        (4, "der schnelle braune fuchs und die katze"),
        (5, "el rapido zorro marron y la gata que corre"),
        (6, "the quick brown fox jumps over the lazy dog today"),  # near dup
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    out = {(r["doc_id"], r["keep_id"]) for r in exact_duplicates(docs).collect()}
    assert out == {(0, 0), (1, 0)}


def test_minhash_finds_near_dups(docs):
    out = minhash_near_duplicates(docs, threshold=0.5).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    # 2 and 6 are one-token edits of 0: high but < 1.0 jaccard
    assert any(p in pairs for p in [(0, 2), (0, 6), (1, 2), (1, 6)])
    assert all(a < b for a, b in pairs)
    assert (3, 4) not in pairs


def test_simhash_identical_docs_equal_sig(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sigs[0] == sigs[1]
    assert 0 <= sigs[0] < (1 << 60)


def test_simhash_near_duplicates(docs):
    out = simhash_near_duplicates(docs, max_hamming=10).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out}
    assert pairs.get((0, 1)) == 0
    assert (3, 4) not in pairs


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(8, 16)).astype(np.float32)
    rows = []
    for i in range(8):
        rows.append((i, [float(x) for x in base[i]]))
    # 8..11: small perturbations of 0..3 (guaranteed near neighbors)
    for i in range(4):
        v = base[i] + rng.normal(scale=0.01, size=16).astype(np.float32)
        rows.append((8 + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(embeddings):
    out = cosine_topk(embeddings, query_ids=[0, 1], k=3)
    res = {}
    for r in out.collect():
        res.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["sim"]))
    top0 = sorted(res[0])[0]
    assert top0[1] == 8 and top0[2] > 0.999  # perturbed twin wins
    top1 = sorted(res[1])[0]
    assert top1[1] == 9


def test_cosine_topk_matches_numpy(embeddings):
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in embeddings.collect()}
    out = cosine_topk(embeddings, query_ids=[2], k=5).orderBy("rank").collect()
    sims = {}
    q = rows[2]
    for vid, v in rows.items():
        if vid == 2:
            continue
        sims[vid] = float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
    want = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [r["vec_id"] for r in out] == [v for v, _ in want]
    for r, (_, s) in zip(out, want):
        assert abs(r["sim"] - s) < 1e-5


def test_lsh_bucket_recall(embeddings):
    """Single-probe LSH must find the perturbed twin (same bucket with
    overwhelming probability at 0.01 noise)."""
    out = lsh_bucket_topk(embeddings, query_ids=[0], k=3).orderBy("rank").collect()
    assert out and out[0]["vec_id"] == 8


def test_lang_id_and_quality(spark, docs):
    out = {
        r["doc_id"]: (r["lang"], r["quality"])
        for r in docs.select(
            "doc_id",
            lang_id_expr(F.col("text")).alias("lang"),
            quality_score_expr(F.col("text")).alias("quality"),
        ).collect()
    }
    assert out[0][0] == "en"
    assert out[4][0] == "de"
    assert out[5][0] == "es"
    assert out[7][0] == "unknown"
    assert all(0.0 <= q <= 1.0 for _, q in out.values())


def test_token_counts_and_fingerprint(spark):
    df = spark.createDataFrame(
        [(0, "Hello, world! 42 times"), (1, "world Hello, ! 42 times"), (2, "")],
        "doc_id long, text string",
    )
    tc = token_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", tc["n_ws_tokens"].alias("ws"), tc["n_bpe_tokens"].alias("bpe"),
            fingerprint_expr(F.col("text")).alias("fp"),
        ).collect()
    }
    assert out[0]["ws"] == 4
    assert out[0]["bpe"] == 6  # hello , world ! 42 times
    assert out[2]["ws"] == 0 and out[2]["fp"] == 0
    # order sensitivity: same bag of tokens, different order -> different fp
    assert out[0]["fp"] != out[1]["fp"]


def test_multimodal_plumbing(spark, docs):
    media = attach_fake_payload(docs.where("doc_id < 4"))
    meta = {r["doc_id"]: r for r in decode_image_meta(media).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for d, r in meta.items():
        n = len(texts[d].encode())
        assert r["n_bytes"] == n
        assert r["width"] == n % 64 + 1
        assert r["height"] == n // 64 % 64 + 1
        assert r["channels"] == 3
    thumbs = resize_stub(media, max_side=8).collect()
    assert all(len(r["thumb"]) <= r["width"] * r["height"] for r in thumbs)
    frames = frame_sample_stub(media, every_n_bytes=10).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for d, idxs in by_doc.items():
        assert idxs == list(range(len(idxs)))
        assert len(idxs) == math.ceil(len(texts[d].encode()) / 10)


def test_real_decoder_gates_non_png_without_pillow(spark, docs):
    """Round-5: decode_image_real is REAL for PNG (stdlib codec; see
    tests/test_png.py) — the honest dependency gate now applies only to
    non-PNG payloads on a Pillow-less worker, and fires at ACTION time
    (the decoder is resolved inside the Arrow worker)."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed: every format decodes for real")
    except ImportError:
        pass
    media = attach_fake_payload(docs.limit(1))  # utf-8 bytes, not a PNG
    with pytest.raises(Exception, match="PNG|Pillow"):
        decode_image_real(media).collect()


def test_lsh_multi_probe_sweep(spark):
    """Multi-probe LSH (least-confident bit flips): candidates are a
    superset per added probe, so recall is monotone in n_probe; on a
    clustered fixture 4 probes must beat the single-probe floor."""
    from mwmbl_spark.operators.similarity import cosine_topk, lsh_bucket_topk

    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for _c in range(30):
        center = rng.normal(size=16)
        for _m in range(10):
            v = center + rng.normal(scale=0.15, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    qids = [0, 10, 20, 30, 40]
    exact: dict = {}
    for r in cosine_topk(emb, qids, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = {}
    for n_probe in (1, 2, 4):
        got: dict = {}
        for r in lsh_bucket_topk(emb, qids, k=5, n_probe=n_probe).collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        recalls[n_probe] = sum(
            len(got.get(q, set()) & exact[q]) for q in qids
        ) / sum(len(exact[q]) for q in qids)
    print("LSH probe sweep recalls:", recalls)
    assert recalls[2] >= recalls[1] - 1e-9
    assert recalls[4] >= recalls[2] - 1e-9
    assert recalls[4] > recalls[1], recalls
    assert recalls[4] >= 0.6, recalls
    emb.unpersist()


def test_ivf_topk_recall_and_determinism(embeddings):
    from mwmbl_spark.operators.similarity import cosine_topk, ivf_topk, ivf_train

    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(embeddings, query_ids=[0, 1, 2], k=10).collect()
    }
    cents = ivf_train(embeddings, n_centroids=8, n_iters=2)
    approx1 = ivf_topk(
        embeddings, query_ids=[0, 1, 2], k=10, n_centroids=8, n_probe=4,
        centroids=cents,
    ).collect()
    got = {(r["query_id"], r["vec_id"]) for r in approx1}
    recall = len(got & exact) / len(exact)
    # the synthetic embeddings are near-uniform (no cluster structure),
    # so IVF recall ~= probed fraction; real embeddings cluster and beat
    # this floor. The strong functional check is the n_probe=all case.
    assert recall >= 0.35, recall
    # deterministic: retrain + reprobe gives the identical result
    approx2 = ivf_topk(
        embeddings, query_ids=[0, 1, 2], k=10, n_centroids=8, n_probe=4, n_iters=2
    ).collect()
    assert sorted(map(tuple, approx1)) == sorted(map(tuple, approx2))
    # probing ALL centroids recovers the exact result
    full = ivf_topk(
        embeddings, query_ids=[0, 1, 2], k=10, n_centroids=8, n_probe=8,
        centroids=cents,
    )
    assert {(r["query_id"], r["vec_id"]) for r in full.collect()} == exact


# --- product quantization (ADC + refine) -------------------------------------

def test_pq_encode_shape_and_determinism(embeddings):
    from mwmbl_spark.operators.similarity import pq_encode, pq_train

    cb = pq_train(embeddings, m=4, k_codes=4, n_iters=2)
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(embeddings, cb).collect()}
    assert all(len(c) == 4 for c in codes.values())
    assert all(0 <= x < 4 for c in codes.values() for x in c)
    # the perturbed twin encodes identically to its source at 0.01 noise
    assert codes[8] == codes[0]
    # retrain from scratch: bit-identical codebook and codes
    cb2 = pq_train(embeddings, m=4, k_codes=4, n_iters=2)
    codes2 = {r["vec_id"]: list(r["codes"]) for r in pq_encode(embeddings, cb2).collect()}
    assert codes == codes2


def test_pq_refine_all_recovers_exact(embeddings):
    """ADC shortlist covering the whole corpus + exact refine must equal
    the brute-force baseline exactly (the probe-all analogue)."""
    from mwmbl_spark.operators.similarity import cosine_topk, pq_topk

    exact = {
        (r["query_id"], r["rank"], r["vec_id"])
        for r in cosine_topk(embeddings, query_ids=[0, 1, 2], k=5).collect()
    }
    got = {
        (r["query_id"], r["rank"], r["vec_id"])
        for r in pq_topk(
            embeddings, query_ids=[0, 1, 2], k=5, m=4, k_codes=4, n_iters=2,
            refine=100,
        ).collect()
    }
    assert got == exact


def test_pq_adc_finds_twin(embeddings):
    """Default two-stage shape: the near-duplicate must reach the ADC
    shortlist and win the exact re-rank."""
    from mwmbl_spark.operators.similarity import pq_topk

    out = pq_topk(
        embeddings, query_ids=[0], k=3, m=4, k_codes=4, n_iters=2, refine=6
    ).orderBy("rank").collect()
    assert out and out[0]["vec_id"] == 8 and out[0]["sim"] > 0.999


def test_pq_dim_validation(embeddings):
    from mwmbl_spark.operators.similarity import pq_train

    with pytest.raises(ValueError):
        pq_train(embeddings, m=5)  # 16 % 5 != 0


def test_ivfpq_encode_shape_and_determinism(embeddings):
    from mwmbl_spark.operators.similarity import ivfpq_encode, ivfpq_train

    cents, cb = ivfpq_train(embeddings, n_centroids=3, m=4, k_codes=4, n_iters=2)
    enc = {
        r["vec_id"]: (r["cid"], list(r["codes"]))
        for r in ivfpq_encode(embeddings, cents, cb).collect()
    }
    assert all(0 <= cid < 3 for cid, _ in enc.values())
    assert all(len(c) == 4 and all(0 <= x < 4 for x in c) for _, c in enc.values())
    # the perturbed twin lands in its source's coarse list
    assert enc[8][0] == enc[0][0]
    cents2, cb2 = ivfpq_train(embeddings, n_centroids=3, m=4, k_codes=4, n_iters=2)
    enc2 = {
        r["vec_id"]: (r["cid"], list(r["codes"]))
        for r in ivfpq_encode(embeddings, cents2, cb2).collect()
    }
    assert enc == enc2


def test_ivfpq_probe_all_refine_all_recovers_exact(embeddings):
    """Probing every coarse list with a corpus-covering refine shortlist
    must reproduce the brute-force baseline exactly (residual ADC only
    prunes; the original vectors decide)."""
    from mwmbl_spark.operators.similarity import cosine_topk, ivfpq_topk

    exact = {
        (r["query_id"], r["rank"], r["vec_id"])
        for r in cosine_topk(embeddings, query_ids=[0, 1, 2], k=5).collect()
    }
    got = {
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ivfpq_topk(
            embeddings, query_ids=[0, 1, 2], k=5, n_centroids=3, n_probe=3,
            m=4, k_codes=4, n_iters=2, refine=100,
        ).collect()
    }
    assert got == exact


def test_ivfpq_adc_finds_twin(embeddings):
    """Binding probe + refine: the near-duplicate shares its source's
    coarse list, so it must reach the shortlist and win the re-rank."""
    from mwmbl_spark.operators.similarity import ivfpq_topk

    out = ivfpq_topk(
        embeddings, query_ids=[0], k=3, n_centroids=3, n_probe=1,
        m=4, k_codes=4, n_iters=2, refine=6,
    ).orderBy("rank").collect()
    assert out and out[0]["vec_id"] == 8 and out[0]["sim"] > 0.999


def test_ivfpq_residual_adc_beats_plain_pq_fidelity(embeddings):
    """The point of residual encoding: with the same code budget the
    ADC estimate of the true neighbor's similarity should be closer to
    exact than plain PQ's on clustered-ish data. Gate loosely: the twin
    must rank first in IVF-PQ's ADC-only output."""
    from mwmbl_spark.operators.similarity import ivfpq_topk

    out = ivfpq_topk(
        embeddings, query_ids=[0], k=3, n_centroids=3, n_probe=3,
        m=4, k_codes=4, n_iters=2, refine=None,
    ).orderBy("rank").collect()
    assert out and out[0]["vec_id"] == 8


def test_ivfpq_residual_coding_cuts_adc_error_vs_plain_pq(spark):
    """The point of IVFADC (Jégou 2011 §III): with the SAME per-vector
    code budget, quantizing residuals against the coarse centroid must
    estimate similarities more accurately than plain PQ on clustered
    data (the coarse id absorbs the vector's position, the codebook only
    models the low-energy displacement). Gate: mean |adc_sim - true_sim|
    over all pairs strictly below plain PQ's (measured 0.047 vs 0.086
    on this fixture; asserted with margin)."""
    from mwmbl_spark.operators.similarity import ivfpq_topk, pq_topk

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(12, 16))
    rows, vid = [], 0
    for c in range(12):
        for _ in range(20):
            v = centers[c] + rng.normal(scale=0.3, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    V = np.array([r[1] for r in rows])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    queries = [0, 40, 85, 130, 221]
    true = {
        (q, j): float(Vn[q] @ Vn[j])
        for q in queries
        for j in range(len(rows))
        if j != q
    }

    def mae(df):
        errs = [abs(r["sim"] - true[(r["query_id"], r["vec_id"])]) for r in df.collect()]
        return sum(errs) / len(errs)

    pq_mae = mae(pq_topk(emb, queries, k=10**6, m=4, k_codes=8, n_iters=3, refine=None))
    ivfpq_mae = mae(
        ivfpq_topk(
            emb, queries, k=10**6, n_centroids=12, n_probe=12, m=4,
            k_codes=8, n_iters=3, refine=None,
        )
    )
    assert ivfpq_mae < pq_mae * 0.8, (ivfpq_mae, pq_mae)
    assert ivfpq_mae < 0.07


def test_embedding_near_duplicates_finds_twins(embeddings):
    """The four perturbed twins (8..11 of 0..3, 0.01 noise) share their
    source's sign bucket with overwhelming probability and sit at
    cosine ~1; every other fixture pair is far below 0.99."""
    from mwmbl_spark.operators.similarity import embedding_near_duplicates

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in embedding_near_duplicates(embeddings, threshold=0.99).collect()
    }
    assert pairs == {(0, 8), (1, 9), (2, 10), (3, 11)}


def test_embedding_near_duplicates_pipes_into_group_resolution(embeddings):
    """The pair shape matches minhash_near_duplicates', so embedding
    pairs feed resolve_duplicate_groups unchanged: each twin collapses
    to a group keeping the smallest id."""
    from mwmbl_spark.operators.dedup import resolve_duplicate_groups
    from mwmbl_spark.operators.similarity import embedding_near_duplicates

    pairs = embedding_near_duplicates(embeddings, threshold=0.99)
    groups = {
        (r["doc_id"], r["keep_id"])
        for r in resolve_duplicate_groups(pairs).collect()
    }
    assert {(8, 0), (9, 1), (10, 2), (11, 3)} <= groups


# --- filtered ANN (round-6: predicate + ANN) ---------------------------------

def test_filtered_ann_probe_all_equals_exact_filtered(embeddings):
    """IVF-PQ / PQ with a metadata filter, probe-all + covering refine,
    must equal the exact filtered scan exactly (filter-then-score)."""
    from mwmbl_spark.operators.similarity import (
        cosine_topk, ivfpq_topk, pq_topk,
    )

    allowed = embeddings.where(F.col("vec_id") % 2 == 0)
    exact = {
        (r["query_id"], r["rank"], r["vec_id"], r["sim"])
        for r in cosine_topk(
            embeddings, query_ids=[0, 1, 2], k=5, allowed=allowed
        ).collect()
    }
    got_ivfpq = {
        (r["query_id"], r["rank"], r["vec_id"], r["sim"])
        for r in ivfpq_topk(
            embeddings, query_ids=[0, 1, 2], k=5, n_centroids=4, n_probe=4,
            m=4, k_codes=4, n_iters=2, refine=100, allowed=allowed,
        ).collect()
    }
    assert got_ivfpq == exact
    got_pq = {
        (r["query_id"], r["rank"], r["vec_id"], r["sim"])
        for r in pq_topk(
            embeddings, query_ids=[0, 1, 2], k=5, m=4, k_codes=4, n_iters=2,
            refine=100, allowed=allowed,
        ).collect()
    }
    assert got_pq == exact


def test_filtered_ann_results_respect_filter(embeddings):
    """EVERY filtered ANN path returns only allowed ids — the hard
    guarantee of filter-then-score (no post-filter leakage)."""
    from mwmbl_spark.operators.similarity import (
        ivf_topk, ivfpq_topk, lsh_bucket_topk, pq_topk,
    )

    allowed = embeddings.where(F.col("vec_id") % 3 == 0)
    allowed_ids = {r["vec_id"] for r in allowed.collect()}
    outs = [
        lsh_bucket_topk(embeddings, query_ids=[0, 1], k=5, n_probe=4, allowed=allowed),
        ivf_topk(embeddings, query_ids=[0, 1], k=5, n_centroids=4, n_probe=2,
                 n_iters=2, allowed=allowed),
        pq_topk(embeddings, query_ids=[0, 1], k=5, m=4, k_codes=4, n_iters=2,
                allowed=allowed),
        ivfpq_topk(embeddings, query_ids=[0, 1], k=5, n_centroids=4, n_probe=2,
                   m=4, k_codes=4, n_iters=2, allowed=allowed),
    ]
    for out in outs:
        rows = out.collect()
        assert rows, "filtered path returned nothing"
        assert all(r["vec_id"] in allowed_ids for r in rows)


def test_filtered_ivfpq_realistic_probe_recall(embeddings):
    """Binding probes + filter: recall vs the exact filtered scan stays
    above the unclustered-synthetic floor (probed fraction)."""
    from mwmbl_spark.operators.similarity import cosine_topk, ivfpq_topk

    allowed = embeddings.where(F.col("vec_id") % 2 == 0)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(
            embeddings, query_ids=[0, 1, 2], k=4, allowed=allowed
        ).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in ivfpq_topk(
            embeddings, query_ids=[0, 1, 2], k=4, n_centroids=4, n_probe=2,
            m=4, k_codes=4, n_iters=2, refine=8, allowed=allowed,
        ).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.35, recall


def test_pq_encode_arrow_equals_expression(spark, embeddings):
    """Round-6: the Arrow encode kernel must produce BIT-identical
    codes to the expression path (_nearest_code) — same left-fold
    dot order (np.cumsum), same half-norm arithmetic, same
    first-max tie rule."""
    from mwmbl_spark.operators.similarity import pq_encode, pq_train

    cb = pq_train(embeddings, m=4, k_codes=4, n_iters=2)
    a = {r["vec_id"]: list(r["codes"]) for r in pq_encode(embeddings, cb).collect()}
    b = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(embeddings, cb, arrow=False).collect()
    }
    assert a == b and len(a) == 12
