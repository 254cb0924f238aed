"""Weighted domain PageRank (crawl-native domain prior)."""

from __future__ import annotations

from mwmbl_spark.operators.pagerank import domain_pagerank, normalized_domain_scores


def test_pagerank_hand_computed(spark):
    # A->B(1), B->A(1), A->C(1): w_out(A)=2, w_out(B)=1
    edges = spark.createDataFrame(
        [("a.com", "b.com", 1), ("b.com", "a.com", 1), ("a.com", "c.com", 1)],
        "src_domain string, dst_domain string, n_links long",
    )
    r2 = {r["domain"]: r["rank"] for r in domain_pagerank(edges, n_iter=2).collect()}
    # r1: A=0.15+0.85*1=1.0, B=C=0.15+0.85*0.5=0.575
    # r2: A=0.15+0.85*0.575=0.63875, B=C=0.15+0.85*(1.0*0.5)... B gets A's
    # half: 0.15+0.85*0.5=0.575; C same
    assert abs(r2["a.com"] - 0.63875) < 1e-9
    assert abs(r2["b.com"] - 0.575) < 1e-9
    assert abs(r2["c.com"] - 0.575) < 1e-9
    norm = normalized_domain_scores(domain_pagerank(edges, n_iter=2))
    assert norm["a.com"] == 1.0 and norm["b.com"] == 0.0 and norm["c.com"] == 0.0


def test_pagerank_weighted_edges_and_feed_heuristic(spark):
    # heavier edge pulls more mass; the dict feeds score_heuristic
    edges = spark.createDataFrame(
        [("s.com", "big.com", 9), ("s.com", "small.com", 1)],
        "src_domain string, dst_domain string, n_links long",
    )
    r = {x["domain"]: x["rank"] for x in domain_pagerank(edges, n_iter=1).collect()}
    assert r["big.com"] > r["small.com"] > 0.15 - 1e-12
    from mwmbl_spark.operators.heuristic import score_result_py

    scores = normalized_domain_scores(domain_pagerank(edges, n_iter=1))
    hi = score_result_py(["spark"], "spark", "https://big.com/x", "spark", 1.0, None, True, scores)
    lo = score_result_py(["spark"], "spark", "https://small.com/x", "spark", 1.0, None, True, scores)
    assert hi > lo > 0
