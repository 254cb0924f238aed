"""Heuristic-scorer kernel microbench: finditer twin vs re.split fast
path over 50k synthetic candidates (the per-candidate CPython cost that
floors the search pipeline at 100x query load — VERDICT r2 finding #1).

    python bench/heuristic_kernel.py [n_candidates]

Writes one JSON line; BENCH/BASELINE.md records results per round.
"""

from __future__ import annotations

import json
import math
import sys
import time
from urllib.parse import urlparse

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mwmbl_spark.operators.heuristic import (  # noqa: E402
    LENGTH_PENALTY,
    DOMAIN_SCORE_SMOOTHING,
    MATCH_SCORE_THRESHOLD,
    _domain_score,
    get_match_features_finditer_py,
    score_match_py,
    score_result_py,
)

TERMS = [["spark", "query"], ["fast", "join"], ["window", "agg", "batch"]]
DOMAINS = ["alpha.example.org", "beta.example.org", "gamma.example.net"]


def score_result_finditer(terms, title, url, extract, score, state, is_complete,
                          domain_scores=None):
    """Round-2 scorer shape: finditer-based features, no domain memo."""
    parsed = urlparse(url)
    domain, path = parsed.netloc, parsed.path
    match_scores, match_terms = {}, 0
    for part, name, is_url in [
        (title, "title", False), (extract, "extract", False),
        (domain, "domain", True), (domain, "domain_tokenized", False),
        (path, "path", True),
    ]:
        lmc, ml, tp, mt, _ = get_match_features_finditer_py(terms, part, is_complete, is_url)
        match_scores[name] = score_match_py(lmc, ml, tp)
        match_terms = max(match_terms, mt)
    length_penalty = math.e ** (-LENGTH_PENALTY * len(url))
    ms = (4 * match_scores["title"] + match_scores["extract"]
          + 2 * match_scores["domain"] + 2 * match_scores["domain_tokenized"]
          + match_scores["path"])
    if match_terms <= len(terms) / 2 and state is None:
        return 0.0
    if ms > MATCH_SCORE_THRESHOLD:
        return ms * length_penalty * (_domain_score(domain, domain_scores) + DOMAIN_SCORE_SMOOTHING) / 10
    return 0.0


def make_candidates(n: int):
    out = []
    for i in range(n):
        terms = TERMS[i % len(TERMS)]
        dom = DOMAINS[i % len(DOMAINS)]
        title = f"Spark query doc {i} window agg join results"
        extract = (
            f"a fast join over the {i} batch window agg pipeline with spark "
            f"query terms repeated spark query join batch " * 2
        )
        url = f"https://{dom}/en/doc_{i}/spark-query-{i % 97}"
        out.append((terms, title, url, extract, 1.0, None))
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cands = make_candidates(n)
    results = {}
    for name, fn in [("finditer_r2", score_result_finditer), ("split_r3", score_result_py)]:
        t0 = time.perf_counter()
        acc = 0.0
        for terms, title, url, extract, score, state in cands:
            acc += fn(terms, title, url, extract, score, state, True, None)
        results[name] = {"sec": round(time.perf_counter() - t0, 3), "checksum": round(acc, 6)}
    assert results["finditer_r2"]["checksum"] == results["split_r3"]["checksum"]
    results["speedup"] = round(
        results["finditer_r2"]["sec"] / results["split_r3"]["sec"], 2
    )

    # domain-prior memo (VERDICT r3 #1): a realistic 100k-domain table
    # (the size domain_pagerank feeds in) must not be rescanned per
    # candidate — with the _TableNorm memo the large-table run stays at
    # the no-table run's speed instead of O(candidates x |table|)
    big_table = {f"d{i}.example.org": float(i % 1000) for i in range(100_000)}
    big_table.update({d: 500.0 for d in DOMAINS})
    t0 = time.perf_counter()
    acc = 0.0
    for terms, title, url, extract, score, state in cands:
        acc += score_result_py(terms, title, url, extract, score, state, True, big_table)
    results["split_r3_domains_100k"] = {
        "sec": round(time.perf_counter() - t0, 3), "checksum": round(acc, 6)
    }
    results["domain_memo_overhead"] = round(
        results["split_r3_domains_100k"]["sec"] / results["split_r3"]["sec"], 2
    )
    print(json.dumps({"metric": "heuristic kernel 50k candidates", "n": n, **results}))


if __name__ == "__main__":
    main()
