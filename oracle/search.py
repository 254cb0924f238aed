"""Single-node twin of the full search pipeline (plans/search.py),
mirroring the reference's Ranker.search/get_results flow step by step
(rank.py:247-320). Ground truth for tests/test_search_pipeline.py."""

from __future__ import annotations

from mwmbl_spark.functions.tokenize import (
    document_terms_py,
    get_bigrams_py,
    tokenize_py,
)
from mwmbl_spark.operators.heuristic import CURATED_STATES, score_result_py


def build_term_index_py(docs: list[dict]) -> dict[str, set[int]]:
    index: dict[str, set[int]] = {}
    for d in docs:
        for t in document_terms_py(d.get("title") or "", d["url"], d.get("extract") or ""):
            index.setdefault(t, set()).add(d["doc_id"])
    return index


def _edit1(a: str, b: str) -> bool:
    """levenshtein(a, b) <= 1."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def correct_oov_py(
    counts: dict[str, int], term: str, max_term_len: int = 32
) -> str | None:
    """Twin of plans/search.oov_corrections for ONE term: top-1
    vocabulary term (len <= max_term_len, spell_index's junk-token
    guard) within edit distance 1, ranked (count desc, term asc). The
    Spark side pre-filters candidates through the deletion-variant
    collision, which is a superset of every distance-1 pair, so the
    exact-levenshtein post-filter makes the sets identical."""
    best = None
    for t, c in counts.items():
        if len(t) > max_term_len or t == term or not _edit1(t, term):
            continue
        key = (-c, t)
        if best is None or key < best:
            best = key
    return best[1] if best else None


def segment_oov_py(
    counts: dict[str, int], term: str, max_term_len: int = 32
) -> tuple[str, str] | None:
    """Twin of plans/search.segmented_query_meta for ONE term: best
    (left, right) split with both halves in-vocabulary (len <=
    max_term_len), ranked (count_left*count_right desc, split_pos
    asc)."""
    best = None
    for i in range(1, len(term)):
        left, right = term[:i], term[i:]
        cl, cr = counts.get(left), counts.get(right)
        if (
            cl is None or cr is None
            or len(left) > max_term_len or len(right) > max_term_len
        ):
            continue
        key = (-(cl * cr), i)
        if best is None or key < best[0]:
            best = (key, left, right)
    return (best[1], best[2]) if best else None


def complete_py(counts: dict[str, int], prefix: str, n: int = 3) -> list[str]:
    """Completer.complete twin [completer.py:24-35]: prefix-matching
    terms sorted as (count, term) tuples reverse=True — equal counts
    break by the LATER term — top n."""
    matching = [(c, t) for t, c in counts.items() if t.startswith(prefix)]
    top = sorted(matching, reverse=True)[:n]
    return [t for _, t in top]


def search_py(
    docs: list[dict],
    query: str,
    k: int = 10,
    score_threshold: float = 0.0,
    domain_scores: dict[str, float] | None = None,
    n_completions: int = 3,
    term_doc_cap: int | None = None,
    rerank_n: int | None = None,
    correct_oov: bool = False,
    segment_oov: bool = False,
) -> list[dict]:
    by_id = {d["doc_id"]: d for d in docs}
    index = build_term_index_py(docs)
    counts = {t: len(ds) for t, ds in index.items()}
    if term_doc_cap is not None:
        # A7 twin of plans/search.cap_term_index: per-term top-K by
        # crawl-time score (desc_nulls_last — None sorts after every
        # real score, same convention as the rerank twin below; a bare
        # `or 0.0` would rank None above negative scores), doc_id
        # tiebreak; counts stay uncapped
        def _cap_key(i):
            sc = by_id[i].get("score")
            return (float("inf") if sc is None else -sc, i)

        index = {
            t: set(sorted(ds, key=_cap_key)[:term_doc_cap])
            for t, ds in index.items()
        }

    terms = tokenize_py(query)
    if not terms:
        return []
    if correct_oov:
        # auto-correct twin (plans/search.corrected_query_meta): OOV
        # terms are REPLACED in place before expansion and scoring; a
        # term with no distance-1 correction stays as typed
        terms = [
            t if t in counts else (correct_oov_py(counts, t) or t)
            for t in terms
        ]
    if segment_oov:
        # compound-split twin (plans/search.segmented_query_meta):
        # OOV terms with a valid split expand IN PLACE; runs after
        # correction so only uncorrectable terms try to segment
        out: list[str] = []
        for t in terms:
            seg = None if t in counts else segment_oov_py(counts, t)
            out.extend(seg) if seg else out.append(t)
        terms = out
    is_complete = query.endswith(" ")

    retrieval = set(terms) | set(get_bigrams_py(len(terms), terms))
    if not is_complete:
        retrieval |= set(complete_py(counts, terms[-1], n_completions))

    cand_ids = set()
    for t in retrieval:
        cand_ids |= index.get(t, set())

    if rerank_n is not None:
        # two-stage twin of plans/search.py: stage-1 cut by
        # (curated-first, matched expanded-term count desc, crawl-time
        # score desc, doc_id asc); null score sorts last (Spark's
        # desc_nulls_last)
        def _stage1_key(doc_id):
            d = by_id[doc_id]
            n = sum(1 for t in retrieval if doc_id in index.get(t, set()))
            sc = d.get("score")
            return (
                int(d.get("state") not in CURATED_STATES),
                -n,
                float("inf") if sc is None else -sc,
                doc_id,
            )

        cand_ids = set(sorted(cand_ids, key=_stage1_key)[:rerank_n])

    scored = []
    for doc_id in cand_ids:
        d = by_id[doc_id]
        # the query's OWN is_complete flag (rank.py:280-283): an
        # incomplete query's last term is prefix-matched by the scorer
        s = score_result_py(
            terms, d.get("title") or "", d["url"], d.get("extract") or "",
            d.get("score"), d.get("state"), is_complete, domain_scores,
        )
        curated = d.get("state") in CURATED_STATES
        if s > score_threshold or curated:
            scored.append((int(not curated), -s, doc_id, {**d, "result_score": s}))
    scored.sort(key=lambda t: t[:3])

    # SEQUENTIAL dedup like the reference: title pass over the full
    # ranked list (get_results -> deduplicate, rank.py:209-215), THEN
    # url pass over the title survivors (search, rank.py:252-257).
    seen_titles: set = set()
    title_deduped = []
    for _, _, _, d in scored:
        if d.get("title") in seen_titles:
            continue
        seen_titles.add(d.get("title"))
        title_deduped.append(d)

    seen_urls: set = set()
    out = []
    for d in title_deduped:
        if d["url"] in seen_urls:
            continue
        seen_urls.add(d["url"])
        out.append(d)
        if len(out) == k:
            break
    return out
