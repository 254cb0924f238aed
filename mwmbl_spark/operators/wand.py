"""Segment-reading top-k with dynamic pruning (block-max MaxScore).

Query plan over the segment table (operators/segments.py):

    query_terms (tiny)
      -> broadcast-join segments on term (scan pruned to the terms'
         buckets by prune_segments)
      -> groupBy(query_id, salt).applyInPandas(kernel)   # local top-k
      -> window row_number global top-k                  # k*NSALT rows/query

Exactness: ``salt`` is a term-independent partition of the doc space,
so each doc's complete score is computed in exactly one (query, salt)
group; the global top-k of the union of local top-ks is the true top-k.

The kernel is vectorized MaxScore (Turtle & Flood '95) driving the
STORED block-max metadata — no decode happens for a posting list until
the bounds say it must:

  1. Per segment row, a decode-free upper bound:
         ub = idf_query · max_tfn_stored · max(1, avgdl_q / avgdl_build)
     PROOF the bound survives corpus growth: with r = avgdl_b/avgdl_q,
     tfn_q = tf(k1+1)/(tf + k1(1-b) + r·k1·b·dl/avgdl_b). If r >= 1
     (avgdl shrank) the denominator only grows -> tfn_q <= tfn_b. If
     r < 1, denominator >= r·(tf + k1(1-b) + k1·b·dl/avgdl_b) since
     r·(tf+k1(1-b)) <= tf+k1(1-b), so tfn_q <= tfn_b/r =
     tfn_b·avgdl_q/avgdl_b. Hence tfn_q <= tfn_b·max(1, avgdl_q/avgdl_b)
     for every posting, and idf_query is exact (current df/N from the
     stats table). A 1e-9 relative inflation absorbs float rounding.
  2. Seed exact top-k from the SHORTEST list: decode it fully, score
     its docs against every list via BLOCK-level gather (binary-search
     block_last, decode only touched blocks). theta = k-th best score.
  3. Essential lists = those whose descending-ub suffix sum reaches
     theta; ONLY those are fully decoded. A doc appearing solely in
     non-essential lists scores at most the suffix bound < theta.
  4. Candidates = union of essential docs. Pre-filter: essential
     partial score + per-candidate BLOCK bound of each non-essential
     list (idf·block_max·growth for the block the doc would land in);
     candidates whose optimistic total < theta are dropped before any
     further decode. Survivors get exact non-essential contributions
     by block gather. Ties at theta are kept (doc_id tiebreak safety).

Scores in the output are always EXACT (query-time idf/avgdl over
decoded tf/doc_len); bounds only ever skip work. Per-row Python never
touches postings: decode, gather, scoring are NumPy over Arrow batches.

``make_kernel(..., stats_sink=dict)`` records decode counters
(blocks_decoded / blocks_total / rows_full / rows_total / rows_untouched)
when the kernel is driven directly in tests.
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark import BM25_B, BM25_K1
from mwmbl_spark.functions.codec import slice_block, vb_decode
from mwmbl_spark.operators.bm25 import query_terms
from mwmbl_spark.operators.segments import prune_segments

KERNEL_OUT_SCHEMA = "query_id long, doc_id long, score double, matched int"

_UB_SLACK = 1.0 + 1e-9  # absorbs float-rounding between stored and live tfn


class _List:
    """One segment row: decode-free bounds + lazily decoded blocks."""

    __slots__ = (
        "term", "idf", "ub", "growth", "n_postings", "n_blocks",
        "block_last", "block_maxes", "o_ids", "o_tfs", "o_lens",
        "d_ids", "d_tfs", "d_lens", "blocks", "full_ids", "full_partial",
        "seq",
    )

    def __init__(self, row, idf: float, avg_len_q: float):
        self.term = row.term
        self.seq = int(getattr(row, "seq", 0) or 0)
        self.idf = idf
        self.growth = max(1.0, avg_len_q / float(row.avg_len_build))
        self.ub = idf * float(row.max_tfn) * self.growth * _UB_SLACK
        self.n_postings = int(row.n_postings)
        self.block_last = np.asarray(row.block_last, dtype=np.uint64)
        self.block_maxes = np.asarray(row.block_maxes, dtype=np.float64)
        self.n_blocks = len(self.block_last)
        self.o_ids = np.asarray(row.boffs_ids, dtype=np.int64)
        self.o_tfs = np.asarray(row.boffs_tfs, dtype=np.int64)
        self.o_lens = np.asarray(row.boffs_lens, dtype=np.int64)
        self.d_ids, self.d_tfs, self.d_lens = row.doc_ids, row.tfs, row.doc_lens
        self.blocks: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.full_ids: np.ndarray | None = None
        self.full_partial: np.ndarray | None = None


def _partial(idf: float, tf: np.ndarray, dl: np.ndarray, avg_len: float) -> np.ndarray:
    """Exact per-posting BM25 contribution — float association matches
    the single-node oracle bit for bit (((idf*tf)*(k1+1))/denom,
    oracle/engine.py:62-63): rank identity at scale requires bitwise
    score equality so exact ties break by doc_id identically. The
    STORED tfn uses a different association; the 1e-9 bound slack
    absorbs that — bounds only ever skip work."""
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avg_len)
    return idf * tf * (BM25_K1 + 1.0) / denom


def make_kernel(
    n_docs: int,
    avg_len: float,
    k: int,
    mode: str = "disjunctive",
    stats_sink: dict | None = None,
    deletes=None,
    doc_filter=None,
):
    """``deletes``: per-salt delete map (operators/upsert.load_delete_map,
    plain dict or a SparkContext broadcast) — postings whose doc has a
    newer version in a later fragment are masked at block-decode time.
    Bounds stay valid (dropping rows can only lower a max); masked docs
    can never become candidates because candidates come from decoded
    (already-masked) ids.

    ``doc_filter`` (round-5, SCOPED serving): per-salt sorted uint64
    ALLOWLIST arrays (build_doc_filter; dict or broadcast) — postings
    whose doc is outside the scope are masked at the same decode site.
    Strict: when a filter is passed, a salt missing from it allows
    nothing. Scores keep GLOBAL corpus statistics (scoped search
    restricts results, it does not re-weight idf — the metadata-filter
    semantics every serving stack uses)."""
    n_docs_f, avg_len_f = float(n_docs), float(avg_len)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        query_id = int(pdf["query_id"].iloc[0])
        n_terms = int(pdf["n_terms"].iloc[0])
        dmap = deletes.value if hasattr(deletes, "value") else deletes
        dead_entry = (
            dmap.get(int(pdf["salt"].iloc[0])) if dmap and "salt" in pdf else None
        )
        fmap = doc_filter.value if hasattr(doc_filter, "value") else doc_filter
        filt_entry = (
            _resolve_filter_entry(fmap, int(pdf["salt"].iloc[0]))
            if fmap is not None and "salt" in pdf
            else None
        )
        ctr = {"blocks_decoded": 0, "blocks_total": 0, "rows_full": 0,
               "rows_total": 0, "rows_untouched": 0}

        lists: list[_List] = []
        for row in pdf.itertuples():
            df_val = float(row.df)
            idf = np.log((n_docs_f - df_val + 0.5) / (df_val + 0.5) + 1.0)
            if row.n_postings and len(row.block_last):
                lists.append(_List(row, float(idf), avg_len_f))

        def empty() -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                    "matched": pd.Series([], dtype="int64"),
                }
            )

        def _finish(result: pd.DataFrame) -> pd.DataFrame:
            if stats_sink is not None:
                ctr["blocks_total"] = sum(lst.n_blocks for lst in lists)
                ctr["rows_total"] = len(lists)
                ctr["rows_untouched"] = sum(
                    1 for lst in lists if lst.full_ids is None and not lst.blocks
                )
                for key, val in ctr.items():
                    stats_sink[key] = stats_sink.get(key, 0) + val
            return result

        if not lists:
            return _finish(empty())

        # --- decode machinery -------------------------------------------------
        def decode_blk(lst: _List, blk: int) -> tuple[np.ndarray, np.ndarray]:
            got = lst.blocks.get(blk)
            if got is not None:
                return got
            gaps = vb_decode(slice_block(lst.d_ids, lst.o_ids, blk))
            ids = np.cumsum(gaps, dtype=np.uint64)
            tf = vb_decode(slice_block(lst.d_tfs, lst.o_tfs, blk)).astype(np.float64)
            dl = vb_decode(slice_block(lst.d_lens, lst.o_lens, blk)).astype(np.float64)
            if dead_entry is not None:
                from mwmbl_spark.operators.upsert import dead_mask

                keep = dead_mask(ids, lst.seq, dead_entry)
                if keep is not None:
                    ids, tf, dl = ids[keep], tf[keep], dl[keep]
            if filt_entry is not None and ids.size:
                if filt_entry.size == 0:
                    keep = np.zeros(len(ids), dtype=bool)
                else:
                    at = np.minimum(
                        np.searchsorted(filt_entry, ids), len(filt_entry) - 1
                    )
                    keep = filt_entry[at] == ids
                ids, tf, dl = ids[keep], tf[keep], dl[keep]
            got = (ids, _partial(lst.idf, tf, dl, avg_len_f))
            lst.blocks[blk] = got
            ctr["blocks_decoded"] += 1
            return got

        def full_decode(lst: _List) -> None:
            if lst.full_ids is not None:
                return
            parts = [decode_blk(lst, blk) for blk in range(lst.n_blocks)]
            lst.full_ids = np.concatenate([p[0] for p in parts])
            lst.full_partial = np.concatenate([p[1] for p in parts])
            ctr["rows_full"] += 1

        def gather(lst: _List, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            """Exact (contribution, hit) of this list for candidate docs,
            decoding only the blocks that could contain them."""
            contrib = np.zeros(len(cand))
            hit = np.zeros(len(cand), dtype=bool)
            if lst.full_ids is not None:
                ids, partial = lst.full_ids, lst.full_partial
                if ids.size == 0:
                    return contrib, hit
                idx = np.minimum(np.searchsorted(ids, cand), len(ids) - 1)
                h = ids[idx] == cand
                contrib[h] = partial[idx[h]]
                return contrib, h
            blk = np.searchsorted(lst.block_last, cand)
            valid = blk < lst.n_blocks
            for b_ix in np.unique(blk[valid]):
                ids, partial = decode_blk(lst, int(b_ix))
                if ids.size == 0:  # block fully masked by delete vector
                    continue
                sel = valid & (blk == b_ix)
                idx = np.minimum(np.searchsorted(ids, cand[sel]), len(ids) - 1)
                h = ids[idx] == cand[sel]
                c = np.zeros(int(sel.sum()))
                c[h] = partial[idx[h]]
                contrib[sel] = c
                hit[sel] = h
            return contrib, hit

        # CANONICAL accumulation order: the oracle sums each doc's
        # contributions in sorted-term order (oracle/engine.py:56); a
        # doc appears in at most one row per term, so intra-term row
        # order cannot change its sum. Summing in the same order keeps
        # float ties exact, so the doc_id tiebreak matches bit for bit.
        score_order = sorted(lists, key=lambda lst: lst.term)

        def score_all(cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            scores = np.zeros(len(cand))
            matched = np.zeros(len(cand), dtype=np.int64)
            for lst in score_order:
                contrib, h = gather(lst, cand)
                scores += contrib
                matched += h
            return scores, matched

        def block_bound(lst: _List, cand: np.ndarray) -> np.ndarray:
            """Optimistic per-candidate contribution without decode: the
            block-max of the block each candidate would land in."""
            blk = np.searchsorted(lst.block_last, cand)
            valid = blk < lst.n_blocks
            out = np.zeros(len(cand))
            out[valid] = (
                lst.idf * lst.block_maxes[blk[valid]] * lst.growth * _UB_SLACK
            )
            return out

        def topk_frame(cand, scores, matched) -> pd.DataFrame:
            order = np.lexsort((cand, -scores))
            if len(order) > k:
                order = order[:k]
            return pd.DataFrame(
                {
                    "query_id": query_id,
                    "doc_id": cand[order].astype(np.int64),
                    "score": scores[order],
                    "matched": matched[order],
                }
            )

        # --- conjunctive: candidates ⊆ docs of the smallest term --------------
        if mode in ("conjunctive", "majority"):
            if mode == "conjunctive" and n_terms > 1:
                by_term: dict[str, list[_List]] = {}
                for lst in lists:
                    by_term.setdefault(lst.term, []).append(lst)
                # salt partitions DOC space: a doc of this salt matches
                # term t iff (t, doc) is in THIS group. A query term with
                # no list here -> no doc of this salt matches all terms.
                if len(by_term) < n_terms:
                    return _finish(empty())
                smallest = min(
                    by_term.values(), key=lambda ls: sum(x.n_postings for x in ls)
                )
                for lst in smallest:
                    full_decode(lst)
                cand = np.unique(np.concatenate([x.full_ids for x in smallest]))
            else:
                for lst in lists:
                    full_decode(lst)
                cand = np.unique(np.concatenate([x.full_ids for x in lists]))
            scores, matched = score_all(cand)
            keep = (
                matched == n_terms if mode == "conjunctive" else matched * 2 > n_terms
            )
            return _finish(topk_frame(cand[keep], scores[keep], matched[keep]))

        # --- disjunctive MaxScore ---------------------------------------------
        lists.sort(key=lambda lst: -lst.ub)
        ubs = np.array([lst.ub for lst in lists])
        suffix = np.cumsum(ubs[::-1])[::-1]

        # Phase 1: seed theta from the SHORTEST list (cheapest exact top-k)
        seed_list = min(lists, key=lambda lst: lst.n_postings)
        full_decode(seed_list)
        seed = seed_list.full_ids
        seed_scores, seed_matched = score_all(seed)
        theta = (
            float(np.partition(seed_scores, -k)[-k])
            if len(seed_scores) >= k
            else -np.inf
        )

        # Phase 2: essential lists (ubs desc; suffix >= theta keeps ties —
        # a pruned doc tying theta could win the doc_id tiebreak)
        if np.isfinite(theta):
            ess = [lst for j, lst in enumerate(lists) if suffix[j] >= theta]
            if not ess:
                ess = lists[:1]
        else:
            ess = lists
        noness = [lst for lst in lists if lst not in ess]
        for lst in ess:
            full_decode(lst)
        cand = np.unique(np.concatenate([lst.full_ids for lst in ess]))

        # Phase 3: essential partials + block-bound prefilter. The ess
        # sum here is pruning-only (final scores are recomputed in
        # canonical order below); a relative epsilon guards the ±ulp
        # difference between this sum order and the canonical one.
        if noness and np.isfinite(theta):
            opt = np.zeros(len(cand))
            for lst in ess:
                contrib, _ = gather(lst, cand)
                opt += contrib
            for lst in noness:
                opt += block_bound(lst, cand)
            keep = opt >= theta - abs(theta) * 1e-12
            cand = cand[keep]

        # Phase 4: exact scores for survivors, canonical order (the
        # non-essential gathers decode only the blocks survivors touch)
        scores, matched = score_all(cand)

        # merge with seed (duplicates carry identical exact scores)
        all_ids = np.concatenate([seed, cand])
        all_scores = np.concatenate([seed_scores, scores])
        all_matched = np.concatenate([seed_matched, matched])
        uniq_ids, first = np.unique(all_ids, return_index=True)
        return _finish(
            topk_frame(uniq_ids, all_scores[first], all_matched[first])
        )

    return kernel


_EMPTY_FILTER = np.array([], dtype=np.uint64)

#: collect()-free scope ceiling: above this many ids build_doc_filter
#: refuses to materialize the allowlist driver-side and (given a spill
#: path) writes per-salt files instead
DOC_FILTER_COLLECT_MAX = 10_000_000


@dataclass(frozen=True)
class DocFilterFiles:
    """Descriptor of a DISTRIBUTED per-salt allowlist: parquet files
    partitioned by salt under ``path`` (write_doc_filter). Only this
    tiny descriptor ships to executors; each kernel task reads its OWN
    salt's sorted id array straight from storage (executor-side, the
    delete-vector-file shape — no driver collect, no broadcast), cached
    per Python worker so a query batch pays one read per (salt,
    executor). Works on any pyarrow-readable filesystem (local, HDFS,
    s3://) — the files live next to the index in production."""

    path: str
    nsalt: int


def write_doc_filter(
    allowed, path: str, nsalt: int, id_col: str = "doc_id"
) -> DocFilterFiles:
    """Persist an allowlist DataFrame as per-salt sorted parquet files —
    the SCALE form of build_doc_filter (a tenant scope of 10^8-10^9 ids
    never touches the driver). One Spark job: salt with the build's own
    salt_of expression (filter/build hash parity by construction),
    cluster by salt (one writer per salt directory), sort within
    partitions so each file is searchsorted-ready on read."""
    from pyspark.sql import functions as _F

    from mwmbl_spark.operators.segments import salt_of

    (
        allowed.select(
            _F.col(id_col).cast("long").alias("doc_id"),
            salt_of(_F.col(id_col), nsalt).alias("salt"),
        )
        .distinct()
        .repartition(nsalt, "salt")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("salt")
        .parquet(path)
    )
    return DocFilterFiles(path=path, nsalt=nsalt)


#: per-Python-worker cache of loaded allowlist salts — workers are
#: reused across tasks, so a serving loop reads each (path, salt) once
_FILTER_FILE_CACHE: "OrderedDict[tuple[str, int], np.ndarray]" = OrderedDict()
_FILTER_FILE_CACHE_MAX = 64


def _load_filter_salt(path: str, salt: int) -> np.ndarray:
    """Executor-side read of one salt's allowlist file (sorted uint64).
    A salt directory that does not exist holds no ids — strict
    allowlist, nothing allowed in that salt."""
    key = (path, salt)
    hit = _FILTER_FILE_CACHE.get(key)
    if hit is not None:
        _FILTER_FILE_CACHE.move_to_end(key)
        return hit
    import pyarrow.dataset as pads

    try:
        tbl = pads.dataset(f"{path}/salt={salt}", format="parquet").to_table(
            columns=["doc_id"]
        )
        arr = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        arr = np.sort(arr)  # files are written sorted; cheap no-op guard
    except FileNotFoundError:
        arr = _EMPTY_FILTER
    _FILTER_FILE_CACHE[key] = arr
    if len(_FILTER_FILE_CACHE) > _FILTER_FILE_CACHE_MAX:
        _FILTER_FILE_CACHE.popitem(last=False)
    return arr


def _resolve_filter_entry(fmap, salt: int):
    """The kernel's per-salt allowlist lookup over either form: an
    in-memory dict (small scopes) or a DocFilterFiles descriptor
    (distributed scopes, executor-side file read)."""
    if isinstance(fmap, DocFilterFiles):
        return _load_filter_salt(fmap.path, salt)
    return fmap.get(salt, _EMPTY_FILTER)


def build_doc_filter(
    allowed,
    nsalt: int,
    id_col: str = "doc_id",
    max_collect: int = DOC_FILTER_COLLECT_MAX,
    spill_path: str | None = None,
):
    """Per-salt sorted allowlist arrays for SCOPED serving
    (wand_topk(doc_filter=...)): dict[salt] -> sorted uint64 doc ids.
    ``allowed`` is a DataFrame holding the permitted doc ids (one Spark
    job computes each id's salt with the build's own salt_of
    expression, so filter/build hash parity is by construction).

    SMALL scopes collect driver-side (same cost/size envelope as the
    delete map) and broadcast. A scope past ``max_collect`` ids NEVER
    collects: with ``spill_path`` set it is written as per-salt files
    (write_doc_filter) and a DocFilterFiles descriptor is returned —
    the distributed serving form, kernel tasks read their own salt —
    otherwise this raises (a 10^8-id driver collect is a scale-killer;
    IndexBuilder.query_topk passes a spill path under the index
    automatically). Every salt gets an entry (possibly empty): the
    filter is a strict allowlist."""
    from pyspark.sql import functions as _F

    from mwmbl_spark.operators.segments import salt_of

    salted = allowed.select(
        _F.col(id_col).cast("long").alias("doc_id"),
        salt_of(_F.col(id_col), nsalt).alias("salt"),
    ).distinct()
    n = salted.count()
    if n > max_collect:
        if spill_path is None:
            raise ValueError(
                f"doc filter holds {n} ids (> max_collect={max_collect}); "
                "a driver-side collect at this scope is refused — pass "
                "spill_path= (or use write_doc_filter / "
                "IndexBuilder.query_topk, which spills next to the index)"
            )
        return write_doc_filter(salted, spill_path, nsalt)
    rows = salted.collect()
    per: dict[int, list[int]] = {s: [] for s in range(nsalt)}
    for r in rows:
        per[int(r["salt"])].append(int(r["doc_id"]))
    return {
        s: np.array(sorted(ids), dtype=np.uint64) for s, ids in per.items()
    }


def wand_topk(
    segments: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    n_docs: int,
    avg_len: float,
    k: int = 10,
    mode: str = "disjunctive",
    num_buckets: int | None = None,
    deletes=None,
    doc_filter=None,
) -> DataFrame:
    """Top-k over the compressed segment table -> (query_id, doc_id,
    score, rank). Rank-identical to bm25.bm25_topk / the oracle.
    ``num_buckets`` must match the segment build's bucket count.
    ``deletes``: per-salt delete map for merge-on-read upserts
    (operators/upsert.py); broadcast to executors when non-trivial.

    ``queries`` may be a DataFrame (query_id, query) OR a plain
    ``list[(query_id, query)]`` — the SERVING fast path: tokenization
    and bucket pruning then run driver-side (tokenize_py + the
    xxhash64 twin, both parity-gated), so the whole batch costs exactly
    ONE Spark job (the kernel) instead of job-per-planning-step."""
    from mwmbl_spark import DEFAULT_NUM_BUCKETS

    nb = num_buckets or DEFAULT_NUM_BUCKETS
    if isinstance(queries, list):
        from mwmbl_spark.functions.tokenize import tokenize_py
        from mwmbl_spark.functions.xxhash import bucket_of_py

        spark = segments.sparkSession
        rows: list[tuple[int, str, int]] = []
        terms_set: set[str] = set()
        for qid, q in queries:
            terms = list(dict.fromkeys(tokenize_py(q)))  # distinct, first-wins
            for t in terms:
                rows.append((int(qid), t, len(terms)))
                terms_set.add(t)
        qt = spark.createDataFrame(rows, "query_id long, term string, n_terms int")
        buckets = sorted({bucket_of_py(t, nb) for t in terms_set})
        segs = prune_segments(segments, qt, nb, buckets=buckets)
    else:
        qt = query_terms(queries)
        segs = prune_segments(segments, qt, nb)
    joined = segs.join(F.broadcast(qt), "term").join(
        F.broadcast(stats.select("term", "df")), "term"
    )
    if deletes is not None and not hasattr(deletes, "value") and not deletes:
        deletes = None  # empty map: zero kernel overhead
    if deletes is not None and not hasattr(deletes, "value"):
        deletes = segments.sparkSession.sparkContext.broadcast(deletes)
    if (
        doc_filter is not None
        and not hasattr(doc_filter, "value")
        and not isinstance(doc_filter, DocFilterFiles)
    ):
        # NB an EMPTY dict stays a filter (strict allowlist: nothing
        # allowed), unlike the delete map's empty-means-none shortcut;
        # a DocFilterFiles descriptor ships as-is (bytes, not a map)
        doc_filter = segments.sparkSession.sparkContext.broadcast(doc_filter)
    local = joined.groupBy("query_id", "salt").applyInPandas(
        make_kernel(n_docs, avg_len, k, mode, deletes=deletes, doc_filter=doc_filter),
        schema=KERNEL_OUT_SCHEMA,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


MAX_CURATED_SCORE = 1_111_111.0  # views.py:404 analogue (operators/curation.py)


def wand_topk_curated(
    segments: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    curations: DataFrame,
    n_docs: int,
    avg_len: float,
    k: int = 10,
    mode: str = "disjunctive",
    num_buckets: int | None = None,
    deletes=None,
) -> DataFrame:
    """Curation-aware top-k through the segment/WAND path (reference
    rank.py:289-293,318-320): documents curated for the EXACT query —
    stored ``term`` equals ``' '.join(tokenize(q))`` and state is set —
    are pinned FIRST in curation-position order with the pinned score
    MAX_CURATED_SCORE - position (views.py:404 convention); organic
    WAND results fill the remaining slots, deduplicated against the
    pinned docs (curated wins, like the reference's
    ``deduplicate(curated_items + ordered_results)``).

    The curation table is a small editorial dimension — every join
    against it broadcasts; the organic path is untouched wand_topk.
    Output: (query_id, doc_id, score, rank, curated).

    ``queries`` may be a plain ``list[(query_id, query)]`` — the
    SERVING fast path: the organic half runs wand_topk's one-job list
    path, and the curation probe resolves DRIVER-side (tokenize_py on
    the queries against the collected editorial dim — ``curations`` may
    itself be a list of (term, position, doc_id, state) tuples to skip
    even that collect), so the whole batch still costs exactly ONE
    Spark job; pinned rows ride a local relation into the final plan."""
    from mwmbl_spark.functions.tokenize import tokenize_expr

    if isinstance(queries, list):
        return _wand_topk_curated_list(
            segments, stats, queries, curations, n_docs, avg_len,
            k=k, mode=mode, num_buckets=num_buckets, deletes=deletes,
        )

    organic = wand_topk(
        segments, stats, queries, n_docs, avg_len,
        k=k, mode=mode, num_buckets=num_buckets, deletes=deletes,
    )
    cterm = queries.select(
        "query_id", F.concat_ws(" ", tokenize_expr(F.col("query"))).alias("cterm")
    )
    cur = (
        curations.where(F.col("state").isNotNull())
        .join(F.broadcast(cterm), F.col("term") == F.col("cterm"))
        .select("query_id", "doc_id", "position")
    )
    wc = Window.partitionBy("query_id").orderBy("position", "doc_id")
    cur_ranked = cur.select(
        "query_id",
        "doc_id",
        (F.lit(MAX_CURATED_SCORE) - F.col("position")).alias("score"),
        F.row_number().over(wc).alias("crank"),
        F.lit(1).alias("curated"),
    )
    n_cur = cur_ranked.groupBy("query_id").agg(F.max("crank").alias("n_cur"))
    org = (
        organic.join(F.broadcast(cur.select("query_id", "doc_id")), ["query_id", "doc_id"], "left_anti")
        .join(F.broadcast(n_cur), "query_id", "left")
        .select(
            "query_id", "doc_id", "score",
            F.lit(0).alias("curated"),
            (F.coalesce(F.col("n_cur"), F.lit(0))).alias("shift"),
            "rank",
        )
    )
    wo = Window.partitionBy("query_id").orderBy("rank")
    org_ranked = org.select(
        "query_id", "doc_id", "score",
        (F.row_number().over(wo) + F.col("shift")).alias("crank"),
        "curated",
    )
    return (
        cur_ranked.select("query_id", "doc_id", "score", F.col("crank").alias("rank"), "curated")
        .unionByName(
            org_ranked.select("query_id", "doc_id", "score", F.col("crank").alias("rank"), "curated")
        )
        .where(F.col("rank") <= k)
    )


def _wand_topk_curated_list(
    segments: DataFrame,
    stats: DataFrame,
    queries: list,
    curations,
    n_docs: int,
    avg_len: float,
    k: int = 10,
    mode: str = "disjunctive",
    num_buckets: int | None = None,
    deletes=None,
) -> DataFrame:
    """Serving fast path of wand_topk_curated (list-shaped batch):
    semantics identical to the DataFrame path (pytest-gated equal in
    tests/test_segments_wand.py), but the curation probe — exact-term
    match of each query's joined tokens against the editorial dim —
    runs driver-side, the pinned rows and exclusion set enter the plan
    as local relations, and the organic half takes wand_topk's one-job
    list path. The rank arithmetic (pinned first at
    MAX_CURATED_SCORE - position, organic shifted by the pinned count,
    dedup against pinned doc_ids) is the reference's
    ``deduplicate(curated_items + ordered_results)`` shape
    (rank.py:289-293,318-320; views.py:404 score convention)."""
    from mwmbl_spark.functions.tokenize import tokenize_py

    spark = segments.sparkSession
    if not isinstance(curations, list):
        # tiny editorial dimension (reference: a curations DB table) —
        # collect once; serving callers pass the list and skip the job
        curations = [
            (r["term"], int(r["position"]), int(r["doc_id"]),
             None if r["state"] is None else int(r["state"]))
            for r in curations.collect()
        ]
    cur_by_term: dict[str, list[tuple[int, int]]] = {}
    for term, pos, doc, state in curations:
        if state is None:
            continue
        cur_by_term.setdefault(term, []).append((int(pos), int(doc)))

    pinned_rows: list[tuple[int, int, float, int]] = []
    n_cur: dict[int, int] = {}
    for qid, q in queries:
        entries = sorted(cur_by_term.get(" ".join(tokenize_py(q)), []))
        for i, (pos, doc) in enumerate(entries, 1):
            pinned_rows.append((int(qid), doc, MAX_CURATED_SCORE - pos, i))
        if entries:
            n_cur[int(qid)] = len(entries)

    organic = wand_topk(
        segments, stats, queries, n_docs, avg_len,
        k=k, mode=mode, num_buckets=num_buckets, deletes=deletes,
    )
    org = organic
    if pinned_rows:
        excl = spark.createDataFrame(
            [(q, d) for q, d, _, _ in pinned_rows], "query_id long, doc_id long"
        )
        org = org.join(F.broadcast(excl), ["query_id", "doc_id"], "left_anti")
    if n_cur:
        shift_map = F.create_map(
            *[x for qid, n in n_cur.items() for x in (F.lit(qid), F.lit(n))]
        )
        shift = F.coalesce(
            F.element_at(shift_map, F.col("query_id")), F.lit(0)
        )
    else:
        shift = F.lit(0)
    wo = Window.partitionBy("query_id").orderBy("rank")
    org_ranked = org.select(
        "query_id", "doc_id", "score",
        (F.row_number().over(wo) + shift).alias("rank"),
        F.lit(0).alias("curated"),
    )
    if pinned_rows:
        cur_df = spark.createDataFrame(
            pinned_rows, "query_id long, doc_id long, score double, rank int"
        ).withColumn("curated", F.lit(1))
        out = cur_df.select(
            "query_id", "doc_id", "score", "rank", "curated"
        ).unionByName(org_ranked)
    else:
        out = org_ranked
    return out.where(F.col("rank") <= k)
