"""Index-side phrase serving over positional posting segments.

The reference's only phrase machinery is its first-n bigram index
(/root/reference/mwmbl/tokenizer.py:10-13 get_bigrams,
/root/reference/mwmbl/indexer/index.py:48-66 bigram terms) — a
candidate GENERATOR; round 5's ``phrase_match`` verified contiguity by
re-scanning the corpus tokens column (a full-corpus projection). This
module closes the gap the round-5 verdict flagged: phrases are served
FROM THE INDEX, touching only the phrase terms' buckets like WAND does.

Pipeline (one Spark job for the kernel, mirroring wand_topk's shape):

1. ``positional_postings`` extends the posting relation with each
   (term, doc)'s sorted 1-based token positions; ``build_segments(...,
   positions_col="positions")`` packs them into an offset-addressable
   delta+varbyte payload riding the SAME segment rows the WAND kernel
   reads (which ignores them).
2. ``phrase_topk`` tokenizes the phrase batch driver-side (tokenize_py,
   parity-gated), prunes the segment scan to the phrase terms' buckets
   (partition filter + broadcast semi join — the wand_topk fast path),
   and runs one ``applyInPandas`` kernel per (phrase_id, salt).
3. The kernel intersects the phrase terms' doc-id lists (full decode of
   the pruned lists only), decodes POSITIONS only for intersection
   survivors (per-posting byte offsets), verifies contiguity by
   shifted-set intersection, and emits exact BM25 scores over the
   phrase's distinct terms in sorted-term order — the WAND kernel's
   canonical accumulation, so scores are bitwise-comparable with the
   rest of the engine (and the DuckDB oracle's ordered list sum).

Scale shape: per-salt parallelism (a hot phrase splits across NSALT
kernel tasks), bucket-pruned scan, no shuffle before the final
per-phrase top-k window; candidate work is bounded by the CONJUNCTIVE
candidate set of the rarest phrase term within each salt.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark import BM25_B, BM25_K1
from mwmbl_spark.functions.codec import vb_decode
from mwmbl_spark.operators.segments import decode_positions, prune_segments

PHRASE_OUT_SCHEMA = (
    "phrase_id long, doc_id long, score double, n_matches long, first_pos int"
)


def positional_postings(
    transcripts: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, tf, doc_len, positions): the posting relation
    carrying each term's sorted 1-based occurrence positions — ONE
    tokenize pass + one posexplode; tf is derived from the position
    list, so the relation is self-consistent by construction.
    Delegates to postings.build_postings_with_len(positions=True) (the
    positional INDEX build path, IndexConfig(positions=True)) so there
    is exactly one positional-posting definition in the engine."""
    from mwmbl_spark.operators.postings import build_postings_with_len

    p = build_postings_with_len(transcripts, text_col, id_col, positions=True)
    return p.select("term", "doc_id", "tf", "doc_len", "positions")


#: rarest-first skip decode engages when candidates * SKIP_FACTOR <
#: the list's posting count (galloping-intersection threshold family)
SKIP_FACTOR = 4


def _blk_slice(data: bytes, boffs: np.ndarray, b: int) -> bytes:
    lo = int(boffs[b])
    hi = int(boffs[b + 1]) if b + 1 < len(boffs) else len(data)
    return data[lo:hi]


def _decode_row(row, cand: np.ndarray | None, skip_factor: int = SKIP_FACTOR):
    """Decode one segment row's (ids, tfs, dls, orig) — ALL blocks when
    ``cand`` is None (the rarest term seeds the candidate set), else
    ONLY the blocks that can contain a candidate doc id (block_last
    binary search — the WAND kernel's skip machinery; ids are strictly
    increasing across blocks, so each candidate maps to exactly one
    possible block). ``orig`` is the GLOBAL posting index (block *
    BLOCK_SIZE + offset), which keeps position-payload lookups valid
    over a partial decode."""
    from mwmbl_spark.operators.segments import BLOCK_SIZE

    b_ids = np.asarray(row.boffs_ids, dtype=np.int64)
    n_blocks = len(b_ids)
    # skip decode only pays when the candidate set is MUCH smaller
    # than this list (the galloping-intersection threshold): for a
    # hot-x-hot phrase the candidates cover ~every block and the
    # block-selection pass is pure overhead — fall back to the plain
    # full decode, which is the cost floor
    if cand is None or cand.size * skip_factor >= int(row.n_postings):
        blocks = range(n_blocks)
    else:
        last = np.asarray(row.block_last, dtype=np.int64)
        at = np.searchsorted(last, cand.astype(np.int64))
        blocks = np.unique(at[at < n_blocks])
    b_tfs = np.asarray(row.boffs_tfs, dtype=np.int64)
    b_lens = np.asarray(row.boffs_lens, dtype=np.int64)
    d_ids, d_tfs, d_lens = bytes(row.doc_ids), bytes(row.tfs), bytes(row.doc_lens)
    ids_p, tf_p, dl_p, orig_p = [], [], [], []
    for b in blocks:
        b = int(b)
        ids = np.cumsum(vb_decode(_blk_slice(d_ids, b_ids, b)), dtype=np.uint64)
        ids_p.append(ids)
        tf_p.append(vb_decode(_blk_slice(d_tfs, b_tfs, b)).astype(np.float64))
        dl_p.append(vb_decode(_blk_slice(d_lens, b_lens, b)).astype(np.float64))
        orig_p.append(
            np.arange(b * BLOCK_SIZE, b * BLOCK_SIZE + ids.size, dtype=np.int64)
        )
    if not ids_p:
        return (
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.float64),
            np.empty(0, dtype=np.float64),
            np.empty(0, dtype=np.int64),
        )
    return (
        np.concatenate(ids_p),
        np.concatenate(tf_p),
        np.concatenate(dl_p),
        np.concatenate(orig_p),
    )


def _greedy_chain_starts(
    tok_pos: list[np.ndarray], bound: int
) -> tuple[int, int]:
    """Ordered proximity verify (the slop>0 path): a start q0 (an
    occurrence of phrase token 0) is VALID iff the greedy chain —
    q_i = smallest position of token i strictly greater than q_{i-1}
    — completes with q_{m-1} - q0 <= bound. Greedy-minimal at each
    step minimizes the chain end, so greedy failure == no chain from
    that start (the well-definedness the SQL oracle restates).
    Returns (n_valid_starts, first_valid_start) — (0, 0) if none."""
    n = 0
    first = 0
    for q0 in tok_pos[0]:
        q = int(q0)
        ok = True
        for ps in tok_pos[1:]:
            j = int(np.searchsorted(ps, q, side="right"))
            if j >= len(ps):
                ok = False
                break
            q = int(ps[j])
        if ok and q - int(q0) <= bound:
            n += 1
            if n == 1:
                first = int(q0)
    return n, first


def make_phrase_kernel(
    n_docs: int,
    avg_len: float,
    k: int,
    slop: int = 0,
    deletes=None,
    doc_filter=None,
    skip_factor: int = SKIP_FACTOR,
):
    """applyInPandas kernel over (phrase_id, salt) groups of positional
    segment rows joined with the phrase-term table and df stats.

    ``slop=0``: exact contiguity via vectorized shifted-set key
    intersection. ``slop>0``: ordered proximity — positions
    q_0 < ... < q_{m-1} for the phrase tokens IN ORDER with span
    q_{m-1} - q_0 <= (m-1) + slop (Lucene sloppy-PhraseQuery-shaped;
    slop=0 under this definition IS contiguity) — verified by the
    greedy chain over intersection survivors only.

    FRAGMENT-AWARE (round-6 lifecycle support): a term may arrive as
    SEVERAL segment rows — one per live index fragment (upserted
    indexes; rows then carry ``seq``). Each row's postings are
    delete-masked at decode (operators/upsert.dead_mask, the WAND
    kernel's rule), then merged id-sorted; masking guarantees one alive
    version per doc, so the merged list is strictly increasing and the
    candidate intersection / position verify are fragment-agnostic.
    Position decode stays survivor-grain: each survivor remembers its
    (fragment row, original posting index).

    ``deletes``: per-salt delete map (dict or broadcast).
    ``doc_filter``: per-salt sorted allowlist (dict, broadcast, or
    DocFilterFiles) — scoped phrase serving, same strict semantics as
    the WAND kernel (a salt missing from the filter allows nothing)."""
    n_docs_f, avg_len_f = float(n_docs), float(avg_len)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        from mwmbl_spark.operators.upsert import dead_mask
        from mwmbl_spark.operators.wand import _resolve_filter_entry

        def empty() -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "phrase_id": pd.Series([], dtype="int64"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                    "n_matches": pd.Series([], dtype="int64"),
                    "first_pos": pd.Series([], dtype="int32"),
                }
            )

        phrase_id = int(pdf["phrase_id"].iloc[0])
        n_terms = int(pdf["n_terms"].iloc[0])
        # a distinct phrase term absent from THIS salt => no doc in this
        # salt holds every term => conjunctive intersection is empty
        if pdf["term"].nunique() < n_terms:
            return empty()

        dmap = deletes.value if hasattr(deletes, "value") else deletes
        dead_entry = (
            dmap.get(int(pdf["salt"].iloc[0]))
            if dmap and "salt" in pdf
            else None
        )
        fmap = doc_filter.value if hasattr(doc_filter, "value") else doc_filter
        filt_entry = (
            _resolve_filter_entry(fmap, int(pdf["salt"].iloc[0]))
            if fmap is not None and "salt" in pdf
            else None
        )

        # RAREST-FIRST skip-intersection: terms process in ascending-df
        # order, the rarest seeding the candidate set with a full
        # decode; every later (more common) term then decodes ONLY the
        # blocks that can contain a surviving candidate (block_last
        # binary search). A stopword-grade phrase term no longer pays a
        # full posting decode — its cost tracks the rare term's df.
        by_term: dict[str, list] = {}
        for row in pdf.itertuples():
            by_term.setdefault(row.term, []).append(row)
        t_order = sorted(
            by_term, key=lambda t: (float(by_term[t][0].df), t)
        )

        terms: dict[str, dict] = {}
        cand: np.ndarray | None = None
        for tname in t_order:
            rows_out: list[dict] = []
            for row in by_term[tname]:
                ids, tfs, dls, orig = _decode_row(row, cand, skip_factor)
                seq = int(getattr(row, "seq", 0) or 0)
                keep = dead_mask(ids, seq, dead_entry)
                if keep is not None:
                    ids, tfs, dls, orig = ids[keep], tfs[keep], dls[keep], orig[keep]
                if filt_entry is not None and ids.size:
                    if filt_entry.size == 0:
                        fkeep = np.zeros(ids.size, dtype=bool)
                    else:
                        at = np.minimum(
                            np.searchsorted(filt_entry, ids), len(filt_entry) - 1
                        )
                        fkeep = filt_entry[at] == ids
                    ids, tfs, dls, orig = (
                        ids[fkeep], tfs[fkeep], dls[fkeep], orig[fkeep]
                    )
                rows_out.append(
                    {
                        "ids": ids,
                        "tfs": tfs,
                        "dls": dls,
                        "orig": orig,
                        "pos_offs": np.asarray(row.pos_offs, dtype=np.int64),
                        "blob": bytes(row.positions),
                    }
                )
            # merge fragments (alive ids are globally unique after
            # delete masking, so a plain sort yields strict posting order)
            if len(rows_out) == 1:
                r = rows_out[0]
                merged = {
                    "ids": r["ids"],
                    "tfs": r["tfs"],
                    "dls": r["dls"],
                    "frag_of": np.zeros(r["ids"].size, dtype=np.int64),
                    "orig": r["orig"],
                }
            else:
                ids = np.concatenate([r["ids"] for r in rows_out])
                order = np.argsort(ids, kind="stable")
                merged = {
                    "ids": ids[order],
                    "tfs": np.concatenate([r["tfs"] for r in rows_out])[order],
                    "dls": np.concatenate([r["dls"] for r in rows_out])[order],
                    "frag_of": np.repeat(
                        np.arange(len(rows_out), dtype=np.int64),
                        [r["ids"].size for r in rows_out],
                    )[order],
                    "orig": np.concatenate([r["orig"] for r in rows_out])[order],
                }
            merged["rows"] = rows_out
            first_row = by_term[tname][0]
            merged["offsets"] = list(first_row.offsets)
            merged["df"] = float(first_row.df)
            if merged["ids"].size == 0:
                return empty()  # conjunctive: an empty term list kills all
            terms[tname] = merged
            cand = (
                merged["ids"]
                if cand is None
                else np.intersect1d(cand, merged["ids"])
            )
            if cand.size == 0:
                return empty()

        def pos_of(t: dict, i: int) -> np.ndarray:
            """Positions of the i-th MERGED posting of term ``t`` —
            decoded from the owning fragment row's payload slice."""
            r = t["rows"][int(t["frag_of"][i])]
            return decode_positions(r["blob"], r["pos_offs"], int(t["orig"][i]))

        if slop == 0:
            # contiguity verify on survivors only: for the term at phrase
            # offset o, a valid phrase start s satisfies (s + o) in the
            # term's position set — intersect shifted (doc, start) keys
            # across every (term, offset). Keys pack as candidate_index<<32
            # | start (token positions < 2^32; candidate count < 2^31).
            match_keys = None
            for t in terms.values():
                idx = np.searchsorted(t["ids"], cand)
                starts_per_doc = [
                    (ci, pos_of(t, int(pi)).astype(np.int64))
                    for ci, pi in enumerate(idx)
                ]
                for off in t["offsets"]:
                    flat = (
                        np.concatenate(
                            [
                                (np.int64(ci) << np.int64(32))
                                | (pos[pos - int(off) >= 1] - int(off))
                                for ci, pos in starts_per_doc
                            ]
                        )
                        if starts_per_doc
                        else np.empty(0, dtype=np.int64)
                    )
                    match_keys = (
                        flat if match_keys is None else np.intersect1d(match_keys, flat)
                    )
                    if match_keys.size == 0:
                        return empty()

            match_doc_idx = (match_keys >> np.int64(32)).astype(np.int64)
            match_start = (match_keys & np.int64((1 << 32) - 1)).astype(np.int64)
            uniq_idx, first_at, counts = np.unique(
                match_doc_idx, return_index=True, return_counts=True
            )
            # keys sort ascending => the first key per doc carries min start
            first_pos = match_start[first_at]
            matched_docs = cand[uniq_idx]
        else:
            # ordered proximity: greedy chain per start over the
            # intersection survivors only (positions still decode
            # per-survivor slice, never the whole posting list)
            tok_terms: dict[int, str] = {}
            for tname, t in terms.items():
                for off in t["offsets"]:
                    tok_terms[int(off)] = tname
            length = len(tok_terms)
            bound = length - 1 + slop
            idx_per_term = {
                tname: np.searchsorted(t["ids"], cand)
                for tname, t in terms.items()
            }
            kept, counts_l, first_l = [], [], []
            for ci in range(cand.size):
                pos = {
                    tname: pos_of(t, int(idx_per_term[tname][ci])).astype(np.int64)
                    for tname, t in terms.items()
                }
                tok_pos = [pos[tok_terms[i]] for i in range(length)]
                nvs, first = _greedy_chain_starts(tok_pos, bound)
                if nvs:
                    kept.append(ci)
                    counts_l.append(nvs)
                    first_l.append(first)
            if not kept:
                return empty()
            matched_docs = cand[np.asarray(kept, dtype=np.int64)]
            counts = np.asarray(counts_l, dtype=np.int64)
            first_pos = np.asarray(first_l, dtype=np.int64)

        # exact BM25 over the phrase's distinct terms, canonical
        # (sorted-term) accumulation — the WAND kernel's score order
        scores = np.zeros(len(matched_docs), dtype=np.float64)
        for term in sorted(terms):
            t = terms[term]
            idx = np.searchsorted(t["ids"], matched_docs)
            tf = t["tfs"][idx]
            dl = t["dls"][idx]
            idf = np.log((n_docs_f - t["df"] + 0.5) / (t["df"] + 0.5) + 1.0)
            scores += (
                idf
                * tf
                * (BM25_K1 + 1.0)
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avg_len_f))
            )

        order = np.lexsort((matched_docs, -scores))
        if len(order) > k:
            order = order[:k]
        return pd.DataFrame(
            {
                "phrase_id": np.full(len(order), phrase_id, dtype=np.int64),
                "doc_id": matched_docs[order].astype(np.int64),
                "score": scores[order],
                "n_matches": counts[order].astype(np.int64),
                "first_pos": first_pos[order].astype(np.int32),
            }
        )

    return kernel


def phrase_topk(
    segments: DataFrame,
    stats: DataFrame,
    phrases: list[tuple[int, str]],
    n_docs: int,
    avg_len: float,
    k: int = 10,
    num_buckets: int | None = None,
    slop: int = 0,
    deletes=None,
    doc_filter=None,
    skip_factor: int = SKIP_FACTOR,
) -> DataFrame:
    """Phrase-filtered BM25 top-k served FROM the positional index ->
    (phrase_id, doc_id, score, n_matches, first_pos, rank).

    ``slop`` (round-6, Lucene sloppy-PhraseQuery-shaped): 0 requires
    exact contiguity; slop=s admits docs whose phrase tokens appear IN
    ORDER within a window of len(phrase)+s tokens (span
    q_last - q_first <= len-1+s). Candidate generation, bucket pruning
    and BM25 scoring are identical — only the position verify differs
    (make_phrase_kernel).

    ``segments`` must carry the positional payload
    (build_segments(positions_col=...)). Planning is the wand_topk
    serving fast path: phrases tokenize driver-side, the segment scan
    prunes to the phrase terms' buckets (partition filter, plan-asserted
    in tests/test_plan_quality.py), term membership is a broadcast semi
    join, and the batch costs ONE kernel job before the final top-k
    window. Scores keep GLOBAL corpus statistics over the phrase's
    distinct terms (a phrase restricts candidates; ranking stays BM25).

    ``deletes`` / ``doc_filter`` (round-6 lifecycle): the WAND kernel's
    delete-vector map and scoped-serving allowlist, applied at posting
    decode — phrase serving composes with upserts, compaction, and
    tenant scopes exactly like ranked retrieval (IndexBuilder.
    phrase_query_topk wires them from the live index state)."""
    from mwmbl_spark import DEFAULT_NUM_BUCKETS
    from mwmbl_spark.functions.tokenize import tokenize_py
    from mwmbl_spark.functions.xxhash import bucket_of_py

    nb = num_buckets or DEFAULT_NUM_BUCKETS
    spark = segments.sparkSession
    rows = []
    all_terms: set[str] = set()
    for pid, text in phrases:
        ptoks = tokenize_py(text)
        if not ptoks:
            continue
        offsets: dict[str, list[int]] = {}
        for i, tok in enumerate(ptoks):
            offsets.setdefault(tok, []).append(i)
        for term, offs in offsets.items():
            rows.append((int(pid), term, offs, len(offsets)))
            all_terms.add(term)
    qt = spark.createDataFrame(
        rows, "phrase_id long, term string, offsets array<int>, n_terms int"
    )
    buckets = sorted({bucket_of_py(t, nb) for t in all_terms})
    segs = prune_segments(segments, qt, nb, buckets=buckets)
    joined = segs.join(F.broadcast(qt), "term").join(
        F.broadcast(stats.select("term", "df")), "term"
    )
    local = joined.groupBy("phrase_id", "salt").applyInPandas(
        make_phrase_kernel(
            n_docs, avg_len, k, slop=slop, deletes=deletes,
            doc_filter=doc_filter, skip_factor=skip_factor,
        ),
        schema=PHRASE_OUT_SCHEMA,
    )
    w = Window.partitionBy("phrase_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "phrase_id", "doc_id", "score", "n_matches", "first_pos", "rank"
        )
    )
