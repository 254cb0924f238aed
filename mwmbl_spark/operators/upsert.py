"""Doc-level upsert machinery: delete vectors, segment decode, dead-stats.

The reference merges every incoming batch into its existing index pages
(read-modify-write per page: new docs merged with stored docs, re-ranked,
deduped — /root/reference/mwmbl/indexer/index_batches.py:78-90,150-173),
so a re-crawled URL replaces its old posting. A Spark/lakehouse engine
must NOT rewrite the index per batch; the scalable equivalent is
merge-on-read with delete vectors (the Iceberg v2 / Delta
deletion-vector model):

- every committed fragment carries a monotonically increasing ``seq``;
- an upsert batch becomes a NEW fragment at seq S plus a DELETE VECTOR
  listing the doc_ids it supersedes; a posting for doc d stored in a
  fragment with seq s is alive iff no committed delete vector with
  seq > s contains d;
- the query kernel (wand.py) masks dead postings at block-decode time —
  bounds metadata (max_tfn / block_max) stays valid because dropping
  rows can only lower a maximum;
- ``compact_segments`` (plans/build_index.py) periodically rewrites the
  surviving postings into one consolidated fragment and retires the
  delete vectors, restoring O(1) fragments per term.

Exactness: scores after any chain of upserts are required to be
hash-identical to a fresh single-shot build over the updated corpus
(tests/test_upsert.py). That needs exact df/cf/n_docs/avg_len, so each
upsert also writes a STATS DELTA (negative df/cf rows for the
superseded doc versions) and a doc_stats correction; both ride the
existing per-fragment stats aggregation unchanged.

Scale notes (100 TB): delete vectors between compactions are bounded by
update volume, grouped per salt and broadcast to the kernel — the same
shape Iceberg readers use (positional-delete files loaded per task).
The dead-stats scan decodes ONLY blocks whose doc_id range covers a
superseded id (block_last binary search, identical to the query
kernel's gather); fragments with no doc_index overlap are skipped
entirely, so pure-append batches pay one doc_index anti-join and
nothing else.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from mwmbl_spark.functions.codec import slice_block, vb_decode
from mwmbl_spark.operators.segments import BLOCK_SIZE  # noqa: F401 (doc parity)

DEAD_DELTA_SCHEMA = "term string, dead_df long, dead_cf long"
DECODE_SCHEMA = "term string, salt int, doc_id long, tf long, doc_len long, seq long"

DeleteMap = dict[int, tuple[np.ndarray, np.ndarray]]  # salt -> (ids asc, seqs)


# ---------------------------------------------------------------------------
# Delete vectors
# ---------------------------------------------------------------------------

def write_delete_vector(
    index_path: str,
    part: str,
    salts: list[int],
    doc_ids: list[int],
    seqs: list[int] | None = None,
) -> None:
    """Persist one fragment's delete vector ((salt, doc_id) rows,
    driver-side pyarrow — the vector is already in driver memory because
    the dead-stats gather broadcasts it). Readers only load vectors of
    COMMITTED fragments, so a crash before the manifest append leaves it
    invisible (same protocol as segment data).

    ``seqs``: optional PER-ROW delete seqs. An upsert's own vector kills
    at the fragment's commit seq (omit ``seqs``); a minor compaction
    carries forward the vectors of the fragments it merges, and those
    rows MUST keep their ORIGINAL seq — re-tagged at the compacted
    fragment's (larger) seq they would kill newer versions of the same
    doc living in fragments the compaction did not touch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(index_path, "deletes", f"src_part={part}")
    os.makedirs(d, exist_ok=True)
    cols = {
        "salt": pa.array(salts, pa.int32()),
        "doc_id": pa.array(doc_ids, pa.int64()),
    }
    if seqs is not None:
        cols["seq"] = pa.array(seqs, pa.int64())
    pq.write_table(pa.table(cols), os.path.join(d, "part-0.parquet"))


def load_delete_map(
    index_path: str, live_seqs: dict[str, int], as_of: int | None = None
) -> DeleteMap:
    """Merge the delete vectors of live fragments into per-salt sorted
    arrays (doc_id asc, max delete-seq per doc). A row's delete seq is
    its ``seq`` column when present (compaction-carried rows), else the
    owning fragment's commit seq. A row at seq S is relevant only while
    some live fragment has seq < S — after a FULL compaction at seq C
    every survivor has seq >= C and all vectors retire (a fragment's
    carried rows always have seq < the fragment's own seq, so the
    per-fragment fast skip below stays valid). Local paths read
    driver-side (vectors are small between compactions); on a real
    cluster this is Iceberg delete-file planning.

    ``as_of``: TIME TRAVEL — drop delete rows committed after snapshot
    ``as_of`` (callers pass the matching as-of live set from
    manifest.partition_seqs). Fragment-level filtering alone is NOT
    enough: a minor compaction carries older vectors forward at their
    original per-row seqs inside a newer fragment, and conversely every
    row of an as-of-live fragment already satisfies ``seq <= as_of`` —
    so the row-level guard below is both necessary and sufficient."""
    import glob

    import pyarrow.parquet as pq

    if not live_seqs:
        return {}
    if "://" in index_path and not index_path.startswith("file://"):
        # silently returning {} here would resurrect superseded docs
        # while everything else appears to work (ADVICE r3, medium)
        raise NotImplementedError(
            "load_delete_map reads delete vectors driver-side from the "
            f"local filesystem; index path {index_path!r} is remote — "
            "mount it locally or plan delete files with the cluster's "
            "table format (Iceberg/Delta positional deletes)"
        )
    min_live = min(live_seqs.values())
    per_salt: dict[int, list[tuple[int, int]]] = {}
    base = os.path.join(index_path.removeprefix("file://"), "deletes")
    for part, seq in live_seqs.items():
        if seq <= min_live:
            continue  # cannot kill anything: no live fragment is older
        d = os.path.join(base, f"src_part={part}")
        if not os.path.isdir(d):
            continue
        for f in glob.glob(os.path.join(d, "*.parquet")):
            t = pq.read_table(f)
            row_seqs = (
                [int(x) for x in t.column("seq").to_pylist()]
                if "seq" in t.schema.names
                else [seq] * t.num_rows
            )
            for s, doc, rs in zip(
                t.column("salt").to_pylist(), t.column("doc_id").to_pylist(), row_seqs
            ):
                if rs > min_live and (as_of is None or rs <= as_of):
                    per_salt.setdefault(int(s), []).append((int(doc), rs))
    out: DeleteMap = {}
    total = 0
    for s, pairs in per_salt.items():
        ids = np.array([p[0] for p in pairs], dtype=np.int64)
        seqs = np.array([p[1] for p in pairs], dtype=np.int64)
        order = np.lexsort((-seqs, ids))
        ids, seqs = ids[order], seqs[order]
        first = np.ones(len(ids), dtype=bool)
        first[1:] = ids[1:] != ids[:-1]  # keep max seq per doc
        out[s] = (ids[first].astype(np.uint64), seqs[first])
        total += int(first.sum())
    if total > 10_000_000:
        import logging

        logging.getLogger("mwmbl_spark.upsert").warning(
            "delete map holds %d superseded docs (~%d MB broadcast per "
            "query batch) — run compact()/maybe_compact() to retire the "
            "vectors", total, total * 16 // 1_000_000,
        )
    return out


def load_fragment_vector_rows(
    index_path: str, frag_seqs: dict[str, int]
) -> list[tuple[int, int, int]]:
    """Raw (salt, doc_id, effective_seq) delete rows of the given
    fragments — NO min-live filtering, max seq kept per (salt, doc_id).
    This is the carry-forward read of a minor compaction: the merged
    fragments' vectors may still have to kill postings in fragments the
    compaction does not touch, at their ORIGINAL seqs."""
    import glob

    import pyarrow.parquet as pq

    if "://" in index_path and not index_path.startswith("file://"):
        raise NotImplementedError(
            "delete vectors are read driver-side from the local "
            f"filesystem; index path {index_path!r} is remote"
        )
    best: dict[tuple[int, int], int] = {}
    base = os.path.join(index_path.removeprefix("file://"), "deletes")
    for part, seq in frag_seqs.items():
        d = os.path.join(base, f"src_part={part}")
        if not os.path.isdir(d):
            continue
        for f in glob.glob(os.path.join(d, "*.parquet")):
            t = pq.read_table(f)
            row_seqs = (
                [int(x) for x in t.column("seq").to_pylist()]
                if "seq" in t.schema.names
                else [seq] * t.num_rows
            )
            for s, doc, rs in zip(
                t.column("salt").to_pylist(), t.column("doc_id").to_pylist(), row_seqs
            ):
                key = (int(s), int(doc))
                if rs > best.get(key, -1):
                    best[key] = rs
    return [(s, doc, rs) for (s, doc), rs in sorted(best.items())]


def dead_mask(ids: np.ndarray, seq: int, entry: tuple[np.ndarray, np.ndarray] | None) -> np.ndarray | None:
    """Boolean KEEP mask for decoded ids of a fragment at ``seq``
    (None = keep all). A doc is dead here iff a delete vector with a
    larger seq lists it."""
    if entry is None or ids.size == 0:
        return None
    dead_ids, dead_seqs = entry
    if dead_ids.size == 0:
        return None
    j = np.minimum(np.searchsorted(dead_ids, ids), dead_ids.size - 1)
    kill = (dead_ids[j] == ids) & (dead_seqs[j] > seq)
    if not kill.any():
        return None
    return ~kill


# ---------------------------------------------------------------------------
# Full segment decode (compaction path)
# ---------------------------------------------------------------------------

def decode_segments(
    segs: DataFrame,
    delete_map: DeleteMap | None = None,
    with_positions: bool = False,
) -> DataFrame:
    """Inverse of build_segments: segment rows -> alive posting rows
    (term, salt, doc_id, tf, doc_len). mapInPandas, NumPy decode per
    row; when ``delete_map`` is given the rows must carry ``seq`` and
    superseded postings are dropped. This is the compaction read — a
    full rewrite by design, partition-parallel over segment files.

    ``with_positions`` (round-6): also decode the positional payload
    (segments built with ``positions_col=``) back to ``positions
    array<int>`` per posting — the compaction path of a POSITIONAL
    index re-encodes it via build_segments(positions_col=...), so the
    payload survives every decode-re-encode in the index lifecycle.
    Vectorized (segments.decode_all_positions), alive-masked with the
    same keep mask as the other columns."""
    from mwmbl_spark.functions.codec import delta_decode_blocked
    from mwmbl_spark.operators.segments import decode_all_positions

    dm = delete_map or {}
    schema = DECODE_SCHEMA + (", positions array<int>" if with_positions else "")

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("term", "salt", "doc_id", "tf", "doc_len", "seq")}
            pos_acc: list[np.ndarray] = []
            for row in pdf.itertuples():
                seq = int(getattr(row, "seq", 0))
                ids = delta_decode_blocked(row.doc_ids, BLOCK_SIZE)
                tf = vb_decode(row.tfs)
                dl = vb_decode(row.doc_lens)
                keep = dead_mask(ids, seq, dm.get(int(row.salt)))
                plists = None
                if with_positions:
                    plists = decode_all_positions(row.positions, row.pos_offs)
                if keep is not None:
                    ids, tf, dl = ids[keep], tf[keep], dl[keep]
                    if plists is not None:
                        plists = [p for p, k in zip(plists, keep) if k]
                if ids.size == 0:
                    continue
                out["term"].append(np.full(ids.size, row.term, dtype=object))
                out["salt"].append(np.full(ids.size, np.int32(row.salt)))
                out["doc_id"].append(ids.astype(np.int64))
                out["tf"].append(tf.astype(np.int64))
                out["doc_len"].append(dl.astype(np.int64))
                out["seq"].append(np.full(ids.size, np.int64(seq)))
                if plists is not None:
                    pos_acc.extend(plists)
            if out["term"]:
                frame = {k: np.concatenate(v) for k, v in out.items()}
                if with_positions:
                    frame["positions"] = pos_acc
                yield pd.DataFrame(frame)

    return segs.mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# Dead-stats gather (upsert path)
# ---------------------------------------------------------------------------

def dead_term_deltas(segs: DataFrame, latest: dict[int, dict[int, int]]) -> DataFrame:
    """Per-term stats of the doc versions an upsert supersedes:
    (term, dead_df, dead_cf), where ``latest`` maps
    salt -> {doc_id: seq-of-latest-alive-version}. Only the fragment
    holding a doc's latest version contributes (older versions were
    already subtracted by the upsert that superseded them), so chained
    upserts never double-subtract.

    The scan is block-sparse: per segment row, binary-search the
    candidate ids against block_last and decode ONLY touched blocks —
    the same skip machinery as the query kernel. mapInPandas so no
    shuffle: output is already per-(term, fragment) partial rows,
    summed by a tiny groupBy."""

    def gen(batches):
        for pdf in batches:
            terms: list[str] = []
            dfs: list[int] = []
            cfs: list[int] = []
            for row in pdf.itertuples():
                per_salt = latest.get(int(row.salt))
                if not per_salt:
                    continue
                seq = int(getattr(row, "seq", 0))
                cand = np.array(
                    [d for d, s in per_salt.items() if s == seq], dtype=np.uint64
                )
                if cand.size == 0:
                    continue
                cand.sort()
                block_last = np.asarray(row.block_last, dtype=np.uint64)
                o_ids = np.asarray(row.boffs_ids, dtype=np.int64)
                o_tfs = np.asarray(row.boffs_tfs, dtype=np.int64)
                blk = np.searchsorted(block_last, cand)
                valid = blk < block_last.size
                if not valid.any():
                    continue
                n_dead = 0
                cf_dead = 0
                for b_ix in np.unique(blk[valid]):
                    gaps = vb_decode(slice_block(row.doc_ids, o_ids, int(b_ix)))
                    ids = np.cumsum(gaps, dtype=np.uint64)
                    tf = vb_decode(slice_block(row.tfs, o_tfs, int(b_ix)))
                    sel = cand[valid & (blk == b_ix)]
                    idx = np.minimum(np.searchsorted(ids, sel), ids.size - 1)
                    hit = ids[idx] == sel
                    n_dead += int(hit.sum())
                    cf_dead += int(tf[idx[hit]].sum())
                if n_dead:
                    terms.append(row.term)
                    dfs.append(n_dead)
                    cfs.append(cf_dead)
            if terms:
                yield pd.DataFrame({"term": terms, "dead_df": dfs, "dead_cf": cfs})

    from pyspark.sql import functions as F

    partial = segs.mapInPandas(gen, schema=DEAD_DELTA_SCHEMA)
    return partial.groupBy("term").agg(
        F.sum("dead_df").alias("dead_df"), F.sum("dead_cf").alias("dead_cf")
    )


def dead_term_deltas_df(segs: DataFrame, superseded: DataFrame) -> DataFrame:
    """Fully DISTRIBUTED dead-stats gather for LARGE re-crawl batches
    (the reference's worst case: every batch can re-crawl anything,
    update_urls.py): no driver collect, no broadcast of the superseded
    set. ``superseded``: (doc_id, seq, salt) rows of the latest alive
    version of each re-crawled doc.

    Shape: decode the affected fragments' postings (partition-parallel
    mapInPandas, DECODE_SCHEMA carries the fragment seq), shuffle-join
    them against the superseded rows on (doc_id, seq) — the seq match
    guarantees only the fragment holding a doc's LATEST version
    contributes, so chained upserts never double-subtract — and
    partial-agg per term. Decoding whole fragments (vs the driver
    path's block-sparse gather) is proportional to the affected
    fragments, which a big re-crawl touches wholesale anyway; callers
    pre-filter ``segs`` to the affected (src_part, salt) set."""
    from pyspark.sql import functions as F

    posts = decode_segments(segs, None).select("term", "doc_id", "tf", "seq")
    hit = posts.join(
        superseded.select("doc_id", "seq").distinct(), ["doc_id", "seq"], "left_semi"
    )
    return hit.groupBy("term").agg(
        F.count(F.lit(1)).alias("dead_df"), F.sum("tf").alias("dead_cf")
    )
