"""Fragment-growth bench: does query latency stay flat as upsert
commits accumulate, and does compaction restore the single-commit cost?

Protocol: build a base index, then apply K upsert batches (each
re-crawls a deterministic slice of docs), timing a 6-query BM25 top-10
batch (median of reps) at commit counts 1, 4, 8, 16; compact; measure
again. Also reports live fragment count and delete-vector size at each
point. Run:

    python bench/upsert_scale.py [n_conv] [cores] [reps]

Writes one JSON line; BENCH/BASELINE.md records results per round.

What "good" looks like at 100 TB: latency growth from 1 -> 16 commits
should be mild (the kernel's per-segment-row fixed cost times fragment
count — this is exactly the read amplification compaction exists to
bound), and post-compaction latency should return to ~the 1-commit
level while the delete map goes to zero.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mwmbl_spark import get_spark  # noqa: E402
from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig  # noqa: E402
from mwmbl_spark.synth import synth_transcripts, with_doc_id  # noqa: E402

QUERIES = [
    (0, "the spark data query"),
    (1, "the w0042"),
    (2, "spark w0313 w0777"),
    (3, "w0042 w0313 w0777 w1500"),
    (4, "data w0005 the"),
    (5, "w0001 w0002 spark"),
]
MEASURE_AT = {1, 4, 8, 16}


def _measure(spark, builder, reps: int) -> float:
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        n = builder.query_topk(qdf, k=10).count()
        walls.append(time.perf_counter() - t0)
        assert n > 0
    return statistics.median(walls)


def _seg_rows(spark, builder) -> int:
    """Deterministic read-amplification metric: segment rows the query
    batch's terms touch across live fragments (wall clocks at this
    corpus size sit inside VM noise; this count is exact)."""
    from mwmbl_spark.operators.bm25 import query_terms
    from mwmbl_spark.operators.segments import prune_segments

    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    return prune_segments(
        builder.segments(), query_terms(qdf), builder.cfg.num_buckets
    ).count()


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("upsert-scale", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="upsert_scale_")
    out: dict = {"metric": "query latency vs upsert commit count", "unit": "sec",
                 "n_conv": n_conv, "cores": cores, "reps": reps, "points": {}}
    try:
        docs = with_doc_id(
            synth_transcripts(spark, n_conv=n_conv, turns_per_conv=8)
        ).persist()
        docs.count()
        cfg = IndexConfig(path=os.path.join(tmp, "idx"), num_buckets=32,
                          nsalt=8, n_src_partitions=1)
        b = IndexBuilder(spark, cfg)
        t0 = time.perf_counter()
        b.build(docs)
        out["build_sec"] = round(time.perf_counter() - t0, 3)
        # warm python workers before timing anything
        _measure(spark, b, 1)

        commits = 1
        if commits in MEASURE_AT:
            out["points"]["1"] = {"frags": len(b._live()),
                                  "seg_rows": _seg_rows(spark, b),
                                  "query_sec": round(_measure(spark, b, reps), 4)}
        upsert_walls = []
        for k in range(15):
            batch = docs.where(F.col("doc_id") % 31 == k).select(
                "doc_id",
                F.concat(F.col("text"), F.lit(f" recrawl{k} spark data")).alias("text"),
            )
            t0 = time.perf_counter()
            b.upsert(batch)
            upsert_walls.append(time.perf_counter() - t0)
            commits += 1
            if commits in MEASURE_AT:
                dm = b.delete_map()
                out["points"][str(commits)] = {
                    "frags": len(b._live()),
                    "deleted_docs": int(sum(len(v[0]) for v in dm.values())),
                    "seg_rows": _seg_rows(spark, b),
                    "query_sec": round(_measure(spark, b, reps), 4),
                }
        out["upsert_sec_median"] = round(statistics.median(upsert_walls), 3)

        # MINOR compaction first (the steady-state policy): merge only
        # the smallest fragments back to a bound of 4 — cost must track
        # the merged (update) postings, not the corpus. touched_frac is
        # the deterministic cost metric: postings of merged fragments /
        # postings of all live fragments.
        from mwmbl_spark.manifest import live_fragment_sizes

        pre_live = dict(b._live())
        pre_sizes = live_fragment_sizes(spark, b.cfg.path)
        t0 = time.perf_counter()
        b.maybe_compact(max_fragments=4)
        minor_sec = time.perf_counter() - t0
        merged = set(pre_live) - set(b._live())
        out["points"]["minor_compacted"] = {
            "frags": len(b._live()),
            "merged_frags": len(merged),
            "touched_frac": round(
                sum(pre_sizes[p] for p in merged) / max(1, sum(pre_sizes.values())), 4
            ),
            "minor_compact_sec": round(minor_sec, 3),
            "deleted_docs": int(sum(len(v[0]) for v in b.delete_map().values())),
            "seg_rows": _seg_rows(spark, b),
            "query_sec": round(_measure(spark, b, reps), 4),
        }

        t0 = time.perf_counter()
        b.compact()
        out["compact_sec"] = round(time.perf_counter() - t0, 3)
        out["points"]["compacted"] = {
            "frags": len(b._live()),
            "deleted_docs": int(sum(len(v[0]) for v in b.delete_map().values())),
            "seg_rows": _seg_rows(spark, b),
            "query_sec": round(_measure(spark, b, reps), 4),
        }
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
