"""Two-cluster-size scaling benchmark (north rule criterion).

No real cluster exists in this sandbox, so the N vs 4N executor
comparison is evidenced by running the IDENTICAL job on IDENTICAL input
at two parallelism levels — local[8] (N) and local[32] (4N) — with
spark.sql.shuffle.partitions scaled proportionally, each in a fresh JVM
(subprocess) so nothing warm carries over.

Work measured per run:
  1. index build: parquet scan -> tokenize -> postings -> stats ->
     salted block-max segments (delta+varbyte) -> manifest commit
  2. query batch: BM25 top-10 via the segment/WAND path

Output: JSON per run + BENCH/BASELINE.md with
  efficiency = (throughput_4N / throughput_N) / 4   (target >= 0.8)

Usage:
  python bench/scaling.py            # orchestrates both runs + report
  python bench/scaling.py worker 8   # single run (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONV = int(os.environ.get("SCALING_N_CONV", "40000"))
TURNS = 8
SEED = 42
QUERIES = [
    (0, "the spark data"),
    (1, "w0001 w0002"),
    (2, "w0005 w0013 w0042"),
    (3, "query data w0100"),
    (4, "w0000"),
]


def corpus_path() -> str:
    return os.path.join(
        tempfile.gettempdir(), f"mwmbl_scaling_corpus_{N_CONV}x{TURNS}_s{SEED}"
    )


def ensure_corpus() -> str:
    path = corpus_path()
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from mwmbl_spark import get_spark
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    spark = get_spark("scaling-gen", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    with_doc_id(
        synth_transcripts(spark, n_conv=N_CONV, turns_per_conv=TURNS, seed=SEED, partitions=64)
    ).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def worker(cores: int) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from mwmbl_spark import get_spark
    from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig

    path = corpus_path()
    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(path)
    n_turns = transcripts.count()

    # Warm the Python workers (fork + pandas/numpy import, once per JVM)
    # before timing: on a real cluster executors are long-lived and warm;
    # in a fresh local JVM the concurrent cold imports of N workers would
    # otherwise be billed to the first pandas-UDF stage of the build.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):  # pragma: no cover
        return s

    spark.range(cores * 4, numPartitions=cores).select(_warm("id")).count()

    idx = tempfile.mkdtemp(prefix=f"mwmbl_scaling_idx_{cores}_")
    # nsalt is part of the INDEX layout, not the execution config — it
    # must be identical across parallelism levels or the runs do
    # different work
    cfg = IndexConfig(path=idx, num_buckets=64, nsalt=32, n_src_partitions=1)
    builder = IndexBuilder(spark, cfg)

    t0 = time.perf_counter()
    builder.build(transcripts)
    build_s = time.perf_counter() - t0

    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    t0 = time.perf_counter()
    n_res = builder.query_topk(qdf, k=10).count()
    query_s = time.perf_counter() - t0

    print(
        "RESULT "
        + json.dumps(
            {
                "cores": cores,
                "n_turns": n_turns,
                "build_seconds": round(build_s, 3),
                "build_turns_per_sec": round(n_turns / build_s, 2),
                "query_seconds": round(query_s, 3),
                "query_results": n_res,
            }
        )
    )
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


def run_worker(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "worker", str(cores)],
        capture_output=True,
        text=True,
        cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker {cores} failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main() -> None:
    ensure_corpus()
    r8 = run_worker(8)
    r32 = run_worker(32)
    eff_build = (r32["build_turns_per_sec"] / r8["build_turns_per_sec"]) / 4
    eff_query = (r8["query_seconds"] / r32["query_seconds"]) / 4
    report = {
        "n_turns": r8["n_turns"],
        "local8": r8,
        "local32": r32,
        "build_scaling_efficiency": round(eff_build, 3),
        "query_speedup": round(r8["query_seconds"] / r32["query_seconds"], 3),
        "target": 0.8,
        "pass": eff_build >= 0.8,
    }
    print(json.dumps(report))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(render_md(report))


def render_md(r: dict) -> str:
    return f"""# BENCH/BASELINE — measured engine numbers

## Scaling protocol (north rule: N vs 4N executors, efficiency >= 0.8)

No real cluster exists in this sandbox; per the driver instruction the
two-cluster-size criterion is evidenced by running the identical job on
the identical input at two parallelism levels in fresh JVMs:
`local[8]` (N) vs `local[32]` (4N), `spark.sql.shuffle.partitions`
scaled proportionally (8 -> 32).

Workload: deterministic synthetic transcripts (seed={SEED},
{N_CONV} conversations x {TURNS} turns = {r["n_turns"]} turns), full
segment index build (tokenize -> postings -> stats -> salted block-max
segments with delta+varbyte compression -> manifest commit) and a
5-query BM25 top-10 batch through the segment/WAND path.

| parallelism | build (s) | build turns/s | query batch (s) |
|---|---|---|---|
| local[8]  (N)  | {r["local8"]["build_seconds"]} | {r["local8"]["build_turns_per_sec"]} | {r["local8"]["query_seconds"]} |
| local[32] (4N) | {r["local32"]["build_seconds"]} | {r["local32"]["build_turns_per_sec"]} | {r["local32"]["query_seconds"]} |

**Build scaling efficiency = (throughput_4N / throughput_N) / 4 =
{r["build_scaling_efficiency"]}** (target >= 0.8: {"PASS" if r["pass"] else "FAIL"})

Query-batch speedup at 4N: {r["query_speedup"]}x (query latency on this
corpus is dominated by fixed per-job costs, reported for completeness;
the throughput criterion is the build).

Regenerate: `python bench/scaling.py` (SCALING_N_CONV env scales the corpus).
"""


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
    else:
        main()
