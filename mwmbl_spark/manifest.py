"""Per-partition build manifest — resume/lineage (reference S4 analogue).

The reference tracks batch lifecycle in a Postgres ``batches`` table
(REMOTE -> LOCAL -> URLS_UPDATED -> INDEXED,
/root/reference/mwmbl/indexer/indexdb.py:10-35) advanced idempotently in
chunks (process_batch.py:12-33), plus a ``last_page_copied`` cursor for
re-shards (background.py:50-71). Our analogue is a tiny append-only
Parquet table next to the index:

    {index}/_manifest/   rows: (src_partition, status, n_docs,
                                n_postings, wall_ms, committed_at)

Commit protocol (idempotent, crash-safe):
  1. segment + stats data for partition P is written with
     ``overwrite`` into partition-scoped subdirectories — re-running P
     replaces, never duplicates;
  2. the manifest row is appended only AFTER the data write succeeds.
  A crash between (1) and (2) leaves P unlisted -> the next run redoes
  P and overwrites the partial output. A crash before (1) completes
  leaves stale files that the overwrite replaces. Readers consult the
  manifest, so uncommitted partitions are invisible (on a real cluster
  this maps 1:1 to an Iceberg transaction: data files + manifest entry
  commit atomically).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATUS_INDEXED = "INDEXED"

MANIFEST_SCHEMA = (
    "src_partition string, status string, n_docs long, n_postings long, "
    "wall_ms long, committed_at timestamp, seq long, replaces string"
)


def manifest_path(index_path: str) -> str:
    return f"{index_path}/_manifest"


def read_manifest(spark: SparkSession, index_path: str) -> DataFrame:
    try:
        return spark.read.parquet(manifest_path(index_path))
    except Exception:  # noqa: BLE001 — first build: empty manifest
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def _read_rows(spark: SparkSession, index_path: str) -> list[dict]:
    """All manifest rows as dicts (seq/replaces default 0/"" for rows
    written before the upsert epoch). Local manifests are read
    driver-side with pyarrow (the manifest is a handful of single-row
    files written driver-side; a Spark job costs ~0.3-0.5 s of pure
    scheduling per call and query_topk consults this 2-3x per batch).
    Non-local paths (hdfs://, s3://) fall back to the Spark reader — at
    that point the manifest is Iceberg metadata anyway."""
    d = manifest_path(index_path)
    rows: list[dict] = []
    if "://" not in d or d.startswith("file://"):
        import glob

        import pyarrow.parquet as pq

        local = d.removeprefix("file://")
        for f in glob.glob(os.path.join(local, "*.parquet")):
            t = pq.read_table(f)
            names = set(t.schema.names)
            cols = {
                "src_partition": t.column("src_partition").to_pylist(),
                "status": t.column("status").to_pylist(),
                "n_postings": t.column("n_postings").to_pylist() if "n_postings" in names else None,
                "seq": t.column("seq").to_pylist() if "seq" in names else None,
                "replaces": t.column("replaces").to_pylist() if "replaces" in names else None,
            }
            for i in range(t.num_rows):
                rows.append(
                    {
                        "src_partition": cols["src_partition"][i],
                        "status": cols["status"][i],
                        "n_postings": int(cols["n_postings"][i] or 0) if cols["n_postings"] else 0,
                        "seq": int(cols["seq"][i]) if cols["seq"] else 0,
                        "replaces": (cols["replaces"][i] or "") if cols["replaces"] else "",
                    }
                )
        return rows
    m = read_manifest(spark, index_path)
    if "seq" not in m.columns:
        m = m.withColumn("seq", F.lit(0).cast("long"))
    if "replaces" not in m.columns:
        m = m.withColumn("replaces", F.lit("").cast("string"))
    for r in m.select("src_partition", "status", "n_postings", "seq", "replaces").collect():
        rows.append(
            {
                "src_partition": r["src_partition"],
                "status": r["status"],
                "n_postings": int(r["n_postings"] or 0),
                "seq": int(r["seq"] or 0),
                "replaces": r["replaces"] or "",
            }
        )
    return rows


def partition_seqs(
    spark: SparkSession, index_path: str, as_of: int | None = None
) -> dict[str, int]:
    """LIVE fragments -> commit seq. A fragment is live when it is
    INDEXED and not listed in any committed fragment's ``replaces``
    (compaction supersedes its inputs logically before any physical
    vacuum). Re-commits of the same src_part keep the max seq.

    ``as_of``: TIME TRAVEL — reconstruct the live set as it stood right
    after commit seq ``as_of``: manifest rows with a larger seq are
    ignored, so a later compaction's ``replaces`` does not hide the
    fragments it merged and later upserts' fragments are invisible.
    Seqs are globally monotonic (``next_seq``), which makes the commit
    log totally ordered — the same property Delta/Iceberg snapshot
    isolation rests on. A snapshot stays READABLE only while its
    fragment files survive, i.e. until ``compact(vacuum=True)``
    physically removes replaced directories (exactly Delta's
    VACUUM-breaks-time-travel contract)."""
    rows = [r for r in _read_rows(spark, index_path) if r["status"] == STATUS_INDEXED]
    if as_of is not None:
        rows = [r for r in rows if r["seq"] <= as_of]
    seqs: dict[str, int] = {}
    replaced: set[str] = set()
    for r in rows:
        part = r["src_partition"]
        seqs[part] = max(seqs.get(part, 0), r["seq"])
        if r["replaces"]:
            replaced.update(p for p in r["replaces"].split(",") if p)
    return {p: s for p, s in seqs.items() if p not in replaced}


def live_fragment_sizes(spark: SparkSession, index_path: str) -> dict[str, int]:
    """LIVE fragments -> n_postings of their latest commit (the size
    signal ``maybe_compact``'s binpack policy ranks on). Metadata-only —
    no data files are touched."""
    rows = [r for r in _read_rows(spark, index_path) if r["status"] == STATUS_INDEXED]
    live = partition_seqs(spark, index_path)
    sizes: dict[str, int] = {}
    for r in rows:
        part = r["src_partition"]
        if live.get(part) == r["seq"]:
            sizes[part] = abs(int(r["n_postings"]))
    return {p: sizes.get(p, 0) for p in live}


def committed_partitions(spark: SparkSession, index_path: str) -> set[str]:
    """The LIVE committed set (read-side visibility): committed minus
    compaction-replaced. Use ``ever_committed_partitions`` for
    resume/pending logic — a replaced base partition must not rebuild,
    its docs live on in the compacted fragment."""
    return set(partition_seqs(spark, index_path))


def ever_committed_partitions(spark: SparkSession, index_path: str) -> set[str]:
    return {
        r["src_partition"]
        for r in _read_rows(spark, index_path)
        if r["status"] == STATUS_INDEXED
    }


def current_seq(spark: SparkSession, index_path: str) -> int:
    """Max committed seq (0 = empty index): the snapshot handle a caller
    captures BEFORE a mutation to time-travel back to it later via
    ``partition_seqs(..., as_of=...)`` / ``IndexBuilder.query_topk(...,
    as_of=...)``."""
    rows = _read_rows(spark, index_path)
    return max(
        (r["seq"] for r in rows if r["status"] == STATUS_INDEXED), default=0
    )


def next_seq(spark: SparkSession, index_path: str) -> int:
    """1 + max seq over ALL manifest rows (including replaced): seqs are
    globally monotonic — delete-vector semantics (`kills postings of
    fragments with smaller seq`) depend on it."""
    rows = _read_rows(spark, index_path)
    return 1 + max((r["seq"] for r in rows), default=0)


def commit_partition(
    spark: SparkSession,
    index_path: str,
    src_partition: str,
    n_docs: int,
    n_postings: int,
    wall_ms: int,
    seq: int = 0,
    replaces: list[str] | None = None,
) -> None:
    """Append one manifest row as a uniquely-named parquet file written
    driver-side (pyarrow): a single metadata row does not warrant a
    Spark job (measured ~4 s of pure job overhead), and a unique-file
    append is atomic on a filesystem and maps to an Iceberg append on a
    real cluster."""
    import uuid
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = manifest_path(index_path)
    os.makedirs(path, exist_ok=True)
    table = pa.table(
        {
            "src_partition": pa.array([src_partition], pa.string()),
            "status": pa.array([STATUS_INDEXED], pa.string()),
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_postings": pa.array([n_postings], pa.int64()),
            "wall_ms": pa.array([wall_ms], pa.int64()),
            "committed_at": pa.array(
                [datetime.now(timezone.utc).replace(tzinfo=None)],
                pa.timestamp("us"),
            ),
            "seq": pa.array([seq], pa.int64()),
            "replaces": pa.array([",".join(replaces or [])], pa.string()),
        }
    )
    tmp = os.path.join(path, f".tmp-{uuid.uuid4().hex}.parquet")
    final = os.path.join(path, f"commit-{uuid.uuid4().hex}.parquet")
    pq.write_table(table, tmp)
    os.rename(tmp, final)  # atomic publish


def pending_partitions(
    spark: SparkSession, index_path: str, all_partitions: list[str]
) -> list[str]:
    """Set difference vs the manifest (the reference's status-driven
    chunk selection, process_batch.py:27-29) — anti-join semantics,
    done driver-side because the partition list is tiny. Uses the
    EVER-committed set: a compaction-replaced partition stays done."""
    done = ever_committed_partitions(spark, index_path)
    return [p for p in all_partitions if p not in done]


def wait_stamp() -> float:
    return time.perf_counter()
