"""Disk-backed change-feed dedup staging (round-6, VERDICT r5 #8).

The in-memory ``DedupStaging`` (operators/dedup.py) proved the
maintenance ALGEBRA, but its epoch refresh re-materializes the full
shingle/band/count tables (three corpus-sized eager checkpoints) and
its query path scans the corpus-sized shingle table three times inside
``jaccard_pairs`` — the corpus-proportional residual
bench/incremental_dedup_scale.py recorded as a 1.47x epoch-cost ratio
at a 10x corpus. This module is the production form: the staging
tables live as PARQUET under one directory, and an epoch

- WRITES only |changed|-sized files: a per-epoch delta of shingle and
  band rows plus a tombstone list — never a rewrite of corpus rows;
- READS the corpus tables only through pruned scans: files are
  hash-bucketed (``partitionBy`` on ``pmod(xxhash64(key), nbuckets)``,
  directory-level pruning) and CLUSTERED (sorted by doc_id / band_key
  inside each bucket, so the literal ``isin`` pushdown skips parquet
  row groups via min/max stats — the same clustered-write discipline
  the segment index uses).

Row liveness is merge-on-read, the delete-vector idea from
plans/build_index: a doc changed in epoch N gets a tombstone (doc_id,
N); a stored row is live iff its epoch >= the doc's latest tombstone
epoch (rewrites land in the same epoch as their tombstone). Tombstone
tables are epoch-sized and broadcast.

The global band cap (degenerate-bucket guard) is maintained as the
OVER-CAP KEY SET only — counts themselves are never persisted or
recounted corpus-wide. An epoch can change the count only of keys in
its removed/added band rows, so the refresh recounts exactly those
keys (plus the current over set) through a pruned scan and rewrites
the tiny ``over`` table.

Scale notes (honest): directory pruning binds when the epoch's key set
hits few buckets — at web scale with nbuckets sized to the corpus;
at bench scale the measured win comes from delta-only writes and the
single pruned+checkpointed shingle fetch replacing the triple
corpus scan. ``near_duplicates`` output is row-identical to
``incremental_near_duplicates`` on the in-memory staging
(tests/test_dedup_staging.py gates equality).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mwmbl_spark.operators.dedup import (
    DEFAULT_BAND_CAP,
    _sig_bands,
    jaccard_pairs,
    minhash_signatures,
    shingle_rows,
)

LOG = logging.getLogger("mwmbl_spark.dedup_store")

#: literal-isin pushdown ceiling: above this many ids the pruned scan
#: falls back to a semi-join (a multi-million-term IN list bloats the
#: plan; at that epoch size the scan is no longer the bottleneck)
MAX_PUSHED_IDS = 100_000


def _bucket(col, n: int):
    return F.pmod(F.xxhash64(col), F.lit(n)).cast("int")


def _bucket_py(v, n: int) -> int:
    """Driver twin of ``pmod(xxhash64(v), n)`` — longs hash their
    8-byte little-endian form (Spark's LongType path), strings their
    UTF-8 bytes. Parity is pytest-gated (tests/test_dedup_store.py)."""
    from mwmbl_spark.functions.xxhash import xxhash64_py

    b = v.encode("utf-8") if isinstance(v, str) else int(v).to_bytes(
        8, "little", signed=True
    )
    return xxhash64_py(b) % n


def _pushed_filter(df: DataFrame, col: str, ids: list, bucket_col: str, n: int):
    """Restrict ``df`` to ``col in ids`` as LITERAL predicates so the
    parquet scan prunes: bucket list -> directory pruning, id list ->
    row-group min/max skipping on the clustered sort key."""
    buckets = sorted({_bucket_py(i, n) for i in ids})
    return df.where(
        F.col(bucket_col).isin(buckets) & F.col(col).isin(list(ids))
    )


class DedupStagingStore:
    """See module docstring. Construct via ``build_dedup_staging_store``
    or attach to an existing directory with ``DedupStagingStore(spark,
    path)`` (state — band_cap, nbuckets, current epoch — is recovered
    from the layout)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        band_cap: int | None = DEFAULT_BAND_CAP,
        nbuckets: int = 32,
    ):
        self.spark = spark
        self.path = path
        self.band_cap = band_cap
        self.nbuckets = nbuckets
        self.epoch = self._max_epoch()

    # -- layout ---------------------------------------------------------
    def _max_epoch(self) -> int:
        try:
            eps = [
                int(r["epoch"])
                for r in self.spark.read.parquet(f"{self.path}/tombstones")
                .select("epoch").distinct().collect()
            ]
            return max(eps) if eps else 0
        except Exception:  # noqa: BLE001 — no tombstones yet: base only
            return 0

    def _tombstones(self) -> DataFrame | None:
        """(doc_id, last_t): latest tombstone epoch per doc — tiny."""
        if self.epoch == 0:
            return None
        return (
            self.spark.read.parquet(f"{self.path}/tombstones")
            .groupBy("doc_id")
            .agg(F.max("epoch").alias("last_t"))
        )

    def _live(self, df: DataFrame) -> DataFrame:
        """Merge-on-read liveness: row live iff epoch >= the doc's
        latest tombstone epoch (rewrites share their tombstone's
        epoch, so the fresh rows survive their own tombstone)."""
        tomb = self._tombstones()
        if tomb is None:
            return df
        return (
            df.join(F.broadcast(tomb), "doc_id", "left")
            .where(F.col("last_t").isNull() | (F.col("epoch") >= F.col("last_t")))
            .drop("last_t")
        )

    def _read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/{table}")

    def _write_shingles(self, sr: DataFrame, epoch: int) -> None:
        (
            sr.withColumn("doc_bucket", _bucket(F.col("doc_id"), self.nbuckets))
            .repartition(self.nbuckets, "doc_bucket")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .partitionBy("doc_bucket")
            .parquet(f"{self.path}/shingles/epoch={epoch}")
        )

    def _write_bands(self, bands: DataFrame, epoch: int) -> None:
        (
            bands.withColumn("band_bucket", _bucket(F.col("band_key"), self.nbuckets))
            .repartition(self.nbuckets, "band_bucket")
            .sortWithinPartitions("band_key")
            .write.mode("overwrite")
            .partitionBy("band_bucket")
            .parquet(f"{self.path}/bands/epoch={epoch}")
        )

    # -- reads ----------------------------------------------------------
    def live_shingles(self, doc_ids: list | None = None) -> DataFrame:
        """(doc_id, shingle) live rows; ``doc_ids`` prunes the scan."""
        sr = self._read("shingles")
        if doc_ids is not None and 0 < len(doc_ids) <= MAX_PUSHED_IDS:
            sr = _pushed_filter(sr, "doc_id", doc_ids, "doc_bucket", self.nbuckets)
        return self._live(sr).select("doc_id", "shingle")

    def _over_keys(self) -> DataFrame | None:
        if self.band_cap is None:
            return None
        return self._read("over").select("band_key")

    def live_bands(self, band_keys: list | None = None, capped: bool = True) -> DataFrame:
        """(doc_id, band_key) live rows; ``band_keys`` prunes the scan;
        ``capped`` drops over-cap keys whole (cap_bands semantics via
        the maintained over set)."""
        b = self._read("bands")
        if band_keys is not None and 0 < len(band_keys) <= MAX_PUSHED_IDS:
            b = _pushed_filter(b, "band_key", band_keys, "band_bucket", self.nbuckets)
        b = self._live(b)
        over = self._over_keys()
        if capped and over is not None:
            b = b.join(F.broadcast(over), "band_key", "left_anti")
        return b.select("doc_id", "band_key")

    # -- maintenance ------------------------------------------------------
    def _refresh_over(self, affected_keys: DataFrame) -> None:
        """Exact over-cap set refresh touching ONLY keys an epoch could
        have moved (its removed+added band keys) plus the current over
        set; everything else keeps its old verdict."""
        if self.band_cap is None:
            return
        old_over = self._read("over").select("band_key")
        check = affected_keys.unionByName(old_over).distinct()
        keys = [r["band_key"] for r in check.collect()]
        if not keys:
            return
        b = self._read("bands")
        if len(keys) <= MAX_PUSHED_IDS:
            b = _pushed_filter(b, "band_key", keys, "band_bucket", self.nbuckets)
        else:
            b = b.join(F.broadcast(check), "band_key", "left_semi")
        counts = self._live(b).groupBy("band_key").agg(F.count(F.lit(1)).alias("n"))
        # eager checkpoint MATERIALIZES the new set before the write
        # truncates the old one it was derived from (counts reads only
        # the bands table, but `check` read `over` — already collected)
        new_over = (
            counts.where(F.col("n") > self.band_cap)
            .select("band_key")
            .localCheckpoint(eager=True)
        )
        new_over.write.mode("overwrite").parquet(f"{self.path}/over")

    def update(
        self,
        docs_current: DataFrame,
        changed_ids: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> "DedupStagingStore":
        """One change-feed epoch: tombstone the changed docs, append
        their recomputed shingle/band rows as epoch deltas, refresh the
        over-cap set for the keys this epoch touched. Work and writes
        are |changed|-proportional; the only corpus-table access is the
        pruned recount scan in ``_refresh_over``. Returns self."""
        ep = self.epoch + 1
        ch = changed_ids.select(F.col(id_col).alias("doc_id")).distinct()
        ch_ids = [r["doc_id"] for r in ch.collect()]
        if not ch_ids:
            return self

        # keys whose counts SHRINK: band keys of the changed docs' OLD
        # rows — recomputed from their (pruned) live shingles rather
        # than scanning the band table by doc (bands are clustered by
        # band_key, not doc_id)
        old_sr = self.live_shingles(ch_ids).localCheckpoint(eager=True)
        removed_keys = _sig_bands(minhash_signatures(old_sr)).select("band_key")

        changed_docs = docs_current.join(
            ch.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
        )
        new_sr = shingle_rows(changed_docs, text_col, id_col).localCheckpoint(
            eager=True
        )
        new_bands = _sig_bands(minhash_signatures(new_sr)).localCheckpoint(eager=True)

        self._write_shingles(new_sr, ep)
        self._write_bands(new_bands, ep)
        ch.withColumn("epoch", F.lit(ep)).write.mode("overwrite").parquet(
            f"{self.path}/tombstones/epoch={ep}"
        )
        self.epoch = ep
        affected = removed_keys.unionByName(
            new_bands.select("band_key")
        ).distinct()
        self._refresh_over(affected)
        return self

    # -- query ------------------------------------------------------------
    def near_duplicates(
        self, changed_ids: DataFrame, threshold: float = 0.5
    ) -> DataFrame:
        """``incremental_near_duplicates`` served from the store —
        row-identical output, corpus access through pruned scans only:

        1. changed docs' band rows: recomputed from their pruned live
           shingles (|changed| work),
        2. candidate band rows: live bands pruned to the changed rows'
           band keys (literal pushdown -> bucket + row-group pruning),
        3. verify: live shingles pruned to the candidate pair docs,
           checkpointed once, fed to jaccard_pairs (which reads its
           input three times — against the corpus table that tripled
           the epoch scan; against the pruned checkpoint it's free).
        """
        ch_ids = [
            r["doc_id"]
            for r in changed_ids.select("doc_id").distinct().collect()
        ]
        if not ch_ids:
            return self.spark.createDataFrame(
                [], "doc_a long, doc_b long, jaccard double"
            )
        sr_ch = self.live_shingles(ch_ids).localCheckpoint(eager=True)
        bands_changed = _sig_bands(minhash_signatures(sr_ch))
        over = self._over_keys()
        if over is not None:
            bands_changed = bands_changed.join(
                F.broadcast(over), "band_key", "left_anti"
            )
        bands_changed = bands_changed.localCheckpoint(eager=True)
        keys = [
            r["band_key"]
            for r in bands_changed.select("band_key").distinct().collect()
        ]
        if not keys:
            return self.spark.createDataFrame(
                [], "doc_a long, doc_b long, jaccard double"
            )
        b = self.live_bands(band_keys=keys)
        a = bands_changed.alias("a")
        cands = (
            F.broadcast(a)
            .join(b.alias("b"), "band_key")
            .where(F.col("a.doc_id") != F.col("b.doc_id"))
            .select(
                F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        pair_ids = sorted(
            {r["doc_a"] for r in cands.select("doc_a").distinct().collect()}
            | {r["doc_b"] for r in cands.select("doc_b").distinct().collect()}
        )
        if not pair_ids:
            return self.spark.createDataFrame(
                [], "doc_a long, doc_b long, jaccard double"
            )
        if len(pair_ids) > MAX_PUSHED_IDS:
            LOG.warning(
                "near_duplicates epoch touches %d candidate docs — the "
                "shingle fetch falls back to an unpruned scan", len(pair_ids),
            )
        sr_pairs = self.live_shingles(pair_ids).localCheckpoint(eager=True)
        jc = jaccard_pairs(cands, sr_pairs, min_jaccard=threshold)
        return jc.where(F.col("jaccard") >= threshold).select(
            "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
        )


def build_dedup_staging_store(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_cap: int | None = DEFAULT_BAND_CAP,
    nbuckets: int = 32,
) -> DedupStagingStore:
    """Full-corpus staging build to disk — the one corpus-sized pass
    (the same cost the one-shot pipeline pays); every later epoch is
    |changed|-proportional (DedupStagingStore.update)."""
    store = DedupStagingStore(spark, path, band_cap=band_cap, nbuckets=nbuckets)
    sr = shingle_rows(docs, text_col, id_col).localCheckpoint(eager=True)
    bands = _sig_bands(minhash_signatures(sr)).localCheckpoint(eager=True)
    store._write_shingles(sr, 0)
    store._write_bands(bands, 0)
    if band_cap is not None:
        (
            bands.groupBy("band_key")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > band_cap)
            .select("band_key")
            .write.mode("overwrite")
            .parquet(f"{path}/over")
        )
    store.epoch = 0
    return store
