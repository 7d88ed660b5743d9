"""MERGE targets (S7 in SURVEY.md §2.1) — Iceberg first, parquet fallback.

The reference hands decoded rows to user code (README.md:61); the whole
point of this engine is the missing half: applying them. Two interchangeable
sinks behind one interface:

- ``IcebergMergeTarget`` — real ``MERGE INTO`` + ``ALTER TABLE ADD COLUMN``
  (additive schema evolution from TABLE_MAP metadata). Used when an Iceberg
  catalog is configured on the session; this sandbox's pyspark has no
  Iceberg runtime jar, so tests exercise the fallback.
- ``ParquetMergeTarget`` — versioned-snapshot MERGE-equivalent: the new
  snapshot = (current rows whose key is untouched) ∪ (net upserts). Written
  as a key-hash-repartitioned parquet dir; the commit point is the *ledger
  append*, not the snapshot write, so a torn write is invisible.

Scale notes (100 TB target, 10^8-row net changes per batch):
- the anti-join of current-state × touched-keys shuffles on the key; the
  touched-key side is the *net* (post-LWW) change set, which is bounded by
  keys-touched-per-batch, not by event count;
- at cluster scale the Iceberg path is strictly better (metadata-pruned
  MERGE touches only affected data files); the parquet fallback rewrites
  the snapshot and exists for environments without a catalog — interface
  and tests are identical.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..binlog.decoder import TableSpec, TRANSCRIPTS, _ddl_to_type


def empty_state_df(spark: SparkSession, spec: TableSpec = TRANSCRIPTS) -> DataFrame:
    schema = T.StructType(
        [T.StructField(n, _ddl_to_type(d), True) for n, d, _ in spec.columns]
    )
    return spark.createDataFrame([], schema)


def snapshot_diff(
    old: DataFrame, new: DataFrame, spec: TableSpec, images: str = "applied"
) -> DataFrame:
    """Row-level change feed between two state snapshots — the read-side
    twin of MERGE (Delta/Iceberg's changed-data-feed, derived here from
    versioned snapshots rather than logged at write time).

    One output row per key whose image differs: ``change_type`` in
    (``insert``, ``update``, ``delete``), then per ``images``:

    - ``"applied"`` (default): the spec columns once — the new image for
      insert/update, the old image for delete (what a downstream consumer
      needs to re-apply or invert the change);
    - ``"both"``: ``old_<c>`` and ``new_<c>`` for every non-key column —
      what delta-folding consumers (incremental view maintenance) need to
      subtract the outgoing contribution and add the incoming one.

    Plan shape: one key-partitioned full-outer join; both sides arrive
    hash-repartitioned by key from the snapshot write, and unchanged
    rows are filtered before anything else touches them (null-safe
    column compare, all JVM codegen)."""
    keys = list(spec.primary_key)
    vals = [n for n, _, _ in spec.columns if n not in keys]
    o = old.select(
        *keys,
        F.lit(True).alias("_o_present"),
        *[F.col(c).alias(f"_o_{c}") for c in vals],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("_n_present"),
        *[F.col(c).alias(f"_n_{c}") for c in vals],
    )
    j = o.join(n, on=keys, how="full_outer")
    differs = F.lit(False)
    for c in vals:
        differs = differs | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change_type = (
        F.when(F.col("_o_present").isNull(), F.lit("insert"))
        .when(F.col("_n_present").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    if images == "both":
        out_vals = [F.col(f"_o_{c}").alias(f"old_{c}") for c in vals] + [
            F.col(f"_n_{c}").alias(f"new_{c}") for c in vals
        ]
    else:
        out_vals = [
            F.when(change_type == "delete", F.col(f"_o_{c}"))
            .otherwise(F.col(f"_n_{c}"))
            .alias(c)
            for c in vals
        ]
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type", *out_vals)
    )


class ParquetMergeTarget:
    """Versioned-snapshot parquet table with MERGE-equivalent upsert."""

    # persisted store-level family tag (``<store>/target_family.json``),
    # written at first commit: resuming a store MUST reopen it with the
    # same target family, and sniffing the manifest/file shapes cannot
    # distinguish e.g. a truncated merge-on-read store (empty {} manifest)
    # from copy-on-write. Subclasses override.
    FAMILY = "cow"

    def __init__(self, store_dir: str, spec: TableSpec = TRANSCRIPTS, buckets: int = 32):
        self.store_dir = store_dir
        self.spec = spec
        self.buckets = buckets
        os.makedirs(os.path.join(store_dir, "snapshots"), exist_ok=True)

    def snapshot_path(self, version: int) -> str:
        return os.path.join(self.store_dir, "snapshots", f"v{version:08d}")

    def _record_family(self) -> None:
        """Stamp the store's target family at commit time — LAST writer
        wins: a store is owned by whichever family last committed to it,
        so an intentional migration (e.g. a merge-on-read target
        ADOPTING a copy-on-write store's manifest) re-stamps on its
        first commit and later auto-detection reopens through the new
        family. Readers never write the stamp."""
        import json

        p = os.path.join(self.store_dir, "target_family.json")
        if os.path.exists(p):
            with open(p) as f:
                try:
                    if json.load(f).get("family") == self.FAMILY:
                        return
                except ValueError:
                    pass  # torn write: re-stamp below
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"family": self.FAMILY}, f)
        os.replace(tmp, p)

    def read(self, spark: SparkSession, version: int) -> DataFrame:
        if version <= 0:
            return empty_state_df(spark, self.spec)
        df = spark.read.parquet(self.snapshot_path(version))
        # additive evolution: older snapshots may predate new columns
        for name, ddl, _ in self.spec.columns:
            if name not in df.columns:
                df = df.withColumn(name, F.lit(None).cast(ddl))
        return df.select(*[n for n, _, _ in self.spec.columns])

    def merge(
        self,
        spark: SparkSession,
        net: DataFrame,
        current_version: int,
    ) -> int:
        """Apply net changes (one row per key: final op + after image) and
        write snapshot ``current_version + 1``. Returns the new version.

        ``net`` columns: key cols + ``op`` + ``after_<col>`` for every spec
        column.
        """
        self._record_family()
        spec = self.spec
        keys = list(spec.primary_key)
        state = self.read(spark, current_version)

        upserts = (
            net.filter(F.col("op") != "delete")
            .select(
                *[
                    F.col(f"after_{n}").cast(d).alias(n) if n not in keys else F.col(n).cast(d).alias(n)
                    for n, d, _ in spec.columns
                ]
            )
        )
        touched = net.select(*keys)

        # MERGE-equivalent: untouched current rows ∪ upserts. The anti-join
        # shuffles both sides by key; AQE handles skewed hot conversations
        # (session conf), and the net side is already key-unique post-LWW.
        survivors = state.join(touched, on=keys, how="left_anti")
        merged = survivors.unionByName(upserts, allowMissingColumns=False)

        new_version = current_version + 1
        out_path = self.snapshot_path(new_version)
        if os.path.exists(out_path):
            shutil.rmtree(out_path)  # orphan from a crashed batch — retry overwrites
        (
            merged.repartition(self.buckets, *[F.col(k) for k in keys])
            .write.mode("overwrite")
            .parquet(out_path)
        )
        return new_version

    def truncate(self, spark: SparkSession, current_version: int) -> int:
        """TRUNCATE TABLE: commit an empty state as version+1. Earlier
        snapshots stay readable for time travel until ``gc``; the change
        feed across the truncate version reads as one delete per stored
        row (``snapshot_diff`` against empty), so downstream consumers
        and IVM views fold the clear like ordinary changes."""
        new_version = current_version + 1
        out_path = self.snapshot_path(new_version)
        if os.path.exists(out_path):
            shutil.rmtree(out_path)  # orphan from a crashed batch
        empty_state_df(spark, self.spec).write.mode("overwrite").parquet(out_path)
        return new_version

    def merge_partial(
        self,
        spark: SparkSession,
        net: DataFrame,
        current_version: int,
    ) -> int:
        """MERGE for partial-image (MINIMAL) net changes: ``net`` carries
        key cols + ``op`` + ``after_<col>`` + ``carried_mask`` (from
        ``last_writer_wins_partial``); a matched row takes ``after_<c>``
        only for carried columns and keeps its stored value otherwise —
        the per-column form of Iceberg's ``UPDATE SET c = s.c`` clause
        list. Plan shape: one full-outer key join (same class as the
        anti-join ∪ union of the full-image path)."""
        self._record_family()
        spec = self.spec
        keys = list(spec.primary_key)
        state = self.read(spark, current_version)

        n = net.select(
            *[F.col(k).cast(d).alias(k) for k, d, _ in spec.columns if k in keys],
            F.col("op").alias("_op"),
            F.col("carried_mask").alias("_cm"),
            *[
                F.col(f"after_{c}").cast(d).alias(f"_s_{c}")
                for c, d, _ in spec.columns
                if c not in keys
            ],
        )
        joined = state.join(n, on=keys, how="full_outer")
        survives = F.col("_op").isNull() | (F.col("_op") != "delete")
        out_cols = [F.col(k) for k in keys]
        for ci, (c, _d, _k) in enumerate(spec.columns):
            if c in keys:
                continue
            bit = F.shiftright(F.col("_cm"), ci).bitwiseAND(F.lit(1)) == 1
            out_cols.append(
                F.when(F.col("_op").isNotNull() & bit, F.col(f"_s_{c}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        merged = joined.filter(survives).select(*out_cols).select(
            *[n_ for n_, _, _ in spec.columns]
        )

        new_version = current_version + 1
        out_path = self.snapshot_path(new_version)
        if os.path.exists(out_path):
            shutil.rmtree(out_path)
        (
            merged.repartition(self.buckets, *[F.col(k) for k in keys])
            .write.mode("overwrite")
            .parquet(out_path)
        )
        return new_version

    def read_changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int,
        images: str = "applied",
    ) -> DataFrame:
        """Change-data-feed between two retained snapshot versions (see
        ``snapshot_diff``). ``from_version=0`` diffs against the empty
        table, i.e. every live row comes back as an ``insert``."""
        return snapshot_diff(
            self.read(spark, from_version),
            self.read(spark, to_version),
            self.spec,
            images=images,
        )

    def gc(self, keep_latest: int) -> None:
        """Drop snapshots older than the newest ``keep_latest`` (bench/io)."""
        snaps = sorted(os.listdir(os.path.join(self.store_dir, "snapshots")))
        for name in snaps[:-keep_latest] if keep_latest else []:
            shutil.rmtree(os.path.join(self.store_dir, "snapshots", name))


class BucketedParquetMergeTarget(ParquetMergeTarget):
    """Bucket-pruned copy-on-write MERGE — the scale path for catalogs-less
    environments (the plain ``ParquetMergeTarget`` rewrites the whole
    snapshot every batch, which is O(table) and the one remaining
    scale-killer in the merge tier).

    Layout mirrors Iceberg's copy-on-write over bucket partitioning:

    - state is hash-bucketed by ``pmod(xxhash64(key cols), buckets)``;
    - each snapshot version is a directory holding (a) the parquet data of
      the buckets **this** batch rewrote (``data/_bucket=N/``) and (b) a
      ``manifest.json`` mapping every live bucket to the snapshot-relative
      path of its current data — untouched buckets keep pointing at the
      version that last wrote them (no copy, no rewrite);
    - ``merge`` reads ONLY the touched buckets' data (all rows that could
      match a net key hash into those buckets), anti-joins ∪ upserts, and
      writes only those buckets back. Per-batch IO is O(touched-bucket
      data), not O(table): at 10^10 rows with 2^12+ buckets a batch that
      touches 1% of keys reads and writes ~1% of the table.
    - the manifest write is the snapshot's internal commit point (data is
      written first); the *pipeline* commit point stays the ledger append,
      so a torn snapshot is invisible and ``Replayer``'s rollback
      (``rmtree(snapshot_path(v+1))``) removes data and manifest together.

    Same interface and semantics as ``ParquetMergeTarget`` (state equality
    is pinned by tests); drop-in via ``Replayer(target=...)``.

    ``bucket_cols`` picks the hash input (default: the full primary key).
    Bucketing on a prefix — e.g. ``("conv_id",)``, mirroring
    ``IcebergMergeTarget.ensure_table``'s ``bucket(64, conv_id)`` — keeps a
    conversation's turns in one bucket, so a batch touching K conversations
    rewrites at most K buckets however many turns it edits; the trade is
    intra-bucket skew if one conversation dwarfs the rest. Correctness only
    needs determinism: every net key hashes to the bucket holding its
    stored row, which any PK-subset satisfies.
    """

    FAMILY = "bucketed_cow"

    def __init__(
        self,
        store_dir: str,
        spec: TableSpec = TRANSCRIPTS,
        buckets: int = 64,
        bucket_cols: tuple | None = None,
    ):
        super().__init__(store_dir, spec, buckets)
        cols = tuple(bucket_cols) if bucket_cols else tuple(spec.primary_key)
        unknown = set(cols) - set(spec.primary_key)
        if unknown:
            raise ValueError(f"bucket_cols must be primary-key columns: {unknown}")
        self.bucket_cols = cols

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.snapshot_path(version), "manifest.json")

    def _layout_path(self, version: int) -> str:
        return os.path.join(self.snapshot_path(version), "bucketing.json")

    def _load_layout(self, version: int) -> tuple:
        """(buckets, bucket_cols) the snapshot at ``version`` was written
        with. The layout is PER-SNAPSHOT metadata (the analog of Iceberg's
        partition-spec-id on a snapshot): the hash placement of every
        stored row is a property of the data, not of whoever opens the
        store, so a merge MUST use the layout of the snapshot it merges
        from — a resume on a different cluster size (the constructor
        default tracks ``defaultParallelism``) would otherwise hash net
        keys into different buckets than the stored rows, skip the stored
        row in the anti-join, and leave duplicates behind. Falls back to
        the constructor values for snapshots written before layout
        persistence existed (same behavior as before)."""
        import json

        p = self._layout_path(version)
        if version > 0 and os.path.exists(p):
            with open(p) as f:
                d = json.load(f)
            return int(d["buckets"]), tuple(d["bucket_cols"])
        return self.buckets, self.bucket_cols

    def _adopt_layout(self, version: int) -> None:
        self.buckets, self.bucket_cols = self._load_layout(version)

    def _load_manifest(self, version: int) -> dict:
        """bucket id -> store-relative path of that bucket's parquet dir."""
        import json

        if version <= 0:
            return {}
        with open(self._manifest_path(version)) as f:
            return {int(k): v for k, v in json.load(f).items()}

    def _bucket_expr(self):
        ddl = {n: d for n, d, _ in self.spec.columns}
        cols = [F.col(k).cast(ddl[k]) for k in self.bucket_cols]
        return F.pmod(F.xxhash64(*cols), F.lit(self.buckets)).cast("int")

    def _read_full(self, spark: SparkSession, version: int) -> DataFrame:
        """Complete stored form of a snapshot — what a rebucket must carry
        forward verbatim. Subclasses storing extra per-row state (order
        tuples, tombstones) override this."""
        return self.read(spark, version)

    def read(self, spark: SparkSession, version: int, bucket_ids=None) -> DataFrame:
        """Read the table at ``version``; ``bucket_ids`` (a set) prunes the
        scan to those buckets' data dirs — the manifest is the metadata
        index, so pruning never touches unrelated files."""
        manifest = self._load_manifest(version)
        if bucket_ids is not None:
            manifest = {b: p for b, p in manifest.items() if b in bucket_ids}
        if not manifest:
            return empty_state_df(spark, self.spec)
        paths = sorted({os.path.join(self.store_dir, p) for p in manifest.values()})
        # buckets written before a schema evolution lack the new columns;
        # mergeSchema unions the parquet footers (cheap: one per bucket dir)
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        for name, ddl, _ in self.spec.columns:
            if name not in df.columns:
                df = df.withColumn(name, F.lit(None).cast(ddl))
        return df.select(*[n for n, _, _ in self.spec.columns])

    def _touched_buckets(self, net: DataFrame) -> list:
        # tiny driver-side action: ≤ ``buckets`` rows (bounded domain),
        # and the result drives both the pruned scan and the manifest
        rows = net.select(self._bucket_expr().alias("_b")).distinct().collect()
        return sorted(r["_b"] for r in rows)

    def _commit_buckets(
        self, merged: DataFrame, touched: list, current_version: int,
        carry_over: bool = True,
    ) -> int:
        """Write touched buckets under the new snapshot, splice the
        manifest (untouched entries carried over by reference), commit.
        ``carry_over=False`` (rebucket) starts the manifest empty — every
        live bucket of the new layout is written fresh."""
        import json

        self._record_family()
        new_version = current_version + 1
        snap = self.snapshot_path(new_version)
        if os.path.exists(snap):
            shutil.rmtree(snap)  # orphan from a crashed batch — retry overwrites
        data_dir = os.path.join(snap, "data")
        (
            merged.withColumn("_bucket", self._bucket_expr())
            .repartition(max(1, len(touched)), F.col("_bucket"))
            .write.partitionBy("_bucket")
            .parquet(data_dir)
        )
        manifest = {}
        if carry_over:
            manifest = {
                b: p
                for b, p in self._load_manifest(current_version).items()
                if b not in set(touched)
            }
        for b in touched:
            bucket_dir = os.path.join(data_dir, f"_bucket={b}")
            if os.path.isdir(bucket_dir):  # a fully-deleted bucket writes no dir
                manifest[b] = os.path.relpath(bucket_dir, self.store_dir)
        # layout first, manifest last: the manifest write stays the
        # snapshot's internal commit point, and a snapshot is never
        # readable without its layout metadata
        with open(self._layout_path(new_version), "w") as f:
            json.dump(
                {"buckets": self.buckets, "bucket_cols": list(self.bucket_cols)}, f
            )
        tmp = self._manifest_path(new_version) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({str(b): p for b, p in sorted(manifest.items())}, f)
        os.replace(tmp, self._manifest_path(new_version))
        return new_version

    def truncate(self, spark: SparkSession, current_version: int) -> int:
        """TRUNCATE TABLE on the bucketed layout: commit an EMPTY manifest
        as version+1 — a metadata-only operation (no data IO, exactly like
        Iceberg's metadata-delete), keeping the current layout. Earlier
        snapshots stay readable for time travel until ``gc``; the change
        feed across the truncate version reads as one delete per stored
        row (manifest diff: every live bucket repointed to nothing)."""
        import json

        self._adopt_layout(current_version)
        new_version = current_version + 1
        snap = self.snapshot_path(new_version)
        if os.path.exists(snap):
            shutil.rmtree(snap)  # orphan from a crashed batch
        os.makedirs(snap, exist_ok=True)
        with open(self._layout_path(new_version), "w") as f:
            json.dump(
                {"buckets": self.buckets, "bucket_cols": list(self.bucket_cols)}, f
            )
        tmp = self._manifest_path(new_version) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({}, f)
        os.replace(tmp, self._manifest_path(new_version))
        return new_version

    def merge(self, spark: SparkSession, net: DataFrame, current_version: int) -> int:
        self._adopt_layout(current_version)
        spec = self.spec
        keys = list(spec.primary_key)
        # net is the whole decode→gate→LWW pipeline, lazily. The touched-
        # bucket pre-pass AND the merge write both consume it — without a
        # persist the full pipeline would execute twice (measured ~2× on
        # the 9M-event scaling corpus). Post-LWW net is one row per key,
        # so the cache is keys-sized, not events-sized.
        net = net.persist()
        try:
            touched = self._touched_buckets(net)
            state = self.read(spark, current_version, bucket_ids=set(touched))

            upserts = net.filter(F.col("op") != "delete").select(
                *[
                    F.col(f"after_{n}").cast(d).alias(n)
                    if n not in keys
                    else F.col(n).cast(d).alias(n)
                    for n, d, _ in spec.columns
                ]
            )
            survivors = state.join(net.select(*keys), on=keys, how="left_anti")
            merged = survivors.unionByName(upserts, allowMissingColumns=False)
            return self._commit_buckets(merged, touched, current_version)
        finally:
            net.unpersist()

    def merge_partial(
        self, spark: SparkSession, net: DataFrame, current_version: int
    ) -> int:
        """Per-column carried-mask apply (MINIMAL row image), bucket-pruned:
        the full-outer join runs only over the touched buckets' state."""
        self._adopt_layout(current_version)
        spec = self.spec
        keys = list(spec.primary_key)
        net = net.persist()  # same double-consumption as merge()
        try:
            return self._merge_partial_cached(spark, net, current_version)
        finally:
            net.unpersist()

    def _merge_partial_cached(
        self, spark: SparkSession, net: DataFrame, current_version: int
    ) -> int:
        spec = self.spec
        keys = list(spec.primary_key)
        touched = self._touched_buckets(net)
        state = self.read(spark, current_version, bucket_ids=set(touched))

        n = net.select(
            *[F.col(k).cast(d).alias(k) for k, d, _ in spec.columns if k in keys],
            F.col("op").alias("_op"),
            F.col("carried_mask").alias("_cm"),
            *[
                F.col(f"after_{c}").cast(d).alias(f"_s_{c}")
                for c, d, _ in spec.columns
                if c not in keys
            ],
        )
        joined = state.join(n, on=keys, how="full_outer")
        survives = F.col("_op").isNull() | (F.col("_op") != "delete")
        out_cols = [F.col(k) for k in keys]
        for ci, (c, _d, _k) in enumerate(spec.columns):
            if c in keys:
                continue
            bit = F.shiftright(F.col("_cm"), ci).bitwiseAND(F.lit(1)) == 1
            out_cols.append(
                F.when(F.col("_op").isNotNull() & bit, F.col(f"_s_{c}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        merged = joined.filter(survives).select(*out_cols).select(
            *[n_ for n_, _, _ in spec.columns]
        )
        return self._commit_buckets(merged, touched, current_version)

    def lookup(
        self, spark: SparkSession, version: int, key_values: list[dict]
    ) -> DataFrame:
        """Point-lookup read path: each requested key hashes to exactly one
        bucket, so the scan touches only those buckets' files — at 10^10
        rows / 2^12 buckets a single-key lookup reads ~0.02% of the table
        (and the parquet row-group filter prunes within the bucket).
        ``key_values``: one dict per requested key, covering
        ``bucket_cols`` (full-PK dicts narrow further via the post-filter).
        """
        import pandas as pd

        self._adopt_layout(version)
        if not key_values:
            return empty_state_df(spark, self.spec)
        ddl = {n: d for n, d, _ in self.spec.columns}
        probe = spark.createDataFrame(pd.DataFrame(key_values))
        probe = probe.select(
            *[F.col(c).cast(ddl[c]).alias(c) for c in probe.columns]
        )
        buckets = {
            r["_b"]
            for r in probe.select(self._bucket_expr().alias("_b")).collect()
        }
        state = self.read(spark, version, bucket_ids=buckets)
        return state.join(F.broadcast(probe), on=list(probe.columns), how="left_semi")

    def read_changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int,
        images: str = "applied",
    ) -> DataFrame:
        """Manifest-pruned change feed: a bucket whose manifest entry is
        identical at both versions points at the *same* data files, so it
        cannot contain a changed row — only buckets whose entry was added,
        removed, or repointed are scanned and row-diffed. A batch that
        touched 1% of buckets diffs ~1% of the table, not all of it (the
        same metadata-pruning Iceberg's incremental read does with data-
        file diffs)."""
        m_old = self._load_manifest(from_version)
        m_new = self._load_manifest(to_version)
        changed = {
            b
            for b in set(m_old) | set(m_new)
            if m_old.get(b) != m_new.get(b)
        }
        return snapshot_diff(
            self.read(spark, from_version, bucket_ids=changed),
            self.read(spark, to_version, bucket_ids=changed),
            self.spec,
            images=images,
        )

    def rebucket(
        self,
        spark: SparkSession,
        new_buckets: int,
        current_version: int,
        bucket_cols: tuple | None = None,
    ) -> int:
        """Online bucket re-scaling — the maintenance op a growing table
        needs: bucket count is fixed at table creation, so a table that
        grows 100× ends up with 100×-sized buckets and every merge pays
        100× the touched-bucket IO it should. ``rebucket`` rewrites the
        state once under a new layout (count and/or hash columns) and
        commits it as a normal snapshot version: one full-table shuffle
        (repartition on the new hash — the same cost class as one
        whole-table batch, amortized over every merge after it), no
        downtime, time travel intact (older versions keep their own
        layout metadata and stay readable), and subsequent merges adopt
        the new layout automatically via the per-snapshot ``bucketing
        .json``. The Iceberg analog is evolving the partition spec to
        ``bucket(new_N, key)`` + ``rewrite_data_files``. Crash-safe like
        any merge: data + layout land before the manifest, the manifest
        before the caller's ledger append, so a torn rebucket is an
        invisible orphan the next commit overwrites."""
        self._adopt_layout(current_version)
        state = self._read_full(spark, current_version)
        old = (self.buckets, self.bucket_cols)
        self.buckets = int(new_buckets)
        if self.buckets < 1:
            raise ValueError("new_buckets must be >= 1")
        if bucket_cols:
            unknown = set(bucket_cols) - set(self.spec.primary_key)
            if unknown:
                raise ValueError(
                    f"bucket_cols must be primary-key columns: {unknown}"
                )
            self.bucket_cols = tuple(bucket_cols)
        try:
            return self._commit_buckets(
                state, list(range(self.buckets)), current_version,
                carry_over=False,
            )
        except BaseException:
            self.buckets, self.bucket_cols = old
            raise

    def _manifest_refs(self, version: int) -> set:
        """Store-relative bucket-dir paths the manifest at ``version``
        references (subclasses with richer entries override)."""
        return set(self._load_manifest(version).values())

    def gc(self, keep_latest: int) -> None:
        """Retain the newest ``keep_latest`` versions fully readable and
        physically remove everything else — at BUCKET-DIR granularity, not
        just whole snapshot dirs (Iceberg's expire-snapshots +
        remove-orphan-files in one pass): a snapshot dir that a kept
        manifest still points into survives, but the *unreferenced* bucket
        dirs inside it (superseded copies of since-rewritten buckets) are
        deleted. This is what makes ``Replayer.purge_keys``'s erasure
        guarantee hold — without the inner prune, a carried-over old
        snapshot dir would keep the purged keys' pre-delete bucket files."""
        if not keep_latest:
            return
        root = os.path.join(self.store_dir, "snapshots")
        snaps = sorted(os.listdir(root))
        keep = set(snaps[-keep_latest:])
        live = set()
        for name in keep:
            if os.path.exists(os.path.join(root, name, "manifest.json")):
                live |= {
                    os.path.normpath(r)
                    for r in self._manifest_refs(int(name.lstrip("v")))
                }
        live_snap_names = {
            p.split(os.sep)[1]
            for p in live
            if p.split(os.sep)[0] == "snapshots" and len(p.split(os.sep)) > 1
        }
        for name in snaps:
            snap = os.path.join(root, name)
            if name not in keep and name not in live_snap_names:
                shutil.rmtree(snap)
                continue
            for sub in ("data", "delta"):
                d = os.path.join(snap, sub)
                if not os.path.isdir(d):
                    continue
                for bd in os.listdir(d):
                    p = os.path.join(d, bd)
                    if not (os.path.isdir(p) and bd.startswith("_bucket=")):
                        continue  # committer markers (_SUCCESS etc.)
                    rel = os.path.normpath(os.path.relpath(p, self.store_dir))
                    if rel not in live:
                        shutil.rmtree(p)
                if not any(e.startswith("_bucket=") for e in os.listdir(d)):
                    shutil.rmtree(d)


class OrderedParquetMergeTarget(ParquetMergeTarget):
    """Order-aware MERGE: snapshots persist each key's winning order tuple
    (``_ord_<col>`` columns) and an incoming row only replaces the stored
    row when its order tuple outranks it.

    This is the cross-trigger guard the streaming apply tier needs: Spark's
    file-stream source does not promise changelog files arrive in commit
    order across triggers, and an at-least-once redelivery of an old decode
    output must not regress state to older images. Ties (exact redelivery)
    prefer the incoming row — idempotent, since equal rank implies the
    identical event. Deletes persist as **tombstones** (``_deleted`` flag):
    without them, a delete applied before its out-of-order insert arrives
    would leave nothing to outrank the insert and the row would resurrect.
    (At deploy scale, age tombstones out once older than the maximum
    reordering window.) Plan shape: one union + one ``max_by`` aggregate
    per merge — same shuffle class as the plain anti-join MERGE."""

    FAMILY = "ordered_cow"

    def __init__(
        self,
        store_dir: str,
        spec: TableSpec = TRANSCRIPTS,
        buckets: int = 32,
        order_cols: tuple[str, ...] = ("gtid_seq", "pos", "row_in_event"),
    ):
        super().__init__(store_dir, spec, buckets)
        self.order_cols = list(order_cols)

    def _ord_names(self) -> list[str]:
        return [f"_ord_{c}" for c in self.order_cols]

    def read_with_order(self, spark: SparkSession, version: int) -> DataFrame:
        """Full stored form: spec columns + order tuple + tombstone flag."""
        if version <= 0:
            df = empty_state_df(spark, self.spec)
            for o in self._ord_names():
                df = df.withColumn(o, F.lit(None).cast("long"))
            return df.withColumn("_deleted", F.lit(False))
        df = spark.read.parquet(self.snapshot_path(version))
        for name, ddl, _ in self.spec.columns:
            if name not in df.columns:
                df = df.withColumn(name, F.lit(None).cast(ddl))
        for o in self._ord_names():
            if o not in df.columns:
                df = df.withColumn(o, F.lit(None).cast("long"))
        if "_deleted" not in df.columns:
            df = df.withColumn("_deleted", F.lit(False))
        return df.select(
            *[n for n, _, _ in self.spec.columns], *self._ord_names(), "_deleted"
        )

    def read(self, spark: SparkSession, version: int) -> DataFrame:
        return (
            self.read_with_order(spark, version)
            .filter(~F.col("_deleted"))
            .select(*[n for n, _, _ in self.spec.columns])
        )

    def merge(self, spark: SparkSession, net: DataFrame, current_version: int) -> int:
        """``net`` must carry key cols + ``op`` + ``after_<col>`` + the
        order columns. Winner per key = max over (order tuple, incoming
        priority); a winning delete removes the key."""
        self._record_family()
        spec = self.spec
        keys = list(spec.primary_key)
        value_cols = [n for n, _, _ in spec.columns if n not in keys]
        ords = self._ord_names()

        incoming = net.select(
            *[F.col(k).cast(d).alias(k) for k, d, _ in spec.columns if k in keys],
            *[F.col(f"after_{n}").cast(d).alias(n) for n, d, _ in spec.columns if n not in keys],
            F.col("op"),
            *[F.col(c).cast("long").alias(o) for c, o in zip(self.order_cols, ords)],
            F.lit(1).alias("_prio"),
        )
        stored = self.read_with_order(spark, current_version).select(
            *keys, *value_cols,
            F.when(F.col("_deleted"), F.lit("delete")).otherwise(F.lit("keep")).alias("op"),
            *ords,
            F.lit(0).alias("_prio"),
        )

        rank = F.struct(*[F.col(o) for o in ords], F.col("_prio"))
        payload = F.struct(F.col("op"), *[F.col(c) for c in value_cols], *[F.col(c) for c in ords])
        winners = (
            stored.unionByName(incoming)
            .groupBy(*keys)
            .agg(F.max_by(payload, rank).alias("_win"))
            .select(
                *keys,
                *[F.col(f"_win.{c}").alias(c) for c in value_cols],
                *[F.col(f"_win.{o}").alias(o) for o in ords],
                (F.col("_win.op") == "delete").alias("_deleted"),
            )
        )

        new_version = current_version + 1
        out_path = self.snapshot_path(new_version)
        if os.path.exists(out_path):
            shutil.rmtree(out_path)
        (
            winners.repartition(self.buckets, *[F.col(k) for k in keys])
            .write.mode("overwrite")
            .parquet(out_path)
        )
        return new_version

    def prune_tombstones(
        self, spark: SparkSession, current_version: int, min_live_order: int
    ) -> int:
        """GC: drop tombstones whose leading order value (gtid_seq) is
        below ``min_live_order`` — the caller's low-watermark of possible
        redelivery (e.g. the decode tier's checkpointed GTID floor: no
        event ordered below it can ever arrive again, so its tombstone
        can never be outranked into relevance). Writes a new snapshot and
        returns its version.

        Tombstones with a NULL leading order value (gtid-less streams)
        carry no watermark to compare against, so they are always kept —
        dropping them would let a redelivered old insert resurrect the
        row. GC for such streams needs an order column that is never
        NULL (e.g. pos)."""
        keys = list(self.spec.primary_key)
        df = self.read_with_order(spark, current_version)
        lead = self._ord_names()[0]
        kept = df.filter(
            (~F.col("_deleted"))
            | F.col(lead).isNull()
            | (F.col(lead) >= F.lit(min_live_order))
        )
        new_version = current_version + 1
        out_path = self.snapshot_path(new_version)
        if os.path.exists(out_path):
            shutil.rmtree(out_path)
        (
            kept.repartition(self.buckets, *[F.col(k) for k in keys])
            .write.mode("overwrite")
            .parquet(out_path)
        )
        return new_version


class OrderedBucketedMergeTarget(BucketedParquetMergeTarget):
    """Order-aware MERGE on the bucket-pruned copy-on-write layout — the
    streaming apply tier's scale path.

    ``OrderedParquetMergeTarget`` gives the cross-trigger guarantees the
    file-stream source needs (outrank guard over persisted order tuples,
    delete tombstones against out-of-order resurrection) but rewrites the
    WHOLE snapshot per trigger — O(table) per micro-batch is the same
    scale killer the bucketed CoW target fixed for the batch path. This
    class combines both: every stored row carries its winning order tuple
    (``_ord_<col>``) and tombstone flag, buckets splice through manifests,
    and a trigger's merge unions ONLY the touched buckets' stored rows
    with the incoming net change — per-trigger IO is O(touched-bucket
    data). Plan shape per merge: one union + one ``max_by`` aggregate
    over touched buckets. Same layout persistence / ``rebucket`` /
    ``gc`` / change-feed machinery as the parent (a rebucket carries
    order tuples and tombstones forward verbatim via ``_read_full``)."""

    FAMILY = "ordered_bucketed_cow"

    def __init__(
        self,
        store_dir: str,
        spec: TableSpec = TRANSCRIPTS,
        buckets: int = 64,
        bucket_cols: tuple | None = None,
        order_cols: tuple[str, ...] = ("gtid_seq", "pos", "row_in_event"),
    ):
        super().__init__(store_dir, spec, buckets, bucket_cols)
        self.order_cols = list(order_cols)

    def _ord_names(self) -> list[str]:
        return [f"_ord_{c}" for c in self.order_cols]

    def read_with_order(
        self, spark: SparkSession, version: int, bucket_ids=None
    ) -> DataFrame:
        """Full stored form (spec columns + order tuple + tombstone flag),
        manifest-pruned to ``bucket_ids`` like the parent's ``read``."""
        manifest = self._load_manifest(version)
        if bucket_ids is not None:
            manifest = {b: p for b, p in manifest.items() if b in bucket_ids}
        if not manifest:
            df = empty_state_df(spark, self.spec)
            for o in self._ord_names():
                df = df.withColumn(o, F.lit(None).cast("long"))
            return df.withColumn("_deleted", F.lit(False))
        paths = sorted({os.path.join(self.store_dir, p) for p in manifest.values()})
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        for name, ddl, _ in self.spec.columns:
            if name not in df.columns:
                df = df.withColumn(name, F.lit(None).cast(ddl))
        for o in self._ord_names():
            if o not in df.columns:
                df = df.withColumn(o, F.lit(None).cast("long"))
        if "_deleted" not in df.columns:
            df = df.withColumn("_deleted", F.lit(False))
        return df.select(
            *[n for n, _, _ in self.spec.columns], *self._ord_names(), "_deleted"
        )

    def read(self, spark: SparkSession, version: int, bucket_ids=None) -> DataFrame:
        return (
            self.read_with_order(spark, version, bucket_ids)
            .filter(~F.col("_deleted"))
            .select(*[n for n, _, _ in self.spec.columns])
        )

    def _read_full(self, spark: SparkSession, version: int) -> DataFrame:
        return self.read_with_order(spark, version)

    def merge(self, spark: SparkSession, net: DataFrame, current_version: int) -> int:
        """Same contract as ``OrderedParquetMergeTarget.merge`` (net rows
        carry key cols + ``op`` + ``after_<col>`` + order columns), but
        stored rows are read from the touched buckets only."""
        self._adopt_layout(current_version)
        spec = self.spec
        keys = list(spec.primary_key)
        value_cols = [n for n, _, _ in spec.columns if n not in keys]
        ords = self._ord_names()

        net = net.persist()  # touched-bucket pre-pass + merge both consume it
        try:
            touched = self._touched_buckets(net)
            incoming = net.select(
                *[F.col(k).cast(d).alias(k) for k, d, _ in spec.columns if k in keys],
                *[
                    F.col(f"after_{n}").cast(d).alias(n)
                    for n, d, _ in spec.columns
                    if n not in keys
                ],
                F.col("op"),
                *[
                    F.col(c).cast("long").alias(o)
                    for c, o in zip(self.order_cols, ords)
                ],
                F.lit(1).alias("_prio"),
            )
            stored = self.read_with_order(
                spark, current_version, set(touched)
            ).select(
                *keys, *value_cols,
                F.when(F.col("_deleted"), F.lit("delete"))
                .otherwise(F.lit("keep"))
                .alias("op"),
                *ords,
                F.lit(0).alias("_prio"),
            )
            rank = F.struct(*[F.col(o) for o in ords], F.col("_prio"))
            payload = F.struct(
                F.col("op"),
                *[F.col(c) for c in value_cols],
                *[F.col(o) for o in ords],
            )
            winners = (
                stored.unionByName(incoming)
                .groupBy(*keys)
                .agg(F.max_by(payload, rank).alias("_win"))
                .select(
                    *keys,
                    *[F.col(f"_win.{c}").alias(c) for c in value_cols],
                    *[F.col(f"_win.{o}").alias(o) for o in ords],
                    (F.col("_win.op") == "delete").alias("_deleted"),
                )
            )
            return self._commit_buckets(winners, touched, current_version)
        finally:
            net.unpersist()

    def merge_partial(self, spark, net, current_version):
        raise ValueError(
            "MINIMAL row images need whole-row state the outrank guard "
            "cannot reconstruct per column; use the batch path "
            "(Replayer(row_image='minimal')) for MINIMAL streams"
        )

    def prune_tombstones(
        self, spark: SparkSession, current_version: int, min_live_order: int
    ) -> int:
        """Tombstone GC (see ``OrderedParquetMergeTarget``): keep live
        rows, NULL-ordered tombstones, and tombstones at or above the
        redelivery low-watermark; commits as a full rewrite (every bucket
        fresh, old entries dropped) — a maintenance op, amortized like
        ``rebucket``."""
        self._adopt_layout(current_version)
        df = self.read_with_order(spark, current_version)
        lead = self._ord_names()[0]
        kept = df.filter(
            (~F.col("_deleted"))
            | F.col(lead).isNull()
            | (F.col(lead) >= F.lit(min_live_order))
        )
        return self._commit_buckets(
            kept, list(range(self.buckets)), current_version, carry_over=False
        )


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is usable on this session."""
    try:
        jvm_check = spark.conf.get("spark.sql.catalog.cdc", None)
        if jvm_check is None:
            return False
        spark.sql("SELECT 1").collect()
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class IcebergMergeTarget:
    """Real Iceberg ``MERGE INTO`` sink (used when a catalog is configured).

    Table is identified by ``<catalog>.<db>.<table>``; schema evolution is
    ``ALTER TABLE ... ADD COLUMN`` driven by TABLE_MAP column_names
    (SURVEY.md §4 item 3). Version numbers map to Iceberg snapshot ids.
    """

    def __init__(self, identifier: str, spec: TableSpec = TRANSCRIPTS):
        self.identifier = identifier
        self.spec = spec

    def ensure_table(self, spark: SparkSession) -> None:
        cols = ", ".join(f"{n} {d}" for n, d, _ in self.spec.columns)
        keys = ", ".join(self.spec.primary_key)
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.identifier} ({cols}) "
            f"USING iceberg PARTITIONED BY (bucket(64, {self.spec.primary_key[0]}))"
        )
        _ = keys

    def ensure_columns(self, spark: SparkSession, column_names: list[str]) -> None:
        existing = {f.name for f in spark.table(self.identifier).schema.fields}
        for name, ddl, _ in self.spec.columns:
            if name in column_names and name not in existing:
                spark.sql(f"ALTER TABLE {self.identifier} ADD COLUMN {name} {ddl}")

    def read(self, spark: SparkSession, version: int = -1) -> DataFrame:
        return spark.table(self.identifier)

    def merge(self, spark: SparkSession, net: DataFrame, current_version: int = -1) -> int:
        spec = self.spec
        keys = list(spec.primary_key)
        net.createOrReplaceTempView("_cdc_net")
        on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        set_cols = ", ".join(f"t.{n} = s.after_{n}" for n, _, _ in spec.columns if n not in keys)
        ins_cols = ", ".join(n for n, _, _ in spec.columns)
        ins_vals = ", ".join(
            (n if n in keys else f"after_{n}") for n, _, _ in spec.columns
        )
        spark.sql(
            f"""
            MERGE INTO {self.identifier} t
            USING _cdc_net s
            ON {on}
            WHEN MATCHED AND s.op = 'delete' THEN DELETE
            WHEN MATCHED THEN UPDATE SET {set_cols}
            WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT ({ins_cols}) VALUES ({ins_vals})
            """
        )
        return current_version + 1

    def truncate(self, spark: SparkSession, current_version: int = -1) -> int:
        """TRUNCATE TABLE fence: Iceberg's row-level DELETE compiles to a
        metadata delete when it covers every file (no rewrite), matching
        the bucketed target's empty-manifest commit."""
        spark.sql(f"DELETE FROM {self.identifier}")
        return current_version + 1

    def merge_partial(self, spark: SparkSession, net: DataFrame, current_version: int = -1) -> int:
        """MERGE for partial-image (MINIMAL) net changes: each UPDATE SET
        clause takes ``s.after_<c>`` only when the column's
        ``carried_mask`` bit is set, keeping ``t.<c>`` otherwise — the SQL
        form of ``ParquetMergeTarget.merge_partial``'s per-column apply.
        ``net`` comes from ``order.last_writer_wins_partial``."""
        spec = self.spec
        keys = list(spec.primary_key)
        net.createOrReplaceTempView("_cdc_net")
        on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        set_cols = ", ".join(
            f"t.{n} = CASE WHEN (s.carried_mask >> {ci}) & 1 = 1 "
            f"THEN s.after_{n} ELSE t.{n} END"
            for ci, (n, _, _) in enumerate(spec.columns)
            if n not in keys
        )
        ins_cols = ", ".join(n for n, _, _ in spec.columns)
        ins_vals = ", ".join(
            (n if n in keys else f"after_{n}") for n, _, _ in spec.columns
        )
        spark.sql(
            f"""
            MERGE INTO {self.identifier} t
            USING _cdc_net s
            ON {on}
            WHEN MATCHED AND s.op = 'delete' THEN DELETE
            WHEN MATCHED THEN UPDATE SET {set_cols}
            WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT ({ins_cols}) VALUES ({ins_vals})
            """
        )
        return current_version + 1


def load_target_family(store_dir: str) -> str | None:
    """The target family stamped at the store's first commit
    (``target_family.json``), or None for stores written before family
    stamping existed (callers fall back to layout sniffing for those)."""
    import json

    p = os.path.join(store_dir, "target_family.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f).get("family")


def target_class_for_family(family: str):
    """Dispatch a stamped family back to its target class. Raises
    KeyError for an unknown stamp — opening a store through a guessed
    loader is exactly the failure the stamp exists to prevent."""
    from . import mor  # lazy: mor imports this module

    return {
        "cow": ParquetMergeTarget,
        "bucketed_cow": BucketedParquetMergeTarget,
        "ordered_cow": OrderedParquetMergeTarget,
        "ordered_bucketed_cow": OrderedBucketedMergeTarget,
        "mor": mor.MergeOnReadBucketedTarget,
        "ordered_mor": mor.OrderedMergeOnReadTarget,
    }[family]
