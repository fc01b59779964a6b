"""O-26/O-27: exactly-once sink + per-partition lineage.

``north_star``: "committed exactly-once through idempotent foreachBatch
MERGE into an Iceberg sink keyed by (batch_id, partition), resumable
from checkpoint with per-partition lineage and row-count metrics."

No Iceberg jar is installable in this offline sandbox (SURVEY header),
so the contract is implemented behind a seam:

- ``ParquetLedgerSink`` (tested here): per-batch directory written to a
  temp path then atomically renamed to ``data/batch_id=N/``, with a
  commit LEDGER line written only after the rename.  Readers consider
  exactly the ledgered batches.  A replayed batch (same batch_id after
  checkpoint recovery) sees its ledger entry and no-ops — the same
  idempotence MERGE-on-(batch_id, url, warc_ts) gives on Iceberg.
- ``IcebergMergeSink`` (config-switchable): emits the real
  ``MERGE INTO`` on runtimes with the Iceberg catalog jar present.

Lineage (O-27): each commit also writes ``_lineage/batch_id=N`` rows
(batch_id, spark_partition_id, n_rows) inside the same commit protocol
— visible iff the data batch is visible.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, functions as F


class ParquetLedgerSink:
    """Filesystem sink with an Iceberg-MERGE-equivalent idempotence
    contract (atomic rename + commit ledger)."""

    def __init__(self, out_dir: str, quarantine_col: str | None = None):
        """``quarantine_col``: when set and present in the batch, rows
        with a non-null value in that column are committed to
        ``quarantine/batch_id=N`` instead of ``data/`` — under the SAME
        ledger line, so the good/bad split is atomic and replay-safe
        (SURVEY §2.8: a poison page must not kill the stream, and its
        quarantine record must be exactly-once like everything else)."""
        self.out_dir = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.compacted_dir = os.path.join(out_dir, "compacted")
        self.quarantine_dir = os.path.join(out_dir, "quarantine")
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        self.tmp_dir = os.path.join(out_dir, "_tmp")
        self.ledger_path = os.path.join(out_dir, "_ledger.jsonl")
        self.quarantine_col = quarantine_col
        for d in (self.data_dir, self.lineage_dir, self.tmp_dir):
            os.makedirs(d, exist_ok=True)

    # -- ledger ------------------------------------------------------------
    def _ledger_records(self) -> list[dict]:
        if not os.path.exists(self.ledger_path):
            return []
        out = []
        with open(self.ledger_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    def committed_batches(self) -> set[int]:
        return {
            r["batch_id"] for r in self._ledger_records() if "batch_id" in r
        }

    def compactions(self) -> list[dict]:
        """Committed compaction generations, in commit order."""
        return [r for r in self._ledger_records() if "compaction" in r]

    def committed_rows(self) -> int:
        """Total data rows across ledgered BATCH commits — the public
        progress probe for drain loops (q42/CLI --stop-after-rows).
        Compaction records re-describe already-counted rows and are
        excluded here, inside the one module that owns the ledger
        schema — callers must not reimplement record classification
        from raw ledger lines (round-3 advice: a schema change would
        silently double-count in every copy of the heuristic)."""
        return sum(
            r["n_rows"] for r in self._ledger_records() if "batch_id" in r
        )

    def _compacted_away(self) -> set[int]:
        return {b for r in self.compactions() for b in r["batches"]}

    def _commit(
        self,
        batch_id: int,
        n_rows: int,
        partitions: list[dict],
        n_quarantined: int = 0,
    ) -> None:
        # one atomic append; the ledger line is the commit point
        rec = json.dumps(
            {
                "batch_id": batch_id,
                "n_rows": n_rows,
                "partitions": partitions,
                "n_quarantined": n_quarantined,
            }
        )
        with open(self.ledger_path, "a") as f:
            f.write(rec + "\n")
            f.flush()
            os.fsync(f.fileno())
        if hasattr(self, "_committed_set"):
            self._committed_set.add(batch_id)

    # -- the foreachBatch body --------------------------------------------
    def _committed_cached(self) -> set[int]:
        """Writer-side committed set: the ledger is read ONCE, then
        kept in memory and appended to at commit time — without this a
        long-running stream re-parses an ever-growing JSONL file on
        every micro-batch (O(n²) over the stream's lifetime).  This
        sink instance is the only writer (foreachBatch is serialized),
        so the cache cannot go stale; readers keep using the file."""
        if not hasattr(self, "_committed_set"):
            self._committed_set = self.committed_batches()
        return self._committed_set

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """Idempotent micro-batch commit.  Replay of an already
        committed batch_id writes nothing (exactly-once downstream)."""
        if batch_id in self._committed_cached():
            # Do NOT simply return: Spark 4.x validates that every
            # partition of a stateful query committed its state store
            # each batch (STATE_STORE_COMMIT_VALIDATION_FAILED when a
            # foreachBatch skips the action on replay).  Consume the
            # batch through the built-in `noop` source — all
            # partitions run, state commits, nothing is written.
            df.write.format("noop").mode("overwrite").save()
            return

        final = os.path.join(self.data_dir, f"batch_id={batch_id}")
        final_quar = os.path.join(self.quarantine_dir, f"batch_id={batch_id}")
        final_lineage = os.path.join(self.lineage_dir, f"batch_id={batch_id}")
        # stale partial dir from a crash before ledger commit: discard
        for p in (final, final_quar, final_lineage):
            if os.path.exists(p):
                shutil.rmtree(p)

        tmp = os.path.join(self.tmp_dir, f"b{batch_id}-{uuid.uuid4().hex}")
        tmp_quar = tmp + "-quar"
        tmp_lineage = tmp + "-lineage"

        split = self.quarantine_col is not None and self.quarantine_col in df.columns
        if split:
            # pin the micro-batch so the two filtered writes don't
            # recompute the upstream plan twice
            df = df.persist()

        # ONE Spark job per output: write the batch.  Lineage (O-27
        # per-partition row counts) comes from the written parquet
        # footers — part-file i IS partition i — so no
        # persist/collect/extra aggregation jobs sit on the
        # micro-batch critical path.
        n_quarantined = 0
        try:
            good = df.where(F.col(self.quarantine_col).isNull()) if split else df
            good.write.mode("overwrite").parquet(tmp)
            if split:
                bad = df.where(F.col(self.quarantine_col).isNotNull())
                bad.write.mode("overwrite").parquet(tmp_quar)
                n_quarantined = sum(
                    r["n_rows"] for r in self._lineage_from_files(tmp_quar, batch_id)
                )
        finally:
            if split:
                df.unpersist()
        lineage_rows = self._lineage_from_files(tmp, batch_id)
        self._write_lineage_parquet(tmp_lineage, lineage_rows)
        n_rows = sum(r["n_rows"] for r in lineage_rows)

        os.rename(tmp, final)
        if split and n_quarantined > 0:
            os.makedirs(self.quarantine_dir, exist_ok=True)
            os.rename(tmp_quar, final_quar)
        elif split:
            shutil.rmtree(tmp_quar, ignore_errors=True)  # empty: no dir
        os.rename(tmp_lineage, final_lineage)
        self._commit(batch_id, n_rows, lineage_rows, n_quarantined)

    @staticmethod
    def _lineage_from_files(data_dir: str, batch_id: int) -> list[dict]:
        import re

        import pyarrow.parquet as pq

        rows = []
        for name in sorted(os.listdir(data_dir)):
            m = re.match(r"part-(\d+)", name)
            if not m:
                continue
            md = pq.read_metadata(os.path.join(data_dir, name))
            rows.append(
                {
                    "partition_id": int(m.group(1)),
                    "n_rows": md.num_rows,
                    "batch_id": batch_id,
                }
            )
        return rows

    @staticmethod
    def _write_lineage_parquet(path: str, rows: list[dict]) -> None:
        import pandas as pd_

        os.makedirs(path, exist_ok=True)
        frame = pd_.DataFrame(
            rows, columns=["partition_id", "n_rows", "batch_id"]
        ).astype({"partition_id": "int32", "n_rows": "int64", "batch_id": "int64"})
        frame.to_parquet(os.path.join(path, "lineage.parquet"), index=False)

    def foreach_batch(self):
        return lambda df, bid: self.write_batch(df, bid)

    # -- reader side -------------------------------------------------------
    def read_committed(self, spark, as_of_batch: int | None = None) -> DataFrame:
        """All rows of ledgered batches (exactly-once view): committed
        compaction generations plus batches not yet compacted.

        ``as_of_batch``: TIME-TRAVEL read — exactly the rows that were
        committed as of that batch id (inclusive), the Iceberg
        snapshot-read analog over the ledger.  Served from the original
        per-batch dirs; like an expired Iceberg snapshot, history that
        ``vacuum()`` has pruned (batch dir superseded by a compaction
        and deleted) raises loudly instead of returning a silently
        incomplete view."""
        if as_of_batch is not None:
            want = sorted(
                b for b in self.committed_batches() if b <= as_of_batch
            )
            return self._read_batch_dirs(
                spark,
                want,
                f"as-of read at batch {as_of_batch}",
                "time travel to this point is no longer available",
            )
        covered = self._compacted_away()
        paths = [
            os.path.join(self.compacted_dir, f"gen={r['compaction']}")
            for r in self.compactions()
        ]
        paths += [
            os.path.join(self.data_dir, f"batch_id={b}")
            for b in sorted(self.committed_batches() - covered)
        ]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], StructType([]))
        return spark.read.parquet(*paths)

    def read_incremental(
        self, spark, from_batch: int, to_batch: int | None = None
    ) -> DataFrame:
        """CDC / incremental-consumption read: exactly the rows
        committed by batches in ``(from_batch, to_batch]`` (to_batch
        defaults to the latest commit) — the Iceberg incremental
        snapshot-diff analog.  A downstream consumer checkpoints the
        last batch id it saw and tails the table with this instead of
        re-reading 100 TB per refresh; by construction
        ``read_committed(as_of=k)`` + ``read_incremental(from=k)``
        partition the exactly-once view (pytest-asserted).

        Served from the original per-batch dirs; like
        ``read_committed(as_of_batch=...)``, history pruned by
        ``vacuum()`` raises loudly rather than returning a silently
        incomplete diff — and a caller-supplied ``to_batch`` beyond the
        committed head ALSO raises: silently truncating it would let a
        consumer checkpoint a batch id it never consumed and skip the
        gap forever."""
        have = self.committed_batches()
        head = max(have, default=from_batch)
        if to_batch is None:
            hi = head
        elif to_batch > head:
            raise RuntimeError(
                f"incremental read ({from_batch}, {to_batch}]: to_batch "
                f"is beyond the committed head {head}; refusing to "
                "truncate silently (checkpoint the returned range, "
                "not the requested one)"
            )
        else:
            hi = to_batch
        want = sorted(b for b in have if from_batch < b <= hi)
        return self._read_batch_dirs(
            spark,
            want,
            f"incremental read ({from_batch}, {hi}]",
            "the diff is no longer reconstructable",
        )

    def _read_batch_dirs(
        self, spark, want: list[int], ctx: str, consequence: str
    ) -> DataFrame:
        """Shared ledger-pinned per-batch-dir reader for the as-of and
        incremental views: vacuum-pruned history raises loudly."""
        paths = []
        for b in want:
            p = os.path.join(self.data_dir, f"batch_id={b}")
            if not os.path.exists(p):
                raise RuntimeError(
                    f"{ctx}: batch {b}'s dir was pruned by vacuum "
                    f"(compacted history); {consequence}"
                )
            paths.append(p)
        if not paths:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], StructType([]))
        return spark.read.parquet(*paths)

    # -- maintenance: small-file compaction --------------------------------
    def compact(self, spark, target_bytes_per_file: int = 256 * 1024 * 1024):
        """Rewrite all committed-but-uncompacted micro-batch dirs into
        one consolidated generation (``compacted/gen=<id>``).

        At 10^12-doc scale a long-running stream accumulates thousands
        of per-batch directories — a metadata and open-file problem for
        every downstream scan.  Same commit protocol as write_batch:
        write to _tmp, atomic rename, ONE ledger line
        (``{"compaction": gen, "batches": [...], "n_rows": n}``) as the
        commit point.  Readers switch to the generation atomically;
        superseded batch dirs stay on disk (exactly-once history)
        until ``vacuum()``.  Crash before the ledger line leaves an
        orphan gen dir that vacuum removes.  Returns the ledger record
        or None if there was nothing to compact."""
        todo = sorted(self.committed_batches() - self._compacted_away())
        # A committed batch with a missing data dir must never be
        # marked compacted-away (read_committed would silently lose its
        # rows while the ledger claimed coverage).  A missing dir means
        # external tampering — fail loudly, so the ledger record below
        # provably covers exactly the dirs that were read.
        paths = []
        for b in todo:
            p = os.path.join(self.data_dir, f"batch_id={b}")
            if not os.path.exists(p):
                raise RuntimeError(
                    f"committed batch {b} has no data dir {p}; refusing to "
                    "compact past it (ledger/data divergence)"
                )
            paths.append(p)
        if not paths:
            return None
        total_bytes = sum(
            os.path.getsize(os.path.join(d, f))
            for d in paths
            for f in os.listdir(d)
            if f.startswith("part-")
        )
        n_files = max(1, -(-total_bytes // target_bytes_per_file))

        gen = uuid.uuid4().hex
        tmp = os.path.join(self.tmp_dir, f"gen-{gen}")
        spark.read.parquet(*paths).coalesce(n_files).write.mode(
            "overwrite"
        ).parquet(tmp)
        n_rows = sum(r["n_rows"] for r in self._lineage_from_files(tmp, -1))
        os.makedirs(self.compacted_dir, exist_ok=True)
        final = os.path.join(self.compacted_dir, f"gen={gen}")
        os.rename(tmp, final)
        rec = {"compaction": gen, "batches": todo, "n_rows": n_rows}
        with open(self.ledger_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
        return rec

    def vacuum(self, tmp_min_age_sec: float = 3600.0) -> list[str]:
        """Delete batch dirs superseded by a committed compaction, any
        orphan (uncommitted) generation dirs, and _tmp staging dirs
        older than ``tmp_min_age_sec``.

        Removing SUPERSEDED batch dirs is safe while a stream runs
        (visibility is ledger-defined).  Anything that might be
        mid-commit is age-guarded by ``tmp_min_age_sec``: _tmp holds
        the LIVE staging dirs of in-flight ``write_batch``/``compact``
        calls, and an unledgered ``compacted/gen=`` dir may be a
        compact() between its rename and its ledger append rather than
        a crash orphan.  Pass ``tmp_min_age_sec=0`` only when no
        writer can be active."""
        removed = []
        for b in self._compacted_away():
            p = os.path.join(self.data_dir, f"batch_id={b}")
            if os.path.exists(p):
                shutil.rmtree(p)
                removed.append(p)
        import time as _time

        now = _time.time()
        live_gens = {r["compaction"] for r in self.compactions()}
        if os.path.isdir(self.compacted_dir):
            for name in os.listdir(self.compacted_dir):
                if name.startswith("gen=") and name[4:] not in live_gens:
                    p = os.path.join(self.compacted_dir, name)
                    # age guard: a live compact() renames its gen dir
                    # into place BEFORE appending the ledger line — a
                    # fresh unledgered gen may be mid-commit, not an
                    # orphan
                    try:
                        if now - os.path.getmtime(p) < tmp_min_age_sec:
                            continue
                    except OSError:
                        continue
                    shutil.rmtree(p)
                    removed.append(p)
        for name in os.listdir(self.tmp_dir):
            p = os.path.join(self.tmp_dir, name)
            try:
                if now - os.path.getmtime(p) < tmp_min_age_sec:
                    continue  # possibly an in-flight staging dir
            except OSError:
                continue  # vanished: a concurrent writer renamed it out
            shutil.rmtree(p, ignore_errors=True)
            removed.append(p)
        return removed

    def read_quarantined(self, spark) -> DataFrame:
        """Exactly-once view of quarantined rows (ledgered batches)."""
        committed = sorted(self.committed_batches())
        paths = [
            os.path.join(self.quarantine_dir, f"batch_id={b}") for b in committed
        ]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], StructType([]))
        return spark.read.parquet(*paths)

    def read_lineage(self, spark) -> DataFrame:
        committed = sorted(self.committed_batches())
        paths = [os.path.join(self.lineage_dir, f"batch_id={b}") for b in committed]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], StructType([]))
        return spark.read.parquet(*paths)


class ParquetSnapshotSink:
    """Latest-wins snapshot sink for complete-mode aggregates (the
    live-leaderboard contract, the overwrite dual of
    ``ParquetLedgerSink``'s append MERGE): every trigger REPLACES the
    published snapshot rather than appending to it.

    Commit protocol: the batch writes to ``versions/batch_id=N``
    (rmtree'd first if a crashed attempt left it behind), then a
    ``_LATEST`` marker file naming N is swapped in with ``os.replace``
    — the atomic commit point.  Readers resolve the marker, then read
    that one version dir, so they never observe a half-written
    snapshot.  A replayed batch (same batch_id after checkpoint
    recovery) rewrites byte-identical content and re-points the marker
    at the same version — idempotent by construction.  On Iceberg this
    maps to ``INSERT OVERWRITE`` / ``REPLACE TABLE AS SELECT`` with
    snapshot isolation; prior versions stay on disk as the time-travel
    history (the append sink's q59 contract, overwrite flavor)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.versions_dir = os.path.join(out_dir, "versions")
        self.marker_path = os.path.join(out_dir, "_LATEST")
        os.makedirs(self.versions_dir, exist_ok=True)

    def write_snapshot(self, df: DataFrame, batch_id: int) -> None:
        dest = os.path.join(self.versions_dir, f"batch_id={batch_id}")
        if os.path.exists(dest):  # crashed or replayed attempt
            shutil.rmtree(dest)
        df.write.mode("overwrite").parquet(dest)
        tmp = os.path.join(self.out_dir, f"_marker.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(batch_id))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.marker_path)  # atomic commit point

    def latest_batch_id(self) -> int | None:
        if not os.path.exists(self.marker_path):
            return None
        with open(self.marker_path) as f:
            return int(f.read().strip())

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.versions_dir):
            if name.startswith("batch_id="):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def read_latest(self, spark) -> DataFrame:
        bid = self.latest_batch_id()
        if bid is None:
            raise FileNotFoundError(
                f"no committed snapshot under {self.out_dir} (no _LATEST marker)"
            )
        return spark.read.parquet(
            os.path.join(self.versions_dir, f"batch_id={bid}")
        )

    def foreach_batch(self, finalize=None):
        """foreachBatch body; ``finalize`` (optional) is a batch-side
        DataFrame transform applied before publishing — complete-mode
        aggregates can't hold rank windows in the streaming plan, so
        top-k trimming happens here, in batch context, per trigger."""

        def _body(df: DataFrame, batch_id: int) -> None:
            self.write_snapshot(finalize(df) if finalize else df, batch_id)

        return _body


class IcebergMergeSink:
    """Real Iceberg MERGE path (requires the Iceberg runtime jar; not
    installable in this sandbox — kept config-switchable per SURVEY §7
    step 5).  Cited contract: reference file sink saves one artifact
    per item (``lama_wrapper.py:57-62``); here an idempotent MERGE
    makes replays no-ops.

    MERGE key: ``(batch_id, url, warc_ts)`` — the natural row key plus
    the batch.  ``spark_partition_id()`` is recorded as a LINEAGE
    column but deliberately kept OUT of the ON clause: partition ids
    are not stable across a checkpoint replay (AQE coalescing, changed
    shuffle partitioning), so keying on them would re-insert every row
    whose partition moved instead of no-op'ing."""

    def __init__(self, table: str):
        self.table = table

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        view = f"__batch_{batch_id}"
        df.withColumn("batch_id", F.lit(batch_id)).withColumn(
            "partition", F.spark_partition_id()
        ).createOrReplaceTempView(view)
        spark.sql(
            f"""
            MERGE INTO {self.table} t
            USING {view} s
            ON t.batch_id = s.batch_id
              AND t.url = s.url AND t.warc_ts = s.warc_ts
            WHEN NOT MATCHED THEN INSERT *
            """
        )

    def foreach_batch(self):
        return lambda df, bid: self.write_batch(df, bid)
