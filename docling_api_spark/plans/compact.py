"""Output compaction — the small-files maintenance job every
long-running 100 TB pipeline schedules (reference parity: none — the
reference writes no tables; this is table-ops the Spark-first design
owes its own sink).

Why it exists: resumable runs append per-partition files
(plans/pipeline.py writes one file per task), incremental crawls append
per-batch directories (streaming sinks), and after months a table holds
millions of KB-sized files — scan parallelism collapses into file-open
overhead (exactly the failure mode bench.py works around with
openCostInBytes; at 100 TB you fix the table, not the reader).

Contract:
- content-preserving: the compacted table holds EXACTLY the same rows
  (verified by count + per-column null/sum-of-crc fingerprint before
  the swap; the swap aborts loudly on any mismatch);
- file count = ceil(total_bytes / target_file_bytes), written via one
  repartition (a shuffle — acceptable: compaction is an offline
  maintenance pass, not a hot path);
- swap is two renames (old → __trash, new → path) guarded by a
  swap-in-progress marker: a crash can never leave a MIX of old and
  new files, but a crash between the two renames leaves NO table at
  ``path`` (old complete in __trash, new complete in __compacting).
  The marker (``<path>__swap_marker``, written before the first
  rename, removed after the second) records that state so
  :func:`recover_swap` — run automatically at the next
  ``compact_output`` call — can roll the swap forward (new dir ready)
  or back (only the old dir survived) without guesswork. __trash
  keeps the old files until the caller deletes them — the returned
  dict's ``trash`` key names that directory and callers (e.g.
  queries.compact_roundtrip) depend on it for cleanup: it is part of
  the contract, not an implementation detail.
"""

from __future__ import annotations

import json
import math
import os
import shutil

from pyspark.sql import SparkSession, functions as F


def _fingerprint(df) -> tuple:
    """Order-insensitive content fingerprint: row count plus, per
    column, the null count and the BIGINT sum of crc32 over the
    canonical string form. Cheap (one aggregation), engine-local, and
    collision-safe enough for a pre-swap equality check."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for f in df.schema.fields:
        c = f.name
        # binary → base64 before the string cast: a direct cast is
        # utf-8-lossy and two differing byte payloads could fingerprint
        # equal (pages tables carry binary html)
        if f.dataType.simpleString() == "binary":
            s = F.base64(F.col(c))
        else:
            s = F.col(c).cast("string")
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"null_{c}"))
        aggs.append(F.sum(F.crc32(F.coalesce(s, F.lit("\x00NULL"))))
                    .alias(f"crc_{c}"))
    row = df.agg(*aggs).collect()[0]
    return tuple(row)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _marker_path(path: str) -> str:
    return path.rstrip("/") + "__swap_marker"


def recover_swap(path: str) -> str | None:
    """Finish or roll back a compaction swap interrupted by a crash
    (r5 ADVICE fix: the window between the two renames leaves no table
    at ``path``). Keyed off the swap marker; idempotent; returns the
    action taken ('rolled_forward' | 'rolled_back' | 'none') or None
    when no swap was in progress."""
    marker = _marker_path(path)
    if not os.path.exists(marker):
        return None
    tmp = path.rstrip("/") + "__compacting"
    trash = path.rstrip("/") + "__trash"
    if os.path.exists(path):
        # crashed before the first rename or after the second — the
        # table is intact either way; just clear the marker
        action = "none"
    elif os.path.exists(tmp):
        # between the renames with the verified new dir complete:
        # finish the swap (old data stays in __trash as before)
        os.rename(tmp, path)
        action = "rolled_forward"
    elif os.path.exists(trash):
        # new dir lost (e.g. crash plus manual cleanup): restore old
        os.rename(trash, path)
        action = "rolled_back"
    else:
        raise RuntimeError(
            f"swap marker {marker} present but neither {path}, {tmp} "
            f"nor {trash} exists — manual recovery required")
    os.remove(marker)
    return action


def compact_output(spark: SparkSession, path: str,
                   target_file_bytes: int = 128 * 1024 * 1024) -> dict:
    """Rewrite the parquet table at ``path`` into
    ``ceil(bytes/target)`` files; verify content; swap atomically.
    Returns {files_before, files_after, rows, bytes, trash} — ``trash``
    is the directory holding the pre-compaction files (kept until the
    caller deletes it; see the module Contract section)."""
    recover_swap(path)
    before = spark.read.parquet(path)
    files_before = sum(
        1 for _, _, fs in os.walk(path) for f in fs
        if f.endswith(".parquet"))
    total = _dir_bytes(path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    fp_before = _fingerprint(before)

    tmp = path.rstrip("/") + "__compacting"
    trash = path.rstrip("/") + "__trash"
    shutil.rmtree(tmp, ignore_errors=True)
    before.repartition(n_files).write.mode("overwrite").parquet(tmp)

    fp_after = _fingerprint(spark.read.parquet(tmp))
    if fp_after != fp_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction fingerprint mismatch for {path}: "
            f"{fp_before} != {fp_after} — table left untouched")

    shutil.rmtree(trash, ignore_errors=True)
    marker = _marker_path(path)
    with open(marker, "w") as fh:
        json.dump({"path": path, "tmp": tmp, "trash": trash}, fh)
    os.rename(path, trash)
    os.rename(tmp, path)
    os.remove(marker)
    files_after = sum(1 for _, _, fs in os.walk(path) for f in fs
                      if f.endswith(".parquet"))
    return {"files_before": files_before, "files_after": files_after,
            "rows": int(fp_before[0]), "bytes": total,
            "trash": trash}
