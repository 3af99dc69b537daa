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
- swap is two renames (old → .trash, new → path) — the crash window
  leaves either the old or the new complete directory, never a mix,
  and .trash keeps the old files until the caller deletes them.
"""

from __future__ import annotations

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


def compact_output(spark: SparkSession, path: str,
                   target_file_bytes: int = 128 * 1024 * 1024) -> dict:
    """Rewrite the parquet table at ``path`` into
    ``ceil(bytes/target)`` files; verify content; swap atomically.
    Returns {files_before, files_after, rows, bytes}."""
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
    os.rename(path, trash)
    os.rename(tmp, path)
    files_after = sum(1 for _, _, fs in os.walk(path) for f in fs
                      if f.endswith(".parquet"))
    return {"files_before": files_before, "files_after": files_after,
            "rows": int(fp_before[0]), "bytes": total,
            "trash": trash}
