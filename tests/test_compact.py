"""Compaction drive: content preserved byte-for-byte, file count
reduced, fingerprint gate aborts on mutation, swap leaves a trash dir."""

import os
import shutil

import pytest

from docling_api_spark.plans.compact import (compact_output,
                                             recover_swap)


def _write_fragmented(spark, path, n_files=40):
    df = spark.range(0, 2000).selectExpr(
        "id AS doc_id", "CAST(id % 7 AS STRING) AS k",
        "repeat('x', CAST(id % 50 AS INT)) AS payload",
        "CASE WHEN id % 11 = 0 THEN CAST(NULL AS STRING) "
        "ELSE 'v' || CAST(id AS STRING) END AS maybe_null")
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return df


def test_compact_preserves_content_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "table")
    _write_fragmented(spark, path, n_files=40)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    res = compact_output(spark, path, target_file_bytes=10**9)
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before
    assert res["files_after"] < res["files_before"]
    assert res["files_after"] == 1 and res["rows"] == 2000
    assert os.path.isdir(res["trash"])
    shutil.rmtree(res["trash"])


def test_compact_rerun_is_stable(spark, tmp_path):
    path = str(tmp_path / "table2")
    _write_fragmented(spark, path, n_files=8)
    compact_output(spark, path, target_file_bytes=10**9)
    res2 = compact_output(spark, path, target_file_bytes=10**9)
    assert res2["files_before"] == res2["files_after"] == 1
    assert res2["rows"] == 2000


def test_fingerprint_catches_row_loss(spark, tmp_path):
    """Simulate a broken rewrite by monkeypatching the repartition
    write to drop rows — the swap must abort and leave the table
    untouched."""
    from docling_api_spark.plans import compact as C
    path = str(tmp_path / "table3")
    _write_fragmented(spark, path, n_files=4)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    orig = C._fingerprint
    calls = {"n": 0}

    def lying_fingerprint(df):
        calls["n"] += 1
        fp = orig(df)
        if calls["n"] == 2:           # the post-rewrite check
            fp = (fp[0] - 1,) + fp[1:]
        return fp

    C._fingerprint = lying_fingerprint
    try:
        with pytest.raises(RuntimeError, match="fingerprint mismatch"):
            compact_output(spark, path, target_file_bytes=10**9)
    finally:
        C._fingerprint = orig
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before


def test_swap_crash_window_recovery(spark, tmp_path):
    """r5 ADVICE fix: a crash between the two swap renames leaves NO
    table at path (old in __trash, new in __compacting). The marker
    written before the first rename lets recover_swap roll the swap
    forward — and the next compact_output call does so automatically."""
    from docling_api_spark.plans import compact as C
    path = str(tmp_path / "crash")
    _write_fragmented(spark, path, n_files=6)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))

    # simulate the crash: die right after the first rename
    orig_rename = os.rename
    def crashing_rename(src, dst):
        orig_rename(src, dst)
        if dst.endswith("__trash"):
            raise KeyboardInterrupt("simulated crash mid-swap")
    os.rename = crashing_rename
    try:
        with pytest.raises(KeyboardInterrupt):
            compact_output(spark, path, target_file_bytes=10**9)
    finally:
        os.rename = orig_rename

    assert not os.path.exists(path)          # the documented crash state
    assert os.path.exists(C._marker_path(path))
    assert recover_swap(path) == "rolled_forward"
    assert not os.path.exists(C._marker_path(path))
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before
    assert recover_swap(path) is None         # idempotent

    # roll-BACK leg: marker + only __trash present (new dir lost)
    shutil.rmtree(path + "__trash")   # drop the interrupted run's trash
    os.rename(path, path + "__trash")
    with open(C._marker_path(path), "w") as fh:
        fh.write("{}")
    assert recover_swap(path) == "rolled_back"
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before


def test_compact_binary_columns(spark, tmp_path):
    """Binary payloads fingerprint via base64 (a utf-8-lossy string cast
    could collide) and survive compaction byte-exactly."""
    path = str(tmp_path / "btable")
    df = spark.range(0, 300).selectExpr(
        "id", "unhex(lpad(hex(id * 2654435761 % 4294967296), 8, '0')) "
        "AS payload")
    df.repartition(10).write.mode("overwrite").parquet(path)
    before = sorted((r["id"], bytes(r["payload"]))
                    for r in spark.read.parquet(path).collect())
    res = compact_output(spark, path, target_file_bytes=10**9)
    after = sorted((r["id"], bytes(r["payload"]))
                   for r in spark.read.parquet(path).collect())
    assert after == before and res["files_after"] == 1
