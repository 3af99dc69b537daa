#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1) — NOT the frozen bench.

Times a named subset of registered queries with the same methodology as
bench.py (same session config, noop sink, warm + best-of-2, _SINGLE_SHOT
run once) and optionally dumps .explain("formatted") per query, so each
optimization's before/after evidence can be captured in minutes instead
of a full 83-query sweep. bench.py itself stays frozen for the driver.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1 q2 ...
    python bench_extra.py --explain-dir plans/r07 --suffix before q1 q2
    python bench_extra.py --all            # every registered query
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from bench import SF_DIR, CPUS, _session, _consume, _cpu_probe, _SINGLE_SHOT  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--explain-dir", default=None,
                    help="dump explain('formatted') per query into this dir")
    ap.add_argument("--suffix", default="before",
                    help="plan filename suffix: <query>_<suffix>.txt")
    ap.add_argument("--no-time", action="store_true",
                    help="only dump plans, skip timing")
    args = ap.parse_args()

    import __spark_entry__ as entry
    reg = entry.queries()
    names = list(reg) if args.all else args.queries
    unknown = [n for n in names if n not in reg]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    probe_pre = _cpu_probe()
    spark = _session(CPUS)
    if any(n in _SINGLE_SHOT for n in names):
        from bench import prewarm
        prewarm(spark, SF_DIR)

    timings: dict[str, float] = {}
    for name in names:
        fn = reg[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
        if args.explain_dir:
            df = fn(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(args.explain_dir,
                                   f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(txt)
            if args.no_time:
                continue
        if name in _SINGLE_SHOT:
            t0 = time.perf_counter()
            _consume(fn(spark, SF_DIR))
            timings[name] = round(time.perf_counter() - t0, 3)
            continue
        _consume(fn(spark, SF_DIR))            # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _consume(fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    probe_post = _cpu_probe()
    print(json.dumps({"sf_dir": SF_DIR, "queries": timings,
                      "cpu_calib_ops_s": {"pre": probe_pre,
                                          "post": probe_post}}))
    spark.stop()


if __name__ == "__main__":
    main()
