"""Differential fuzz of the crawl-curation precedence TEMPLATE: bind the
five stage relations to identical random literal tables in Spark and
DuckDB and require identical verdicts — catches dialect traps in the
composition SQL itself (join semantics, boolean precedence) that the
per-stage gates and the corpus-shaped oracle can never reach."""

import random

import duckdb
import pytest

from docling_api_spark.operators import curation


def _tables(rng, n):
    docs = list(range(n))
    robots = [(i, rng.random() < 0.7) for i in docs]
    meta = [(f"https://h{i % 7}.example/doc/{i}.html",
             rng.random() < 0.2, rng.random() < 0.8) for i in docs]
    canon = [(i, rng.random() < 0.75) for i in docs]
    reasons = ["", "duplicate", "near_duplicate", "too_short",
               "long_tokens", "low_stopword"]
    qual = []
    for i in docs:
        r = rng.choice(reasons) if rng.random() < 0.5 else ""
        qual.append((i, r, r == ""))
    sample = [(i, rng.random() < 0.6) for i in docs]
    return docs, robots, meta, canon, qual, sample


def _vals(rows, cols):
    def lit(v):
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return "'" + v + "'"
        return str(v)
    body = ", ".join("(" + ", ".join(lit(v) for v in r) + ")"
                     for r in rows)
    return f"(SELECT * FROM (VALUES {body}) AS t({', '.join(cols)}))"


@pytest.mark.parametrize("seed", [1, 7, 42, 1234])
def test_template_identical_across_engines(spark, seed):
    rng = random.Random(seed)
    docs, robots, meta, canon, qual, sample = _tables(rng, 120)
    rels = dict(
        robots=_vals(robots, ["doc_id", "crawl_allowed"]),
        meta=_vals(meta, ["url", "noindex", "is_canonical_self"]),
        canon=_vals(canon, ["doc_id", "is_canonical"]),
        qual=_vals(qual, ["doc_id", "drop_reason", "keep"]),
        sample=_vals(sample, ["doc_id", "keep"]),
    )
    sql = curation.verdict_sql(**rels)
    docs_rel = _vals([(i,) for i in docs], ["doc_id"])
    sql = sql.replace("(SELECT doc_id FROM documents)", docs_rel)
    got_s = sorted(map(tuple, spark.sql(sql).collect()))
    got_d = sorted(duckdb.connect().execute(sql).fetchall())
    assert got_s == got_d
    # and the verdict is the hand-evaluated precedence on every row
    m = {int(u.rsplit("/", 1)[-1].split(".")[0]): (ni, cs)
         for u, ni, cs in meta}
    rb = dict(robots); cn = dict(canon)
    qd = {i: (r, k) for i, r, k in qual}; sm = dict(sample)
    expect = {}
    for i in docs:
        ni, cs = m[i]
        if not rb[i]:
            v = "robots_denied"
        elif ni:
            v = "meta_noindex"
        elif not cs:
            v = "canonical_elsewhere"
        elif not cn[i]:
            v = "url_duplicate"
        elif qd[i][0] != "":
            v = qd[i][0]
        elif not sm[i]:
            v = "sampled_out"
        else:
            v = ""
        expect[i] = (v, v == "" and qd[i][1])
    assert {(i, v, k) for i, v, k in got_s} == \
        {(i, *expect[i]) for i in docs}


@pytest.mark.parametrize("seed", [3, 99])
def test_template_fail_closed_on_partial_stages(spark, seed):
    """Docs missing from a stage relation must drop with the typed
    missing_<stage>_verdict reason in BOTH engines — never vanish from
    the verdict table, never keep."""
    rng = random.Random(seed)
    docs, robots, meta, canon, qual, sample = _tables(rng, 80)
    # drop a disjoint random slice from each stage
    drop = {k: set(rng.sample(docs, 8)) for k in
            ("robots", "meta", "canon", "qual", "sample")}
    robots = [r for r in robots if r[0] not in drop["robots"]]
    meta = [m for m in meta
            if int(m[0].rsplit("/", 1)[-1].split(".")[0])
            not in drop["meta"]]
    canon = [c for c in canon if c[0] not in drop["canon"]]
    qual = [q for q in qual if q[0] not in drop["qual"]]
    sample = [s for s in sample if s[0] not in drop["sample"]]
    rels = dict(
        robots=_vals(robots, ["doc_id", "crawl_allowed"]),
        meta=_vals(meta, ["url", "noindex", "is_canonical_self"]),
        canon=_vals(canon, ["doc_id", "is_canonical"]),
        qual=_vals(qual, ["doc_id", "drop_reason", "keep"]),
        sample=_vals(sample, ["doc_id", "keep"]),
    )
    sql = curation.verdict_sql(**rels).replace(
        "(SELECT doc_id FROM documents)",
        _vals([(i,) for i in docs], ["doc_id"]))
    got_s = sorted(map(tuple, spark.sql(sql).collect()))
    got_d = sorted(duckdb.connect().execute(sql).fetchall())
    assert got_s == got_d
    by_id = {i: (v, k) for i, v, k in got_s}
    assert len(by_id) == len(docs)          # nobody vanished
    for i in drop["robots"]:
        assert by_id[i] == ("missing_robots_verdict", False)
    for i, (v, k) in by_id.items():
        if v.startswith("missing_"):
            assert not k
