"""Scale-parameterization tests for the MinHash-LSH family (VERDICT r2
items 1 and 5): the LshConfig plumbing must keep Spark/DuckDB parity at
non-default shapes, and the incremental-dedup broadcast must be size-gated
(forced broadcast of an unbounded new batch was r2's named scale-killer)."""

import contextlib
import io

import duckdb
import pytest

from docling_api_spark.operators import dedup as D

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    yield con


def _plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_lsh_config_validation_and_sizing():
    assert D.DEFAULT_LSH == D.LshConfig(n_sigs=8, n_bands=4)
    assert D.DEFAULT_LSH.rows_per_band == 2
    with pytest.raises(ValueError):
        D.LshConfig(n_sigs=8, n_bands=3)  # uneven split
    cfg = D.LshConfig.for_threshold(0.85)
    mid = (1.0 / cfg.n_bands) ** (1.0 / cfg.rows_per_band)
    assert abs(mid - 0.85) < 0.02
    assert cfg.n_sigs <= 256


def test_band_expr_default_matches_r2_shape():
    # band b covers sig rows [b*r, (b+1)*r) — with r=2 the generated keys
    # are byte-identical to the r2 fixed (2b, 2b+1) shape, so the driver
    # oracle hashes are unchanged
    assert D._band_expr("spark", 1) == \
        "concat(CAST(sig_2 AS STRING), ':', CAST(sig_3 AS STRING))"
    assert D._band_expr("duck", 0) == \
        "(CAST(sig_0 AS VARCHAR) || ':' || CAST(sig_1 AS VARCHAR))"
    wide = D.LshConfig(n_sigs=6, n_bands=2)
    assert D._band_expr("spark", 1, wide) == (
        "concat(CAST(sig_3 AS STRING), ':', CAST(sig_4 AS STRING), ':', "
        "CAST(sig_5 AS STRING))")


@pytest.mark.parametrize("cfg", [
    D.LshConfig(n_sigs=12, n_bands=4),   # 3 rows/band: stricter bands
    D.LshConfig(n_sigs=6, n_bands=6),    # 1 row/band: permissive bands
])
def test_nondefault_lsh_config_parity(spark, duck, cfg):
    """Spark and DuckDB candidate sets stay value-identical at non-default
    (n_sigs, n_bands) — the driver gate only exercises the default."""
    srows = sorted(tuple(r) for r in
                   D.dedup_minhash_lsh(spark, SF_DIR, cfg).collect())
    drows = sorted(map(tuple, duck.sql(
        D.lsh_candidates_oracle(cfg)).fetchall()))
    assert srows == drows
    assert len(srows) > 0


def test_more_bands_more_candidates(spark):
    """1-row bands collide far more than the default 2-row bands — the
    S-curve knob actually moves recall."""
    strict = D.dedup_minhash_lsh(
        spark, SF_DIR, D.LshConfig(n_sigs=8, n_bands=4)).count()
    loose = D.dedup_minhash_lsh(
        spark, SF_DIR, D.LshConfig(n_sigs=6, n_bands=6)).count()
    assert loose > strict


def test_neardup_canonical_components(spark, duck):
    """The min-propagation loop converges to the component min: both ends
    of every verified pair share one canonical, the canonical is a member
    and the min, and the DuckDB recursive-CTE twin is identical."""
    canon = {r.doc_id: r.nd_canonical
             for r in D.neardup_canonical(spark, SF_DIR).collect()}
    pairs = [(r.left_id, r.right_id)
             for r in D.dedup_near_pipeline(spark, SF_DIR).collect()]
    assert pairs and canon
    for a, b in pairs:
        assert canon[a] == canon[b]
    assert all(c <= d for d, c in canon.items())
    assert set(canon.values()) <= set(canon.keys())
    drows = dict(duck.sql(D.neardup_canonical_oracle()).fetchall())
    assert canon == drows


def test_quality_filter_neardup_composition(spark):
    """near_duplicate drops appear, exact-duplicate outranks near, and
    component canonicals are never dropped as near_duplicate."""
    from docling_api_spark.operators import text_stats as T
    out = {r.doc_id: r
           for r in T.quality_filter_neardup(spark, SF_DIR).collect()}
    assert any(r.drop_reason == "near_duplicate" for r in out.values())
    base = {r.doc_id: r for r in T.quality_filter(spark, SF_DIR).collect()}
    assert set(out) == set(base)
    for d, r in base.items():
        if r.drop_reason == "duplicate":
            assert out[d].drop_reason == "duplicate"
        # adding a gate can only shrink the keep set
        if out[d].keep:
            assert r.keep
    for d, r in out.items():
        if r.drop_reason == "near_duplicate":
            assert r.nd_canonical != d
        if r.nd_canonical == d:
            assert r.drop_reason != "near_duplicate"


def test_passage_dedup_semantics(spark):
    """Independent pure-Python replica of the rule (tokenize → 10-token
    chunks → global first-occurrence by (doc_id, pos) → reassemble): the
    Spark output must match it doc-for-doc, and exact-duplicate docs must
    lose ALL their passages."""
    import re
    k = D.PASSAGE_TOKENS
    out = {r.doc_id: r for r in D.passage_dedup(spark, SF_DIR).collect()}
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()}
    seen: set = set()
    n_dup_docs = 0
    for d in sorted(docs):
        toks = [t for t in
                re.sub(r"[^a-z0-9 ]", " ", (docs[d] or "").lower()).split()
                if t]
        chunks = [" ".join(toks[i:i + k]) for i in range(0, len(toks), k)]
        kept = []
        for ch in chunks:
            if ch in seen:
                continue
            seen.add(ch)
            kept.append(ch)
        r = out[d]
        assert r.n_passages == len(chunks), d
        assert r.n_dropped == len(chunks) - len(kept), d
        assert r.cleaned_text == " ".join(kept), d
        if chunks and not kept:
            n_dup_docs += 1
    assert n_dup_docs > 0          # exact dups fully deduplicated
    assert any(r.n_dropped for r in out.values())


def test_passage_dedup_plan_two_keyed_shuffles(spark):
    """The scale contract: tokenize/chunk/explode are map-side; the only
    ALGORITHM exchanges are the passage-hash window and the doc_id
    reassembly — exactly two keyed shuffles, nothing all-pairs. (r7:
    the input-widening repartition of the single-file documents scan —
    functions.read_wide, tagged REPARTITION_BY_NUM in the plan — is a
    scan-layout fix, not an algorithm shuffle, and is counted
    separately.)"""
    import re
    df = D.passage_dedup(spark, SF_DIR)
    plan = _plan_str(df)
    # formatted explain lists each node in the tree AND a details block;
    # count distinct exchange node ids, split by shuffle origin
    ids = set(re.findall(r"\((\d+)\) Exchange", plan))
    widen = plan.count("REPARTITION_BY_NUM")
    assert len(ids) - widen == 2, plan
    assert widen <= 1, plan


def test_incremental_broadcast_is_size_gated(spark, duck):
    """r2 verdict item 1: a small new batch broadcasts (corpus side never
    shuffles); a batch over the gate must NOT carry a broadcast hint —
    the planner's size statistics govern. Pinned by disabling
    autoBroadcastJoinThreshold (simulating 'stats say the batch is too
    big'): the hinted path still forces a broadcast (the r2 hazard —
    hints bypass the size check), the gated path degrades to a shuffled
    join instead of an OOM."""
    small = D.incremental_dedup(spark, SF_DIR)
    plan_small = _plan_str(small)
    assert "BroadcastHashJoin" in plan_small, plan_small

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # under the gate, the hint forces a broadcast regardless of stats
        hinted = D.incremental_dedup(spark, SF_DIR)
        assert "BroadcastHashJoin" in _plan_str(hinted)
        # over the gate: no hint, so the planner's size decision stands
        big = D.incremental_dedup(spark, SF_DIR, max_broadcast_docs=0)
        plan_big = _plan_str(big)
        assert "BroadcastHashJoin" not in plan_big, plan_big
        assert ("SortMergeJoin" in plan_big) or \
            ("ShuffledHashJoin" in plan_big)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # both regimes compute the same rows, and both match the oracle
    srows = sorted(tuple(r) for r in small.collect())
    brows = sorted(tuple(r) for r in big.collect())
    orows = sorted(map(tuple, duck.sql(D._incremental_oracle()).fetchall()))
    assert srows == brows == orows
    assert len(srows) > 0


def test_substring_dedup_plan_materializes_window_once(spark):
    """The scale contract (r6): the md5-window relation is consumed by
    TWO downstream branches (anti-join + per-doc count) but computed
    ONCE — the final plan contains ZERO Window nodes (the removal
    marks are a localCheckpoint scan) and no cartesian/nested-loop
    join anywhere. Without the materialization Catalyst re-inlines the
    CTE and duplicates the corpus-wide window subtree (measured r6)."""
    df = D.substring_dedup(spark, SF_DIR)
    plan = _plan_str(df)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # ... and the rm-materialization itself runs the window exactly once
    rm = spark.sql(D._substring_rm_sql("spark"))
    rm_plan = _plan_str(rm)
    import re
    assert len(set(re.findall(r"\((\d+)\) Window", rm_plan))) == 1, rm_plan
