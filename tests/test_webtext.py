"""Semantic tests for the web-corpus curation operators (webtext.py) —
the oracle-parity test proves Spark==DuckDB; these prove both equal the
INTENDED semantics (a shared dialect bug would pass parity silently)."""

import duckdb
import pytest

from docling_api_spark.operators import webtext

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')")
    yield con


def _docs_view(con, rows):
    """Replace the documents view with literal (doc_id, text) rows."""
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    con.execute("CREATE OR REPLACE VIEW documents AS "
                f"SELECT * FROM (VALUES {vals}) v(doc_id, text)")


# ------------------------------------------------------- repetition

def test_repetition_known_document():
    con = duckdb.connect()
    # 6 tokens: 'a b a b a c' → distinct 3 → dup_token_frac 0.5
    # 2-grams: [a b, b a, a b, b a, a c] → counts {a b:2, b a:2, a c:2? no:
    #   grams are 'a b','b a','a b','b a','a c' → a b:2, b a:2, a c:1
    #   top chars = 2*3=6, tot = 5*3=15 → 0.4
    #   dup (c>1): (2+2)*3=12 → not exposed for 2-grams
    # 3-grams: 'a b a','b a b','a b a','b a c' → a b a:2 dup chars 2*5=10,
    #   tot 4*5=20 → dup_3gram_frac 0.5
    _docs_view(con, [(1, "a b a b a c")])
    row = con.sql(webtext._repetition_sql("duck")).fetchall()[0]
    doc_id, n_tokens, dup_tok, top2, dup3 = row
    assert (doc_id, n_tokens) == (1, 6)
    assert dup_tok == 0.5
    assert top2 == round(6 / 15, 4)
    assert dup3 == 0.5


def test_repetition_short_doc_null_grams():
    con = duckdb.connect()
    _docs_view(con, [(1, "solo")])
    row = con.sql(webtext._repetition_sql("duck")).fetchall()[0]
    assert row == (1, 1, 0.0, None, None)


# ------------------------------------------------- url canonicalization

def _canon_map(duck):
    rows = duck.sql(webtext._url_canon_sql("duck")).fetchall()
    return {r[0]: (r[1], r[2], r[3]) for r in rows}


def test_url_canonical_form(duck):
    m = _canon_map(duck)
    for doc_id, (url, canon, _) in m.items():
        # canonical is lowercase scheme+host, no default port, no
        # fragment, no tracking params, no trailing slash
        assert canon.startswith("https://site"), canon
        assert ":443" not in canon
        assert "#" not in canon
        assert "utm_" not in canon and "fbclid" not in canon
        assert not canon.endswith("/")
        page = doc_id - doc_id % 3
        assert f"/doc/{page}" in canon


def test_url_variants_collapse_and_min_wins(duck):
    m = _canon_map(duck)
    # %3=0 and %3=1 variants of one page share a canonical; smallest
    # doc_id is the keeper
    by_canon = {}
    for doc_id, (_, canon, is_canon) in m.items():
        by_canon.setdefault(canon, []).append((doc_id, is_canon))
    groups = [g for g in by_canon.values() if len(g) > 1]
    assert groups, "expected real dedup groups"
    for g in groups:
        keeper = min(d for d, _ in g)
        for d, is_canon in g:
            assert is_canon == (d == keeper)
    # the no-query variant (%3=2) never joins a group
    for doc_id, (_, canon, _) in m.items():
        if doc_id % 3 == 2:
            assert len(by_canon[canon]) == 1


def test_url_param_sort_and_tracking_strip(duck):
    m = _canon_map(duck)
    doc = next(d for d in m if d % 3 == 1)
    url, canon, _ = m[doc]
    assert "utm_campaign" in url
    assert canon.endswith(f"?id={(doc - doc % 3) % 7}")
    frag_doc = next(d for d in m if d % 9 == 5)
    assert "#sec2" in m[frag_doc][0] and "#" not in m[frag_doc][1]


# ---------------------------------------------------- contamination

def test_contamination_semantics():
    con = duckdb.connect()
    # doc 0 (% 101 == 0) is the benchmark; doc 1 shares the 3-gram
    # 'x y z'; doc 2 shares none
    _docs_view(con, [(0, "x y z q"), (1, "p x y z"), (2, "a b c d")])
    rows = {r[0]: r for r in
            con.sql(webtext._contamination_sql("duck")).fetchall()}
    assert 0 not in rows            # benchmark docs excluded from output
    assert rows[1][2] == 1 and rows[1][4] is True
    assert rows[2][2] == 0 and rows[2][4] is False
    assert rows[1][1] == 2          # 'p x y', 'x y z'


# ---------------------------------------------------------- split

def test_split_proportions_and_determinism(duck):
    rows = duck.sql(webtext._split_sql("duck")).fetchall()
    counts = {}
    for _, bucket, split in rows:
        assert 0 <= bucket < 100
        counts[split] = counts.get(split, 0) + 1
    n = sum(counts.values())
    # 90/5/5 within generous tolerance at n=500
    assert counts["train"] / n > 0.8
    assert 0 < counts["validation"] / n < 0.12
    assert 0 < counts["test"] / n < 0.12
    # pure function of doc_id: a second evaluation is identical
    assert rows == duck.sql(webtext._split_sql("duck")).fetchall()


# -------------------------------------------------------- lm scores

def test_lm_scores_known_corpus():
    import math
    con = duckdb.connect()
    # corpus: doc1 'a b a b', doc2 'a b'. vocab = {a, b} → V=2
    # unigrams: a:3, b:3.  bigrams: 'a b':3? doc1 has [a b, b a, a b],
    # doc2 [a b] → C('a b')=3, C('b a')=1
    _docs_view(con, [(1, "a b a b"), (2, "a b")])
    rows = {r[0]: r for r in con.sql(webtext._lm_sql("duck")).fetchall()}
    lp_ab = round(math.log((3 + 1) / (3 + 2)) * 1e6)   # integer micros
    lp_ba = round(math.log((1 + 1) / (3 + 2)) * 1e6)

    def avg(s, n):
        q = (2 * abs(s) + n) // (2 * n)   # round-half-away int division
        return (-1.0 if s < 0 else 1.0) * q / 1e6

    assert rows[1][1] == 3
    assert rows[1][2] == avg(2 * lp_ab + lp_ba, 3)
    assert rows[2][1] == 1
    assert rows[2][2] == avg(lp_ab, 1)


def test_lm_scores_single_token_doc_null():
    con = duckdb.connect()
    _docs_view(con, [(1, "alone"), (2, "a b")])
    rows = {r[0]: r for r in con.sql(webtext._lm_sql("duck")).fetchall()}
    assert rows[1][1] == 0 and rows[1][2] is None


# ----------------------------------- canonicalizer property: idempotence

def _url_grammar():
    """Deterministic enumeration of messy-URL shapes well beyond the
    synthetic generator: case noise, default and NON-default ports,
    empty paths, params in every order, tracking-only queries, bare
    '?' and '#', repeated slashes."""
    schemes = ["https", "HTTP", "hTTpS"]
    hosts = ["Site7.Example", "a.example:443", "b.example:8080",
             "c.example:80"]
    paths = ["", "/", "/x/y/", "/x//y", "/doc/5"]
    queries = ["", "?", "?utm_source=a", "?b=2&a=1", "?a=1&utm_x=3&b=2",
               "?utm_a=1&utm_b=2"]
    frags = ["", "#", "#frag"]
    urls = []
    for i, s in enumerate(schemes):
        for j, h in enumerate(hosts):
            for k, p in enumerate(paths):
                urls.append(s + "://" + h + p
                            + queries[(i + j + k) % len(queries)]
                            + frags[(i * 2 + j + k) % len(frags)])
    return urls


def test_schemeless_urls_pass_through_distinct():
    # r3 review find: without the guard, every schemeless /
    # protocol-relative / non-hierarchical URL collapsed to ':///' and
    # the dedup silently merged distinct pages
    con = duckdb.connect()
    degenerate = ["//a.example/x", "//b.example/y", "mailto:joe@x.com",
                  "/bare/path", "data:text/plain,hi#frag"]
    vals = ", ".join(f"({i}, '{u}')" for i, u in enumerate(degenerate))
    src = f"(SELECT * FROM (VALUES {vals}) v(doc_id, u))"
    got = {r[0]: r[2] for r in con.sql(
        webtext.canonicalize_sql("duck", src)).fetchall()}
    assert len(set(got.values())) == len(degenerate)
    assert got[0] == "//a.example/x"            # untouched
    assert got[4] == "data:text/plain,hi"       # fragment still stripped


def test_canonicalize_idempotent_and_engine_parity(spark):
    urls = _url_grammar()
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{u}')" for i, u in enumerate(urls))
    src = f"(SELECT * FROM (VALUES {vals}) v(doc_id, u))"
    once = {r[0]: r[2] for r in con.sql(
        webtext.canonicalize_sql("duck", src)).fetchall()}
    vals2 = ", ".join(f"({i}, '{c}')" for i, c in once.items())
    twice = {r[0]: r[2] for r in con.sql(
        webtext.canonicalize_sql(
            "duck", f"(SELECT * FROM (VALUES {vals2}) v(doc_id, u))")
    ).fetchall()}
    assert once == twice, "canonicalization must be idempotent"
    # spark produces byte-identical canonicals on the same grammar
    rows = ", ".join(f"({i}, '{u}')" for i, u in enumerate(urls))
    sdf = spark.sql(webtext.canonicalize_sql(
        "spark", f"(SELECT * FROM (VALUES {rows}) AS v(doc_id, u))"))
    got = {r["doc_id"]: r["canonical_url"] for r in sdf.collect()}
    assert got == once
    # spot properties on the canonical forms
    for c in once.values():
        assert c == c.split("#")[0]
        scheme, rest = c.split("://", 1)
        hostport = rest.split("/")[0]
        # only the scheme's OWN default port is stripped — https://x:80
        # is a real non-default port and must survive
        if scheme == "https":
            assert not hostport.endswith(":443"), c
        if scheme == "http":
            assert not hostport.endswith(":80"), c
        assert "utm_" not in c
        assert scheme == scheme.lower()


# --------------------------------------------- stratified sampling

def test_stratified_rates_and_determinism(duck):
    rows = duck.sql(webtext._stratified_sql("duck")).fetchall()
    by_lang = {}
    for _, lang, bucket, rate, keep in rows:
        assert keep == (bucket < rate)
        exp = webtext._LANG_RATES.get(lang, webtext._DEFAULT_RATE)
        assert rate == exp
        n, k = by_lang.get(lang, (0, 0))
        by_lang[lang] = (n + 1, k + keep)
    n, k = by_lang["en"]
    assert 0.3 < k / n < 0.7          # ~50% en keep rate
    # rate-100 languages keep everything
    for lang, (n, k) in by_lang.items():
        if lang not in webtext._LANG_RATES:
            assert k == n
    assert rows == duck.sql(webtext._stratified_sql("duck")).fetchall()


# --------------------------------------------- text normalization

def test_normalize_folds_and_collapses():
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM (VALUES "
                "(2, 'plain words'), (3, 'odd doc')) v(doc_id, text)")
    norm = {r[0]: r for r in
            con.sql(webtext._normalize_sql("duck")).fetchall()}
    # even doc got the messy wrapper, normalizer folds it back
    doc_id, raw_len, norm_len, changed, _ = norm[2]
    assert changed and norm_len < raw_len
    # odd doc untouched
    assert norm[3][3] is False and norm[3][1] == norm[3][2]
    # the fold itself: curly quotes/en-dash → ASCII, runs collapsed
    fold_to = webtext._FOLD_TO.replace("'", "''")
    row = con.sql(
        "WITH s0 AS (SELECT '“' || 'a  b' || '”  – end' AS m) "
        "SELECT trim(regexp_replace(translate(m, "
        f"'{webtext._FOLD_FROM}', '{fold_to}'), '  +', ' ', 'g')) FROM s0"
    ).fetchall()[0][0]
    assert row == '"a b" - end'


# ------------------------------------------------- robots compliance

def test_robots_semantics(duck):
    rows = {r[0]: r for r in
            duck.sql(webtext._robots_sql("duck")).fetchall()}
    assert len(rows) == 500
    for doc_id, (_, host, path, allowed) in rows.items():
        h = doc_id % 97
        assert host == f"site{h}.example"
        if h % 3 == 0:
            # disallow: /doc/ with no allow override
            assert allowed is False, (doc_id, h)
        elif h % 3 == 1:
            # allow: /doc/1 overrides by longest match
            assert allowed == path.startswith("/doc/1"), (doc_id, h)
        else:
            # only the /private/ rule — docs unaffected
            assert allowed is True, (doc_id, h)


def test_robots_decoy_section_ignored(duck):
    # if the evilbot section ('disallow: /') were parsed, EVERYTHING
    # would be disallowed; assert some allowed rows exist
    rows = duck.sql(webtext._robots_sql("duck")).fetchall()
    assert any(r[3] for r in rows) and not all(r[3] for r in rows)


# ------------------------------------------------------- plan pins

def test_dataset_split_plan_zero_shuffle(spark):
    """Zero ALGORITHM shuffles: the split decision is a pure map-side
    md5 projection. (r7: the one allowed exchange is the input-widening
    repartition of the single-file documents scan — functions.read_wide,
    REPARTITION_BY_NUM — a scan-layout fix, not part of the split.)"""
    plan = webtext.dataset_split(spark, SF_DIR) \
        ._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange ")
    n_widen = plan.count("REPARTITION_BY_NUM")
    assert n_exchange - n_widen == 0 and n_widen <= 1, plan


def test_contamination_plan_broadcasts_bench(spark):
    plan = webtext.contamination_flags(spark, SF_DIR) \
        ._jdf.queryExecution().executedPlan().toString()
    # the benchmark gram set must be the broadcast side; the corpus gram
    # relation must never shuffle on gram for the semi-join itself
    assert "BroadcastExchange" in plan
    # exactly the two keyed aggs: (doc_id, gram) distinct + per-doc count
    # (plus the bench distinct) — no extra corpus-wide exchanges from a
    # duplicated tot/hits chain
    # (the r7 input-widening repartition also hashes on doc_id —
    # discount it via its REPARTITION_BY_NUM origin tag)
    n_gram_exchanges = plan.count("Exchange hashpartitioning(doc_id") \
        - plan.count("REPARTITION_BY_NUM")
    assert n_gram_exchanges <= 2, plan[:2000]


def test_url_canonical_plan_single_window_exchange(spark):
    """One ALGORITHM exchange (the canonical-url window); the r7
    input-widening repartition (REPARTITION_BY_NUM) is discounted."""
    plan = webtext.url_canonical_dedup(spark, SF_DIR) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") \
        - plan.count("REPARTITION_BY_NUM") == 1


# ----------------------------------------------- head_meta (queries.py)

def test_head_meta_semantics_and_plan(spark):
    from docling_api_spark.queries import head_meta
    df = head_meta(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan          # pure map-side projection
    rows = {int(r["url"].rsplit("/", 1)[1].split(".")[0]): r
            for r in df.collect()}
    for i, r in rows.items():
        assert r["title"] == f"Doc {i} | site{i % 97}"
        if i % 4 == 1:
            assert r["noindex"] and r["nofollow"] and not r["keep"]
        elif i % 4 == 3:                    # attr-order-flipped meta
            assert r["robots"] == "nofollow" and r["nofollow"]
            assert not r["noindex"]
        elif i % 4 == 0:
            assert r["robots"] == "" and not r["noindex"]
        if i % 3 == 0:
            assert r["is_canonical_self"]
            assert r["canonical_href"] == r["url"]
        elif i % 3 == 1:
            assert not r["is_canonical_self"] and not r["keep"]
        else:
            assert r["canonical_href"] == "" and r["is_canonical_self"]


# ------------------------------------------------------- ratio4 ties

def test_ratio4_tie_identical_across_engines(spark):
    """The .5 tie class ROUND(int/int double, 4) gets wrong across
    engines (r3 ADVICE): 1/20000 scaled to 4 dp is exactly 0.5 — Spark's
    BigDecimal HALF_UP says 0.0001, DuckDB's scaled-double path can say
    0.0. ratio4's integer round-half-away cannot tie; both engines must
    produce the identical double for every constructed tie."""
    import duckdb as d

    from docling_api_spark.functions import textsql as X
    cases = [(1, 20000), (3, 20000), (1, 8000), (7, 2000),
             (12345, 20000), (0, 5), (19999, 20000 * 2)]
    for num, den in cases:
        s = spark.sql(
            "SELECT " + X.ratio4("spark", str(num), str(den)) + " AS r"
        ).collect()[0]["r"]
        q = d.connect().execute(
            "SELECT " + X.ratio4("duck", str(num), str(den)) + " AS r"
        ).fetchone()[0]
        assert s == q, (num, den, s, q)
        # and the value is the half-AWAY rounding of num/den at 4 dp
        scaled = num * 10**4
        expect = (2 * scaled + den) // (2 * den) / 10**4
        assert s == expect, (num, den, s, expect)


# ------------------------------------------------ crawl_curation composite

def test_crawl_curation_precedence_and_conjunction(spark):
    """Composition semantics the per-stage gates cannot see: the verdict
    is the FIRST failing stage in crawl order, keep is the conjunction
    of all five stage verdicts, and every documented reason code
    actually occurs on the driver corpus."""
    from docling_api_spark import queries as Q
    sf = "/root/testdata/sf0.001"
    rows = {r["doc_id"]: r for r in Q.crawl_curation(spark, sf).collect()}
    robots = {r["doc_id"]: r["crawl_allowed"]
              for r in webtext.robots_filter(spark, sf).collect()}
    sample = {r["doc_id"]: r["keep"]
              for r in webtext.stratified_sample(spark, sf).collect()}
    assert len(rows) == 500
    reasons = {r["drop_reason"] for r in rows.values()}
    # only documented codes; the major stages fire somewhere and some
    # docs survive (url_duplicate may be fully shadowed by earlier
    # stages at this scale — precedence, checked per-doc below)
    assert reasons <= {"", "robots_denied", "meta_noindex",
                       "canonical_elsewhere", "url_duplicate",
                       "duplicate", "near_duplicate", "too_short",
                       "long_tokens", "low_stopword", "sampled_out"}
    assert {"", "robots_denied", "meta_noindex", "canonical_elsewhere",
            "sampled_out"} <= reasons
    canon = {r["doc_id"]: r["is_canonical"]
             for r in webtext.url_canonical_dedup(spark, sf).collect()}
    for i, r in rows.items():
        # a kept doc must be its canonical-URL group's representative
        if r["keep"]:
            assert canon[i]
        # precedence: a robots-denied doc reports robots_denied no
        # matter what later stages say
        if not robots[i]:
            assert r["drop_reason"] == "robots_denied"
        # conjunction: keep implies every stage passed
        if r["keep"]:
            assert r["drop_reason"] == ""
            assert robots[i] and sample[i]
        else:
            assert r["drop_reason"] != ""


def test_ratio4_bulk_random_cross_engine(spark):
    """500 seeded random (num, den) pairs through ratio4 in ONE query
    per engine — identical doubles required (the .5-tie class cannot
    appear by construction; this guards the whole integer pipeline)."""
    import random

    import duckdb as d

    from docling_api_spark.functions import textsql as X
    rng = random.Random(123)
    pairs = [(rng.randrange(0, 10**6), rng.randrange(1, 10**6))
             for _ in range(500)]
    vals = ", ".join(f"({n}, {m})" for n, m in pairs)
    for dialect, run in (
        ("spark", lambda q: [r["r"] for r in spark.sql(q).collect()]),
        ("duck", lambda q: [r[0] for r in
                            d.connect().execute(q).fetchall()]),
    ):
        sql = (f"SELECT {X.ratio4(dialect, 'n', 'm')} AS r "
               f"FROM (VALUES {vals}) AS t(n, m) ORDER BY n, m")
        got = run(sql)
        if dialect == "spark":
            spark_res = got
        else:
            assert got == spark_res
    expect = [ (2 * n * 10**4 + m) // (2 * m) / 10**4
               for n, m in sorted(pairs)]
    assert spark_res == expect


# ----------------------------------------------------- sequence packing

def test_sequence_packing_semantics():
    """Hand-evaluated GLOBAL layout (r5 rework): one continuous token
    stream in doc_id order, cut at the 256-token budget."""
    con = duckdb.connect()
    # global doc_id order: 0(200 tok), 1(10), 32(100), 64(300)
    _docs_view(con, [(0, " ".join(["w"] * 200)),
                     (32, " ".join(["w"] * 100)),
                     (64, " ".join(["w"] * 300)),
                     (1, " ".join(["w"] * 10))])
    rows = {r[0]: r for r in
            con.sql(webtext._packing_sql("duck")).fetchall()}
    assert webtext.PACK_BUDGET == 256
    # (seq_id, seq_offset, n_seqs_spanned)
    assert rows[0][2:] == (0, 0, 1)     # tok 0..199   -> seq 0
    assert rows[1][2:] == (0, 200, 1)   # tok 200..209 -> seq 0
    assert rows[32][2:] == (0, 210, 2)  # tok 210..309 -> seqs 0-1
    assert rows[64][2:] == (1, 54, 2)   # tok 310..609 -> seqs 1-2


def test_sequence_packing_shard_invariance():
    """The r5 scale fix's core guarantee: shards is a pure parallelism
    knob — range sharding preserves doc_id order, so the two-level
    prefix sum reproduces the exact global running sum for ANY shard
    count, including the degenerate single-shard global window."""
    import random
    rng = random.Random(5)
    docs = [(i * 7 + rng.randrange(3), " ".join(["w"] * rng.randrange(0, 600)))
            for i in range(120)]
    docs = list({d[0]: d for d in docs}.values())  # unique doc_ids
    con = duckdb.connect()
    _docs_view(con, docs)
    results = {}
    for shards in (1, 3, 32, 1000):
        results[shards] = sorted(
            con.sql(webtext._packing_sql("duck", shards)).fetchall())
    assert results[1] == results[3] == results[32] == results[1000]
    # and the S=1 degenerate case IS the naive global cumsum: re-derive
    # in python and compare
    B = webtext.PACK_BUDGET
    start = 0
    expect = []
    for doc_id, text in sorted(docs):
        n = len(text.split()) if text else 0
        spans = 0 if n == 0 else (start + n - 1) // B - start // B + 1
        expect.append((doc_id, n, start // B, start % B, spans))
        start += n
    assert results[1] == sorted(expect)


def test_sequence_packing_spark_plan_and_invariance(spark):
    """Plan pin for the scale shape: the per-doc running-sum window is
    hash-partitioned on shard (never a global sort over documents), and
    the Spark output is identical across shard counts and equal to the
    DuckDB oracle's."""
    df32 = webtext.sequence_packing(spark, SF_DIR, shards=32)
    plan = df32._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(shard" in plan, plan[:2000]
    # the only SinglePartition exchange allowed is the tiny per-shard
    # offsets window (<= shards rows), which sits under the broadcast
    # join side — the document-sized window must be the sharded one
    r32 = sorted(map(tuple, df32.collect()))
    r2 = sorted(map(tuple,
                    webtext.sequence_packing(spark, SF_DIR, shards=2)
                    .collect()))
    assert r32 == r2
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    oracle = sorted(tuple(int(x) for x in r) for r in
                    con.sql(webtext._packing_sql("duck")).fetchall())
    assert r32 == oracle


def test_domain_mixture_hand_layout(spark):
    """Hand-evaluated mixture: two domains with a 3:1 token split under
    a uniform target — shares 750000/250000 ppm, weights DIV-floored
    from (1e6*tot)/(nd*dom). Zero-token domains get weight 0, not a
    division error."""
    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["a b c", "d e f", "g h i", "j k l", ""],
        "lang": ["en"] * 5,
        "source": ["big", "big", "big", "small", "empty"],
        "n_chars": [5, 5, 5, 5, 0],
    })
    import os
    import tempfile
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.mode("overwrite") \
        .parquet(os.path.join(d, "documents.parquet"))
    from docling_api_spark.operators.webtext import domain_mixture
    rows = {r["source"]: r.asDict()
            for r in domain_mixture(spark, d).collect()}
    assert rows["big"]["domain_tokens"] == 9
    assert rows["big"]["token_share_ppm"] == 750000
    # weight = (1e6 * 12) DIV (3 * 9) = 444444
    assert rows["big"]["weight_ppm"] == 444444
    assert rows["small"]["token_share_ppm"] == 250000
    # (1e6 * 12) DIV (3 * 3) = 1333333
    assert rows["small"]["weight_ppm"] == 1333333
    assert rows["empty"]["domain_tokens"] == 0
    assert rows["empty"]["weight_ppm"] == 0


# ------------------------------------------------------- DSIR weights

def _md5_int(s, k=8):
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:k], 16)


def test_dsir_hand_replica():
    """Full pure-Python replication of the DSIR formula (hashed
    unigram+bigram buckets, add-one target/raw models, per-bucket
    ln-micro quantization, exact integer sums) against the DuckDB
    oracle on a literal corpus — proves the SQL computes the intended
    math, not merely the same thing in both engines."""
    import math
    from docling_api_spark.operators.webtext import (
        _DSIR_BUCKETS, _DSIR_TARGET_MOD, _dsir_sql)
    # deterministic source names on both sides of the target predicate
    tgt_src = next(s for s in (f"s{i}" for i in range(100))
                   if _md5_int(s) % _DSIR_TARGET_MOD == 0)
    oth_src = next(s for s in (f"s{i}" for i in range(100))
                   if _md5_int(s) % _DSIR_TARGET_MOD != 0)
    docs = [(1, "alpha beta alpha gamma", tgt_src),
            (2, "alpha beta beta", tgt_src),
            (3, "delta epsilon zeta delta", oth_src),
            (4, "alpha delta", oth_src),
            (5, "", oth_src)]
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}', '{s}')" for i, t, s in docs)
    con.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                f"(VALUES {vals}) v(doc_id, text, source)")
    got = sorted(con.sql(_dsir_sql("duck")).fetchall())

    B = _DSIR_BUCKETS
    feats, raw, tgt = {}, {}, {}
    meta = {}
    for doc_id, text, src in docs:
        toks = [t for t in text.lower().split() if t]
        hs = [_md5_int(t) for t in toks]
        buckets = [h % B for h in hs] + [
            (31 * a + b) % B for a, b in zip(hs, hs[1:])]
        in_t = _md5_int(src) % _DSIR_TARGET_MOD == 0
        meta[doc_id] = (in_t, len(buckets))
        cb = {}
        for b in buckets:
            cb[b] = cb.get(b, 0) + 1
        feats[doc_id] = cb
        for b, c in cb.items():
            raw[b] = raw.get(b, 0) + c
            if in_t:
                tgt[b] = tgt.get(b, 0) + c
    rtot, ttot = sum(raw.values()), sum(tgt.values())
    dln = {b: round(math.log((tgt.get(b, 0) + 1.0) / (ttot + B)) * 1e6)
           - round(math.log((rc + 1.0) / (rtot + B)) * 1e6)
           for b, rc in raw.items()}
    expect = sorted(
        (doc_id, meta[doc_id][0], meta[doc_id][1],
         sum(c * dln[b] for b, c in feats[doc_id].items()),
         sum(c * dln[b] for b, c in feats[doc_id].items()) / 1e6)
        for doc_id, _, _ in docs)
    assert got == expect
    # and zero-token doc 5 survives with zeroed weight, not a dropped row
    assert got[-1] == (5, False, 0, 0, 0.0)


def test_dsir_separates_target_and_plan(spark):
    """On the driver fixture, target-domain docs must score higher on
    average than raw docs (the whole point of importance weighting), and
    the 64-row model join must be a broadcast — the corpus-sized feats
    table never re-shuffles on bucket."""
    from docling_api_spark.operators.webtext import dsir_importance
    df = dsir_importance(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    rows = df.collect()
    t = [r["log_weight"] for r in rows if r["in_target"]]
    o = [r["log_weight"] for r in rows if not r["in_target"]]
    assert t and o
    assert sum(t) / len(t) > sum(o) / len(o)


# ------------------------------------------- exact-substring dedup (r6)

def test_substring_dedup_hand_layout(spark):
    """Hand-evaluated Lee-et-al. semantics at K=8 (SUBSTR_TOKENS):
    a full-doc duplicate is fully scrubbed, a duplicated 8-token
    PREFIX is removed while the unique tail survives, short docs
    (< K tokens) pass through, and a WITHIN-doc repeat of the same
    8-token run keeps only its first occurrence. The DuckDB oracle
    must agree row-for-row."""
    import os
    import tempfile

    import duckdb
    import pandas as pd

    a = " ".join(f"a{i}" for i in range(12))          # 12 tokens
    prefix_tail = " ".join(f"a{i}" for i in range(8)) + " b1 b2 b3 b4"
    d8 = " ".join(f"d{i}" for i in range(8))
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [a, a, prefix_tail, "c1 c2 c3", d8 + " " + d8],
        "lang": ["en"] * 5,
        "source": ["s"] * 5,
        "n_chars": [1] * 5,
    })
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.mode("overwrite") \
        .parquet(os.path.join(d, "documents.parquet"))
    from docling_api_spark.operators.dedup import (
        SUBSTRING_DEDUP_ORACLE, substring_dedup)
    rows = {r["doc_id"]: r.asDict()
            for r in substring_dedup(spark, d).collect()}
    # doc 0: first occurrence — untouched
    assert rows[0] == {"doc_id": 0, "n_tokens": 12, "n_removed": 0,
                       "cleaned_text": a}
    # doc 1: exact duplicate of doc 0 — every window repeats, scrubbed
    assert rows[1]["n_removed"] == 12 and rows[1]["cleaned_text"] == ""
    # doc 2: duplicated 8-token prefix removed, unique tail survives
    assert rows[2]["n_removed"] == 8
    assert rows[2]["cleaned_text"] == "b1 b2 b3 b4"
    # doc 3: shorter than K — no windows, passes through
    assert rows[3] == {"doc_id": 3, "n_tokens": 3, "n_removed": 0,
                       "cleaned_text": "c1 c2 c3"}
    # doc 4: within-doc repeat — second run removed
    assert rows[4]["n_removed"] == 8 and rows[4]["cleaned_text"] == d8
    # oracle parity, value-exact
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{os.path.join(d, 'documents.parquet', '*.parquet')}')")
    oracle = {r[0]: r for r in
              con.execute(SUBSTRING_DEDUP_ORACLE).fetchall()}
    con.close()
    for i in range(5):
        r = rows[i]
        assert oracle[i] == (r["doc_id"], r["n_tokens"], r["n_removed"],
                             r["cleaned_text"]), i
