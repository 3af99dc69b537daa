"""Semantic tests for distributed BPE training (operators/bpe.py) —
parity proves Spark == replica; these prove both equal intended BPE
semantics (greedy non-overlapping merge, deterministic tie-break)."""

from docling_api_spark.operators import bpe


def _replica_words(word_counts, n_merges):
    """The REAL replica loop on an explicit word-count dict (r3 review:
    this was a verbatim copy that could silently diverge)."""
    return bpe.replica_from_counts(word_counts, n_merges)


def test_greedy_fold_non_overlapping(spark):
    # 'aaaa' + EOW with merge (a,a): greedy left-to-right gives
    # (aa)(aa)</w>, never the overlapping (a)(aa)(a)
    row = spark.sql(
        "SELECT " + bpe._merge_expr("a", "a") + " AS merged FROM "
        "(SELECT array('a','a','a','a','</w>') AS syms)"
    ).collect()[0]
    assert row["merged"] == ["aa", "aa", "</w>"]
    # odd run: 'aaa' -> (aa)(a)
    row = spark.sql(
        "SELECT " + bpe._merge_expr("a", "a") + " AS merged FROM "
        "(SELECT array('a','a','a','</w>') AS syms)"
    ).collect()[0]
    assert row["merged"] == ["aa", "a", "</w>"]


def test_tie_break_lexicographic():
    # 'ab' and 'ba' both once: pairs (a,b):1, (b,a):1, (b,</w>):1,
    # (a,</w>):1 — all tied; smallest pair lexicographically is
    # ('a','</w>')? No: '<' (0x3c) sorts before 'a'..'z', so
    # ('a','</w>') < ('a','b'). The merge must pick (a,'</w>').
    merges, _ = _replica_words({"ab": 1, "ba": 1}, 1)
    assert merges[0][1:3] == ("a", "</w>")


def test_merge_progression_collapses_frequent_word():
    # one dominant word: merges should build it up character by character
    merges, words = _replica_words({"spark": 50, "sql": 3}, 6)
    built = {m[3] for m in merges}
    # after 6 merges the whole dominant word incl. EOW is one symbol
    assert "spark</w>" in built
    dominant = next(w for w, _ in
                    [(s, c) for s, c in words if c == 50])
    assert dominant == ["spark</w>"]


def test_spark_matches_replica_on_driver_corpus(spark):
    # end-to-end at sf0.001: the distributed trainer and the engine-free
    # replica must agree row-for-row (the oracle contract)
    sf = "/root/testdata/sf0.001"
    got = [(r["rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
           for r in bpe.bpe_train(spark, sf).collect()]
    assert got == bpe._replica(sf, bpe.N_MERGES)[0]
