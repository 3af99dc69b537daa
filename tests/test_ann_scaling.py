"""Scale-parameterization tests for the ANN/LSH paths (VERDICT r1 item 5):
bucket cardinality must grow with the config, the per-bucket cap must
bound candidates, non-default configs must keep Spark/DuckDB parity, and
the corpus-sizing helpers must produce sane production shapes."""

import duckdb
import pytest

from docling_api_spark.operators import similarity as S
from docling_api_spark.operators.dedup import lsh_params_for

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/embeddings.parquet')")
    yield con


def test_for_corpus_sizing():
    cfg = S.AnnConfig.for_corpus(10**12)
    # 10^12 vectors / 4096 per bucket -> ~2.4e8 buckets -> 28 planes
    assert cfg.n_planes == 28
    assert cfg.n_cells == 10**6          # sqrt(N); under the 2^20 cap
    assert cfg.bucket_cap == 65536
    small = S.AnnConfig.for_corpus(10_000)
    assert small.n_planes < cfg.n_planes
    assert small.n_cells == 100


def test_bucket_cardinality_grows_with_planes(duck):
    counts = {}
    for planes in (2, 4, 6):
        cfg = S.AnnConfig(n_planes=planes)
        expr = S._bucket_expr("duck", "embedding", cfg)
        counts[planes] = duck.sql(
            f"SELECT count(DISTINCT {expr}) FROM embeddings").fetchone()[0]
    assert counts[2] <= counts[4] <= counts[6]
    assert counts[6] > counts[2]  # strictly more buckets at higher planes
    assert counts[2] <= 4 and counts[6] <= 64


def test_bucket_cap_bounds_candidates(duck):
    cfg = S.AnnConfig(n_planes=2, n_probes=1, bucket_cap=3)
    # candidate CTE of the capped plan: no bucket may exceed the cap
    sql = S._ann_sql("duck", cfg)
    rows = duck.sql(
        "WITH " + sql.split("WITH", 1)[1].split("SELECT qid", 1)[0]
        + "SELECT bucket, count(*) AS n FROM c GROUP BY 1").fetchall()
    assert rows and all(n <= 3 for _, n in rows)
    # uncapped for contrast: at 2 planes the 500 vectors exceed 3/bucket
    sql_un = S._ann_sql("duck", S.AnnConfig(n_planes=2, n_probes=1))
    rows_un = duck.sql(
        "WITH " + sql_un.split("WITH", 1)[1].split("SELECT qid", 1)[0]
        + "SELECT bucket, count(*) AS n FROM c GROUP BY 1").fetchall()
    assert max(n for _, n in rows_un) > 3


@pytest.mark.parametrize("cfg", [
    S.AnnConfig(n_planes=3, n_probes=3, bucket_cap=50),
    S.AnnConfig(n_planes=5, n_probes=1, bucket_cap=None),
])
def test_nondefault_config_parity(spark, duck, cfg):
    """The Spark and DuckDB SQL generators stay value-identical at
    non-default configs (the driver gate only exercises the default)."""
    S._view(spark, SF_DIR)
    srows = sorted(tuple(r) for r in
                   spark.sql(S._ann_sql("spark", cfg)).collect())
    drows = sorted(map(tuple, duck.sql(S._ann_sql("duck", cfg)).fetchall()))
    assert srows == drows
    assert len(srows) > 0


def test_default_bucket_cap_finite_and_output_neutral(duck):
    """r2 verdict item 3: the skew backstop must be ON by default, and the
    chosen cap must not change any result at test scale (every oracle row
    byte-identical to the uncapped plan)."""
    assert S.DEFAULT_ANN.bucket_cap is not None
    expr = S._bucket_expr("duck", "embedding", S.DEFAULT_ANN)
    max_bucket = duck.sql(
        f"SELECT max(n) FROM (SELECT {expr} AS b, count(*) AS n "
        f"FROM embeddings GROUP BY 1)").fetchone()[0]
    assert max_bucket < S.DEFAULT_ANN.bucket_cap
    uncapped = S.AnnConfig(bucket_cap=None)
    for gen in (S._ann_sql, S._embedding_dedup_sql):
        capped_rows = duck.sql(gen("duck", S.DEFAULT_ANN)).fetchall()
        uncapped_rows = duck.sql(gen("duck", uncapped)).fetchall()
        assert sorted(map(tuple, capped_rows)) == \
            sorted(map(tuple, uncapped_rows))


def test_multiprobe_recall_at_least_single_probe(spark):
    """Probing Hamming-1 buckets can only widen the candidate set, so
    multi-probe top-k similarity per query is >= single-probe."""
    S._view(spark, SF_DIR)
    one = spark.sql(S._ann_sql(
        "spark", S.AnnConfig(n_planes=4, n_probes=1))).collect()
    multi = spark.sql(S._ann_sql(
        "spark", S.AnnConfig(n_planes=4, n_probes=4))).collect()
    best1 = {r.qid: max(x.cos_sim for x in one if x.qid == r.qid)
             for r in one}
    bestm = {r.qid: max(x.cos_sim for x in multi if x.qid == r.qid)
             for r in multi}
    assert set(best1) <= set(bestm)
    assert all(bestm[q] >= best1[q] for q in best1)


def test_ivf_train_deterministic_across_partitioning(spark):
    """k-means must be bit-identical regardless of partitioning — the
    decimal partial-sum aggregation is what makes a cluster-size change
    not change the model (float sums are not associative)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    c1 = S.ivf_train(emb.repartition(2), k=4, iters=2)
    c2 = S.ivf_train(emb.repartition(7), k=4, iters=2)
    assert c1 == c2
    # training actually moves the centroids off the init vectors
    init = [[float(x) for x in r.embedding]
            for r in emb.orderBy("vec_id").limit(4).collect()]
    assert c1 != init


def test_ivf_train_replica_bit_identical(spark):
    """The engine-free k-means replica (oracle-build path) must reproduce
    the Spark-trained model bit-for-bit — the property that lets the
    driver value-gate ann_ivf_trained (r2 verdict item 2)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert S.ivf_train(emb, k=8, iters=2) == \
        S.ivf_train_replica(SF_DIR, k=8, iters=2)


def test_ann_ivf_trained_oracle_parity(spark, duck):
    """Spark query (trains in Spark) vs DuckDB oracle (trains in the
    replica, centroids inlined as literals): value-identical."""
    srows = sorted(tuple(r) for r in
                   S.ann_ivf_trained(spark, SF_DIR).collect())
    drows = sorted(map(tuple,
                       duck.sql(S.ann_ivf_trained_oracle(SF_DIR)).fetchall()))
    assert srows == drows
    assert len(srows) > 0


def test_lsh_params_for_threshold():
    n_sigs, n_bands = lsh_params_for(0.85)
    r = n_sigs // n_bands
    mid = (1.0 / n_bands) ** (1.0 / r)
    assert n_sigs <= 256 and n_sigs == n_bands * r
    assert abs(mid - 0.85) < 0.02
    # lower threshold -> a lower S-curve midpoint (more permissive index)
    lo_sigs, lo_bands = lsh_params_for(0.4)
    lo_r = lo_sigs // lo_bands
    assert (1.0 / lo_bands) ** (1.0 / lo_r) < mid


def test_ann_recall_report_semantics(spark):
    """recall@k is |ann ∩ exact| / k per query; the composite must agree
    with a hand-computed intersection of the two gated base queries."""
    from docling_api_spark.operators import similarity as S
    sf = "/root/testdata/sf0.001"
    exact = {}
    for r in S.cosine_topk(spark, sf).collect():
        exact.setdefault(r["qid"], set()).add(r["nid"])
    appx = {}
    for r in S.ann_lsh(spark, sf).collect():
        appx.setdefault(r["qid"], set()).add(r["nid"])
    rep = {r["qid"]: r for r in S.ann_recall_report(spark, sf).collect()}
    assert set(rep) == set(exact)
    for qid, ex in exact.items():
        hits = len(ex & appx.get(qid, set()))
        r = rep[qid]
        assert r["k"] == len(ex) and r["n_hit"] == hits
        expect = (2 * 10**4 * hits + len(ex)) // (2 * len(ex)) / 10**4
        assert r["recall_at_k"] == expect
    # the report must register real hits (recall level itself is an
    # AnnConfig trade-off, not a correctness property — at sf0.001 the
    # default 1+Hamming-1 probes reach ~0.2; more probes buy more)
    mean = sum(r["n_hit"] for r in rep.values()) / \
        sum(r["k"] for r in rep.values())
    assert mean > 0


# ------------------------------------------------------------ SemDeDup

def test_semdedup_keep_rule_hand_layout():
    """Hand-evaluated SemDeDup semantics on 2-d vectors: within a
    cluster, the member MORE similar to the centroid is dropped (the
    paper's low-centroid-similarity keep rule); cross-cluster pairs
    are never compared; singletons survive."""
    import duckdb

    from docling_api_spark.operators.similarity import (AnnConfig,
                                                        _semdedup_sql)
    cents = [[1.0, 0.0], [0.0, 1.0]]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
        "(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])"
        ") v(vec_id, embedding)")
    rows = {r[0]: r for r in con.sql(
        _semdedup_sql("duck", cents, AnnConfig(dim=2))).fetchall()}
    assert len(rows) == 3
    # v1 and v2 share cell 1 with cos≈0.994 ≥ τ; cc(v1)=1.0 > cc(v2)
    # → v1 (more central) dropped, v2 kept; v3 alone in cell 2, kept
    assert rows[1][1] == rows[2][1] != rows[3][1]
    assert rows[1][3] is False
    assert rows[2][3] is True
    assert rows[3][3] is True
    # exact duplicates: tie on cc → the HIGHER vec_id is dropped
    con.execute(
        "CREATE OR REPLACE VIEW embeddings AS SELECT * FROM (VALUES "
        "(7, [0.8, 0.2]), (9, [0.8, 0.2])) v(vec_id, embedding)")
    rows = {r[0]: r for r in con.sql(
        _semdedup_sql("duck", cents, AnnConfig(dim=2))).fetchall()}
    assert rows[7][3] is True and rows[9][3] is False


def test_semdedup_plan_is_cell_equi_join(spark):
    """The pairwise pass must be a hash equi-join on the cell key —
    never a cartesian/nested-loop over the corpus (the cluster bound
    is SemDeDup's entire scaling argument)."""
    from docling_api_spark.operators.similarity import semdedup
    df = semdedup(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    assert len(rows) == 500           # one row per embedding (sf0.001)
    assert all(r["kept"] in (True, False) for r in rows)


def test_numpy_pair_stage_bit_identical_to_sql(spark):
    """r7: semdedup / dedup_embedding_cosine moved their within-bucket
    pair stage from a SQL self-join (interpreted HOF fold per pair) to
    the exact-fold numpy kernel in applyInPandas. This pins the
    equivalence: the new implementations must reproduce the ORIGINAL
    SQL formulations row-for-row, value-for-value (the numpy fold is
    the same IEEE op sequence, so equality is exact, not approximate)."""
    from docling_api_spark.operators.similarity import (
        _embedding_dedup_sql, _semdedup_base_sql, _semdedup_sql,
        dedup_embedding_cosine, ivf_train_cached, semdedup, DEFAULT_ANN)

    sf = "/root/testdata/sf0.001"
    spark.read.parquet(f"{sf}/embeddings.parquet") \
        .createOrReplaceTempView("embeddings")

    old = {tuple(r) for r in spark.sql(
        _embedding_dedup_sql("spark", DEFAULT_ANN)).collect()}
    new = {tuple(r) for r in dedup_embedding_cosine(spark, sf).collect()}
    assert new == old

    cents = ivf_train_cached(spark, sf, DEFAULT_ANN.n_cells, 2,
                             DEFAULT_ANN.dim)
    base = spark.sql(_semdedup_base_sql("spark", cents)).localCheckpoint()
    base.createOrReplaceTempView("semdedup_base")
    old_sd = {tuple(r) for r in spark.sql(
        _semdedup_sql("spark", cents, DEFAULT_ANN,
                      base_table="semdedup_base")).collect()}
    new_sd = {tuple(r) for r in semdedup(spark, sf).collect()}
    assert new_sd == old_sd


def test_fold_pair_dots_matches_scalar_fold():
    """The vectorized kernel must equal the scalar left fold exactly
    (bit-for-bit), including the +0.0 seed."""
    import numpy as np
    from docling_api_spark.operators.similarity import _fold_pair_dots

    rng = np.random.default_rng(7)
    A = rng.standard_normal((13, 64)).astype(np.float32).astype(np.float64)
    B = rng.standard_normal((17, 64)).astype(np.float32).astype(np.float64)
    got = _fold_pair_dots(A, B)
    for i in range(A.shape[0]):
        for j in range(B.shape[0]):
            acc = 0.0
            for k in range(64):
                acc = acc + A[i, k] * B[j, k]
            assert got[i, j] == acc
