"""Similarity search: exact kNN vs DuckDB; LSH/IVF recall vs exact baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timefence_spark.operators import similarity

from tests.conftest import assert_df_equals_sql


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_cosine_topk_vs_oracle(spark, oracle, emb):
    out = similarity.cosine_topk(
        emb.where(F.col("vec_id") < 10),
        emb,
        query_id="vec_id",
        corpus_id="vec_id",
        k=5,
        round_to=4,
    )
    sql = """
    WITH pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.embedding, c.embedding) /
                     (SQRT(list_dot_product(q.embedding, q.embedding)) *
                      SQRT(list_dot_product(c.embedding, c.embedding))), 4) AS cosine
        FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 10
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
    """
    assert_df_equals_sql(out, oracle, sql)


def _recall_vs_exact(approx_df, exact_df) -> float:
    approx = {(r.query_id, r.neighbor_id) for r in approx_df.collect()}
    exact = {(r.query_id, r.neighbor_id) for r in exact_df.collect()}
    return len(approx & exact) / len(exact)


def test_rp_lsh_recall(spark, emb):
    queries = emb.where(F.col("vec_id") < 20)
    exact = similarity.cosine_topk(
        queries, emb, query_id="vec_id", corpus_id="vec_id", k=5
    )
    approx = similarity.rp_lsh_topk(
        queries, emb, query_id="vec_id", corpus_id="vec_id", k=5,
        bits=4, tables=16,
    )
    # dim-64 vectors, 500 corpus rows: 16 tables x 16 buckets -> ~0.9 recall
    assert _recall_vs_exact(approx, exact) >= 0.6


def test_ivf_recall(spark, emb):
    queries = emb.where(F.col("vec_id") < 20)
    exact = similarity.cosine_topk(
        queries, emb, query_id="vec_id", corpus_id="vec_id", k=5
    )
    approx = similarity.ivf_topk(
        queries, emb, query_id="vec_id", corpus_id="vec_id", k=5,
        nlist=8, nprobe=4,
    )
    assert _recall_vs_exact(approx, exact) >= 0.4


def test_embedding_near_dup_finds_planted_copies(spark, emb):
    copies = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 50000).alias("vec_id"), "embedding"
    )
    with_dups = emb.unionByName(copies)
    pairs = similarity.embedding_near_dup_pairs(
        with_dups, id_col="vec_id", threshold=0.99, bits=6, tables=8
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # identical vectors share every LSH bucket -> always found, cosine 1.0
    assert all((i, i + 50000) in found for i in range(10))
    for r in pairs:
        if (r.id_a, r.id_b) in {(i, i + 50000) for i in range(10)}:
            assert r.cosine >= 0.999999


def test_rp_lsh_arrow_signatures_match_expr(spark, emb):
    """The numpy/Arrow signature path must produce the same top-k as the
    expression path — same planes, same sign logic, one matmul per batch."""
    from timefence_spark.operators import similarity

    q = emb.where(F.col("vec_id") < 10)
    kwargs = dict(
        query_id="vec_id", corpus_id="vec_id", k=5, bits=4, tables=8, dim=64
    )
    a = similarity.rp_lsh_topk(q, emb, signature_impl="expr", **kwargs)
    b = similarity.rp_lsh_topk(q, emb, signature_impl="arrow", **kwargs)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb


def test_arrow_buckets_match_expr_on_dirty_vectors(spark):
    """NULL and wrong-dimension vectors must not crash the Arrow worker and
    must land in the same bucket (0) the expr path computes for them."""
    from timefence_spark.operators.similarity import (
        _hyperplanes,
        _rp_bucket_expr,
        _rp_buckets_arrow,
    )

    df = spark.createDataFrame(
        [
            (1, [0.5, -0.2, 0.1]),
            (2, None),
            (3, [0.1]),  # too short
            (4, [1.0, 2.0, 3.0, 4.0]),  # too long
            (5, [-1.0, 0.3, 0.9]),
        ],
        "id long, v array<double>",
    )
    arrow = {
        (r.id, r.table_id): r.bucket
        for r in _rp_buckets_arrow(
            df, id_col="id", vec_col="v", out_id="id", dim=3, bits=4, tables=2,
            seed=7,
        ).collect()
    }
    for t in range(2):
        expr = {
            r.id: r.b
            for r in df.select(
                "id", _rp_bucket_expr("v", _hyperplanes(3, 4, 7 + t)).alias("b")
            ).collect()
        }
        for i in (1, 2, 3, 4, 5):
            assert arrow[(i, t)] == expr[i], (i, t)


def test_near_dup_arrow_matches_expr(spark, emb):
    from timefence_spark.operators import similarity

    kwargs = dict(id_col="vec_id", threshold=0.3, bits=4, tables=8, dim=64)
    a = similarity.embedding_near_dup_pairs(emb, signature_impl="expr", **kwargs)
    b = similarity.embedding_near_dup_pairs(emb, signature_impl="arrow", **kwargs)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cosine_topk_arrow_matches_expr(spark, sf_dir):
    """The Arrow matmul kernel must produce the same top-k as the JVM
    expression fold (after the shared 4dp rounding) on the test corpus —
    including per-batch pruning not dropping boundary ties."""
    from timefence_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    import pyspark.sql.functions as F

    q = emb.where(F.col("vec_id") < 20)
    kw = dict(query_id="vec_id", corpus_id="vec_id", k=5, round_to=4)
    expr_rows = sorted(
        tuple(r) for r in cosine_topk(q, emb, compute="expr", **kw).collect()
    )
    arrow_rows = sorted(
        tuple(r) for r in cosine_topk(q, emb.repartition(7), compute="arrow", **kw).collect()
    )
    assert arrow_rows == expr_rows


def test_cosine_topk_arrow_matches_expr_on_degenerate_vectors(spark):
    """Zero-norm, NULL, wrong-width and NaN-element corpus vectors must
    rank identically in both kernels: NaN first, finite desc, NULL last
    (ADVICE r4: the old arrow kernel kept NaN for zero-norm rows, which
    sorted FIRST while the expr fold's NULL sorted last)."""
    from timefence_spark.operators.similarity import cosine_topk

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 0.0]),        # zero-norm -> NULL cosine, ranks last
            (4, None),              # NULL vector -> NULL cosine
            (5, [1.0, 0.0, 0.0]),   # wrong width -> NULL cosine
            (6, [float("nan"), 1.0]),  # NaN elements -> NaN, ranks FIRST
            (7, [0.5, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    kw = dict(query_id="vec_id", corpus_id="vec_id", k=6, round_to=4)

    def norm(rows):
        import math

        return sorted(
            (
                r.query_id,
                r.neighbor_id,
                "nan" if r.cosine is not None and math.isnan(r.cosine) else r.cosine,
                r.rank,
            )
            for r in rows
        )

    expr_rows = norm(cosine_topk(queries, corpus, compute="expr", **kw).collect())
    arrow_rows = norm(
        cosine_topk(queries, corpus.repartition(3), compute="arrow", **kw).collect()
    )
    assert arrow_rows == expr_rows
    # NaN-scored id 6 must rank first; NULL-scored ids 3,4,5 must rank last.
    by_id = {r[1]: r[3] for r in arrow_rows}
    assert by_id[6] == 1
    assert sorted(by_id[i] for i in (3, 4, 5)) == [4, 5, 6]


def test_cosine_topk_arrow_gate_falls_back_to_expr(spark, monkeypatch):
    """An over-threshold query side must degrade to the 'expr' shuffle plan
    (no driver collect, no MapInPandas) and still return the same rows."""
    from timefence_spark.operators import similarity
    from timefence_spark.plans import _executed_plan_str

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.where(F.col("vec_id") < 3)
    kw = dict(query_id="vec_id", corpus_id="vec_id", k=3, round_to=4)
    expected = sorted(
        tuple(r) for r in similarity.cosine_topk(queries, corpus, **kw).collect()
    )
    monkeypatch.setattr(similarity, "BROADCAST_BYTES_THRESHOLD", 1)
    monkeypatch.setattr(similarity, "ARROW_QUERY_ROW_CAP", 1)
    gated = similarity.cosine_topk(queries, corpus, compute="arrow", **kw)
    assert "MapInPandas" not in _executed_plan_str(gated)
    assert sorted(tuple(r) for r in gated.collect()) == expected


def test_rp_lsh_score_arrow_matches_expr(spark, emb):
    """The einsum re-rank kernel must produce the same top-k as the JVM
    fold on the candidate pairs (shared 6dp rounding)."""
    q = emb.where(F.col("vec_id") < 10)
    kwargs = dict(
        query_id="vec_id", corpus_id="vec_id", k=5, bits=4, tables=8, dim=64
    )
    a = similarity.rp_lsh_topk(q, emb, score_impl="expr", **kwargs)
    b = similarity.rp_lsh_topk(q, emb, score_impl="arrow", **kwargs)
    assert sorted(tuple(r) for r in a.collect()) == sorted(
        tuple(r) for r in b.collect()
    )


def test_rp_lsh_single_pass_matches_join_plan(spark, emb):
    """The zero-shuffle single-pass plan (signatures + candidate match +
    scoring per Arrow batch) must reproduce the bucket-join plan exactly —
    same candidate set, same rounded scores, same ranks."""
    q = emb.where(F.col("vec_id") < 10)
    kwargs = dict(
        query_id="vec_id", corpus_id="vec_id", k=5, bits=4, tables=8, dim=64
    )
    joined = similarity.rp_lsh_topk(q, emb, single_pass=False, **kwargs)
    single = similarity.rp_lsh_topk(q, emb.repartition(7), single_pass=True, **kwargs)
    assert sorted(tuple(r) for r in joined.collect()) == sorted(
        tuple(r) for r in single.collect()
    )


def test_ivf_arrow_matches_expr(spark, emb):
    """The matmul centroid-assignment + einsum re-rank must reproduce the
    cross-join + window expr plan exactly on the test corpus."""
    q = emb.where(F.col("vec_id") < 10)
    kwargs = dict(
        query_id="vec_id", corpus_id="vec_id", k=5, nlist=8, nprobe=3,
    )
    a = similarity.ivf_topk(q, emb, compute="expr", **kwargs)
    b = similarity.ivf_topk(q, emb, compute="arrow", **kwargs)
    assert sorted(tuple(r) for r in a.collect()) == sorted(
        tuple(r) for r in b.collect()
    )


def test_pairwise_cosine_arrow_degenerates(spark):
    """The pairwise kernel's degenerate contract: NULL for null/mismatched
    vectors and zero-norm denominators, NaN propagates from NaN elements."""
    import math

    from timefence_spark.operators.similarity import _pairwise_cosine_arrow

    pairs = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [1.0, 0.0]),
            (2, [1.0, 0.0], [0.0, 0.0]),          # zero-norm -> NULL
            (3, [1.0, 0.0], None),                 # null vector -> NULL
            (4, [1.0, 0.0], [1.0, 0.0, 0.0]),      # length mismatch -> NULL
            (5, [1.0, 0.0], [float("nan"), 1.0]),  # NaN element -> NaN
            (6, [3.0, 4.0], [4.0, 3.0]),
        ],
        "pid long, a array<double>, b array<double>",
    )
    rows = {
        r.pid: r.cosine
        for r in _pairwise_cosine_arrow(pairs, a_col="a", b_col="b").collect()
    }
    assert rows[1] == pytest.approx(1.0)
    assert rows[2] is None and rows[3] is None and rows[4] is None
    assert math.isnan(rows[5])
    assert rows[6] == pytest.approx(24.0 / 25.0)


def test_cosine_topk_arrow_handles_bad_vectors(spark):
    """NULL and wrong-width corpus vectors must be ignored, not crash."""
    from timefence_spark.operators.similarity import cosine_topk

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, None),
            (4, [1.0, 0.0, 0.0]),
            (5, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = cosine_topk(
        queries, corpus, query_id="vec_id", corpus_id="vec_id",
        k=2, round_to=4, compute="arrow",
    ).collect()
    got = {(r.neighbor_id, r.rank) for r in rows}
    assert got == {(2, 1), (5, 2)}


def test_ivf_expr_assignment_is_shuffle_free(spark, emb):
    """The expr-kernel centroid assignment must stay a pure projection:
    no Exchange, no Window, no join in its physical plan (regression
    guard for the literal-array rewrite of the old cross-join plan)."""
    from pyspark.sql import Window as W

    from timefence_spark.operators.similarity import _ivf_assign_expr_factory

    sampled = (
        emb.limit(4)
        .withColumn(
            "centroid_id", F.row_number().over(W.orderBy("vec_id")) - 1
        )
        .select("centroid_id", F.col("embedding").alias("centroid"))
    )
    assign = _ivf_assign_expr_factory(sampled)
    out = assign(
        emb.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__cv")
        ),
        "neighbor_id", "__cv", 1,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_ivf_expr_assignment_ranking_semantics(spark):
    """Degenerate vectors under the literal-array assignment keep the old
    window-plan order: NULL cosine ranks last, NaN first, ties break
    toward the smaller centroid id."""
    from pyspark.sql import Window as W

    from timefence_spark.operators.similarity import _ivf_assign_expr_factory

    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "centroid_id int, centroid array<double>",
    )
    assign = _ivf_assign_expr_factory(cent)
    rows = spark.createDataFrame(
        [
            (1, [2.0, 0.0]),        # ties centroids 0 and 1 -> picks 0
            (2, [0.0, 3.0]),        # nearest centroid 2
            (3, None),              # NULL vector: all NULL -> id order -> 0
            (4, [0.0, 0.0]),        # zero norm: all NULL -> 0
            (5, [float("nan"), 1.0]),  # NaN scores rank first -> 0
        ],
        "id long, v array<double>",
    )
    out = {r["id"]: r["centroid_id"] for r in assign(rows, "id", "v", 1).collect()}
    assert out == {1: 0, 2: 2, 3: 0, 4: 0, 5: 0}
    # top-2 probes on the tie row: (0, 1) in id order
    probes = assign(rows.where(F.col("id") == 1), "id", "v", 2).collect()
    assert [r["centroid_id"] for r in probes] == [0, 1]


def test_ivf_expr_assignment_degenerate_centroids(spark):
    """Centroids containing NaN elements or NULL vectors must not crash
    the literal-array plan (repr() would emit invalid `nanD` tokens /
    float(None) raises) and must keep the cross-join ordering semantics:
    a NaN-scoring centroid ranks FIRST, a NULL-scoring one LAST."""
    from timefence_spark.operators.similarity import _ivf_assign_expr_factory

    cent = spark.createDataFrame(
        [
            (0, [float("nan"), 1.0]),   # NaN dot -> NaN score, ranks first
            (1, [1.0, 0.0]),
            (2, None),                  # NULL centroid -> NULL score, last
        ],
        "centroid_id int, centroid array<double>",
    )
    assign = _ivf_assign_expr_factory(cent)
    rows = spark.createDataFrame([(1, [3.0, 4.0])], "id long, v array<double>")
    top = assign(rows, "id", "v", 1).collect()
    assert [r["centroid_id"] for r in top] == [0]      # NaN first
    probes = assign(rows, "id", "v", 3).collect()
    assert [r["centroid_id"] for r in probes] == [0, 1, 2]


def test_ivf_index_build_search_matches_direct(spark, tmp_path, sf_dir):
    """Persisted IVF index: ivf_search against ivf_build_index output
    must equal ivf_topk on the same parameters, and the search must
    actually PRUNE the partitioned corpus (reads nprobe'd partitions,
    not all nlist)."""
    from timefence_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") % 5 != 0)
    queries = emb.where(F.col("vec_id") % 5 == 0).limit(8)
    params = dict(nlist=8, seed=42, hash_fn="xxhash64")
    direct = sim.ivf_topk(
        queries, corpus, query_id="vec_id", corpus_id="vec_id",
        k=5, nprobe=2, **params,
    )
    idx = str(tmp_path / "ivf_idx")
    sim.ivf_build_index(
        corpus, corpus_id="vec_id", path=idx, **params
    )
    searched = sim.ivf_search(
        spark, idx, queries, query_id="vec_id", k=5, nprobe=2
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    got = sorted(map(lambda r: tuple(r), searched.collect()), key=lambda t: (t[0], t[3]))
    want = sorted(map(lambda r: tuple(r), direct.collect()), key=lambda t: (t[0], t[3]))
    assert got == want and len(got) > 0

    # partition pruning: the searched plan's corpus scan must carry a
    # centroid_id partition filter (pushed to the directory listing)
    import os

    parts = [d for d in os.listdir(f"{idx}/corpus") if d.startswith("centroid_id=")]
    assert len(parts) == 8
    plan = searched._jdf.queryExecution().executedPlan().toString()
    assert "centroid_id" in plan and "PartitionFilters: [" in plan

    # single assignment stage per search: query_probes is pin()-ed, so
    # the candidate join reads the materialized probe blocks (an
    # ExistingRDD scan) instead of re-running the centroid-assignment
    # projection over the raw query parquet a second time
    assert "ExistingRDD" in plan
    assert "embeddings.parquet" not in plan


def test_semantic_dedup_planted_duplicates(spark, sf_dir):
    """SemDeDup pipeline on planted duplicates: an identical copy of a
    vector must pair with cosine 1.0 inside its cluster, the dedup
    policy must drop the larger id, and the expr/arrow kernels must
    produce the same pair set."""
    from timefence_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    copies = emb.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    planted = emb.unionByName(copies)
    kw = dict(id_col="vec_id", n_clusters=8, threshold=0.95)
    pairs = sim.semantic_dup_pairs(planted, **kw).collect()
    found = {(r["id_a"], r["id_b"]): r["cosine"] for r in pairs}
    for i in range(5):
        assert found.get((i, i + 100000)) == pytest.approx(1.0, abs=1e-6), i
    # identical vectors always share a cluster (assignment is a pure
    # function of the vector), so recall on exact copies is 1.0
    survivors = {
        r["vec_id"]
        for r in sim.semantic_dedup(planted, **kw).select("vec_id").collect()
    }
    assert all(i in survivors for i in range(5))
    assert not any(i + 100000 in survivors for i in range(5))

    arrow_pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in sim.semantic_dup_pairs(planted, compute="arrow", **kw).collect()
    }
    assert arrow_pairs == found

    # hot-cluster cap: capping below the planted cluster sizes must not
    # error, and every surviving pair still meets the threshold
    capped = sim.semantic_dup_pairs(planted, max_cluster_size=10, **kw).collect()
    assert all(r["cosine"] >= 0.95 for r in capped)
    with pytest.raises(ValueError, match="n_clusters"):
        sim.semantic_dup_pairs(planted, id_col="vec_id", n_clusters=0)
    with pytest.raises(ValueError, match="max_cluster_size"):
        sim.semantic_dup_pairs(planted, id_col="vec_id", max_cluster_size=1)


def test_assign_factory_gates_literal_budget(spark, emb, monkeypatch):
    """compute='expr' past the nlist*dim literal budget must fall back to
    the Arrow kernel (broadcast centroid matrix) with a warning, and the
    fallback's assignment must agree with the expr kernel on clean data."""
    from pyspark.sql import Window as W

    sampled = (
        emb.limit(4)
        .withColumn("centroid_id", F.row_number().over(W.orderBy("vec_id")) - 1)
        .select("centroid_id", F.col("embedding").alias("centroid"))
    )
    rows = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__cv")
    ).limit(50)

    expr_assign = similarity._ivf_assign_factory(
        sampled, compute="expr", nlist=4
    )
    expected = {
        r["neighbor_id"]: r["centroid_id"]
        for r in expr_assign(rows, "neighbor_id", "__cv", 1).collect()
    }

    # 4 centroids x 64 dims = 256 literals > budget of 8 -> arrow fallback
    monkeypatch.setattr(similarity, "_ASSIGN_EXPR_MAX_LITERALS", 8)
    with pytest.warns(UserWarning, match="literal budget"):
        gated = similarity._ivf_assign_factory(sampled, compute="expr", nlist=4)
    out = gated(rows, "neighbor_id", "__cv", 1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    got = {r["neighbor_id"]: r["centroid_id"] for r in out.collect()}
    assert got == expected

    # nlist alone past the budget: gate fires WITHOUT collecting centroids
    with pytest.warns(UserWarning, match="literal budget"):
        gated2 = similarity._ivf_assign_factory(
            sampled, compute="expr", nlist=100
        )
    got2 = {
        r["neighbor_id"]: r["centroid_id"]
        for r in gated2(rows, "neighbor_id", "__cv", 1).collect()
    }
    assert got2 == expected

    # nlist=None (ivf_search reading persisted centroids): the capped
    # collect detects an overfull table and falls back the same way
    monkeypatch.setattr(similarity, "_ASSIGN_EXPR_MAX_LITERALS", 3)
    with pytest.warns(UserWarning, match="literal budget"):
        gated3 = similarity._ivf_assign_factory(
            sampled, compute="expr", nlist=None
        )
    got3 = {
        r["neighbor_id"]: r["centroid_id"]
        for r in gated3(rows, "neighbor_id", "__cv", 1).collect()
    }
    assert got3 == expected


@pytest.mark.slow
def test_assign_factory_semdedup_scale_plan_builds(spark):
    """The SemDeDup-cited configuration (50K clusters x 768 dims) must
    build an assignment plan: the expr kernel would need a ~400 MB SQL
    string, so the factory must route to the Arrow kernel, collect the
    centroid matrix columnar-side (toArrow), and ship it via sc.broadcast
    — the plan is built and schema-checked without executing assignment."""
    n, d = 50_000, 768
    sampled = spark.range(n).select(
        F.col("id").cast("int").alias("centroid_id"),
        F.expr(
            f"transform(sequence(1, {d}), "
            "i -> cast(pmod(hash(id, i), 997) as double) / 997.0)"
        ).alias("centroid"),
    )
    with pytest.warns(UserWarning, match="literal budget"):
        assign = similarity._ivf_assign_factory(sampled, compute="expr", nlist=n)
    queries = spark.range(10).select(
        F.col("id").alias("qid"),
        F.expr(
            f"transform(sequence(1, {d}), i -> cast(i as double))"
        ).alias("vec"),
    )
    out = assign(queries, "qid", "vec", 1)
    assert [f.name for f in out.schema.fields] == ["qid", "vec", "centroid_id"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_semantic_dup_pairs_grouped_matches_expr(spark, emb):
    """compute='grouped' must produce the same pair set as the expr
    kernel (same expr assignment; per-cluster matmul scoring), with ONE
    cluster-keyed shuffle and no self-join in the plan."""
    import timefence_spark.operators.similarity as sim

    copies = emb.limit(5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    planted = emb.unionByName(copies)
    kw = dict(id_col="vec_id", n_clusters=8, threshold=0.9)
    expr_pairs = {
        (r["id_a"], r["id_b"], r["cluster_id"]): r["cosine"]
        for r in sim.semantic_dup_pairs(planted, **kw).collect()
    }
    grouped = sim.semantic_dup_pairs(planted, compute="grouped", **kw)
    grouped_pairs = {
        (r["id_a"], r["id_b"], r["cluster_id"]): r["cosine"]
        for r in grouped.collect()
    }
    assert set(grouped_pairs) == set(expr_pairs)
    for k, v in grouped_pairs.items():
        assert v == pytest.approx(expr_pairs[k], abs=1e-6), k

    # AQE prints Final + Initial plans; count only the final one
    plan = grouped._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan  # no pair-materializing self-join
    # exactly one exchange: the cluster-keyed groupBy
    assert plan.count("Exchange hashpartitioning") == 1

    # degenerate vectors never pair (same observable as NULL-scored expr)
    dirty = spark.createDataFrame(
        [
            (1, [1.0, 0.0]), (2, [1.0, 0.0]),
            (3, None), (4, [0.0, 0.0]), (5, [1.0]),
            (6, [float("nan"), 1.0]), (7, [float("nan"), 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = sim.semantic_dup_pairs(
        dirty, id_col="vec_id", n_clusters=1, threshold=0.5, compute="grouped"
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == {(1, 2)}

    with pytest.raises(ValueError, match="compute"):
        sim.semantic_dup_pairs(dirty, id_col="vec_id", compute="bogus")


def test_refine_centroids_one_lloyd_iteration_exact(spark):
    """refine_iters=1 must move each centroid to the numpy mean of the
    vectors its initial version attracted (cosine argmax, ties to the
    smaller centroid id), and an empty cluster keeps its old centroid."""
    import numpy as np

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.1, 0.9, 0.0]),
        (5, [0.0, 0.8, 0.1]),
        (6, [0.5, 0.5, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    init = {
        r["centroid_id"]: np.array(r["centroid"])
        for r in similarity._ivf_centroids(
            df, corpus_id="vec_id", corpus_vec="embedding", nlist=2,
            seed=42, hash_fn="xxhash64",
        ).collect()
    }
    # brute-force the assignment the expr kernel performs
    members: dict[int, list] = {0: [], 1: []}
    for _, v in rows:
        v = np.array(v)
        scores = [
            float(v @ init[c] / (np.linalg.norm(v) * np.linalg.norm(init[c])))
            for c in (0, 1)
        ]
        best = 0 if scores[0] >= scores[1] else 1  # tie -> smaller id
        members[best].append(v)
    refined = {
        r["centroid_id"]: np.array(r["centroid"])
        for r in similarity._ivf_centroids(
            df, corpus_id="vec_id", corpus_vec="embedding", nlist=2,
            seed=42, hash_fn="xxhash64", refine_iters=1,
        ).collect()
    }
    for c in (0, 1):
        want = np.mean(members[c], axis=0) if members[c] else init[c]
        assert np.allclose(refined[c], want, atol=1e-12), (c, refined[c], want)

    # all-identical corpus: every row ties to centroid 0, centroid 1
    # keeps its previous (identical) vector rather than vanishing
    same = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    ref2 = {
        r["centroid_id"]: list(r["centroid"])
        for r in similarity._ivf_centroids(
            same, corpus_id="vec_id", corpus_vec="embedding", nlist=2,
            seed=42, hash_fn="xxhash64", refine_iters=2,
        ).collect()
    }
    assert set(ref2) == {0, 1}
    assert ref2[0] == [1.0, 2.0] and ref2[1] == [1.0, 2.0]


def test_pq_train_encode_shapes(spark):
    """Codebook is m x 2^nbits sub-centroids of dim/m doubles; encoding
    maps NULL vectors to NULL codes, every code is in range, and a
    vector sitting exactly on a sub-centroid encodes to that code in
    every subspace. Validation rejects bad m/nbits/dim splits."""
    import pytest as _pytest

    from timefence_spark.operators import similarity as sim

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5) for j in range(16)]) for i in range(64)]
        + [(99, None)],
        "vec_id long, embedding array<float>",
    )
    book = sim.pq_train(emb, corpus_id="vec_id", m=4, nbits=2, hash_fn="md5")
    rows = book.collect()
    assert len(rows) == 4 * 4
    assert {(r["sub"], r["code"]) for r in rows} == {
        (s, c) for s in range(4) for c in range(4)
    }
    # NULL/ragged vectors never become sub-centroids (the id-99 NULL row
    # is in the training corpus): every centroid is a valid subvector.
    assert all(r["centroid"] is not None and len(r["centroid"]) == 4 for r in rows)

    codes = {
        r["vec_id"]: r["codes"]
        for r in sim.pq_encode(
            emb, corpus_id="vec_id", codebook=book
        ).collect()
    }
    assert codes[99] is None
    assert all(
        c is not None and len(c) == 4 and all(0 <= x < 4 for x in c)
        for vid, c in codes.items() if vid != 99
    )
    # a row whose vector IS a codebook row round-trips to its own codes
    by_sub = {}
    for r in rows:
        by_sub.setdefault(r["sub"], {})[r["code"]] = list(r["centroid"])
    probe_vec = sum((by_sub[s][1] for s in range(4)), [])
    probe = spark.createDataFrame(
        [(1000, probe_vec)], "vec_id long, embedding array<double>"
    )
    enc = sim.pq_encode(probe, corpus_id="vec_id", codebook=book).head()
    # the encoded code's centroid must sit at distance 0 from the probe
    # subvector (duplicate sub-centroids tie toward the smaller code, so
    # code identity is not guaranteed — zero distance is).
    for s, code in enumerate(enc["codes"]):
        got = by_sub[s][code]
        want = probe_vec[s * 4:(s + 1) * 4]
        assert got == want

    with _pytest.raises(ValueError, match="divisible"):
        sim.pq_train(emb, corpus_id="vec_id", m=3)
    with _pytest.raises(ValueError, match="nbits"):
        sim.pq_train(emb, corpus_id="vec_id", m=4, nbits=0)
    # literal-budget gate: a codebook past the expr budget falls back to
    # the join kernel with a warning instead of building an unparseable
    # SQL string (bit-identical output — test_pq_join_kernel_is_bit_
    # identical covers the equivalence and the warning text).
    big = spark.createDataFrame(
        [(s, c, [0.0] * 64) for s in range(16) for c in range(16)],
        "sub int, code int, centroid array<double>",
    )
    with _pytest.warns(UserWarning, match="literal"):
        sim.pq_encode(emb.limit(0), corpus_id="vec_id", codebook=big)


def test_pq_topk_approximates_and_reranks(spark, sf_dir):
    """ADC top-k over the real embeddings table: approximate neighbors
    overlap the exact brute-force set (recall sanity on clustered
    synthetic data), and the rerank path returns EXACT cosine values
    identical to cosine_topk on the same pairs."""
    from timefence_spark.operators import similarity as sim
    from timefence_spark.sources.readers import read_parquet

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.where(F.col("vec_id") < 10)
    book = sim.pq_train(
        emb, corpus_id="vec_id", m=8, nbits=4, hash_fn="md5", refine_iters=1
    )
    codes = sim.pq_encode(emb, corpus_id="vec_id", codebook=book)
    approx = sim.pq_topk(
        queries, codes, book, query_id="vec_id", encoded_id="vec_id", k=10
    )
    exact = sim.cosine_topk(
        queries, emb, query_id="vec_id", corpus_id="vec_id", k=10
    )
    a = {}
    for r in approx.collect():
        a.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    e = {}
    for r in exact.collect():
        e.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(a[q] & e[q]) / len(e[q]) for q in e]
    # 4-bit ADC on near-uniform synthetic vectors is a weak quantizer;
    # the bar is "far above chance" (random recall@10 of 500 ~ 0.02),
    # and the rerank path below is where exactness comes back.
    assert sum(recalls) / len(recalls) > 0.15

    rer = sim.pq_topk(
        queries, codes, book, query_id="vec_id", encoded_id="vec_id", k=5,
        rerank=emb, rerank_id="vec_id", rerank_factor=8,
    )
    got = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in rer.collect()}
    truth = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in sim.cosine_topk(
            queries, emb, query_id="vec_id", corpus_id="vec_id", k=40
        ).collect()
    }
    assert got  # non-empty
    for pair, cos in got.items():
        assert truth.get(pair) == cos  # exact re-scored values


def test_pq_join_kernel_is_bit_identical(spark, sf_dir):
    """compute='join' (one-row broadcast codebook, no literal budget)
    must produce EXACTLY the expr kernel's codes and scores — same
    sequential folds, same tie-breaks; and the expr kernel falls back to
    it (with a warning) past the literal budget instead of refusing."""
    import warnings as _warnings

    from timefence_spark.operators import similarity as sim
    from timefence_spark.sources.readers import read_parquet

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    book = sim.pq_train(emb, corpus_id="vec_id", m=8, nbits=4, hash_fn="md5")
    enc_expr = {
        r["vec_id"]: list(r["codes"])
        for r in sim.pq_encode(
            emb, corpus_id="vec_id", codebook=book, compute="expr"
        ).collect()
    }
    enc_join = {
        r["vec_id"]: list(r["codes"])
        for r in sim.pq_encode(
            emb, corpus_id="vec_id", codebook=book, compute="join"
        ).collect()
    }
    assert enc_expr == enc_join

    codes = sim.pq_encode(emb, corpus_id="vec_id", codebook=book)
    q = emb.where(F.col("vec_id") < 5)
    t_expr = {
        (r["query_id"], r["neighbor_id"]): (r["cosine"], r["rank"])
        for r in sim.pq_topk(
            q, codes, book, query_id="vec_id", encoded_id="vec_id", k=5,
            round_to=None, compute="expr",
        ).collect()
    }
    t_join = {
        (r["query_id"], r["neighbor_id"]): (r["cosine"], r["rank"])
        for r in sim.pq_topk(
            q, codes, book, query_id="vec_id", encoded_id="vec_id", k=5,
            round_to=None, compute="join",
        ).collect()
    }
    assert t_expr == t_join  # unrounded doubles: bit-identical

    # past the budget, expr warns and falls back instead of refusing
    big = spark.createDataFrame(
        [(s, c, [float(s + c)] * 64) for s in range(16) for c in range(16)],
        "sub int, code int, centroid array<double>",
    )
    wide = spark.createDataFrame(
        [(1, [1.0] * 1024)], "vec_id long, embedding array<double>"
    )
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        out = sim.pq_encode(
            wide, corpus_id="vec_id", codebook=big, compute="expr"
        ).collect()
    assert any("join" in str(x.message) for x in w)
    assert len(out) == 1 and len(out[0]["codes"]) == 16


@pytest.mark.slow
def test_ivf_pq_recall_and_rerank(spark, sf_dir):
    """IVF-PQ: candidates pruned to probed lists, ADC-scored; recall
    overlaps the exact neighbors well above chance, and rerank=True
    returns exact cosine values present in the brute-force ranking."""
    from timefence_spark.operators import similarity as sim
    from timefence_spark.sources.readers import read_parquet

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = emb.where(F.col("vec_id") < 10)
    exact = sim.cosine_topk(
        q, emb, query_id="vec_id", corpus_id="vec_id", k=5
    )
    # all lists probed -> coarse stage is lossless, recall isolates ADC
    # (refine_iters=1: Lloyd-polished codebooks, same as the PQ test).
    # residual=False: these embeddings are near-uniform, so raw encoding
    # is the right geometry here — residual recall on CLUSTERED data is
    # pinned by test_ivf_pq_residual_recall_beats_raw_at_nbits4.
    approx = sim.ivf_pq_topk(
        q, emb, query_id="vec_id", corpus_id="vec_id", k=5,
        nlist=8, nprobe=8, m=8, nbits=4, refine_iters=1, residual=False,
    )
    a, e = {}, {}
    for r in approx.collect():
        a.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in exact.collect():
        e.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = sum(len(a.get(qid, set()) & e[qid]) for qid in e) / sum(
        len(v) for v in e.values()
    )
    assert recall > 0.15  # 4-bit ADC on near-uniform data; chance ~0.01
    # fewer probes -> strictly pruned candidate pool: the nprobe=1
    # neighbor set per query comes from one list only, so across queries
    # it draws from fewer distinct corpus rows than probing every list
    narrow = sim.ivf_pq_topk(
        q, emb, query_id="vec_id", corpus_id="vec_id", k=5,
        nlist=8, nprobe=1, m=8, nbits=4, residual=False,
    )
    wide_n = {r["neighbor_id"] for r in approx.collect()}
    narrow_n = {r["neighbor_id"] for r in narrow.collect()}
    assert len(narrow_n) <= len(wide_n)

    rer = sim.ivf_pq_topk(
        q, emb, query_id="vec_id", corpus_id="vec_id", k=3,
        nlist=8, nprobe=8, m=8, nbits=4, rerank=True, rerank_factor=8,
    )
    truth = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in sim.cosine_topk(
            q, emb, query_id="vec_id", corpus_id="vec_id", k=499
        ).collect()
    }
    rows = rer.collect()
    assert rows
    for r in rows:
        assert truth[(r["query_id"], r["neighbor_id"])] == r["cosine"]


@pytest.mark.slow
def test_ivf_pq_index_matches_inline_and_prunes(spark, sf_dir, tmp_path):
    """The persisted IVF-PQ index returns exactly what the inline
    ivf_pq_topk computes for the same parameters, the scan it performs
    reads only the probed centroid partitions, and the stored rows are
    codes (no vector column)."""
    from timefence_spark.operators import similarity as sim
    from timefence_spark.sources.readers import read_parquet

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = emb.where(F.col("vec_id") < 8)
    path = str(tmp_path / "ivfpq_idx")
    sim.ivf_pq_build_index(
        emb, corpus_id="vec_id", nlist=8, m=8, nbits=4, hash_fn="md5",
        path=path,
    )
    via_index = sim.ivf_pq_search(
        spark, path, q, query_id="vec_id", k=5, nprobe=3,
    )
    inline = sim.ivf_pq_topk(
        q, emb, query_id="vec_id", corpus_id="vec_id", k=5,
        nlist=8, nprobe=3, m=8, nbits=4, hash_fn="md5",
    )
    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, inline.collect())
    )
    # stored index carries codes only — no float vectors on disk
    stored = spark.read.parquet(f"{path}/codes")
    assert set(stored.columns) == {"neighbor_id", "codes", "centroid_id"}
    # partition pruning: the searched plan's codes scan carries a
    # centroid_id partition filter (pushed to the directory listing),
    # same assertion the IVF-flat index test pins
    plan = via_index._jdf.queryExecution().executedPlan().toString()
    assert "centroid_id" in plan and "PartitionFilters: [" in plan

    # rerank through the index returns exact cosines
    rer = sim.ivf_pq_search(
        spark, path, q, query_id="vec_id", k=3, nprobe=8,
        rerank=emb, rerank_id="vec_id", rerank_factor=8,
    )
    truth = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in sim.cosine_topk(
            q, emb, query_id="vec_id", corpus_id="vec_id", k=499
        ).collect()
    }
    for r in rer.collect():
        assert truth[(r["query_id"], r["neighbor_id"])] == r["cosine"]


def test_pq_encode_rejects_corrupt_vectors(spark):
    """Element-level NULLs and wrong widths get NULL codes in BOTH
    kernels (code-review r8 finding: they used to argmin to code 0 and
    surface as fake top-k neighbors), and compute is validated."""
    import pytest as _pytest

    from timefence_spark.operators import similarity as sim

    clean = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    book = sim.pq_train(clean, corpus_id="vec_id", m=2, nbits=2, hash_fn="md5")
    dirty = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0]),
            (2, [1.0, None, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0]),  # NULL element
            (3, [1.0, 2.0]),                                  # wrong width
            (4, None),                                        # NULL vector
        ],
        "vec_id long, embedding array<double>",
    )
    for mode in ("expr", "join"):
        got = {
            r["vec_id"]: r["codes"]
            for r in sim.pq_encode(
                dirty, corpus_id="vec_id", codebook=book, compute=mode
            ).collect()
        }
        assert got[1] is not None
        assert got[2] is None, mode
        assert got[3] is None, mode
        assert got[4] is None, mode
    with _pytest.raises(ValueError, match="compute"):
        sim.pq_topk(
            clean.limit(1),
            sim.pq_encode(clean, corpus_id="vec_id", codebook=book),
            book, query_id="vec_id", encoded_id="vec_id", compute="arrow",
        )
    empty = spark.createDataFrame([], "sub int, code int, centroid array<double>")
    with _pytest.raises(ValueError, match="empty codebook"):
        sim.pq_encode(dirty, corpus_id="vec_id", codebook=empty, compute="join")


# ---------------------------------------------------------------------------
# Recall@k guarantees on clustered vectors (VERDICT r8 item 3): the oracle
# sweep proves each approximate family is DETERMINISTIC, but nothing above
# asserts the approximations are GOOD. These tests pin recall@10 vs exact
# cosine_topk on synthetic clustered data — 40 well-separated unit centers
# (random dim-32 directions: cross-cluster cosine ~N(0, 1/32), within-
# cluster ~0.999 at noise 0.05), 11 points each, one query per cluster, so
# the exact top-10 is "the query's own cluster" and an ANN family earns its
# recall by recovering cluster structure, not by luck. Thresholds leave
# margin under the measured floors (3-seed sweep: ivf nprobe=4 >= 0.983,
# pq = 1.0, ivf_pq >= 0.983, rp_lsh >= 0.955); documented in
# docs/concepts/scale.md.
# ---------------------------------------------------------------------------


def _clustered_vectors(spark, seed, n_clusters=40, per_cluster=11, dim=32,
                       noise=0.05):
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + noise * rng.randn(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _recall_at_k(approx_df, exact: dict[int, set]) -> float:
    got: dict[int, set] = {}
    for r in approx_df.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    return sum(len(got.get(q, set()) & e) for q, e in exact.items()) / sum(
        len(e) for e in exact.values()
    )


@pytest.mark.parametrize(
    "seed", [0, pytest.param(1, marks=pytest.mark.slow),
             pytest.param(2, marks=pytest.mark.slow)]
)
@pytest.mark.slow
def test_ann_recall_at_10_on_clustered_vectors(spark, seed):
    corpus = _clustered_vectors(spark, seed).cache()
    queries = corpus.where(F.col("vec_id") % 11 == 0)  # one per cluster
    exact: dict[int, set] = {}
    for r in similarity.cosine_topk(
        queries, corpus, query_id="vec_id", corpus_id="vec_id", k=10
    ).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert all(len(e) == 10 for e in exact.values())

    # IVF: recall must rise with nprobe and clear 0.9 from nprobe=4 on.
    ivf_recalls = []
    for nprobe in (1, 2, 4, 8):
        ivf_recalls.append(
            _recall_at_k(
                similarity.ivf_topk(
                    queries, corpus, query_id="vec_id", corpus_id="vec_id",
                    k=10, nlist=16, nprobe=nprobe, seed=42,
                ),
                exact,
            )
        )
    for lo, hi in zip(ivf_recalls, ivf_recalls[1:]):
        assert hi >= lo - 0.02, f"ivf recall not monotone: {ivf_recalls}"
    assert ivf_recalls[2] >= 0.9, f"ivf nprobe=4 recall {ivf_recalls[2]}"
    assert ivf_recalls[3] >= 0.95, f"ivf nprobe=8 recall {ivf_recalls[3]}"

    # PQ (raw ADC, no rerank): 8x4-bit codes must preserve cluster
    # structure outright on separated clusters.
    book = similarity.pq_train(corpus, corpus_id="vec_id", m=8, nbits=4,
                               seed=143)
    enc = similarity.pq_encode(corpus, corpus_id="vec_id", codebook=book)
    pq_recall = _recall_at_k(
        similarity.pq_topk(queries, enc, book, query_id="vec_id", k=10),
        exact,
    )
    assert pq_recall >= 0.9, f"pq recall {pq_recall}"

    # IVF-PQ composition: coarse pruning + ADC still >= 0.9.
    ivfpq_recall = _recall_at_k(
        similarity.ivf_pq_topk(
            queries, corpus, query_id="vec_id", corpus_id="vec_id", k=10,
            nlist=16, nprobe=4, m=8, nbits=4,
        ),
        exact,
    )
    assert ivfpq_recall >= 0.9, f"ivf_pq recall {ivfpq_recall}"

    # RP-LSH at the bits/tables shape scale.md documents.
    lsh_recall = _recall_at_k(
        similarity.rp_lsh_topk(
            queries, corpus, query_id="vec_id", corpus_id="vec_id", k=10,
            bits=8, tables=8, dim=32, seed=7,
        ),
        exact,
    )
    assert lsh_recall >= 0.9, f"rp_lsh recall {lsh_recall}"

    # SQ8: 256 levels per dimension is near-lossless — the highest bar.
    sq_bounds = similarity.sq_train(corpus, corpus_id="vec_id")
    sq_enc = similarity.sq_encode(
        corpus, corpus_id="vec_id", bounds=sq_bounds
    )
    sq_recall = _recall_at_k(
        similarity.sq_topk(
            queries, sq_enc, sq_bounds, query_id="vec_id", k=10
        ),
        exact,
    )
    assert sq_recall >= 0.95, f"sq recall {sq_recall}"

    # BQ: 1 bit/dim (32 bits here). Raw Hamming must recover most of
    # the cluster (ties at equal distance cost a little); with an exact
    # rerank over 4x candidates the shortlist misses almost nothing.
    bq_thr = similarity.bq_train(corpus, corpus_id="vec_id")
    bq_enc = similarity.bq_encode(
        corpus, corpus_id="vec_id", thresholds=bq_thr
    )
    bq_recall = _recall_at_k(
        similarity.bq_topk(
            queries, bq_enc, bq_thr, query_id="vec_id", k=10
        ),
        exact,
    )
    assert bq_recall >= 0.85, f"bq recall {bq_recall}"
    bq_rr = _recall_at_k(
        similarity.bq_topk(
            queries, bq_enc, bq_thr, query_id="vec_id", k=10,
            rerank=corpus, rerank_id="vec_id",
        ),
        exact,
    )
    assert bq_rr >= 0.95, f"bq rerank recall {bq_rr}"
    corpus.unpersist()


def test_sq_encode_guards_and_rerank(spark):
    """SQ: corrupt vectors get NULL codes/rnorm (mirroring pq_encode);
    constant dimensions quantize to code 0 without dividing by zero;
    rerank returns exact cosines."""
    import pytest as _pytest

    rows = [
        (1, [0.0, 1.0, 5.0]),
        (2, [1.0, 1.0, 0.0]),
        (3, None),
        (4, [0.5, None, 2.0]),
        (5, [0.5, 1.0]),  # wrong width
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    clean = df.where("vec_id <= 2")
    bounds = similarity.sq_train(df, corpus_id="vec_id")
    b = {r["pos"]: (r["lo"], r["hi"]) for r in bounds.collect()}
    assert b[1] == (1.0, 1.0)  # constant dim 2 (0-based pos; valid rows)
    enc = {r["vec_id"]: r for r in similarity.sq_encode(
        df, corpus_id="vec_id", bounds=bounds
    ).collect()}
    assert enc[3]["codes"] is None and enc[4]["codes"] is None
    assert enc[5]["codes"] is None and enc[5]["rnorm"] is None
    assert enc[1]["codes"] == [0, 0, 255] and enc[2]["codes"] == [255, 0, 0]
    with _pytest.raises(ValueError, match="nbits"):
        similarity.sq_encode(df, corpus_id="vec_id", bounds=bounds, nbits=0)

    q = clean.where("vec_id = 1")
    rer = similarity.sq_topk(
        q, similarity.sq_encode(clean, corpus_id="vec_id", bounds=bounds),
        bounds, query_id="vec_id", k=1,
        rerank=clean, rerank_id="vec_id",
    ).collect()
    exact = similarity.cosine_topk(
        q, clean, query_id="vec_id", corpus_id="vec_id", k=1
    ).collect()
    assert [tuple(r) for r in rer] == [tuple(r) for r in exact]


def test_sq_degenerate_inputs_score_null_not_error(spark):
    """ANSI-mode hardening (code-review r9): zero-norm candidates and
    queries score NULL (module contract), far-out-of-bounds values clamp
    instead of overflowing the int cast, malformed query vectors score
    NULL instead of crashing element_at, and sq_topk validates nbits."""
    import pytest as _pytest

    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, 2.0, 3.0]), (3, [2.0, 1.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    bounds = similarity.sq_train(corpus, corpus_id="vec_id")
    enc = similarity.sq_encode(corpus, corpus_id="vec_id", bounds=bounds)
    # vec 1 reconstructs to the per-dim lows -> rnorm 0: its candidacy
    # must yield NULL cosine rows, not DIVIDE_BY_ZERO.
    out = similarity.sq_topk(
        corpus.where("vec_id = 2"), enc, bounds, query_id="vec_id", k=3
    ).collect()
    got = {r["neighbor_id"]: r["cosine"] for r in out}
    assert got[1] is None and got[3] is not None

    # zero-norm and malformed QUERY vectors -> all-NULL scores, no crash
    weird_q = spark.createDataFrame(
        [(90, [0.0, 0.0, 0.0]), (91, [1.0, 2.0]), (92, None)],
        "vec_id long, embedding array<double>",
    )
    rows = similarity.sq_topk(
        weird_q, enc, bounds, query_id="vec_id", k=3
    ).collect()
    assert rows and all(r["cosine"] is None for r in rows)

    # encoding data far outside the training bounds clamps, no overflow
    far = spark.createDataFrame(
        [(50, [1e9, -1e9, 3.0])], "vec_id long, embedding array<double>"
    )
    codes = similarity.sq_encode(
        far, corpus_id="vec_id", bounds=bounds
    ).collect()[0]["codes"]
    assert codes[0] == 255 and codes[1] == 0

    with _pytest.raises(ValueError, match="nbits"):
        similarity.sq_topk(
            corpus, enc, bounds, query_id="vec_id", k=1, nbits=0
        )


def test_bq_encode_guards_and_rerank(spark):
    """BQ: corrupt vectors get NULL lanes (the pq/sq contract); the
    '>= threshold -> 1' tie rule holds on constant dimensions; lane
    packing puts bit i at lane i//32, position i%32; malformed query
    vectors score NULL hamming and rank last; rerank returns exact
    cosines."""
    rows = [
        (1, [0.0, 1.0, 5.0]),
        (2, [1.0, 1.0, 0.0]),
        (3, None),
        (4, [0.5, None, 2.0]),
        (5, [0.5, 1.0]),  # wrong width
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    clean = df.where("vec_id <= 2")
    thr = similarity.bq_train(df, corpus_id="vec_id")
    t = {r["pos"]: r["thr"] for r in thr.collect()}
    assert t == {0: 0.5, 1: 1.0, 2: 2.5}
    enc = {r["vec_id"]: r["lanes"] for r in similarity.bq_encode(
        df, corpus_id="vec_id", thresholds=thr
    ).collect()}
    assert enc[3] is None and enc[4] is None and enc[5] is None
    # vec 1: bits (0>=0.5, 1>=1.0, 5>=2.5) = (0,1,1) -> 0b110 = 6
    # vec 2: bits (1>=0.5, 1>=1.0, 0>=2.5) = (1,1,0) -> 0b011 = 3
    assert enc[1] == [6] and enc[2] == [3]

    # 33-dim vector spills into a second lane: bit 32 -> lane 1, bit 0.
    wide = spark.createDataFrame(
        [(1, [1.0] * 33)], "vec_id long, embedding array<double>"
    )
    wthr = similarity.bq_train(wide, corpus_id="vec_id")
    wlanes = similarity.bq_encode(
        wide, corpus_id="vec_id", thresholds=wthr
    ).collect()[0]["lanes"]
    assert wlanes == [(1 << 32) - 1, 1]

    # Malformed query (wrong width) scores NULL hamming, never errors.
    bad_q = spark.createDataFrame(
        [(9, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    got = similarity.bq_topk(
        bad_q,
        similarity.bq_encode(clean, corpus_id="vec_id", thresholds=thr),
        thr, query_id="vec_id", k=2,
    ).collect()
    assert got and all(r["hamming"] is None for r in got)

    q = clean.where("vec_id = 1")
    rer = similarity.bq_topk(
        q, similarity.bq_encode(clean, corpus_id="vec_id", thresholds=thr),
        thr, query_id="vec_id", k=1,
        rerank=clean, rerank_id="vec_id",
    ).collect()
    exact = similarity.cosine_topk(
        q, clean, query_id="vec_id", corpus_id="vec_id", k=1
    ).collect()
    assert [tuple(r) for r in rer] == [tuple(r) for r in exact]


def test_sq_bq_empty_bounds_yield_null_not_error(spark):
    """ADVICE r10 (low): an EMPTY bounds/thresholds table (training
    corpus had zero valid vectors) means dim = 0; encoding/scoring must
    fold that into the corrupt-vector NULL branch instead of evaluating
    element_at(v, 0) via the descending sequence [0, -1] — which errors
    in both ANSI and legacy modes. Covers zero-length vectors too (they
    pass the size(v) == dim guard when dim == 0)."""
    # A training corpus with vectors but ZERO valid ones (every row has
    # a NULL element): _pq_probe_dim succeeds, the valid-filter empties,
    # and sq_train/bq_train return a ZERO-ROW bounds table.
    empty = spark.createDataFrame(
        [(9, [None, 1.0]), (10, [0.5, None])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [(1, [0.5, 1.5]), (2, []), (3, None)],
        "vec_id long, embedding array<double>",
    )
    bounds = similarity.sq_train(empty, corpus_id="vec_id")
    assert bounds.count() == 0
    enc = {r["vec_id"]: r for r in similarity.sq_encode(
        corpus, corpus_id="vec_id", bounds=bounds
    ).collect()}
    assert all(enc[i]["codes"] is None and enc[i]["rnorm"] is None
               for i in (1, 2, 3))

    got = similarity.sq_topk(
        corpus,
        similarity.sq_encode(corpus, corpus_id="vec_id", bounds=bounds),
        bounds, query_id="vec_id", k=2,
    ).collect()
    assert got == []  # all codes NULL -> no candidates, no error

    thr = similarity.bq_train(empty, corpus_id="vec_id")
    benc = {r["vec_id"]: r["lanes"] for r in similarity.bq_encode(
        corpus, corpus_id="vec_id", thresholds=thr
    ).collect()}
    assert all(benc[i] is None for i in (1, 2, 3))
    bgot = similarity.bq_topk(
        corpus,
        similarity.bq_encode(corpus, corpus_id="vec_id", thresholds=thr),
        thr, query_id="vec_id", k=2,
    ).collect()
    assert bgot == []


@pytest.mark.slow
def test_ivf_pq_residual_exact_reconstruction_identity(spark):
    """VERDICT r9 item 2: residual ADC scoring decomposes
    <q, c_j + r̂> / (|q| |c_j + r̂|) exactly. With ksub >= corpus size
    every residual subvector is its own sub-centroid, reconstruction is
    exact, and the residual ADC cosine must EQUAL the exact cosine for
    every returned pair — any error in the qc/cross-term/norm algebra
    breaks this identity."""
    import random

    rng = random.Random(0)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 3")
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity.cosine_topk(
            q, df, query_id="vec_id", corpus_id="vec_id", k=9
        ).collect()
    }
    adc = similarity.ivf_pq_topk(
        q, df, query_id="vec_id", corpus_id="vec_id", k=9,
        nlist=2, nprobe=2, m=2, nbits=8, residual=True,
    ).collect()
    assert len(adc) == len(exact)
    for r in adc:
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cosine"]


@pytest.mark.slow
def test_pq_train_local_path_matches_distributed(spark):
    """VERDICT r10 item 4: pq_train's size-gated single-collect path
    must produce the byte-identical codebook the m-TakeOrdered
    distributed loop produces — selection is the same (hash asc,
    top-ksub) rule over the same Spark-computed hashes — for both hash
    kernels, with and without the training cap biting."""
    import random

    rng = random.Random(13)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    for hf in ("xxhash64", "md5"):
        a = sorted(map(tuple, similarity.pq_train(
            emb, corpus_id="vec_id", m=4, nbits=4, hash_fn=hf
        ).collect()))
        b = sorted(map(tuple, similarity.pq_train(
            emb, corpus_id="vec_id", m=4, nbits=4, hash_fn=hf,
            mode="distributed", train_cap=None,
        ).collect()))
        assert a == b, f"local != distributed for {hf}"
        assert len(a) == 4 * 16

    # cap bites (300 rows > cap 50): both paths still agree, and the
    # capped codebook differs from the uncapped one — the cap really
    # restricts the training set
    capped_local = sorted(map(tuple, similarity.pq_train(
        emb, corpus_id="vec_id", m=4, nbits=4, train_cap=50
    ).collect()))
    capped_dist = sorted(map(tuple, similarity.pq_train(
        emb, corpus_id="vec_id", m=4, nbits=4, train_cap=50,
        mode="distributed",
    ).collect()))
    uncapped = sorted(map(tuple, similarity.pq_train(
        emb, corpus_id="vec_id", m=4, nbits=4, train_cap=None
    ).collect()))
    assert capped_local == capped_dist
    assert capped_local != uncapped

    # the cap selection is a pure function of ids: partitioning-invariant
    repart = sorted(map(tuple, similarity.pq_train(
        emb.repartition(7), corpus_id="vec_id", m=4, nbits=4, train_cap=50
    ).collect()))
    assert repart == capped_local

    # default cap (256 * 2**nbits = 4096) never bites under 4096 rows,
    # so small-corpus codebooks are unchanged vs an explicit no-cap
    assert sorted(map(tuple, similarity.pq_train(
        emb, corpus_id="vec_id", m=4, nbits=4
    ).collect())) == uncapped

    with pytest.raises(ValueError, match="train_cap"):
        similarity.pq_train(emb, corpus_id="vec_id", m=4, train_cap=0)
    with pytest.raises(ValueError, match="mode"):
        similarity.pq_train(emb, corpus_id="vec_id", m=4, mode="bogus")


@pytest.mark.slow
def test_ivf_pq_explicit_codebook_defaults_to_raw_geometry(spark):
    """ADVICE r10: an explicit codebook= (a pq_train model, necessarily
    trained on raw vectors) must resolve residual=None to raw-vector
    encoding — the pre-r10 semantics — not silently re-interpret the
    codebook as residual geometry. Inline training (codebook=None) keeps
    residual=True as its default."""
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 6")
    book = similarity.pq_train(
        df, corpus_id="vec_id", corpus_vec="embedding", m=4, nbits=4,
        seed=143,
    )
    kw = dict(
        query_id="vec_id", corpus_id="vec_id", k=5,
        nlist=4, nprobe=4, m=4, nbits=4, seed=42,
    )
    got = sorted(map(tuple, similarity.ivf_pq_topk(
        q, df, codebook=book, **kw
    ).collect()))
    raw = sorted(map(tuple, similarity.ivf_pq_topk(
        q, df, codebook=book, residual=False, **kw
    ).collect()))
    res = sorted(map(tuple, similarity.ivf_pq_topk(
        q, df, codebook=book, residual=True, **kw
    ).collect()))
    assert got == raw
    assert got != res  # the geometries really do diverge on this data
    # inline training still defaults to residual encoding
    inline_default = sorted(map(tuple, similarity.ivf_pq_topk(
        q, df, **kw
    ).collect()))
    inline_res = sorted(map(tuple, similarity.ivf_pq_topk(
        q, df, residual=True, **kw
    ).collect()))
    assert inline_default == inline_res


@pytest.mark.slow
def test_ivf_pq_residual_recall_beats_raw_at_nbits4(spark):
    """VERDICT r9 item 2 (recall property): on clustered data — the
    setting IVF exists for — residual encoding spends the 2^4 sub-codes
    on within-list variation instead of re-describing coarse structure,
    so recall@5 must be >= the raw-vector encoding's. nprobe=nlist so
    the coarse stage is lossless and the delta isolates PQ quality.
    (On UNclustered data residuals against a cosine-nearest sample can
    have higher variance than the raw vectors — that regime is why
    residual stays a flag rather than the only path.)"""
    import random

    rng = random.Random(7)
    dim, n_clusters = 32, 16
    centers = [
        [rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = [
        (i, [x + rng.gauss(0, 0.08) for x in centers[i % n_clusters]])
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 12")
    truth: dict = {}
    for r in similarity.cosine_topk(
        q, df, query_id="vec_id", corpus_id="vec_id", k=5
    ).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(residual: bool) -> float:
        got: dict = {}
        for r in similarity.ivf_pq_topk(
            q, df, query_id="vec_id", corpus_id="vec_id", k=5,
            nlist=16, nprobe=16, m=8, nbits=4, residual=residual,
        ).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(got.get(k, set()) & t) for k, t in truth.items()
        ) / sum(len(t) for t in truth.values())

    raw, res = recall(False), recall(True)
    assert res >= raw, (res, raw)
    assert res >= 0.5  # measured 0.55 vs raw 0.40 at these settings


@pytest.mark.slow
def test_ivf_pq_index_meta_and_legacy_raw(spark, sf_dir, tmp_path):
    """The persisted index records its encoding geometry: a residual
    index's meta table says so and search matches the inline residual
    plan (covered by test_ivf_pq_index_matches_inline_and_prunes); a
    LEGACY index without a meta table must be scored as raw-encoded."""
    import shutil

    from timefence_spark.operators import similarity as sim
    from timefence_spark.sources.readers import read_parquet

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = emb.where(F.col("vec_id") < 8)
    path = str(tmp_path / "ivfpq_raw_idx")
    sim.ivf_pq_build_index(
        emb, corpus_id="vec_id", nlist=8, m=8, nbits=4, hash_fn="md5",
        residual=False, path=path,
    )
    meta = spark.read.parquet(f"{path}/meta").head()
    assert meta["residual"] is False and meta["nbits"] == 4
    inline_raw = sorted(map(tuple, sim.ivf_pq_topk(
        q, emb, query_id="vec_id", corpus_id="vec_id", k=5,
        nlist=8, nprobe=3, m=8, nbits=4, hash_fn="md5", residual=False,
    ).collect()))
    via_index = sorted(map(tuple, sim.ivf_pq_search(
        spark, path, q, query_id="vec_id", k=5, nprobe=3,
    ).collect()))
    assert via_index == inline_raw
    # pre-meta index (r8/r9 layout): stripping meta must read as raw
    shutil.rmtree(f"{path}/meta")
    legacy = sorted(map(tuple, sim.ivf_pq_search(
        spark, path, q, query_id="vec_id", k=5, nprobe=3,
    ).collect()))
    assert legacy == inline_raw


@pytest.mark.slow
def test_opq_rotation_invariance_and_recall(spark):
    """VERDICT r9 item 6 (OPQ rung): rotate_vectors applies a seeded
    orthogonal map, so exact cosine ranking is invariant; on ANISOTROPIC
    data (energy concentrated in few dims, the regime rotation exists
    for) rotated PQ recall@5 must beat raw PQ at nbits=4 — the rotation
    spreads variance evenly across the m subspaces."""
    import random

    rng = random.Random(3)
    dim = 64
    rows = [
        (i, [rng.gauss(0, 1.0 if j < 8 else 0.05) for j in range(dim)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 12")
    rot = similarity.opq_train(df, corpus_id="vec_id", seed=7)
    rdf = similarity.rotate_vectors(df, vec_col="embedding", rotation=rot)
    rq = rdf.where("vec_id < 12")

    # orthogonal invariance: exact kNN identical through the rotation
    a = sorted(map(tuple, similarity.cosine_topk(
        q, df, query_id="vec_id", corpus_id="vec_id", k=5).collect()))
    b = sorted(map(tuple, similarity.cosine_topk(
        rq, rdf, query_id="vec_id", corpus_id="vec_id", k=5).collect()))
    assert a == b

    truth: dict = {}
    for r in similarity.cosine_topk(
        q, df, query_id="vec_id", corpus_id="vec_id", k=5
    ).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def pq_recall(corpus, queries) -> float:
        book = similarity.pq_train(corpus, corpus_id="vec_id", m=8, nbits=4)
        codes = similarity.pq_encode(
            corpus, corpus_id="vec_id", codebook=book
        )
        got: dict = {}
        for r in similarity.pq_topk(
            queries, codes, book, query_id="vec_id", encoded_id="vec_id",
            k=5,
        ).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(got.get(k, set()) & t) for k, t in truth.items()
        ) / sum(len(t) for t in truth.values())

    raw, rotated = pq_recall(df, q), pq_recall(rdf, rq)
    assert rotated >= raw, (rotated, raw)
    assert rotated >= 0.4  # measured 0.52 vs raw 0.15 at these settings

    # join kernel is bit-identical to the expr kernel
    rdf_join = similarity.rotate_vectors(
        df, vec_col="embedding", rotation=rot, compute="join"
    )
    x = rdf.orderBy("vec_id").limit(5).collect()
    y = rdf_join.orderBy("vec_id").limit(5).collect()
    assert [r["embedding"] for r in x] == [r["embedding"] for r in y]

    # degenerate rows rotate to NULL, not an error
    bad = spark.createDataFrame(
        [(1, None), (2, [1.0] * 3), (3, [None] + [1.0] * (dim - 1))],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["embedding"] for r in similarity.rotate_vectors(
        bad, vec_col="embedding", rotation=rot
    ).collect()}
    assert out[1] is None and out[2] is None and out[3] is None


@pytest.mark.slow
def test_ivf_pq_index_with_rotation(spark, tmp_path):
    """Round 11: the persisted OPQ + IVF-PQ composition. An index built
    with rotation= quantizes everything in the rotated space, persists
    the rotation, and ivf_pq_search applies it to queries
    automatically — results must equal the hand-rotated inline pipeline
    for both geometries, and the exact rerank must score RAW vectors
    (rotation-invariant cosine)."""
    import random

    rng = random.Random(21)
    dim = 16
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(150)],
        "vec_id long, embedding array<double>",
    )
    q = emb.where("vec_id < 6")
    rot = similarity.opq_train(emb, corpus_id="vec_id", seed=5)
    remb = similarity.rotate_vectors(
        emb, vec_col="embedding", rotation=rot, materialize=True
    )
    rq = remb.where("vec_id < 6")
    for residual in (True, False):
        path = str(tmp_path / f"opq_idx_{residual}")
        similarity.ivf_pq_build_index(
            emb, corpus_id="vec_id", nlist=4, m=4, nbits=4,
            hash_fn="md5", residual=residual, rotation=rot, path=path,
        )
        meta = spark.read.parquet(f"{path}/meta").head()
        assert meta["rotated"] is True and meta["residual"] is residual
        via_index = sorted(map(tuple, similarity.ivf_pq_search(
            spark, path, q, query_id="vec_id", k=5, nprobe=4,
        ).collect()))
        inline = sorted(map(tuple, similarity.ivf_pq_topk(
            rq, remb, query_id="vec_id", corpus_id="vec_id", k=5,
            nlist=4, nprobe=4, m=4, nbits=4, hash_fn="md5",
            residual=residual,
        ).collect()))
        assert via_index == inline, f"residual={residual}"

    # rerank against RAW vectors: final cosines must equal the exact
    # raw-vs-raw cosine for each surviving pair
    path = str(tmp_path / "opq_idx_rerank")
    similarity.ivf_pq_build_index(
        emb, corpus_id="vec_id", nlist=4, m=4, nbits=4, hash_fn="md5",
        rotation=rot, path=path,
    )
    rer = similarity.ivf_pq_search(
        spark, path, q, query_id="vec_id", k=3, nprobe=4,
        rerank=emb, rerank_id="vec_id",
    ).collect()
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity.cosine_topk(
            q, emb, query_id="vec_id", corpus_id="vec_id", k=149
        ).collect()
    }
    assert rer and all(
        exact[(r["query_id"], r["neighbor_id"])] == r["cosine"]
        for r in rer
    )


@pytest.mark.slow
def test_opq_parametric_beats_seeded_on_anisotropic_data(spark):
    """VERDICT r10 item 6 (parametric OPQ): the data-adaptive
    encode -> Procrustes-SVD -> re-rotate alternation, trained on a
    deterministic bounded sample, must match or beat the seeded random
    rotation's PQ recall on anisotropic CORRELATED data — the regime
    variance-balancing alone can't fix (correlated coordinates split
    across subspaces). Non-oracle by design (LAPACK SVD is not
    bit-portable); this recall gate IS its correctness contract, plus
    orthogonality and determinism checks."""
    import random

    rng = random.Random(9)
    dim = 32
    # correlated anisotropy: a few latent factors mixed into all dims
    factors = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(4)]
    rows = []
    for i in range(260):
        z = [rng.gauss(0, 1) for _ in range(4)]
        v = [
            sum(z[f] * factors[f][j] for f in range(4))
            + rng.gauss(0, 0.05)
            for j in range(dim)
        ]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 12")
    truth: dict = {}
    for r in similarity.cosine_topk(
        q, df, query_id="vec_id", corpus_id="vec_id", k=5
    ).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(rot) -> float:
        rdf = similarity.rotate_vectors(
            df, vec_col="embedding", rotation=rot, materialize=True
        )
        rq = rdf.where("vec_id < 12")
        book = similarity.pq_train(rdf, corpus_id="vec_id", m=8, nbits=4)
        codes = similarity.pq_encode(rdf, corpus_id="vec_id", codebook=book)
        got: dict = {}
        for r in similarity.pq_topk(
            rq, codes, book, query_id="vec_id", encoded_id="vec_id", k=5
        ).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(got.get(k, set()) & t) for k, t in truth.items()
        ) / sum(len(t) for t in truth.values())

    seeded = similarity.opq_train(df, corpus_id="vec_id", seed=7)
    para = similarity.opq_train(
        df, corpus_id="vec_id", seed=7, method="parametric", iters=4,
        m=8, nbits=4,
    )
    r_seed, r_para = recall(seeded), recall(para)
    assert r_para >= r_seed, (r_para, r_seed)

    # the learned matrix is orthogonal (R R^T = I) and deterministic
    import numpy as np

    R = np.array(
        [r["row"] for r in para.orderBy("pos").collect()], dtype=float
    )
    assert np.allclose(R @ R.T, np.eye(dim), atol=1e-8)
    para2 = similarity.opq_train(
        df.repartition(5), corpus_id="vec_id", seed=7,
        method="parametric", iters=4, m=8, nbits=4,
    )
    assert sorted(map(tuple, para.collect())) == sorted(
        map(tuple, para2.collect())
    )
    with pytest.raises(ValueError, match="method"):
        similarity.opq_train(df, corpus_id="vec_id", method="bogus")
    with pytest.raises(ValueError, match="iters"):
        similarity.opq_train(
            df, corpus_id="vec_id", method="parametric", iters=0
        )


def test_truncate_embeddings_mrl(spark):
    """Matryoshka truncation (round 10): prefix slice + optional L2
    renorm as a pure projection; degenerate rows (NULL, short, NULL
    element in the prefix, zero-norm prefix) truncate to NULL; cosine
    ranking is renormalization-invariant."""
    rows = [
        (1, [3.0, 4.0, 9.0, 9.0]),
        (2, [1.0, 0.0, 5.0, 5.0]),
        (3, [0.0, 0.0, 7.0, 7.0]),   # zero-norm prefix
        (4, None),
        (5, [1.0]),                   # shorter than dims
        (6, [None, 2.0, 1.0, 1.0]),  # NULL inside the prefix
        (7, [2.0, 2.0, None, None]),  # NULLs OUTSIDE the prefix are fine
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["embedding"] for r in similarity.truncate_embeddings(
        df, dims=2
    ).collect()}
    assert out[1] == [0.6, 0.8]  # 3-4-5 triangle renormalized
    assert out[2] == [1.0, 0.0]
    assert out[3] is None and out[4] is None
    assert out[5] is None and out[6] is None
    assert out[7] is not None
    raw = {r["vec_id"]: r["embedding"] for r in similarity.truncate_embeddings(
        df, dims=2, renormalize=False
    ).collect()}
    assert raw[1] == [3.0, 4.0] and raw[3] == [0.0, 0.0]

    # cosine ranking identical with and without renorm
    clean = df.where("vec_id in (1, 2, 7)")
    a = similarity.cosine_topk(
        similarity.truncate_embeddings(clean, dims=2),
        similarity.truncate_embeddings(clean, dims=2),
        query_id="vec_id", corpus_id="vec_id", k=2,
    ).collect()
    b = similarity.cosine_topk(
        similarity.truncate_embeddings(clean, dims=2, renormalize=False),
        similarity.truncate_embeddings(clean, dims=2, renormalize=False),
        query_id="vec_id", corpus_id="vec_id", k=2,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    import pytest as _pytest
    with _pytest.raises(ValueError, match="dims"):
        similarity.truncate_embeddings(df, dims=0)


def test_rrf_fuse_semantics(spark):
    """RRF (round 11): integer-micros scoring, missing-pair handling,
    weights, tie-break, and validation."""
    import math

    import pytest
    from timefence_spark.operators.fusion import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, neighbor_id long, rank int",
    )
    out = {r["neighbor_id"]: r for r in rrf_fuse([a, b], k=60).collect()}

    def micros(rank, w=1.0):
        return int(math.floor(1e9 * w / (60 + rank) + 0.5))

    # 11 appears in both lists: rank 2 in a, rank 1 in b
    assert out[11]["rrf_micros"] == micros(2) + micros(1)
    assert out[11]["n_retrievers"] == 2
    assert out[10]["rrf_micros"] == micros(1) and out[10]["n_retrievers"] == 1
    assert out[13]["rrf_micros"] == micros(2)
    # 11 fused above 10 (two lists beat one first place at k=60)
    assert out[11]["rank"] == 1 and out[10]["rank"] == 2

    # weights bias: at k=60 the flip needs w_a > 62
    # (w/61 > w/62 + 1/61  <=>  w > 62)
    w_out = {
        r["neighbor_id"]: r["rank"]
        for r in rrf_fuse([a, b], k=60, weights=[100.0, 1.0]).collect()
    }
    assert w_out[10] < w_out[11]

    # exact ties break on neighbor_id asc
    c = spark.createDataFrame(
        [(1, 20, 1), (1, 21, 1)],
        "query_id long, neighbor_id long, rank int",
    )
    tie = {r["neighbor_id"]: r["rank"] for r in rrf_fuse([c]).collect()}
    assert tie[20] == 1 and tie[21] == 2

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([a, b], weights=[1.0])
    with pytest.raises(ValueError, match="k must"):
        rrf_fuse([a], k=0)
    with pytest.raises(ValueError, match="top_k"):
        rrf_fuse([a], top_k=0)


def test_pca_train_model_contract(spark):
    """PCA (round 11): (pos, row, bias, var) with orthonormal sign-fixed
    axes ordered by explained variance, bias = -<axis, mean>, and a
    partitioning-stable deterministic sample — the same non-oracle
    contract shape as parametric OPQ."""
    import numpy as np

    rng = np.random.RandomState(3)
    X = rng.randn(200, 12) * np.linspace(3.0, 0.2, 12) + 5.0
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    model = similarity.pca_train(df, corpus_id="vec_id", dims=5)
    rows = model.orderBy("pos").collect()
    R = np.array([r["row"] for r in rows])
    assert R.shape == (5, 12)
    assert np.allclose(R @ R.T, np.eye(5), atol=1e-9)
    vars_ = [r["var"] for r in rows]
    assert vars_ == sorted(vars_, reverse=True)
    # sign fix: each axis's largest-|x| coordinate is positive
    for r in R:
        assert r[int(np.abs(r).argmax())] > 0
    # bias really is -<axis, sample mean>: projecting the mean of the
    # TRAINING sample must land near zero (exact when cap >= corpus)
    mean = X.mean(0)
    bias = np.array([r["bias"] for r in rows])
    assert np.allclose(R @ mean + bias, 0.0, atol=1e-9)
    # deterministic under repartitioning (salted-hash sample selection)
    model2 = similarity.pca_train(
        df.repartition(7), corpus_id="vec_id", dims=5
    )
    assert sorted(map(tuple, model.collect())) == sorted(
        map(tuple, model2.collect())
    )
    # center=False: zero bias, covariance about the origin
    m0 = similarity.pca_train(
        df, corpus_id="vec_id", dims=3, center=False
    )
    assert all(r["bias"] == 0.0 for r in m0.collect())
    with pytest.raises(ValueError, match="dims"):
        similarity.pca_train(df, corpus_id="vec_id", dims=0)
    with pytest.raises(ValueError, match="dims"):
        similarity.pca_train(df, corpus_id="vec_id", dims=13)
    with pytest.raises(ValueError, match="train_cap"):
        similarity.pca_train(df, corpus_id="vec_id", dims=2, train_cap=1)


def test_pca_beats_jl_projection_on_anisotropic_data(spark):
    """The data-adaptive rung must beat the seeded JL rung where it
    should: data on a low-dimensional latent subspace. PCA to 6 dims
    recovers the 4-factor subspace (near-perfect recall); a random
    6-dim projection of 32 dims cannot. This recall gate IS pca_train's
    correctness contract (LAPACK eigh is not bit-portable, so no SQL
    oracle — the projection MACHINERY is oracled via knn_rproj)."""
    import random

    rng = random.Random(17)
    dim = 32
    factors = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(4)]
    rows = []
    for i in range(240):
        z = [rng.gauss(0, 1) for _ in range(4)]
        v = [
            sum(z[f] * factors[f][j] for f in range(4))
            + rng.gauss(0, 0.05)
            for j in range(dim)
        ]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q_ids = "vec_id < 12"
    truth: dict = {}
    for r in similarity.cosine_topk(
        df.where(q_ids), df, query_id="vec_id", corpus_id="vec_id", k=5
    ).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(proj_df) -> float:
        p = similarity.project_vectors(
            df, vec_col="embedding", projection=proj_df,
            materialize=True,
        )
        got: dict = {}
        for r in similarity.cosine_topk(
            p.where(q_ids), p, query_id="vec_id", corpus_id="vec_id", k=5
        ).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(got.get(k, set()) & t) for k, t in truth.items()
        ) / sum(len(t) for t in truth.values())

    pca = similarity.pca_train(
        df, corpus_id="vec_id", dims=6, center=False
    )
    jl = spark.createDataFrame(
        [
            (i, row)
            for i, row in enumerate(similarity.jl_projection(dim, 6, 23))
        ],
        "pos int, row array<double>",
    )
    r_pca, r_jl = recall(pca), recall(jl)
    assert r_pca >= r_jl, (r_pca, r_jl)
    assert r_pca >= 0.9, r_pca  # the latent subspace is recoverable


def test_project_vectors_null_contract_and_kernels(spark):
    """project_vectors: NULL vector / wrong width / NULL element ->
    NULL; bias applies affinely; expr and join kernels bit-identical;
    renormalize yields unit vectors and NULLs zero-norm projections."""
    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0, 3.0]),
            (1, None),
            (2, [1.0, 2.0]),
            (3, [1.0, None, 3.0]),
            (4, [0.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    proj = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0], 10.0), (1, [0.0, 0.0, 2.0], -1.0)],
        "pos int, row array<double>, bias double",
    )
    out = {
        r["vec_id"]: r["p"]
        for r in similarity.project_vectors(
            df, vec_col="embedding", projection=proj, out_col="p"
        ).collect()
    }
    assert out[0] == [11.0, 5.0]
    assert out[1] is None and out[2] is None and out[3] is None
    assert out[4] == [10.0, -1.0]
    out_j = {
        r["vec_id"]: r["p"]
        for r in similarity.project_vectors(
            df, vec_col="embedding", projection=proj, out_col="p",
            compute="join",
        ).collect()
    }
    assert out == out_j
    # renormalize: unit norm; an all-zero PROJECTION nulls out
    proj0 = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0], 0.0), (1, [0.0, 0.0, 0.0], 0.0)],
        "pos int, row array<double>, bias double",
    )
    rn = {
        r["vec_id"]: r["p"]
        for r in similarity.project_vectors(
            df, vec_col="embedding", projection=proj0, out_col="p",
            renormalize=True,
        ).collect()
    }
    assert rn[0] is None  # zero-norm projection -> NULL
    rn2 = similarity.project_vectors(
        df.where("vec_id = 0"), vec_col="embedding", projection=proj,
        out_col="p", renormalize=True,
    ).collect()[0]["p"]
    import math

    assert abs(math.hypot(*rn2) - 1.0) < 1e-12
    with pytest.raises(ValueError, match="compute"):
        similarity.project_vectors(
            df, vec_col="embedding", projection=proj, compute="bogus"
        )
    with pytest.raises(ValueError, match="dims"):
        similarity.jl_projection(8, 9)
    with pytest.raises(ValueError, match="dims"):
        similarity.jl_projection(8, 0)


def test_mmr_rerank_matches_python_reference(spark):
    """fusion.mmr_rerank (round 11): the JVM greedy fold must equal a
    straightforward Python MMR with the same integer-micros
    quantization — including the selection-time score and the
    neighbor-asc tie-break."""
    import math

    from timefence_spark.operators.fusion import mmr_rerank

    vecs = {
        1: [1.0, 0.0], 2: [0.98, 0.2], 3: [0.0, 1.0],
        4: [0.6, 0.8], 5: [-1.0, 0.0],
    }
    cand_rows = [(0, n, r) for n, r in
                 [(1, 0.99), (2, 0.97), (3, 0.5), (4, 0.8), (5, 0.1)]]
    cands = spark.createDataFrame(
        cand_rows, "query_id long, neighbor_id long, cosine double"
    )
    vdf = spark.createDataFrame(
        [(n, v) for n, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = [
        (r["neighbor_id"], r["mmr_units"], r["rank"])
        for r in mmr_rerank(cands, vdf, lambda_=0.6, k=4)
        .orderBy("rank").collect()
    ]

    def _norm(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    lam, rest = 600000, 400000
    rem = sorted(
        (n, int(math.floor(r * 1e6 + 0.5)), _norm(vecs[n]))
        for _, n, r in cand_rows
    )
    sel, out = [], []
    for rank in range(1, 5):
        best = None
        for n, rm, v in rem:
            sims = []
            for s in sel:
                d = 0.0
                for a, b in zip(v, s):
                    d += a * b
                sims.append(int(math.floor(d * 1e6 + 0.5)))
            ms = max(sims) if sims else 0  # max CAN be negative
            u = lam * rm - rest * ms
            if best is None or (u, -n) > (best[3], -best[0]):
                best = (n, rm, v, u)
        sel.append(best[2])
        out.append((best[0], best[3], rank))
        rem = [x for x in rem if x[0] != best[0]]
    assert got == out
    # diversity actually happened: neighbor 2 (near-duplicate of 1)
    # must NOT follow 1 immediately despite the 2nd-highest relevance
    assert got[0][0] == 1 and got[1][0] != 2


def test_mmr_rerank_drops_degenerate_candidates(spark):
    from timefence_spark.operators.fusion import mmr_rerank

    cands = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, None), (0, 3, 0.8), (0, 4, 0.7)],
        "query_id long, neighbor_id long, cosine double",
    )
    vdf = spark.createDataFrame(
        [(1, [1.0, 0.0]), (3, [0.0, 0.0]), (9, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    # 2: NULL rel; 3: zero-norm vector; 4: no vector row -> only 1 left
    got = mmr_rerank(cands, vdf, k=3).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in got] == [(1, 1)]
    with pytest.raises(ValueError, match="lambda_"):
        mmr_rerank(cands, vdf, lambda_=1.5)
    with pytest.raises(ValueError, match="k must"):
        mmr_rerank(cands, vdf, k=0)


def test_mmr_rerank_lambda_extremes(spark):
    """lambda=1 is pure relevance order; lambda=0 is pure anti-
    redundancy (after the first pick, which is relevance-greedy in
    both — with all-identical sims the neighbor tie-break orders)."""
    from timefence_spark.operators.fusion import mmr_rerank

    cands = spark.createDataFrame(
        [(0, n, 1.0 - 0.1 * n) for n in range(1, 5)],
        "query_id long, neighbor_id long, cosine double",
    )
    vdf = spark.createDataFrame(
        [(n, [1.0, 0.0]) for n in range(1, 5)],
        "vec_id long, embedding array<double>",
    )
    rel = mmr_rerank(cands, vdf, lambda_=1.0, k=4).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in rel] == [1, 2, 3, 4]
    anti = mmr_rerank(cands, vdf, lambda_=0.0, k=4).orderBy("rank").collect()
    # identical vectors: every unselected candidate scores the same
    # -(1e6) after the first pick; neighbor-asc breaks the ties. The
    # first pick at lambda=0 scores 0 for everyone -> neighbor asc.
    assert [r["neighbor_id"] for r in anti] == [1, 2, 3, 4]
    assert all(r["mmr_units"] == 0 for r in anti[:1])


def test_lsh_multiprobe_parity_and_recall(spark):
    """Multiprobe LSH (round 11): expr and arrow probe paths produce
    identical results; probing strictly widens the candidate set so
    top-k recall vs exact must not drop; degenerate vectors keep the
    bucket-0 contract on both paths."""
    import random

    rng = random.Random(5)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(150)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 10")
    kw = dict(
        query_id="vec_id", corpus_id="vec_id", k=5, bits=6, tables=2,
        dim=16, round_to=6,
    )

    def rowset(d):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
            for r in d.collect()
        )

    mp_expr = rowset(
        similarity.rp_lsh_topk(
            q, df, signature_impl="expr", score_impl="expr", probes=2,
            **kw,
        )
    )
    mp_arrow = rowset(
        similarity.rp_lsh_topk(
            q, df, signature_impl="arrow", score_impl="expr", probes=2,
            **kw,
        )
    )
    assert mp_expr == mp_arrow
    exact: dict = {}
    for r in similarity.cosine_topk(
        q, df, query_id="vec_id", corpus_id="vec_id", k=5
    ).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(rs):
        got: dict = {}
        for qid, nid, _, _ in rs:
            got.setdefault(qid, set()).add(nid)
        return sum(
            len(got.get(kk, set()) & v) for kk, v in exact.items()
        ) / sum(len(v) for v in exact.values())

    base = rowset(
        similarity.rp_lsh_topk(
            q, df, signature_impl="expr", score_impl="expr", **kw
        )
    )
    assert recall(mp_expr) >= recall(base)
    # probes cap at bits; negative rejects
    with pytest.raises(ValueError, match="probes"):
        similarity.rp_lsh_topk(q, df, probes=-1, **kw)
    # degenerate vectors: base-bucket-0 only, no crash, both paths —
    # including NULL ELEMENTS, whose NaN/NULL margins must not probe
    bad = spark.createDataFrame(
        [(900, None), (901, [1.0] * 3), (902, [1.0, None] + [0.5] * 14)],
        "vec_id long, embedding array<double>",
    )
    for impl in ("expr", "arrow"):
        out = similarity.rp_lsh_topk(
            bad, df, signature_impl=impl, score_impl="expr", probes=2,
            **kw,
        )
        assert out.count() >= 0  # runs; bucket-0 matches are legitimate


def test_projection_composes_with_quantized_rungs(spark):
    """The dim-reduction rungs must COMPOSE with the quantization rungs
    (the retrieval.md ladder claim): project to 8 dims (PCA), then run
    SQ8 and PQ top-k in the reduced space; results must rank real
    neighbors (recall vs reduced-space exact > 0) and every pipeline
    stage must accept the projected column in place."""
    import random

    rng = random.Random(31)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = similarity.pca_train(
        df, corpus_id="vec_id", dims=8, center=False
    )
    p = similarity.project_vectors(
        df, vec_col="embedding", projection=model, materialize=True
    )
    q = p.where("vec_id < 8")
    exact: dict = {}
    for r in similarity.cosine_topk(
        q, p, query_id="vec_id", corpus_id="vec_id", k=5
    ).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(res) -> float:
        got: dict = {}
        for r in res.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(got.get(kk, set()) & v) for kk, v in exact.items()
        ) / sum(len(v) for v in exact.values())

    bounds = similarity.sq_train(p, corpus_id="vec_id")
    codes = similarity.sq_encode(p, corpus_id="vec_id", bounds=bounds)
    sq = similarity.sq_topk(
        q, codes, bounds, query_id="vec_id", encoded_id="vec_id", k=5
    )
    assert recall(sq) > 0.5
    book = similarity.pq_train(p, corpus_id="vec_id", m=4, nbits=4)
    pcodes = similarity.pq_encode(p, corpus_id="vec_id", codebook=book)
    pq = similarity.pq_topk(
        q, pcodes, book, query_id="vec_id", encoded_id="vec_id", k=5
    )
    assert recall(pq) > 0.2


def test_mmr_rerank_string_neighbor_ids_tiebreak_asc(spark):
    """ADVICE r11: the tie-break must negate the BIGINT utility, never the
    neighbor id — string doc ids (which rrf_fuse and every retriever here
    support) would cast -id to NULL and silently flip ties to descending.
    Identical relevance + orthogonal vectors makes every step a pure tie:
    selection order must be lexicographic ascending."""
    from timefence_spark.operators.fusion import mmr_rerank

    cands = spark.createDataFrame(
        [("q1", n, 0.9) for n in ("delta", "alpha", "charlie", "bravo")],
        "query_id string, neighbor_id string, cosine double",
    )
    vdf = spark.createDataFrame(
        [
            ("alpha", [1.0, 0.0, 0.0, 0.0]),
            ("bravo", [0.0, 1.0, 0.0, 0.0]),
            ("charlie", [0.0, 0.0, 1.0, 0.0]),
            ("delta", [0.0, 0.0, 0.0, 1.0]),
        ],
        "vec_id string, embedding array<double>",
    )
    got = [
        r["neighbor_id"]
        for r in mmr_rerank(cands, vdf, lambda_=0.5, k=4)
        .orderBy("rank").collect()
    ]
    assert got == ["alpha", "bravo", "charlie", "delta"]


def test_pca_train_ignores_null_element_vectors(spark):
    """ADVICE r11: a single NULL ELEMENT inside a sampled vector becomes
    NaN under numpy and poisons the covariance — the sample predicate
    must exclude such rows, matching sq_train's valid-row contract."""
    import math
    import random

    from timefence_spark.operators import similarity

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(40)]
    rows.append((1000, [1.0, None, 0.5, 0.25]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    proj = similarity.pca_train(df, corpus_id="vec_id", dims=2).collect()
    assert len(proj) == 2
    assert all(
        math.isfinite(x)
        for r in proj
        for x in list(r["row"]) + [r["bias"], r["var"]]
    ), "NULL-element vector poisoned the PCA covariance"


def test_rp_probe_expr_nan_vector_matches_arrow(spark):
    """ADVICE r11: a NaN-bearing vector must emit base-bucket-only from
    BOTH kernels (Spark orders NaN largest, so without the guard the expr
    kernel gives the all-ones bucket plus probe flips while the arrow
    kernel gives bucket 0 — breaking bit-parity)."""
    from timefence_spark.operators import similarity

    rows = [
        (1, [float("nan"), 0.5, -0.25, 1.0]),
        (2, [0.3, -0.7, 0.2, 0.9]),
        (3, [0.25, -0.6, 0.3, 0.8]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {}
    for impl in ("expr", "arrow"):
        got = similarity.rp_lsh_topk(
            df, df, query_id="vec_id", corpus_id="vec_id", k=2,
            bits=4, tables=2, probes=2, signature_impl=impl,
        )
        out[impl] = sorted(
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in got.collect()
        )
    assert out["expr"] == out["arrow"]


@pytest.mark.slow
def test_ivf_pq_append_frozen_model(spark, tmp_path):
    """ivf_pq_append (VERDICT r11 item 5): new rows encode against the
    FROZEN persisted model — appended codes are byte-identical to
    encoding the new rows with the index's centroids/codebook directly
    (so search-after-append == search over a rebuild with the same
    model), appends are batching-invariant, searches see rows from
    both generations, and the meta generation bumps per append."""
    import random

    from pyspark.sql import functions as F

    from timefence_spark.operators import similarity as sim

    rng = random.Random(12)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(120)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    base = emb.where("vec_id < 80")
    extra = emb.where("vec_id >= 80")
    q = emb.where("vec_id < 3")

    idx = str(tmp_path / "idx")
    sim.ivf_pq_build_index(
        base, corpus_id="vec_id", nlist=4, m=4, nbits=4, path=idx
    )
    assert (
        spark.read.parquet(f"{idx}/meta").head()["generation"] == 1
    )
    gen = sim.ivf_pq_append(spark, idx, extra, corpus_id="vec_id")
    assert gen == 2
    assert (
        spark.read.parquet(f"{idx}/meta").head()["generation"] == 2
    )

    # appended codes == encoding the new rows against the frozen model
    # (residual geometry), i.e. exactly what a rebuild-with-same-model
    # would have written for them
    cents = spark.read.parquet(f"{idx}/centroids")
    book = spark.read.parquet(f"{idx}/codebook")
    assign = sim._ivf_assign_factory(cents, compute="expr")
    assigned = assign(
        extra.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("__cv"),
        ),
        "neighbor_id", "__cv", 1,
    )
    expect_src = (
        assigned.join(
            F.broadcast(
                cents.select(
                    "centroid_id", F.col("centroid").alias("__centv")
                )
            ),
            "centroid_id",
        )
        .select("neighbor_id", F.expr(sim._RESIDUAL_SQL).alias("__cv"))
    )
    expected = {
        r["neighbor_id"]: list(r["codes"])
        for r in sim.pq_encode(
            expect_src, corpus_id="neighbor_id", corpus_vec="__cv",
            codebook=book,
        ).collect()
    }
    stored = {
        r["neighbor_id"]: list(r["codes"])
        for r in spark.read.parquet(f"{idx}/codes")
        .where("neighbor_id >= 80").collect()
    }
    assert stored == expected

    got = sim.ivf_pq_search(
        spark, idx, q, query_id="vec_id", k=30, nprobe=4
    )
    hits = [r["neighbor_id"] for r in got.collect()]
    assert any(h >= 80 for h in hits) and any(h < 80 for h in hits)

    # batching invariance: one append of B == append B1 then append B2
    idx2 = str(tmp_path / "idx2")
    sim.ivf_pq_build_index(
        base, corpus_id="vec_id", nlist=4, m=4, nbits=4, path=idx2
    )
    sim.ivf_pq_append(
        spark, idx2, extra.where("vec_id < 100"), corpus_id="vec_id"
    )
    assert sim.ivf_pq_append(
        spark, idx2, extra.where("vec_id >= 100"), corpus_id="vec_id"
    ) == 3
    got2 = sim.ivf_pq_search(
        spark, idx2, q, query_id="vec_id", k=30, nprobe=4
    )
    key = ["query_id", "neighbor_id", "rank"]
    assert sorted(map(tuple, got.select(*key).collect())) == sorted(
        map(tuple, got2.select(*key).collect())
    )


def test_ivf_pq_append_rotated_and_legacy_meta(spark, tmp_path):
    """Appends onto an OPQ-rotated index quantize in the rotated space
    (the frozen rotation applies inside append, queries keep rotating
    at search); a legacy meta without the generation column reads as
    generation 1 and bumps to 2."""
    import random

    from timefence_spark.operators import similarity as sim

    rng = random.Random(13)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    base, extra = emb.where("vec_id < 70"), emb.where("vec_id >= 70")
    rot = sim.opq_train(base, corpus_id="vec_id", seed=3)
    idx = str(tmp_path / "ridx")
    sim.ivf_pq_build_index(
        base, corpus_id="vec_id", nlist=4, m=4, nbits=4, path=idx,
        rotation=rot,
    )
    sim.ivf_pq_append(spark, idx, extra, corpus_id="vec_id")
    got = sim.ivf_pq_search(
        spark, idx, emb.where("vec_id < 2"), query_id="vec_id", k=40,
        nprobe=4,
    )
    hits = [r["neighbor_id"] for r in got.collect()]
    assert any(h >= 70 for h in hits)

    # legacy meta: drop the generation column in place
    meta = spark.read.parquet(f"{idx}/meta").drop("generation").collect()
    spark.createDataFrame(
        meta,
        "residual boolean, rotated boolean, nlist int, m int, nbits int,"
        " seed int, hash_fn string",
    ).write.mode("overwrite").parquet(f"{idx}/meta")
    assert sim.ivf_pq_append(
        spark, idx, extra.limit(5), corpus_id="vec_id"
    ) == 2


def test_ivf_flat_append(spark, tmp_path):
    """ivf_append (round 12): the flat sibling of ivf_pq_append — new
    vectors assign to the frozen persisted centroids and append as
    list-partitioned files; searches see rows from both generations."""
    import random

    from timefence_spark.operators import similarity as sim

    rng = random.Random(14)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(90)],
        "vec_id long, embedding array<double>",
    )
    base, extra = emb.where("vec_id < 60"), emb.where("vec_id >= 60")
    idx = str(tmp_path / "flat")
    sim.ivf_build_index(base, corpus_id="vec_id", nlist=4, path=idx)
    sim.ivf_append(spark, idx, extra, corpus_id="vec_id")
    stored = spark.read.parquet(f"{idx}/corpus")
    assert stored.count() == 90
    got = sim.ivf_search(
        spark, idx, emb.where("vec_id < 2"), query_id="vec_id", k=30,
        nprobe=4,
    )
    hits = [r["neighbor_id"] for r in got.collect()]
    assert any(h >= 60 for h in hits) and any(h < 60 for h in hits)
