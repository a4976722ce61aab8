"""Dedup operators: exact vs DuckDB oracle; minhash/simhash via planted dups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timefence_spark.operators import dedup

from tests.conftest import assert_df_equals_sql


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    """documents + planted exact copies and near-copies (one word changed)."""
    base = docs.select("doc_id", "text")
    exact_copies = base.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near_copies = base.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzqx")).alias("text"),
    )
    return base.unionByName(exact_copies).unionByName(near_copies)


def test_exact_dedup_vs_oracle(spark, sf_dir, oracle, docs):
    out = dedup.exact_dedup(
        docs.select("doc_id", "text"), id_col="doc_id", content_cols=["text"]
    ).select("doc_id")
    assert_df_equals_sql(
        out,
        oracle,
        "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)",
    )


def test_exact_dedup_drops_planted_copies(spark, docs_with_dups):
    survivors = dedup.exact_dedup(
        docs_with_dups, id_col="doc_id", content_cols=["text"]
    )
    ids = {r.doc_id for r in survivors.collect()}
    # every planted exact copy (id >= 100000, < 200000) loses to its original
    assert not any(100000 <= i < 200000 for i in ids)
    assert all(i in ids for i in range(10))


def test_duplicate_groups(spark, docs_with_dups):
    groups = dedup.duplicate_groups(
        docs_with_dups, id_col="doc_id", content_cols=["text"]
    ).collect()
    assert len(groups) == 10
    for g in groups:
        assert g.n_copies == 2
        assert g.ids[1] == g.ids[0] + 100000


def test_minhash_finds_planted_near_dups(spark, docs_with_dups):
    pairs = dedup.minhash_lsh_pairs(
        docs_with_dups,
        id_col="doc_id",
        text_col="text",
        num_perm=64,
        bands=16,
        threshold=0.5,
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # exact copies must always collide with jaccard 1.0
    exact_found = sum((i, i + 100000) in found for i in range(10))
    assert exact_found == 10
    for r in pairs:
        if (r.id_a, r.id_b) in {(i, i + 100000) for i in range(10)}:
            assert r.jaccard == 1.0
    # near copies (one appended token) should mostly collide with high jaccard
    near_found = sum((i, i + 200000) in found for i in range(10, 20))
    assert near_found >= 8


def test_minhash_signatures_deterministic(spark, docs):
    d = docs.select("doc_id", "text").limit(20)
    s1 = dedup.minhash_signatures(d, id_col="doc_id", text_col="text").collect()
    s2 = dedup.minhash_signatures(d, id_col="doc_id", text_col="text").collect()
    assert {r.doc_id: r.signature for r in s1} == {r.doc_id: r.signature for r in s2}


def test_minhash_dedup_removes_losers(spark, docs_with_dups):
    kept = dedup.minhash_dedup(
        docs_with_dups, id_col="doc_id", text_col="text", threshold=0.9
    )
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert not any(100000 <= i < 200000 for i in ids)  # exact dups dropped
    assert all(i in ids for i in range(10))  # originals kept


def test_simhash_identical_and_near(spark, docs_with_dups):
    pairs = dedup.simhash_pairs(
        docs_with_dups, id_col="doc_id", text_col="text", max_hamming=3
    ).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in pairs}
    for i in range(10):
        assert found.get((i, i + 100000)) == 0  # identical docs: hamming 0


@pytest.mark.slow
def test_ngram_jaccard_vs_bruteforce_oracle(spark, sf_dir, oracle, docs):
    """Exact algorithm -> full differential test against an O(n^2) DuckDB join."""
    out = dedup.ngram_jaccard_pairs(
        docs.select("doc_id", "text"),
        id_col="doc_id",
        text_col="text",
        n=3,
        threshold=0.2,
        max_doc_freq=10_000,
    )
    sql = r"""
    WITH g AS (
        SELECT doc_id,
               list_distinct([
                   array_to_string(toks[i:i+2], ' ')
                   FOR i IN range(1, GREATEST(len(toks) - 2, 1) + 1)
               ]) AS grams
        FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
              FROM documents)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(
               len(list_intersect(a.grams, b.grams))::DOUBLE /
               (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
               6
           ) AS jaccard
    FROM g a JOIN g b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
          (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.2
    """
    assert_df_equals_sql(out, oracle, sql)


def test_minhash_bucket_shuffle_carries_ids_only(spark, docs):
    """Scale guard (VERDICT r1 item 6): exchanges feeding the LSH bucket
    self-join must carry only (band_hash, id) — never the shingle arrays.
    Shingles re-attach after candidate dedup."""
    import re

    from timefence_spark.plans import _formatted_plan_str

    pairs = dedup.minhash_lsh_pairs(
        docs, id_col="doc_id", text_col="text", num_perm=16, bands=4,
        threshold=0.5,
    )
    txt = _formatted_plan_str(pairs)
    # Any exchange kind (shuffle or broadcast): the bucket-join key may
    # travel either way, but must never ride with the shingle payload.
    blocks = re.findall(r"\(\d+\) \w*Exchange\w*\s*\nInput \[\d+\]: \[([^\]]*)\]", txt)
    assert blocks, "expected Exchange nodes in the LSH plan"
    band_blocks = [b for b in blocks if "band_hash" in b]
    assert band_blocks, "expected an exchange carrying band_hash"
    for b in band_blocks:
        assert "__shingles" not in b, f"shingles shipped pre-dedup: [{b}]"


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_minhash_hash_fn_modes_agree_on_planted_dups(spark, docs_with_dups, hash_fn):
    """Both hash modes must find the planted near-duplicate pairs — the
    algorithm is identical, only the hash primitive differs."""
    pairs = dedup.minhash_lsh_pairs(
        docs_with_dups, id_col="doc_id", text_col="text", num_perm=64,
        bands=16, threshold=0.7, hash_fn=hash_fn,
    )
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 100001) in found and (2, 100002) in found


def test_connected_components_transitive_chain(spark):
    """A~B and B~C but A!~C: all three must land in one component (min id),
    which pairwise minhash_dedup cannot express."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    vertices = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id long")
    out = dedup.connected_components(edges, vertices, id_col="doc_id")
    got = {r["doc_id"]: r["component_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_local_force_gate(spark, monkeypatch):
    """Explicit algorithm='local' refuses driver collects past
    CC_LOCAL_FORCE_EDGES unless force=True; 'auto' is unaffected (its
    collect is capped at local_max_edges and overflows to 'star')."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    vertices = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 10, 11)], "doc_id long"
    )
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    monkeypatch.setattr(dedup, "CC_LOCAL_FORCE_EDGES", 2)
    with pytest.raises(ValueError, match="force=True"):
        dedup.connected_components(
            edges, vertices, id_col="doc_id", algorithm="local"
        )
    forced = dedup.connected_components(
        edges, vertices, id_col="doc_id", algorithm="local", force=True
    )
    assert {r["doc_id"]: r["component_id"] for r in forced.collect()} == want
    # 'auto' ignores the force gate entirely: over local_max_edges it
    # falls through to the distributed star rounds, same labeling
    auto = dedup.connected_components(
        edges, vertices, id_col="doc_id", algorithm="auto", local_max_edges=1
    )
    assert {r["doc_id"]: r["component_id"] for r in auto.collect()} == want


def test_connected_components_rejects_bad_max_iter(spark):
    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    vertices = spark.createDataFrame([(1,), (2,)], "doc_id long")
    with pytest.raises(ValueError, match="max_iter"):
        dedup.connected_components(edges, vertices, id_col="doc_id", max_iter=0)


def test_minhash_components_groups_planted_dups(spark, docs_with_dups):
    comp = dedup.minhash_components(
        docs_with_dups, id_col="doc_id", text_col="text", num_perm=64,
        bands=16, threshold=0.7,
    )
    got = {r["doc_id"]: r["component_id"] for r in comp.collect()}
    # planted near-dup of doc k is doc 100000+k -> same component, min id k
    assert got[100001] == got[1] == 1
    assert got[100002] == got[2] == 2


# ---------------------------------------------------------------------------
# Sampling operators (operators/sampling.py)
# ---------------------------------------------------------------------------


def test_deterministic_shuffle(spark):
    """Same salt => identical global order regardless of input
    partitioning; different salt => different permutation of the SAME
    rows; key_col is kept only on request; the plan is a range exchange,
    never a single-partition window."""
    from timefence_spark.operators import sampling

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = sampling.deterministic_shuffle(df, id_col="doc_id", salt="e0")
    a_ids = [r.doc_id for r in a.collect()]
    again = [
        r.doc_id
        for r in sampling.deterministic_shuffle(
            df.repartition(7), id_col="doc_id", salt="e0"
        ).collect()
    ]
    assert a_ids == again
    b_ids = [
        r.doc_id
        for r in sampling.deterministic_shuffle(
            df, id_col="doc_id", salt="e1"
        ).collect()
    ]
    assert sorted(a_ids) == sorted(b_ids) == list(range(500))
    assert a_ids != b_ids
    assert a_ids != list(range(500))
    assert a.columns == ["doc_id"]
    keyed = sampling.deterministic_shuffle(
        df, id_col="doc_id", salt="e0", key_col="k", partitions=4
    )
    rows = keyed.collect()
    assert keyed.columns == ["doc_id", "k"]
    assert [r.doc_id for r in rows] == a_ids
    assert [(r.k, r.doc_id) for r in rows] == sorted((r.k, r.doc_id) for r in rows)
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "Window" not in plan


def test_hash_sample_determinism_and_nesting(spark):
    from timefence_spark.operators import sampling

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = sampling.hash_sample(df, id_col="doc_id", fraction=0.1, salt="x")
    b = sampling.hash_sample(df, id_col="doc_id", fraction=0.3, salt="x")
    ids_a = {r.doc_id for r in a.collect()}
    ids_b = {r.doc_id for r in b.collect()}
    # deterministic across runs AND partitionings
    again = {
        r.doc_id
        for r in sampling.hash_sample(
            df.repartition(7), id_col="doc_id", fraction=0.1, salt="x"
        ).collect()
    }
    assert ids_a == again
    # same salt => nested samples; different salt => different selection
    assert ids_a.issubset(ids_b)
    other = {
        r.doc_id
        for r in sampling.hash_sample(
            df, id_col="doc_id", fraction=0.1, salt="y"
        ).collect()
    }
    assert other != ids_a
    # fraction is approximately honored
    assert 0.05 < len(ids_a) / 2000 < 0.15
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fraction"):
        sampling.hash_sample(df, id_col="doc_id", fraction=1.5)


def test_stratified_sample_quota_and_determinism(spark):
    from pyspark.sql import functions as F

    from timefence_spark.operators import sampling

    df = (
        spark.range(500)
        .withColumnRenamed("id", "doc_id")
        .withColumn("grp", (F.col("doc_id") % 7).cast("int"))
    )
    out = sampling.stratified_sample(
        df, strata_cols="grp", n_per_stratum=5, id_col="doc_id", salt="s"
    )
    counts = {r.grp: r["count"] for r in out.groupBy("grp").count().collect()}
    assert all(c == 5 for c in counts.values()) and len(counts) == 7
    # nested: n=2 selection is a subset of n=5 under the same salt
    small = sampling.stratified_sample(
        df, strata_cols="grp", n_per_stratum=2, id_col="doc_id", salt="s"
    )
    assert {r.doc_id for r in small.collect()} <= {r.doc_id for r in out.collect()}


def test_split_by_hash_partition_and_weights(spark):
    from timefence_spark.operators import sampling

    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    out = sampling.split_by_hash(
        df, id_col="doc_id", weights={"train": 0.8, "val": 0.1, "test": 0.1}
    )
    rows = out.collect()
    assert len(rows) == 5000  # total partition: every row exactly one split
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert 0.75 < counts["train"] / 5000 < 0.85
    assert 0.05 < counts["val"] / 5000 < 0.15
    # growing the corpus never reassigns an existing id
    bigger = sampling.split_by_hash(
        spark.range(10000).withColumnRenamed("id", "doc_id"),
        id_col="doc_id",
        weights={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    first = {r.doc_id: r["split"] for r in out.collect()}
    grown = {r.doc_id: r["split"] for r in bigger.collect()}
    assert all(grown[i] == s for i, s in first.items())
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum"):
        sampling.split_by_hash(df, id_col="doc_id", weights={"a": 0.5, "b": 0.4})


def test_decontaminate_flags_and_counts(spark):
    from timefence_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),     # exact bench hit
            (2, "one two three four five six seven"),       # clean
            (3, "pad alpha beta gamma delta epsilon tail"), # embedded overlap
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id int, text string"
    )
    out = {
        r.doc_id: r.asDict()
        for r in decontaminate(
            docs, bench, id_col="doc_id", text_col="text", n=5, min_overlap=1
        ).collect()
    }
    assert out[1]["contaminated"] and out[1]["matched_grams"] == 2
    assert not out[2]["contaminated"] and out[2]["matched_grams"] == 0
    assert out[3]["contaminated"] and out[3]["matched_grams"] == 1
    # min_overlap raises the bar
    strict = {
        r.doc_id: r["contaminated"]
        for r in decontaminate(
            docs, bench, id_col="doc_id", text_col="text", n=5, min_overlap=2
        ).collect()
    }
    assert strict[1] and not strict[3]


def test_dedup_keep_best_prefers_quality(spark):
    """The highest-quality member of each near-dup cluster survives, not
    the min id; singletons always survive."""
    from timefence_spark.operators import dedup as dd

    good = "the cat sat on the mat and the dog sat on the log nearby today"
    bad = "the cat sat on the mat and the dog sat on the log nearby 999 999 999 999 999 999 999 999 999 999"
    rows = [
        (1, bad),                      # near-dup cluster {1, 2}: digit-heavy copy
        (2, good + " today"),          # cleaner copy, higher quality, bigger id
        (3, "completely different text about spark plans and shuffles here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dd.dedup_keep_best(
        df, id_col="doc_id", text_col="text", num_perm=32, bands=16,
        shingle_k=3, threshold=0.5,
    ).collect()
    survivors = {r["doc_id"] for r in out}
    assert 3 in survivors                      # singleton survives
    assert survivors & {1, 2} == {2}, out      # quality beats min-id
    comp = {r["doc_id"]: r["component_id"] for r in out}
    assert comp[2] == 1                        # component labeled by min id


@pytest.mark.slow
def test_max_bucket_size_skips_hot_buckets(spark):
    """A boilerplate mega-cluster (identical text) floods one bucket per
    band; the cap drops those buckets, bounding candidate pairs, while
    small clusters keep matching."""
    from timefence_spark.operators import dedup as dd

    boiler = "all rights reserved terms of service apply to this page now"
    rows = [(i, boiler) for i in range(30)]           # hot: 30-doc bucket
    rows += [
        (100, "a rare unique document about catalyst optimizer internals"),
        (101, "a rare unique document about catalyst optimizer internals!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(id_col="doc_id", text_col="text", num_perm=32, bands=16,
              shingle_k=3, threshold=0.5)
    uncapped = dd.minhash_lsh_pairs(df, **kw)
    assert uncapped.count() >= 30 * 29 / 2            # hot cluster all-pairs
    capped = dd.minhash_lsh_pairs(df, max_bucket_size=10, **kw)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got                          # small cluster survives
    assert not any(a < 100 and b < 100 for a, b in got)  # hot cluster skipped

    with pytest.raises(ValueError):
        dd.minhash_lsh_pairs(df, max_bucket_size=1, **kw)

    # simhash variant: identical texts share every chunk; cap skips them
    sim_capped = dd.simhash_pairs(
        df, id_col="doc_id", text_col="text", max_bucket_size=10
    )
    pairs = {(r["id_a"], r["id_b"]) for r in sim_capped.collect()}
    assert not any(a < 100 and b < 100 for a, b in pairs)


@pytest.mark.slow
def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches the loop's lineage pins from executor
    -local blocks to reliable-FS checkpoints: same labels either way,
    and the directory actually receives checkpoint data."""
    import os

    from timefence_spark.operators.dedup import connected_components

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    v = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    want = sorted(
        (r["doc_id"], r["component_id"])
        for r in connected_components(
            e, v, id_col="doc_id", algorithm="star"
        ).collect()
    )
    ckpt = str(tmp_path / "cc_ckpt")
    got = sorted(
        (r["doc_id"], r["component_id"])
        for r in connected_components(
            e, v, id_col="doc_id", algorithm="star", checkpoint_dir=ckpt
        ).collect()
    )
    assert got == want
    written = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs
    ]
    assert written, "reliable checkpoint wrote nothing under checkpoint_dir"


def test_build_reliable_checkpoint(spark, tmp_path):
    """build(checkpoint_dir=...) pins the spine to reliable storage on a
    non-zero-join plan (strategy='join' forces the rowid spine path)."""
    import os

    import timefence_spark as tf

    sf = "/root/testdata/sf0.001"
    labels = tf.Labels(
        path=f"{sf}/orders.parquet", keys="o_custkey",
        label_time="o_orderdate", target="o_totalprice",
    )
    feat = tf.Feature(
        tf.Source(f"{sf}/orders.parquet", keys="o_custkey",
                  timestamp="o_orderdate"),
        sql="SELECT o_custkey, o_orderdate AS feature_time, "
            "MAX(o_totalprice) AS prev_total FROM {source} GROUP BY 1, 2",
        name="prev_spend", embargo="1d", on_duplicate="keep_any",
    )
    ckpt = str(tmp_path / "build_ckpt")
    out = str(tmp_path / "train.parquet")
    res = tf.build(
        labels, [feat], out, spark=spark, strategy="join",
        checkpoint_dir=ckpt,
    )
    assert res.stats.row_count > 0
    written = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs
    ]
    assert written, "reliable checkpoint wrote nothing under checkpoint_dir"


@pytest.mark.slow
def test_star_contraction_mid_size_chain_graph(spark):
    """Distributed star path on a graph too deep for comfortable
    propagation: 200 chains of 500 nodes (diameter 500, 99.8K edges).
    Star contraction must converge in O(log n) rounds within the default
    max_iter and label every chain with its block minimum."""
    from pyspark.sql import functions as F

    from timefence_spark.operators.dedup import connected_components

    n, block = 100_000, 500
    ids = spark.range(n)
    e = ids.where((F.col("id") + 1) % block != 0).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    v = ids.select(F.col("id").alias("doc_id"))
    out = connected_components(e, v, id_col="doc_id", algorithm="star")
    bad = out.where(
        F.col("component_id") != (F.col("doc_id") - F.col("doc_id") % block)
    ).count()
    assert bad == 0


def test_duplicate_spans_known_answers(spark):
    """Hand-checked exact-substring stats: doc 2 copies doc 1's opening
    six tokens, so with k=3 its first four windows are duplicates; short
    docs have zero windows; document scope only flags in-doc repeats."""
    from timefence_spark import Corpus
    from timefence_spark.operators.dedup import duplicate_spans

    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f x y"),
        (3, "tiny"),
        (4, "p q r p q r p q"),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in duplicate_spans(
            docs, id_col="doc_id", text_col="text", k=3
        ).collect()
    }
    # doc1: 6 windows, all first -> 0 dups. doc2: 6 windows, the 4
    # windows inside "a b c d e f" repeat doc1's.
    assert (out[1]["n_windows"], out[1]["n_dup_windows"]) == (6, 0)
    assert (out[2]["n_windows"], out[2]["n_dup_windows"]) == (6, 4)
    assert out[2]["dup_fraction"] == pytest.approx(4 / 6, abs=1e-6)
    assert (out[3]["n_windows"], out[3]["dup_fraction"]) == (0, 0.0)
    assert (out[5]["n_windows"], out[5]["dup_fraction"]) == (0, 0.0)
    # doc4 "p q r p q r p q": windows pqr qrp rpq pqr qrp rpq -> last 3 dup
    assert (out[4]["n_windows"], out[4]["n_dup_windows"]) == (6, 3)

    # document scope: doc2's overlap with doc1 no longer counts, doc4's
    # in-doc repeats still do
    doc_scope = {
        r["doc_id"]: r["n_dup_windows"]
        for r in duplicate_spans(
            docs, id_col="doc_id", text_col="text", k=3, scope="document"
        ).collect()
    }
    assert doc_scope[2] == 0 and doc_scope[4] == 3

    kept = {
        r["doc_id"]
        for r in Corpus(docs)
        .filter_substring_dup(max_dup_fraction=0.4, k=3)
        .df.collect()
    }
    assert kept == {1, 3, 4, 5} - {4}  # doc4 at 0.5 > 0.4 dropped too
    with pytest.raises(ValueError):
        duplicate_spans(docs, id_col="doc_id", text_col="text", scope="x")


def test_duplicate_spans_hash_mode_matches_text_mode(spark):
    """key_by='hash' shuffles 16-byte gram keys instead of token strings
    but must report identical duplication stats, including short docs
    and in-document repeats."""
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f x y"),
        (3, "tiny"),
        (4, "p q r p q r p q"),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for scope in ("corpus", "document"):
        kw = dict(id_col="doc_id", text_col="text", k=3, scope=scope)
        by_text = sorted(map(tuple, dedup.duplicate_spans(docs, **kw).collect()))
        by_hash = sorted(
            map(tuple, dedup.duplicate_spans(docs, key_by="hash", **kw).collect())
        )
        assert by_text == by_hash, scope
    with pytest.raises(ValueError, match="key_by"):
        dedup.duplicate_spans(
            docs, id_col="doc_id", text_col="text", k=3, key_by="sha"
        )


def test_remove_duplicate_spans_known_answers(spark):
    """Removal half of exact-substring dedup: doc2's copied opening is
    cut (its windows repeat doc1's), first occurrences and short docs
    keep their text, in-doc repeats are cut under both scopes, and the
    hash keying changes nothing."""
    from timefence_spark import Corpus
    from timefence_spark.operators.dedup import remove_duplicate_spans

    rows = [
        (1, "A b c d e f g h"),
        (2, "a b c d e f x y"),
        (3, "tiny"),
        (4, "p q r p q r p q"),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            docs, id_col="doc_id", text_col="text", k=3
        ).collect()
    }
    assert out[1]["text"] == "A b c d e f g h" and out[1]["n_removed"] == 0
    assert out[2]["text"] == "x y" and out[2]["n_removed"] == 6
    assert out[3]["text"] == "tiny" and out[3]["n_tokens"] == 1
    assert out[4]["text"] == "p q r" and out[4]["n_removed"] == 5
    assert out[5]["text"] == "" and out[5]["n_tokens"] == 0

    doc_scope = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(
            docs, id_col="doc_id", text_col="text", k=3, scope="document"
        ).collect()
    }
    assert doc_scope[2] == "a b c d e f x y"  # cross-doc repeat survives
    assert doc_scope[4] == "p q r"

    by_hash = sorted(
        map(
            tuple,
            remove_duplicate_spans(
                docs, id_col="doc_id", text_col="text", k=3, key_by="hash"
            ).collect(),
        )
    )
    assert by_hash == sorted(
        map(
            tuple,
            remove_duplicate_spans(
                docs, id_col="doc_id", text_col="text", k=3
            ).collect(),
        )
    )

    # facade: text rewritten in place, payload columns preserved
    payload = docs.withColumn("src", F.lit("web"))
    got = {
        r["doc_id"]: (r["text"], r["src"])
        for r in Corpus(payload).remove_substring_dups(k=3).df.collect()
    }
    assert got[2] == ("x y", "web") and got[1][0] == "A b c d e f g h"
    with pytest.raises(ValueError, match="scope"):
        remove_duplicate_spans(docs, id_col="doc_id", text_col="text", scope="x")


def test_cc_local_broadcast_gated_past_auto_cap(spark, monkeypatch):
    """ADVICE r7: the driver union-find labeling join must only PIN a
    broadcast when the edge set came through the auto-path cap; an
    explicit algorithm='local' past the cap keeps the size-gated default
    join (AQE may still choose broadcast — we just must not force it)."""
    from timefence_spark.operators import dedup as dd

    seen = []
    orig = dd._cc_labels_from_mapping

    def spy(vertices, mapping, id_col, broadcast=False):
        seen.append(broadcast)
        return orig(vertices, mapping, id_col, broadcast=broadcast)

    monkeypatch.setattr(dd, "_cc_labels_from_mapping", spy)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (6, 7), (7, 8)], "id_a long, id_b long"
    )
    verts = spark.range(1, 10).select(F.col("id"))

    expected = {
        r["id"]: r["component_id"]
        for r in dd.connected_components(
            edges, verts, id_col="id", algorithm="local"
        ).collect()
    }
    assert seen == [True]  # 5 edges <= default cap: broadcast pinned

    seen.clear()
    got = {
        r["id"]: r["component_id"]
        for r in dd.connected_components(
            edges, verts, id_col="id", algorithm="local", local_max_edges=2
        ).collect()
    }
    assert seen == [False]  # past the cap: size-gated default join
    assert got == expected


def test_token_budget_sample(spark):
    """Per-stratum token quotas: each stratum keeps its hash-order
    prefix within budget (maximal — the next doc would overflow), quotas
    nest for the same salt, missing strata follow default_budget, NULL
    counts weigh 0, selection is partitioning-invariant, and the
    decomposed running sum agrees across n_buckets."""
    import pytest as _pytest

    from timefence_spark.operators import sampling

    rows = [(i, "a" if i % 2 else "b", 10 + (i % 7)) for i in range(200)]
    rows.append((200, "a", None))  # NULL tokens weigh 0
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")

    def run(budgets, default=None, buckets=8, d=df):
        return sampling.token_budget_sample(
            d, id_col="doc_id", token_col="n_tok", strata_col="lang",
            budgets=budgets, default_budget=default, salt="s",
            n_buckets=buckets,
        )

    kept = run({"a": 300}).collect()
    a_rows = [r for r in kept if r.lang == "a"]
    b_rows = [r for r in kept if r.lang == "b"]
    assert len(b_rows) == 100                      # no budget -> keep all
    a_total = sum(r.n_tok or 0 for r in a_rows)
    assert a_total <= 300
    # maximal prefix: adding ANY excluded doc's tokens overflows the
    # smallest excluded candidate... check via the next-in-order doc:
    assert a_total > 300 - 17                      # max doc weight is 16
    # nesting: same salt, bigger budget is a superset
    bigger = {r.doc_id for r in run({"a": 600}).collect() if r.lang == "a"}
    assert {r.doc_id for r in a_rows} <= bigger
    # default budget applies to missing strata
    kept_d = run({"a": 300}, default=0).collect()
    assert all(r.lang == "a" for r in kept_d)
    # decomposition-invariant: same rows for any bucket count
    for nb in (1, 3, 64):
        assert {r.doc_id for r in run({"a": 300}, buckets=nb).collect()} == {
            r.doc_id for r in a_rows
        } | {r.doc_id for r in b_rows}
    # partitioning-invariant
    assert {
        r.doc_id for r in run({"a": 300}, d=df.repartition(13)).collect()
    } == {r.doc_id for r in kept}
    with _pytest.raises(ValueError, match="non-negative"):
        run({"a": -1})
    with _pytest.raises(ValueError, match="n_buckets"):
        run({"a": 1}, buckets=0)


def test_token_budget_sample_null_strata(spark):
    """A NULL stratum is a real group: rows keep/cut per default_budget
    instead of silently vanishing in the offsets join (code-review r8
    finding: the plain equi-join dropped every NULL-stratum row)."""
    from timefence_spark.operators import sampling

    rows = [(i, "a" if i < 10 else None, 10) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    kept = sampling.token_budget_sample(
        df, id_col="doc_id", token_col="n_tok", strata_col="lang",
        budgets={"a": 50}, default_budget=None, salt="s",
    ).collect()
    assert len([r for r in kept if r.lang is None]) == 10  # all kept
    assert len([r for r in kept if r.lang == "a"]) == 5    # 50/10 tokens
    capped = sampling.token_budget_sample(
        df, id_col="doc_id", token_col="n_tok", strata_col="lang",
        budgets={"a": 50}, default_budget=30, salt="s",
    ).collect()
    assert len([r for r in capped if r.lang is None]) == 3  # 30/10 tokens
