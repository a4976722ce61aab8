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
