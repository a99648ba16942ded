"""Similarity-search operator tests: ANN recall vs the exact baseline."""

from __future__ import annotations

from atiesh_spark.operators.similarity import (
    brute_force_topk,
    ivf_ann_topk,
    lsh_ann_topk,
)
from atiesh_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def _topk_ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_brute_force_self_similarity(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    top = brute_force_topk(emb, query_vec_id=0, k=5).collect()
    assert top[0]["vec_id"] == 0 and abs(top[0]["sim"] - 1.0) < 1e-9
    sims = [r["sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_ivf_recall_against_exact(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    exact = set(_topk_ids(brute_force_topk(emb, query_vec_id=0, k=10)))
    ann = set(_topk_ids(ivf_ann_topk(emb, query_vec_id=0, k=10, n_cells=8, n_probe=2)))
    # probing 2/8 cells must still recover a meaningful share of the
    # true top-10 (and always the query itself)
    assert 0 in ann
    assert len(exact & ann) >= 3
    # full probe degenerates to exact
    full = set(_topk_ids(ivf_ann_topk(emb, query_vec_id=0, k=10, n_cells=8, n_probe=8)))
    assert full == exact


def test_lsh_bucket_contains_query(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    ann = lsh_ann_topk(emb, query_vec_id=0, k=10, num_planes=4).collect()
    assert ann[0]["vec_id"] == 0  # query is in its own bucket, sim 1.0
