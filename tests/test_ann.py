"""ANN-path gates (round-2): the LSH operators are verified, not
trusted — recall measured on planted high-similarity clusters, candidate
completeness vs the exact oracle, plane count scaled to corpus size, and
the auto physical-strategy dispatch in embedding_near_dup."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from qfspark import dedup, similarity


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """Deterministic planted clusters: 30 centers x 8 members, members
    perturbed so within-cluster cosine is ~0.97+, across-cluster ~0."""
    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for c in range(30):
        center = rng.randn(64)
        center /= np.linalg.norm(center)
        for m in range(8):
            v = center + 0.025 * rng.randn(64)  # noise norm ~0.2 -> cos ~0.98
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v.astype(np.float32)], c))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).repartition(4).cache()


def test_lsh_near_dup_matches_exact_high_threshold(clustered_emb):
    exact = {(r.doc_id, r.keep_doc_id) for r in dedup.embedding_near_dup(
        clustered_emb, threshold=0.9, method="exact").collect()}
    lsh = {(r.doc_id, r.keep_doc_id) for r in dedup.embedding_near_dup(
        clustered_emb, threshold=0.9, method="lsh").collect()}
    assert len(exact) > 100  # the planted clusters are actually found
    assert lsh == exact


def test_auto_dispatch(clustered_emb):
    # high threshold -> LSH plan: no all-pairs join anywhere
    plan_hi = dedup.embedding_near_dup(
        clustered_emb, threshold=0.95, method="auto"
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan_hi and "Cartesian" not in plan_hi
    # low threshold -> exact fallback, same rows as explicit exact
    lo_auto = {(r.doc_id, r.keep_doc_id) for r in dedup.embedding_near_dup(
        clustered_emb, threshold=0.3, method="auto").collect()}
    lo_exact = {(r.doc_id, r.keep_doc_id) for r in dedup.embedding_near_dup(
        clustered_emb, threshold=0.3, method="exact").collect()}
    assert lo_auto == lo_exact


def test_lsh_recall_gate_on_clustered_data(clustered_emb):
    """recall@k of the LSH top-k vs the exact top-k on data with real
    neighbor structure (k < cluster size, so true neighbors are
    same-cluster, cosine ~0.97): the operator must recover >= 0.9."""
    exact = similarity.cosine_topk(clustered_emb, k=5)
    approx = similarity.lsh_cosine_topk(clustered_emb, k=5,
                                        planes=6, tables=8)
    row = similarity.ann_recall_df(exact, approx, k=5).collect()[0]
    assert row.exact_pairs == 240 * 5
    assert row.recall_at_k >= 0.9
    assert row.recall_at_1 >= 0.95


def test_planes_scale_with_corpus():
    assert similarity.planes_for(100) == 4
    assert similarity.planes_for(64 * (1 << 10)) == 10
    p1m, p1g = similarity.planes_for(10**6), similarity.planes_for(10**9)
    assert p1m < p1g <= 24
    # default planes=None derives from the DataFrame size
    # (covered on the DataFrame path in test_lsh_default_planes below)


def test_lsh_default_planes(clustered_emb):
    # planes=None must run and produce the same schema
    out = similarity.lsh_cosine_topk(clustered_emb, k=3, tables=4)
    assert out.columns == ["query_id", "neighbor_id", "cos", "rank"]
    assert out.count() > 0


def test_near_dup_params_derived_from_threshold():
    """Auto-derived (planes, tables) keep the boundary miss rate small:
    at any threshold >= 0.8 the derived pair-miss probability stays
    below 1e-3 (review finding: corpus-scaled planes alone pushed the
    t=0.8 boundary miss above 50%)."""
    import math

    from qfspark.similarity import planes_for

    for t in (0.8, 0.9, 0.95, 0.99):
        p = 1.0 - math.acos(t) / math.pi
        planes_cap = max(2, int(math.log(0.25) / math.log(p)))
        for n in (10**4, 10**6, 10**9):
            planes = min(planes_for(n), planes_cap)
            miss_per_table = 1.0 - p ** planes
            tables = (1 if miss_per_table <= 0 else
                      min(64, math.ceil(math.log(1e-4)
                                        / math.log(miss_per_table))))
            miss = miss_per_table ** tables
            assert miss < 1e-3, (t, n, planes, tables, miss)
            assert tables <= 64


def test_ivf_recall_on_clustered_data(clustered_emb):
    """IVF with enough probes recovers most exact neighbors on planted
    clusters (the recall dial the operator documents)."""
    exact = similarity.cosine_topk(clustered_emb, k=5)
    approx = similarity.ivf_topk(clustered_emb, k=5,
                                 n_centroids=16, n_probe=4)
    rec = similarity.ann_recall(exact, approx, k=5)
    assert rec["recall_at_k"] >= 0.8, rec


def test_ivf_assignment_total_and_deterministic(clustered_emb):
    cents = similarity.ivf_centroids(clustered_emb, n_centroids=8)
    assert cents.count() == 8
    a1 = sorted(similarity.ivf_assign(clustered_emb, cents,
                                      n_probe=2).collect())
    a2 = sorted(similarity.ivf_assign(clustered_emb, cents,
                                      n_probe=2).collect())
    assert a1 == a2  # no RNG anywhere
    homes = [r for r in a1 if r.probe_rank == 1]
    assert len(homes) == clustered_emb.count()  # every vector has a home
