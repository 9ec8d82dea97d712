"""Distributed k-means trainer: parity vs a NumPy Lloyd reference,
inertia monotonicity, empty-cluster fallback, determinism."""

import numpy as np
import pytest

from nolock_social_ocr_services_spark.functions import clustering


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200).cache()


def _numpy_lloyd(ids, mat, k, iters):
    """Reference Lloyd's with the module's exact conventions: first-k-by-id
    init, (dist, cid) tie-break, 6-decimal centroid rounding, empty
    clusters keep their previous centroid."""
    order = np.argsort(ids, kind="stable")
    cents = mat[order[:k]].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                cents[c] = np.round(members.mean(axis=0), 6)
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), cents


def test_assignments_match_numpy(spark, emb):
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    expect, _ = _numpy_lloyd(ids, mat, k=4, iters=2)
    got = {
        r.vec_id: r.cluster
        for r in clustering.kmeans_assignments(emb, k=4, iters=2).collect()
    }
    assert len(got) == len(ids)
    mismatches = sum(
        1 for i, vid in enumerate(ids) if got[int(vid)] != expect[i]
    )
    assert mismatches == 0


def test_fit_reduces_inertia(spark, emb):
    rows = emb.collect()
    mat = np.array([r.embedding for r in rows], dtype=np.float64)

    def inertia(cent_rows):
        cents = np.array([c for _, c in cent_rows])
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    i1 = inertia(clustering.kmeans_fit(emb, k=4, iters=1))
    i3 = inertia(clustering.kmeans_fit(emb, k=4, iters=3))
    assert i3 <= i1 + 1e-6


def test_empty_cluster_keeps_previous_centroid(spark):
    # duplicate points make both init centroids coincide at [0,0]; the
    # (dist, cid) tie-break sends every point to cid 0, so cluster 1
    # empties immediately and must keep its previous centroid.
    pts = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),
        (2, [5.0, 5.0]),
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    cents = dict(clustering.kmeans_fit(df, k=2, iters=1))
    assert cents[1] == [0.0, 0.0]  # emptied -> survives unchanged
    m = round(5.0 / 3.0, 6)
    assert cents[0] == [m, m]  # mean of all three points, rounded


def test_deterministic_across_runs(spark, emb):
    a = sorted(
        (r.vec_id, r.cluster)
        for r in clustering.kmeans_assignments(emb, k=4, iters=2).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster)
        for r in clustering.kmeans_assignments(emb, k=4, iters=2).collect()
    )
    assert a == b


def test_null_or_ragged_embedding_gets_null_cluster(spark):
    """NULL / wrong-length vectors have NULL distance to every centroid;
    they must surface as cluster=NULL, not a real-looking -1 a
    downstream stratify would group on."""
    ok = [(i, [float(i), 0.0]) for i in range(4)]
    df = spark.createDataFrame(
        ok + [(90, None), (91, [1.0])],
        "vec_id int, embedding array<double>",
    )
    got = {
        r.vec_id: r.cluster
        for r in clustering.kmeans_assignments(df, k=2, iters=1).collect()
    }
    assert got[90] is None and got[91] is None
    assert all(v in (0, 1) for k, v in got.items() if k < 10)
