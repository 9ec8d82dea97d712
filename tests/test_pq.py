"""Product quantization: parity vs a NumPy PQ reference (per-subspace
Lloyd with the module's exact conventions), ADC rank correctness,
malformed-row surfacing, determinism, compression invariants."""

import numpy as np
import pytest

from nolock_social_ocr_services_spark.functions import pq


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200).cache()


def _numpy_pq(ids, mat, m, ks, iters):
    """Reference PQ trainer/encoder with the module's conventions:
    first-ks-by-id init per subspace, strict-argmin lowest-cid
    tie-break, 6-decimal centroid rounding, empty clusters keep their
    previous centroid. Returns (codes[n, m], codebooks[m, ks, d])."""
    n, dim = mat.shape
    d = dim // m
    order = np.argsort(ids, kind="stable")
    cbs = np.stack(
        [mat[order[:ks], s * d : (s + 1) * d].copy() for s in range(m)]
    )
    for _ in range(iters):
        for s in range(m):
            sub = mat[:, s * d : (s + 1) * d]
            dist = ((sub[:, None, :] - cbs[s][None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)
            for c in range(ks):
                members = sub[assign == c]
                if len(members):
                    cbs[s][c] = np.round(members.mean(axis=0), 6)
    codes = np.zeros((n, m), dtype=int)
    for s in range(m):
        sub = mat[:, s * d : (s + 1) * d]
        dist = ((sub[:, None, :] - cbs[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = dist.argmin(axis=1)
    return codes, cbs


def test_codes_match_numpy(spark, emb):
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    expect, _ = _numpy_pq(ids, mat, m=4, ks=4, iters=2)
    cbs = pq.pq_fit(emb, m=4, ks=4, iters=2)
    got = {
        r.vec_id: list(r.codes) for r in pq.pq_encode(emb, cbs).collect()
    }
    assert len(got) == len(ids)
    mismatches = sum(
        1
        for i, vid in enumerate(ids)
        if got[int(vid)] != list(expect[i])
    )
    assert mismatches == 0


def test_adc_ranks_match_numpy(spark, emb):
    """ADC top-k must equal brute-force distance between the raw query
    and each neighbor's RECONSTRUCTION (centroid concat) — that is the
    definition of asymmetric distance; ties break to lower id."""
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    m, ks, iters, nq, k = 4, 4, 2, 5, 3
    codes, cbs = _numpy_pq(ids, mat, m, ks, iters)
    d = mat.shape[1] // m
    recon = np.concatenate(
        [cbs[s][codes[:, s]] for s in range(m)], axis=1
    )
    order = np.argsort(ids, kind="stable")
    expect = {}
    for qpos in order[:nq]:
        qid = int(ids[qpos])
        dist = ((mat[qpos][None, :] - recon) ** 2).sum(axis=1)
        cand = sorted(
            (float(dist[i]), int(ids[i]))
            for i in range(len(ids))
            if int(ids[i]) != qid
        )
        expect[qid] = [nid for _, nid in cand[:k]]
    got = {}
    out = pq.pq_adc_topk(emb, k=k, m=m, ks=ks, iters=iters, nq=nq).collect()
    for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    assert got == expect


def test_codes_within_range_and_compression(spark, emb):
    cbs = pq.pq_fit(emb, m=4, ks=4, iters=2)
    assert len(cbs) == 4 and all(len(cb) == 4 for cb in cbs)
    assert all(len(c) == 16 for cb in cbs for _, c in cb)
    enc = pq.pq_encode(emb, cbs).collect()
    assert all(
        len(r.codes) == 4 and all(0 <= c < 4 for c in r.codes) for r in enc
    )


def test_malformed_vectors_surface_as_null_codes(spark):
    ok = [(i, [float(i + j) for j in range(8)]) for i in range(6)]
    # 92 is the insidious one: length 4 = one full subspace + one EMPTY
    # slice (whose distance fold returns the 0.0 seed) — must still be
    # NULL, not a half-real code
    df = spark.createDataFrame(
        ok + [(90, None), (91, [1.0, 2.0]), (92, [1.0, 2.0, 3.0, 4.0])],
        "vec_id int, embedding array<double>",
    )
    cbs = pq.pq_fit(df, m=2, ks=2, iters=1)
    got = {r.vec_id: r.codes for r in pq.pq_encode(df, cbs).collect()}
    assert got[90] is None and got[91] is None and got[92] is None
    assert all(got[i] is not None for i in range(6))
    # and ADC never scores them
    out = pq.pq_adc_topk(df, k=2, m=2, ks=2, iters=1, nq=2).collect()
    assert all(r.neighbor_id not in (90, 91, 92) for r in out)
    assert all(r.query_id != r.neighbor_id for r in out)


def test_deterministic_across_runs(spark, emb):
    a = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in pq.pq_adc_topk(emb, k=3, nq=5).collect()
    )
    b = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in pq.pq_adc_topk(emb, k=3, nq=5).collect()
    )
    assert a == b and len(a) == 15


def test_ivfpq_ranks_match_numpy(spark, emb):
    """IVF-PQ = coarse Lloyd lists + PQ on residuals + per-list ADC.
    Reference recomputes the whole composition with the modules'
    conventions; candidates are exactly the members of each query's
    nprobe nearest lists."""
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    nlist, nprobe, m, ks, nq, k = 4, 2, 4, 4, 5, 3
    order = np.argsort(ids, kind="stable")

    # coarse: 1 Lloyd round, first-nlist-by-id init, 6dp rounding
    cents = mat[order[:nlist]].copy()
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    for c in range(nlist):
        members = mat[assign == c]
        if len(members):
            cents[c] = np.round(members.mean(axis=0), 6)
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    lists = d2.argmin(axis=1)

    resid = mat - cents[lists]
    codes, cbs = _numpy_pq(ids, resid, m, ks, 1)
    d = mat.shape[1] // m
    recon = np.concatenate([cbs[s][codes[:, s]] for s in range(m)], axis=1)

    expect = {}
    for qpos in order[:nq]:
        qid = int(ids[qpos])
        qd = ((cents - mat[qpos][None, :]) ** 2).sum(axis=1)
        probed = np.argsort(qd, kind="stable")[:nprobe]
        cand = []
        for i in range(len(ids)):
            if int(ids[i]) == qid or lists[i] not in probed:
                continue
            qres = mat[qpos] - cents[lists[i]]
            dist = float(((qres - recon[i]) ** 2).sum())
            cand.append((dist, int(ids[i])))
        expect[qid] = [nid for _, nid in sorted(cand)[:k]]

    got = {}
    out = pq.ivfpq_topk(
        emb, k=k, nlist=nlist, nprobe=nprobe, coarse_iters=1,
        m=m, ks=ks, iters=1, nq=nq,
    ).collect()
    for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    assert got == expect


def test_ivfpq_excludes_unprobed_lists(spark, emb):
    """With nprobe == nlist every list is searched — the result must
    then contain at least as many candidates per query as nprobe=1."""
    full = pq.ivfpq_topk(emb, k=3, nlist=4, nprobe=4, nq=2).collect()
    narrow = pq.ivfpq_topk(emb, k=3, nlist=4, nprobe=1, nq=2).collect()
    assert len(full) >= len(narrow)
    assert all(r.rank <= 3 for r in full)


def test_dim_not_divisible_raises(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [4.0, 5.0, 6.0])],
        "vec_id int, embedding array<double>",
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_fit(df, m=2, ks=2, iters=1)


def test_encode_is_pure_projection(spark, emb):
    """The full-corpus compression pass must be a map-only plan: zero
    exchanges, zero Python."""
    cbs = pq.pq_fit(emb, m=4, ks=4, iters=2)
    plan = (
        pq.pq_encode(emb, cbs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
