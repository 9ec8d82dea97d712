"""Similarity search: brute-force correctness vs NumPy, LSH recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nolock_social_ocr_services_spark.functions import similarity as sim


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200).cache()


def test_cosine_topk_matches_numpy(spark, emb):
    got = sim.cosine_topk(emb, k=3)
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    np.fill_diagonal(sims, -np.inf)
    by_query = {}
    for r in got.collect():
        by_query.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.sim))
    assert len(by_query) == len(ids)
    for qi, qid in enumerate(ids):
        order = np.argsort(-sims[qi], kind="stable")[:3]
        expected = [int(ids[j]) for j in order]
        got_n = [n for _, n, _ in sorted(by_query[qid])]
        got_s = [s for _, _, s in sorted(by_query[qid])]
        assert got_n == expected, qid
        np.testing.assert_allclose(got_s, sims[qi][order], rtol=1e-6)


def test_lsh_recall_against_exact(spark, emb):
    exact = sim.cosine_topk(emb, k=3)
    approx = sim.lsh_topk(emb, k=3, bits=2, dim=64)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # random 64-dim embeddings have weak angular locality; 2-bit SRP
    # buckets give partial recall (theory ~0.37 for sim~0.33 neighbors)
    assert recall > 0.2
    # every approx pair must be a true pair ranking-wise (no fabrications):
    # sims of returned pairs match the exact computation
    sims_a = {(r.query_id, r.neighbor_id): r.sim for r in approx.collect()}
    all_exact = sim.cosine_topk(emb, k=200)
    sims_e = {(r.query_id, r.neighbor_id): r.sim for r in all_exact.collect()}
    for pair, s in list(sims_a.items())[:50]:
        assert sims_e[pair] == pytest.approx(s, rel=1e-9)


def test_srp_buckets_deterministic(spark, emb):
    b1 = sim.lsh_topk(emb, k=2, bits=6, seed=7, dim=64).collect()
    b2 = sim.lsh_topk(emb, k=2, bits=6, seed=7, dim=64).collect()
    assert sorted(map(tuple, b1)) == sorted(map(tuple, b2))


def test_lsh_plan_build_runs_no_job(spark, emb):
    """Building the lsh_topk plan must not trigger a Spark job (dim
    comes from the argument / column metadata, never from .first())."""
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup())
    df = sim.lsh_topk(emb, k=2, bits=4, dim=64)
    assert df.columns == ["query_id", "neighbor_id", "rank", "sim"]
    assert set(tracker.getJobIdsForGroup()) == before
    with pytest.raises(ValueError, match="dimension unknown"):
        sim.lsh_topk(emb, k=2, bits=4)
    # dim via column metadata also builds without a job
    with_meta = emb.withColumn(
        "embedding", F.col("embedding").alias("embedding", metadata={"dim": 64})
    )
    sim.lsh_topk(with_meta, k=2, bits=4)
    assert set(tracker.getJobIdsForGroup()) == before


def test_unit_vector_norm(spark, emb):
    unit = sim.with_unit_vector(emb)
    norms = unit.select(
        F.aggregate(
            F.zip_with("unit", "unit", lambda x, y: x * y),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("n2")
    ).collect()
    for r in norms:
        assert r.n2 == pytest.approx(1.0, rel=1e-6)  # float32 inputs


def test_near_dup_pairs_threshold_and_ordering(spark, sf_dir):
    """Embedding-cosine near-dup: pairs are unordered (id_a < id_b),
    every returned cosine >= threshold, and raising the threshold only
    removes pairs (monotone). Value parity vs DuckDB is covered by the
    near_dup_pairs oracle query."""
    from nolock_social_ocr_services_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t = 0.3
    pairs = sim.near_dup_pairs(emb, threshold=t).collect()
    assert pairs, "threshold should produce pairs on the driver embeddings"
    for r in pairs:
        assert r.id_a < r.id_b
        assert float(r.cosine_r) >= t - 1e-6
    tighter = {
        (r.id_a, r.id_b)
        for r in sim.near_dup_pairs(emb, threshold=t + 0.05).collect()
    }
    assert tighter <= {(r.id_a, r.id_b) for r in pairs}
    assert len(tighter) < len(pairs)


def _near_dup_fixture(spark):
    """50 random base vectors + 25 perturbed near-copies (cosine ~0.998):
    a corpus with KNOWN near-duplicate structure."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((50, 64))
    noisy = base[:25] + 0.05 * rng.standard_normal((25, 64))
    mat = np.vstack([base, noisy]).astype(np.float32)
    rows = [(i, mat[i].tolist()) for i in range(len(mat))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bucketed_near_dup_subset_and_recall(spark):
    """The bucketed variant must return ONLY true pairs (exact verify =>
    subset of brute force) and find nearly all true near-duplicates:
    at cosine ~0.998 the 16-bit SRP hamming is ~0.4 expected, so the
    hamming<=3 gate keeps ~99.9% of dup pairs."""
    df = _near_dup_fixture(spark)
    brute = {
        (r.id_a, r.id_b)
        for r in sim.near_dup_pairs(df, threshold=0.9).collect()
    }
    assert len(brute) == 25  # each perturbed copy pairs with its base
    bucketed = {
        (r.id_a, r.id_b)
        for r in sim.near_dup_pairs_bucketed(
            df, threshold=0.9, dim=64, bits=16, bands=4
        ).collect()
    }
    assert bucketed <= brute  # precision 1 by construction
    recall = len(bucketed) / len(brute)
    assert recall >= 0.9, f"recall {recall}"


def test_bucketed_near_dup_hamming_gate_is_pigeonhole_exact(spark):
    """Every brute-force pair whose signature hamming is <= bands-1 must
    be found by the banded join (the pigeonhole guarantee) — the ONLY
    pairs the bucketed form may miss are those with hamming > bands-1."""
    df = _near_dup_fixture(spark)
    planes = sim.random_hyperplanes(64, 16, 42)
    sigs = {
        r.id: r.sig
        for r in sim.with_unit_vector(df)
        .select(
            F.col("vec_id").alias("id"),
            sim.srp_signature(
                F.transform(F.col("embedding"), lambda x: x.cast("double")),
                planes,
            ).cast("long").alias("sig"),
        )
        .collect()
    }
    brute = sim.near_dup_pairs(df, threshold=0.5).collect()
    expected = {
        (r.id_a, r.id_b)
        for r in brute
        if bin(sigs[r.id_a] ^ sigs[r.id_b]).count("1") <= 3
    }
    got = {
        (r.id_a, r.id_b)
        for r in sim.near_dup_pairs_bucketed(
            df, threshold=0.5, dim=64, bits=16, bands=4
        ).collect()
    }
    assert got == expected


def test_ivf_topk_exact_within_cluster(spark, emb):
    """IVF with nprobe=1: for every query, returned neighbors must be the
    exact top-k among same-cluster vectors (verified with NumPy)."""
    import numpy as np

    got = sim.ivf_topk(emb, k=3, n_centroids=8)
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cent_idx = {int(ids[i]): i for i in range(len(ids)) if ids[i] < 8}
    cmat = np.array([mat[cent_idx[c]] for c in sorted(cent_idx)])
    assign = np.argmax(mat @ cmat.T, axis=1)
    by_query = {}
    for r in got.collect():
        by_query.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    for qi, qid in enumerate(ids):
        members = [j for j in range(len(ids)) if assign[j] == assign[qi] and j != qi]
        if not members:
            assert qid not in by_query
            continue
        sims_q = mat[qi] @ mat[members].T
        order = sorted(
            range(len(members)), key=lambda j: (-sims_q[j], ids[members[j]])
        )[:3]
        expected = [int(ids[members[j]]) for j in order]
        got_n = [n for _, n in sorted(by_query[qid])]
        assert got_n == expected, qid


def test_ivf_recall_vs_exact(spark, emb):
    """Recall < 1 by construction but must be substantial (same-cluster
    neighbors dominate for clustered data; random data still overlaps)."""
    exact = {(r.query_id, r.neighbor_id) for r in sim.cosine_topk(emb, k=3).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in sim.ivf_topk(emb, k=3, n_centroids=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert 0.05 < recall <= 1.0, recall


def test_quantize_int8_bounds_and_zero_vectors(spark):
    from nolock_social_ocr_services_spark.functions import similarity as sim

    df = spark.createDataFrame(
        [
            ("a", [1.0, -2.0, 4.0]),      # scale 4 -> q = [32, -64, 127]
            ("b", [0.0, 0.0, 0.0]),       # zero vector -> all zeros
            ("c", [-0.5, 0.5, 0.25]),     # scale .5 -> [-127, 127, 64]
        ],
        "vec_id string, embedding array<float>",
    )
    got = {r.vec_id: r.asDict() for r in sim.quantize_int8(df).collect()}
    assert got["a"] == {
        "vec_id": "a", "q_sum": 95, "q_min": -64, "q_max": 127, "n_sat": 1,
    }
    assert got["b"] == {
        "vec_id": "b", "q_sum": 0, "q_min": 0, "q_max": 0, "n_sat": 0,
    }
    assert got["c"] == {
        "vec_id": "c", "q_sum": 64, "q_min": -127, "q_max": 127, "n_sat": 2,
    }


def test_zero_norm_vectors_excluded_everywhere(spark):
    """A zero-norm vector has no cosine direction: it must appear in no
    top-k output (as query or neighbor) for the exact, LSH, and IVF
    paths — not emit NULL-sim rows or pile into SRP bucket 0."""
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    for out in (
        sim.cosine_topk(df, k=2),
        sim.lsh_topk(df, k=2, bits=2, dim=2),
        sim.ivf_topk(df, k=2, n_centroids=2),
    ):
        got = out.collect()
        ids = {r.query_id for r in got} | {r.neighbor_id for r in got}
        assert 2 not in ids
        assert all(r.sim is not None for r in got)


def test_ivf_centroids_survive_non_dense_ids(spark):
    """Centroid selection is 'first n by id', not 'id < n': shifted id
    spaces must still train n_centroids and return neighbors."""
    rows = [(1000 + i, [float(i % 3 + 1), float(i % 5 + 1)]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = sim.ivf_topk(df, k=1, n_centroids=2).collect()
    assert len(out) > 0


def test_semantic_dedup_flags_within_cluster_near_dups(spark):
    """SemDeDup: a vector with an earlier same-cluster mate above the
    cosine threshold is a duplicate; zero-norm vectors are never
    flagged; the earliest vector of a dup group always survives."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.999, 0.01]),   # near-dup of 0
        (3, [0.0, 0.0]),      # zero-norm: clustered but never a dup
        (4, [0.01, 0.999]),   # near-dup of 1
        (5, [0.7, 0.7]),      # diagonal: in some cluster, below 0.95
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = {
        r.vec_id: r.is_dup
        for r in sim.semantic_dedup(
            df, k=2, iters=2, threshold=0.95
        ).collect()
    }
    assert got[0] is False and got[1] is False
    assert got[2] is True and got[4] is True
    assert got[3] is False
    assert len(got) == 6


def test_ivf_nprobe_improves_recall_monotonically(spark, emb):
    """nprobe is the IVF recall dial: probing a second inverted list
    must never lose exact-top-k hits and each (query, neighbor) pair
    must still appear at most once (lists are disjoint, probes
    distinct)."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.cosine_topk(emb, k=3).collect()
    }

    def recall(nprobe):
        rows = sim.ivf_topk(emb, k=3, n_centroids=8, nprobe=nprobe).collect()
        pairs = [(r.query_id, r.neighbor_id) for r in rows]
        assert len(pairs) == len(set(pairs))  # no duplicate candidates
        return len(exact & set(pairs)) / len(exact)

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1
    assert r2 > 0.05


# -- margin-based bitext mining -------------------------------------------------


def test_margin_mine_finds_parallel_pairs(spark):
    """Two clean parallel pairs are mined; a source that is equally
    close to every target has margin ~1.0 and is filtered out."""
    from nolock_social_ocr_services_spark.functions import similarity as sim

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),    # src, parallel with 1
        (1, [0.99, 0.1, 0.0, 0.0]),   # tgt
        (2, [0.0, 1.0, 0.0, 0.0]),    # src, parallel with 3
        (3, [0.0, 0.98, 0.15, 0.0]),  # tgt
        (4, [0.5, 0.5, 0.5, 0.5]),    # src hub: similar to everything
        (5, [0.0, 0.0, 0.0, 1.0]),    # tgt far from all sources
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    src = emb.filter("vec_id % 2 = 0")
    tgt = emb.filter("vec_id % 2 = 1")
    all_m = {
        r.src_id: r
        for r in sim.margin_mine(src, tgt, knn=2, threshold=0.0).collect()
    }
    # parallel pairs matched with clearly higher margins than the hub,
    # whose neighborhood density eats its raw cosine
    assert all_m[0].tgt_id == 1 and all_m[2].tgt_id == 3
    assert all_m[0].margin > all_m[4].margin
    assert all_m[2].margin > all_m[4].margin
    # at a threshold between them, only the parallel pairs are mined
    mined = {
        r.src_id
        for r in sim.margin_mine(src, tgt, knn=2, threshold=1.3).collect()
    }
    assert mined == {0, 2}


def test_margin_mine_suppresses_hub_targets(spark):
    """A hub TARGET (close to every source) must clear a higher bar:
    a non-hub target with the same raw cosine wins the margin race."""
    from nolock_social_ocr_services_spark.functions import similarity as sim

    rows = [
        (0, [1.0, 0.2, 0.0]),   # src under test
        (2, [0.0, 1.0, 0.0]),   # other srcs that love the hub
        (4, [0.0, 0.8, 0.6]),
        (1, [1.0, 0.21, 0.0]),  # clean tgt: only near src 0
        (3, [0.30, 0.91, 0.28]),  # hub tgt: decent cos to ALL srcs
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    src = emb.filter("vec_id % 2 = 0")
    tgt = emb.filter("vec_id % 2 = 1")
    out = {r.src_id: r for r in sim.margin_mine(src, tgt, knn=2, threshold=0.0).collect()}
    # src 0 picks the dedicated target, not the hub
    assert out[0].tgt_id == 1


def test_gram_matrix_matches_numpy_brute_force(spark):
    """Distributed per-batch partials must sum to the exact int64 gram
    matrix numpy computes in one shot on the quantized vectors."""
    import numpy as np

    from nolock_social_ocr_services_spark.functions import similarity as sim

    rng = np.random.default_rng(7)
    X = rng.standard_normal((40, 5)).astype(np.float32) * 0.4
    rows = [(i, X[i].tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sim.gram_matrix(emb, scale=1_000_000).collect()
    # reference: quantize with the same half-up rule, then exact matmul
    scaled = X.astype(np.float64) * 1_000_000
    Q = (np.floor(np.abs(scaled) + 0.5) * np.sign(scaled)).astype(np.int64)
    G = Q.T @ Q
    assert len(out) == 5 * 6 // 2
    for r in out:
        assert r.i <= r.j
        assert r.gram == G[r.i, r.j], (r.i, r.j)


def test_gram_matrix_plan_single_exchange(spark):
    """Plan shape: one MapInPandas stage, one exchange (the D^2-row
    partial agg), no row-at-a-time Python."""
    import numpy as np

    from nolock_social_ocr_services_spark.functions import similarity as sim

    rows = [(i, [0.1 * i, 0.2]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = (
        sim.gram_matrix(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # partial+final agg pair max


def test_matryoshka_topk_matches_numpy_on_truncated_dims(spark):
    """Ranking must equal numpy brute-force cosine over the FIRST dims
    coordinates (re-normalized), not the full vector — on data crafted
    so the two orders differ."""
    import numpy as np

    from nolock_social_ocr_services_spark.functions import similarity as sim

    rng = np.random.default_rng(3)
    X = rng.standard_normal((30, 16)).astype(np.float32)
    rows = [(i, X[i].tolist()) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    dims, k = 4, 3
    out = sim.matryoshka_topk(emb, dims=dims, k=k)
    got = {
        (r.query_id, r.rank): r.neighbor_id for r in out.collect()
    }
    Xt = X[:, :dims].astype(np.float64)
    U = Xt / np.linalg.norm(Xt, axis=1, keepdims=True)
    S = U @ U.T
    differs = 0
    Xf = X.astype(np.float64)
    Uf = Xf / np.linalg.norm(Xf, axis=1, keepdims=True)
    Sf = Uf @ Uf.T
    for q in range(30):
        order = sorted(
            (i for i in range(30) if i != q), key=lambda i: (-S[q, i], i)
        )[:k]
        for r, nb in enumerate(order, 1):
            assert got[(q, r)] == nb, (q, r)
        full = sorted(
            (i for i in range(30) if i != q), key=lambda i: (-Sf[q, i], i)
        )[:k]
        differs += order != full
    assert differs > 0  # truncation genuinely changes the ranking


def test_matryoshka_topk_no_python_in_plan(spark):
    """The truncation is a plan-side slice: zero Python eval nodes of
    any kind in the executed plan."""
    from nolock_social_ocr_services_spark.functions import similarity as sim

    rows = [(i, [float(i), 1.0, 0.5, 0.25]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = (
        sim.matryoshka_topk(emb, dims=2, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_jl_project_matches_independent_python(spark):
    """Bit-exact parity with an independently-written Python reference
    (hashlib md5 rule + integer matmul), including a NULL vector and a
    ragged batch (two distinct input dims)."""
    import hashlib

    import numpy as np

    from nolock_social_ocr_services_spark.functions import similarity as sim

    rng = np.random.default_rng(5)
    rows = [(i, (rng.standard_normal(8) * 2).astype(np.float32).tolist())
            for i in range(20)]
    rows.append((20, None))
    rows.append((21, (rng.standard_normal(5)).astype(np.float32).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.proj
           for r in sim.jl_project(emb, out_dims=6, seed=3).collect()}

    def ref(vec):
        if vec is None:
            return None
        x = np.asarray(vec, dtype=np.float64) * 1_000_000
        q = (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)
        out = []
        for j in range(6):
            s = 0
            for d in range(len(vec)):
                h = int(hashlib.md5(f"3:{d}:{j}".encode()).hexdigest()[:15],
                        16) % 6
                s += int(q[d]) * (1 if h == 0 else -1 if h == 1 else 0)
            out.append(s)
        return out

    for vid, vec in rows:
        assert got[vid] == ref(vec), vid


def test_jl_project_preserves_relative_distances(spark):
    """JL sanity: a pair of near-identical vectors stays far closer in
    the projected space than an unrelated pair (distance ORDER survives
    the projection)."""
    import numpy as np

    from nolock_social_ocr_services_spark.functions import similarity as sim

    rng = np.random.default_rng(9)
    a = rng.standard_normal(64)
    rows = [
        (0, a.astype(np.float32).tolist()),
        (1, (a + 0.01 * rng.standard_normal(64)).astype(np.float32).tolist()),
        (2, rng.standard_normal(64).astype(np.float32).tolist()),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    p = {r.vec_id: np.array(r.proj, dtype=np.float64)
         for r in sim.jl_project(emb, out_dims=16).collect()}
    near = np.linalg.norm(p[0] - p[1])
    far = np.linalg.norm(p[0] - p[2])
    assert near < far / 5


def test_jl_project_plan_map_only(spark):
    """Pure projection: one MapInPandas, zero exchanges, no row-Python."""
    from nolock_social_ocr_services_spark.functions import similarity as sim

    rows = [(i, [0.5, -1.5, 2.0]) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = (
        sim.jl_project(emb, out_dims=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_margin_mine_bucketed_recall_vs_brute(spark, sf_dir):
    """The checked bitext_mine form is SRP-banded; its recall against
    the brute all-pairs margin rule is the honest measure of what the
    8-bit/4-band dial trades for the sub-quadratic plan. Random
    embeddings are the WORST case (no true translations — every margin
    rides the noise floor, so deg estimation error flips borderline
    pairs); production corpora with real parallel pairs sit far above
    this floor."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    brute = {
        (r.src_id, r.tgt_id)
        for r in sim.margin_mine(src, tgt, knn=4, threshold=1.05).collect()
    }
    bucketed = {
        (r.src_id, r.tgt_id)
        for r in sim.margin_mine_bucketed(
            src, tgt, knn=4, threshold=1.05, dim=64, bits=8, bands=4, seed=42
        ).collect()
    }
    assert brute, "brute baseline empty — threshold no longer exercised"
    recall = len(brute & bucketed) / len(brute)
    assert recall >= 0.5, f"recall {recall:.3f}"


def test_margin_mine_bucketed_plan_no_cartesian(spark, sf_dir):
    """The whole point of the bucketed twin: candidates come from a
    banded equi-join, so the plan must contain NO cartesian product or
    nested-loop join anywhere (margin_mine's crossJoin is exactly what
    this form retires from the head registry)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    out = sim.margin_mine_bucketed(
        src, tgt, knn=4, threshold=1.05, dim=64, bits=8, bands=4, seed=42
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_margin_mine_bucketed_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(120)
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    kw = dict(knn=3, threshold=1.0, dim=64, bits=8, bands=4, seed=42)
    a = sorted(map(tuple, sim.margin_mine_bucketed(src, tgt, **kw).collect()))
    b = sorted(map(tuple, sim.margin_mine_bucketed(src, tgt, **kw).collect()))
    assert a == b and a


def test_matryoshka_rerank_plan_no_cartesian(spark, sf_dir):
    """The cascade retires matryoshka_topk's quadratic cosine_topk
    composition: shortlist comes from an SRP-bucket equi-join, rerank
    from equi-joins on ids — the plan must be cartesian-free."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = sim.matryoshka_rerank_topk(emb, dims=16, k=3, shortlist_k=10, bits=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_matryoshka_rerank_recall_vs_exact_full_dim(spark, sf_dir):
    """Cascade recall against the exact FULL-dim top-3 — the number a
    deployment actually cares about. Random embeddings are the worst
    case for prefix truncation (no MRL training concentrated the
    signal in the prefix), so this floor is conservative."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.cosine_topk(emb, k=3).collect()
    }
    cascade = {
        (r.query_id, r.neighbor_id)
        for r in sim.matryoshka_rerank_topk(
            emb, dims=16, k=3, shortlist_k=10, bits=4
        ).collect()
    }
    assert exact
    recall = len(exact & cascade) / len(exact)
    assert 0.05 < recall <= 1.0, recall


def test_matryoshka_rerank_sims_are_full_dim_exact(spark, sf_dir):
    """Reranked sims must equal the exact full-dim cosine for the same
    pair — the rerank stage does real full-dimension math, not an
    approximation of one."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    exact = {
        (r.query_id, r.neighbor_id): r.sim
        for r in sim.cosine_topk(emb, k=99).collect()
    }
    for r in sim.matryoshka_rerank_topk(
        emb, dims=16, k=3, shortlist_k=5, bits=4
    ).collect():
        assert exact[(r.query_id, r.neighbor_id)] == pytest.approx(
            r.sim, rel=1e-9
        )
