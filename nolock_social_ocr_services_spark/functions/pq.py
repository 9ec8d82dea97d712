"""Product quantization (PQ) for billion-scale embedding search.

Jégou et al. 2011 ("Product Quantization for Nearest Neighbor
Search"): split each ``dim``-vector into ``m`` contiguous subvectors,
k-means each subspace independently (``ks`` centroids per subspace),
and store every database vector as ``m`` small integer codes — 64
float32 dims become 4 bytes at m=4/ks<=256, a 64x compression that is
what actually lets an index of 10^11 vectors fit a cluster's memory.
Queries are answered with ASYMMETRIC DISTANCE COMPUTATION (ADC): the
query stays un-quantized, a per-query lookup table of ``m*ks``
query-subvector -> centroid distances is built once, and each database
vector is scored with ``m`` table lookups + adds instead of ``dim``
multiplies. This completes the ANN ladder next to
``similarity.cosine_topk`` (exact baseline), ``similarity.ivf_topk``
(coarse pruning) and ``clustering.kmeans_fit`` (the trainer both
reuse): at 100 TB the production shape is IVF for candidate pruning x
PQ for in-list scoring.

Spark mapping — every stage is the cheap side of the engine:

* ``pq_fit`` trains ALL ``m`` subspaces in ONE scan per Lloyd round:
  subvectors explode to ``(id, sub, sv)`` rows map-side, assignment is
  a pure projection (the per-subspace codebooks inline as a literal
  ``array<array<struct<cid,c>>>`` indexed by ``sub``; the argmin folds
  in codegen — no join, no shuffle), and the mean update is one
  partially-aggregated shuffle keyed on ``m*ks*(dim/m)`` tiny groups.
  Driver traffic per round is the ``m*ks`` codebook rows (for
  m=4,ks=4,dim=64: 256 floats) — nothing O(N) leaves the executors,
  same contract as ``clustering.kmeans_fit``.
* ``pq_encode`` is a PURE PROJECTION — zero exchanges: per row, per
  subspace, fold the argmin over ``ks`` literal centroids. The output
  ``codes`` column is the compressed index a real deployment persists.
* ``pq_adc_topk`` scores a (small, collected) query batch against the
  encoded corpus: the ADC lookup tables are built driver-side (they
  are ``nq*m*ks`` floats — for 1000 queries still < 1 MB) and embedded
  as literals, so the scan does ``m`` ``element_at`` lookups + adds
  per (row, query) — no join, and the only exchange is the per-query
  top-k window over ``nq`` groups. At larger query batches the same
  tables ship via ``F.broadcast`` join instead of literals — identical
  semantics, one extra map-side join.

Determinism contract (shared with ``clustering.kmeans_fit``, which
makes the iterative trainer hash-checkable against an unrolled DuckDB
CTE chain): per-subspace init is the first ``ks`` vectors by id, every
updated centroid component rounds to 6 decimals before the next
assignment round, argmin ties break to the LOWEST centroid id, and the
registry query emits integer codes / ranks only (float distances order
the ranks but are never hashed — engine summation order flips their
low decimals).

Malformed rows (NULL or wrong-length vectors) encode to NULL codes —
surfaced, never silently clustered — and are excluded from training
and from ADC scoring.

Reference parity: the reference has no vector index; this belongs to
the training-data-pipeline surface (similarity search / dedup) the
engine adds on top — see SURVEY.md §2's "beyond the reference" block.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .clustering import _sqdist

Codebooks = list[list[tuple[int, list[float]]]]  # [sub][cid] -> centroid


def _sub_codebook_literal(sub_cb: list[tuple[int, list[float]]]) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(x)) for x in c]).alias("c"),
            )
            for cid, c in sorted(sub_cb)
        ]
    )


def _argmin_code(sv: Column, cents: Column) -> Column:
    """Nearest-centroid id for one subvector, folded in codegen; ties
    break to the lowest cid (only a STRICTLY smaller distance replaces
    the running best, and centroids iterate in ascending-cid order).
    NULL / wrong-length subvectors have NULL distance to everything —
    the fold keeps the -1 seed, surfaced as NULL by the caller."""
    dists = F.transform(
        cents,
        lambda s: F.struct(_sqdist(sv, s["c"]).alias("d"), s["cid"].alias("cid")),
    )
    return F.aggregate(
        dists,
        F.struct(F.lit(float("inf")).alias("d"), F.lit(-1).alias("cid")),
        lambda acc, s: F.when(s["d"] < acc["d"], s).otherwise(acc),
    )["cid"]


def pq_fit(
    df: DataFrame,
    m: int = 4,
    ks: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebooks:
    """Train per-subspace codebooks; returns ``[sub][cid] -> centroid``
    (``m * ks`` tiny rows, driver-side by design — exactly what a real
    PQ index persists as its codebook artifact)."""
    vecs_all = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # dim is defined by the FIRST non-empty vector by id (deterministic
    # even over ragged inputs); init = the first ks vectors of that
    # length — one collect serves both
    init = (
        vecs_all.filter(F.size("v") > 0).orderBy("id").limit(ks + 8).collect()
    )
    if not init:
        raise ValueError("pq_fit: no non-empty vectors to train on")
    dim = len(init[0]["v"])
    if dim % m != 0:
        raise ValueError(f"pq_fit: dim {dim} not divisible by m {m}")
    d = dim // m
    init = [r for r in init if len(r["v"]) == dim][:ks]
    if len(init) < ks:
        raise ValueError(
            f"pq_fit: need {ks} init vectors of dim {dim}, found {len(init)}"
        )

    vecs = vecs_all.filter(F.size("v") == dim)
    # one map-side explode: (id, sub, sv) — all m subspaces train in
    # the same pass instead of m separate scans per round
    subs = vecs.select(
        "id",
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice("v", s * d + 1, d).alias("sv"),
                    )
                    for s in range(m)
                ]
            )
        ),
    )

    cbs: Codebooks = [
        [(i, list(r["v"])[s * d : s * d + d]) for i, r in enumerate(init)]
        for s in range(m)
    ]
    for _ in range(iters):
        cb_lit = F.array(*[_sub_codebook_literal(cb) for cb in cbs])
        assigned = subs.withColumn(
            "code", _argmin_code(F.col("sv"), F.element_at(cb_lit, F.col("sub") + 1))
        ).filter(F.col("code") >= 0)
        means = (
            assigned.select("sub", "code", F.posexplode("sv").alias("pos", "x"))
            .groupBy("sub", "code", "pos")
            .agg(F.round(F.avg("x"), 6).alias("c"))
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("c")
            )
            .collect()
        )
        new = {(int(r["sub"]), int(r["code"])): list(r["c"]) for r in means}
        # an emptied cluster keeps its previous centroid (Lloyd's
        # standard fallback; the oracle's LEFT JOIN + COALESCE mirrors it)
        cbs = [
            [(cid, new.get((s, cid), old)) for cid, old in cb]
            for s, cb in enumerate(cbs)
        ]
    return cbs


def _codes_expr(v: Column, cbs: Codebooks, d: int) -> Column:
    """``array<int>`` of per-subspace codes for one vector column; NULL
    if the vector is malformed (NULL / wrong length — the explicit
    size check matters because a TOO-SHORT vector's trailing slices
    are empty arrays whose distance fold returns the 0.0 seed, which
    would otherwise silently encode to code 0)."""
    raw = F.array(
        *[
            _argmin_code(F.slice(v, s * d + 1, d), _sub_codebook_literal(cb))
            for s, cb in enumerate(cbs)
        ]
    )
    return F.when(
        (F.size(v) == len(cbs) * d) & ~F.array_contains(raw, -1), raw
    )


def pq_encode(
    df: DataFrame,
    cbs: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress every vector to its ``m`` codes: ``(id_col, codes)``.
    Pure projection — the full-corpus pass a deployment runs ONCE to
    build the compressed index; zero exchanges, fully codegen'd."""
    d = len(cbs[0][0][1])
    return df.select(
        F.col(id_col),
        _codes_expr(F.col(vec_col).cast("array<double>"), cbs, d).alias("codes"),
    )


def pq_adc_topk(
    df: DataFrame,
    k: int = 3,
    m: int = 4,
    ks: int = 4,
    iters: int = 2,
    nq: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: the first ``nq`` vectors by id are
    the query batch (un-quantized), everything else is searched through
    its codes alone. Output ``(query_id, neighbor_id, rank)`` — ranks
    order by approximate distance asc, ties to the lower neighbor id.

    Each (row, query) score costs ``m`` lookups + adds into the
    query's precomputed distance table — the whole point of ADC: the
    corpus-side scan never touches a float vector, only the 4-byte
    codes column. Self-pairs are excluded; rows with NULL codes are
    skipped (surfaced by :func:`pq_encode`, not searchable)."""
    cbs = pq_fit(df, m=m, ks=ks, iters=iters, id_col=id_col, vec_col=vec_col)
    d = len(cbs[0][0][1])
    codes = pq_encode(df, cbs, id_col=id_col, vec_col=vec_col).filter(
        F.col("codes").isNotNull()
    )

    queries = (
        df.select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .filter(F.size("v") == m * d)
        .orderBy("qid")
        .limit(nq)
        .collect()
    )
    # ADC lookup tables, driver-side: lut[q][sub][cid] = sqdist(query
    # subvector, centroid) — nq*m*ks floats, embedded as literals so the
    # scan-side score is m element_at's + adds, no join
    luts = []
    for r in queries:
        qv = list(r["v"])
        lut = [
            [
                sum(
                    (qv[s * d + j] - c[j]) * (qv[s * d + j] - c[j])
                    for j in range(d)
                )
                for _, c in sorted(cb)
            ]
            for s, cb in enumerate(cbs)
        ]
        luts.append((r["qid"], lut))

    def dist_for(lut: list[list[float]]) -> Column:
        terms = [
            F.element_at(
                F.array(*[F.lit(float(t)) for t in lut[s]]),
                F.element_at(F.col("codes"), s + 1) + 1,
            )
            for s in range(m)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    per_query = F.array(
        *[
            F.struct(F.lit(qid).alias("query_id"), dist_for(lut).alias("dist"))
            for qid, lut in luts
        ]
    )
    scored = (
        codes.select(F.col(id_col).alias("neighbor_id"), F.inline(per_query))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivfpq_topk(
    df: DataFrame,
    k: int = 3,
    nlist: int = 4,
    nprobe: int = 2,
    coarse_iters: int = 1,
    m: int = 4,
    ks: int = 4,
    iters: int = 1,
    nq: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ with residual encoding — the canonical billion-scale ANN
    index (Faiss ``IndexIVFPQ``), composing this repo's two trained
    stages: a coarse k-means quantizer (``clustering.kmeans_fit``)
    partitions the corpus into ``nlist`` inverted lists, and a PQ
    codebook trained on the RESIDUALS ``v - coarse_centroid`` (residual
    magnitudes are far smaller than raw vectors, so the same ks
    centroids quantize them much more finely) compresses every vector
    to ``m`` codes. A query probes its ``nprobe`` nearest lists and
    ADC-scores only their members, each against the query's PER-LIST
    residual table (``q - list_centroid`` changes with the probed
    list).

    At 100 TB this is THE shape: IVF bounds candidates to
    nprobe/nlist of the corpus, PQ makes each candidate 4 bytes and
    each score m lookups. Here the coarse assignment is a codegen'd
    literal-fold projection, the residual + encode pass is map-only,
    and the per-query scoring adds are literal lookups — the single
    exchange is the top-k window. Output (query_id, neighbor_id, rank);
    rank-only for the usual cross-engine float reason. Determinism
    follows both trainers' shared contract (first-by-id init, 6dp
    centroid rounding, lowest-cid ties)."""
    from .clustering import _assign, kmeans_fit

    cents = kmeans_fit(
        df, k=nlist, iters=coarse_iters, id_col=id_col, vec_col=vec_col
    )
    dim = len(cents[0][1])
    if dim % m != 0:
        raise ValueError(f"ivfpq_topk: dim {dim} not divisible by m {m}")
    d = dim // m

    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).filter(F.size("v") == dim)
    cent_lit = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in c])
            for _, c in sorted(cents)
        ]
    )
    res = (
        _assign(vecs, cents)
        .filter(F.col("cluster").isNotNull())
        .select(
            "id",
            F.col("cluster").alias("list_id"),
            F.zip_with(
                "v",
                F.element_at(cent_lit, F.col("cluster") + 1),
                lambda x, c: x - c,
            ).alias("res"),
        )
    )
    cbs = pq_fit(res, m=m, ks=ks, iters=iters, id_col="id", vec_col="res")
    codes = res.select(
        "id", "list_id", _codes_expr(F.col("res"), cbs, d).alias("codes")
    ).filter(F.col("codes").isNotNull())

    queries = vecs.orderBy("id").limit(nq).collect()
    centmap = dict(cents)

    def query_dist(qv: list[float]) -> Column:
        # probe order mirrors _assign: squared distance, ties to cid
        coarse = sorted(
            (
                sum((qv[j] - c[j]) * (qv[j] - c[j]) for j in range(dim)),
                cid,
            )
            for cid, c in cents
        )
        probed = [cid for _, cid in coarse[:nprobe]]
        expr = F.lit(None).cast("double")
        for lc in probed:
            c = centmap[lc]
            qres = [qv[j] - c[j] for j in range(dim)]
            terms = []
            for s in range(m):
                lut = [
                    sum(
                        (qres[s * d + j] - cc[j]) * (qres[s * d + j] - cc[j])
                        for j in range(d)
                    )
                    for _, cc in sorted(cbs[s])
                ]
                terms.append(
                    F.element_at(
                        F.array(*[F.lit(float(t)) for t in lut]),
                        F.element_at(F.col("codes"), s + 1) + 1,
                    )
                )
            dist = terms[0]
            for t in terms[1:]:
                dist = dist + t
            expr = F.when(F.col("list_id") == lc, dist).otherwise(expr)
        return expr

    per_query = F.array(
        *[
            F.struct(
                F.lit(r["id"]).alias("query_id"),
                query_dist(list(r["v"])).alias("dist"),
            )
            for r in queries
        ]
    )
    scored = (
        codes.select(F.col("id").alias("neighbor_id"), F.inline(per_query))
        .filter(
            F.col("dist").isNotNull()
            & (F.col("neighbor_id") != F.col("query_id"))
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
