"""Grid-cell spatial neighbor join (functions/spatial.py)."""

from nolock_social_ocr_services_spark.functions.spatial import neighbor_pairs


def test_neighbor_pairs_golden(spark):
    """Boundary cases: distance exactly r counts, r+1 doesn't, pairs
    straddling a cell boundary are found, each pair exactly once."""
    pts = spark.createDataFrame(
        [
            (1, 0, 0),
            (2, 25, 0),    # dist exactly 25 -> in
            (3, 26, 0),    # 26 from p1 -> out vs 1, 1 from p2 -> in
            (4, 24, 24),   # cell (0,0)... dist2 to p2=577 -> in
            (5, 500, 500),  # far away
        ],
        "pid long, x long, y long",
    )
    out = {
        (r.id_a, r.id_b): r.dist2
        for r in neighbor_pairs(pts, radius=25).collect()
    }
    assert out[(1, 2)] == 625
    assert (1, 3) not in out
    assert out[(2, 3)] == 1
    assert out[(2, 4)] == 1 + 576
    assert all(5 not in p for p in out)
    # exactly once each
    assert len(out) == len(set(out))


def test_neighbor_pairs_matches_brute_force(spark):
    """Parity with the quadratic formulation on random integer points —
    the 3x3 cell neighborhood must be exhaustive, including pairs in
    diagonal-adjacent cells and same-point duplicates."""
    import random

    rng = random.Random(41)
    pts = [(i, rng.randrange(0, 200), rng.randrange(0, 200))
           for i in range(300)]
    df = spark.createDataFrame(pts, "pid long, x long, y long")
    r = 17  # not a divisor of the extent: cells straddle everywhere
    got = {
        (a, b): d
        for a, b, d in neighbor_pairs(df, radius=r).collect()
    }
    want = {}
    for i, xa, ya in pts:
        for j, xb, yb in pts:
            if i < j:
                d2 = (xa - xb) ** 2 + (ya - yb) ** 2
                if d2 <= r * r:
                    want[(i, j)] = d2
    assert got == want and len(want) > 50
