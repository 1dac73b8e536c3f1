"""Grid-blocked DBSCAN vs a brute-force all-pairs reference implementation
(numpy union-find) on deterministic random layouts, plus cell-boundary and
determinism cases."""

from __future__ import annotations

import numpy as np
import pytest

from gol_tool_spark.operators import geocluster


def _brute_dbscan(ids, xs, ys, eps, min_pts):
    """All-pairs reference: roles + min-core-id cluster labels, border to
    min cluster among core neighbors (the operator's documented
    canonicalization)."""
    n = len(ids)
    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.float64)
    d2 = (xs[:, None] - xs[None, :]) ** 2 + (ys[:, None] - ys[None, :]) ** 2
    adj = (d2 <= eps * eps) & ~np.eye(n, dtype=bool)
    core = adj.sum(1) + 1 >= min_pts

    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and adj[i, j]:
                a, b = find(i), find(j)
                if a != b:
                    parent[a] = b
    comp_min = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            comp_min[r] = min(comp_min.get(r, ids[i]), ids[i])
    out = {}
    for i in range(n):
        if core[i]:
            out[ids[i]] = (comp_min[find(i)], "core")
        else:
            nb = [comp_min[find(j)] for j in range(n) if core[j] and adj[i, j]]
            out[ids[i]] = (min(nb), "border") if nb else (None, "noise")
    return out


def _run(spark, ids, xs, ys, eps, min_pts):
    df = spark.createDataFrame(
        list(zip(map(int, ids), map(int, xs), map(int, ys))), "id long, x long, y long"
    )
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in geocluster.dbscan(df, eps=eps, min_pts=min_pts).collect()
    }
    return got


@pytest.mark.parametrize("seed,eps,min_pts", [(3, 50, 4), (9, 80, 3), (21, 30, 5)])
def test_matches_bruteforce(spark, seed, eps, min_pts):
    rng = np.random.default_rng(seed)
    # three dense blobs + uniform background, coordinates straddling zero
    # so negative-coordinate floor cells are exercised
    blobs = [
        rng.integers(c - 60, c + 60, size=(25, 2)) for c in (-500, 0, 700)
    ]
    bg = rng.integers(-1000, 1000, size=(40, 2))
    pts = np.vstack(blobs + [bg])
    ids = np.arange(len(pts)) * 3 + 1
    exp = _brute_dbscan(ids, pts[:, 0], pts[:, 1], eps, min_pts)
    got = _run(spark, ids, pts[:, 0], pts[:, 1], eps, min_pts)
    assert got == exp


def test_cell_boundary_pairs(spark):
    # points exactly eps apart across a cell boundary must pair up
    eps = 100
    ids = [1, 2, 3, 4, 5]
    xs = [0, 100, 200, 99, 101]
    ys = [0, 0, 0, 0, 0]
    exp = _brute_dbscan(ids, xs, ys, eps, 3)
    got = _run(spark, ids, xs, ys, eps, 3)
    assert got == exp


def test_partitioning_independent(spark):
    rng = np.random.default_rng(5)
    pts = rng.integers(-300, 300, size=(80, 2))
    ids = np.arange(80)
    df = spark.createDataFrame(
        [(int(i), int(x), int(y)) for i, (x, y) in zip(ids, pts)], "id long, x long, y long"
    )
    a = sorted(geocluster.dbscan(df, 70, 4).collect())
    b = sorted(geocluster.dbscan(df.repartition(17), 70, 4).collect())
    assert a == b


def test_min_pts_guard(spark):
    df = spark.createDataFrame([(1, 0, 0)], "id long, x long, y long")
    with pytest.raises(ValueError):
        geocluster.dbscan(df, 10, 1)


def test_eps_pairs_unique_and_symmetric_free(spark):
    # each qualifying unordered pair appears exactly once, oriented a < b
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 10, 0), (3, 5, 5)], "id long, x long, y long"
    )
    rows = geocluster.eps_pairs(df, 20).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in rows]
    assert sorted(pairs) == [(1, 2), (1, 3), (2, 3)]
    assert len(set(pairs)) == len(pairs)
