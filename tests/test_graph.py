"""pagerank: pure-Python reference equality, dangling mass,
conservation, partition invariance, validation."""

from __future__ import annotations

import pytest

from codeindex_spark.ops.graph import pagerank


def _reference(edges, damping, iters):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += pr[s] / deg[s]
        total = sum(contrib[v] for v in nodes)
        dangling = 1.0 - total
        pr = {
            v: (1.0 - damping) / n
            + damping * (contrib[v] + dangling / n)
            for v in nodes
        }
    return pr


EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("d", "c"),  # e is reachable nowhere; d points in, sink 'e':
    ("c", "e"),  # e has no out-edges -> dangling
]


def test_matches_reference(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["pr"] for r in pagerank(df, iters=10).collect()}
    want = _reference(EDGES, 0.85, 10)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # mass conservation with a dangling node present
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_star_center_dominates(spark):
    edges = [(f"leaf{i}", "hub") for i in range(8)] + [
        ("hub", f"leaf{i}") for i in range(8)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["pr"] for r in pagerank(df, iters=12).collect()}
    assert max(got, key=got.get) == "hub"


def test_partition_invariance_to_rounding(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = {
        r["node"]: round(r["pr"], 6)
        for r in pagerank(df, iters=10).collect()
    }
    b = {
        r["node"]: round(r["pr"], 6)
        for r in pagerank(df.repartition(7), iters=10).collect()
    }
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(df, iters=0)


# --- triangle_counts ---

from codeindex_spark.ops.graph import triangle_counts  # noqa: E402


def _brute_triangles(edges):
    import itertools

    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                out[n] = out.get(n, 0) + 1
    return out


def test_triangles_k4_pendant(spark):
    # K4 + pendant: each K4 node in C(3,2)=3 triangles, pendant none;
    # reversed duplicates and a self-loop must collapse/drop
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (2, 1), (3, 3),
    ]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_random_matches_brute_force(spark):
    import random

    random.seed(11)
    nodes = list(range(40))
    edges = sorted(
        {
            (a, b)
            for a in nodes
            for b in nodes
            if a < b and random.random() < 0.15
        }
    )
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == _brute_triangles(edges)


def test_triangles_partition_invariance(spark):
    edges = [(i, (i + k) % 17) for i in range(17) for k in (1, 2, 4)]
    df = spark.createDataFrame(edges, "src int, dst int")
    a = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    b = {
        r["node"]: r["triangles"]
        for r in triangle_counts(df.repartition(9)).collect()
    }
    assert a == b and sum(a.values()) % 3 == 0 and a


# ----------------------------------------------------------- HITS

from codeindex_spark.ops.graph import hits  # noqa: E402


def _hits_reference(edges, iters):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    h = {v: 1.0 / n for v in nodes}
    a = {v: 0.0 for v in nodes}
    for _ in range(iters):
        a = {v: 0.0 for v in nodes}
        for s, d in edges:
            a[d] += h[s]
        ta = sum(a.values())
        a = {v: (x / ta if ta > 0 else 0.0) for v, x in a.items()}
        h = {v: 0.0 for v in nodes}
        for s, d in edges:
            h[s] += a[d]
        th = sum(h.values())
        h = {v: (x / th if th > 0 else 0.0) for v, x in h.items()}
    return h, a


def test_hits_matches_reference(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    rows = hits(df, iters=8).collect()
    gh = {r["node"]: r["hub"] for r in rows}
    ga = {r["node"]: r["auth"] for r in rows}
    wh, wa = _hits_reference(EDGES, 8)
    assert set(gh) == set(wh)
    for v in wh:
        assert gh[v] == pytest.approx(wh[v], abs=1e-12), ("hub", v)
        assert ga[v] == pytest.approx(wa[v], abs=1e-12), ("auth", v)
    # L1 normalization invariant
    assert sum(gh.values()) == pytest.approx(1.0, abs=1e-12)
    assert sum(ga.values()) == pytest.approx(1.0, abs=1e-12)


def test_hits_star_roles(spark):
    """All leaves point at the center: the center is the unique top
    authority (auth 1.0), leaves are the hubs, and the center's hub
    score is 0 (it has no out-edges)."""
    edges = [(f"leaf{i}", "center") for i in range(6)]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = {r["node"]: r for r in hits(df, iters=5).collect()}
    assert rows["center"]["auth"] == pytest.approx(1.0, abs=1e-12)
    assert rows["center"]["hub"] == 0.0
    for i in range(6):
        assert rows[f"leaf{i}"]["auth"] == 0.0
        assert rows[f"leaf{i}"]["hub"] == pytest.approx(1 / 6, abs=1e-12)


def test_hits_partition_invariance_to_rounding(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = {
        (r["node"]): (round(r["hub"], 6), round(r["auth"], 6))
        for r in hits(df, iters=8).collect()
    }
    b = {
        (r["node"]): (round(r["hub"], 6), round(r["auth"], 6))
        for r in hits(df.repartition(5), iters=8).collect()
    }
    assert a == b


def test_hits_validation(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        hits(df, iters=0)


# ------------------------------------------- personalized PageRank

def _ppr_reference(edges, damping, iters, seeds):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    seeds = [s for s in sorted(set(seeds)) if s in set(nodes)]
    t = {v: (1.0 / len(seeds) if v in set(seeds) else 0.0) for v in nodes}
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += pr[s] / deg[s]
        total = sum(contrib[v] for v in nodes)
        pr = {
            v: (1.0 - damping) * t[v]
            + damping * (contrib[v] + (1.0 - total) * t[v])
            for v in nodes
        }
    return pr


def test_personalized_matches_reference(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r["node"]: r["pr"]
        for r in pagerank(df, iters=10, seeds=["a"]).collect()
    }
    want = _ppr_reference(EDGES, 0.85, 10, ["a"])
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
    # restart conservation: mass still sums to 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    # rank concentrates near the seed: the seed outranks the node
    # unreachable from it only via teleport ('d' never receives walk
    # mass from a's component — check it holds strictly less than a)
    assert got["a"] > got["d"]


def test_personalized_seed_locality(spark):
    """Two disconnected 2-cycles, seeds in one: the other component
    receives NO teleport mass, so its initial 0.25-per-node share
    decays geometrically — pr_k(x) = 0.25 * d^k exactly (its only
    inflow is d * contrib from the cycle partner) — and the seeded
    component holds the complement."""
    edges = [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")]
    df = spark.createDataFrame(edges, "src string, dst string")
    iters, d = 15, 0.85
    got = {
        r["node"]: r["pr"]
        for r in pagerank(df, iters=iters, seeds=["a", "b"]).collect()
    }
    leak = 0.25 * d**iters
    assert got["x"] == pytest.approx(leak, rel=1e-9)
    assert got["y"] == pytest.approx(leak, rel=1e-9)
    assert got["a"] + got["b"] == pytest.approx(1.0 - 2 * leak, abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_personalized_validation(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, seeds=[])
    with pytest.raises(ValueError):
        pagerank(df, seeds=["not_a_node_zz"])
