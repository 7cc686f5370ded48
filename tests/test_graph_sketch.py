"""Differential + property tests for the graph / sketch / semantic-dedup
operators (none SQL-expressible, so these are their correctness gates).

* PageRank: compared against an independent dense numpy power iteration
  implementing the same textbook recurrence on the same graph.
* Count-min sketch: the one-sided error guarantee (est >= exact always,
  overshoot <= eps*N) and shard-merge associativity.
* SemDeDup: verdicts recomputed from first principles in pure Python
  (exact pair cosines within cells + union-find + the farthest-from-
  centroid keeper rule).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from e_commerce_data_engineering_spark.operators.graph import pagerank
from e_commerce_data_engineering_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
    cms_params,
)
from e_commerce_data_engineering_spark.plans.graph_sketch import (
    supplier_customer_edges,
)

from .conftest import SF_SMOKE


def _numpy_pagerank(edge_list, damping, n_iter):
    nodes = sorted({a for a, _ in edge_list} | {b for _, b in edge_list})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out: dict[int, list[int]] = {}
    for a, b in set(edge_list):
        out.setdefault(idx[a], []).append(idx[b])
    rank = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        nxt = np.full(n, base)
        dangling = sum(rank[i] for i in range(n) if i not in out)
        nxt += damping * dangling / n
        for i, dsts in out.items():
            share = damping * rank[i] / len(dsts)
            for j in dsts:
                nxt[j] += share
        rank = nxt
    return {v: rank[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_power_iteration(spark):
    edges = supplier_customer_edges(spark, SF_SMOKE)
    got = {r["node"]: r["rank"] for r in pagerank(edges, max_iter=12).collect()}
    want = _numpy_pagerank(
        [(r["src"], r["dst"]) for r in edges.collect()], 0.85, 12
    )
    assert set(got) == set(want)
    for node, w in want.items():
        assert got[node] == pytest.approx(w, abs=1e-12), node


def test_pagerank_mass_conserved_and_dangling_handled(spark):
    # b and c have no out-edges: their mass must be redistributed, not lost
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "a")], ["src", "dst"]
    )
    ranks = pagerank(edges, max_iter=15)
    rows = {r["node"]: r["rank"] for r in ranks.collect()}
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-9)
    want = _numpy_pagerank([("a", "b"), ("a", "c"), ("d", "a")], 0.85, 15)
    for node, w in want.items():
        assert rows[node] == pytest.approx(w, abs=1e-12), node
    # a receives from d AND the dangling pool -> outranks b/c
    assert rows["a"] > rows["b"] == pytest.approx(rows["c"], abs=1e-12)


def test_pagerank_empty_graph(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty).count() == 0


EPS, DELTA = 0.01, 0.01


def _token_frame(spark, sf_dir):
    from e_commerce_data_engineering_spark.functions.text import tokens
    from e_commerce_data_engineering_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    return d.select(F.explode(tokens(F.col("text"))).alias("token"))


def test_cms_one_sided_error_guarantee(spark):
    toks = _token_frame(spark, SF_SMOKE).persist()
    n_total = toks.count()
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    sketch = cms_build(toks, "token", EPS, DELTA)
    est = cms_estimate(sketch, exact.select("token"), "token", EPS, DELTA)
    joined = exact.join(est, "token").collect()
    assert len(joined) > 0
    for r in joined:
        assert r["est"] >= r["exact"], r  # CMS never underestimates
        assert r["est"] <= r["exact"] + EPS * n_total, r
    # grid state is bounded by depth*width whatever the corpus size
    depth, width = cms_params(EPS, DELTA)
    assert sketch.count() <= depth * width
    toks.unpersist()


def test_cms_unseen_key_estimates_can_only_collide(spark):
    toks = _token_frame(spark, SF_SMOKE)
    sketch = cms_build(toks, "token", EPS, DELTA)
    n_total = toks.count()
    ghost = spark.createDataFrame([("never-a-token-xyzzy",)], ["token"])
    est = cms_estimate(sketch, ghost, "token", EPS, DELTA).first()["est"]
    assert 0 <= est <= EPS * n_total


def test_cms_merge_equals_whole(spark):
    toks = _token_frame(spark, SF_SMOKE).persist()
    half_a = toks.filter(F.xxhash64("token") % 2 == 0)
    half_b = toks.filter(F.xxhash64("token") % 2 != 0)
    merged = cms_merge(
        cms_build(half_a, "token", EPS, DELTA), cms_build(half_b, "token", EPS, DELTA)
    )
    whole = cms_build(toks, "token", EPS, DELTA)
    diff = merged.join(whole, ["depth", "bucket"], "full").filter(
        F.coalesce(merged["cnt"], F.lit(0)) != F.coalesce(whole["cnt"], F.lit(0))
    )
    assert diff.count() == 0
    toks.unpersist()


NLIST, TAU = 8, 0.35


def _semdedup_frames(spark):
    from e_commerce_data_engineering_spark.operators.dedup import semdedup
    from e_commerce_data_engineering_spark.sources.tables import load_table

    vecs = load_table(spark, SF_SMOKE, "embeddings")
    verdict = semdedup(vecs, "vec_id", "embedding", nlist=NLIST, cos_threshold=TAU)
    return vecs, verdict


def test_semdedup_matches_python_union_find(spark):
    vecs, verdict = _semdedup_frames(spark)
    rows = verdict.collect()
    cells = {r["vec_id"]: r["cell"] for r in rows}
    raw = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in vecs.collect()}
    unit = {k: v / np.linalg.norm(v) for k, v in raw.items()}

    # independent ground truth: exact pair cosines within each cell
    parent = {k: k for k in unit}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(unit)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if cells[a] == cells[b] and float(unit[a] @ unit[b]) >= TAU:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
    groups: dict[int, list[int]] = {}
    for k in ids:
        groups.setdefault(find(k), []).append(k)
    expected_grouped = {
        frozenset(v) for v in groups.values() if len(v) > 1
    }
    got_groups: dict[int, set[int]] = {}
    for r in rows:
        if r["component"] is not None:
            got_groups.setdefault(r["component"], set()).add(r["vec_id"])
    assert {frozenset(v) for v in got_groups.values()} == expected_grouped

    # exactly one keeper per duplicate group; singletons always kept
    kept = {r["vec_id"]: r["kept"] for r in rows}
    in_any_group = {v for g in expected_grouped for v in g}
    for g in expected_grouped:
        assert sum(kept[v] for v in g) == 1, g
    for v in set(ids) - in_any_group:
        assert kept[v], v


def test_semdedup_deterministic_under_repartition(spark):
    from e_commerce_data_engineering_spark.operators.dedup import semdedup
    from e_commerce_data_engineering_spark.sources.tables import load_table

    vecs = load_table(spark, SF_SMOKE, "embeddings")
    a = semdedup(vecs, "vec_id", "embedding", nlist=NLIST, cos_threshold=TAU)
    b = semdedup(
        vecs.repartition(13), "vec_id", "embedding", nlist=NLIST, cos_threshold=TAU
    )
    # components are labeled by min member id in CC, so full-row equality
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kmeans_matches_numpy_replica(spark):
    from e_commerce_data_engineering_spark.operators.similarity import kmeans_fit
    from e_commerce_data_engineering_spark.sources.tables import load_table

    vecs = load_table(spark, SF_SMOKE, "embeddings")
    assigned, centroids, inertia = kmeans_fit(vecs, k=4, n_iter=4)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}

    # numpy replica: same hash-seeded init (read back from Spark), same
    # quantized-integer means, same first-min argmin
    import pyspark.sql.functions as F

    raw = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in vecs.collect()
    }
    init_ids = [
        r["vec_id"]
        for r in vecs.select("vec_id", F.xxhash64("vec_id", F.lit(42)).alias("h"))
        .orderBy("h")
        .limit(4)
        .collect()
    ]
    C = np.stack([raw[i] for i in init_ids])
    X = np.stack([raw[i] for i in sorted(raw)])
    ids = sorted(raw)
    for _ in range(4):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
        a = d.argmin(axis=1)
        for c in range(4):
            m = X[a == c]
            if len(m):
                q = np.floor(m * 1e6 + 0.5).astype(np.int64).sum(axis=0)
                C[c] = q / 1e6 / len(m)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
    a = d.argmin(axis=1)
    want = dict(zip(ids, (int(x) for x in a)))
    assert got == want
    np.testing.assert_allclose(np.stack(centroids), C, atol=1e-9)
    assert inertia == pytest.approx(float(d.min(axis=1).sum()), rel=1e-6)


def test_kmeans_deterministic_under_repartition(spark):
    from e_commerce_data_engineering_spark.operators.similarity import kmeans_fit
    from e_commerce_data_engineering_spark.sources.tables import load_table

    vecs = load_table(spark, SF_SMOKE, "embeddings")
    a1, c1, i1 = kmeans_fit(vecs, k=4, n_iter=3)
    a2, c2, i2 = kmeans_fit(vecs.repartition(11), k=4, n_iter=3)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    assert c1 == c2 and i1 == i2


def test_portable_cms_overestimate_bound(spark):
    """x05's portable-hash CMS: est >= exact for every probed key, and
    the overestimate stays within eps*N for the top keys (eps = e/width)."""
    import math

    from pyspark.sql import functions as F

    from e_commerce_data_engineering_spark.functions.text import tokens
    from e_commerce_data_engineering_spark.operators.sketch import (
        cms_build_portable,
        cms_estimate_portable,
    )
    from e_commerce_data_engineering_spark.sources.tables import load_table

    depth, width = 3, 272
    d = load_table(spark, SF_SMOKE, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("token")).persist()
    n_total = toks.count()
    sketch = cms_build_portable(toks, "token", depth, width)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_estimate_portable(sketch, exact.select("token"), "token", depth, width)
    joined = exact.join(est, "token").collect()
    toks.unpersist()
    eps = math.e / width
    assert len(joined) > 20  # sf0.001 vocabulary is small
    for r in joined:
        assert r["est"] >= r["exact_cnt"], r
    # the eps*N bound holds w.p. 1-delta per key; assert the overwhelming
    # majority satisfies it (a handful of tail misses is within contract)
    n_ok = sum(1 for r in joined if r["est"] <= r["exact_cnt"] + eps * n_total)
    assert n_ok >= 0.95 * len(joined), (n_ok, len(joined))


def test_triangle_counts_match_bruteforce(spark):
    """g04's degree-oriented wedge join must agree with a brute-force
    O(n^3) triangle enumeration over the same projected edge list — this
    checks the orientation trick itself (each triangle closed exactly
    once), independently of the SQL oracle mirror."""
    from itertools import combinations

    from e_commerce_data_engineering_spark.plans.graph_sketch import (
        g04_triangle_counts,
    )
    from e_commerce_data_engineering_spark.plans.registry import QUERIES  # noqa: F401
    from e_commerce_data_engineering_spark.sources.tables import load_table

    # rebuild the canonical edge list exactly as the query does
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    co = (
        li.filter(F.col("l_quantity") >= 48)
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    from collections import Counter, defaultdict

    by_cust = defaultdict(set)
    for r in co.collect():  # test-only collect; sf0.001 is tiny
        by_cust[r["c"]].add(r["s"])
    shared = Counter()
    for supps in by_cust.values():
        for u, v in combinations(sorted(supps), 2):
            shared[(u, v)] += 1
    edges = {p for p, n in shared.items() if n >= 3}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    expected = Counter()
    for u, v in edges:
        for w in adj[u] & adj[v]:
            for n_ in (u, v, w):
                expected[n_] += 1
    # each triangle was found 3 times (once per edge)
    expected = {n_: c // 3 for n_, c in expected.items()}

    got = {
        r["node"]: r["n_triangles"]
        for r in g04_triangle_counts(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_portable_hll_estimate_and_merge(spark):
    """x07's portable HLL: the merged corpus estimate lands within the
    ~3*stderr envelope of the exact distinct count (m=256 -> 6.5%
    stderr), and max-merging per-source register frames is associative
    (shard order cannot change the rollup)."""
    from e_commerce_data_engineering_spark.operators.sketch import (
        HLL_M,
        hll_estimate_portable,
        hll_registers_portable,
    )
    from e_commerce_data_engineering_spark.sources.tables import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    exact = d.select("text").distinct().count()
    regs = hll_registers_portable(d, "text", ("source",))
    assert regs.count() <= HLL_M * d.select("source").distinct().count()

    merged = regs.groupBy("reg").agg(F.max("rho").alias("rho"))
    est = hll_estimate_portable(merged).collect()[0]["raw_est"]
    assert abs(est - exact) <= 0.20 * exact, (est, exact)

    # associativity: merging a two-way shard split register-wise gives
    # the identical register frame as the direct build
    h1, h2 = d.filter(F.col("doc_id") % 2 == 0), d.filter(F.col("doc_id") % 2 == 1)
    r1 = hll_registers_portable(h1, "text")
    r2 = hll_registers_portable(h2, "text")
    remerged = r1.union(r2).groupBy("reg").agg(F.max("rho").alias("rho"))
    direct = hll_registers_portable(d, "text")
    assert remerged.exceptAll(direct).count() == 0
    assert direct.exceptAll(remerged).count() == 0


# ---------------------------------------------------------------------------
# k-core (operators/graph.kcore) vs a pure-Python peel to fixpoint
# ---------------------------------------------------------------------------


def _py_kcore(edge_list, k):
    edges = {(u, v) for u, v in edge_list}
    while True:
        deg: dict = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        nxt = {(u, v) for u, v in edges if u in alive and v in alive}
        if nxt == edges:
            break
        edges = nxt
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return {n: d for n, d in deg.items() if d >= k}


@pytest.mark.parametrize("k", [2, 3, 4])
def test_kcore_matches_python_peel(spark, k):
    from e_commerce_data_engineering_spark.operators.graph import kcore

    rng = np.random.default_rng(41)
    n_nodes, n_draws = 60, 220
    pairs = rng.integers(0, n_nodes, size=(n_draws, 2))
    edge_list = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in pairs if a != b}
    )
    expected = _py_kcore(edge_list, k)
    df = spark.createDataFrame(edge_list, ["u", "v"])
    got = {r["node"]: r["degree"] for r in kcore(df, k).collect()}
    assert got == expected


def test_kcore_deep_peel_chain(spark):
    """A path graph has empty 2-core; a path + one triangle peels down
    over many rounds to exactly the triangle — exercises the fixpoint
    loop beyond one round (the unrolled g06 twin can't see this)."""
    from e_commerce_data_engineering_spark.operators.graph import kcore

    path = [(i, i + 1) for i in range(20)]
    triangle = [(100, 101), (101, 102), (100, 102)]
    df = spark.createDataFrame(path + triangle, ["u", "v"])
    got = {r["node"]: r["degree"] for r in kcore(df, 2).collect()}
    assert got == {100: 2, 101: 2, 102: 2}
    assert kcore(spark.createDataFrame(path, ["u", "v"]), 2).count() == 0


def test_kcore_raises_when_max_iter_exhausted(spark):
    """An unconverged peel must fail loudly, not return a subgraph that
    is not the k-core (round-4 ADVICE): a 12-node chain needs ~6 peel
    rounds, so max_iter=2 cannot reach the (empty) fixpoint."""
    from e_commerce_data_engineering_spark.operators.graph import kcore

    path = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(path, ["u", "v"])
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(df, 2, max_iter=2).collect()


def test_broadcast_decision_flips_at_threshold(spark):
    """x18's strategy pick (operators/sketch.broadcast_decision) must
    flip from broadcast to shuffle EXACTLY where the size estimate
    crosses the threshold — rows*row_bytes == threshold still
    broadcasts (Spark's own <= semantics), one row more shuffles."""
    from e_commerce_data_engineering_spark.operators.sketch import broadcast_decision

    at = 1024  # threshold / row_bytes: 1024 rows * 128 B == 128 KiB
    df = spark.createDataFrame(
        [(at - 1,), (at,), (at + 1,), (10_000_000,)], ["n"]
    ).select("n", broadcast_decision(F.col("n"), 128, 131072).alias("strategy"))
    got = {r["n"]: r["strategy"] for r in df.collect()}
    assert got[at - 1] == "broadcast"
    assert got[at] == "broadcast"  # boundary inclusive
    assert got[at + 1] == "shuffle"
    assert got[10_000_000] == "shuffle"


def test_x18_cms_estimate_ranks_join_sizes(spark, sf_dir):
    """The CMS inner-product estimate must (a) never undershoot the
    exact join size (one-sided estimator) and (b) preserve the exact
    sizes' ORDER across the five star joins — the property the
    broadcast decision actually leans on when no statistics exist."""
    from e_commerce_data_engineering_spark.plans.graph_sketch import (
        x18_cms_broadcast_decision,
    )

    rows = x18_cms_broadcast_decision(spark, sf_dir).collect()
    assert len(rows) == 5
    assert {r["strategy"] for r in rows} == {"broadcast", "shuffle"}
    for r in rows:
        assert r["est_join_size"] >= r["exact_join_size"], r["pair"]
    by_exact = sorted(rows, key=lambda r: r["exact_join_size"])
    ests = [r["est_join_size"] for r in by_exact]
    assert ests == sorted(ests)
