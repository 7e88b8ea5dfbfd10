"""Unit tests for operators.graph.pagerank."""

from decimal import ROUND_HALF_UP, Decimal


def _snap(x: float) -> float:
    """Python twin of round(x,12)::decimal(28,12) (HALF_UP)."""
    return float(
        Decimal(repr(x)).quantize(Decimal("1e-12"), rounding=ROUND_HALF_UP)
    )


def _reference_pagerank(edges, iterations=3, d=0.85):
    nodes = sorted({s for s, _ in edges})
    deg = {n: sum(1 for s, _ in edges if s == n) for n in nodes}
    r = {n: 1.0 / len(nodes) for n in nodes}
    for _ in range(iterations):
        contrib = {n: _snap(r[n] / deg[n]) for n in nodes}
        r = {
            v: (1.0 - d) / len(nodes)
            + d * sum(contrib[u] for u, w in edges if w == v)
            for v in nodes
        }
    return {n: round(v, 8) for n, v in r.items()}


def test_pagerank_regular_graph_stays_uniform(spark):
    """A symmetric triangle is regular: rank stays exactly 1/3."""
    from databricks_delta_lake_migration_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.rank for r in pagerank(df, iterations=3).collect()}
    assert out == {1: 0.33333333, 2: 0.33333333, 3: 0.33333333}


def test_pagerank_star_matches_reference(spark):
    """Symmetric 2-leaf star: the center accumulates rank; values match
    an exact Python replication of the snapped iteration."""
    from databricks_delta_lake_migration_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 0), (0, 2), (2, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.rank for r in pagerank(df, iterations=3).collect()}
    ref = _reference_pagerank(edges)
    assert out == ref
    assert out[0] > out[1] == out[2]
    assert abs(sum(out.values()) - 1.0) < 1e-6


def test_pagerank_shuffle_mode_hash_equal(spark):
    """VERDICT r9 #4: broadcast_ranks=False (web-scale src-keyed
    shuffle join) must produce IDENTICAL output to the default
    broadcast path — the decimal-snapped contributions make the sum
    order-independent, so only the physical join strategy moves. The
    shuffle plan must carry no broadcast of the contribution relation."""
    from databricks_delta_lake_migration_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1), (0, 3), (3, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    bcast_df = pagerank(df, iterations=3)
    bcast = {r.node: r.rank for r in bcast_df.collect()}
    shuf_df = pagerank(df, iterations=3, broadcast_ranks=False)
    shuf = {r.node: r.rank for r in shuf_df.collect()}
    assert shuf == bcast == _reference_pagerank(edges)
    # no broadcast HINT on the contribution equi-join in web-scale
    # mode (the 1-row n_nodes relation stays legitimately broadcast in
    # both modes; AQE may still pick BHJ on a tiny fixture — the
    # guarantee is that WE never force one on the node-sized relation)
    def _contrib_join_hinted(qdf):
        plan = qdf._jdf.queryExecution().optimizedPlan().toString()
        return any(
            "__csrc" in ln and "strategy=broadcast" in ln
            for ln in plan.splitlines()
            if ln.lstrip().lstrip("+:- ").startswith("Join")
        )

    assert _contrib_join_hinted(bcast_df)        # non-vacuous probe
    assert not _contrib_join_hinted(shuf_df)


def test_triangle_count_hand_checked(spark):
    """K4 has 4 triangles (every node in 3); duplicate/reversed edges
    and self-loops don't inflate; a path graph has none."""
    from databricks_delta_lake_migration_spark.operators.graph import (
        triangle_count,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    noisy = k4 + [(2, 1), (3, 3), (1, 2)]  # reversed dup + self-loop
    df = spark.createDataFrame(noisy, "src long, dst long")
    out = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    assert triangle_count(path).count() == 0
    # one triangle + pendant: pendant node absent from output
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    got = {r.node: r.n_triangles for r in triangle_count(tri).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_tally_single_evaluation_and_broadcast_degrees(spark):
    """r12 plan gates: (a) the per-node tally is ONE explode over a
    single evaluation of the wedge⨝closing pipeline — the former
    3-branch unionAll re-ran it per branch (measured 6 SortMergeJoins
    / 13 exchanges in the final plan, now 2 / ≤5); (b) degree attach
    broadcasts the node-sized relation instead of shuffling the
    edge-sized canon twice; (c) broadcast_degrees=False (node relation
    outgrows an executor) is hash-identical."""
    import contextlib
    import io

    from databricks_delta_lake_migration_spark.operators.graph import (
        triangle_count,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    df = spark.createDataFrame(k4 + [(4, 5)], "src long, dst long")
    out = triangle_count(df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Union" not in plan  # the tally explodes, never unions
    assert "Generate" in plan
    # one wedge join + one closing join, evaluated once
    tree = plan.split("== Physical Plan ==")[-1]
    n_smj = len([l for l in tree.splitlines() if "SortMergeJoin" in l])
    assert n_smj <= 4, f"tally pipeline re-evaluated: {n_smj} SMJs"
    got = {r.node: r.n_triangles for r in out.collect()}
    shuf = {
        r.node: r.n_triangles
        for r in triangle_count(df, broadcast_degrees=False).collect()
    }
    assert got == shuf == {1: 3, 2: 3, 3: 3, 4: 3}
