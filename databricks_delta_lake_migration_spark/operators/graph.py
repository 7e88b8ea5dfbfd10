"""Graph analytics [EXT]: fixed-iteration PageRank over an edge
relation — corpus-quality scoring on link/co-occurrence graphs (the
public Brin & Page 1998 formulation; web-graph PageRank is a standard
document-quality prior in training-data curation). Companion to the
connectivity operator :func:`..operators.dedup.connected_components`.

Spark-first shape: the graph IS two DataFrames — (src, dst) edges and
the (src, deg) out-degree relation. Each iteration is one
edges⨝ranks join (broadcast while ranks fit an executor; src-keyed
shuffle via ``broadcast_ranks=False`` at web scale) and one dst-keyed
aggregate; no driver-side adjacency, no RDDs. Per-edge contributions
snap to DECIMAL(28,12) before the incoming-mass sum, so the result is
bit-stable under any partitioning AND engine (the registry's decimal
doctrine applied to iterative math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank: ``r'(v) = (1−d)/N + d·Σ_{u→v} r(u)/deg(u)``
    from uniform ``1/N``, run ``iterations`` times. Returns
    ``(node, rank)`` with rank rounded to 8 dp.

    Contract: every node must appear as BOTH a source and a
    destination (symmetric/co-occurrence graphs satisfy this) — a
    dangling node would leak mass, a source-only node would vanish
    from the result. Fixed iteration count (not convergence polling)
    keeps the plan static and the output deterministic.

    Scale: edges stay partitioned throughout; with the default
    ``broadcast_ranks=True`` the node-sized rank relation broadcasts
    onto them each iteration — right whenever ranks fit an executor
    (up to ~10⁸ nodes). ``broadcast_ranks=False`` is the web-scale
    path the docstring used to only promise: contributions join the
    edges src-keyed (one shuffle exchange per iteration, no
    node-relation replication), so a billion-node graph runs without
    editing the operator. Identical output either way — the join is
    the same equi-join, only the physical strategy moves (tested
    hash-equal). Contributions are decimal-snapped so the per-node
    sum is exact and order-independent under both strategies.
    """
    # materialize the edge relation once: it feeds every iteration's
    # join, and a lazy lineage would rebuild it per iteration (and per
    # level of the rank chain) — localCheckpoint truncates the plan,
    # same discipline as dedup.connected_components
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    # node count as ONE driver-side count over the checkpointed deg
    # relation (r12): the former 1-row nn aggregate was crossJoin-
    # broadcast into every iteration's rank expression, so the final
    # plan evaluated the deg-agg subtree (and built its broadcast)
    # once per iteration plus once for r0 — a literal keeps the plan
    # linear in iterations. Arithmetic unchanged: the same int feeds
    # the same double divisions, so ranks are bit-identical.
    n_nodes = deg.count()
    ranks = deg.select(
        F.col("src").alias("node"),
        (F.lit(1.0) / F.lit(n_nodes)).alias("r"),
    )
    # deg is node-sized — the SAME relation class the default mode
    # already broadcasts (contribs) — but it arrives as a checkpointed
    # RDD scan whose size Spark cannot estimate, so the planner gave
    # every iteration's ranks⨝deg join a SortMergeJoin: 2 shuffle
    # exchanges + 2 sorts PER ITERATION on node-sized inputs (r12
    # measured plan). Broadcasting it under the same broadcast_ranks
    # contract removes all of them; the web-scale shuffle mode keeps
    # the un-hinted join (a billion-node deg must not broadcast).
    d_rel = F.broadcast(deg) if broadcast_ranks else deg
    for _ in range(iterations):
        # join conditions resolve BY NAME (each name unique to one
        # side): deg/e are ancestors of both sides of these
        # self-joins, so dataset-attribute refs (deg.src) would trip
        # Spark's ambiguous-self-join detector
        contribs = ranks.join(d_rel, F.col("node") == F.col("src")).select(
            F.col("src").alias("__csrc"),
            F.round(F.col("r") / F.col("deg"), 12)
            .cast("decimal(28,12)")
            .alias("c"),
        )
        c_rel = F.broadcast(contribs) if broadcast_ranks else contribs
        ranks = (
            e.join(c_rel, F.col("src") == F.col("__csrc"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("sc"))
            .select(
                "node",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.lit(n_nodes)
                    + F.lit(damping) * F.col("sc").cast("double")
                ).alias("r"),
            )
        )
    return ranks.select("node", F.round("r", 8).alias("rank"))


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_degrees: bool = True,
) -> DataFrame:
    """Exact per-node triangle counts over an undirected edge relation
    [EXT] (input may list each edge once in either direction or both;
    self-loops ignored) — the clustering/community-density primitive.
    Returns ``(node, n_triangles)`` for every node in ≥1 triangle;
    the global count is ``sum/3``.

    Distributed shape (the standard degree-orientation reduction,
    Suri & Vassilvitskii 2011 "Counting Triangles and the Curse of the
    Last Reducer"): orient every edge from its LOWER-degree endpoint
    to the higher (ties by id), so each wedge is generated at its
    lowest-degree vertex — Σ deg_oriented² stays near-linear even on
    power-law graphs where the naive Σ deg² explodes at hub nodes.
    Then: wedges = oriented ⨝ oriented on the pivot (ONE self-join),
    closed by ONE membership join against the canonical edge set.
    Every join is a hash equi-join; nothing is quadratic in degree of
    the hot node."""
    # canon feeds THREE consumers (the degree explode, the
    # orientation join, the closing join) and carries a distinct
    # shuffle — materialized once, the module's standard trade (same
    # localCheckpoint discipline as pagerank's edges/deg)
    canon = edges.select(
        F.least(F.col(src_col), F.col(dst_col)).alias("a"),
        F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
    ).filter(F.col("a") != F.col("b")).distinct().localCheckpoint()
    # undirected degree — both endpoints via ONE explode over one scan
    # of canon (the unionAll twin scanned it once per branch)
    deg = (
        canon.select(
            F.explode(F.array(F.col("a"), F.col("b"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    # degree attach (r12): da/db are NODE-sized but derive from a
    # checkpointed RDD scan Spark cannot size, so the planner shuffled
    # the EDGE-sized canon twice (2 SortMergeJoins) to attach them.
    # Broadcasting the degree relation moves only node-sized bytes —
    # the same fits-an-executor contract as pagerank's default mode;
    # ``broadcast_degrees=False`` keeps the un-hinted shuffle joins
    # for graphs whose node relation outgrows an executor.
    if broadcast_degrees:
        da, db = F.broadcast(da), F.broadcast(db)
    ranked = canon.join(da, "a").join(db, "b")
    # orient low-(deg, id) → high-(deg, id): a total order, so the
    # oriented graph is acyclic and each triangle forms exactly one
    # wedge at its minimum vertex
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    # oriented feeds both wedge self-join sides — materialized so the
    # two degree joins behind it run once, not per side
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    ).localCheckpoint()
    e1 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    e2 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    wedges = e1.join(e2, "u").filter(F.col("v") < F.col("w"))
    closing = canon.select(F.col("a").alias("v"), F.col("b").alias("w"))
    tris = wedges.join(closing, ["v", "w"])  # (u, v, w) triangles
    # per-node tally via ONE explode (r12): the former 3-branch
    # unionAll re-evaluated the whole wedge⨝closing pipeline once per
    # branch — 12 SortMergeJoins / 13 exchanges in the measured plan;
    # the generator emits the same (u, v, w) node multiset row-locally
    # behind a single evaluation (the knn_graph mirror pattern), so
    # the join pipeline runs once.
    per_node = (
        tris.select(
            F.explode(F.array(F.col("u"), F.col("v"), F.col("w"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node
