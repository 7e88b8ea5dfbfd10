"""Graph-analytics registrations [EXT] (``operators.graph``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load_table, query


def _pagerank_oracle(iterations: int = 3) -> str:
    """DuckDB twin of operators.graph.pagerank over the co-purchase
    part graph: identical decimal-snapped contributions, identical
    double expression ordering, one CTE per iteration."""
    ctes = [
        """edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ), deg AS (
        SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1
    ), nn AS (SELECT COUNT(*) AS n_nodes FROM deg),
    r0 AS (
        SELECT src AS node, 1.0 / n_nodes AS r FROM deg, nn
    )"""
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        ctes.append(f"""i{i} AS (
        SELECT node, (1.0 - 0.85) / n_nodes + 0.85 * sc AS r FROM (
            SELECT e.dst AS node,
                   CAST(SUM(CAST(ROUND(r.r / d.deg, 12)
                        AS DECIMAL(28,12))) AS DOUBLE) AS sc
            FROM edges e
            JOIN {prev} r ON e.src = r.node
            JOIN deg d ON e.src = d.src
            GROUP BY 1
        ), nn
    )""")
        prev = f"i{i}"
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node, ROUND(r, 8) AS rank FROM {prev}"
    )


@query("q193_pagerank", oracle=_pagerank_oracle(3))
def q193_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph [EXT] —
    ``operators.graph.pagerank``, 3 fixed iterations, damping 0.85:
    the corpus-quality prior of training-data curation applied to the
    catalog graph (parts that co-occur with well-connected parts rank
    high). Edges come from ONE orderkey self-join; each iteration is
    one broadcast of the node-sized rank relation onto the
    still-partitioned edges plus one dst-keyed exact-decimal sum."""
    from ..operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    return pagerank(edges, iterations=3, damping=0.85)


@query(
    "q204_triangle_count",
    oracle="""
    WITH baskets AS (
        SELECT l_orderkey, l_partkey FROM lineitem
        WHERE l_orderkey % 3 = 0
        GROUP BY l_orderkey, l_partkey
    ), e AS (
        SELECT a.l_partkey AS a, b.l_partkey AS b
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), tri AS (
        SELECT e1.a AS u, e1.b AS v, e2.b AS w
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (SELECT unnest([u, v, w]) AS node FROM tri)
    GROUP BY 1
    """,
)
def q204_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the co-purchase graph [EXT] —
    ``operators.graph.triangle_count`` on the q154 edge relation (part
    pairs bought together in ≥2 sampled orders). Degree-orientation
    (Suri & Vassilvitskii 2011) makes wedge generation near-linear on
    power-law graphs — each triangle is generated exactly once at its
    lowest-degree vertex, so no hot hub ever enumerates its full
    neighborhood². The oracle brute-forces the 3-way edge join on the
    a<b canonical edges."""
    from ..operators.graph import triangle_count

    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 3 == 0)
        .select("l_orderkey", "l_partkey")
    )
    b1 = l.distinct()
    b2 = b1.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("partkey_b")
    )
    edges = (
        b1.join(b2, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("partkey_b"))
        .groupBy(
            F.col("l_partkey").alias("src"),
            F.col("partkey_b").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .select("src", "dst")
    )
    return triangle_count(edges)
