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
