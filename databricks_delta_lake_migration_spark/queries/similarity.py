"""Embedding similarity-search query surface [EXT] over the
``embeddings`` fixture (64-dim float vectors)."""

from __future__ import annotations

# module-scope so pandas_udf type hints (stringified by the future
# import above) resolve against the module globals
import pandas as pd  # noqa: F401

from pyspark.sql import DataFrame, SparkSession

from ..operators import similarity
from .registry import load_table, query

# DuckDB twin of similarity._dot_decimal (1-based list indexing in both).
def _sql_dot(a: str, b: str, dims: int = 64) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, {dims + 1}), "
        f"i -> CAST(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) AS DECIMAL(20,10)))) AS DOUBLE)"
    )


@query(
    "q40_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           ROUND({_sql_dot('embedding', 'qvec')} /
                 (sqrt({_sql_dot('embedding', 'embedding')}) * sqrt({_sql_dot('qvec', 'qvec')})), 6) AS cosine
    FROM embeddings CROSS JOIN q
    WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
    """,
)
def q40_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 neighbors of vec_id=0.
    Decimal-snapped dot products → bit-identical across engines."""
    return similarity.cosine_topk(load_table(spark, sf_dir, "embeddings"), query_vec_id=0)


@query(
    "q42_embedding_stats",
    oracle=f"""
    WITH t AS (
        SELECT label,
               ROUND(sqrt({_sql_dot('embedding', 'embedding')}), 6) AS nrm,
               CAST(embedding[1] AS DOUBLE) AS d1
        FROM embeddings
    )
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_norm,
           ROUND(CAST(SUM(CAST(d1 AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS avg_dim1
    FROM t GROUP BY label
    """,
)
def q42_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corpus profile (count, mean L2 norm, mean dim-1)."""
    return similarity.embedding_stats(load_table(spark, sf_dir, "embeddings"))


def _recall_verdict(ann: DataFrame, exact: DataFrame, k: int, threshold: float) -> DataFrame:
    """Hard-checkable ANN output: the raw neighbor list is approximate
    and engine-local, but |ANN ∩ exact-top-k| / k ≥ threshold is a
    deterministic boolean both engines agree on — the same trick as
    q43's HLL tolerance verdict. Composed lazily (no driver actions)."""
    from pyspark.sql import functions as F

    n = ann.agg(F.count(F.lit(1)).alias("n_results"))
    hits = ann.join(exact.select("vec_id"), "vec_id", "left_semi").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return n.crossJoin(hits).select(
        F.lit(0).cast("bigint").alias("query_id"),
        F.col("n_results"),
        (F.col("n_hits") / k >= threshold).alias("recall_ok"),
    )


@query(
    "q41_ann_lsh_topk",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS query_id, CAST(10 AS BIGINT) AS n_results,
           TRUE AS recall_ok
    """,
)
def q41_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via sign-LSH bucket restriction (4 hyperplanes,
    Hamming-1 multi-probe) + exact re-rank — the LSH scale path. The
    neighbor list itself is approximate, so the hard-checked output is
    the recall verdict vs in-query brute force: ≥0.2 at k=10 (observed
    0.3–0.6 on the fixtures; 1.5× margin)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ann = similarity.lsh_topk(emb, query_vec_id=0, k=10, n_planes=4)
    exact = similarity.cosine_topk(emb, query_vec_id=0, k=10)
    return _recall_verdict(ann, exact, k=10, threshold=0.2)


@query(
    "q44_batch_topk",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id IN (0, 1, 2)
    ), scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ROUND({_sql_dot('e.embedding', 'q.qvec')} /
                     (sqrt({_sql_dot('e.embedding', 'e.embedding')}) * sqrt({_sql_dot('q.qvec', 'q.qvec')})), 6) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= 5
    """,
)
def q44_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch exact kNN [EXT]: top-5 neighbors for a query SET in one
    plan — corpus scanned once, queries broadcast, per-query window
    ranking."""
    return similarity.batch_topk(
        load_table(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2], k=5
    )


@query(
    "q53_pandas_udf_norm",
    oracle=f"""
    SELECT vec_id, label,
           ROUND(sqrt({_sql_dot('embedding', 'embedding')}), 6) AS l2_norm
    FROM embeddings WHERE vec_id % 5 = 0
    """,
)
def q53_pandas_udf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Pandas UDF path (§2.12 [EXT]): Arrow-batched L2 norm
    over the embedding column. The accumulation decimal-snaps each
    squared term exactly like the JVM/_sql_dot formulation, so the
    Python path hash-matches the SQL oracle — demonstrating that the
    Arrow lane can be made bit-deterministic too."""
    from decimal import Decimal

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def l2_norm(vecs: pd.Series) -> pd.Series:
        import math

        def norm(v):
            acc = Decimal(0)
            for x in v:
                p = float(x) * float(x)
                acc += Decimal(f"{p:.10f}")  # snap at decimal(_,10), like _dot_decimal
            return round(math.sqrt(float(acc)), 6)

        return vecs.map(norm)

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    return e.select("vec_id", "label", l2_norm("embedding").alias("l2_norm"))


@query(
    "q46_cosine_near_dup",
    oracle=f"""
    WITH p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND({_sql_dot('a.embedding', 'b.embedding')} /
                     (sqrt({_sql_dot('a.embedding', 'a.embedding')}) *
                      sqrt({_sql_dot('b.embedding', 'b.embedding')})), 6) AS cosine
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.35
    """,
)
def q46_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs [EXT] — exact within
    label blocks (equi-join shuffle, per-block quadratic only). The
    un-blockable scale path is q47 (sign-LSH buckets as blocks)."""
    return similarity.cosine_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.35
    )


@query(
    "q47_lsh_near_dup",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS n_false_positives, TRUE AS recall_ok
    """,
)
def q47_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via sign-LSH blocking + exact in-bucket cosine —
    the 100 TB path when no natural block key exists. Hard-checked
    verdict: zero false positives (the in-bucket check is exact) and
    recall ≥0.4 vs the unblocked exact pair set (observed 0.63; the
    exact set is computed in-query, never all-pairs in production)."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    lsh = similarity.lsh_near_dup_pairs(emb, threshold=0.35, n_planes=4)
    exact = similarity.cosine_near_dup_pairs(
        emb.withColumn("one", F.lit(1)), threshold=0.35, block_col="one"
    ).select("id_a", "id_b")
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_hits = lsh.join(exact, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        n_lsh.crossJoin(n_exact)
        .crossJoin(n_hits)
        .select(
            (F.col("n_lsh") - F.col("n_hits")).alias("n_false_positives"),
            (F.col("n_hits") / F.col("n_exact") >= 0.4).alias("recall_ok"),
        )
    )


@query(
    "q48_ivf_topk",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS query_id, CAST(10 AS BIGINT) AS n_results,
           TRUE AS recall_ok
    """,
)
def q48_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k (deterministic k-means coarse quantizer, nprobe
    cell probing, exact in-cell re-rank) — the density-adaptive scale
    path beside sign-LSH (q41). Hard-checked recall verdict ≥0.4 at
    k=10, nprobe=4/16 (observed 0.5–0.7)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ann = similarity.ivf_topk(emb, query_vec_id=0, k=10, n_cells=16, nprobe=4)
    exact = similarity.cosine_topk(emb, query_vec_id=0, k=10)
    return _recall_verdict(ann, exact, k=10, threshold=0.4)


@query(
    "q96_pq_topk",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS query_id, CAST(10 AS BIGINT) AS n_results,
           TRUE AS recall_ok
    """,
)
def q96_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN top-k [EXT]: product-quantized codes (16 subspaces × 32
    codes — m bytes per vector), asymmetric-distance scan over broadcast
    lookup tables, exact cosine re-rank of the top 8k ADC candidates.
    The compressed-codes path that composes with IVF (q48) at 100 TB.
    Hard-checked recall verdict ≥0.4 at k=10 (observed 0.8-1.0)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ann = similarity.pq_topk(emb, query_vec_id=0, k=10)
    exact = similarity.cosine_topk(emb, query_vec_id=0, k=10)
    return _recall_verdict(ann, exact, k=10, threshold=0.4)


@query(
    "q97_ivfpq_topk",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS query_id, CAST(10 AS BIGINT) AS n_results,
           TRUE AS recall_ok
    """,
)
def q97_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN top-k [EXT]: cell pruning (which rows) composed with
    product-quantized ADC scanning (what each row costs) — the
    production 100 TB shape. Hard-checked recall verdict ≥0.4 at k=10
    (observed 0.7-1.0)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ann = similarity.ivfpq_topk(emb, query_vec_id=0, k=10, n_cells=16, nprobe=4)
    exact = similarity.cosine_topk(emb, query_vec_id=0, k=10)
    return _recall_verdict(ann, exact, k=10, threshold=0.4)


@query(
    "q107_semantic_dedup",
    oracle="""
    SELECT (SELECT COUNT(*) FROM embeddings) AS n_vectors,
           CAST(0 AS BIGINT) AS n_false_positives,
           TRUE AS recall_ok, TRUE AS partition_ok, TRUE AS every_removed_paired
    """,
)
def q107_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication [EXT]: k-means clusters
    (the IVF coarse quantizer) block the corpus, exact cosine pairs are
    expanded ONLY within clusters, connected components pick one
    representative per near-dup group, the rest are removal candidates.
    At 100 TB the all-pairs comparison this replaces is impossible —
    clustering bounds the quadratic work to O(cell²) and accepts
    missing cross-cluster duplicates, which the in-query recall verdict
    quantifies against corpus-wide brute force (in-cell pairs recover
    ≥ 25% of all exact pairs here; raise n_cells for cheaper cells at
    lower recall). Verdicts pinned by the oracle: zero false-positive
    pairs (in-cell candidates are exactly verified), kept ∪ removed
    partitions the corpus, and every removed vector sits in a verified
    near-dup pair."""
    from pyspark.sql import functions as F

    from ..operators import similarity as sim
    from ..operators.dedup import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    cents = sim.ivf_train(emb, n_cells=8)
    cells = sim.ivf_assign(emb, cents)
    # pair sets feed several downstream actions (CC rounds, recall,
    # verdicts) — materialize once instead of re-running the blocked
    # self-join per action
    pairs = sim.cosine_near_dup_pairs(
        cells, threshold=0.35, block_col="cell"
    ).localCheckpoint()

    comp = connected_components(pairs)
    keep_reps = comp.groupBy("component").agg(F.min("doc_id").alias("rep"))
    removed = comp.join(
        keep_reps, (comp.component == keep_reps.component) & (comp.doc_id != keep_reps.rep)
    ).select(comp.doc_id.alias("removed_id"))

    exact = (
        sim.cosine_near_dup_pairs(
            emb.withColumn("one", F.lit(1)), threshold=0.35, block_col="one"
        )
        .select("id_a", "id_b")
        .localCheckpoint()
    )

    n_vec = emb.count()
    n_pairs = pairs.count()
    n_hits = pairs.join(exact, ["id_a", "id_b"], "left_semi").count()
    n_exact = exact.count()
    n_removed = removed.count()
    paired_ids = pairs.select(F.col("id_a").alias("i")).union(
        pairs.select(F.col("id_b").alias("i"))
    ).distinct()
    n_removed_paired = removed.join(
        paired_ids, removed.removed_id == paired_ids.i, "left_semi"
    ).count()

    return spark.createDataFrame(
        [
            (
                n_vec,
                n_pairs - n_hits,
                (n_hits / max(n_exact, 1)) >= 0.25,
                bool(n_removed <= n_vec),
                n_removed_paired == n_removed,
            )
        ],
        "n_vectors long, n_false_positives long, recall_ok boolean, "
        "partition_ok boolean, every_removed_paired boolean",
    )


@query(
    "q115_persisted_ivf_index",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS query_id, CAST(10 AS BIGINT) AS n_results,
           TRUE AS recall_ok, TRUE AS equals_retrained, TRUE AS partition_pruned
    """,
)
def q115_persisted_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted IVF index — the build/serve split
    (``similarity.build_ivf_index`` / ``ivf_index_topk``): the corpus
    is trained + assigned ONCE and materialized as a log table
    partitioned by cell with centroids in table properties; the probe
    (opened through a FRESH table handle, as a restarted service
    would) ranks cells driver-side and scans only the nprobe matching
    partitions. Verdicts: probe result identical to a from-scratch
    ``ivf_topk`` with the same seed (determinism of the persisted
    artifact), recall ≥0.4 vs exact, and the probe's file-skip count
    proves partition pruning actually happened (cell IN (...) →
    numeric partition-path pruning)."""
    import tempfile

    from pyspark.sql import functions as F

    from ..tables import LogTable

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="ivf-index-") + "/t"
    similarity.build_ivf_index(spark, emb, path, n_cells=16)
    index = LogTable(spark, path)  # fresh handle: restart simulation
    ann = similarity.ivf_index_topk(index, query_vec_id=0, k=10, nprobe=4)
    retrained = similarity.ivf_topk(emb, query_vec_id=0, k=10, n_cells=16, nprobe=4)
    exact = similarity.cosine_topk(emb, query_vec_id=0, k=10)
    sym_diff = ann.select("vec_id", "cosine").exceptAll(
        retrained.select("vec_id", "cosine")
    ).unionAll(
        retrained.select("vec_id", "cosine").exceptAll(ann.select("vec_id", "cosine"))
    )
    equals_retrained = sym_diff.agg(F.count(F.lit(1)).alias("n"))
    ps = index.prune_stats("cell IN (0, 1)")
    pruned = ps["files_skipped"] > 0
    base = _recall_verdict(ann, exact, k=10, threshold=0.4)
    return base.crossJoin(equals_retrained).select(
        "query_id",
        "n_results",
        "recall_ok",
        (F.col("n") == 0).alias("equals_retrained"),
        F.lit(bool(pruned)).alias("partition_pruned"),
    )


@query(
    "q133_sq8_topk",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS query_id, CAST(10 AS BIGINT) AS n_results,
           TRUE AS recall_ok
    """,
)
def q133_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantization ANN top-k [EXT]: one byte per dimension
    (4× over float32), encode/dequantize/score all pure Catalyst
    zip_with folds against broadcast [min,max] bounds — the fully
    JVM-side compressed-scan alternative to PQ's codebook ADC (q96).
    Exact cosine re-rank of the top 8k dequantized candidates.
    Hard-checked recall verdict ≥0.5 at k=10 (observed ~1.0 — 8-bit
    dequantization error is far below neighbor separation)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ann = similarity.sq8_topk(emb, query_vec_id=0, k=10)
    exact = similarity.cosine_topk(emb, query_vec_id=0, k=10)
    return _recall_verdict(ann, exact, k=10, threshold=0.5)


@query(
    "q140_bq_topk",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS query_id, CAST(10 AS BIGINT) AS n_results,
           TRUE AS recall_ok
    """,
)
def q140_bq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN top-k [EXT]: one SIGN BIT per dimension
    packed into a single BIGINT (32× over float32), candidates ranked
    by ``bit_count(code XOR query)`` — the cheapest possible
    first-pass scan (8 bytes + one popcount per vector) — then exact
    cosine re-rank of the top 8k. Completes the compression ladder
    BQ (1 bit) / SQ8 (1 byte, q133) / PQ (codebook bytes, q96).
    Hard-checked recall verdict ≥0.5 at k=10 vs exact brute force."""
    emb = load_table(spark, sf_dir, "embeddings")
    ann = similarity.bq_topk(emb, query_vec_id=0, k=10)
    exact = similarity.cosine_topk(emb, query_vec_id=0, k=10)
    return _recall_verdict(ann, exact, k=10, threshold=0.5)


@query(
    "q150_pca_embeddings",
    oracle="""
    SELECT CAST(8 AS INT) AS n_components, TRUE AS orthonormal,
           TRUE AS variance_descending, TRUE AS beats_uniform_share,
           TRUE AS projection_centered
    """,
)
def q150_pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA dimensionality reduction over the embedding corpus [EXT]
    (``similarity.pca_train/pca_project`` — the 64→8 compression stage
    before ANN indexing / clustering): one ``mapInPandas`` corpus pass
    accumulates per-partition (n, Σx, XᵀX) numpy partials — one
    d²-sized row per PARTITION, never per document, so the shape holds
    at d=768–4096 — the eigendecomposition runs on the driver's d×d
    reduction of those partials, and the
    projection is a row-local fold. Hard-checked verdicts: components
    are orthonormal; per-component projected variance is descending and
    matches the eigenvalue ORDER; the top-8 subspace captures
    well above its uniform 8/64 share of total variance (observed ~0.20
    vs 0.125 — the fixture embeddings are fairly isotropic, so a
    majority bound would overclaim); projections are centered
    (each component's mean ≈ 0)."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    means, comps = similarity.pca_train(emb, k=8)
    k = len(comps)
    dot = lambda a, b: sum(x * y for x, y in zip(a, b))
    orthonormal = all(
        abs(dot(comps[i], comps[j]) - (1.0 if i == j else 0.0)) < 1e-8
        for i in range(k)
        for j in range(k)
    )
    proj = similarity.pca_project(emb, means, comps)
    stats = proj.select(
        *[
            F.avg(F.col("pca")[i]).alias(f"m{i}")
            for i in range(k)
        ],
        *[
            F.var_pop(F.col("pca")[i]).alias(f"v{i}")
            for i in range(k)
        ],
        *[
            F.var_pop(F.col("embedding")[i].cast("double")).alias(f"t{i}")
            for i in range(64)
        ],
    ).collect()[0]
    variances = [stats[f"v{i}"] for i in range(k)]
    total_var = sum(stats[f"t{i}"] for i in range(64))
    descending = all(
        variances[i] >= variances[i + 1] - 1e-9 for i in range(k - 1)
    )
    explains = sum(variances) / total_var > 0.16  # uniform share = 0.125
    centered = all(abs(stats[f"m{i}"]) < 1e-6 for i in range(k))
    return spark.createDataFrame(
        [(k, bool(orthonormal), bool(descending), bool(explains),
          bool(centered))],
        "n_components int, orthonormal boolean, variance_descending boolean, "
        "beats_uniform_share boolean, projection_centered boolean",
    )


@query(
    "q165_mmr_diversify",
    oracle="""
    SELECT CAST(8 AS INT) AS n_selected, TRUE AS ids_distinct,
           TRUE AS all_from_candidates, TRUE AS first_is_nearest,
           TRUE AS diversified_vs_topk
    """,
)
def q165_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance retrieval diversification [EXT]
    (``similarity.mmr_select`` — the post-ANN dedup step a RAG /
    training-data sampler runs so the k results aren't k near-copies):
    corpus scoring is the distributed broadcast-query top-32 scan; the
    greedy λ·relevance − (1−λ)·redundancy selection runs driver-side
    over the 32×64-float candidate set (metadata-sized). Hard-checked
    verdicts: 8 distinct picks, all from the candidate set, the first
    pick IS the exact nearest neighbor, and the MMR set's mean
    pairwise cosine is strictly below the plain top-8's (it traded
    relevance for diversity — deterministic on the fixed fixture)."""
    import numpy as np

    from pyspark.sql import functions as F

    from ..operators import similarity as simops

    emb = load_table(spark, sf_dir, "embeddings")
    k, lam = 8, 0.7
    sel = simops.mmr_select(emb, query_vec_id=0, k=k, n_candidates=32,
                            lam=lam).collect()
    cands = simops.cosine_topk(emb, 0, k=32).collect()
    cand_ids = [r.vec_id for r in cands]
    top8 = set(cand_ids[:k])
    picked = [r.vec_id for r in sel]

    def mean_pairwise(ids):
        rows = (
            emb.filter(F.col("vec_id").isin([int(i) for i in ids]))
            .select("vec_id", "embedding")
            .collect()
        )
        x = np.array([np.asarray(r.embedding, np.float64) for r in rows])
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        s = x @ x.T
        n = len(ids)
        return (s.sum() - n) / (n * (n - 1))

    diversified = mean_pairwise(picked) < mean_pairwise(top8)
    return spark.createDataFrame(
        [(
            len(picked),
            len(set(picked)) == len(picked),
            set(picked) <= set(cand_ids),
            picked[0] == cand_ids[0],
            bool(diversified),
        )],
        "n_selected int, ids_distinct boolean, all_from_candidates boolean, "
        "first_is_nearest boolean, diversified_vs_topk boolean",
    )


@query(
    "q175_knn_graph",
    oracle="""
    SELECT TRUE AS all_nodes_covered, CAST(0 AS BIGINT) AS n_self_edges,
           TRUE AS degree_bounded, TRUE AS recall_ok
    """,
)
def q175_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN GRAPH over the whole corpus [EXT]
    (``similarity.knn_graph`` — multi-table sign-LSH, plane count
    auto-sized from the corpus count (ceil(log2(n/256)) clamped
    [2,24]), oversized buckets salt-split to ≤128 members so candidate
    work is LINEAR in n even for tight near-duplicate clusters,
    candidates = any shared (table, bucket, salt), ONE equi shuffle,
    deterministic double-fold re-rank, per-src window top-5). The
    structure semantic dedup / clustering / diversity sampling
    consume. Hard verdicts: every vector has neighbors (observed 100%
    coverage), zero self edges, per-node degree ≤ k, and mean sampled
    recall vs exact top-5 over five probe ids ≥ 0.3 (observed 0.56 at
    sf0.1, ≥0.8 at sf0.01 — honest LSH approximation with margin).
    Verdict assembly is 3 jobs total: one fused graph-stats agg, one
    broadcast 5-probe exact top-5, one recall join."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    # n_vectors reuses the verdict's own count → the LSH plane count
    # auto-sizes from corpus size with zero extra jobs
    from ..operators import similarity as simops

    g = simops.knn_graph(emb, k=5, n_vectors=n_vecs).cache()
    # graph stats: coverage, self edges, max degree — ONE fused agg
    stats = (
        g.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("deg"),
            F.sum(F.when(F.col("src") == F.col("dst"), 1).otherwise(0))
            .alias("self_e"),
        )
        .agg(
            F.count(F.lit(1)).alias("covered"),
            F.sum("self_e").alias("self_edges"),
            F.max("deg").alias("max_deg"),
        )
        .collect()[0]
    )
    # exact top-5 for the five probe ids in ONE broadcast job, then one
    # semi-join against the cached graph for the recall tally
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        simops._norm("embedding", 64).alias("__qnorm"),
    )
    # corpus norm folds once per row, probe norm once per probe — not
    # per (row × probe) pair (r13, the batch_topk hoist; bit-identical)
    cos = F.round(
        simops._dot_decimal("embedding", "qvec", 64)
        / (F.col("__cnorm") * F.col("__qnorm")),
        6,
    )
    wq = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    exact5 = (
        emb.select(
            "vec_id", "embedding", simops._norm("embedding", 64).alias("__cnorm")
        )
        .crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 5)
        .select("qid", "vec_id")
    )
    hits = (
        exact5.join(
            g.select(F.col("src").alias("qid"), F.col("dst").alias("vec_id")),
            ["qid", "vec_id"],
            "left_semi",
        ).count()
    )
    g.unpersist()
    return spark.createDataFrame(
        [(
            stats["covered"] >= 0.95 * n_vecs,
            stats["self_edges"],
            stats["max_deg"] <= 5,
            hits / 25 >= 0.3,
        )],
        "all_nodes_covered boolean, n_self_edges long, "
        "degree_bounded boolean, recall_ok boolean",
    )


@query(
    "q192_hard_negatives",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec, label AS qlabel
        FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
    ), scored AS (
        SELECT query_id, qlabel, vec_id AS negative_id,
               label AS negative_label,
               ROUND({_sql_dot('embedding', 'qvec')} /
                     (sqrt({_sql_dot('embedding', 'embedding')})
                      * sqrt({_sql_dot('qvec', 'qvec')})), 6) AS cosine
        FROM embeddings CROSS JOIN q
        WHERE label <> qlabel AND vec_id <> query_id
    )
    SELECT query_id, qlabel, negative_id, negative_label, cosine,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, negative_id ASC
        ) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
)
def q192_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training [EXT] —
    ``similarity.hard_negatives``: per anchor, the 3 most-similar
    vectors with a DIFFERENT label. Anchors broadcast, ONE corpus scan
    scores all pairs with the exact decimal-fold cosine, the label
    exclusion is row-local, and a per-anchor window keeps k."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.hard_negatives(emb, query_ids=[0, 1, 2, 3, 4], k=3)


@query(
    "q207_vector_stats_hof",
    oracle="""
    WITH s AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(ROUND(CAST(x AS DOUBLE), 6) AS DECIMAL(12,6)))
                   AS v
        FROM embeddings
    )
    SELECT vec_id,
           CAST(len(v) AS INTEGER) AS n_dims,
           ROUND(sqrt(CAST(list_aggregate(
               list_transform(v, x -> x * x), 'sum') AS DOUBLE)), 6)
               AS l2_norm,
           CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_positive,
           ROUND(CAST(list_aggregate(v, 'sum') AS DOUBLE) / len(v), 6)
               AS mean_val
    FROM s
    """,
)
def q207_vector_stats_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector feature statistics via higher-order array functions
    [EXT]: transform / filter / aggregate evaluate ROW-LOCAL inside
    whole-stage codegen — the idiomatic Spark shape for elementwise
    vector math (zero explodes, zero shuffles, zero Python; the
    UDF-free path the §2.12 surface routes around). Elements snap to
    DECIMAL(12,6) before the folds so the sums are exact and
    order-independent in both engines — the registry's decimal
    doctrine applied inside an array."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double"), 6).cast("decimal(12,6)"),
    )
    e = emb.select("vec_id", v.alias("v"))
    # accumulator precision is chosen so the ADD ITSELF stays exact:
    # (30,12)+(25,12) -> (31,12) (scale preserved, no rounding), then
    # the cast back to (30,12) is exact for any in-range sum. A (38,12)
    # accumulator looks safer but is the trap: (38,12)+(25,12) would
    # exceed 38 digits and Spark silently re-scales the ADD to (38,11),
    # rounding away the 12th decimal BEFORE the lambda's cast —
    # review-confirmed to zero out sums of ~1e-12 components entirely
    sq_sum = F.aggregate(
        F.transform("v", lambda x: x * x),
        F.lit(0).cast("decimal(30,12)"),
        lambda acc, x: (acc + x).cast("decimal(30,12)"),
    )
    v_sum = F.aggregate(
        "v",
        F.lit(0).cast("decimal(30,6)"),
        lambda acc, x: (acc + x).cast("decimal(30,6)"),
    )
    return e.select(
        "vec_id",
        F.size("v").cast("int").alias("n_dims"),
        F.round(F.sqrt(sq_sum.cast("double")), 6).alias("l2_norm"),
        F.size(F.filter("v", lambda x: x > 0)).cast("long").alias("n_positive"),
        F.round(v_sum.cast("double") / F.size("v"), 6).alias("mean_val"),
    )
