"""Deduplication operators [EXT] (SURVEY §2.14): exact, MinHash+LSH,
SimHash, n-gram/word Jaccard.

Scale design (100 TB of documents):
- Exact dedup is a hash-groupBy — one shuffle on a 64-hex key, no skew
  (hash keys are uniform).
- Near-dup NEVER does the O(n²) all-pairs join: MinHash signatures are
  computed per-row with higher-order array functions (no explode, no
  shuffle), then candidates come from a band-bucket equi-join — the
  standard LSH reduction. Verification Jaccard runs only on candidate
  pairs.
- The portable MinHash uses sha2(seed||token) so an external SQL oracle
  can reproduce signatures bit-for-bit (xxhash64 variant available for
  production speed via ``hash_fn``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import norm_text_hash
from .textstats import tokens


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per normalized-text hash. Deterministic
    (min-id wins) unlike dropDuplicates — SURVEY §7.4 item 2."""
    fp = norm_text_hash(F.col(text_col))
    return (
        df.withColumn("doc_fp", fp)
        .groupBy("doc_fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


def dedup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row summary: rows vs distinct normalized fingerprints."""
    fp = norm_text_hash(F.col(text_col))
    return df.select(fp.alias("fp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_dup_rows"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(
    text: Column, num_hashes: int = 8, portable: bool = True
) -> list[Column]:
    """Per-row MinHash signature over distinct tokens.

    Pure higher-order array expression: transform + array_min per hash
    seed — zero shuffles, zero Python. ``portable=True`` uses
    sha2(seed||token) (oracle-reproducible); ``False`` uses xxhash64
    (~10× cheaper, production default at scale).
    """
    toks = F.array_distinct(tokens(text))

    # NB: closures, not default-arg lambdas — pyspark treats a 2-param
    # lambda as (element, index) and would bind the seed to the index.
    def hasher(seed: int):
        if portable:
            return lambda w: F.sha2(F.concat(F.lit(f"{seed}|"), w), 256)
        return lambda w: F.xxhash64(F.concat(F.lit(f"{seed}|"), w))

    return [
        F.array_min(F.transform(toks, hasher(seed))).alias(f"mh{seed}")
        for seed in range(num_hashes)
    ]


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """LSH banding: docs sharing any band of the MinHash signature become
    candidate pairs. Returns distinct (id_a, id_b) with id_a < id_b.

    The per-band self-equi-join is the scale path: shuffle keyed on the
    band bucket, never an all-pairs product.
    """
    n_bands = num_hashes // band_size
    sigs = df.select(F.col(id_col), *minhash_signature(F.col(text_col), num_hashes))
    banded = sigs.select(
        id_col,
        *[
            F.concat_ws(
                "#", *[F.col(f"mh{b * band_size + i}") for i in range(band_size)]
            ).alias(f"band{b}")
            for b in range(n_bands)
        ],
    )
    pair_dfs = []
    for b in range(n_bands):
        left = banded.select(F.col(id_col).alias("id_a"), F.col(f"band{b}").alias("bkt"))
        right = banded.select(F.col(id_col).alias("id_b"), F.col(f"band{b}").alias("bkt"))
        pair_dfs.append(
            left.join(right, "bkt").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        )
    return reduce(DataFrame.unionByName, pair_dfs).distinct()


# ---------------------------------------------------------------------------
# Word-set Jaccard (token-join formulation — relational, portable, scalable)
# ---------------------------------------------------------------------------

def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "source",
    threshold: float = 0.5,
) -> DataFrame:
    """All-pairs word-set Jaccard within a blocking column.

    Token-join formulation: explode distinct tokens, self-join on token
    (+ block), count shared tokens, then J = |∩| / (|A|+|B|−|∩|).
    Blocking bounds the candidate space; at 100 TB use LSH
    (:func:`lsh_candidate_pairs`) as the blocker instead.
    """
    toks = df.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    join_keys = ["tok"] + ([block_col] if block_col else [])
    a = toks.select(*[F.col(c) for c in join_keys], F.col(id_col).alias("id_a"))
    b = toks.select(*[F.col(c) for c in join_keys], F.col(id_col).alias("id_b"))
    inter = (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared") / (F.col("sz_a") + F.col("sz_b") - F.col("n_shared")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """Per-doc SimHash: each distinct token votes ±1 on each bit of its
    xxhash64; sign of the per-bit vote sum forms the fingerprint.
    Implemented with higher-order array folds (per-row, no shuffle).
    Near-dups = small Hamming distance between fingerprints."""
    toks = F.array_distinct(tokens(F.col(text_col)))
    hashes = F.transform(toks, lambda w: F.xxhash64(w))

    def vote(bit: int):
        mask = 1 << bit
        return lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1)

    bit_votes = [F.aggregate(hashes, F.lit(0), vote(b)) for b in range(bits)]
    sim = reduce(
        lambda acc, pair: acc
        + F.when(pair[1] >= 0, F.lit(2 ** pair[0])).otherwise(0).cast("long"),
        enumerate(bit_votes),
        F.lit(0).cast("long"),
    )
    return df.select(F.col(id_col), sim.alias("simhash"))
