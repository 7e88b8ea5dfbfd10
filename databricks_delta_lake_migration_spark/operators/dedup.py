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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import norm_text_hash
from .textstats import shingles, tokens, word_kgrams


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
    """Per-row MinHash signature struct over distinct word 3-gram
    shingles; fields ``mh0..mh{n-1}``.

    Shingles, not unigram token sets: low-vocabulary corpora make
    unigram sets collide pathologically (every doc shares the
    min-hashed word), while order-sensitive 3-grams are near-unique
    across unrelated docs — the standard shingle→minhash→band design.

    Single ``aggregate`` fold computing ALL chunk-mins in one pass over
    one sha256 digest per shingle — num_hashes independent 32-bit hash
    functions for the price of one digest, and one expression so
    Catalyst can't re-evaluate the shingle pipeline per signature field
    (separate array_min projections each re-run it: measured 8× cost).
    Zero shuffles, zero Python. ``portable=True`` uses sliced sha256
    (oracle-reproducible via substring()); ``False`` uses seeded
    xxhash64 (cheaper, production default at scale).
    """
    sh = F.array_distinct(shingles(text))

    if portable:
        assert num_hashes <= 8, "sha256 yields 8 32-bit hex chunks"
        digests = F.transform(sh, lambda w: F.sha2(w, 256))
        # 'g' sorts after every hex char, so it's a safe +inf sentinel.
        zero = F.struct(
            *[F.lit("g" * 8).alias(f"mh{i}") for i in range(num_hashes)]
        )

        def merge(acc, d):
            return F.struct(
                *[
                    F.least(acc[f"mh{i}"], F.substring(d, 1 + 8 * i, 8)).alias(f"mh{i}")
                    for i in range(num_hashes)
                ]
            )

        return F.aggregate(digests, zero, merge)

    hashes = F.transform(
        sh, lambda w: F.array(*[F.xxhash64(F.lit(f"{s}|"), w) for s in range(num_hashes)])
    )
    zero = F.struct(
        *[F.lit(2**63 - 1).cast("long").alias(f"mh{i}") for i in range(num_hashes)]
    )

    def merge_xx(acc, hs):
        return F.struct(
            *[
                F.least(acc[f"mh{i}"], F.element_at(hs, i + 1)).alias(f"mh{i}")
                for i in range(num_hashes)
            ]
        )

    return F.aggregate(hashes, zero, merge_xx)


def minhash_band_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Long-format LSH band buckets ``(id, band_idx, bkt)`` — the
    PERSISTABLE per-document index rows (materialize them to a table
    and new batches probe with one equi-join instead of re-hashing the
    corpus; see ``incremental_lsh_pairs``).

    One pass: explode the signature struct into rows behind a
    generator barrier, so the shingle+digest fold runs exactly once
    per input row — per-band self-joins would re-run it once per band
    per join side (measured 8× cost for 4 bands)."""
    n_bands = num_hashes // band_size
    sigs = df.select(
        F.col(id_col),
        F.explode(F.array(minhash_signature(F.col(text_col), num_hashes))).alias("sig"),
    )
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.concat_ws(
                        "#",
                        *[F.col(f"sig.mh{b * band_size + i}") for i in range(band_size)],
                    ).alias("bkt"),
                )
                for b in range(n_bands)
            ]
        )
    )
    return sigs.select(F.col(id_col), bands.alias("b")).select(
        id_col, "b.band_idx", "b.bkt"
    )


def _salt_oversized_buckets(
    banded: DataFrame, id_col: str, bucket_cap: int, keep_nsub: bool = False
) -> DataFrame:
    """Sub-split LSH band buckets larger than ``bucket_cap`` into
    pseudo-random salt groups (the ``knn_graph`` salt-cap ported to
    the MinHash band index — VERDICT r9 #2). Adds ``__salt``; buckets
    at or under the cap keep a single salt group (0), so capped output
    EXACTLY equals uncapped output whenever no bucket exceeds the cap.

    The salt mixes ``band_idx``, so each band sub-splits its (shared)
    mega-bucket membership independently — across bands a document
    meets a fresh random cap-sized sample of its cluster, which is
    what keeps hot near-duplicate clusters CONNECTED (see the cap
    -semantics note on :func:`lsh_candidate_pairs`). The size window
    and the downstream bucket groupBy key the same relation; a
    degenerate bucket costs one spill-able window partition of small
    (id, band, bkt) rows instead of |B|² pair rows."""
    wb = Window.partitionBy("band_idx", "bkt")
    salted = (
        banded.withColumn(
            "__nsub",
            F.ceil(F.count(F.lit(1)).over(wb) / F.lit(bucket_cap)).cast("int"),
        )
        .withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(F.col(id_col), F.col("band_idx")), F.col("__nsub")
            ).cast("int"),
        )
    )
    return salted.drop("__nsub") if not keep_nsub else salted


def _expand_bucket_pairs(
    banded: DataFrame, id_col: str, keys: list[str]
) -> DataFrame:
    """In-bucket pair expansion shared by the from-scratch and
    incremental LSH paths: group band rows on ``keys``, then a
    combinations fold over the sorted in-bucket id array → one
    ``(id_a, id_b)`` row per unordered pair, ``id_a < id_b``. ONE
    shuffle keyed on the bucket and ONE evaluation of the upstream
    signature pipeline; per-task state is the bucket's id list."""
    ids = F.sort_array(F.collect_list(id_col))
    return (
        banded.groupBy(*keys)
        .agg(ids.alias("ids"))
        .filter(F.size("ids") > 1)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    bucket_cap: int | None = 128,
) -> DataFrame:
    """LSH banding: docs sharing any band of the MinHash signature become
    candidate pairs. Returns distinct (id_a, id_b) with id_a < id_b.

    The per-band self-equi-join is the scale path: shuffle keyed on the
    band bucket, never an all-pairs product.

    Cap semantics (``bucket_cap``, default 128): buckets larger than
    the cap — mega-clusters of near-identical docs, routine in raw web
    crawl, which co-bucket on EVERY band so no band_size fixes them —
    are salt-split per band into ~cap-sized sub-groups and pairs are
    expanded only within a sub-group, bounding candidate work to
    ~n_bands·cap per doc (LINEAR total) instead of |B|² per bucket.
    Output contract under the cap: buckets ≤ cap (every bucket LSH
    banding is TUNED to produce) are expanded exactly, so output
    equals the uncapped output whenever no bucket exceeds the cap;
    inside an oversized bucket, pairwise candidate recall drops to
    ~n_bands·cap/|B| per pair (exactly ``1-(1-1/ceil(|B|/cap))^n_bands``;
    measured 0.2943 vs 0.2939 analytic on a planted |B|=192, cap=16,
    4-band mega-bucket — ``test_lsh_bucket_cap_recall_matches_
    expectation``) while every member still meets ~cap co-members per
    band — so cluster CONNECTIVITY (what the dedup decision consumes
    via connected components) is preserved, which is the property the
    planted mega-cluster test asserts.
    ``bucket_cap=None`` restores the uncapped r9 behavior.

    .. note:: the 128 default (new in r10) is a BREAKING default for
       callers consuming the raw candidate pairs of corpora whose
       buckets exceed 128 — they lose per-pair recall with no signal
       (the connected-components dedup consumer is unaffected). Pass
       ``bucket_cap=None`` to keep the old contract; ``bucket_cap < 1``
       raises (``ceil(count/0)`` would NULL the salt and silently
       disable the cap).
    """
    if bucket_cap is not None and bucket_cap < 1:
        raise ValueError(f"bucket_cap must be >= 1 or None, got {bucket_cap}")
    banded = minhash_band_buckets(df, text_col, id_col, num_hashes, band_size)
    # Bucket-group, then expand pairs WITHIN each bucket — the LSH
    # reduction with exactly ONE shuffle keyed on the bucket and ONE
    # evaluation of the shingle+digest pipeline. A self-equi-join would
    # re-run the signature fold on both join sides (different column
    # aliases defeat exchange reuse; measured 3×). Pair expansion is a
    # combinations fold over the sorted in-bucket id array, so the
    # output stays |B|² per bucket — the same as the join — while the
    # per-task state is just the bucket's id list. LSH banding keeps
    # buckets small by construction; the salt cap bounds the degenerate
    # ones (identical-doc mega-clusters) that no banding tune can.
    keys = ["band_idx", "bkt"]
    if bucket_cap is not None:
        banded = _salt_oversized_buckets(banded, id_col, bucket_cap)
        keys.append("__salt")
    return _expand_bucket_pairs(banded, id_col, keys).distinct()


def incremental_lsh_pairs(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    bucket_cap: int | None = 128,
) -> DataFrame:
    """Incremental near-dup: candidate pairs INVOLVING a new batch,
    probing a persisted band-bucket ``index`` (the output of
    ``minhash_band_buckets``, typically materialized as a table that
    grows with the corpus).

    This is the production corpus-dedup shape: at 100 TB you index
    once and each arriving batch re-hashes ONLY ITSELF — one
    equi-join on (band_idx, bkt) against the index for new↔corpus
    pairs, plus the in-bucket fold over the (small) batch for
    new↔new pairs. Never an all-pairs product, never a corpus
    re-hash. Results equal the from-scratch ``lsh_candidate_pairs``
    over corpus∪batch restricted to pairs touching the batch —
    signatures are deterministic, so the equivalence is exact
    whenever no probed bucket exceeds ``bucket_cap`` (the common
    case; the cap's contract is on :func:`lsh_candidate_pairs`).

    ``bucket_cap`` guards BOTH quadratic fronts: the batch-side
    in-bucket fold (same salt-split as the from-scratch path) and the
    index probe — a mega-cluster living in the INDEX would hand every
    matching new doc its full |B| membership, so index rows of probed
    oversized buckets are salt-split and each new row probes exactly
    one salt group, bounding per-new-doc candidates to ~n_bands·cap.
    The size window runs only over index rows of buckets the batch
    actually probes (a left-semi restriction the equi-join implies
    anyway), so the standing corpus is never re-scanned beyond the
    probe.

    .. note:: the two ``localCheckpoint`` calls below run EAGER Spark
       jobs at plan-construction time (the second scans the probed
       slice of the index) even if the returned DataFrame is never
       evaluated, and localCheckpoint blocks live on executor storage,
       not reliable storage — losing an executor after the call
       invalidates the truncated lineage and the plan must be rebuilt
       from this function. The trade accepted here: without the
       materialization the signature fold re-runs once per consuming
       branch (the module's measured 8× trap). Callers that construct
       the plan speculatively should call this lazily.
    """
    if bucket_cap is not None and bucket_cap < 1:
        raise ValueError(f"bucket_cap must be >= 1 or None, got {bucket_cap}")
    # materialize the batch's band rows ONCE: they feed up to four
    # branches of the final plan (probe-key distinct, the cross join's
    # new side, the within-batch fold) and the shingle+digest fold is
    # the expensive part — same localCheckpoint discipline as
    # connected_components/pagerank (re-running the fold per branch
    # was the module's own documented 8x trap)
    new_bands = minhash_band_buckets(
        new_docs, text_col, id_col, num_hashes, band_size
    ).localCheckpoint()
    # new ↔ indexed corpus: one shuffle keyed on the bucket. The index
    # may contain the new docs themselves (growing-table pattern) —
    # the inequality filter drops self-matches either way.
    if bucket_cap is not None:
        probed = index.join(
            new_bands.select("band_idx", "bkt").distinct(),
            ["band_idx", "bkt"],
            "left_semi",
        )
        # materialized too: feeds both the join side and the nsub
        # relation — without it the index probe (a full index semi
        # scan) runs twice
        salted = _salt_oversized_buckets(
            probed, id_col, bucket_cap, keep_nsub=True
        ).localCheckpoint()
        idx_side = salted.drop("__nsub")
        # each new row probes ONE salt group of the bucket, picked by
        # the same (id, band) hash the index side salts with — nsub
        # rides a bucket-keyed relation bounded by the PROBED bucket
        # count (batch-sized, not corpus-sized); inner join is exact:
        # a batch bucket absent from the index yields no cross pairs
        nsubs = salted.select("band_idx", "bkt", "__nsub").distinct()
        new_side = (
            new_bands.join(nsubs, ["band_idx", "bkt"])
            .withColumn(
                "__salt",
                F.pmod(
                    F.xxhash64(F.col(id_col), F.col("band_idx")),
                    F.col("__nsub"),
                ).cast("int"),
            )
            .drop("__nsub")
        )
        join_keys = ["band_idx", "bkt", "__salt"]
    else:
        idx_side, new_side = index, new_bands
        join_keys = ["band_idx", "bkt"]
    cross = (
        new_side.alias("n")
        .join(idx_side.alias("x"), join_keys)
        .filter(F.col(f"n.{id_col}") != F.col(f"x.{id_col}"))
        .select(
            F.least(F.col(f"n.{id_col}"), F.col(f"x.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"n.{id_col}"), F.col(f"x.{id_col}")).alias("id_b"),
        )
    )
    # new ↔ new: in-bucket combinations fold over the batch only,
    # salt-capped exactly like the from-scratch path
    wkeys = ["band_idx", "bkt"]
    within_bands = new_bands
    if bucket_cap is not None:
        within_bands = _salt_oversized_buckets(new_bands, id_col, bucket_cap)
        wkeys.append("__salt")
    within = _expand_bucket_pairs(within_bands, id_col, wkeys)
    return cross.unionByName(within).distinct()


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

    The token relation is ``localCheckpoint``-ed (eager job at
    plan-construction time, the module's standard trade): it feeds
    THREE consumers — both self-join sides and the per-doc size
    aggregate — and the tokenize fold is the expensive part; distinct
    column aliases on the join sides defeat exchange reuse, so without
    the materialization it runs three times.
    """
    toks = df.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).localCheckpoint()
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

def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    portable: bool = False,
) -> DataFrame:
    """Per-doc SimHash: each distinct token votes ±1 on each bit of its
    hash; sign of the per-bit vote sum forms the fingerprint.
    Implemented with higher-order array folds (per-row, no shuffle).
    Near-dups = small Hamming distance between fingerprints.

    ``portable=True`` hashes tokens with sliced sha256 (first 8 hex
    chars → 32-bit int), reproducible in any engine with sha256 —
    the oracle-checkable twin. Default is seeded xxhash64 (cheaper,
    production path at scale)."""
    toks = F.array_distinct(tokens(F.col(text_col)))
    if portable:
        assert bits <= 32, "portable hash yields 32 bits per sha256 slice"
        hashes = F.transform(
            toks,
            lambda w: F.conv(F.substring(F.sha2(w, 256), 1, 8), 16, 10).cast("long"),
        )
    else:
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


def chargram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "source",
    n: int = 4,
    threshold: float = 0.3,
) -> DataFrame:
    """Character n-gram Jaccard near-dup pairs [EXT] — order-sensitive
    variant of :func:`jaccard_pairs` for cross-language / no-whitespace
    text. Same token-join reduction; the normalized text is materialized
    behind an explode barrier so the regexp normalization is not
    re-evaluated per n-gram position."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    base = df.select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        F.explode(F.array(norm)).alias("__norm"),
    )
    # substring with a dynamic start position needs expr()
    grams = F.expr(
        f"array_distinct(transform(sequence(1, greatest(length(__norm) - {n - 1}, 1)),"
        f" i -> substring(__norm, i, {n})))"
    )
    # materialized for the same three-consumer reason as
    # :func:`jaccard_pairs` (both join sides + sizes; the n-gram
    # transform is the expensive part)
    toks = base.select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        F.explode(grams).alias("g"),
    ).localCheckpoint()
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    join_keys = ["g"] + ([block_col] if block_col else [])
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
    union_sz = F.col("sz_a") + F.col("sz_b") - F.col("n_shared")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("n_shared") / union_sz >= threshold)
        .select(
            "id_a",
            "id_b",
            F.round(F.col("n_shared") / union_sz, 6).alias("jaccard"),
        )
    )


def chunk_dedup_counts(
    df: DataFrame,
    chunk_words: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk-level exact dedup [EXT]: split each document into
    consecutive ``chunk_words``-word chunks, fingerprint each, and
    report corpus-wide duplicated chunks (hash, occurrences, distinct
    docs).

    The whole chunking is array expressions (split → sequence →
    slice → concat_ws) — codegen'd JVM, no explode-then-regroup and no
    order-unstable ``collect_list``. One shuffle, keyed on the chunk
    hash; at 100 TB that key is near-uniform (content hash), so no
    skew. This is the building block of contamination scans and
    boilerplate removal in training-data pipelines: exact doc-level
    dedup (q34) misses documents that share most chunks but not all.
    """
    if chunk_words < 1:
        # size/0.0 is Infinity — the counts would be silently garbage
        raise ValueError(f"chunk_words must be >= 1, got {chunk_words}")
    words = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(float(chunk_words))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * chunk_words + 1, chunk_words)),
    )
    exploded = df.select(
        F.col(id_col), F.explode(chunks).alias("chunk")
    )
    return (
        exploded.groupBy(F.sha2(F.col("chunk"), 256).alias("chunk_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "label",
) -> DataFrame:
    """Connected components over a near-duplicate pair graph [EXT]:
    (node, component) where component = min node id reachable — turns
    pairwise near-dup hits into dedup GROUPS (keep one doc per
    component). Both algorithms produce the IDENTICAL labeling.

    ``algorithm="label"`` (default): iterative min-label propagation —
    each round joins labels across edges and keeps the per-node
    minimum; converges in O(graph diameter) rounds. Near-dup clusters
    are shallow (stars/cliques), so 2-4 rounds in practice; cheapest
    per round (one join + one groupBy).

    ``algorithm="star"``: alternating large-star/small-star edge
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC 2014 — public formulation): large-star hangs
    every larger neighbor of u onto min(N(u) ∪ {u}); small-star hangs
    the smaller neighbors (and u) onto the same min. Each pair of
    steps at least HALVES tree heights, so convergence is O(log n)
    rounds regardless of diameter — the remedy when label propagation
    exhausts ``max_iter`` on chain-shaped graphs (path graphs from
    transitive shingle overlaps). Per round: two groupBy(min) + two
    joins, all keyed on node id — same shuffle discipline, more rounds
    bought per shuffle.

    Scale discipline (both): every step is an equi-join/groupBy keyed
    on node id, the convergence check is a metadata-sized count, and
    ``localCheckpoint`` truncates the growing lineage so round N's
    plan doesn't replay rounds 1..N-1 — the standard Spark pattern for
    iterative graph algorithms (GraphX/GraphFrames do the same
    internally).
    """
    if algorithm not in ("label", "star"):
        raise ValueError(f"algorithm must be 'label' or 'star': {algorithm!r}")
    if max_iter < 1:  # range(0) would skip to the else-raise with
        raise ValueError(f"max_iter must be >= 1: {max_iter}")  # `changed` unbound
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    if algorithm == "star":
        return _cc_star(e, max_iter)
    edges = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select("a")
        .distinct()
        .select(F.col("a").alias("node"), F.col("a").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = edges.join(labels, edges.b == labels.node).select(
            edges.a.alias("node"), F.col("label")
        )
        new_labels = (
            labels.union(prop).groupBy("node").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # a silently non-converged labeling would split one true
        # component into several — callers would keep duplicate docs
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); diameter-deep chains "
            "need ~diameter rounds — use algorithm='star' "
            "(O(log n) rounds) or raise max_iter"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


def _cc_star(e: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star contraction (see
    :func:`connected_components`). ``e``: raw (a, b) pairs. Edges are
    kept canonically LARGER-FIRST (u > v); the fixpoint is a star
    forest (member → component-min), read out as the labeling."""
    # canonical undirected edge set, larger endpoint first, no loops
    edges = (
        e.filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    # node set from the RAW pairs (not the loop-filtered edges) so a
    # self-loop-only node still labels itself — parity with "label"
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def large_star(ed: DataFrame) -> DataFrame:
        # center every node; m_u = min(N(u) ∪ {u}); larger neighbors
        # attach to m_u. Output edges satisfy v(larger) > m, so they
        # stay canonical larger-first.
        bidir = ed.union(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = bidir.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            bidir.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(ed: DataFrame) -> DataFrame:
        # edges arrive larger-first: N_small(u) = all v. Everyone in
        # N_small(u) ∪ {u} attaches to m_u = min(N_small(u)).
        m = ed.groupBy("u").agg(F.min("v").alias("m"))
        nbrs = ed.join(m, "u").select(F.col("v").alias("w"), F.col("m"))
        selfs = m.select(F.col("u").alias("w"), F.col("m"))
        return (
            nbrs.union(selfs)
            .filter(F.col("w") != F.col("m"))
            .select(F.col("w").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    for _ in range(max_iter):
        new_edges = small_star(large_star(edges)).localCheckpoint()
        changed = (
            new_edges.exceptAll(edges).count()
            + edges.exceptAll(new_edges).count()
        )
        edges = new_edges
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components(star) did not converge in {max_iter} "
            f"rounds ({changed} edge changes) — O(log n) rounds suffice "
            "for any graph; raise max_iter"
        )
    # fixpoint = star forest: edges (member, root); roots label selves
    return (
        nodes.join(edges, nodes.node == edges.u, "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce(F.col("v"), F.col("node")).alias("component"),
        )
    )


def fuzzy_pairs(
    df: DataFrame,
    name_col: str,
    id_col: str,
    max_dist: int = 2,
    block: Column | None = None,
    max_block_rows: int = 5000,
) -> DataFrame:
    """Blocked edit-distance matching [EXT]: pairs of rows whose
    ``name_col`` values are within Levenshtein distance ``max_dist`` —
    the entity-resolution primitive (vendor/product/customer name
    reconciliation) that completes the dedup ladder's character-level
    end (exact → MinHash → SimHash → chargram → edit distance).

    ``block`` (default: the last whitespace token of the name) gates
    the quadratic comparison: candidates are generated by ONE
    equi-join on the block key, so cost is Σ(block²), never n² —
    the same bounded-blocking discipline as the LSH band join and
    SemDeDup cells. Levenshtein itself is a JVM builtin
    (``F.levenshtein``) — no Python in the pair loop. Pick a block
    with bounded fan-in (last name token, normalized phone prefix,
    zip).

    The blocking contract is ENFORCED, not advisory: a degenerate
    block (constant / low-cardinality key) would silently degrade to
    all-pairs, so any block exceeding ``max_block_rows`` raises at
    execution time naming the hot block and its size
    (``F.raise_error`` inside the plan — the check rides the same
    per-block window as candidate generation, zero extra shuffles).
    The operator is exact, so salt-splitting is NOT an option here
    (pairs straddling salt groups would be lost — unlike the
    approximate ``knn_graph`` buckets); re-block on a finer key or
    route hot entities through :func:`lsh_candidate_pairs`.

    Emits ``(id_a, id_b, name_a, name_b, dist)`` with ``id_a < id_b``
    so each unordered pair appears exactly once.
    """
    b = (
        block
        if block is not None
        else F.element_at(F.split(F.col(name_col), " "), -1)
    )
    # NULL-block rows can NEVER join (a NULL key never matches an
    # equi-join), so they are dropped BEFORE the block-size window:
    # keeping them exempt inside the guard (the r9 shape) still
    # funneled every NULL row into one window partition — a skew
    # straggler on exactly the many-NULL-names corpora the exemption
    # targeted (ADVICE r9)
    side = df.select(
        F.col(id_col), F.col(name_col), b.alias("__block")
    ).filter(F.col("__block").isNotNull())
    # the guard is folded into the join key itself (not a dropped side
    # column Catalyst could prune away): evaluating the key for a row
    # of a too-hot block raises
    blk_sz = F.count(F.lit(1)).over(Window.partitionBy("__block"))
    side = side.withColumn(
        "__block",
        F.when(
            blk_sz > max_block_rows,
            F.raise_error(
                F.concat(
                    F.lit("fuzzy_pairs: block "),
                    F.col("__block"),
                    F.lit(" has "),
                    blk_sz.cast("string"),
                    F.lit(
                        f" rows > max_block_rows={max_block_rows}; "
                        "candidate volume would be quadratic in the "
                        "block — pick a finer block key"
                    ),
                )
            ).cast("string"),
        ).otherwise(F.col("__block")),
    )
    left = side.select(
        F.col("__block"),
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
    )
    right = side.select(
        F.col("__block"),
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
    )
    return (
        left.join(right, "__block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT set-similarity join with prefix filtering (the PPJoin
    family, Xiao et al. 2008 — public formulation): all pairs with
    word-set Jaccard ≥ ``threshold``, found WITHOUT LSH's false
    negatives and WITHOUT the all-token join's candidate blowup.

    Prefix principle: order each doc's tokens by ascending global
    frequency (rarest first); if ``J(a,b) ≥ t`` the sets must share a
    token within each other's first ``|s| − ⌈t·|s|⌉ + 1`` tokens — so
    joining ONLY on prefix tokens is provably complete. Two further
    exact prunes: the length filter (``min ≥ t·max``) and the final
    array-intersect verification (row-local JVM builtins on candidate
    pairs only).

    Scale: candidates = Σ df(rare tokens in prefixes)² — at high
    thresholds orders of magnitude below :func:`jaccard_pairs`' every-
    token join, and unlike :func:`lsh_candidate_pairs` the result is
    exact (completeness asserted vs brute force in tests). Shuffles:
    token-frequency agg, per-doc window, ONE prefix-token equi-join,
    and the verify join against the doc-set relation.

    Both the token relation (three consumers: frequency agg, the
    ranking join, the verify doc-sets) and the prefix relation (both
    equi-join sides) are ``localCheckpoint``-ed — the module's
    standard eager-materialization trade; without it the tokenize
    fold and the two ranking windows re-run per consumer.
    """
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).localCheckpoint()
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("id").orderBy(
        F.col("df").asc(), F.col("tok").asc()
    )
    wsz = Window.partitionBy("id")
    ranked = (
        toks.join(freq, "tok")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("sz", F.count(F.lit(1)).over(wsz))
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("id", "tok", "sz").localCheckpoint()
    a = prefix.select(
        F.col("tok"), F.col("id").alias("id_a"), F.col("sz").alias("sz_a")
    )
    b = prefix.select(
        F.col("tok"), F.col("id").alias("id_b"), F.col("sz").alias("sz_b")
    )
    cands = (
        a.join(b, "tok")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.least("sz_a", "sz_b")
                >= F.lit(threshold) * F.greatest("sz_a", "sz_b")
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    doc_sets = toks.groupBy("id").agg(
        F.sort_array(F.collect_list("tok")).alias("ts"),
        F.count(F.lit(1)).alias("sz"),
    )
    sa = doc_sets.select(
        F.col("id").alias("id_a"), F.col("ts").alias("ts_a"),
        F.col("sz").alias("sz_a"),
    )
    sb = doc_sets.select(
        F.col("id").alias("id_b"), F.col("ts").alias("ts_b"),
        F.col("sz").alias("sz_b"),
    )
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    jac = inter / (F.col("sz_a") + F.col("sz_b") - inter)
    # threshold the UNROUNDED jaccard (rounding is display-only): a
    # pair with true J in [t-5e-7, t) that rounds up to t is NOT a
    # match, and the prefix/length candidate generation is only
    # provably complete for true J >= t — filtering on the rounded
    # value would claim exactness the prefixes can't back
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= threshold)
        .select(
            "id_a", "id_b",
            inter.alias("n_shared"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


def _dup_gram_positions(
    df: DataFrame, k: int, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared core of the exact-substring family: ``(words, dup_pos)``
    where ``words`` is (id, ws, n_words) and ``dup_pos`` is the
    (id, pos) relation of k-gram START positions whose gram occurs in
    ≥ 2 distinct documents (0-based ``pos``; the span covers words
    pos..pos+k-1)."""
    words = df.select(
        F.col(id_col).alias("id"),
        tokens(F.col(text_col)).alias("ws"),
    ).withColumn("n_words", F.size("ws"))
    grams = words.select(
        "id", F.posexplode(word_kgrams(F.col("ws"), k)).alias("pos", "gram")
    )
    # cross-document frequency: ONE gram-keyed shuffle. Exactness
    # requires grouping on the gram itself; at 100 TB pre-bucket the
    # shuffle on xxhash64(gram) and keep the string only for the
    # in-bucket equality check — hash-only grouping would merge
    # colliding grams and over-strip.
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    # dup_pos feeds MULTIPLE consumers in both callers (profile: the
    # dup-gram count AND the coverage expansion; strip: the span
    # rebuild) and sits atop the expensive gram fold + gram-keyed
    # join — materialize it once. It is the (id, pos) relation of
    # DUPLICATED positions only, far smaller than the gram relation
    # itself (which stays un-checkpointed: corpus-gram-sized strings).
    dup_pos = grams.join(dup, "gram").select("id", "pos").localCheckpoint()
    return words, dup_pos


def exact_substring_profile(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document repeated-substring profile at word k-gram
    granularity [EXT] — the measurement half of the ExactSubstr recipe
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", public formulation): for every document, how many
    of its k-gram positions (and how many of its words) are covered by
    a substring that also appears verbatim in ≥ 2 distinct documents.
    The boilerplate-line stripper is the line-granularity special case
    of this; see :func:`strip_duplicate_spans` for the removal half.

    Returns ``(doc_id, n_words, n_grams, n_dup_grams, n_covered_words,
    dup_ratio)`` — ``dup_ratio = n_dup_grams / n_grams`` (NULL for
    docs shorter than ``k`` words).

    Scale: grams never materialize per-document state beyond the token
    array (row-local zip_with); the only shuffles are the gram-keyed
    frequency agg (map-side combined), the candidate join back, and
    ONE per-doc aggregate carrying both signals. Coverage expansion is
    a row-local fold over each doc's DUPLICATED positions only, not
    the corpus."""
    words, dup_pos = _dup_gram_positions(df, k, text_col, id_col)
    # ONE id-keyed aggregate computes BOTH per-doc signals (r13): the
    # dup-gram count is the group size, and coverage is a row-local
    # interval fold over the SORTED positions — the k-wide spans all
    # have equal length, so sorted-by-start the union size is
    # k + Σ min(k, pᵢ − pᵢ₋₁) (positions are unique per doc: each has
    # exactly one gram). The former shape ran two separate shuffles
    # (an (id) agg plus an (id,p) distinct over k×-exploded span rows,
    # itself re-exchanged for its per-id count) and joined words
    # twice. Per-task state is ONE position list per doc (≤ n_grams
    # ints, no k× expansion) — the same per-doc collect posture as
    # strip_duplicate_spans' reassembly.
    cov_fold = F.aggregate(
        F.array_sort(F.collect_list("pos")),
        F.struct(
            F.lit(None).cast("integer").alias("prev"),
            F.lit(0).cast("long").alias("cov"),
        ),
        lambda acc, p: F.struct(
            p.cast("integer").alias("prev"),
            (
                acc["cov"]
                + F.when(acc["prev"].isNull(), F.lit(k)).otherwise(
                    F.least(F.lit(k), p - acc["prev"])
                )
            ).alias("cov"),
        ),
        lambda acc: acc["cov"],
    )
    per_doc = dup_pos.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_dup_grams"),
        cov_fold.alias("n_covered_words"),
    )
    n_grams = F.greatest(F.col("n_words") - k + 1, F.lit(0)).cast("long")
    return (
        words.join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_words").cast("long").alias("n_words"),
            n_grams.alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.coalesce("n_covered_words", F.lit(0)).alias("n_covered_words"),
            F.when(
                n_grams > 0,
                F.round(
                    F.coalesce("n_dup_grams", F.lit(0)) / n_grams, 6
                ),
            ).alias("dup_ratio"),
        )
    )


def strip_duplicate_spans(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr removal half (Lee et al. 2022): rebuild each
    document with every word position covered by a cross-document
    duplicated k-gram removed. Returns ``(doc_id, text_stripped,
    n_kept_words)`` — empty string when the whole doc is duplicated
    material.

    The kept-word reassembly is a per-doc sort over SURVIVING
    positions only (array_sort on collected (pos, word) structs —
    row-local, no global sort); word order inside each doc is
    preserved exactly."""
    words, dup_pos = _dup_gram_positions(df, k, text_col, id_col)
    cov = dup_pos.select(
        "id", F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("p")
    ).distinct()
    positions = words.select(
        "id", F.posexplode("ws").alias("p", "w")
    )
    kept = positions.join(cov, ["id", "p"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("text_stripped"),
        F.count(F.lit(1)).alias("n_kept_words"),
    )
    return (
        words.select("id")
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("text_stripped", F.lit("")).alias("text_stripped"),
            F.coalesce("n_kept_words", F.lit(0)).alias("n_kept_words"),
        )
    )
