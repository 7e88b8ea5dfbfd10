"""Training-data curation operators [EXT]: sequence packing, data
mixture reweighting, and cross-split decontamination.

These are the corpus-assembly steps a large-scale LLM training
pipeline runs after dedup/quality filtering (SURVEY §2.14 companions
to :mod:`.dedup` / :mod:`.textstats`): pack documents into fixed
token-budget training sequences, re-weight sources toward a target
mixture, and strip training documents that share content with an
evaluation set. All three are pure DataFrame plans — no Python in the
row path — and every shuffle is keyed for scale (shard, source, or
content hash; never a global order or an all-pairs join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _whitespace_tokens(text_col: str):
    """Whitespace tokens over the normalized text — the same
    tokenization as :func:`textstats.tokens` so token counts agree
    across the curation surface."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )


def portable_hash_bucket(col, n_buckets: int = 10_000):
    """Deterministic [0, n_buckets) bucket from a sliced sha256 — the
    same portable hash family as :func:`dedup.simhash(portable=True)`,
    reproducible in any engine with sha256 (oracle-checkable). Use for
    sampling decisions that must be stable across engines and runs."""
    h = F.conv(F.substring(F.sha2(col.cast("string"), 256), 1, 8), 16, 10)
    return h.cast("long") % n_buckets


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 256,
    shard_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are streamed in
    ``order_col`` order within each ``shard_col`` shard, and the
    concatenated token stream is cut into training sequences of
    ``budget_tokens`` — each document lands in the sequence where its
    first token falls (GPT-style packing; boundary documents straddle).

    Returns one row per (shard, seq_id): documents placed, tokens
    carried, and the fill ratio of the sequence.

    Scale design: the ONLY shuffle is the per-shard window sort — the
    window is partitioned by shard, never global, so 100 TB packs as
    thousands of independent shard sorts (choose shards like
    source×date so each fits an executor). The running token total is
    an exclusive-prefix window sum, not a collect."""
    n_toks = F.size(_whitespace_tokens(text_col))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("n_toks").over(w), F.lit(0))
    placed = (
        df.select(F.col(shard_col), F.col(order_col), n_toks.alias("n_toks"))
        .withColumn("seq_id", F.floor(cum_excl / budget_tokens))
    )
    return placed.groupBy(shard_col, "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("seq_tokens"),
        F.round(
            F.sum("n_toks").cast("double") / budget_tokens, 6
        ).alias("fill_ratio"),
    )


def mixture_sample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Re-weight the corpus toward a uniform per-source token mixture
    and take the matching deterministic document sample.

    Each source's keep-probability is ``min(1, target/actual)`` where
    ``target`` is an equal share of total tokens; a document survives
    when its :func:`portable_hash_bucket` falls under the probability —
    deterministic, engine-portable, and stable under reruns (the
    down-sampling decision for a document never changes as the corpus
    grows elsewhere). Returns per-source totals, the applied weight,
    and the sampled doc/token counts.

    Scale design: two shuffles — one token aggregate keyed on source
    (map-side combined) and one re-aggregate of the filtered corpus;
    the per-source stats join back via broadcast (sources are
    metadata-sized). No global sort, no driver-side row data."""
    n_toks = F.size(_whitespace_tokens(text_col))
    docs = df.select(
        F.col(source_col), F.col(id_col), n_toks.alias("n_toks")
    )
    per_source = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("source_tokens"),
    )
    totals = per_source.agg(
        F.sum("source_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    weighted = per_source.crossJoin(F.broadcast(totals)).select(
        source_col,
        "n_docs",
        "source_tokens",
        F.least(
            F.lit(1.0),
            (F.col("total_tokens").cast("double") / F.col("n_sources"))
            / F.col("source_tokens"),
        ).alias("weight"),
    )
    kept = (
        docs.join(F.broadcast(weighted.select(source_col, "weight")), source_col)
        .filter(
            portable_hash_bucket(F.col(id_col))
            < F.floor(F.col("weight") * 10_000)
        )
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_toks").alias("sampled_tokens"),
        )
    )
    return (
        weighted.join(kept, source_col, "left")
        .select(
            source_col,
            "n_docs",
            "source_tokens",
            F.round("weight", 6).alias("weight"),
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.coalesce("sampled_tokens", F.lit(0)).alias("sampled_tokens"),
        )
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    chunk_words: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-split decontamination: flag every training document that
    shares at least one exact ``chunk_words``-word chunk with the
    evaluation set — the standard eval-leakage scrub run before
    training. Returns the training set with a ``contaminated`` flag
    (callers filter; keeping the flag makes the audit joinable).

    Chunking matches :func:`dedup.chunk_dedup_counts` (consecutive
    fixed chunks, pure array expressions). Scale design: the eval
    side's distinct chunk hashes are orders of magnitude smaller than
    the corpus — broadcast them into a left-semi probe, so the corpus
    is scanned once with NO corpus-side shuffle. If the eval set ever
    outgrows broadcast size, the same plan falls back to a hash
    equi-join on the chunk hash (uniform content key, skew-free)."""
    if chunk_words < 1:
        # size/0.0 is Infinity — the flags would be silently garbage
        raise ValueError(f"chunk_words must be >= 1, got {chunk_words}")

    def chunk_hashes(d: DataFrame):
        words = F.split(F.col(text_col), " ")
        n_chunks = F.ceil(F.size(words) / F.lit(float(chunk_words))).cast("int")
        chunks = F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(words, i * chunk_words + 1, chunk_words)
            ),
        )
        return d.select(
            F.col(id_col), F.explode(chunks).alias("chunk")
        ).select(id_col, F.sha2(F.col("chunk"), 256).alias("chunk_hash"))

    test_hashes = chunk_hashes(test).select("chunk_hash").distinct()
    contaminated_ids = (
        chunk_hashes(train)
        .join(F.broadcast(test_hashes), "chunk_hash", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return train.join(contaminated_ids, id_col, "left").withColumn(
        "contaminated", F.coalesce("contaminated", F.lit(False))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: a row survives when its
    :func:`portable_hash_bucket` falls under its stratum's fraction.

    Unlike ``DataFrame.sampleBy`` (seeded RNG over partition iteration
    order — irreproducible across engines, partitionings, and reruns),
    the keep decision here is a pure function of the row's id, so the
    sample is stable as the corpus is repartitioned or re-run, and an
    external engine can replay it exactly (oracle-checkable).

    Scale design: row-local predicate — no shuffle, no RNG state; the
    fraction map is a metadata-sized when-chain, never a join."""
    frac = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, float(f)).otherwise(frac)
    return df.filter(
        portable_hash_bucket(F.col(id_col)) < F.floor(frac * 10_000)
    )


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic EXACTLY-k-per-group sampling [EXT]: rank each
    group's rows by the portable hash of their id (a reproducible
    pseudo-random order — stable across engines, partitionings, and
    reruns, unlike RNG-seeded sampling) and keep the k smallest;
    groups smaller than k survive whole. The fixed-quota complement of
    :func:`stratified_sample`'s fraction-based gate — the shape used
    for per-source eval-set carving and balanced inspection samples.

    Scale design: ONE shuffle on the group key for the window rank
    (ties broken by id — total order, so the sample is unique), no
    driver-side state, no RNG."""
    if k <= 0:
        raise ValueError("k must be positive")
    w = Window.partitionBy(group_col).orderBy(
        portable_hash_bucket(F.col(id_col), 1_000_000_000).asc(),
        F.col(id_col).asc(),
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def contamination_scores(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Soft contamination scoring — the graded counterpart of
    :func:`decontaminate`'s exact-chunk drop: for every training
    document, the fraction of its DISTINCT word 3-gram shingles that
    appear anywhere in the evaluation split (``n_shingles``,
    ``n_hits``, ``score``). Pipelines drop above a threshold (e.g.
    score > 0.8 ≈ near-verbatim leak) instead of only on exact chunk
    identity — catching paraphrase-adjacent partial overlap.

    Scale shape mirrors decontaminate: the eval split's distinct
    shingle set is broadcast (eval sets are small by construction)
    into a left-semi probe; the corpus is scanned once, and the only
    corpus-keyed shuffle is the final per-doc count aggregate (partial
    map-side combined). If the eval set outgrows broadcast, the same
    plan degrades to a skew-free hash join on the shingle.
    """
    from .textstats import shingles

    ev = (
        test.select(
            F.explode(F.array_distinct(shingles(F.col(text_col)))).alias("sh")
        )
        .distinct()
    )
    corp = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col)))).alias("sh"),
    )
    hits = (
        corp.join(F.broadcast(ev), "sh", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    totals = train.select(
        F.col(id_col),
        F.size(F.array_distinct(shingles(F.col(text_col)))).alias("n_shingles"),
    )
    return (
        totals.join(hits, id_col, "left")
        .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)))
        .select(
            id_col,
            "n_shingles",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_shingles"), 6).alias("score"),
        )
    )


def shard_shuffle(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    seed: str = "s1",
) -> DataFrame:
    """Deterministic global corpus shuffle into ``n_shards`` training
    shards — the final step of corpus assembly before writing training
    data (documents must reach the trainer in pseudo-random order,
    decorrelated from source/crawl locality, and every rerun must
    produce the identical permutation).

    Each document's shard and its position inside the shard derive
    from two independent :func:`portable_hash_bucket` draws over
    ``(id, seed)`` — a reproducible, engine-portable permutation:
    re-running (or re-deriving in another engine) yields byte-identical
    shard files. Ties on the order hash break by id, so the result is a
    total order.

    Scale design: ONE shuffle, keyed on the shard id; each shard sorts
    independently inside its partition (window partitioned by shard —
    never a global sort). Choose ``n_shards`` so a shard fits an
    executor (at 100 TB that's thousands of shards); the downstream
    writer maps one shard to one output file via
    ``repartition(n_shards, shard).sortWithinPartitions(...)``.
    """
    sid = F.col(id_col).cast("string")
    shard = portable_hash_bucket(
        F.concat(sid, F.lit(f":{seed}:shard")), n_shards
    )
    ord_key = portable_hash_bucket(
        F.concat(sid, F.lit(f":{seed}:ord")), 1_000_000_000
    )
    w = Window.partitionBy("shard").orderBy("ord_key", id_col)
    return (
        df.withColumn("shard", shard)
        .withColumn("ord_key", ord_key)
        .withColumn("pos", F.row_number().over(w))
        .drop("ord_key")
    )


def quality_top_fraction(
    df: DataFrame,
    pct: int = 70,
    by_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Percentile-style quality gate: score every document by
    word-distribution entropy (:func:`textstats.word_entropy` — the
    repetition/degeneracy signal) and keep the top ``pct`` percent of
    documents *within each source* (rank by entropy descending, id
    tiebreak; a document survives when ``rank*100 <= pct*n`` — integer
    arithmetic, so the cut is engine-exact with no float-threshold
    wobble). Per-source ranking keeps a high-quality niche source from
    being drowned by a large low-quality one — the thresholding step
    between scoring and mixture assembly.

    Scale design: the entropy subplan shuffles on content keys
    ((doc, word) then doc); the ranking window partitions by source —
    never a global sort. Documents with no tokens score no entropy row
    and are dropped (they'd fail any quality gate anyway)."""
    from .textstats import word_entropy

    scored = word_entropy(df, text_col=text_col, id_col=id_col).join(
        df.select(id_col, by_col), id_col
    )
    w = Window.partitionBy(by_col)
    ranked = scored.withColumn(
        "quality_rank",
        F.row_number().over(w.orderBy(F.col("entropy").desc(), id_col)),
    ).withColumn("n_in_source", F.count(F.lit(1)).over(w))
    return (
        ranked.filter(F.col("quality_rank") * 100 <= pct * F.col("n_in_source"))
        .drop("n_in_source")
        .select(by_col, id_col, "entropy", "n_tokens", "quality_rank")
    )


def robust_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_mads: float = 3.0,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Median/MAD outlier screen [EXT]: flag rows whose value deviates
    from the per-group MEDIAN by more than ``n_mads`` median absolute
    deviations — the robust z-score a data-quality gate needs, because
    mean/stddev are themselves dragged by the outliers they're
    supposed to catch (one corrupt 1e12 reading inflates σ enough to
    hide every real anomaly).

    Distributed shape: two grouped percentile aggregations (the
    median, then the median of absolute deviations) — each ONE
    group-keyed shuffle — joined back on the group key with NO forced
    broadcast: the per-group stats side is one row per group, so AQE
    broadcasts it when the group count is dimension-sized and falls
    back to a shuffle join when group_cols is near-unique (forcing the
    hint would be the q163-class OOM at scale). Never a global sort,
    never a window over the whole group.

    ``exact=True`` uses Spark's exact ``percentile`` — a HOLISTIC
    aggregate whose partial state buffers every value in the group, so
    it is only safe when single groups fit in executor memory (the
    oracle-parity path, and fine for bounded per-group data).
    ``exact=False`` switches to ``approx_percentile`` (bounded
    KLL-sketch state at any group size, error ≤ 1/accuracy of rank) —
    the 100 TB default when groups can be corpus-sized; MAD thresholds
    tolerate far more than the sketch's rank error.

    Adds ``is_outlier`` (boolean) plus the group's ``med`` and ``mad``
    columns. MAD is the raw median-|dev| (no 1.4826 normal-consistency
    factor); fold it into ``n_mads`` if you want σ-equivalent units.
    Groups with MAD = 0 (over half the values identical) flag any
    deviation from the median, matching the strict rule."""
    pct = (
        "percentile({}, 0.5)"
        if exact
        else f"approx_percentile({{}}, 0.5, {accuracy})"
    )
    med = df.groupBy(*group_cols).agg(
        F.expr(pct.format(value_col)).alias("med")
    )
    devs = df.join(med, group_cols)
    mad = devs.groupBy(*group_cols).agg(
        F.expr(pct.format(f"abs({value_col} - med)")).alias("mad")
    )
    scored = devs.join(mad, group_cols)
    dev = F.abs(F.col(value_col) - F.col("med"))
    return scored.withColumn(
        "is_outlier",
        F.when(F.col("mad") > 0, dev > n_mads * F.col("mad"))
        .otherwise(dev > 0),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling without replacement [EXT], Efraimidis–Spirakis
    A-ES (public 2006 formulation): each row draws a uniform
    ``u ∈ (0, 1]`` and the ``k`` rows with the largest
    ``key = u^(1/w)`` form an exact weighted sample — the
    size-proportional document picker a curation pipeline uses for
    inspection sets and weighted eval slices.

    Determinism: ``u`` derives from :func:`portable_hash_bucket` of
    the id over 1e9 buckets — reproducible across runs AND engines
    (sliced sha256), never ``rand()``; the top-k cut tiebreaks by id.
    ``sample_key`` rounds to 12 dp (pure double math on exact
    integer inputs).

    Scale: key computation is row-local; the only ordered step is the
    top-k itself, which Spark plans as TakeOrderedAndProject — a
    per-partition heap + driver merge of k rows, never a global sort.
    Rows with non-positive weight are excluded (their key would be
    ill-defined).
    """
    # 60-bit slice, NOT the shared 32-bit portable_hash_bucket: 2^32
    # mod 1e9 leaves the low ~295M buckets 5 preimages vs 4 (a 25%
    # density step that skews inclusion probabilities); 2^60 mod 1e9
    # has relative bias ~1e-9. 15 hex chars keep the value < 2^63.
    h60 = F.conv(
        F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 15),
        16, 10,
    ).cast("long")
    u = (h60 % 1_000_000_000 + 1) / F.lit(1_000_000_000.0)
    key = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 12
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def group_consistent_split(
    df: DataFrame,
    group_col: str,
    splits: list[tuple[str, float]] | None = None,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Leakage-safe train/val/test assignment [EXT]: every row of a
    GROUP (user, source domain, document family) lands in the SAME
    split, because the split is a pure function of the portable hash
    of the group key — never row-level randomness. Row-level splits
    leak: near-identical documents from one source straddling
    train/test inflate eval scores (the contamination q95 hunts,
    prevented structurally here). Adds a ``split`` column.

    Row-local predicate (zero shuffles, no RNG, reproducible across
    engines, partitionings, and reruns); fractions are enforced in
    hash-bucket measure over GROUPS, so realized ROW fractions track
    them only as closely as group sizes are balanced — that skew is
    the price of the leakage guarantee and is reported by the q215
    audit."""
    splits = splits or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    if abs(sum(f for _, f in splits) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1: {splits}")
    bucket = portable_hash_bucket(F.col(group_col), n_buckets)
    # when-chain in declaration order: earlier splits own the lower
    # bucket ranges; the LAST split absorbs integer-rounding remainder.
    # Boundaries ROUND the float product — int() truncation misplaces
    # a whole bucket whenever frac*n_buckets lands an ulp below the
    # exact integer (0.57*10000 = 5699.999…, review-confirmed)
    bounds = []
    acc = 0.0
    for _, frac in splits[:-1]:
        acc += frac
        bounds.append(round(acc * n_buckets))
    expr = F.lit(None).cast("string")
    lo = 0
    for (name, _), hi in zip(splits[:-1], bounds):
        expr = F.when((bucket >= lo) & (bucket < hi), name).otherwise(expr)
        lo = hi
    expr = F.coalesce(expr, F.lit(splits[-1][0]))
    return df.withColumn("split", expr)


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Per-group winsorization [EXT]: clip ``value_col`` to its group's
    exact [``lower``, ``upper``] quantiles — the outlier containment
    step run before means/trends so one fat-finger row can't drag a
    segment's statistics (robust_outliers DETECTS; this REPAIRS).
    Adds ``<value>_w`` (clipped; NULL stays NULL) plus the group bounds
    ``<value>__lo``/``<value>__hi``; NULL group keys are preserved
    (null-safe bound join).

    Two passes by construction: exact quantiles need the full group
    before any row can clip (pass 1 = ONE map-side-combined
    percentile aggregate per group; pass 2 joins the group-bound
    relation back onto the scan with NO broadcast hint — AQE
    broadcasts it when small and shuffle-joins at per-entity group
    cardinality, where a forced broadcast would OOM). ``approx=True`` (VERDICT r8 #6) swaps pass 1 for
    ``approx_percentile`` — the 100 TB shape: the KLL/GK-style sketch
    has a BOUNDED map-side state per partition (vs exact percentile's
    collect-the-group list), with rank error ≤ n/``approx_accuracy``
    per group; the clipped bound is always an actual group value.
    Exact stays the default because the clip boundaries are then
    auditable and engine-portable (the q217 oracle checks them)."""
    if not 0 <= lower < upper <= 1:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    lo, hi = f"{value_col}__lo", f"{value_col}__hi"  # composable names
    if approx:
        acc = F.lit(approx_accuracy)
        bounds = df.groupBy(*group_cols).agg(
            F.approx_percentile(F.col(value_col), F.lit(lower), acc)
            .cast("double").alias(lo),
            F.approx_percentile(F.col(value_col), F.lit(upper), acc)
            .cast("double").alias(hi),
        )
    else:
        bounds = df.groupBy(*group_cols).agg(
            F.percentile(F.col(value_col), F.lit(lower)).alias(lo),
            F.percentile(F.col(value_col), F.lit(upper)).alias(hi),
        )
    # NULL measurements stay NULL (Spark least/greatest SKIP nulls —
    # an unguarded clip would fabricate the p05 bound for missing
    # values); NULL group keys join null-safely so the transform is
    # row-preserving
    clipped = F.when(
        F.col(value_col).isNotNull(),
        F.least(
            F.greatest(F.col(value_col).cast("double"), F.col(lo)),
            F.col(hi),
        ),
    )
    # NO forced broadcast on the bounds relation (matches
    # robust_outliers): group cardinality is unbounded — per-entity
    # groups run to hundreds of millions, where an unconditional
    # F.broadcast is a driver/executor OOM. AQE picks BHJ when the
    # bounds relation is actually small and a shuffle join when it
    # isn't (VERDICT r9 #3).
    b = bounds.select(
        *[F.col(c).alias(f"__b_{c}") for c in group_cols], lo, hi
    )
    cond = None
    for c in group_cols:
        eq = df[c].eqNullSafe(F.col(f"__b_{c}"))
        cond = eq if cond is None else (cond & eq)
    return (
        df.join(b, cond)
        .drop(*[f"__b_{c}" for c in group_cols])
        .withColumn(f"{value_col}_w", clipped)
    )
