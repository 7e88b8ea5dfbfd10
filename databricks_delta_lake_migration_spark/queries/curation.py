"""Training-data curation query surface [EXT] (companions to
:mod:`.text`): sequence packing, mixture reweighting, and cross-split
decontamination over the ``documents`` fixture table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation
from .registry import load_table, query

# DuckDB twin of curation._whitespace_tokens
_SQL_TOKS = "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
# DuckDB twin of curation.portable_hash_bucket (sliced-sha256 family,
# same as q37's _SQL_SIMHASH_HS)
_SQL_HASH_BUCKET = (
    "CAST('0x' || substring(sha256(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
    " % 10000"
)


@query(
    "q93_sequence_packing",
    oracle=f"""
    WITH toks AS (
        SELECT source, doc_id, len({_SQL_TOKS}) AS n_toks FROM documents
    ), placed AS (
        SELECT source, n_toks,
               CAST(floor(COALESCE(SUM(n_toks) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / 256.0) AS BIGINT) AS seq_id
        FROM toks
    )
    SELECT source, seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS seq_tokens,
           ROUND(SUM(n_toks) / 256.0, 6) AS fill_ratio
    FROM placed GROUP BY source, seq_id
    """,
)
def q93_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing [EXT]: documents stream in id
    order within each source shard; the token stream is cut into
    256-token training sequences via an exclusive-prefix window sum —
    per-shard windows, never a global sort."""
    return curation.pack_sequences(
        load_table(spark, sf_dir, "documents"), budget_tokens=256
    )


@query(
    "q94_data_mixture",
    oracle=f"""
    WITH toks AS (
        SELECT source, doc_id, len({_SQL_TOKS}) AS n_toks FROM documents
    ), per_source AS (
        SELECT source, COUNT(*) AS n_docs, SUM(n_toks) AS source_tokens
        FROM toks GROUP BY source
    ), t AS (
        SELECT SUM(source_tokens) AS total_tokens, COUNT(*) AS n_sources
        FROM per_source
    ), weighted AS (
        SELECT source, n_docs, source_tokens,
               LEAST(1.0, (CAST(total_tokens AS DOUBLE) / n_sources)
                          / source_tokens) AS weight
        FROM per_source, t
    ), kept AS (
        SELECT k.source, COUNT(*) AS n_sampled, SUM(k.n_toks) AS sampled_tokens
        FROM toks k JOIN weighted w ON k.source = w.source
        WHERE {_SQL_HASH_BUCKET.replace("doc_id", "k.doc_id")}
              < CAST(floor(w.weight * 10000) AS BIGINT)
        GROUP BY k.source
    )
    SELECT w.source,
           CAST(w.n_docs AS BIGINT) AS n_docs,
           CAST(w.source_tokens AS BIGINT) AS source_tokens,
           ROUND(w.weight, 6) AS weight,
           CAST(COALESCE(k.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(COALESCE(k.sampled_tokens, 0) AS BIGINT) AS sampled_tokens
    FROM weighted w LEFT JOIN kept k ON w.source = k.source
    """,
)
def q94_data_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture reweighting [EXT]: per-source keep-probability toward a
    uniform token share, deterministic portable-hash sampling — the
    source-balancing step of corpus assembly."""
    return curation.mixture_sample(load_table(spark, sf_dir, "documents"))


@query(
    "q95_decontamination",
    oracle="""
    WITH train AS (
        SELECT doc_id, source, text FROM documents WHERE doc_id % 97 <> 0
    ), test AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
    ), tchunks AS (
        SELECT DISTINCT sha256(chunk) AS chunk_hash FROM (
            SELECT unnest(list_transform(
                range(0, CAST(ceil(len(string_split(text, ' ')) / 4.0) AS BIGINT)),
                i -> array_to_string(
                    list_slice(string_split(text, ' '), i*4 + 1, i*4 + 4), ' ')
            )) AS chunk FROM test)
    ), trchunks AS (
        SELECT doc_id, unnest(list_transform(
            range(0, CAST(ceil(len(string_split(text, ' ')) / 4.0) AS BIGINT)),
            i -> array_to_string(
                list_slice(string_split(text, ' '), i*4 + 1, i*4 + 4), ' ')
        )) AS chunk FROM train
    ), contaminated AS (
        SELECT DISTINCT doc_id FROM trchunks
        WHERE sha256(chunk) IN (SELECT chunk_hash FROM tchunks)
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clean
    FROM train t LEFT JOIN contaminated c ON t.doc_id = c.doc_id
    GROUP BY t.source
    """,
)
def q95_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-leakage scrub [EXT]: training docs sharing any exact 4-word
    chunk with the held-out split (doc_id % 97) are flagged; per-source
    contamination audit. Eval chunk hashes broadcast into a left-semi
    probe — one corpus scan, no corpus-side shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    test = docs.filter(F.col("doc_id") % 97 == 0)
    flagged = curation.decontaminate(train, test, chunk_words=4)
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum(F.when(F.col("contaminated"), 1).otherwise(0)).alias("n_contaminated"),
        F.sum(F.when(F.col("contaminated"), 0).otherwise(1)).alias("n_clean"),
    )


# DuckDB twin of the q91 bigram signal, over a CTE named ``corpus``
_SQL_CF_BIGRAMS = (
    f"CASE WHEN len({_SQL_TOKS}) >= 2 THEN "
    f"list_transform(range(1, len({_SQL_TOKS})), i -> {_SQL_TOKS}[i] || ' ' || {_SQL_TOKS}[i+1]) "
    "ELSE [] END"
)
_SQL_CHUNKS4 = (
    "list_transform(range(0, CAST(ceil(len(string_split(text, ' ')) / 4.0) AS BIGINT)), "
    "i -> array_to_string(list_slice(string_split(text, ' '), i*4 + 1, i*4 + 4), ' '))"
)


@query(
    "q98_corpus_pipeline",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, source, text FROM documents WHERE doc_id % 97 <> 0
    ), holdout AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
    ), sig AS (
        SELECT doc_id,
               len({_SQL_TOKS}) AS n_tokens,
               length(text) AS n_chars,
               length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS symbols,
               len(list_distinct({_SQL_TOKS})) AS n_distinct,
               {_SQL_CF_BIGRAMS} AS bg
        FROM corpus
    ), m AS (
        SELECT doc_id, n_tokens,
               symbols * 1.0 / greatest(n_chars, 1) AS symbol_ratio,
               (n_chars - n_tokens + 1) * 1.0 / greatest(n_tokens, 1) AS mean_word_len,
               n_distinct * 1.0 / greatest(n_tokens, 1) AS distinct_ratio,
               COALESCE(list_max(list_transform(list_distinct(bg),
                        b -> len(list_filter(bg, x -> x = b)))), 0) * 1.0
                   / greatest(len(bg), 1) AS top_bigram_frac
        FROM sig
    ), kept AS (
        SELECT c.doc_id, c.source, c.text
        FROM corpus c JOIN m ON c.doc_id = m.doc_id
        WHERE NOT (m.n_tokens < 30 OR m.n_tokens > 100000
                   OR m.symbol_ratio > 0.03
                   OR m.mean_word_len < 4.5 OR m.mean_word_len > 12.0
                   OR m.top_bigram_frac > 0.04
                   OR m.distinct_ratio < 0.55)
    ), winners AS (
        SELECT MIN(doc_id) AS doc_id FROM (
            SELECT doc_id,
                   sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM kept
        ) GROUP BY fp
    ), survivors AS (
        SELECT k.* FROM kept k JOIN winners w ON k.doc_id = w.doc_id
    ), hchunks AS (
        SELECT DISTINCT sha256(chunk) AS ch FROM (
            SELECT unnest({_SQL_CHUNKS4}) AS chunk FROM holdout)
    ), contaminated AS (
        SELECT DISTINCT doc_id FROM (
            SELECT doc_id, unnest({_SQL_CHUNKS4}) AS chunk FROM survivors)
        WHERE sha256(chunk) IN (SELECT ch FROM hchunks)
    ), final AS (
        SELECT s.* FROM survivors s
        WHERE s.doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT r.source,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(COUNT(k.doc_id) AS BIGINT) AS n_quality,
           CAST(COUNT(s.doc_id) AS BIGINT) AS n_dedup,
           CAST(COUNT(f.doc_id) AS BIGINT) AS n_final,
           CAST(COALESCE(SUM(CASE WHEN f.doc_id IS NOT NULL
                THEN len(string_split(trim(regexp_replace(lower(r.text), '\\s+', ' ', 'g')), ' '))
                ELSE 0 END), 0) AS BIGINT) AS tokens_final
    FROM corpus r
    LEFT JOIN kept k ON r.doc_id = k.doc_id
    LEFT JOIN survivors s ON r.doc_id = s.doc_id
    LEFT JOIN final f ON r.doc_id = f.doc_id
    GROUP BY r.source
    """,
)
def q98_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus-cleanup pipeline [EXT] — the LLM-tier capstone,
    chaining the quality gate (q91 thresholds), exact dedup (min-id per
    normalized-text hash, q34 family), and eval-split decontamination
    (q95) into one per-source funnel report: raw → quality-passed →
    deduped → decontaminated counts plus final token volume.

    Every stage is the already-audited scale shape: row-local quality
    signals, one content-hash shuffle for dedup, broadcast left-semi
    probe for decontamination; per-source funnel counts are left-semi
    flags aggregated in one pass."""
    from ..operators import textstats

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    holdout = docs.filter(F.col("doc_id") % 97 == 0)

    quality = textstats.corpus_filter(
        corpus, min_tokens=30, max_symbol_ratio=0.03,
        min_mean_word_len=4.5, max_top_bigram_frac=0.04,
        min_distinct_ratio=0.55,
    )
    kept = corpus.join(
        quality.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )
    from ..functions.hashing import norm_text_hash

    winners = (
        kept.select("doc_id", norm_text_hash(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = kept.join(winners, "doc_id", "left_semi")
    flagged = curation.decontaminate(survivors, holdout, chunk_words=4)
    n_toks = F.size(curation._whitespace_tokens("text"))
    staged = (
        corpus.select("doc_id", "source", "text")
        .join(kept.select("doc_id", F.lit(1).alias("q")), "doc_id", "left")
        .join(survivors.select("doc_id", F.lit(1).alias("d")), "doc_id", "left")
        .join(
            flagged.filter(~F.col("contaminated"))
            .select("doc_id", F.lit(1).alias("f")),
            "doc_id", "left",
        )
    )
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count("q").alias("n_quality"),
        F.count("d").alias("n_dedup"),
        F.count("f").alias("n_final"),
        F.sum(F.when(F.col("f").isNotNull(), n_toks).otherwise(0)).alias(
            "tokens_final"
        ),
    )


@query(
    "q100_stratified_sample",
    oracle="""
    WITH keyed AS (
        SELECT o_orderpriority, o_totalprice,
               CAST('0x' || substring(sha256(CAST(o_orderkey AS VARCHAR)), 1, 8)
                    AS BIGINT) % 10000 AS bucket,
               CASE o_orderpriority
                    WHEN '1-URGENT' THEN 0.5
                    WHEN '2-HIGH' THEN 0.25
                    WHEN '3-MEDIUM' THEN 0.1
                    ELSE 0.02 END AS frac
        FROM orders
    )
    SELECT o_orderpriority AS stratum,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN bucket < CAST(floor(frac * 10000) AS BIGINT)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(ROUND(SUM(CASE WHEN bucket < CAST(floor(frac * 10000) AS BIGINT)
                THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE 0 END), 4)
                AS DOUBLE) AS sampled_price
    FROM keyed GROUP BY o_orderpriority
    """,
)
def q100_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling [EXT]: per-priority keep
    fractions enforced by the portable sliced-sha256 hash of the order
    key — reproducible across engines/partitionings (vs sampleBy's
    RNG). Row-local predicate, no shuffle; audit = full counts vs
    sampled counts per stratum in one pass."""
    o = load_table(spark, sf_dir, "orders")
    fractions = {"1-URGENT": 0.5, "2-HIGH": 0.25, "3-MEDIUM": 0.1}
    sampled = curation.stratified_sample(
        o, "o_orderpriority", fractions, id_col="o_orderkey",
        default_fraction=0.02,
    ).select(
        F.col("o_orderpriority"), F.lit(1).alias("s"), F.col("o_totalprice")
    )
    full = o.select(
        F.col("o_orderpriority"), F.lit(None).cast("int").alias("s"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    return (
        full.unionByName(sampled)
        .groupBy(F.col("o_orderpriority").alias("stratum"))
        .agg(
            F.sum(F.when(F.col("s").isNull(), 1).otherwise(0)).alias("n_total"),
            F.sum(F.when(F.col("s").isNotNull(), 1).otherwise(0)).alias("n_sampled"),
            F.round(
                F.sum(
                    F.when(
                        F.col("s").isNotNull(),
                        F.col("o_totalprice").cast("decimal(18,4)"),
                    ).otherwise(F.lit(0).cast("decimal(18,4)"))
                ),
                4,
            )
            .cast("double")
            .alias("sampled_price"),
        )
    )


# DuckDB twin of textstats.shingles(k=3) — same as queries/text.py
_SQL_SHINGLES_C = (
    f"CASE WHEN len({_SQL_TOKS}) >= 3 THEN "
    f"list_transform(range(1, len({_SQL_TOKS}) - 1), "
    f"i -> {_SQL_TOKS}[i] || ' ' || {_SQL_TOKS}[i+1] || ' ' || {_SQL_TOKS}[i+2]) "
    f"ELSE [array_to_string({_SQL_TOKS}, ' ')] END"
)


@query(
    "q117_contamination_scores",
    oracle=f"""
    WITH ev AS (
        SELECT DISTINCT unnest(list_distinct({_SQL_SHINGLES_C})) AS sh
        FROM documents WHERE doc_id % 10 = 0
    ), corp AS (
        SELECT doc_id, unnest(list_distinct({_SQL_SHINGLES_C})) AS sh
        FROM documents WHERE doc_id % 10 <> 0
    ), tot AS (
        SELECT doc_id, len(list_distinct({_SQL_SHINGLES_C})) AS n_shingles
        FROM documents WHERE doc_id % 10 <> 0
    ), h AS (
        SELECT doc_id, COUNT(*) AS n_hits FROM corp JOIN ev USING (sh)
        GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_shingles,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           ROUND(COALESCE(h.n_hits, 0) * 1.0 / t.n_shingles, 6) AS score
    FROM tot t LEFT JOIN h ON t.doc_id = h.doc_id
    """,
)
def q117_contamination_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft contamination scoring (``curation.contamination_scores``):
    per-training-doc fraction of distinct 3-gram shingles that appear
    anywhere in the eval split (doc_id % 10 = 0 plays the eval set) —
    the graded companion to q95's exact-chunk decontamination, for
    thresholded drops of paraphrase-adjacent partial leakage. Eval
    shingles broadcast into a left-semi probe; one corpus scan."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.contamination_scores(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
    )


@query(
    "q121_shard_shuffle",
    oracle="""
    WITH h AS (
        SELECT doc_id, source,
               CAST('0x' || substring(sha256(CAST(doc_id AS VARCHAR)
                    || ':s1:shard'), 1, 8) AS BIGINT) % 8 AS shard,
               CAST('0x' || substring(sha256(CAST(doc_id AS VARCHAR)
                    || ':s1:ord'), 1, 8) AS BIGINT) % 1000000000 AS ord_key
        FROM documents
    )
    SELECT doc_id, source, shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY shard ORDER BY ord_key, doc_id
           ) AS INT) AS pos
    FROM h
    """,
)
def q121_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle (``curation.shard_shuffle``): every
    document is assigned a training shard and a position inside it from
    two independent portable-hash draws — a reproducible pseudo-random
    permutation of the corpus (the write-order step of corpus
    assembly). The oracle recomputes the identical permutation from the
    same sliced-sha256 family in DuckDB: cross-engine byte-equality of
    the full shard layout. One shuffle, keyed on the shard id."""
    return curation.shard_shuffle(
        load_table(spark, sf_dir, "documents"), n_shards=8
    ).select("doc_id", "source", "shard", "pos")


@query(
    "q122_quality_top_fraction",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents
    ), wc AS (
        SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY doc_id, w
    ), totals AS (
        SELECT doc_id, SUM(c) AS n FROM wc GROUP BY doc_id
    ), ent AS (
        SELECT wc.doc_id,
               ROUND(CAST(SUM(CAST(-(c * 1.0 / n) * log2(c * 1.0 / n)
                    AS DECIMAL(28,12))) AS DOUBLE), 6) AS entropy,
               CAST(MAX(n) AS BIGINT) AS n_tokens
        FROM wc JOIN totals ON wc.doc_id = totals.doc_id
        GROUP BY wc.doc_id
    ), ranked AS (
        SELECT d.source, e.doc_id, e.entropy, e.n_tokens,
               ROW_NUMBER() OVER (
                   PARTITION BY d.source ORDER BY e.entropy DESC, e.doc_id
               ) AS quality_rank,
               COUNT(*) OVER (PARTITION BY d.source) AS n_in_source
        FROM ent e JOIN documents d ON e.doc_id = d.doc_id
    )
    SELECT source, doc_id, entropy, n_tokens,
           CAST(quality_rank AS INT) AS quality_rank
    FROM ranked WHERE quality_rank * 100 <= 70 * n_in_source
    """,
)
def q122_quality_top_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-style quality gate (``curation.quality_top_fraction``):
    keep the top 70% of documents per source by word-entropy — the
    integer-exact rank cut (``rank*100 <= pct*n``) makes the survivor
    set engine-identical, with the decimal-snapped entropy from q77 as
    the score. Per-source window, never a global sort."""
    return curation.quality_top_fraction(
        load_table(spark, sf_dir, "documents"), pct=70
    )


@query(
    "q166_robust_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, median(value) AS med FROM events GROUP BY 1
    ),
    mad AS (
        SELECT e.event_type, median(abs(e.value - m.med)) AS mad
        FROM events e JOIN med m USING (event_type) GROUP BY 1
    )
    SELECT e.event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN (CASE WHEN m2.mad > 0
                         THEN abs(e.value - m.med) > 3 * m2.mad
                         ELSE abs(e.value - m.med) > 0 END)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(ANY_VALUE(m.med), 4) AS med,
           ROUND(ANY_VALUE(m2.mad), 4) AS mad
    FROM events e
    JOIN med m USING (event_type) JOIN mad m2 USING (event_type)
    GROUP BY 1
    """,
)
def q166_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier screen [EXT]
    (``curation.robust_outliers`` — the quality gate that survives the
    outliers it hunts, unlike mean/σ z-scores): per event_type, flag
    values more than 3 MADs from the median. Two exact grouped
    percentile shuffles + stats joined back (AQE-broadcast when the
    group count is small). Returns per-group row/outlier counts and
    the 4dp-snapped median/MAD."""
    e = load_table(spark, sf_dir, "events")
    flagged = curation.robust_outliers(e, ["event_type"], "value", n_mads=3.0)
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("is_outlier"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_outliers"),
        F.round(F.first("med"), 4).alias("med"),
        F.round(F.first("mad"), 4).alias("mad"),
    )


@query(
    "q190_weighted_sample",
    oracle="""
    SELECT doc_id, n_chars, sample_key FROM (
        SELECT doc_id, n_chars,
               ROUND(power(
                   (CAST('0x' || substring(sha256(CAST(doc_id AS VARCHAR)),
                        1, 15) AS BIGINT) % 1000000000 + 1) / 1000000000.0,
                   1.0 / n_chars), 12) AS sample_key
        FROM documents WHERE n_chars > 0
    )
    ORDER BY sample_key DESC, doc_id ASC LIMIT 50
    """,
)
def q190_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement [EXT] (Efraimidis–Spirakis
    A-ES) — ``operators.curation.weighted_sample``: 50 documents drawn
    proportionally to length. The uniform draw is the portable
    sliced-sha256 hash (reproducible across engines and runs — the
    oracle recomputes the identical keys), and the top-k cut plans as
    TakeOrderedAndProject: per-partition heaps, never a global sort."""
    from ..operators.curation import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, "n_chars", k=50).select(
        "doc_id", "n_chars", "sample_key"
    )


@query(
    "q215_group_split_audit",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, source,
               CASE WHEN CAST('0x' || substring(sha256(source), 1, 8)
                         AS BIGINT) % 10000 < 8000 THEN 'train'
                    WHEN CAST('0x' || substring(sha256(source), 1, 8)
                         AS BIGINT) % 10000 < 9000 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_groups
    FROM assigned GROUP BY 1
    """,
)
def q215_group_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split audit [EXT] —
    ``curation.group_consistent_split`` keyed on the SOURCE domain:
    all documents of a source land in one split (a pure function of
    the portable group-key hash — no RNG, no row-level leakage), so
    near-duplicates within a domain can never straddle train/test.
    The audit reports per-split doc and group counts; row-fraction
    drift from the nominal 80/10/10 is the visible price of the
    group guarantee."""
    from pyspark.sql import functions as F

    from ..operators.curation import group_consistent_split

    docs = load_table(spark, sf_dir, "documents")
    out = group_consistent_split(docs, "source")
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_groups"),
    )


@query(
    "q217_winsorize_audit",
    oracle="""
    WITH b AS (
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.05) AS lo,
               quantile_cont(o_totalprice, 0.95) AS hi
        FROM orders GROUP BY 1
    )
    SELECT o.o_orderpriority,
           COUNT(*) AS n_rows,
           ROUND(lo, 4) AS lo, ROUND(hi, 4) AS hi,
           COUNT(CASE WHEN o_totalprice < lo THEN 1 END) AS n_clipped_low,
           COUNT(CASE WHEN o_totalprice > hi THEN 1 END) AS n_clipped_high,
           CAST(ROUND(SUM(CAST(
                LEAST(GREATEST(CAST(o_totalprice AS DOUBLE), lo), hi)
                AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_w
    FROM orders o JOIN b ON o.o_orderpriority = b.o_orderpriority
    GROUP BY 1, lo, hi
    """,
)
def q217_winsorize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority winsorization audit [EXT] —
    ``curation.winsorize`` at exact [p05, p95]: clip bounds from ONE
    map-side-combined percentile aggregate (interpolation parity with
    quantile_cont, the q191 precedent), broadcast back onto the scan;
    clipped values snap to decimal before the sum so the audit is
    hash-stable. Exact quantiles force two passes by construction —
    approx_percentile is the documented single-pass 100 TB variant."""
    from pyspark.sql import functions as F

    from ..operators.curation import winsorize

    o = load_table(spark, sf_dir, "orders")
    w = winsorize(o, ["o_orderpriority"], "o_totalprice")
    return w.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("o_totalprice__lo"), 4).alias("lo"),
        F.round(F.min("o_totalprice__hi"), 4).alias("hi"),
        F.count(
            F.when(F.col("o_totalprice") < F.col("o_totalprice__lo"), 1)
        ).alias("n_clipped_low"),
        F.count(
            F.when(F.col("o_totalprice") > F.col("o_totalprice__hi"), 1)
        ).alias("n_clipped_high"),
        F.round(
            F.sum(F.col("o_totalprice_w").cast("decimal(18,4)")), 4
        ).cast("double").alias("sum_w"),
    )
