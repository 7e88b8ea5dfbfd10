"""Text-analysis / dedup query surface [EXT] over the ``documents``
fixture table (SURVEY §2.14). Oracles reproduce the exact hashing /
tokenization so even MinHash signatures hash-match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, multimodal, textstats
from .registry import load_table, query

# DuckDB twin of textstats.tokens()
_SQL_TOKS = "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"


@query(
    "q30_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks, text FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subwords_est,
           ROUND(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS distinct_ratio
    FROM t
    """,
)
def q30_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish subword estimate)."""
    return textstats.token_stats(load_table(spark, sf_dir, "documents"))


@query(
    "q31_language_profile",
    oracle="""
    WITH scored AS (
        SELECT lang,
               len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is)\\b')) AS s_en,
               len(regexp_extract_all(lower(text), '\\b(der|und|die|das|ist)\\b')) AS s_de,
               len(regexp_extract_all(lower(text), '\\b(el|la|los|de|que)\\b')) AS s_es,
               len(regexp_extract_all(lower(text), '\\b(le|la|les|et|est)\\b')) AS s_fr
        FROM documents
    ), guessed AS (
        SELECT lang,
               CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
                    WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
                    WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
                    WHEN s_fr > 0 THEN 'fr'
                    ELSE 'und' END AS guessed_lang
        FROM scored
    )
    SELECT lang, guessed_lang, COUNT(*) AS n_docs
    FROM guessed GROUP BY lang, guessed_lang
    """,
)
def q31_language_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (marker-stopword argmax) × labeled lang —
    confusion-matrix counts."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", textstats.guess_language(F.col("text")).alias("guessed_lang"))
        .groupBy("lang", "guessed_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "q32_quality_scores",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, {_SQL_TOKS} AS toks,
               length(text) AS n_chars,
               len({_SQL_TOKS}) AS n_tokens,
               length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits
        FROM documents
    ), r AS (
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               ROUND(punct * 1.0 / n_chars, 6) AS punct_ratio,
               ROUND(digits * 1.0 / n_chars, 6) AS digit_ratio,
               ROUND(len(list_filter(toks, w -> regexp_full_match(w, '(the|a|an|and|or|of|to|in|is|it)'))) * 1.0 / n_tokens, 6) AS stopword_ratio,
               ROUND((n_chars - n_tokens + 1) * 1.0 / n_tokens, 6) AS mean_word_len
        FROM t
    )
    SELECT doc_id, n_chars, n_tokens, punct_ratio, digit_ratio, stopword_ratio, mean_word_len,
           ROUND(1.0 - least(punct_ratio * 2, 0.5) - least(digit_ratio * 2, 0.3) + least(stopword_ratio, 0.2), 6) AS quality_score
    FROM r
    """,
)
def q32_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: punctuation/digit/stopword ratios →
    composite score."""
    return textstats.quality_score(load_table(spark, sf_dir, "documents"))


@query(
    "q33_dedup_stats",
    oracle="""
    WITH fp AS (
        SELECT sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents
    )
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT fp) AS n_unique,
           COUNT(*) - COUNT(DISTINCT fp) AS n_dup_rows
    FROM fp
    """,
)
def q33_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup summary over normalized-text fingerprints."""
    return dedup.dedup_stats(load_table(spark, sf_dir, "documents"))


@query(
    "q34_exact_dedup",
    oracle="""
    SELECT sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS doc_fp,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def q34_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy keeping the lowest doc_id per
    fingerprint (deterministic latest/first-wins)."""
    return dedup.exact_dedup(load_table(spark, sf_dir, "documents"))


@query(
    "q35_jaccard_pairs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, unnest(list_distinct({_SQL_TOKS})) AS tok
        FROM documents
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM toks a JOIN toks b ON a.tok = b.tok AND a.source = b.source
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, n_shared,
           ROUND(n_shared * 1.0 / (sa.sz + sb.sz - n_shared), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE ROUND(n_shared * 1.0 / (sa.sz + sb.sz - n_shared), 6) >= 0.5
    """,
)
def q35_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-set Jaccard near-dup pairs (token-join formulation, blocked
    by source)."""
    return dedup.jaccard_pairs(
        load_table(spark, sf_dir, "documents"), block_col="source", threshold=0.5
    )


# DuckDB twin of textstats.shingles(k=3): word 3-grams, whole-text
# fallback for docs under 3 tokens.
_SQL_SHINGLES = (
    f"CASE WHEN len({_SQL_TOKS}) >= 3 THEN "
    f"list_transform(range(1, len({_SQL_TOKS}) - 1), "
    f"i -> {_SQL_TOKS}[i] || ' ' || {_SQL_TOKS}[i+1] || ' ' || {_SQL_TOKS}[i+2]) "
    f"ELSE [array_to_string({_SQL_TOKS}, ' ')] END"
)


def _sql_minhash(seed: int) -> str:
    return (
        f"list_min(list_transform(list_distinct({_SQL_SHINGLES}),"
        f" w -> substring(sha256(w), {1 + 8 * seed}, 8)))"
    )


@query(
    "q36_minhash_lsh_pairs",
    oracle=f"""
    WITH sigs AS (
        SELECT doc_id,
               {_sql_minhash(0)} AS mh0, {_sql_minhash(1)} AS mh1,
               {_sql_minhash(2)} AS mh2, {_sql_minhash(3)} AS mh3,
               {_sql_minhash(4)} AS mh4, {_sql_minhash(5)} AS mh5,
               {_sql_minhash(6)} AS mh6, {_sql_minhash(7)} AS mh7
        FROM documents
    ), banded AS (
        SELECT doc_id,
               mh0 || '#' || mh1 AS band0, mh2 || '#' || mh3 AS band1,
               mh4 || '#' || mh5 AS band2, mh6 || '#' || mh7 AS band3
        FROM sigs
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM banded a JOIN banded b ON a.band0 = b.band0 WHERE a.doc_id < b.doc_id
        UNION
        SELECT a.doc_id, b.doc_id FROM banded a JOIN banded b ON a.band1 = b.band1 WHERE a.doc_id < b.doc_id
        UNION
        SELECT a.doc_id, b.doc_id FROM banded a JOIN banded b ON a.band2 = b.band2 WHERE a.doc_id < b.doc_id
        UNION
        SELECT a.doc_id, b.doc_id FROM banded a JOIN banded b ON a.band3 = b.band3 WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b FROM pairs
    """,
)
def q36_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8)+LSH(4 bands × 2) candidate pairs — shingle→minhash→
    band→bucket-join, the near-dup scale path. Portable sha2-based
    hash family so the oracle reproduces signatures exactly."""
    return dedup.lsh_candidate_pairs(
        load_table(spark, sf_dir, "documents"), num_hashes=8, band_size=2
    )


@query(
    "q114_incremental_lsh",
    oracle=f"""
    WITH sigs AS (
        SELECT doc_id,
               {_sql_minhash(0)} AS mh0, {_sql_minhash(1)} AS mh1,
               {_sql_minhash(2)} AS mh2, {_sql_minhash(3)} AS mh3,
               {_sql_minhash(4)} AS mh4, {_sql_minhash(5)} AS mh5,
               {_sql_minhash(6)} AS mh6, {_sql_minhash(7)} AS mh7
        FROM documents
    ), banded AS (
        SELECT doc_id,
               mh0 || '#' || mh1 AS band0, mh2 || '#' || mh3 AS band1,
               mh4 || '#' || mh5 AS band2, mh6 || '#' || mh7 AS band3
        FROM sigs
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM banded a JOIN banded b ON a.band0 = b.band0 WHERE a.doc_id < b.doc_id
        UNION
        SELECT a.doc_id, b.doc_id FROM banded a JOIN banded b ON a.band1 = b.band1 WHERE a.doc_id < b.doc_id
        UNION
        SELECT a.doc_id, b.doc_id FROM banded a JOIN banded b ON a.band2 = b.band2 WHERE a.doc_id < b.doc_id
        UNION
        SELECT a.doc_id, b.doc_id FROM banded a JOIN banded b ON a.band3 = b.band3 WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b FROM pairs
    WHERE id_a % 3 = 0 OR id_b % 3 = 0
    """,
)
def q114_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup against a PERSISTED MinHash index
    (``dedup.minhash_band_buckets`` + ``incremental_lsh_pairs``) — the
    production corpus-dedup shape: the standing corpus (doc_id % 3 ≠ 0)
    is indexed ONCE, its band buckets materialized through a log table
    and read back; the arriving batch (doc_id % 3 = 0) re-hashes only
    itself and probes the index with one bucket equi-join. The oracle
    is the FROM-SCRATCH LSH over the whole corpus restricted to pairs
    touching the batch — deterministic signatures make the incremental
    path exactly equal, which is the invariant that lets an index
    accumulate for months without drifting from a full re-dedup."""
    import tempfile

    from ..tables import LogTable

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    bands = dedup.minhash_band_buckets(corpus, num_hashes=8, band_size=2)
    idx = LogTable.create(
        spark, tempfile.mkdtemp(prefix="lsh-index-") + "/t", bands.schema
    )
    idx.append(bands)
    return dedup.incremental_lsh_pairs(
        batch, idx.read(), num_hashes=8, band_size=2
    )


# Portable simhash oracle: token hash = first 8 hex chars of sha256 as a
# 32-bit int (same slicing as the minhash family); per-bit ±1 votes folded
# into the fingerprint. COALESCE(…, 0) matches Spark's empty-fold init of 0
# (zero votes → bit set, since 0 >= 0 on both sides).
_SQL_SIMHASH_HS = (
    f"list_transform(list_distinct({_SQL_TOKS}),"
    " w -> CAST('0x' || substring(sha256(w), 1, 8) AS BIGINT))"
)
_SQL_SIMHASH = " + ".join(
    "CASE WHEN COALESCE(list_sum(list_transform(hs,"
    f" h -> CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)), 0) >= 0"
    f" THEN {1 << b} ELSE 0 END"
    for b in range(32)
)


@query(
    "q37_simhash",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_SIMHASH_HS} AS hs FROM documents)
    SELECT doc_id, CAST({_SQL_SIMHASH} AS BIGINT) AS simhash FROM t
    """,
)
def q37_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32-bit) fingerprints — per-token bit votes folded per row
    (no shuffle). Oracle-checked via the portable sha256-slice hash
    family; the production path keeps seeded xxhash64."""
    return dedup.simhash(load_table(spark, sf_dir, "documents"), portable=True)


@query(
    "q50_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha,
           CAST(octet_length(encode(text)) % 256 AS BIGINT) AS feature
    FROM documents
    """,
)
def q50_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload + typed metadata +
    Arrow-batched mapInPandas feature extraction (decode stubbed —
    codecs absent; SURVEY §2.14). The oracle checks byte lengths and
    content hashes, proving the binary round-trip."""
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_media(d, F.encode(F.col("text"), "utf-8"))
    return multimodal.extract_features(media)


@query(
    "q38_chargram_jaccard",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id, source, unnest(list_distinct(
            list_transform(range(1, length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) - 2),
                           i -> substring(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), i, 4))
        )) AS g
        FROM documents WHERE doc_id % 10 = 0
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM grams a JOIN grams b ON a.g = b.g AND a.source = b.source
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(n_shared * 1.0 / (sa.sz + sb.sz - n_shared), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_shared * 1.0 / (sa.sz + sb.sz - n_shared) >= 0.3
    """,
)
def q38_chargram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character 4-gram Jaccard near-dup pairs [EXT] — the n-gram
    variant of the token-join formulation (10% sample, blocked by
    source)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return dedup.chargram_jaccard_pairs(d, n=4, threshold=0.3, block_col="source")


@query(
    "q51_frame_sample_plan",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               sha256(text) AS content_sha,
               GREATEST(CAST(floor((octet_length(encode(text)) / 4096.0) * 0.5) AS BIGINT), 1) AS n_frames
        FROM documents WHERE doc_id % 20 = 0
    )
    SELECT doc_id,
           CAST(unnest(range(0, n_frames)) AS BIGINT) AS frame_idx,
           ROUND(CAST(unnest(range(0, n_frames)) AS BIGINT) / 0.5, 3) AS ts_offset_sec,
           content_sha
    FROM m
    """,
)
def q51_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling plan [EXT]: one row per frame to
    decode, derived from payload size at 0.5 fps — sequence+explode,
    decode deferred to the planned subset."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    media = multimodal.attach_media(d, F.encode(F.col("text"), "utf-8"), "video")
    return multimodal.plan_frame_samples(media, fps=0.5, bytes_per_second=4096)


@query(
    "q52_media_chunks",
    oracle="""
    SELECT doc_id,
           CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks,
           CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes
    FROM documents WHERE doc_id % 20 = 0
    """,
)
def q52_media_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-segmentation-shaped chunking [EXT]: Arrow-batched
    mapInPandas splits payloads into 256-byte content-addressed chunks;
    checked as per-doc chunk counts + byte totals."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    media = multimodal.attach_media(d, F.encode(F.col("text"), "utf-8"), "audio")
    chunks = multimodal.chunk_media(media, chunk_bytes=256)
    return chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_bytes").alias("total_bytes"),
    )


@query(
    "q39_winnow_fingerprints",
    oracle=f"""
    WITH h AS (
        SELECT doc_id,
               list_transform({_SQL_SHINGLES}, s -> md5(s)) AS h
        FROM documents
    ), fp AS (
        SELECT doc_id,
               list_sort(list_distinct(
                   [list_min(h[i:least(i + 3, len(h))])
                    for i in range(1, greatest(len(h) - 3, 1) + 1)]
               )) AS fingerprints
        FROM h
    )
    SELECT doc_id,
           array_to_string(fingerprints, ',') AS fingerprints_csv,
           CAST(len(fingerprints) AS BIGINT) AS n_fingerprints
    FROM fp
    """,
)
def q39_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling window-min over shingle hashes, MOSS-style)
    document fingerprints [EXT] — selected md5 mins per 4-shingle
    window, the copy-detection primitive. The (already-sorted) array is
    CSV-encoded for the driver comparator, which cannot sort on an
    array-typed column (q19 pattern)."""
    fps = textstats.winnow_fingerprints(load_table(spark, sf_dir, "documents"))
    return fps.select(
        "doc_id",
        F.concat_ws(",", F.col("fingerprints")).alias("fingerprints_csv"),
        "n_fingerprints",
    )


@query(
    "q49_chunk_dedup",
    oracle="""
    WITH chunked AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(0, CAST(ceil(len(string_split(text, ' ')) / 20.0) AS BIGINT)),
                   i -> array_to_string(
                       list_slice(string_split(text, ' '), i*20 + 1, i*20 + 20), ' ')
               )) AS chunk
        FROM documents
    )
    SELECT sha256(chunk) AS chunk_hash,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM chunked
    GROUP BY chunk
    HAVING COUNT(*) > 1
    """,
)
def q49_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup [EXT]: corpus-wide duplicated 20-word
    chunks — the contamination/boilerplate scan doc-level dedup (q34)
    cannot see. Chunking is pure array expressions (no Python, no
    collect_list); one content-hash-keyed shuffle."""
    return dedup.chunk_dedup_counts(load_table(spark, sf_dir, "documents"))


@query(
    "q78_near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, source, unnest(list_distinct({_SQL_TOKS})) AS tok
        FROM documents
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM toks a JOIN toks b ON a.tok = b.tok AND a.source = b.source
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), pairs AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE ROUND(n_shared * 1.0 / (sa.sz + sb.sz - n_shared), 6) >= 0.5
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), reach(a, b) AS (
        SELECT a, b FROM (
            SELECT a, a AS b FROM (SELECT DISTINCT a FROM edges)
            UNION ALL SELECT a, b FROM edges
        )
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a
    """,
)
def q78_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair graph → dedup GROUPS via iterative connected
    components (min-label propagation; component = min reachable doc
    id). The oracle computes the same closure with a recursive CTE —
    the iterative Spark algorithm is exactly verified, not rows-only.
    Downstream dedup keeps MIN(doc_id) per component."""
    prs = dedup.jaccard_pairs(
        load_table(spark, sf_dir, "documents"), block_col="source", threshold=0.5
    )
    return dedup.connected_components(prs)


@query(
    "q77_word_entropy",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents
    ), wc AS (
        SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY doc_id, w
    ), totals AS (
        SELECT doc_id, SUM(c) AS n FROM wc GROUP BY doc_id
    )
    SELECT wc.doc_id,
           ROUND(CAST(SUM(CAST(-(c * 1.0 / n) * log2(c * 1.0 / n) AS DECIMAL(28,12))) AS DOUBLE), 6) AS entropy,
           CAST(MAX(n) AS BIGINT) AS n_tokens
    FROM wc JOIN totals ON wc.doc_id = totals.doc_id
    GROUP BY wc.doc_id
    """,
)
def q77_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-distribution entropy per document — the repetition/
    degeneracy quality signal. Per-term decimal snap makes the
    irrational log2 terms order-independent, so the iterative-free
    two-shuffle plan hash-matches the SQL oracle exactly."""
    return textstats.word_entropy(load_table(spark, sf_dir, "documents"))


@query(
    "q79_pii_redaction",
    oracle="""
    WITH seeded AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 10 = 0
                    THEN text || ' contact agent' || CAST(doc_id AS VARCHAR) || '@example.com now'
                    WHEN doc_id % 10 = 5
                    THEN text || ' call +1 (555) 010-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                    ELSE text END AS text
        FROM documents
    ), red AS (
        SELECT doc_id, source,
               regexp_replace(
                   regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[PII]', 'g'),
                   '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '[PII]', 'g') AS redacted,
               (regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')
                OR regexp_matches(text, '\\+?[0-9][0-9()\\- ]{7,}[0-9]')) AS had_pii
        FROM seeded
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN had_pii THEN 1 ELSE 0 END) AS BIGINT) AS n_with_pii,
           CAST(SUM(CASE WHEN contains(redacted, '[PII]') THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted
    FROM red GROUP BY source
    """,
)
def q79_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing [EXT]: deterministic synthetic emails/phones are
    seeded into a tenth of the corpus (same expression in both
    engines), then redacted with portable RE2-safe patterns. Verifies
    the redaction actually fires (n_with_pii = n_redacted) per source —
    one row-local pass, aggregated per source."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact agent"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 10 == 5,
            F.concat(
                F.col("text"),
                F.lit(" call +1 (555) 010-"),
                (1000 + F.col("doc_id") % 9000).cast("string"),
            ),
        )
        .otherwise(F.col("text")),
    )
    red = textstats.redact_pii(seeded)
    return red.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("had_pii"), 1).otherwise(0)).alias("n_with_pii"),
        F.sum(
            F.when(F.col("redacted").contains("[PII]"), 1).otherwise(0)
        ).alias("n_redacted"),
    )


@query(
    "q83_top_tokens",
    oracle=f"""
    WITH toks AS (
        SELECT unnest({_SQL_TOKS}) AS tok FROM documents
    )
    SELECT tok, COUNT(*) AS n
    FROM toks GROUP BY tok
    ORDER BY n DESC, tok ASC LIMIT 20
    """,
)
def q83_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy-hitters: exact token frequency top-20
    (count desc, token asc tie-break). Map-side partial counts collapse
    the explode before the shuffle; the sort+limit plans as
    TakeOrderedAndProject — at 100 TB the shuffle carries |vocab| rows,
    not |tokens|."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(textstats.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(20)
    )


@query(
    "q90_bpe_pretokens",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_extract_all(text, '{textstats.BPE_PRETOKEN_PATTERN.replace("'", "''")}'),
                           t -> trim(t) <> '') AS pts
        FROM documents
    )
    SELECT doc_id,
           CAST(len(pts) AS INTEGER) AS n_pretokens,
           CAST(len(list_filter(pts, t -> regexp_full_match(trim(t), '[\\p{{L}}]+'))) AS INTEGER) AS n_word_tokens,
           CAST(len(list_filter(pts, t -> regexp_full_match(trim(t), '[\\p{{N}}]+'))) AS INTEGER) AS n_number_tokens,
           CAST(len(pts)
                - len(list_filter(pts, t -> regexp_full_match(trim(t), '[\\p{{L}}]+')))
                - len(list_filter(pts, t -> regexp_full_match(trim(t), '[\\p{{N}}]+'))) AS INTEGER) AS n_other_tokens,
           ROUND(COALESCE(list_sum(list_transform(pts, t -> length(t))) * 1.0 / NULLIF(len(pts), 0), 0.0), 4) AS avg_pretoken_len
    FROM toks
    """,
)
def q90_bpe_pretokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pretokenization stats [EXT] — the LLM token-budget
    estimator (GPT-2 pretokenizer regex, cross-engine identical under
    Java regex and RE2). Row-local expressions only."""
    return textstats.bpe_pretoken_stats(load_table(spark, sf_dir, "documents"))


# DuckDB twins of the corpus_filter signals (q91). Integer/integer
# division is exactly-rounded IEEE double in both engines, so the rule
# comparisons agree bit-for-bit (same precedent as q32).
_SQL_CF_BIGRAMS = (
    f"CASE WHEN len({_SQL_TOKS}) >= 2 THEN "
    f"list_transform(range(1, len({_SQL_TOKS})), i -> {_SQL_TOKS}[i] || ' ' || {_SQL_TOKS}[i+1]) "
    "ELSE [] END"
)


@query(
    "q91_corpus_filter",
    oracle=f"""
    WITH sig AS (
        SELECT doc_id,
               len({_SQL_TOKS}) AS n_tokens,
               length(text) AS n_chars,
               length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS symbols,
               len(list_distinct({_SQL_TOKS})) AS n_distinct,
               {_SQL_CF_BIGRAMS} AS bg
        FROM documents
    ), m AS (
        SELECT doc_id,
               n_tokens,
               symbols * 1.0 / greatest(n_chars, 1) AS symbol_ratio,
               (n_chars - n_tokens + 1) * 1.0 / greatest(n_tokens, 1) AS mean_word_len,
               n_distinct * 1.0 / greatest(n_tokens, 1) AS distinct_ratio,
               COALESCE(list_max(list_transform(list_distinct(bg),
                        b -> len(list_filter(bg, x -> x = b)))), 0) * 1.0
                   / greatest(len(bg), 1) AS top_bigram_frac
        FROM sig
    ), tagged AS (
        SELECT doc_id, n_tokens, symbol_ratio, top_bigram_frac, distinct_ratio,
               CASE WHEN n_tokens < 30 THEN 'too_short'
                    WHEN n_tokens > 100000 THEN 'too_long'
                    WHEN symbol_ratio > 0.03 THEN 'symbol_heavy'
                    WHEN mean_word_len < 4.5 OR mean_word_len > 12.0 THEN 'word_shape'
                    WHEN top_bigram_frac > 0.04 THEN 'repetitive_bigrams'
                    WHEN distinct_ratio < 0.55 THEN 'low_diversity'
                    ELSE NULL END AS drop_reason
        FROM m
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(symbol_ratio, 6) AS symbol_ratio,
           ROUND(top_bigram_frac, 6) AS top_bigram_frac,
           ROUND(distinct_ratio, 6) AS distinct_ratio,
           drop_reason IS NULL AS keep,
           drop_reason
    FROM tagged
    """,
)
def q91_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style corpus quality gate [EXT]: length, symbol
    density, word shape, bigram repetition, token diversity —
    first-hit-wins drop reasons, row-local single scan (thresholds
    tightened so the fixture corpus exercises every rule)."""
    return textstats.corpus_filter(
        load_table(spark, sf_dir, "documents"),
        min_tokens=30,
        max_symbol_ratio=0.03,
        min_mean_word_len=4.5,
        max_top_bigram_frac=0.04,
        min_distinct_ratio=0.55,
    )


@query(
    "q116_chunk_documents",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    s AS (
        SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS st
        FROM t WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(st / 48 AS BIGINT) AS chunk_id,
           array_to_string(toks[st + 1 : st + 64], ' ') AS chunk_text,
           CAST(LEAST(64, len(toks) - st) AS INT) AS n_chunk_tokens
    FROM s
    """,
)
def q116_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token windows, 16-token
    overlap → stride 48) — the RAG/training segmentation map stage
    (``textstats.chunk_documents``). Row-local, shuffle-free; the
    oracle re-derives every window bound and chunk text exactly."""
    return textstats.chunk_documents(
        load_table(spark, sf_dir, "documents"),
        chunk_tokens=64,
        overlap_tokens=16,
    )


@query(
    "q123_boilerplate_strip",
    oracle="""
    WITH seeded AS (
        SELECT doc_id,
               CASE WHEN doc_id % 4 = 0
                    THEN text || '. Subscribe to our newsletter'
                    WHEN doc_id % 7 = 0
                    THEN text || '. All rights reserved. Subscribe to our newsletter'
                    ELSE text END AS text
        FROM documents
    ), seg AS (
        SELECT doc_id, unnest(segs) AS seg,
               unnest(range(1, len(segs)+1)) AS pos
        FROM (SELECT doc_id, string_split(text, '. ') AS segs FROM seeded)
    ), freq AS (
        SELECT seg, COUNT(DISTINCT doc_id) AS nd FROM seg GROUP BY seg
    ), kept AS (
        SELECT s.doc_id, s.seg, s.pos FROM seg s
        WHERE s.seg NOT IN (SELECT seg FROM freq WHERE nd >= 3)
    ), agg AS (
        SELECT doc_id, string_agg(seg, '. ' ORDER BY pos) AS clean_text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id
    ), tot AS (SELECT doc_id, COUNT(*) AS n_seg FROM seg GROUP BY doc_id)
    SELECT t.doc_id AS doc_id, COALESCE(a.clean_text, '') AS clean_text,
           CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(t.n_seg - COALESCE(a.n_kept, 0) AS BIGINT) AS n_stripped
    FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
    """,
)
def q123_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide boilerplate removal
    (``textstats.strip_boilerplate_lines``): newsletter/footer chrome
    is seeded into a quarter of the corpus (the fixture text has no
    repeated segments of its own, so the seeding is the testable
    surface — q79's PII pattern), then any segment appearing in ≥3
    distinct documents is stripped from all of them. One segment-keyed
    shuffle for the frequency count; verdicts join back on the same
    key — no driver-side segment dictionary."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.col("text"), F.lit(". Subscribe to our newsletter")),
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(". All rights reserved. Subscribe to our newsletter"),
            ),
        )
        .otherwise(F.col("text")),
    )
    return textstats.strip_boilerplate_lines(seeded, min_docs=3)


@query(
    "q127_unigram_logprob",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents
    ), counts AS (
        SELECT w, COUNT(*) AS c FROM toks GROUP BY w
    ), t AS (SELECT SUM(c) AS total FROM counts)
    SELECT toks.doc_id,
           ROUND(CAST(SUM(CAST(log2(c * 1.0 / total) AS DECIMAL(28,12)))
                      AS DOUBLE) / COUNT(*), 6) AS avg_logprob,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM toks JOIN counts USING (w), t
    GROUP BY toks.doc_id
    """,
)
def q127_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram log-probability scoring
    (``textstats.unigram_logprob_scores``): each document's mean
    per-token log2 probability under the corpus's own unigram
    distribution — the cheap LM-perplexity proxy for quality
    filtering. Decimal-snapped terms, one double division at the end,
    so the two engines agree bit-for-bit."""
    return textstats.unigram_logprob_scores(
        load_table(spark, sf_dir, "documents")
    )


@query(
    "q132_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents
    ), tf AS (
        SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY doc_id, w
    ), dfreq AS (
        SELECT w, COUNT(*) AS df FROM tf GROUP BY w
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.w, tf.tf, dfreq.df,
               CAST(tf.tf AS DECIMAL(10,0))
               * CAST(ROUND(log2((n.n_docs + 1.0) / (dfreq.df + 1)) + 1.0, 12)
                      AS DECIMAL(28,12)) AS score_exact
        FROM tf JOIN dfreq USING (w) CROSS JOIN n
    ), ranked AS (
        SELECT doc_id, w, tf, df, score_exact,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score_exact DESC, w ASC
               ) AS rnk
        FROM scored
    )
    SELECT doc_id, rnk AS "rank", w AS term, tf, df,
           CAST(ROUND(CAST(score_exact AS DOUBLE), 6) AS DOUBLE) AS tfidf
    FROM ranked WHERE rnk <= 5
    """,
)
def q132_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction (``textstats.tfidf_top_terms``): top-5
    distinguishing terms per document under smoothed tf-idf. Ranking
    compares DECIMAL-exact scores (idf snapped at scale 12), term-string
    tiebreak, so both engines produce the identical top-k set."""
    return textstats.tfidf_top_terms(
        load_table(spark, sf_dir, "documents"), k=5
    )


@query(
    "q137_intradoc_dedup",
    oracle="""
    WITH seeded AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0
                    THEN text || '. ' || split_part(text, '. ', 1)
                              || '. ' || split_part(text, '. ', 1)
                    ELSE text || '. ' || split_part(text, '. ', 1) END AS text
        FROM documents
    ), seg AS (
        SELECT doc_id, unnest(segs) AS seg,
               unnest(range(1, len(segs)+1)) AS pos
        FROM (SELECT doc_id, string_split(text, '. ') AS segs FROM seeded)
    ), firsts AS (
        SELECT doc_id, seg, MIN(pos) AS pos FROM seg GROUP BY doc_id, seg
    ), agg AS (
        SELECT doc_id, string_agg(seg, '. ' ORDER BY pos) AS clean_text,
               COUNT(*) AS n_kept
        FROM firsts GROUP BY doc_id
    ), tot AS (SELECT doc_id, COUNT(*) AS n_seg FROM seg GROUP BY doc_id)
    SELECT t.doc_id AS doc_id, a.clean_text AS clean_text,
           CAST(a.n_kept AS BIGINT) AS n_kept,
           CAST(t.n_seg - a.n_kept AS BIGINT) AS n_stripped
    FROM tot t JOIN agg a ON t.doc_id = a.doc_id
    """,
)
def q137_intradoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition removal
    (``textstats.dedup_intradoc_segments``): every document gets its
    own first sentence re-appended (twice for ``doc_id % 5 = 0``) —
    the fixture text has no repeated sentences of its own, so the
    seeding is the testable surface (q123's pattern) — then only the
    first occurrence of each segment survives, in original order.
    Row-local Catalyst fold: ZERO shuffles, a pure map stage at any
    scale; the oracle reproduces keep-first via MIN(pos) per
    (doc, segment)."""
    docs = load_table(spark, sf_dir, "documents")
    first = F.element_at(F.split(F.col("text"), r"\. "), 1)
    seeded = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"), F.lit(". "), first, F.lit(". "), first
            ),
        ).otherwise(F.concat(F.col("text"), F.lit(". "), first)),
    )
    return textstats.dedup_intradoc_segments(seeded)


@query(
    "q138_classifier_filter",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text),
                      '\\s+', ' ', 'g')), ' ')) AS tok
        FROM documents
    ), b AS (
        SELECT doc_id,
               CAST('0x' || substring(sha256(tok), 1, 8) AS BIGINT) % 64
                   AS bucket
        FROM toks
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(((bucket * 7919) % 2001) - 1000) AS BIGINT)
               AS sum_w_micro,
           SUM(((bucket * 7919) % 2001) - 1000) > 0 AS keep
    FROM b GROUP BY doc_id
    """,
)
def q138_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear classifier inference
    (``textstats.hashed_classifier_scores``): a fastText-style quality
    classifier scored over every document — tokens hash into 64
    buckets via the portable sliced-sha256 family, the doc score is
    the integer-exact sum of bucket weights (micro-units), ``keep``
    thresholds the mean at zero. The weight vector is generated from
    the deterministic formula ``((bucket*7919) % 2001) - 1000`` so the
    oracle recomputes it symbolically instead of embedding 64
    literals. Default strategy: row-local fold, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    weights = [((i * 7919) % 2001) - 1000 for i in range(64)]
    return textstats.hashed_classifier_scores(docs, weights)


@query(
    "q139_text_normalization",
    oracle=r"""
    WITH seeded AS (
        SELECT doc_id,
               '“' || replace(text, '. ', '. ') || '”—…' AS text
        FROM documents
    ), norm AS (
        SELECT doc_id, text,
               trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           replace(translate(text,
                               '“”‘’–— ',
                               '""''''-- '),
                               '…', '...'),
                           '[\x{200b}\x{200c}\x{200d}\x{feff}]', '', 'g'),
                       '[\x00-\x1f\x7f]', ' ', 'g'),
                   '\s+', ' ', 'g')) AS norm_text
        FROM seeded
    )
    SELECT doc_id, norm_text,
           norm_text <> text AS changed,
           CAST(length(text) - length(norm_text) AS BIGINT) AS n_chars_saved
    FROM norm
    """,
)
def q139_text_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode text normalization (``textstats.normalize_text``):
    smart quotes, an em-dash, an ellipsis, and NBSPs are seeded around
    and into every document (the fixture text is clean ASCII, so the
    seeding is the testable surface), then canonicalized to ASCII with
    whitespace squashed. The oracle replays the same
    literal-code-point translate/replace/regexp chain in DuckDB.
    Row-local, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.withColumn(
        "text",
        F.concat(
            F.lit("\u201c"),
            F.replace(F.col("text"), F.lit(". "), F.lit(".\u00a0")),
            F.lit("\u201d\u2014\u2026"),
        ),
    )
    return textstats.normalize_text(seeded)


@query(
    "q149_sample_k_per_group",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY CAST('0x' || substring(sha256(CAST(doc_id AS VARCHAR)), 1, 8)
                                 AS BIGINT) % 1000000000 ASC,
                            doc_id ASC
               ) AS rk
        FROM documents
    )
    SELECT doc_id, source FROM ranked WHERE rk <= 7
    """,
)
def q149_sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exactly-k-per-group sampling
    (``curation.sample_k_per_group``): 7 documents per source, chosen
    by portable-hash rank with id tiebreak — a reproducible
    pseudo-random quota sample the oracle replays exactly (RNG-seeded
    sampling never survives a repartition, let alone an engine swap).
    ONE group-keyed window shuffle."""
    from ..operators.curation import sample_k_per_group

    docs = load_table(spark, sf_dir, "documents")
    return sample_k_per_group(docs, "source", k=7).select("doc_id", "source")


@query(
    "q152_card_redaction",
    oracle="""
    WITH seeded AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN text || ' card 4111111111111111 leaked'
                    WHEN doc_id % 3 = 1
                    THEN text || ' ref 4111111111111112 is an order id'
                    ELSE text END AS text
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                THEN replace(text, '4111111111111111', '[CARD]')
                ELSE text END AS clean_text,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS n_redacted
    FROM seeded
    """,
)
def q152_card_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-validated card redaction
    (``textstats.redact_card_numbers``): a Luhn-VALID card number is
    seeded into a third of the corpus and an invalid same-length digit
    run into another third (the fixture text has no 13-19 digit runs of
    its own, verified) — only the valid one may be redacted. A naive
    length regex would also mangle the order-id look-alike; the Luhn
    fold is what separates them. Row-local Catalyst (regexp extract +
    checksum fold + replace fold), zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" card 4111111111111111 leaked")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.col("text"), F.lit(" ref 4111111111111112 is an order id")
            ),
        )
        .otherwise(F.col("text")),
    )
    return textstats.redact_card_numbers(seeded)


@query(
    "q169_cms_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT unnest({_SQL_TOKS}) AS w FROM documents
    ),
    cells AS (
        SELECT rw, bucket, COUNT(*) AS cell FROM (
            SELECT i AS rw,
                   CAST('0x' || substring(sha256('cms' || i || ':' || w), 1, 12)
                        AS BIGINT) % 512 AS bucket
            FROM toks, range(4) t(i)
        ) GROUP BY 1, 2
    ),
    top AS (
        SELECT w, COUNT(*) AS true_count FROM toks GROUP BY w
        ORDER BY true_count DESC, w ASC LIMIT 10
    ),
    probes AS (
        SELECT top.w, top.true_count, i AS rw,
               CAST('0x' || substring(sha256('cms' || i || ':' || top.w), 1, 12)
                    AS BIGINT) % 512 AS bucket
        FROM top, range(4) t(i)
    )
    SELECT p.w, p.true_count, MIN(c.cell) AS cms_estimate,
           MIN(c.cell) >= p.true_count AS no_undercount
    FROM probes p JOIN cells c USING (rw, bucket)
    GROUP BY p.w, p.true_count
    """,
)
def q169_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters [EXT]
    (``textstats.count_min_heavy_hitters``): top-10 corpus tokens with
    exact count and their estimate from a 4×512 count-min sketch built
    as a pure DataFrame composition (token occurrences emit their 4
    portable-hash cells row-locally → ONE (row, bucket) groupBy; the
    sketch IS a ≤2048-row mergeable table). Estimates join candidate
    cells against the constant-bounded sketch (legitimately
    broadcast-able at any corpus size) and take the per-token MIN. The
    CMS one-sided guarantee — never undercounts — ships as a checkable
    column; the whole computation is deterministic, so the DuckDB twin
    reproduces the estimates exactly."""
    return textstats.count_min_heavy_hitters(
        load_table(spark, sf_dir, "documents"), width=512, depth=4, k=10
    )


@query(
    "q170_bigram_logprob",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ),
    p AS (
        SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                          i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
            FROM t WHERE len(toks) >= 2
        )
    ),
    bg AS (SELECT w1, w2, COUNT(*) AS c2 FROM p GROUP BY 1, 2),
    pre AS (SELECT w1, SUM(c2) AS c1 FROM bg GROUP BY 1)
    SELECT p.doc_id,
           ROUND(CAST(SUM(CAST(log2(c2 * 1.0 / c1) AS DECIMAL(28,12)))
                      AS DOUBLE) / COUNT(*), 6) AS avg_bigram_logprob,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams
    FROM p JOIN bg USING (w1, w2) JOIN pre USING (w1)
    GROUP BY p.doc_id
    """,
)
def q170_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram conditional log-probability scoring [EXT]
    (``textstats.bigram_logprob_scores``): mean log2 P(w2|w1) per
    document under the corpus's own bigram counts — the order-2 LM
    fluency proxy (impossible transitions score very negative even
    when unigrams look plausible). Bigram extraction is row-local
    (zip_with over a shifted slice); counts and prefix totals stay
    distributed; decimal-snapped terms keep both engines
    bit-identical."""
    return textstats.bigram_logprob_scores(
        load_table(spark, sf_dir, "documents")
    )


@query(
    "q188_bm25_search",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text),
                      '\\s+', ' ', 'g')), ' ')) AS w
        FROM documents
    ), tf AS (
        SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
    ), docfreq AS (
        SELECT w, COUNT(*) AS df FROM tf GROUP BY 1
    ), corpus AS (
        SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl
    ), scored AS (
        SELECT tf.doc_id,
               CAST(ROUND(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * (1.2 + 1.0)
                      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl
                         / (CAST(sum_dl AS DOUBLE) / n_docs)))),
                   12) AS DECIMAL(28,12)) AS part
        FROM tf JOIN docfreq USING (w) JOIN dl USING (doc_id), corpus
        WHERE w IN ('merge', 'stream', 'window')
    )
    SELECT doc_id,
           CAST(ROUND(SUM(part), 6) AS DOUBLE) AS bm25,
           COUNT(*) AS n_terms_hit
    FROM scored GROUP BY 1
    ORDER BY bm25 DESC, doc_id ASC LIMIT 10
    """,
)
def q188_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked keyword search [EXT] — ``operators.search.bm25_topk``
    for the query {merge, stream, window}: the lexical-retrieval half
    of a RAG pipeline over the (doc, term, tf) relation built in ONE
    explode+groupBy pass (document frequencies re-aggregate that same
    relation — no second corpus scan; corpus constants ride a
    broadcast 1-row aggregate; ranking is a TakeOrderedAndProject).
    Per-term partials snap to DECIMAL(28,12) before the per-doc sum so
    the hash can't flap on float order."""
    from ..operators.search import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, ["merge", "stream", "window"], k=10)


@query(
    "q189_fuzzy_pairs",
    oracle="""
    WITH names AS (
        SELECT p_name, MIN(p_partkey) AS name_id, COUNT(*) AS n_rows
        FROM part GROUP BY 1
    ), side AS (
        SELECT name_id, p_name, n_rows,
               list_extract(string_split(p_name, ' '), -1) AS block
        FROM names
    )
    SELECT a.name_id AS id_a, b.name_id AS id_b,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist,
           a.n_rows AS n_rows_a, b.n_rows AS n_rows_b
    FROM side a JOIN side b USING (block)
    WHERE a.name_id < b.name_id
      AND levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def q189_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance entity matching [EXT] —
    ``operators.dedup.fuzzy_pairs`` over the DISTINCT part-name
    relation (the entity-resolution shape: match name variants, not
    row pairs — exact duplicates collapse in the grouping step and
    carry their row counts). Blocked on the last name token so
    candidate generation is ONE equi-join with Σ(block²) cost instead
    of n²; Levenshtein runs as the JVM builtin on candidates only.
    Completes the dedup ladder's character end (exact → MinHash →
    SimHash → chargram → edit distance)."""
    from ..operators.dedup import fuzzy_pairs

    p = load_table(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(
        F.min("p_partkey").alias("name_id"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    pairs = fuzzy_pairs(names, "p_name", "name_id", max_dist=2)
    counts = names.select(
        F.col("name_id").alias("id_a"), F.col("n_rows").alias("n_rows_a")
    )
    counts_b = names.select(
        F.col("name_id").alias("id_b"), F.col("n_rows").alias("n_rows_b")
    )
    # hint-free: at sf the name relation is broadcast-sized but at
    # entity-resolution scale (hundreds of millions of names) a forced
    # broadcast OOMs — AQE picks BHJ here anyway because PAIRS is the
    # small side (same posture as winsorize's bounds join, r10)
    return pairs.join(counts, "id_a").join(
        counts_b, "id_b"
    ).select(
        "id_a", "id_b", "name_a", "name_b", "dist", "n_rows_a", "n_rows_b"
    )


@query(
    "q200_prefix_jaccard_join",
    oracle="""
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text),
                      '\\s+', ' ', 'g')), ' ')) AS w
        FROM documents
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY 1
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT COUNT(*) AS n_pairs,
           CAST(ROUND(SUM(CAST(jaccard AS DECIMAL(18,6))), 6) AS DOUBLE)
               AS sum_jaccard,
           MAX(jaccard) AS max_jaccard,
           CAST(COUNT(CASE WHEN jaccard = 1.0 THEN 1 END) AS BIGINT)
               AS n_identical
    FROM (
        SELECT ROUND(n_shared * 1.0 / (sa.sz + sb.sz - n_shared), 6)
                   AS jaccard
        FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE n_shared * 1.0 / (sa.sz + sb.sz - n_shared) >= 0.9
    )
    """,
)
def q200_prefix_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join at Jaccard ≥ 0.9 [EXT] —
    ``dedup.prefix_filter_jaccard_pairs`` (PPJoin-family prefix
    filtering): candidates come ONLY from rarest-token prefixes
    (provably complete for the threshold) plus a length filter, then
    row-local array-intersect verification — exact results at a
    fraction of the every-token join's candidate volume, with none of
    LSH's false negatives. The oracle is the full brute-force
    pair enumeration: prefix filtering must find exactly that set."""
    from ..operators.dedup import prefix_filter_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    out = prefix_filter_jaccard_pairs(docs, threshold=0.9)
    # the fixture's ~40-token vocabulary makes the TRUE result set
    # quadratic (~20% of all pairs at sf0.1) — summarize so the query
    # stays hash-compact; the pair relation itself is the operator's
    # real product and is exercised row-by-row in unit tests
    return out.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum(F.col("jaccard").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("sum_jaccard"),
        F.max("jaccard").alias("max_jaccard"),
        F.count(F.when(F.col("jaccard") == 1.0, 1))
        .alias("n_identical"),
    )


@query(
    "q201_exact_substring_profile",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, {_SQL_TOKS} AS ws FROM documents
    ), g AS (
        SELECT doc_id, i, array_to_string(ws[i:i+4], ' ') AS gram
        FROM words, LATERAL unnest(generate_series(1, len(ws) - 4)) AS t(i)
        WHERE len(ws) >= 5
    ), dup AS (
        SELECT gram FROM g GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    ), dg AS (
        SELECT doc_id, i FROM g JOIN dup USING (gram)
    ), cov AS (
        SELECT DISTINCT doc_id, p
        FROM dg, LATERAL unnest(generate_series(i, i + 4)) AS c(p)
    )
    SELECT w.doc_id,
           len(ws) AS n_words,
           GREATEST(len(ws) - 4, 0) AS n_grams,
           COALESCE(d.nd, 0) AS n_dup_grams,
           COALESCE(c.nc, 0) AS n_covered_words,
           CASE WHEN len(ws) >= 5
                THEN ROUND(COALESCE(d.nd, 0) * 1.0 / (len(ws) - 4), 6)
           END AS dup_ratio
    FROM words w
    LEFT JOIN (SELECT doc_id, COUNT(*) AS nd FROM dg GROUP BY 1) d
           ON w.doc_id = d.doc_id
    LEFT JOIN (SELECT doc_id, COUNT(*) AS nc FROM cov GROUP BY 1) c
           ON w.doc_id = c.doc_id
    """,
)
def q201_exact_substring_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring profile at word 5-gram
    granularity [EXT] — ``dedup.exact_substring_profile``, the
    measurement half of the ExactSubstr dedup recipe (Lee et al. 2022,
    public formulation); ``dedup.strip_duplicate_spans`` is the removal
    half (pytest-verified vs a brute-force reference — its rebuilt
    free-text column isn't hash-stable SQL). Generalizes the
    boilerplate-line stripper (q123) from line to arbitrary k-gram
    granularity. Grams stay row-local arrays (iterated zip_with);
    shuffles are one gram-keyed frequency agg + the candidate join
    back + per-doc rollups — the oracle is the brute-force position
    enumeration."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_substring_profile(docs, k=5)


@query(
    "q209_gopher_repetition",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS n_chars,
               {_SQL_TOKS} AS ws
        FROM documents
    ),
    g2 AS (
        SELECT doc_id, n_chars, array_to_string(ws[i:i+1], ' ') AS gram
        FROM base, LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)
        WHERE len(ws) >= 2
    ),
    c2 AS (SELECT doc_id, n_chars, gram, COUNT(*) AS cnt
           FROM g2 GROUP BY 1, 2, 3),
    t2 AS (
        SELECT doc_id, gram AS top_bigram,
               ROUND(LEAST(cnt * length(gram) * 1.0 / n_chars, 1.0), 6)
                   AS bigram_char_frac
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY cnt DESC, gram ASC) AS rn FROM c2)
        WHERE rn = 1
    ),
    g3 AS (
        SELECT doc_id, n_chars, array_to_string(ws[i:i+2], ' ') AS gram
        FROM base, LATERAL unnest(generate_series(1, len(ws) - 2)) AS t(i)
        WHERE len(ws) >= 3
    ),
    c3 AS (SELECT doc_id, n_chars, gram, COUNT(*) AS cnt
           FROM g3 GROUP BY 1, 2, 3),
    t3 AS (
        SELECT doc_id, gram AS top_trigram,
               ROUND(LEAST(cnt * length(gram) * 1.0 / n_chars, 1.0), 6)
                   AS trigram_char_frac
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY cnt DESC, gram ASC) AS rn FROM c3)
        WHERE rn = 1
    )
    SELECT b.doc_id, n_chars, top_bigram, bigram_char_frac,
           top_trigram, trigram_char_frac
    FROM base b
    LEFT JOIN t2 ON b.doc_id = t2.doc_id
    LEFT JOIN t3 ON b.doc_id = t3.doc_id
    """,
)
def q209_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition quality filters [EXT] —
    ``textstats.gopher_repetition``: per-doc fraction of characters in
    the most frequent word 2-/3-gram (Rae et al. 2021 Table A1's
    looping-text detectors). ONE corpus scan (both orders ride a tagged
    row-local gram array), one (doc, k, gram) count shuffle, mode picked
    by a deterministic per-(doc, k) window; complements the
    CROSS-document ExactSubstr profile (q201) with the INTRA-document
    repetition axis."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.gopher_repetition(docs)
