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
