"""Text-analysis operators [EXT]: tokenization, language-ID heuristic,
quality scoring, document fingerprinting (SURVEY §2.14).

All pure Catalyst expressions (split / regexp / higher-order array
functions) — no Python UDFs, so the hot path stays inside whole-stage
codegen and scales to 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import norm_text_hash

# Marker stopwords per language, matched as whole words. Deterministic
# argmax with fixed priority order (en > de > es > fr) on ties.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is)\b",
    "de": r"\b(der|und|die|das|ist)\b",
    "es": r"\b(el|la|los|de|que)\b",
    "fr": r"\b(le|la|les|et|est)\b",
}

STOPWORDS_EN = "the|a|an|and|or|of|to|in|is|it"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of normalized text."""
    return F.split(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), " ")


def shingles(text: Column, k: int = 3) -> Column:
    """Word 3-gram shingles of normalized text (document fingerprinting
    unit for MinHash). Docs shorter than 3 tokens contribute their whole
    normalized text as a single shingle so they still fingerprint.

    Built with zip_with over shifted slices — NOT transform(sequence)
    with element_at: lambda-body references to the token array are
    re-evaluated per element by Catalyst (the regexp tokenization ran
    3× per shingle; measured ~10× slowdown at sf0.1). Here the token
    array is only referenced a constant number of times per row.
    """
    assert k == 3, "zip_with construction below is specialized to 3-grams"
    toks = tokens(text)
    n = F.size(toks)
    # bigrams: toks[i] + toks[i+1]; final position pairs with NULL and
    # is sliced off after the trigram stage.
    bi = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    tri = F.zip_with(
        bi,
        F.slice(toks, 3, F.greatest(n - 2, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    return F.when(n >= 3, F.slice(tri, 1, n - 2)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def word_kgrams(toks: Column, k: int) -> Column:
    """Array of word k-grams (positions preserved: element i spans
    tokens i..i+k-1). Built by iterated zip_with over shifted slices —
    the same constant-reference construction as :func:`shingles`
    (transform(sequence) re-evaluates the token expression
    per element; measured ~10× slower). Docs shorter than ``k`` words
    yield an empty array."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    n = F.size(toks)
    acc = toks
    for i in range(2, k + 1):
        acc = F.zip_with(
            acc,
            F.slice(toks, i, F.greatest(n - (i - 1), F.lit(0))),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    return F.when(n >= k, F.slice(acc, 1, n - k + 1)).otherwise(
        F.array().cast("array<string>")
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (≈ chars/4 ceiling, the common LLM heuristic) + distinct ratio."""
    toks = tokens(F.col(text_col))
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.ceil(F.length(F.col(text_col)) / 4).cast("bigint").alias("n_subwords_est"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("distinct_ratio"),
    )


def language_scores(text: Column) -> dict[str, Column]:
    return {
        lang: F.regexp_count(F.lower(text), F.lit(pat))
        for lang, pat in LANG_MARKERS.items()
    }


def guess_language(text: Column) -> Column:
    """n-gram/stopword language-ID heuristic: argmax of marker-word
    counts, 'und' (undetermined) when all scores are zero."""
    s = language_scores(text)
    best = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] > 0),
            "en",
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] > 0), "de")
        .when((s["es"] >= s["fr"]) & (s["es"] > 0), "es")
        .when(s["fr"] > 0, "fr")
        .otherwise("und")
    )
    return best


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length, punctuation density, digit
    density, stopword ratio, mean word length → composite score."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    punct = F.length(F.regexp_replace(t, r"[\w\s]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    stop = F.size(
        F.filter(toks, lambda w: w.rlike(f"^({STOPWORDS_EN})$"))
    )
    punct_ratio = F.round(punct / n_chars, 6)
    digit_ratio = F.round(digits / n_chars, 6)
    stop_ratio = F.round(stop / n_tokens, 6)
    mean_word_len = F.round((n_chars - n_tokens + 1) / n_tokens, 6)
    score = F.round(
        F.lit(1.0)
        - F.least(punct_ratio * 2, F.lit(0.5))
        - F.least(digit_ratio * 2, F.lit(0.3))
        + F.least(stop_ratio, F.lit(0.2)),
        6,
    )
    return df.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality_score"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical document fingerprint (normalize → sha2) — the basis of
    exact dedup."""
    return df.withColumn("doc_fp", norm_text_hash(F.col(text_col)))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    window: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (rolling-hash selection à la
    Schleimer/Wilkerson/Aiken, the MOSS algorithm): hash every word
    3-gram shingle, keep the minimum hash of each sliding window of
    ``window`` consecutive shingle hashes, then distinct + sort. Local
    edits perturb only nearby windows, so two documents sharing a long
    run of text share most fingerprints — the classic copy-detection /
    overlap-estimation primitive.

    Portable md5 hash family so a SQL oracle reproduces the selection
    exactly. The sliding min is built from O(log window) shifted-slice
    ``zip_with`` folds (``least`` ignores the NULL padding), NOT
    ``transform(sequence)`` — see :func:`shingles` for why: lambda-body
    references to outer arrays re-evaluate per element in Catalyst,
    which would re-hash every shingle ``window`` times per row. Docs
    with fewer than ``window`` shingles contribute the min over all of
    them, so every document fingerprints.
    """
    assert window == 4, "shifted-slice fold below is specialized to window=4"
    h = F.transform(shingles(F.col(text_col)), lambda s: F.md5(s))
    n = F.size(h)
    # p[i] = min(h[i], h[i+1]); q[i] = min(p[i], p[i+2]) = min(h[i..i+3])
    lmin = lambda x, y: F.least(x, y)  # noqa: E731 — F.least is *cols, not a binary lambda
    p = F.zip_with(h, F.slice(h, 2, F.greatest(n - 1, F.lit(0))), lmin)
    q = F.zip_with(p, F.slice(p, 3, F.greatest(n - 2, F.lit(0))), lmin)
    fps = F.array_sort(F.array_distinct(F.slice(q, 1, F.greatest(n - 3, F.lit(1)))))
    return df.select(
        F.col(id_col),
        fps.alias("fingerprints"),
        F.size(fps).cast("bigint").alias("n_fingerprints"),
    )


def word_entropy(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document word-distribution entropy [EXT] — a repetition /
    degenerate-text quality signal (boilerplate and keyword-stuffed
    docs score low; natural prose scores high).

    H = -Σ p_w·log2(p_w) over the doc's word frequencies. Each term is
    snapped to DECIMAL(28,12) before the sum, so accumulation order
    (Spark partial aggs vs any serial oracle) cannot perturb the value.
    Shuffles on (doc, word) then (doc): both content-keyed, skew-free;
    per-doc frequency maps never materialize driver-side.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    )
    wc = toks.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    totals = wc.groupBy(id_col).agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    term = (-p * F.log2(p)).cast("decimal(28,12)")
    return (
        wc.join(totals, id_col)
        .groupBy(id_col)
        .agg(
            F.round(F.sum(term).cast("double"), 6).alias("entropy"),
            F.max("n").alias("n_tokens"),
        )
    )


PII_PATTERNS = {
    # deliberately simple, RE2-compatible patterns (portable between
    # Java regex and DuckDB/RE2) — production would use a layered ruleset
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
}


def redact_pii(
    df: DataFrame, text_col: str = "text", replacement: str = "[PII]"
) -> DataFrame:
    """PII scrubbing [EXT]: regex-redact emails/phones in one
    JVM-side pass per pattern (chained regexp_replace — no Python, no
    extra shuffle; purely row-local so it composes with any scan)."""
    out = F.col(text_col)
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, replacement)
    n_hits = sum(
        (F.length(F.col(text_col)) - F.length(F.regexp_replace(F.col(text_col), p, "")))
        / F.lit(1)  # length delta > 0 ⇒ at least one hit
        for p in PII_PATTERNS.values()
    )
    return df.withColumn("redacted", out).withColumn(
        "had_pii", n_hits > 0
    )


# GPT-2-style pretokenizer pattern (contractions | space-prefixed letter
# runs | space-prefixed digit runs | space-prefixed punctuation runs |
# whitespace). Verified to match identically under Java regex (Spark)
# and RE2 (DuckDB) including Unicode classes, so the oracle reproduces
# counts exactly.
BPE_PRETOKEN_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_pretokens(text: Column) -> Column:
    """BPE-style pretoken array — the subword tokenizer's input units.
    ``len(bpe_pretokens)`` is the standard fast token-count estimate for
    LLM training budgets (whitespace-only runs excluded)."""
    toks = F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN), F.lit(0))
    return F.filter(toks, lambda t: F.trim(t) != "")


def bpe_pretoken_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document BPE-ish token accounting [EXT]: pretoken count (the
    LLM budget estimate), word/number/other breakdown, mean pretoken
    length — one row-local expression pipeline, no shuffle."""
    toks = bpe_pretokens(F.col(text_col))
    is_word = lambda t: F.trim(t).rlike(r"^[\p{L}]+$")  # noqa: E731
    is_num = lambda t: F.trim(t).rlike(r"^[\p{N}]+$")  # noqa: E731
    return df.select(
        "doc_id",
        F.size(toks).alias("n_pretokens"),
        F.size(F.filter(toks, is_word)).alias("n_word_tokens"),
        F.size(F.filter(toks, is_num)).alias("n_number_tokens"),
        (
            F.size(toks)
            - F.size(F.filter(toks, is_word))
            - F.size(F.filter(toks, is_num))
        ).alias("n_other_tokens"),
        F.round(
            F.coalesce(
                F.aggregate(
                    toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
                )
                / F.nullif(F.size(toks), F.lit(0)),
                F.lit(0.0),
            ),
            4,
        ).alias("avg_pretoken_len"),
    )


def corpus_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_symbol_ratio: float = 0.25,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_top_bigram_frac: float = 0.30,
    min_distinct_ratio: float = 0.20,
) -> DataFrame:
    """Gopher/C4-style corpus quality gate [EXT]: length bounds, symbol
    density, word-shape sanity, and repetition (top-bigram fraction +
    distinct-token ratio) — the standard pre-training document filter.

    Returns every input row tagged with ``keep`` and the FIRST failing
    ``drop_reason`` (rules evaluated in declared order, first-hit-wins —
    same discipline as MERGE clause order). Pure row-local expressions:
    at 100 TB this is a single scan with zero shuffles; callers chain
    ``.filter("keep")`` so the gate fuses into downstream plans."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    symbols = F.length(F.regexp_replace(t, r"[\w\s]", ""))
    symbol_ratio = symbols / F.greatest(n_chars, F.lit(1))
    mean_word_len = (n_chars - n_tokens + 1) / F.greatest(n_tokens, F.lit(1))
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1))
    # top bigram fraction: most frequent adjacent pair / total bigrams
    bigrams = F.when(
        n_tokens >= 2,
        F.transform(
            F.slice(toks, 1, F.size(toks) - 1),
            lambda w, i: F.concat_ws(" ", w, F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # mode count = longest equal-run of the SORTED bigram array — one
    # O(n log n) sort + one linear fold per row (r13). The former
    # per-distinct-bigram filter re-scanned the bigram array once per
    # distinct value: O(n²) per document with the full bigram-build
    # expression inlined into the inner lambda, measured 60.6 s → 3.7 s
    # for the 500-doc fixture corpus (17×), bit-identical counts. The
    # initial prev is NULL and bigrams are non-null, so the first
    # element of every run (including a would-be empty string) starts
    # at run=1 via the null-safe equality.
    top_bigram_n = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
                    F.lit(1)
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_bigram_frac = top_bigram_n / F.greatest(F.size(bigrams), F.lit(1))

    rules = [
        ("too_short", n_tokens < min_tokens),
        ("too_long", n_tokens > max_tokens),
        ("symbol_heavy", symbol_ratio > max_symbol_ratio),
        (
            "word_shape",
            (mean_word_len < min_mean_word_len) | (mean_word_len > max_mean_word_len),
        ),
        ("repetitive_bigrams", top_bigram_frac > max_top_bigram_frac),
        ("low_diversity", distinct_ratio < min_distinct_ratio),
    ]
    reason = F.lit(None).cast("string")
    for name, cond in reversed(rules):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    return df.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(top_bigram_frac, 6).alias("top_bigram_frac"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG / training-corpus
    segmentation step: each document becomes windows of
    ``chunk_tokens`` tokens starting every ``chunk_tokens −
    overlap_tokens`` tokens (the final window may be short; empty docs
    yield no chunks).

    Row-local and shuffle-free: one tokenization per row referenced a
    constant number of times, window starts from ``sequence``, chunk
    text from ``slice`` — at 100 TB this is a pure map stage whose
    output lands partition-aligned with its input. Deterministic ids:
    ``chunk_id`` is the window ordinal.
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be < chunk_tokens")
    step = chunk_tokens - overlap_tokens
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(step))).otherwise(
        F.array().cast("array<int>")
    )
    out = df.select(
        F.col(id_col),
        toks.alias("__toks"),  # materialized once; sliced per chunk
        F.posexplode(starts).alias("chunk_id", "__s"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__s") + 1, chunk_tokens)
    return out.select(
        id_col,
        "chunk_id",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_chunk_tokens"),
    )


def strip_boilerplate_lines(
    df: DataFrame,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    separator: str = ". ",
) -> DataFrame:
    """Corpus-wide boilerplate removal [EXT]: a text segment (sentence
    /line, split on ``separator``) that appears verbatim in at least
    ``min_docs`` distinct documents is template chrome — navigation,
    cookie banners, footers — and is stripped from every document
    (the CCNet/C4-style cleanup that runs before dedup, because
    boilerplate inflates near-dup similarity between unrelated pages).

    Returns one row per input document: ``clean_text`` (surviving
    segments rejoined in original order), ``n_kept``, ``n_stripped``.
    Documents that were pure boilerplate survive with empty text so
    the output stays row-aligned with the input.

    Scale design: segments shuffle once on the segment value for the
    frequency count (map-side combined) and the verdict joins back on
    the same key — no broadcast of the (unbounded) segment dictionary;
    reassembly aggregates per document with an in-group sort, bounded
    by document size. Exact-match semantics: normalization (case,
    whitespace) is the caller's pre-step, keeping the operator
    oracle-exact."""
    import re as _re

    segs = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(separator))).alias(
            "pos", "seg"
        ),
    )
    freq = segs.groupBy("seg").agg(
        F.countDistinct(id_col).alias("nd")
    )
    kept = segs.join(
        freq.filter(F.col("nd") >= min_docs).select("seg"), "seg", "left_anti"
    )
    clean = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            separator,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = segs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_seg"))
    return (
        totals.join(clean, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_seg") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_stripped"
            ),
        )
    )


def dedup_intradoc_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    separator: str = ". ",
) -> DataFrame:
    """Intra-document repetition removal [EXT]: within each document,
    keep only the FIRST occurrence of every text segment (sentence /
    line, split on ``separator``) — the C4-style cleanup for scraped
    pages that repeat their own headline, nav block, or a templated
    sentence several times in one page. Complements
    ``strip_boilerplate_lines`` (cross-document chrome): this one
    never looks outside the row.

    Returns one row per input document: ``clean_text`` (first
    occurrences rejoined in original order), ``n_kept``,
    ``n_stripped``.

    Scale design: the entire cleanup is a row-local Catalyst
    ``aggregate`` fold over the split array — ZERO shuffles, no
    explode, no window, no Python; at 100 TB it is a pure map stage
    fused into whatever scan feeds it. Per-row cost is
    O(segments**2) membership checks, bounded by document size.
    Exact-match semantics: normalization is the caller's pre-step
    (same contract as ``strip_boilerplate_lines``)."""
    import re as _re

    segs = F.split(F.col(text_col), _re.escape(separator))
    kept = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            F.exists(acc, lambda x: x == s), acc
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return df.select(
        F.col(id_col),
        F.array_join(kept, separator).alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(segs) - F.size(kept)).cast("long").alias("n_stripped"),
    )


def hashed_classifier_scores(
    df: DataFrame,
    weights_micro: list[int],
    threshold_micro: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_join: bool = False,
) -> DataFrame:
    """Hashed linear classifier inference [EXT] — the fastText-style
    quality-classifier filtering stage (FineWeb-Edu / CCNet posture):
    each token hashes into one of ``len(weights_micro)`` buckets with
    the engine-portable sliced-sha256 family
    (:func:`curation.portable_hash_bucket`), the document's score is
    the exact integer sum of its tokens' bucket weights (micro-units:
    the weight vector is pre-scaled to int(w * 1e6), so scoring is
    integer-exact and identical in any engine — no float summation
    order hazard), and ``keep`` thresholds the mean weight via the
    cross-multiplied integer comparison
    ``sum_w_micro > threshold_micro * n_tokens``.

    Two physical strategies, identical results (tested against each
    other):

    - ``use_join=False`` (default; model fits the plan): the weight
      vector rides along as a literal array; scoring is a row-local
      ``aggregate`` fold — ZERO shuffles, a pure map stage fused into
      the scan. Right whenever D is classifier-sized (2**6..2**12).
    - ``use_join=True`` (big-D path): tokens explode once and
      broadcast-join the D-row bucket→weight relation (map-side), then
      re-aggregate per document — ONE doc-keyed shuffle with partial
      aggregation. Right when D is too large to inline in the plan
      (2**20-bucket production models).
    """
    d = len(weights_micro)
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )

    def bucket(tok):
        h = F.conv(F.substring(F.sha2(tok.cast("string"), 256), 1, 8), 16, 10)
        return h.cast("long") % d

    if use_join:
        spark = df.sparkSession
        wdf = spark.createDataFrame(
            [(i, int(w)) for i, w in enumerate(weights_micro)],
            "bucket long, w_micro long",
        )
        ex = df.select(
            F.col(id_col), F.explode(toks).alias("tok")
        ).select(id_col, bucket(F.col("tok")).alias("bucket"))
        scored = (
            ex.join(F.broadcast(wdf), "bucket")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_tokens"),
                F.sum("w_micro").alias("sum_w_micro"),
            )
        )
    else:
        arr = F.array(*[F.lit(int(w)).cast("long") for w in weights_micro])
        summed = F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.element_at(arr, (bucket(t) + 1).cast("int")),
        )
        scored = df.select(
            F.col(id_col),
            F.size(toks).cast("long").alias("n_tokens"),
            summed.alias("sum_w_micro"),
        )
    return scored.select(
        id_col,
        "n_tokens",
        "sum_w_micro",
        (
            F.col("sum_w_micro")
            > F.lit(int(threshold_micro)) * F.col("n_tokens")
        ).alias("keep"),
    )


def normalize_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unicode text normalization [EXT] — the canonicalization pass
    every corpus pipeline runs BEFORE tokenization, dedup, and
    fingerprinting (exact-match dedup on un-normalized text silently
    misses near-identical pages that differ only in smart quotes or
    non-breaking spaces):

    - smart quotes \u201c \u201d \u2018 \u2019 -> ASCII " '
    - en/em dashes \u2013 \u2014 -> '-'
    - ellipsis \u2026 -> '...'
    - NBSP \u00a0 -> space; zero-width chars \u200b-\u200d \ufeff
      removed
    - C0/DEL control characters -> space
    - whitespace squashed to single spaces and trimmed

    Returns ``id_col``, ``norm_text``, ``changed`` (whether anything
    was rewritten), and ``n_chars_saved``. Deterministic and
    engine-portable (plain translate/replace/regexp on literal code
    points — no locale, no ICU).

    Scale design: row-local translate/regexp chain — ZERO shuffles, a
    pure map stage fused into the scan at any scale."""
    t = F.col(text_col)
    t = F.translate(
        t,
        "\u201c\u201d\u2018\u2019\u2013\u2014\u00a0",
        "\"\"''-- ",
    )
    t = F.replace(t, F.lit("\u2026"), F.lit("..."))
    t = F.regexp_replace(t, "[\u200b\u200c\u200d\ufeff]", "")
    t = F.regexp_replace(t, "[\\x00-\\x1F\\x7F]", " ")
    t = F.trim(F.regexp_replace(t, "\\s+", " "))
    return df.select(
        F.col(id_col),
        t.alias("norm_text"),
        (t != F.col(text_col)).alias("changed"),
        (F.length(F.col(text_col)) - F.length(t)).cast("long").alias(
            "n_chars_saved"
        ),
    )


def redact_card_numbers(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token: str = "[CARD]",
) -> DataFrame:
    """Checksum-validated credit-card redaction [EXT]: 13-19 digit
    runs are redacted ONLY when they pass the Luhn check — the
    validation step that separates real PAN leakage from order ids and
    timestamps a naive length regex would mangle (the precision/recall
    tradeoff every production PII scrubber makes).

    Pure Catalyst: candidate extraction is one ``regexp_extract_all``,
    the Luhn checksum is a fold over the digit positions (double every
    second digit from the right, subtract 9 above 9, sum % 10 == 0),
    and redaction folds ``replace`` over the validated candidates.
    Row-local, ZERO shuffles, no Python. Digit runs broken by spaces or
    dashes are the caller's normalization pre-step (same contract as
    the email/phone scrubber).

    Returns ``id_col``, ``clean_text``, ``n_redacted``."""
    # Luhn over candidate c: i counts from the right (0-based)
    luhn_sum = (
        "aggregate(sequence(1, length(c)), 0, (acc, i) -> acc + "
        "  CASE WHEN pmod(i - 1, 2) = 1 THEN "
        "    IF(2 * CAST(substring(c, length(c) - i + 1, 1) AS INT) > 9, "
        "       2 * CAST(substring(c, length(c) - i + 1, 1) AS INT) - 9, "
        "       2 * CAST(substring(c, length(c) - i + 1, 1) AS INT)) "
        "  ELSE CAST(substring(c, length(c) - i + 1, 1) AS INT) END)"
    )
    valid = F.expr(
        f"filter(regexp_extract_all({text_col}, '[0-9]{{13,19}}', 0), "
        f"c -> pmod({luhn_sum}, 10) = 0)"
    )
    redacted = F.aggregate(
        valid,
        F.col(text_col),
        lambda acc, c: F.replace(acc, c, F.lit(token)),
    )
    return df.select(
        F.col(id_col),
        redacted.alias("clean_text"),
        F.size(valid).cast("long").alias("n_redacted"),
    )


def unigram_logprob_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-unigram log-probability scoring [EXT]: each document's
    mean per-token log2 probability under the corpus's own unigram
    distribution — the classic cheap LM-perplexity proxy for data
    filtering (documents full of corpus-rare tokens score very
    negative: OCR noise, codes, other-language spill; documents of
    pure high-frequency glue score near the top and can be capped
    from the other side). Complements per-doc entropy, which sees
    only the document's internal distribution.

    Per-token terms are snapped to DECIMAL(28,12) before the sum, so
    partial-aggregation order can't perturb the score (same posture
    as :func:`word_entropy`).

    Scale design: one (token)-keyed shuffle for the corpus counts
    (map-side combined), one (doc, token-join) shuffle to price the
    tokens, one (doc)-keyed rollup. The unigram table is never
    driver-side or broadcast — at web scale the vocabulary is
    billions of keys and stays distributed."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    )
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    priced = toks.join(counts, "w").crossJoin(F.broadcast(total))
    term = F.log2(F.col("c") / F.col("total")).cast("decimal(28,12)")
    return (
        priced.groupBy(id_col)
        .agg(
            # decimal-exact sum → ONE double division (decimal/decimal
            # division rules differ between engines; double/long don't)
            F.round(
                F.sum(term).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """TF-IDF keyword extraction [EXT]: the top-``k`` terms per document
    by smoothed tf-idf (``tf * (log2((N + 1) / (df + 1)) + 1)``) — the
    standard cheap distinguishing-term signal for corpus exploration,
    topic tagging, and near-dup triage on the terms that actually
    separate a document from the rest of the corpus.

    Determinism: the idf factor is snapped to DECIMAL(28,12) and the
    score accumulated exactly in decimal (same posture as
    :func:`word_entropy` / :func:`unigram_logprob_scores`), so ranking
    compares exact decimals, never raw doubles; ties break by term
    string ascending.

    Scale design: ONE (doc, token) groupBy for tf (map-side combined
    explode), document frequencies derived from that same relation by a
    token-keyed groupBy (no second corpus scan), a token-keyed join to
    price terms, and a doc-partitioned window for top-k. The term
    dictionary stays distributed — never collected or broadcast.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    )
    # tf feeds both the docfreq derivation and the pricing join, and
    # the two branches do NOT share their exchange (measured: the
    # tokenize+partial-agg subtree ran twice) — materialize the
    # compact (doc, word, tf) aggregate once. Unlike the exploded
    # token relation (corpus-token-sized, deliberately NOT
    # checkpointed here or in unigram_logprob_scores), tf is the
    # distinct doc-term relation — the natural spill-safe size.
    tf = (
        toks.groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    docfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.round(
        F.log2((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1)))
        + F.lit(1.0),
        12,
    ).cast("decimal(28,12)")
    scored = (
        tf.join(docfreq, "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "w",
            "tf",
            "df",
            (F.col("tf").cast("decimal(10,0)") * idf).alias("score_exact"),
        )
    )
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.partitionBy(id_col).orderBy(
            F.col("score_exact").desc(), F.col("w").asc()
        )
    )
    return (
        scored.withColumn("rank", rank)
        .where(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank"),
            F.col("w").alias("term"),
            F.col("tf"),
            F.col("df"),
            F.round(F.col("score_exact").cast("double"), 6).alias("tfidf"),
        )
    )


def count_min_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    width: int = 512,
    depth: int = 4,
    k: int = 10,
) -> DataFrame:
    """Count-min-sketch heavy hitters [EXT]: the top-``k`` tokens with
    their exact count AND their count-min estimate from a
    ``depth × width`` sketch — the mergeable fixed-size structure that
    answers "how often does X occur" over a 100 TB stream without a
    billion-key exact table (Cormode & Muthukrishnan 2005, public
    formulation). The estimate never undercounts (CMS one-sided error
    guarantee), surfaced as a checkable ``no_undercount`` column.

    Built as a pure DataFrame composition — no binary sketch blobs:

    - ONE corpus scan and ONE token shuffle build BOTH the exact top-k
      and the sketch (r12): tokens aggregate to a vocabulary-sized
      (w, count) relation once; each vocab entry then emits its
      ``depth`` (row, bucket) cells row-locally (portable sliced-sha256
      hashes, engine-reproducible) carrying its count, and a
      (row, bucket) SUM — over disjoint token groups, so bit-identical
      to counting occurrences directly — yields the sketch: a
      ≤ depth×width-row table, trivially mergeable across corpora by
      summing cells;
    - estimates come from joining candidate tokens' cells against the
      sketch and taking the per-token MIN over rows. The sketch side
      is bounded by constants (depth×width cells), so broadcasting it
      is safe at ANY corpus size — this is what a legitimate broadcast
      looks like, unlike fact-sized key sets."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("w"))

    def _cells(col):
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    (
                        F.conv(
                            F.substring(
                                F.sha2(F.concat(F.lit(f"cms{i}:"), col), 256),
                                1,
                                12,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % width
                    ).alias("bucket"),
                )
                for i in range(depth)
            ]
        )

    # ONE corpus scan + ONE token shuffle total (r12): the sketch is
    # derivable from the exact per-token counts — a cell's occurrence
    # count is the SUM of the counts of the (disjoint) tokens hashing
    # into it, bit-identical to counting occurrences directly. The old
    # shape scanned + tokenized + shuffled the whole corpus twice (once
    # for the sketch, once for the top-k); now the vocabulary-sized
    # (w, true_count) relation is built once and feeds both consumers —
    # localCheckpoint'd because the two branches do not share the
    # exchange in one plan (the q132/tfidf r11 finding; the module's
    # standard materialization trade, see the package docs on eager
    # materialization).
    wc = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .localCheckpoint()
    )
    sketch = (
        wc.select(F.explode(_cells(F.col("w"))).alias("c"), "true_count")
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("true_count").alias("cell"))
    )
    top = wc.orderBy(F.col("true_count").desc(), F.col("w").asc()).limit(k)
    probes = top.select(
        "w", "true_count", F.explode(_cells(F.col("w"))).alias("c")
    ).select("w", "true_count", F.col("c.row").alias("row"),
             F.col("c.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("w", "true_count")
        .agg(F.min("cell").alias("cms_estimate"))
    )
    return est.select(
        "w",
        "true_count",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("true_count")).alias("no_undercount"),
    )


def bigram_logprob_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-bigram conditional log-probability scoring [EXT]: each
    document's mean ``log2 P(w2 | w1)`` under the corpus's own bigram
    counts — one LM order above :func:`unigram_logprob_scores`, and a
    sharper fluency proxy (token-salad with plausible unigrams but
    impossible transitions scores very negative). Documents with fewer
    than 2 tokens have no bigrams and drop out, same contract as an
    n-gram LM.

    Determinism: per-bigram terms snap to DECIMAL(28,12) before the
    sum, ONE double division at the end.

    Scale design: bigram extraction is ROW-LOCAL (a sequence/transform
    fold over the token array — no window, no self-join); then one
    (w1, w2)-keyed count shuffle, prefix counts derived from the same
    relation by a (w1) groupBy (no second scan), two token-keyed joins
    to price, one doc rollup. The bigram table stays distributed —
    never collected or broadcast (web-scale bigram vocabularies are
    trillions of keys)."""
    toks_arr = tokens(F.col(text_col))
    n = F.size(toks_arr)
    # zip_with over a shifted slice, NOT transform(sequence)+element_at:
    # lambda-body references to the token array re-evaluate the whole
    # tokenization per element in Catalyst (see :func:`shingles`). The
    # zipped tail pads with NULL at the last position; slicing to n-1
    # drops it, and the n>=2 guard keeps 0/1-token docs bigram-free.
    bi_pairs = F.zip_with(
        toks_arr,
        F.slice(toks_arr, 2, F.greatest(n - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bi = F.when(n >= 2, F.slice(bi_pairs, 1, n - 1)).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )
    pairs = df.select(F.col(id_col), F.explode(bi).alias("b")).select(
        id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    # bg feeds the prefix derivation AND the pricing join; a
    # localCheckpoint here was A/B-measured a consistent ~5% LOSS at
    # bench SF (the bigram-table materialization round-trip costs more
    # than the duplicate partial-agg it saves), so unlike
    # tfidf_top_terms the aggregate stays lazy — revisit only with a
    # measured win at larger scale
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    prefix = bg.groupBy("w1").agg(F.sum("c2").alias("c1"))
    priced = pairs.join(bg, ["w1", "w2"]).join(prefix, "w1")
    term = F.log2(F.col("c2") / F.col("c1")).cast("decimal(28,12)")
    return priced.groupBy(id_col).agg(
        F.round(F.sum(term).cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_bigram_logprob"
        ),
        F.count(F.lit(1)).alias("n_bigrams"),
    )


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style intra-document repetition metrics (Rae et al. 2021
    "Scaling Language Models", public quality-filter recipe, Table A1):
    for n ∈ {2, 3}, the fraction of the document's characters contained
    in occurrences of its single most frequent word n-gram — the
    looping-text detector that length/stopword ratios (q32) miss.
    Returns ``(doc_id, n_chars, top_bigram, bigram_char_frac,
    top_trigram, trigram_char_frac)``; fractions are capped at 1.0
    (overlapping occurrences can over-count chars) and NULL for docs
    with no n-gram of that order.

    ONE corpus scan: both gram orders ride one tagged (k, gram) array
    built row-locally (a per-order pipeline would re-scan and
    re-tokenize the corpus once per order — no exchange sits between
    the scan and the explode, so ReuseExchange can't share it; on a
    small local corpus the parallel per-order branches can edge out
    the single serial chain, but at warehouse scale scan+tokenize
    I/O dominates and runs once here instead of three times). Then
    one (doc, k, gram) count shuffle and ONE deterministic per-doc
    min_by aggregate (r12 — cnt DESC, gram ASC tie-break, identical to
    the former mode window but without its exchange + sort); the doc
    spine (for gram-less docs) is a direct 2-column projection of the
    source, never a second tokenize."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    # materialize the token array behind a projection BEFORE building
    # grams: word_kgrams references its input many times (acc chain +
    # shifted slices), and an inlined tokens() expression would be
    # re-evaluated per reference — the transform(sequence) trap the
    # shingles docstring documents (measured 6× on this operator)
    base = df.select(
        F.col(id_col).alias("id"),
        F.length(norm).alias("n_chars"),
        tokens(F.col(text_col)).alias("ws"),
    )
    tagged = F.concat(
        F.transform(
            word_kgrams(F.col("ws"), 2),
            lambda g: F.struct(F.lit(2).alias("k"), g.alias("gram")),
        ),
        F.transform(
            word_kgrams(F.col("ws"), 3),
            lambda g: F.struct(F.lit(3).alias("k"), g.alias("gram")),
        ),
    )
    ex = base.select(
        "id", "n_chars", F.explode_outer(tagged).alias("p")
    ).select("id", "n_chars", "p.k", "p.gram")
    counts = (
        ex.filter(F.col("gram").isNotNull())
        .groupBy("id", "n_chars", "k", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    frac = F.round(
        F.least(
            F.col("cnt") * F.length("gram") / F.col("n_chars"), F.lit(1.0)
        ),
        6,
    )

    # per-(doc, k) mode + per-doc rollup in ONE aggregate (r12):
    # min_by over ord = struct(-cnt, gram) picks cnt DESC then gram ASC
    # — exactly the old mode-window's ordering — and ord is UNIQUE per
    # row within a doc (gram is a grouping key of `counts` and ord
    # embeds it), so the pick is deterministic; rows of the other gram
    # order get a NULL ord, which min_by ignores (a doc with no gram of
    # an order yields NULL, as before). This replaces the (id, k)
    # window exchange + full sort of the gram-count relation AND the
    # separate (id) rollup exchange with one partial-aggregable hash
    # aggregate: 3 exchanges + 1 sort -> 2 exchanges + 0 sorts, and the
    # second exchange now carries <= 4 picked rows per doc per map
    # partition instead of every distinct gram.
    def _pick(order: int, val):
        cond = F.col("k") == order
        return F.min_by(
            F.when(cond, val),
            F.when(
                cond,
                F.struct(
                    (-F.col("cnt")).alias("nc"), F.col("gram").alias("g")
                ),
            ),
        )

    top = counts.groupBy("id").agg(
        _pick(2, F.col("gram")).alias("top_bigram"),
        _pick(2, frac).alias("bigram_char_frac"),
        _pick(3, F.col("gram")).alias("top_trigram"),
        _pick(3, frac).alias("trigram_char_frac"),
    )
    # doc spine (keeps gram-less docs): a direct 2-column projection
    # of the source — deriving it from `ex` would duplicate the whole
    # tokenize+explode subtree just to run distinct over it (Catalyst
    # clones the unshared subtree; exchange reuse can't help pre-agg)
    spine = df.select(
        F.col(id_col).alias("id"), F.length(norm).alias("n_chars")
    )
    return spine.join(top, "id", "left").select(
        F.col("id").alias(id_col),
        "n_chars",
        "top_bigram", "bigram_char_frac",
        "top_trigram", "trigram_char_frac",
    )
