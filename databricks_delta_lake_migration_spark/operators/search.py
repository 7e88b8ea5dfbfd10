"""Full-text retrieval [EXT]: BM25-ranked keyword search over a
document corpus — the lexical-retrieval half of a RAG / training-data
pipeline (the dense half is ``operators.similarity``). The reference
engine has no search surface at all; this derives one from the public
Okapi BM25 formulation (Robertson & Zaragoza 2009).

Spark-first shape: the "inverted index" IS a DataFrame — a per-doc
aggregate over one explode pass yields doc lengths AND the query
terms' tfs together (r12: one corpus tokenize, one doc-keyed shuffle),
then a row-local unpivot recovers the (doc, term, tf) relation — the
same relation :func:`textstats.tfidf_top_terms` builds, pruned to the
query's terms. Document frequencies come from that same relation (no
second corpus scan), and ranking ends in a TakeOrderedAndProject. Per-term partial scores are snapped to
DECIMAL(28,12) before the per-doc sum, so cross-engine hashes never
flap on float accumulation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25:

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    with the positive Lucene-style ``idf(t) = ln(1 + (N−df+0.5)/(df+0.5))``.

    Determinism: idf/avgdl derive from exact integer counts; each
    (doc, term) partial score rounds to 12 dp and accumulates in exact
    decimal; final scores round to 6 dp and ties break by ``id_col``
    ascending, so the top-k cut is stable in any engine.

    Scale: one explode+groupBy builds (doc, term, tf) and doc lengths;
    df is a term-keyed re-aggregation of that relation; the ≤|query|
    surviving term rows join back term-keyed; N/avgdl ride along as a
    broadcast 1-row aggregate. No dictionary is ever collected. For a
    standing search service, persist the tf relation bucketed by term
    (D24 bucketing seam) and this becomes a pure index lookup.
    """
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    # dedup preserves current semantics (the old (doc, w) groupBy keyed
    # out duplicate query terms) and keeps the unpivot 1 row per term
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    )
    # ONE corpus tokenize + ONE doc-keyed shuffle for BOTH doc lengths
    # and per-query-term tfs (r12: the former tf/dl branches each
    # re-scanned and re-tokenized the corpus): tf_t = Σ(w = t) inside
    # the per-doc aggregate — identical to counting the term-filtered
    # rows — with the whole-vocabulary frequency table still never
    # built (≤|query| conditional counters per doc; a served index
    # would persist the unpruned tf relation bucketed by term).
    # Checkpointed (module materialization discipline): it feeds the
    # hits unpivot AND the corpus-constants aggregate.
    per_doc = (
        toks.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum(
                    F.when(F.col("w") == t, F.lit(1)).otherwise(F.lit(0))
                ).alias(f"__tf{i}")
                for i, t in enumerate(terms)
            ],
        )
        .localCheckpoint(eager=False)
    )
    # row-local unpivot to (doc, dl, term, tf>0) — carrying dl here
    # removes the former tf ⋈ dl join entirely
    tf = per_doc.select(
        F.col(id_col),
        F.col("dl"),
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("w"),
                            F.col(f"__tf{i}").cast("long").alias("tf"),
                        )
                        for i, t in enumerate(terms)
                    ]
                ),
                lambda s: s["tf"] > 0,
            )
        ).alias("p"),
    ).select(id_col, "dl", "p.w", "p.tf")
    docfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    # N and avgdl from ONE aggregate of the per-doc relation — a
    # separate df.count() would re-run the corpus scan. per_doc has one
    # row per doc with non-NULL text (empty text still tokenizes to
    # [""], so it counts); NULL-text docs are outside the searchable
    # corpus.
    corpus = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )

    hits = tf.join(F.broadcast(docfreq), "w").crossJoin(F.broadcast(corpus))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf") * (F.lit(k1) + 1.0)
        / (F.col("tf") + F.lit(k1) * (1.0 - b + F.lit(b) * F.col("dl") / avgdl))
    )
    part = F.round(idf * tf_part, 12).cast("decimal(28,12)")
    return (
        hits.groupBy(id_col)
        .agg(
            F.round(F.sum(part), 6).cast("double").alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )
