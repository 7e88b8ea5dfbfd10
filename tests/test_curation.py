"""Curation-tier operator semantics (sequence packing, mixture
sampling, decontamination) — the corpus-assembly steps behind
q93–q95."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_delta_lake_migration_spark.operators import curation

SF = "/root/testdata/sf0.001"


def test_pack_sequences_chunks_the_token_stream(spark):
    # one shard, 5 docs of 100 tokens each, budget 256:
    # cumulative starts 0/100/200/300/400 → seqs 0,0,0,1,1
    docs = spark.createDataFrame(
        [(i, "s", " ".join(["w"] * 100)) for i in range(5)],
        "doc_id long, source string, text string",
    )
    got = {
        (r.source, r.seq_id): (r.n_docs, r.seq_tokens)
        for r in curation.pack_sequences(docs, budget_tokens=256).collect()
    }
    assert got == {("s", 0): (3, 300), ("s", 1): (2, 200)}


def test_pack_sequences_window_is_per_shard(spark):
    """The packing window must partition by shard — a global (empty
    partitioning) window would serialize 100 TB through one task."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        curation.pack_sequences(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan


def test_mixture_sample_weights_and_determinism(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {tuple(r) for r in curation.mixture_sample(docs).collect()}
    b = {tuple(r) for r in curation.mixture_sample(docs).collect()}
    assert a == b  # portable-hash sampling is rerun-stable
    rows = {r.source: r for r in curation.mixture_sample(docs).collect()}
    assert all(0 < r.weight <= 1 for r in rows.values())
    assert all(r.n_sampled <= r.n_docs for r in rows.values())
    # at least one over-represented source was down-sampled
    assert any(r.n_sampled < r.n_docs for r in rows.values())


def test_decontaminate_flags_planted_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unrelated tail words here"),
            (2, "completely different content with no shared chunks"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "alpha beta gamma delta something else entirely now")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.contaminated
        for r in curation.decontaminate(train, test, chunk_words=4).collect()
    }
    assert got == {1: True, 2: False}


def test_decontaminate_broadcasts_eval_side(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    test = docs.filter(F.col("doc_id") % 97 == 0)
    plan = (
        curation.decontaminate(train, test, chunk_words=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
