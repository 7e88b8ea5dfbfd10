"""Curation-tier operator semantics (sequence packing, mixture
sampling, decontamination) — the corpus-assembly steps behind
q93–q95."""

from __future__ import annotations

import pytest

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


# ---------------------------------------------------------------------------
# Property tests vs Python reference models (hypothesis)
# ---------------------------------------------------------------------------

import hashlib

from hypothesis import given, settings, strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

_doc_strategy = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1", "s2"]),
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12),
    ),
    min_size=1,
    max_size=12,
)


def _mk_docs(spark, docs):
    return spark.createDataFrame(
        [(i, src, " ".join(words)) for i, (src, words) in enumerate(docs)],
        "doc_id long, source string, text string",
    )


@settings(max_examples=10, deadline=None)
@given(_doc_strategy)
@pytest.mark.slow
def test_pack_sequences_matches_python_model(spark, docs):
    budget = 16
    got = {
        (r.source, r.seq_id): (r.n_docs, r.seq_tokens)
        for r in curation.pack_sequences(
            _mk_docs(spark, docs), budget_tokens=budget
        ).collect()
    }
    # reference: stream docs per shard in doc_id order, place each at
    # floor(cum_before / budget)
    ref = {}
    cum = {}
    for i, (src, words) in enumerate(docs):
        seq = cum.get(src, 0) // budget
        n, tok = ref.get((src, seq), (0, 0))
        ref[(src, seq)] = (n + 1, tok + len(words))
        cum[src] = cum.get(src, 0) + len(words)
    assert got == ref


@settings(max_examples=10, deadline=None)
@given(_doc_strategy)
@pytest.mark.slow
def test_mixture_sample_matches_python_model(spark, docs):
    rows = curation.mixture_sample(_mk_docs(spark, docs)).collect()
    # reference weights + portable-hash keep decision (hashlib sha256
    # reproduces Spark's sha2 exactly)
    by_src = {}
    for i, (src, words) in enumerate(docs):
        by_src.setdefault(src, []).append((i, len(words)))
    total = sum(t for docs_ in by_src.values() for _, t in docs_)
    n_sources = len(by_src)
    for r in rows:
        toks = by_src[r.source]
        source_tokens = sum(t for _, t in toks)
        weight = min(1.0, (total / n_sources) / source_tokens)
        kept = [
            (i, t) for i, t in toks
            if int(hashlib.sha256(str(i).encode()).hexdigest()[:8], 16) % 10000
            < int(weight * 10000)
        ]
        assert r.n_docs == len(toks)
        assert r.source_tokens == source_tokens
        assert r.weight == round(weight, 6)
        assert r.n_sampled == len(kept)
        assert r.sampled_tokens == sum(t for _, t in kept)


@settings(max_examples=10, deadline=None)
@given(_doc_strategy, st.integers(min_value=1, max_value=4))
@pytest.mark.slow
def test_decontaminate_matches_python_model(spark, docs, chunk_words):
    df = _mk_docs(spark, docs)
    train = df.filter(F.col("doc_id") % 3 != 0)
    test = df.filter(F.col("doc_id") % 3 == 0)

    def chunks(words):
        return {
            " ".join(words[i : i + chunk_words])
            for i in range(0, len(words), chunk_words)
        }

    test_chunks = set()
    for i, (_, words) in enumerate(docs):
        if i % 3 == 0:
            test_chunks |= chunks(words)
    expected = {
        i: bool(chunks(words) & test_chunks)
        for i, (_, words) in enumerate(docs)
        if i % 3 != 0
    }
    got = {
        r.doc_id: r.contaminated
        for r in curation.decontaminate(train, test, chunk_words=chunk_words).collect()
    }
    assert got == expected


def test_stratified_sample_deterministic_and_rowlocal(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    frac = {"1-URGENT": 0.5, "2-HIGH": 0.0}
    a = curation.stratified_sample(
        o, "o_orderpriority", frac, id_col="o_orderkey", default_fraction=0.1
    )
    b = curation.stratified_sample(
        o.repartition(7), "o_orderpriority", frac,
        id_col="o_orderkey", default_fraction=0.1,
    )
    ka = sorted(r.o_orderkey for r in a.select("o_orderkey").collect())
    kb = sorted(r.o_orderkey for r in b.select("o_orderkey").collect())
    # identical sample regardless of partitioning (sampleBy would differ)
    assert ka == kb and len(ka) > 0
    # a 0.0 stratum keeps nothing
    assert a.filter(F.col("o_orderpriority") == "2-HIGH").count() == 0
    # no shuffle in the sampling plan itself
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_expectations_gate_drop_warn_fail(spark):
    from databricks_delta_lake_migration_spark.quality import (
        Expectation,
        ExpectationFailed,
        apply_expectations,
        enforce_expectations,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 20.0)],
        "id long, amount double",
    )
    rules = [
        Expectation("amount_pos", "amount > 0", "drop"),
        Expectation("id_small", "id < 4", "warn"),
    ]
    clean, metrics = apply_expectations(df, rules)
    # drop removes the negative AND the NULL (null-hostile gate);
    # warn keeps its violator
    assert sorted(r.id for r in clean.collect()) == [1, 4]
    m = {r.rule: (r.violations, r.action) for r in metrics.collect()}
    assert m == {"amount_pos": (2, "drop"), "id_small": (1, "warn")}

    # fail-action aborts when violated...
    import pytest as _pytest

    with _pytest.raises(ExpectationFailed):
        enforce_expectations(
            df, [Expectation("amount_pos", "amount > 0", "fail")]
        )
    # ...and passes through when satisfied
    ok, rows = enforce_expectations(
        df, [Expectation("has_id", "id IS NOT NULL", "fail")]
    )
    assert ok.count() == 4 and rows[0]["violations"] == 0

    with _pytest.raises(ValueError):
        Expectation("bad", "1=1", "quarantine")


def test_expectations_metrics_single_pass(spark):
    """All rule metrics must come from ONE aggregate over one scan —
    the reference's one-action-per-check shape is the anti-pattern."""
    from databricks_delta_lake_migration_spark.quality import (
        Expectation,
        expectations_report,
    )

    o = spark.read.parquet(f"{SF}/orders.parquet")
    rules = [
        Expectation("p", "o_totalprice > 0", "drop"),
        Expectation("s", "o_orderstatus IN ('O','F','P')", "warn"),
        Expectation("d", "o_orderdate IS NOT NULL", "fail"),
    ]
    plan = (
        expectations_report(o, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 1


def test_chunk_documents_windows_and_edges(spark):
    from databricks_delta_lake_migration_spark.operators import textstats

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 toks → 2 chunks
            (2, "short doc"),                            # 1 chunk
            (3, ""),                                     # no chunks
        ],
        "doc_id long, text string",
    )
    out = textstats.chunk_documents(docs, chunk_tokens=8, overlap_tokens=4)
    rows = {(r.doc_id, r.chunk_id): (r.chunk_text, r.n_chunk_tokens) for r in out.collect()}
    assert rows[(1, 0)] == (" ".join(f"w{i}" for i in range(8)), 8)
    # stride 4: second window starts at w4, runs to the end (6 tokens)
    assert rows[(1, 1)] == (" ".join(f"w{i}" for i in range(4, 10)), 6)
    # window 2 would start at w8 < 10 → a third, short chunk
    assert rows[(1, 2)] == ("w8 w9", 2)
    assert rows[(2, 0)] == ("short doc", 2)
    # empty text follows the codebase token convention (split('') →
    # ['']): one empty chunk, same as the DuckDB oracle twin
    assert rows[(3, 0)] == ("", 1)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        textstats.chunk_documents(docs, chunk_tokens=4, overlap_tokens=4)


def test_shard_shuffle_is_a_deterministic_permutation(spark):
    docs = spark.createDataFrame(
        [(i, "s", f"doc {i}") for i in range(200)],
        "doc_id long, source string, text string",
    )
    out = curation.shard_shuffle(docs, n_shards=4).collect()
    # every document appears exactly once, schema keeps input columns
    assert sorted(r.doc_id for r in out) == list(range(200))
    # positions are contiguous 1..n within each shard (a total order)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(4))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # rerun is byte-identical; a different seed is a different permutation
    again = curation.shard_shuffle(docs, n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = curation.shard_shuffle(docs, n_shards=4, seed="s2").collect()
    assert {(r.doc_id, r.shard, r.pos) for r in other} != {
        (r.doc_id, r.shard, r.pos) for r in out
    }
    # the shuffle decorrelates input order: within a shard, consecutive
    # positions are not consecutive ids
    first = next(iter(by_shard.values()))
    assert len(first) > 10


def test_shard_shuffle_window_is_per_shard(spark):
    """The ordering window must partition by shard — a global sort
    would serialize 100 TB through one task."""
    docs = spark.createDataFrame(
        [(i, "s", "t") for i in range(10)],
        "doc_id long, source string, text string",
    )
    plan = curation.shard_shuffle(docs)._jdf.queryExecution().toString()
    assert "hashpartitioning(shard" in plan


def test_quality_top_fraction_rank_cut_and_per_source(spark):
    # source A: 10 docs with increasing repetition (decreasing entropy);
    # source B: 2 docs — the cut applies within each source separately
    rows = [(i, "A", " ".join(f"w{j}" for j in range(10 - i)) + " x" * i)
            for i in range(10)]
    rows += [(100, "B", "a b c d"), (101, "B", "a a a a")]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = curation.quality_top_fraction(docs, pct=70).collect()
    by_source = {}
    for r in out:
        by_source.setdefault(r.source, set()).add(r.doc_id)
    # floor semantics: 70% of 10 = 7 docs, 70% of 2 = 1 doc
    assert len(by_source["A"]) == 7
    assert len(by_source["B"]) == 1
    # survivors are the highest-entropy docs; ranks are 1..k
    ranks = sorted(r.quality_rank for r in out if r.source == "A")
    assert ranks == list(range(1, 8))
    # the all-repetition doc (zero entropy) never survives
    assert 9 not in by_source["A"]
    # window must partition by source, not global
    plan = curation.quality_top_fraction(docs)._jdf.queryExecution().toString()
    assert "hashpartitioning(source" in plan


def test_group_consistent_split_no_leakage_and_fractions(spark):
    """Every group lands in exactly one split; assignment is a pure
    function of the group key (rerun-identical); fractions must sum
    to 1."""
    import pytest

    from databricks_delta_lake_migration_spark.operators.curation import (
        group_consistent_split,
    )
    from pyspark.sql import functions as F

    rows = [(i, f"g{i % 40}") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = group_consistent_split(df, "grp")
    per_group = (
        out.groupBy("grp")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r.n_splits == 1 for r in per_group)
    a = {(r.id, r.split) for r in out.collect()}
    b = {(r.id, r.split) for r in group_consistent_split(df, "grp").collect()}
    assert a == b
    splits = {r.split for r in out.collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    with pytest.raises(ValueError, match="sum to 1"):
        group_consistent_split(df, "grp", splits=[("a", 0.5), ("b", 0.4)])


def test_group_consistent_split_boundary_rounding(spark):
    """Review r8 fix: boundaries round rather than truncate —
    0.57*10000 is 5699.999… in floats and int() would hand bucket
    5699 to the wrong split. Verified against an independent Python
    recomputation of the same portable hash."""
    import hashlib

    from databricks_delta_lake_migration_spark.operators.curation import (
        group_consistent_split,
    )

    groups = [f"g{i}" for i in range(500)]
    df = spark.createDataFrame([(g,) for g in groups], "grp string")
    got = {
        r.grp: r.split
        for r in group_consistent_split(
            df, "grp", splits=[("train", 0.57), ("test", 0.43)]
        ).collect()
    }

    def expected(g):
        b = int(hashlib.sha256(g.encode()).hexdigest()[:8], 16) % 10_000
        return "train" if b < 5700 else "test"

    assert got == {g: expected(g) for g in groups}


def test_winsorize_clips_at_exact_group_quantiles(spark):
    """11 values 0..100 per group: p05/p95 interpolate to 5/95; the
    tails clip, interior rows pass through; second group unaffected."""
    from databricks_delta_lake_migration_spark.operators.curation import (
        winsorize,
    )
    import pytest

    rows = [("g1", float(v)) for v in range(0, 101, 10)] + [
        ("g2", 1000.0), ("g2", 2000.0), ("g2", 3000.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, ["g"], "v", lower=0.05, upper=0.95)
    g1 = sorted(r.v_w for r in out.filter("g = 'g1'").collect())
    assert g1[0] == 5.0 and g1[-1] == 95.0       # tails clipped
    assert 50.0 in g1                            # interior untouched
    g2 = {r.v: r.v_w for r in out.filter("g = 'g2'").collect()}
    assert g2[2000.0] == 2000.0
    # p05/p95 of {1000,2000,3000} interpolate to 1100 / 2900 (float
    # interpolation: 3000-0.05*2000 carries an ulp)
    assert g2[1000.0] == 1100.0
    assert abs(g2[3000.0] - 2900.0) < 1e-9
    with pytest.raises(ValueError, match="lower < upper"):
        winsorize(df, ["g"], "v", lower=0.9, upper=0.1)


def test_winsorize_bounds_join_is_hint_free(spark):
    """VERDICT r9 #3: the group-bounds join must carry NO forced
    broadcast hint (group cardinality is unbounded — per-entity groups
    would OOM a forced broadcast); AQE picks the strategy, matching
    robust_outliers. Values are unchanged by the strategy."""
    from databricks_delta_lake_migration_spark.operators.curation import (
        winsorize,
    )

    rows = [("g1", float(v)) for v in range(0, 101, 10)] + [
        ("g2", 1000.0), ("g2", 2000.0), ("g2", 3000.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, ["g"], "v", lower=0.05, upper=0.95)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in plan
    g1 = sorted(r.v_w for r in out.filter("g = 'g1'").collect())
    assert g1[0] == 5.0 and g1[-1] == 95.0


def test_winsorize_preserves_nulls_and_null_groups(spark):
    """Review r8: NULL measurements stay NULL (not fabricated at p05),
    NULL-group rows survive the bound join, and the operator composes
    (bound names are value-scoped)."""
    from databricks_delta_lake_migration_spark.operators.curation import (
        winsorize,
    )

    rows = [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", None),
            (None, 10.0), (None, 20.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, ["g"], "v", lower=0.25, upper=0.75)
    assert out.count() == 6  # row-preserving incl. NULL group
    nulls = out.filter("v IS NULL").collect()
    assert len(nulls) == 1 and nulls[0].v_w is None
    ng = sorted(r.v_w for r in out.filter("g IS NULL").collect())
    assert ng == [12.5, 17.5]  # clipped within the NULL group's bounds
    # composability: winsorize a second column without name collisions
    df2 = df.withColumn("u", F.col("v") * 2)
    both = winsorize(winsorize(df2, ["g"], "v"), ["g"], "u")
    assert "v_w" in both.columns and "u_w" in both.columns


def test_winsorize_approx_mode_rank_bounded(spark):
    """VERDICT r8 #6: approx=True swaps exact percentile for the
    approx_percentile sketch (bounded map-side state — the 100 TB
    pass-1). Contract checked per group: each approx bound is an
    ACTUAL group value whose exact rank is within n/approx_accuracy
    (+1 for the exact pass's interpolation) of the requested quantile
    rank, and clipping with those bounds is the plain least/greatest
    clip."""
    from databricks_delta_lake_migration_spark.operators.curation import (
        winsorize,
    )

    rows = [("a", float(v)) for v in range(1000)] + [
        ("b", float(3 * v)) for v in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    acc = 10_000
    out = winsorize(
        df, ["g"], "v", lower=0.05, upper=0.95,
        approx=True, approx_accuracy=acc,
    ).collect()
    vals = {"a": sorted(float(v) for g, v in rows if g == "a"),
            "b": sorted(float(v) for g, v in rows if g == "b")}
    bounds = {r.g: (r.v__lo, r.v__hi) for r in out}
    for g, (lo, hi) in bounds.items():
        n = len(vals[g])
        tol = n / acc + 1
        assert lo in vals[g] and hi in vals[g]  # sketch returns data
        assert abs(vals[g].index(lo) - 0.05 * (n - 1)) <= tol
        assert abs(vals[g].index(hi) - 0.95 * (n - 1)) <= tol
    for r in out:
        lo, hi = bounds[r.g]
        assert r.v_w == min(max(r.v, lo), hi)


def test_corpus_filter_top_bigram_matches_brute_force(spark):
    """r13 gate for the O(n log n) top-bigram rewrite (sorted run-length
    fold replacing the per-distinct-bigram filter): counts and the
    first-hit-wins drop reason must match a brute-force Python model,
    including the empty / 1-token / tie / all-identical edges."""
    from collections import Counter

    from databricks_delta_lake_migration_spark.operators.textstats import (
        corpus_filter,
    )

    texts = [
        "",                                     # empty → 0 tokens
        "word",                                 # 1 token → no bigrams
        "spam ham spam ham spam ham spam ham",  # dominant bigrams
        "aa bb aa bb cc dd cc dd",              # tie between two bigrams
        "all words here are quite distinct tokens indeed",
        "x " * 50,                              # low diversity + repetition
        "@@@@ #### $$$$ %%%%",                  # symbol heavy
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in corpus_filter(df).collect()}
    for i, t in enumerate(texts):
        toks = " ".join(t.lower().split()).split(" ")
        bigrams = (
            [f"{a} {b}" for a, b in zip(toks, toks[1:])] if len(toks) >= 2 else []
        )
        top = max(Counter(bigrams).values()) if bigrams else 0
        expect = round(top / max(len(bigrams), 1), 6)
        assert float(out[i].top_bigram_frac) == expect, (i, t)


def test_package_shipping_is_thread_safe(spark):
    """r13: concurrent driver threads (the threaded parity harness,
    guide §2.6 job overlap) must not race the package-zip build — the
    old check-then-write could addPyFile a half-written zip, wedging
    every later executor fetch with 'exists and does not match
    contents'. Hammer the cold path from 8 threads and prove the zip
    is complete and valid."""
    import os
    import tempfile
    import zipfile
    from concurrent.futures import ThreadPoolExecutor

    from databricks_delta_lake_migration_spark.queries import registry

    zpath = os.path.join(
        tempfile.gettempdir(),
        f"databricks_delta_lake_migration_spark-{os.getpid()}.zip",
    )
    if os.path.exists(zpath):
        os.remove(zpath)
    registry._SHIPPED.clear()
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(
            lambda _: registry.ensure_package_shipped(spark), range(8)
        ))
    with zipfile.ZipFile(zpath) as z:
        assert z.testzip() is None
        assert any(n.endswith("queries/registry.py") for n in z.namelist())
