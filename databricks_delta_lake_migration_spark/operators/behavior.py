"""Behavioral / event-sequence analytics [EXT]: sessionization, funnel
conversion, cohort retention, and transition matrices over an event
stream — the product-analytics tier every warehouse team rebuilds by
hand on top of the reference's event tables (reference surface: the
plain event rollups in ``src/data_processor.py`` aggregate_data /
time-window helpers; these operators generalize them to ordered
per-entity sequence semantics).

Scale discipline shared by every operator here:

- ONE hash shuffle on the entity key (user), then all ordered logic
  runs as window functions over that single sort — lag/lead, running
  sums, and conditional mins reuse the same (partitionBy, orderBy)
  spec, so Catalyst plans one Exchange + one Sort with stacked Window
  nodes, never one shuffle per step.
- The final rollups group on low-cardinality keys (session id, step,
  cohort, type-pair) — map-side partial aggregation shrinks them
  before their shuffle.
- Nothing is ever collected: outputs are aggregate-sized DataFrames.
- Ties are broken by an explicit id column so results are
  deterministic under any partitioning (never partition-order-lucky).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts whenever the gap
    to the user's previous event exceeds ``gap_seconds``. Returns one
    row per (user, session): ``session_id`` (1-based per user, in time
    order), ``n_events``, ``session_start``, ``session_end``,
    ``duration_sec``.

    Gaps compare in epoch MICROSECONDS (``unix_micros``) — exact long
    arithmetic, no double rounding of timestamps (the same trap as
    range-join bin ids).

    Two shuffles total, both user-keyed: the session-boundary window
    (lag + running sum share ONE exchange/sort) and the per-session
    rollup; at 100 TB each is an ordinary hash exchange on the user
    key, with AQE skew-split handling hot users.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_sid = events.withColumn(
        "session_id", F.sum(is_new).over(run)
    )
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .withColumn(
            "duration_sec",
            F.round(
                (
                    F.unix_micros("session_end")
                    - F.unix_micros("session_start")
                )
                / F.lit(1_000_000.0),
                6,
            ),
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel conversion: for each user, step k counts only if
    an event of ``steps[k]`` occurs AT OR AFTER the user's step-(k-1)
    time (inclusive ``>=`` — simultaneous events convert). Returns one
    row per step: ``step`` (1-based), ``step_name``, ``n_users``, and
    ``conversion_pct`` relative to step 1 (rounded 4 dp).

    ONE shuffle: every per-step "first qualifying timestamp" is an
    unbounded min-window over the same user partition, so the k
    windows stack on a single Exchange+Sort; the final step counts
    aggregate a per-user distinct relation of k timestamps.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    df = events
    prev_t = None
    tcols = []
    for i, s in enumerate(steps):
        cond = F.col(type_col) == s
        if prev_t is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev_t))
        t = f"__funnel_t{i}"
        df = df.withColumn(
            t, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev_t = t
        tcols.append(t)
    per_user = df.select(user_col, *tcols).distinct()
    counts = per_user.agg(
        *[
            F.count(F.col(t)).cast("long").alias(f"n{i}")
            for i, t in enumerate(tcols)
        ]
    )
    # k step rows out of one 1-row aggregate: posexplode keeps this a
    # single job instead of k unioned scans
    pairs = F.posexplode(
        F.array(*[F.col(f"n{i}") for i in range(len(steps))])
    )
    step_names = F.array(*[F.lit(s) for s in steps])
    return (
        counts.select(
            pairs.alias("idx", "n_users"),
            step_names.alias("__names"),
            F.col("n0").alias("__base"),
        )
        .select(
            (F.col("idx") + 1).cast("int").alias("step"),
            F.element_at("__names", F.col("idx") + 1).alias("step_name"),
            F.col("n_users"),
            F.round(F.col("n_users") / F.col("__base"), 4).alias(
                "conversion_pct"
            ),
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "year",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the ``period`` of
    their FIRST activity; each (cohort, offset) cell counts distinct
    users active ``offset`` periods after their cohort period.
    ``retention_pct`` normalizes by the cohort's offset-0 size
    (rounded 4 dp).

    ONE user-keyed shuffle assigns cohorts (unbounded min-window);
    the matrix itself is a tiny two-key aggregate, and the offset-0
    normalizer is a window over that aggregate — never a self-join
    back to the fact table.
    """
    if period == "year":
        p = F.year(F.col(ts_col))
    elif period == "month":
        p = (F.year(F.col(ts_col)) * 12 + F.month(F.col(ts_col)) - 1)
    else:
        raise ValueError(f"unsupported period {period!r}")
    cohorted = df.select(
        F.col(user_col).alias("__u"), p.alias("__p")
    ).withColumn("cohort", F.min("__p").over(Window.partitionBy("__u")))
    cells = (
        cohorted.groupBy(
            "cohort", (F.col("__p") - F.col("cohort")).alias("period_offset")
        )
        .agg(F.countDistinct("__u").alias("n_active"))
    )
    base = Window.partitionBy("cohort")
    return cells.select(
        F.col("cohort").cast("int").alias("cohort"),
        F.col("period_offset").cast("int").alias("period_offset"),
        "n_active",
        F.round(
            F.col("n_active")
            / F.max(
                F.when(F.col("period_offset") == 0, F.col("n_active"))
            ).over(base),
            4,
        ).alias("retention_pct"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    each (event_type, next event_type within the same user) pair, the
    observed count and the row-normalized transition probability
    (rounded 6 dp). A user's last event has no successor and drops out.

    ONE user-keyed window shuffle (lead), then a low-cardinality
    (type, type) aggregate; the row normalizer is a window over the
    k×k matrix itself.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    pairs = (
        events.withColumn("next_type", F.lead(type_col).over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col(type_col).alias("from_type"), "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        F.col("next_type").alias("to_type"),
        "n",
        F.round(F.col("n") / F.sum("n").over(row), 6).alias("prob"),
    )


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Gaps-and-islands interval merge: collapse OVERLAPPING or
    touching [start, end] intervals per key into maximal islands — the
    validity-window consolidation step (coverage analysis, SLA uptime,
    feature-availability windows) that sessionization's point-event
    logic can't express.

    Algorithm (one window pass): sort intervals by start; an interval
    starts a new island iff its start exceeds the running MAX of all
    previous ends (not just the previous row's — an early long interval
    can swallow several later short ones); island id is the running sum
    of those flags. Interval bounds compare as exact epoch micros for
    timestamp columns.

    ONE key-partitioned window shuffle + one (key, island) rollup —
    the same two-exchange shape as :func:`sessionize`.
    """
    is_ts = df.schema[start_col].dataType.typeName() in (
        "timestamp", "timestamp_ntz",
    )
    s = F.unix_micros(F.col(start_col)) if is_ts else F.col(start_col)
    e = F.unix_micros(F.col(end_col)) if is_ts else F.col(end_col)
    order = Window.partitionBy(*key_cols).orderBy(s.asc(), e.asc())
    prev_max_end = F.max(e).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_end.isNull() | (s > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(new_island).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("island", island)
        .groupBy(*key_cols, "island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )


def rfm_segments(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    amount_col: str,
    n_tiles: int = 4,
) -> DataFrame:
    """RFM segmentation [EXT]: per entity, Recency (days since last
    activity, against the corpus max date so the cut is reproducible),
    Frequency (event count) and Monetary (exact decimal amount sum),
    each quartiled into 1..n_tiles scores — the classic behavioral
    customer-value grid. Score ties break by entity id so segment
    membership is deterministic and engine-portable.

    R score is INVERTED (most recent = highest score) to match F/M
    polarity: segment "444" is the best customer in every letter.

    NULL handling (ADVICE r8): an entity whose every ``amount_col`` is
    NULL has NULL monetary; one whose every ``ts_col`` is NULL has
    NULL recency. NULL ordering is PINNED to the WORST tile in both —
    NULLS FIRST on the ASC monetary sort AND on the DESC recency sort
    (the inverted-R polarity makes oldest-first = nulls-first) —
    rather than left to engine defaults, which diverge (Spark ASC =
    NULLS FIRST, DuckDB ASC = NULLS LAST). Oracles must mirror the
    pins (q203 does).

    Scale: ONE entity-keyed aggregate (map-side combined), then three
    ntile windows over the ENTITY-level relation — a per-customer
    rollup thousands of times smaller than the event table; the
    un-partitioned windows sort entities, not events. (If even the
    entity relation outgrows a sort, swap ntile for percentile-bucket
    joins against approx quantiles — documented, not default, because
    ntile's exact remainder semantics are what the oracle checks.)"""
    day = F.to_date(ts_col)
    ent = df.groupBy(entity_col).agg(
        F.max(day).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(amount_col).cast("decimal(18,4)")).alias("monetary"),
    )
    horizon = ent.agg(F.max("last_day").alias("h"))
    ent = ent.crossJoin(F.broadcast(horizon)).withColumn(
        "recency_days", F.datediff(F.col("h"), F.col("last_day")).cast("long")
    )
    # NULL pins are explicit even where they match Spark defaults so
    # the cross-engine contract is visible at the sort site
    wr = Window.orderBy(
        # NULL recency (entity with no parsable ts) = never seen =
        # OLDEST: under the inverted-R DESC sort, oldest-first means
        # NULLS FIRST, so the NULL entity takes the WORST r-tile
        # (review r9: desc_nulls_last would have scored it BEST)
        F.col("recency_days").desc_nulls_first(), F.col(entity_col).asc()
    )
    wf = Window.orderBy(F.col("frequency").asc(), F.col(entity_col).asc())
    wm = Window.orderBy(
        F.col("monetary").asc_nulls_first(), F.col(entity_col).asc()
    )
    return ent.select(
        entity_col,
        "recency_days",
        "frequency",
        F.round(F.col("monetary"), 4).cast("double").alias("monetary"),
        F.ntile(n_tiles).over(wr).alias("r_score"),
        F.ntile(n_tiles).over(wf).alias("f_score"),
        F.ntile(n_tiles).over(wm).alias("m_score"),
    ).withColumn(
        "segment",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ),
    )


def touch_attribution(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    conversion_type: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-/last-touch conversion attribution [EXT]: each
    ``conversion_type`` event's value is credited to the entity's
    earliest (first-touch) and most recent (last-touch) PRIOR
    non-conversion event type — the two bookend models of marketing
    attribution. Conversions with no prior touch credit ``direct``.
    Returns per-channel ``(channel, n_first, first_touch_rev, n_last,
    last_touch_rev)``.

    ONE entity-keyed exchange: both bookends are ignore-nulls
    first/last window functions over the same (entity, ts, tiebreak)
    ordering with an UNBOUNDED..1 PRECEDING frame — running state, not
    a per-conversion lookback self-join (the join would be quadratic
    in events-per-entity). Each conversion then explodes into its two
    (model, channel) credits ROW-LOCALLY, so the whole channel rollup
    is a single grouped conditional aggregate — one scan, one window
    pass, one channel shuffle (a per-model groupBy pair would
    re-derive the window subtree twice; plan-gated). Revenue sums are
    exact decimal."""
    w = (
        Window.partitionBy(entity_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col(type_col) != conversion_type, F.col(type_col))
    conv = (
        df.withColumn("first_ch", F.first(touch, ignorenulls=True).over(w))
        .withColumn("last_ch", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col(type_col) == conversion_type)
        .select(
            F.coalesce("first_ch", F.lit("direct")).alias("first_ch"),
            F.coalesce("last_ch", F.lit("direct")).alias("last_ch"),
            F.col(value_col).cast("decimal(18,4)").alias("v"),
        )
    )
    credits = conv.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("first").alias("model"),
                    F.col("first_ch").alias("channel"),
                    F.col("v"),
                ),
                F.struct(
                    F.lit("last").alias("model"),
                    F.col("last_ch").alias("channel"),
                    F.col("v"),
                ),
            )
        ).alias("c")
    ).select("c.model", "c.channel", "c.v")
    is_f, is_l = F.col("model") == "first", F.col("model") == "last"
    return credits.groupBy("channel").agg(
        F.count(F.when(is_f, 1)).alias("n_first"),
        F.coalesce(
            F.round(F.sum(F.when(is_f, F.col("v"))), 4).cast("double"),
            F.lit(0.0),
        ).alias("first_touch_rev"),
        F.count(F.when(is_l, 1)).alias("n_last"),
        F.coalesce(
            F.round(F.sum(F.when(is_l, F.col("v"))), 4).cast("double"),
            F.lit(0.0),
        ).alias("last_touch_rev"),
    )


def conversion_lag(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
) -> DataFrame:
    """Conversion-lag distribution [EXT]: per entity, the time from its
    FIRST ``from_type`` event to its first ``to_type`` event AT OR
    AFTER it, bucketed into whole days — the activation-latency curve
    (signup→purchase, trial→upgrade). Returns ``(lag_days, n_entities)``
    including a ``-1`` bucket for entities that started but never
    converted (the funnel's drop-off mass, kept explicit instead of
    silently filtered).

    ONE entity-keyed aggregate computes both firsts as conditional
    mins (the second conditioned on the first via a min-over-window,
    same single-exchange discipline as ``funnel``); the day-bucket
    rollup aggregates the entity-sized relation."""
    w = Window.partitionBy(entity_col)
    start = F.min(
        F.when(F.col(type_col) == from_type, F.col(ts_col))
    ).over(w)
    conv = F.min(
        F.when(
            (F.col(type_col) == to_type) & (F.col(ts_col) >= start),
            F.col(ts_col),
        )
    ).over(w)
    per_entity = (
        df.select(
            F.col(entity_col).alias("e"),
            start.alias("t0"),
            conv.alias("t1"),
        )
        .filter(F.col("t0").isNotNull())
        .distinct()
    )
    lag = F.when(
        F.col("t1").isNotNull(),
        F.floor(
            (F.unix_micros("t1") - F.unix_micros("t0"))
            / F.lit(86_400_000_000)
        ),
    ).otherwise(F.lit(-1))
    return (
        per_entity.groupBy(lag.cast("long").alias("lag_days"))
        .agg(F.count(F.lit(1)).alias("n_entities"))
    )


def throttle_events(
    df: DataFrame,
    entity_col: str,
    type_col: str,
    ts_col: str,
    min_gap_seconds: int,
    tiebreak_col: str,
) -> DataFrame:
    """Per-(entity, type) event throttling [EXT]: flag events arriving
    within ``min_gap_seconds`` of the PREVIOUS event of the same entity
    and type — the duplicate-fire / retry-storm suppressor run before
    behavioral rollups. Returns the input plus ``is_throttled``.

    Lag-based (gap to the previous RAW event): one (entity, type)
    window over exact epoch micros, zero self-joins. True debounce —
    gap measured to the last KEPT event — is a running-state recurrence
    a window can't express; that variant belongs to
    ``applyInPandasWithState`` (q159's stateful-timeout machinery) and
    is deliberately NOT emulated here to keep this exactly
    restatable as SQL."""
    w = Window.partitionBy(entity_col, type_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    gap = F.unix_micros(F.col(ts_col)) - F.lag(
        F.unix_micros(F.col(ts_col))
    ).over(w)
    return df.withColumn(
        "is_throttled",
        F.coalesce(gap < min_gap_seconds * 1_000_000, F.lit(False)),
    )


def debounce_events(
    df: DataFrame,
    entity_cols: list[str],
    ts_col: str,
    min_gap_seconds: int,
    tiebreak_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """TRUE debounce [EXT]: an event is kept iff it arrives at least
    ``min_gap_seconds`` after the last KEPT event of its entity group —
    the running-state recurrence :func:`throttle_events`' lag window
    cannot express (each decision depends on every prior decision).
    Returns the input plus ``kept``.

    This is the legitimate Pandas-path case (SURVEY §7.3): the
    recurrence is sequential WITHIN a group. Physically the
    applyInPandas grouping is a HASH BUCKET of the entity key, not the
    entity itself — per-group Arrow exchange costs ~1 ms, so millions
    of ten-row entities would pay more in framing than in work
    (measured 9.2 s → 1.7 s at sf0.1 for 7,500 tiny groups); inside a
    bucket an in-memory pandas groupby walks each entity's own
    timeline. Size ``n_buckets`` like shuffle partitions: each bucket
    task holds ~corpus/n_buckets rows. Semantics are identical —
    entities never straddle buckets (the bucket is a function of the
    entity key). Streaming twin: the q159 stateful-timeout machinery
    (``applyInPandasWithState``) carries the same last-kept state
    across micro-batches.

    Determinism: entities sort by (ts, tiebreak) with a stable sort;
    timestamps compare as exact int64 nanoseconds."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("kept", T.BooleanType(), False)]
    )
    gap_ns = int(min_gap_seconds) * 1_000_000_000
    sort_cols = list(entity_cols) + [ts_col, tiebreak_col]
    ent_cols = list(entity_cols)
    in_cols = [f.name for f in df.schema.fields]

    def fn(pdf):
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        ts_ns = pdf[ts_col].astype("int64").to_numpy()
        # entity boundary flags over the bucket's sorted frame: a new
        # entity resets the last-kept state (vectorized; the only
        # per-row python is the recurrence itself)
        # normalize missing keys to None BEFORE tupling: Arrow hands
        # null numeric keys to pandas as NaN, and NaN != NaN would make
        # every null-key row look like a fresh entity (never debounced)
        ekeys = pdf[ent_cols].astype("object")
        ents = ekeys.where(ekeys.notna(), None).to_numpy()
        kept = []
        last = None
        prev = None
        for i, t in enumerate(ts_ns):
            ent = tuple(ents[i])
            if ent != prev:
                last = None
                prev = ent
            ok = last is None or t - last >= gap_ns
            kept.append(ok)
            if ok:
                last = int(t)
        out = pdf.copy()
        out["kept"] = kept
        return out[in_cols + ["kept"]]

    bucket = F.pmod(F.xxhash64(*ent_cols), F.lit(n_buckets))
    return (
        df.withColumn("__bkt", bucket)
        .groupBy("__bkt")
        .applyInPandas(
            lambda pdf: fn(pdf.drop(columns="__bkt")), out_schema
        )
    )
