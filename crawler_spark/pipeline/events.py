"""Event-stream relational operators the reference's storage layer implies
but never needed (its sink is append-only): as-of correlation between event
kinds, expressed as partitioned window math so the plan scales with users.

The reference lands crawl results as timestamped rows
(storage/sqlstorage/sqlstorage.go:122-137); correlating "the last X before
each Y per key" is the canonical downstream query over such a table (e.g.
last successful fetch before each failure, last click before each purchase).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_last_before(
    events: DataFrame,
    left_type: str,
    right_type: str,
) -> DataFrame:
    """For each ``left_type`` event, the most recent strictly-earlier
    ``right_type`` event by the same user (an as-of join).

    Implemented as ONE pass over the union, not a join: sort each user's
    events once (single shuffle keyed on ``user_id``) and carry the last
    seen right-event forward with ``last(..., ignorenulls)`` over
    ``rowsBetween(unboundedPreceding, -1)``. This avoids the naive
    left-join-then-filter plan, which explodes to |left|x|right| rows per
    user before pruning — the difference between linear and quadratic in
    events-per-user, which is what matters on a skewed power-law user
    (or host) distribution at 100 TB. Hot keys stay bounded because the
    window state is O(1) per row (a running "last value"), not O(history).

    Tie-break: events at the identical timestamp order by ``event_id``
    (deterministic), and "strictly earlier" means earlier in that total
    order — mirrored exactly in the SQL oracle.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = events.filter(F.col("event_type").isin([left_type, right_type])).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.when(F.col("event_type") == right_type, F.col("ts")).alias("r_ts"),
        F.when(F.col("event_type") == right_type, F.col("value")).alias("r_value"),
    )
    carried = marked.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.last("r_ts", ignorenulls=True).over(w).alias("prev_ts"),
        F.last("r_value", ignorenulls=True).over(w).alias("prev_value"),
    )
    return carried.filter(F.col("event_type") == left_type).select(
        "event_id",
        "user_id",
        "value",
        "prev_value",
        # exact integer microseconds (timestamps carry sub-second precision;
        # float seconds would round differently across engines)
        # NTZ -> TZ cast before unix_micros: any fixed session-tz offset
        # cancels in the subtraction, so the gap is exact either way
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("prev_ts").cast("timestamp"))
        ).alias("gap_us"),
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Strictly-ordered 3-step funnel per user, one shuffle.

    A step-k event QUALIFIES only if a qualifying step-(k-1) event happened
    strictly earlier in the per-user total order (ts, then event_id — the
    same tie-break as asof_last_before). Per user: the first qualifying
    completion time of each step (epoch micros; NULL if never reached) and
    ``reached`` in 0..3.

    Scale shape: the sequential dependency is TWO stacked window passes
    over the SAME (user_id, ts, event_id) sort — Catalyst plans one
    exchange + one sort + two Window nodes, each carrying O(1) running
    state per row (a running max flag), then one partial->final agg on
    user_id. No self-joins: the naive step-k>=join-step-(k-1) plan is
    quadratic per user on power-law users.
    """
    s1, s2, s3 = steps
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = events.select("user_id", "event_type", "ts", "event_id")
    e = e.withColumn(
        "_seen1",
        F.max(F.expr(f"CASE WHEN event_type = '{s1}' THEN 1 ELSE 0 END")).over(w_prev),
    )
    e = e.withColumn(
        "_q2",
        F.expr(f"CASE WHEN event_type = '{s2}' AND _seen1 = 1 THEN 1 ELSE 0 END"),
    )
    e = e.withColumn("_seen2", F.max("_q2").over(w_prev))
    e = e.withColumn(
        "_q3",
        F.expr(f"CASE WHEN event_type = '{s3}' AND _seen2 = 1 THEN 1 ELSE 0 END"),
    )
    agg = e.groupBy("user_id").agg(
        F.min(
            F.expr(f"CASE WHEN event_type = '{s1}' THEN unix_micros(cast(ts AS TIMESTAMP)) END")
        ).cast("long").alias("t1_us"),
        F.min(F.expr("CASE WHEN _q2 = 1 THEN unix_micros(cast(ts AS TIMESTAMP)) END"))
        .cast("long")
        .alias("t2_us"),
        F.min(F.expr("CASE WHEN _q3 = 1 THEN unix_micros(cast(ts AS TIMESTAMP)) END"))
        .cast("long")
        .alias("t3_us"),
    )
    return agg.withColumn(
        "reached",
        F.expr(
            "CASE WHEN t3_us IS NOT NULL THEN 3 WHEN t2_us IS NOT NULL THEN 2"
            " WHEN t1_us IS NOT NULL THEN 1 ELSE 0 END"
        ).cast("int"),
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """(cohort_date, offset_days, n_users) — classic cohort retention.

    Cohort = the calendar date of a user's first event; a user counts
    toward (cohort, k) when they have any event k days after their first.
    This is the engagement matrix every crawl-derived product table gets
    asked for, and the canonical two-aggregate + join shape:

    Scale shape: first-seen is one partial->final min() keyed on user_id;
    active days is a (user_id, day) distinct — an aggregation with the
    SAME leading key, so it reuses the exchange; the join is keyed on
    user_id (bounded by a user's distinct active days, never event count);
    the final rollup is keyed on (cohort, offset) with tiny cardinality
    (days^2 / 2). No window over the raw event stream, no driver state.
    """
    day = F.to_date("ts").alias("d")
    firsts = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_date"))
    active = events.select("user_id", day).distinct()
    return (
        active.join(firsts, "user_id")
        .select(
            # ISO string, not DateType: date objects round-trip differently
            # through Arrow/pandas in different engines; the string form is
            # the portable group key (and what an export shard wants anyway)
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff(F.col("d"), F.col("cohort_date")).cast("int").alias("offset_days"),
            "user_id",
        )
        .groupBy("cohort_date", "offset_days")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


def daily_anomalies(events: DataFrame) -> DataFrame:
    """(event_type, d, n_events, med, is_spike): days whose event volume
    exceeds 1.5x that type's median daily volume — integer-exact.

    The ops-monitoring question behind crawl scheduling (is a host/source
    suddenly hot?) asked of the events table. The median is the LOWER
    median — the element at rank (n+1) div 2 of the type's daily counts
    ordered by (count, day) — so no float percentile interpolation is
    involved and both engines agree bit-for-bit; the spike test
    2*n > 3*med is the same exact-rational trick as the dedup thresholds.

    Scale shape: the heavy relation (raw events) collapses via ONE
    partial->final count keyed on (type, day); everything after — the
    rank window, the median pick, the join back — runs over the
    aggregated (type, day) relation (cardinality #types x #days, tiny at
    any corpus scale). Window is PARTITIONED by event_type, never global.
    """
    from pyspark.sql import Window

    daily = (
        events.select("event_type", F.to_date("ts").alias("d0"))
        .groupBy("event_type", "d0")
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy("n_events", "d0")
    ranked = daily.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_days", F.count("*").over(Window.partitionBy("event_type"))
    )
    med = (
        ranked.filter(F.col("rk") == F.expr("(n_days + 1) div 2"))
        .select("event_type", F.col("n_events").alias("med"))
    )
    return (
        daily.join(med, "event_type")
        .select(
            "event_type",
            F.date_format("d0", "yyyy-MM-dd").alias("d"),
            "n_events",
            "med",
            (2 * F.col("n_events") > 3 * F.col("med")).alias("is_spike"),
        )
    )


def interval_count_join(events: DataFrame, hours: int = 48) -> DataFrame:
    """Interval join via day-bin bucketing: per user's activity window
    [first_event, first_event + hours), how many events (all users) fall
    inside — (user_id, w_start_us, n_events).

    Spark has no native interval/range join; the naive formulation is a
    theta-join (every point x every interval) that Catalyst can only plan
    as a nested loop. The standard distributed shape is BIN + REFINE:
    intervals explode into the day bins they cover (bounded: hours/24 + 1
    bins each), points carry their own bin, the join is a plain EQUI-join
    on the bin, and a residual timestamp-containment filter removes the
    false positives at the bin edges. Join fan-out is |points| x
    (intervals covering that day) — the true match cardinality up to bin
    granularity — instead of |points| x |intervals|.

    Everything stays integer/timestamp-exact: window bounds are epoch
    micros (no float seconds), so the containment predicate and the
    output key are engine-portable.

    Scale shape: one aggregation keyed on user_id (window derivation),
    one explode bounded by bins-per-interval, one equi-join keyed on the
    day bin, partial->final count keyed on (user_id, w_start). Skewed
    days (everyone's window covers launch day) are ordinary join skew —
    AQE splits them; no nested loop anywhere.
    """
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    pts = events.select(F.to_date("ts").alias("bin"), us.alias("p_us"))
    wins = (
        events.groupBy("user_id")
        .agg(F.min(us).alias("w_start_us"))
        .withColumn("w_end_us", F.col("w_start_us") + hours * 3600 * 1000000)
    )
    wbins = wins.select(
        "user_id",
        "w_start_us",
        "w_end_us",
        F.explode(
            F.sequence(
                F.to_date(F.timestamp_micros("w_start_us")),
                F.to_date(F.timestamp_micros(F.col("w_end_us") - 1)),
            )
        ).alias("bin"),
    )
    return (
        pts.join(wbins, "bin")
        .filter((F.col("p_us") >= F.col("w_start_us")) & (F.col("p_us") < F.col("w_end_us")))
        .groupBy("user_id", "w_start_us")
        .agg(F.count("*").cast("long").alias("n_events"))
    )


def transition_counts(events: DataFrame) -> DataFrame:
    """(prev_type, event_type, n) — first-order Markov transition counts
    over each user's time-ordered event stream.

    The behavior model behind funnel design and bot detection (bots have
    degenerate transition rows). One window pass: lag(event_type) over
    the per-user (ts, event_id) total order — the same single sort every
    sequential events op here shares — then a partial->final count keyed
    on the (prev, next) pair (cardinality #types^2). Session starts
    (lag = NULL) are counted under prev_type = '^' so row sums equal each
    user's event count and the start distribution rides along.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "user_id",
            "event_type",
            F.coalesce(F.lag("event_type").over(w), F.lit("^")).alias("prev_type"),
        )
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").cast("long").alias("n"))
    )


def rfm_scores(events: DataFrame) -> DataFrame:
    """(user_id, r_days, n_events, cents, r_bucket, f_bucket, m_bucket) —
    RFM user segmentation with logarithmic buckets, fully integer-exact.

    Classic recency / frequency / monetary segmentation over the events
    table. Recency is measured against the corpus max timestamp (a
    deterministic in-data reference — no wall clock); monetary sums
    floor(value*100) cents (the pricing-summary convention). Buckets are
    bit-length (floor(log2)+1) of each measure rather than data-driven
    quantiles: quantile cuts need a rank over ALL users — an unpartitioned
    window that funnels 10^9 users through one task — while log buckets
    are a map-side expression with the same monotone segmentation intent.

    Scale shape: ONE partial->final aggregation keyed on user_id plus a
    broadcast of the 1-row corpus max. Nothing else.
    """
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ref = events.select(F.max(us).alias("ref_us"))
    per = events.groupBy("user_id").agg(
        F.max(us).alias("last_us"),
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100)).cast("long").alias("cents"),
    )
    return (
        per.crossJoin(F.broadcast(ref))
        .withColumn("r_days", F.expr("(ref_us - last_us) div 86400000000"))
        .select(
            "user_id",
            "r_days",
            "n_events",
            "cents",
            F.length(F.bin(F.col("r_days") + 1)).cast("int").alias("r_bucket"),
            F.length(F.bin("n_events")).cast("int").alias("f_bucket"),
            F.length(F.bin(F.greatest(F.col("cents"), F.lit(0)) + 1)).cast("int").alias("m_bucket"),
        )
    )


def lateness_profile(
    events: DataFrame, arrival_col: str, late_threshold_s: int = 60
) -> DataFrame:
    """(user_id, n_events, n_late, n_late_over, max_late_us): per-key
    event-time disorder relative to an ARRIVAL order — the measurement
    that sizes a Structured Streaming watermark (``withWatermark`` delay =
    the lateness quantile you are willing to wait for; everything beyond
    it is dropped). Run it on a replayed day of traffic before picking
    the delay, instead of guessing.

    ``arrival_col`` is whatever models arrival: an ingest offset, a file
    sequence number, or a deterministic permutation when simulating a
    multi-source merge. An event is late by (running max of earlier
    events' event-times) - (its own event-time), clamped at zero —
    exactly the quantity a watermark compares against.

    Shape: ONE window partitioned by the key ordered by arrival (O(1)
    running state per row — the same sessionize shape), then a
    partial->final rollup per key. Integer micros throughout.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = F.greatest(F.lit(0).cast("long"), F.max(us).over(w) - us)
    x = events.select(
        "user_id", F.coalesce(late, F.lit(0)).cast("long").alias("late_us")
    )
    return x.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0)).cast("long").alias("n_late"),
        F.sum(
            F.when(
                F.col("late_us") > F.lit(int(late_threshold_s) * 1_000_000).cast("long"),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_late_over"),
        F.max("late_us").cast("long").alias("max_late_us"),
    )


def gap_profile(events: DataFrame) -> DataFrame:
    """(user_id, n_gaps, min_gap_us, median_gap_us, max_gap_us): per-user
    inter-event-time profile — the bot/automation detector (machine
    traffic has implausibly regular or implausibly small gaps; human
    sessions are heavy-tailed) and the empirical politeness floor when
    the "user" is a crawler host.

    Exact integer rank math, no percentile floats: the LOWER MEDIAN is
    the gap ranked ceil(n/2) in (gap, ts, event_id) order — a total
    order, so the pick is deterministic and engine-identical.

    Shape: one lag window for gaps + one rank window over the per-user
    gap relation (both partitioned by user_id — the sessionize shape),
    then a single keyed rollup; the median join is by (user, rank) against
    the tiny one-row-per-user rank target.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.select("user_id", "ts", "event_id", us.alias("_us"))
        .withColumn("gap_us", F.col("_us") - F.lag("_us").over(w))
        .filter(F.col("gap_us").isNotNull())
    )
    rw = Window.partitionBy("user_id").orderBy("gap_us", "ts", "event_id")
    ranked = gaps.withColumn("_rk", F.row_number().over(rw))
    per = ranked.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
    )
    med = (
        ranked.join(
            per.select("user_id", F.expr("(n_gaps + 1) div 2").alias("_target")),
            "user_id",
        )
        .filter(F.col("_rk") == F.col("_target"))
        .select("user_id", F.col("gap_us").cast("long").alias("median_gap_us"))
    )
    return per.join(med, "user_id").select(
        "user_id", "n_gaps", "min_gap_us", "median_gap_us", "max_gap_us"
    )


def type_overlap(events: DataFrame) -> DataFrame:
    """(type_a, type_b, n_a, n_b, n_both, jaccard_bp): audience overlap
    between event types — which behaviors share users (the co-audience
    matrix segmentation and funnel design start from).

    Shape: the (user, type) relation is DISTINCT-ed first (one keyed
    agg), pairs come from a self-join keyed on user_id whose fan-out is
    bounded by |types|^2 per user — types are a bounded dimension, so
    this never goes quadratic in events; the rollup is keyed on the tiny
    (type_a, type_b) domain.
    """
    ut = events.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    both = (
        a.join(b, "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        both.join(sa, "type_a")
        .join(sb, "type_b")
        .withColumn(
            "jaccard_bp",
            F.expr("CAST(10000 * n_both div (n_a + n_b - n_both) AS BIGINT)"),
        )
        .select("type_a", "type_b", "n_a", "n_b", "n_both", "jaccard_bp")
    )
