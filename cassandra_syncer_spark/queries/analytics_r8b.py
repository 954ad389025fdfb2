"""Round-8 batch 2 — selection-based exact median, Zipf octave-spectrum
fit, per-user behavioral entropy, the native session-window operator, and
a one-scan column profiler.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# agg_median_selection — exact median WITHOUT sorting corpus rows
# ---------------------------------------------------------------------------


from cassandra_syncer_spark.operators.constants import SEL_BUCKET as _SEL_BUCKET


@register(
    "agg_median_selection",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(round(2 * quantile_cont(
                  CAST(round(100 * l_extendedprice) AS BIGINT), 0.5))
                AS BIGINT) AS med_centi_x2
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_median_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median by TWO-PHASE COUNTING SELECTION — the
    100 TB alternative to `agg_percentile`'s sort-every-group plan.

    Round-11 optimization (guide §2.3 "aggregate before you shuffle"):
    the round-8 form collapsed rows to the FULL (group, value) grid
    first, but centi-prices are nearly all distinct at every measured
    scale (594,330 grid rows from 600,000 inputs at sf0.1), so that
    hash aggregation reduced nothing and shuffled the whole grid into
    3 window partitions — measured as 1.0 s of the query's 1.7 s.
    The two-phase form aggregates rows into COARSE value buckets
    (``vc div 4096``: ≤ ~2,600 cells per group, real map-side
    combining, a tiny shuffle), locates the bucket holding each middle
    order statistic with a domain-sized prefix window, then resolves
    the exact value with a second pass that touches ONLY the ≤ 2 cut
    buckets per group (~n/2,600 rows).  Same selection statistic, same
    integer arithmetic, verified value-identical at every SF.

    The oracle is DuckDB's own sort-based ``quantile_cont`` — a fully
    independent formulation of the same statistic (×2, exact in ints).

    Scale shape: scan → (group, bucket) hash agg (mergeable histogram,
    bounded by the bucket grid, constant in corpus size) → tiny prefix
    window → broadcast cut spec → filtered second scan whose surviving
    rows are a 1/2,600 slice.  No corpus-row sort, no full-grid shuffle.
    """
    v = T(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.lit(100) * F.col("l_extendedprice")).cast("long").alias("vc"),
    )
    bkt = F.expr(f"vc div {_SEL_BUCKET}")
    h = v.groupBy("l_returnflag", bkt.alias("bkt")).agg(F.count(F.lit(1)).alias("c"))
    wg = Window.partitionBy("l_returnflag")
    wc = Window.partitionBy("l_returnflag").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hh = (
        h.select(
            "l_returnflag",
            "bkt",
            "c",
            F.sum("c").over(wg).alias("n"),
            F.sum("c").over(wc).alias("cum"),
        )
        .withColumn("k1", F.expr("(n + 1) div 2"))
        .withColumn("k2", F.expr("(n + 2) div 2"))
    )
    # per middle rank: its cut bucket + the rank REMAINING inside it
    # (min_by ignores the NULL keys of pre-cut buckets)
    cuts = hh.groupBy("l_returnflag").agg(
        F.max("n").alias("n"),
        F.expr(
            "min_by(named_struct('b', bkt, 'r', k1 - (cum - c)),"
            " CASE WHEN cum >= k1 THEN bkt END)"
        ).alias("c1"),
        F.expr(
            "min_by(named_struct('b', bkt, 'r', k2 - (cum - c)),"
            " CASE WHEN cum >= k2 THEN bkt END)"
        ).alias("c2"),
    )
    cuts = cuts.select(
        "l_returnflag",
        "n",
        F.col("c1.b").alias("b1"),
        F.col("c1.r").alias("r1"),
        F.col("c2.b").alias("b2"),
        F.col("c2.r").alias("r2"),
    )
    sub = (
        v.join(F.broadcast(cuts), "l_returnflag")
        .withColumn("lbkt", bkt)
        .filter((F.col("lbkt") == F.col("b1")) | (F.col("lbkt") == F.col("b2")))
    )
    g2 = sub.groupBy("l_returnflag", "vc", "lbkt", "n", "b1", "r1", "b2", "r2").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wl = Window.partitionBy("l_returnflag", "lbkt").orderBy("vc").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g2 = g2.withColumn("lcum", F.sum("cnt").over(wl))
    return (
        g2.groupBy("l_returnflag")
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            (
                F.min(
                    F.when(
                        (F.col("lbkt") == F.col("b1")) & (F.col("lcum") >= F.col("r1")),
                        F.col("vc"),
                    )
                )
                + F.min(
                    F.when(
                        (F.col("lbkt") == F.col("b2")) & (F.col("lcum") >= F.col("r2")),
                        F.col("vc"),
                    )
                )
            )
            .cast("long")
            .alias("med_centi_x2"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# corpus_zipf_octave_fit — Zipf exponent from the octave spectrum
# ---------------------------------------------------------------------------

_LN2 = 0.6931471805599453  # literal (constants are data)

#: ONE shared slope text over the integer regression sums (micro-nats per
#: octave): fixed IEEE op order → identical rounded doubles both engines.
_ZIPF_SLOPE = (
    "((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / nullif(CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0) / 1e6)"
)


@register(
    "corpus_zipf_octave_fit",
    oracle=f"""
    WITH tok AS (
      SELECT t.w FROM documents,
        LATERAL (SELECT unnest(string_split(text, ' ')) AS w) t
      WHERE len(t.w) > 0
    ),
    freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY w),
    spec AS (
      SELECT CAST(length(bin(f)) - 1 AS BIGINT) AS o,
             CAST(count(*) AS BIGINT) AS n_types
      FROM freq GROUP BY 1
    ),
    pts AS (
      SELECT o, n_types,
             CAST(round(1000000 * ln(CAST(n_types AS DOUBLE))) AS BIGINT) AS y
      FROM spec
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(o) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(o * y) AS BIGINT) AS sxy,
             CAST(sum(o * o) AS BIGINT) AS sxx,
             CAST(sum(n_types) AS BIGINT) AS n_types_total
      FROM pts
    )
    SELECT n_types_total, k AS n_octaves,
           round({_ZIPF_SLOPE}, 6) AS slope_r6,
           round(CASE WHEN {_ZIPF_SLOPE} < 0.0
                      THEN -{_LN2} / {_ZIPF_SLOPE} END, 6) AS zipf_s_r6
    FROM s WHERE k >= 2
    """,
)
def corpus_zipf_octave_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF EXPONENT fit from the OCTAVE spectrum — the one-number
    corpus-health statistic behind `corpus_freq_spectrum`'s shape: bin
    token frequencies by ⌊log₂ f⌋ (integer bit length, no floating log
    at bucket boundaries — the `events_interarrival_hdr` trick), OLS-fit
    ln(types-per-octave) against the octave index, and convert the slope
    to the rank-frequency exponent s = −ln2/slope.  Natural crawls sit
    near s≈1; boilerplate-heavy corpora flatten, template farms steepen.

    Determinism: regression inputs are (integer octave, micro-rounded
    ln of an exact integer type count) — ≤64 lns total, each the
    `math_funcs` rounded-transcendental precedent; the OLS sums are pure
    integer adds, and the slope is ONE shared float text over the single
    summary row.  <2 octaves emits zero rows.

    Scale shape: corpus collapses to the vocabulary (one hash agg,
    map-side combined), the vocabulary collapses to ≤64 octave rows, and
    the fit is a one-row agg.  Nothing after the first agg ever sees
    corpus volume.
    """
    tok = (
        T(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    spec = (
        freq.select(
            (F.length(F.expr("bin(f)")) - 1).cast("long").alias("o")
        )
        .groupBy("o")
        .agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    )
    pts = spec.select(
        "o",
        "n_types",
        F.expr(
            "CAST(round(1000000 * ln(CAST(n_types AS DOUBLE))) AS BIGINT)"
        ).alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("o").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("o") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("o") * F.col("o")).cast("long").alias("sxx"),
        F.sum("n_types").cast("long").alias("n_types_total"),
    )
    return s.filter(F.col("k") >= 2).select(
        "n_types_total",
        F.col("k").alias("n_octaves"),
        F.expr(f"round({_ZIPF_SLOPE}, 6)").alias("slope_r6"),
        F.expr(
            f"round(CASE WHEN {_ZIPF_SLOPE} < 0.0"
            f" THEN -{_LN2} / {_ZIPF_SLOPE} END, 6)"
        ).alias("zipf_s_r6"),
    )


# ---------------------------------------------------------------------------
# events_entropy_profile — behavioral entropy histogram
# ---------------------------------------------------------------------------

_ENT_BAND_MICRO = 250000  # quarter-nat entropy bands

_ENT_TERM = (
    "CAST(round(1000000 * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
    " * ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))) AS BIGINT)"
)


@register(
    "events_entropy_profile",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, event_type
    ),
    t AS (
      SELECT user_id, c,
             sum(c) OVER (PARTITION BY user_id) AS n
      FROM c
    ),
    h AS (
      SELECT user_id, CAST(sum({_ENT_TERM}) AS BIGINT) AS h_micro
      FROM t GROUP BY user_id
    )
    SELECT h_micro // {_ENT_BAND_MICRO} AS band,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(h_micro) AS BIGINT) AS sum_h_micro
    FROM h GROUP BY 1 ORDER BY band
    """,
)
def events_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEHAVIORAL ENTROPY histogram — Shannon entropy of each user's
    event-type mix, banded in quarter-nats: H≈0 users do exactly one
    thing (the `events_bot_gate` concentration signal, here as the full
    information-theoretic measure), high-entropy users spread across
    every type.  The band histogram is the fleet-level fingerprint that
    shifts when automation or a new surface launches.

    Determinism: each entropy term (c/n)·ln(n/c) micro-quantizes PER
    (user, type) ROW (one ln over a fixed-text ratio of exact integers —
    the `math_funcs` precedent), so the per-user sum is an order-free
    integer add; c=n degenerates to ln(1)=0 exactly.

    Scale shape: fact scan → (user, type) hash agg (map-side combined,
    ≤|users|·|types| rows) → user-keyed window ON THE COLLAPSED table →
    user agg → ≤ a few dozen band rows.  The corpus is shuffled once.
    """
    c = (
        T(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t = c.select(
        "user_id",
        "c",
        F.sum("c").over(Window.partitionBy("user_id")).alias("n"),
    )
    h = t.groupBy("user_id").agg(
        F.sum(F.expr(_ENT_TERM)).cast("long").alias("h_micro")
    )
    return (
        h.groupBy(F.expr(f"h_micro div {_ENT_BAND_MICRO}").alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("h_micro").cast("long").alias("sum_h_micro"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# stream_session_window — Spark's NATIVE session-window operator
# ---------------------------------------------------------------------------

_SESS_GAP = "30 minutes"
_SESS_GAP_US = 1800 * 1000000


@register(
    "stream_session_window",
    oracle=f"""
    WITH staged AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events
    ),
    marked AS (
      SELECT user_id, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER w > {_SESS_GAP_US}
                       OR lag(ts_us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM staged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ),
    sess AS (
      SELECT user_id, ts_us,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts_us
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    per AS (
      SELECT user_id, sid,
             CAST(count(*) AS BIGINT) AS n,
             max(ts_us) - min(ts_us) AS span_us
      FROM sess GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(sum(span_us) AS BIGINT) AS sum_span_us
    FROM per GROUP BY user_id ORDER BY user_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE ``session_window`` operator (the streaming
    sessionizer, exercised in batch so the driver can hash-check it —
    the same operator `streaming/watch.py` runs with a watermark): merge
    each user's events into gap-closed sessions and report per user the
    session count, event count, and total in-session span.  The
    lag/cumsum formulation (`win_session`, `events_sessionize_gap`) is
    the portable spelling; THIS is the engine-native one —
    `UpdatingSessionsExec` merges sessions inside each partition without
    a window function, the physical strategy a 100 TB streaming
    sessionizer actually uses.

    Boundary contract: session_window MERGES an event landing exactly
    on the previous window's end (UpdatingSessionsIterator joins when
    next.start <= prev.end), i.e. a new session only when the gap is
    STRICTLY greater than 30 min — the same ``>`` convention as the
    cumsum sessionizers (`win_session`, `events_sessionize_gap`);
    measured and locked by the exact-1800s property test.

    Scale shape: one user-keyed shuffle; sessions merge partition-local;
    span math on the window struct is exact integer microseconds (the
    struct's end = last event + gap, so span = end − start − gap).
    """
    ev = T(spark, sf_dir, "events").select("user_id", "ts")
    g = (
        ev.groupBy(F.session_window("ts", _SESS_GAP), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "user_id",
            "n",
            (
                F.expr("unix_micros(session_window.end)")
                - F.expr("unix_micros(session_window.start)")
                - F.lit(_SESS_GAP_US)
            ).alias("span_us"),
        )
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n").cast("long").alias("n_events"),
            F.sum("span_us").cast("long").alias("sum_span_us"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# audit_column_profile — one-scan multi-column data profiler
# ---------------------------------------------------------------------------

#: (output name, source column) — doubles centi-quantize for exact min/max
_PROFILE_COLS = [
    ("l_orderkey", "l_orderkey"),
    ("l_quantity", "CAST(round(100 * l_quantity) AS BIGINT)"),
    ("l_extendedprice", "CAST(round(100 * l_extendedprice) AS BIGINT)"),
    ("l_discount", "CAST(round(100 * l_discount) AS BIGINT)"),
    ("l_tax", "CAST(round(100 * l_tax) AS BIGINT)"),
]


def _profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{name}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count({expr}) AS BIGINT) AS n_nonnull,
               CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct,
               CAST(min({expr}) AS BIGINT) AS min_centi,
               CAST(max({expr}) AS BIGINT) AS max_centi
        FROM lineitem
        """
        for name, expr in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


@register("audit_column_profile", oracle=_profile_oracle())
def audit_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN PROFILER — the data-profiling pass every lake tool runs
    before anything else (null rates, exact cardinalities, centi-exact
    ranges), one output row per column.  PLAN CHOICE IS MEASURED, not
    assumed: the "one scan for all five columns" draft (multi-distinct
    agg) planned an Expand that pushes 5× the row volume through the
    distinct aggregation and benchmarked 2.8× SLOWER than five
    independent per-column aggs at sf0.1 — with columnar storage, five
    1-column pruned scans read the same bytes as one 5-column scan, so
    per-column passes win whenever exact distincts force an Expand.
    The plan test pins the pruning: each of the five scans reads
    EXACTLY its one source column.

    Exactness: doubles centi-quantize so min/max/distinct are integer
    (no float-ordering edge cases).  At 100 TB, swapping
    `approx_count_distinct` per column removes the distinct shuffle
    entirely and a single-pass multi-sketch agg becomes optimal again —
    the Expand-vs-pruned-scans tradeoff is specific to EXACT distincts.

    Scale shape: five independent (1-column scan → partial-deduped
    hash agg → 1-row finale) branches unioned at one row each — no
    barrier between branches, no joins, no Expand.
    """
    li = T(spark, sf_dir, "lineitem")
    parts = []
    for name, expr in _PROFILE_COLS:
        parts.append(
            li.select(F.expr(expr).alias("v")).agg(
                F.lit(name).alias("col_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.count("v").cast("long").alias("n_nonnull"),
                F.countDistinct("v").cast("long").alias("n_distinct"),
                F.min("v").cast("long").alias("min_centi"),
                F.max("v").cast("long").alias("max_centi"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col_name")
