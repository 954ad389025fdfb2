"""Round-7 batch 11 — categorical independence (chi-square), Zipf
frequency spectrum, hour-of-week activity profile, bounded k-core
decomposition, and MMR diversified re-ranking.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract — no libm ``ln`` anywhere (repo rule
since ``text_idf_topterms``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# agg_chi_square — lang × source independence test, integer-exact cells
# ---------------------------------------------------------------------------


@register(
    "agg_chi_square",
    oracle="""
    WITH cells AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n_obs
      FROM documents GROUP BY lang, source
    ),
    m AS (
      SELECT lang, source, n_obs,
             sum(n_obs) OVER (PARTITION BY lang)   AS n_lang,
             sum(n_obs) OVER (PARTITION BY source) AS n_src,
             sum(n_obs) OVER ()                    AS n_total
      FROM cells
    )
    SELECT lang, source, n_obs,
           CAST((1000 * n_lang * n_src) // n_total AS BIGINT) AS expected_milli,
           CAST((1000000 * n_obs * n_total) // (n_lang * n_src) AS BIGINT)
             AS lift_micro,
           CAST(round(1000000.0
                      * (n_total * n_obs - n_lang * n_src)
                      * (n_total * n_obs - n_lang * n_src)
                      / (n_total * n_lang * n_src)) AS BIGINT)
             AS chi2_cell_micro
    FROM m ORDER BY lang, source
    """,
)
def agg_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence cells for lang × source: observed
    count, expected count (milli), observed/expected lift (micro), and
    the cell's chi² contribution (micro) — `sum(chi2_cell_micro)` is the
    test statistic.  The workhorse check behind "is this crawl source
    language-skewed?" before fixing a training mixture.

    Determinism: marginals and ``d = N·n_xy − n_x·n_y`` are exact BIGINT;
    the one float step is ``round(1e6·d²/(N·n_x·n_y))`` — three correctly
    rounded IEEE ops on identical operands, so the hash is stable (same
    pattern as the bigram LM score's single-division rule).

    Scale shape: one source-scan hash agg to the cell table, which is
    bounded by |langs|·|sources| (dozens) — the window marginals run on a
    dimension-sized table, so the single-partition global-sum window is
    on O(100) rows, never the corpus.  At 100 TB the only real cost is
    the scan's map-side-combined count.
    """
    cells = (
        T(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    m = (
        cells.withColumn("n_lang", F.sum("n_obs").over(Window.partitionBy("lang")))
        .withColumn("n_src", F.sum("n_obs").over(Window.partitionBy("source")))
        .withColumn("n_total", F.sum("n_obs").over(Window.partitionBy()))
    )
    d = F.col("n_total") * F.col("n_obs") - F.col("n_lang") * F.col("n_src")
    return m.select(
        "lang",
        "source",
        "n_obs",
        F.expr("(1000 * n_lang * n_src) div n_total").cast("long").alias("expected_milli"),
        F.expr("(1000000 * n_obs * n_total) div (n_lang * n_src)")
        .cast("long")
        .alias("lift_micro"),
        F.round(
            F.lit(1000000.0)
            * d
            * d
            / (F.col("n_total") * F.col("n_lang") * F.col("n_src"))
        )
        .cast("long")
        .alias("chi2_cell_micro"),
    ).orderBy("lang", "source")


# ---------------------------------------------------------------------------
# corpus_freq_spectrum — Zipf frequency-spectrum histogram (log-free)
# ---------------------------------------------------------------------------


@register(
    "corpus_freq_spectrum",
    oracle="""
    WITH tok AS (
      SELECT t.w FROM documents,
        LATERAL (SELECT unnest(string_split(text, ' ')) AS w) t
      WHERE len(t.w) > 0
    ),
    freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY w),
    spec AS (
      SELECT CAST(len(CAST(f AS VARCHAR)) AS BIGINT) AS decade,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(f) AS BIGINT) AS n_occurrences
      FROM freq GROUP BY 1
    )
    SELECT decade, n_types, n_occurrences,
           CAST((1000000 * n_occurrences) // sum(n_occurrences) OVER ()
                AS BIGINT) AS occ_share_micro
    FROM spec ORDER BY decade
    """,
)
def corpus_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf frequency spectrum: how many distinct token types fall in
    each frequency decade (1-9, 10-99, 100-999 …) and what share of all
    token occurrences each decade carries.  The standard corpus-health
    fingerprint — a healthy natural-language crawl puts most TYPES in
    decade 1 (hapax legomena) while most OCCURRENCES sit in the top
    decades; template/boilerplate corpora invert it.

    Log-free by construction: the decade is the DIGIT COUNT of the exact
    frequency (``length(cast(f as string))`` ≡ ⌊log₁₀ f⌋+1 on positive
    ints), so the whole query is integer arithmetic — no libm anywhere.

    Scale shape: token explode is scan-side; the frequency agg shuffles
    on token (vocabulary-bounded, Zipf-capped, combiner-friendly); the
    spectrum agg runs on the vocab table, and its global-share window on
    ≤ ~12 rows.  100 TB cost = the one vocabulary shuffle every token
    pipeline already pays.
    """
    tok = (
        T(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("f"))
    spec = (
        freq.groupBy(F.length(F.col("f").cast("string")).cast("long").alias("decade"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("f").cast("long").alias("n_occurrences"),
        )
    )
    return (
        spec.withColumn(
            "occ_share_micro",
            F.expr(
                "(1000000 * n_occurrences) div sum(n_occurrences) over ()"
            ).cast("long"),
        )
        .orderBy("decade")
    )


# ---------------------------------------------------------------------------
# events_hourly_profile — hour-of-week activity heatmap (calendar-free)
# ---------------------------------------------------------------------------


@register(
    "events_hourly_profile",
    oracle="""
    WITH e AS (
      SELECT epoch_ns(ts) // 1000000000 AS ts_sec, user_id, value
      FROM events
    )
    SELECT CAST(((ts_sec // 86400 + 3) % 7) + 1 AS BIGINT) AS isodow,
           CAST((ts_sec // 3600) % 24 AS BIGINT) AS hour_utc,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(1000000 * value) AS BIGINT)) AS BIGINT)
             AS value_micro
    FROM e GROUP BY 1, 2 ORDER BY isodow, hour_utc
    """,
)
def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week activity heatmap: events, distinct users, and value
    volume per (ISO weekday, UTC hour) cell — the load-shape profile
    behind capacity planning and anomaly baselining ("is Tuesday 14:00
    unusually quiet?").

    Calendar-free determinism: ISO weekday is pure modular arithmetic on
    the epoch day (epoch day 0 = 1970-01-01 = Thursday = isodow 4, hence
    ``((day+3) % 7)+1``) — no timezone/calendar library on either
    engine; values are per-row micro-rounded before the integer sum.

    Scale shape: one scan, one hash agg onto a 168-cell key space — the
    textbook map-side-combine win (per-partition partials are ≤168 rows
    regardless of input size).  distinct-user is the only true shuffle
    and keys on (cell, user): pre-aggregation bounds it at cells×users.
    """
    e = T(spark, sf_dir, "events").withColumn(
        "ts_sec", F.expr("ts_ns div 1000000000")
    )
    return (
        e.groupBy(
            F.expr("((ts_sec div 86400 + 3) % 7) + 1").cast("long").alias("isodow"),
            F.expr("(ts_sec div 3600) % 24").cast("long").alias("hour_utc"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(F.round(F.lit(1000000) * F.col("value")).cast("long"))
            .cast("long")
            .alias("value_micro"),
        )
        .orderBy("isodow", "hour_utc")
    )


# ---------------------------------------------------------------------------
# graph_kcore — bounded k-core peel on the supplier–part bipartite graph
# ---------------------------------------------------------------------------

_KCORE_K = 25
_KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    # Every CTE is MATERIALIZED: each e{r} is referenced four times (two
    # degree tables, the next round, and the three scalar counts), and
    # DuckDB's default CTE inlining re-evaluates per reference — across
    # three chained rounds that re-evaluation compounds until the 6M-row
    # sf1 replica spilled >80 GB of temp and died (caught by the round-9
    # sf1 parity sweep; invisible at the gate scales).  Materialization
    # is exactly what the Spark side's per-round localCheckpoint does.
    ctes = [
        """e0 AS MATERIALIZED (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    )"""
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        prev = f"e{r - 1}"
        ctes.append(
            f"""ks{r} AS MATERIALIZED (
      SELECT s FROM {prev} GROUP BY s HAVING count(*) >= {_KCORE_K}
    ),
    kp{r} AS MATERIALIZED (
      SELECT p FROM {prev} GROUP BY p HAVING count(*) >= {_KCORE_K}
    ),
    e{r} AS MATERIALIZED (
      SELECT e.s, e.p FROM {prev} e
      WHERE e.s IN (SELECT s FROM ks{r}) AND e.p IN (SELECT p FROM kp{r})
    )"""
        )
    rounds = " UNION ALL ".join(
        f"""SELECT CAST({r} AS BIGINT) AS round,
               (SELECT CAST(count(DISTINCT s) AS BIGINT) FROM e{r}) AS n_suppliers,
               (SELECT CAST(count(DISTINCT p) AS BIGINT) FROM e{r}) AS n_parts,
               (SELECT CAST(count(*) AS BIGINT) FROM e{r}) AS n_edges"""
        for r in range(1, _KCORE_ROUNDS + 1)
    )
    return f"WITH {', '.join(ctes)} {rounds} ORDER BY round"


@register("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core decomposition ({rounds} peel rounds, k={k}) of the
    supplier–part co-supply graph: each round drops nodes with degree
    < k on the current residual graph, then edges touching a dropped
    endpoint — after enough rounds the surviving "core" is the densely
    interconnected subgraph (the spam-farm / power-clique detector in
    web-graph cleaning).  Output: surviving suppliers / parts / edges
    per round.

    Fixed-round form keeps the query SQL-expressible (the full
    fixed-point version is the same loop run to emptiness; rounds are
    bounded by max degree, and in practice the count freezes within a
    handful — same contract as ``dedup_cluster_components``' bounded
    min-label rounds).

    Scale shape per round: two degree hash-aggs (key = node id,
    combiner-friendly) + two semi-joins back to the edge list — the
    degree tables are node-bounded (≪ edges), so Spark broadcasts them
    when small and hash-joins co-partitioned on the same key otherwise.
    Each round's residual edge list is ``localCheckpoint``-materialized
    (the repo's iteration rule, operators/components.py) so round r+1
    reads a table, not round r's whole lineage — without it the unioned
    3-round plan re-derives the scan+distinct combinatorially (measured:
    78 exchanges → 14).  Edges are touched {rounds}× but never expanded;
    no pair blow-up anywhere.
    """
    e = (
        T(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()
    )
    out = []
    for r in range(1, _KCORE_ROUNDS + 1):
        ks = e.groupBy("s").agg(F.count(F.lit(1)).alias("ds")).filter(
            F.col("ds") >= _KCORE_K
        )
        kp = e.groupBy("p").agg(F.count(F.lit(1)).alias("dp")).filter(
            F.col("dp") >= _KCORE_K
        )
        e = (
            e.join(ks.select("s"), "s", "left_semi")
            .join(kp.select("p"), "p", "left_semi")
            .localCheckpoint()
        )
        out.append(
            e.agg(
                F.lit(r).cast("long").alias("round"),
                F.countDistinct("s").cast("long").alias("n_suppliers"),
                F.countDistinct("p").cast("long").alias("n_parts"),
                F.count(F.lit(1)).cast("long").alias("n_edges"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("round")


graph_kcore.__doc__ = graph_kcore.__doc__.format(k=_KCORE_K, rounds=_KCORE_ROUNDS)


# ---------------------------------------------------------------------------
# sim_mmr_rerank — maximal-marginal-relevance diversified top-k
# ---------------------------------------------------------------------------

_MMR_PROBES = 5  # probe vectors: vec_id < 5 (same probe set as sim_cosine_topk)
_MMR_CANDS = 12  # relevance top-C candidate pool per probe
_MMR_SELECT = 5  # greedy MMR selections per probe (λ = 0.7)


def _mmr_oracle() -> str:
    steps = []
    for i in range(1, _MMR_SELECT + 1):
        steps.append(
            f"""s{i} AS (
      SELECT q_id, cands,
             CASE WHEN b.id IS NULL THEN sel
                  ELSE list_append(sel, struct_pack(ns := b.ns, id := b.id, v := b.v))
             END AS sel
      FROM (
        SELECT q_id, cands, sel,
          list_sort(list_transform(
            list_filter(cands, c -> NOT list_contains(list_transform(sel, s -> s.id), c.id)),
            c -> struct_pack(
              ns := -(7 * c.rel - 3 * coalesce(
                       list_max(list_transform(sel,
                         s -> CAST(round(1000000 * list_inner_product(c.v, s.v)) AS BIGINT))),
                       0)),
              id := c.id,
              v := c.v)))[1] AS b
        FROM s{i - 1})
    )"""
        )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < {_MMR_PROBES}),
    scored AS (
      SELECT q.q_id, e.vec_id, e.v,
             CAST(round(1000000 * list_inner_product(q.qv, e.v)) AS BIGINT) AS rel,
             row_number() OVER (
               PARTITION BY q.q_id
               ORDER BY CAST(round(1000000 * list_inner_product(q.qv, e.v)) AS BIGINT) DESC,
                        e.vec_id) AS rn
      FROM q CROSS JOIN e WHERE q.q_id <> e.vec_id
    ),
    s0 AS (
      SELECT q_id,
             list(struct_pack(id := vec_id, rel := rel, v := v) ORDER BY rn) AS cands,
             CAST([] AS STRUCT(ns BIGINT, id BIGINT, v DOUBLE[])[]) AS sel
      FROM scored WHERE rn <= {_MMR_CANDS} GROUP BY q_id
    ),
    {','.join(steps)}
    SELECT q_id,
           CAST(u.i AS BIGINT) AS sel_rank,
           u.s.id AS vec_id,
           -u.s.ns AS mmr_micro
    FROM s{_MMR_SELECT},
         LATERAL (SELECT unnest(sel) AS s, generate_subscripts(sel, 1) AS i) u
    ORDER BY q_id, sel_rank
    """


# the fold stops consuming once the pool is exhausted (a probe with fewer
# than K candidates — tiny or heavily-filtered corpora — must return the
# short list, not throw on element_at of an empty array; caught by the
# degenerate-docs sweep).  The avail filter is evaluated twice per step
# (no CSE inside lambdas) — ≤12 structs × 5 steps per probe, negligible.
_MMR_FOLD = f"""
aggregate(
  sequence(1, {_MMR_SELECT}),
  cast(array() as array<struct<ns:bigint, id:bigint, v:array<double>>>),
  (sel, step) -> CASE
    WHEN size(filter(cands, c -> NOT exists(sel, s -> s.id = c.id))) = 0 THEN sel
    ELSE concat(sel, array(element_at(array_sort(transform(
      filter(cands, c -> NOT exists(sel, s -> s.id = c.id)),
      c -> named_struct(
        'ns', -(7 * c.rel - 3 * coalesce(array_max(transform(sel,
                s -> cast(round(1000000 * aggregate(zip_with(c.v, s.v, (x, y) -> x * y),
                                                    cast(0.0 as double), (a, x) -> a + x)) as bigint))),
              cast(0 as bigint))),
        'id', c.id,
        'v', c.v))), 1)))
  END
) AS sel
"""


@register("sim_mmr_rerank", oracle=_mmr_oracle())
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking: per probe, fetch the
    relevance top-{c} by exact cosine, then greedily pick {k} results
    maximizing ``λ·rel − (1−λ)·max-sim-to-already-picked`` (λ=0.7) — the
    standard diversified retrieval pass that stops near-duplicate
    neighbors from crowding a result page / RAG context window.

    The greedy loop is a pure JVM fold: per probe the candidate pool is
    collected into ONE bounded array ({c} structs) and
    ``aggregate(sequence(1,{k}), …)`` runs selection scan-side — no
    iteration-per-step jobs, no driver loop, no UDF.  Scores are integer
    micro (one ``round(1e6·dot)`` per pair, λ as the exact 7/10 split:
    ``7·rel − 3·pen``), ties by vec_id, so Spark and the unrolled DuckDB
    greedy agree hash-exactly.  ``array_sort`` on (ns,id,…) structs picks
    each argmax (struct order is field-lexicographic on both engines).

    Scale shape: stage 1 is ``sim_cosine_topk``'s broadcast-probe corpus
    scan (corpus never shuffles, top-C survives per probe); stage 2
    touches only probes×C rows — per-probe cost is O(C·k·dim) inside one
    task.  At 100 TB the rerank stage is a rounding error; the corpus
    scan dominates, exactly as it should.
    """
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = emb.filter(F.col("vec_id") < _MMR_PROBES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = emb.join(F.broadcast(q), F.col("q_id") != F.col("vec_id")).select(
        "q_id",
        "vec_id",
        "v",
        F.round(F.lit(1000000.0) * dot).cast("long").alias("rel"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("rel"), F.asc("vec_id"))
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MMR_CANDS)
        .groupBy("q_id")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(rn, vec_id, rel, v))),"
                " c -> named_struct('id', c.vec_id, 'rel', c.rel, 'v', c.v)) AS cands"
            )
        )
    )
    return (
        cand.select("q_id", F.expr(_MMR_FOLD))
        .select("q_id", F.posexplode("sel").alias("pos", "s"))
        .select(
            "q_id",
            (F.col("pos") + 1).cast("long").alias("sel_rank"),
            F.col("s.id").alias("vec_id"),
            (-F.col("s.ns")).alias("mmr_micro"),
        )
        .orderBy("q_id", "sel_rank")
    )


sim_mmr_rerank.__doc__ = sim_mmr_rerank.__doc__.format(
    c=_MMR_CANDS, k=_MMR_SELECT
)
