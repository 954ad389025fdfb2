"""Round-8 batch 4 — ordered CDC changelog apply, constraint-violation
audit, bigram conditional entropy, Tukey IQR fences, and the near-dup
component-size histogram.

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
# cdc_apply_changelog — ordered insert/update/delete apply, deletes win
# ---------------------------------------------------------------------------


@register(
    "cdc_apply_changelog",
    oracle="""
    WITH snap AS (
      SELECT c_custkey AS k, c_nationkey AS nat,
             CAST(round(100 * c_acctbal) AS BIGINT) AS bal,
             CAST(0 AS BIGINT) AS seq, 'I' AS op
      FROM customer
    ),
    log AS (
      SELECT k, nat, bal + 100000 AS bal, CAST(1 AS BIGINT) AS seq, 'U' AS op
      FROM snap WHERE k % 3 = 0
      UNION ALL
      SELECT k, nat, CAST(0 AS BIGINT), CAST(2 AS BIGINT), 'D'
      FROM snap WHERE k % 7 = 0
      UNION ALL
      SELECT k + 10000000, nat, CAST(555500 AS BIGINT), CAST(3 AS BIGINT), 'I'
      FROM snap WHERE k % 11 = 0
    ),
    merged AS (SELECT * FROM snap UNION ALL SELECT * FROM log),
    latest AS (
      SELECT k, nat, bal, op,
             row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
      FROM merged
    )
    SELECT nat AS c_nationkey,
           CAST(count(*) AS BIGINT) AS n_live,
           CAST(sum(bal) AS BIGINT) AS sum_bal_centi
    FROM latest WHERE rn = 1 AND op <> 'D'
    GROUP BY nat ORDER BY c_nationkey
    """,
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED CDC CHANGELOG APPLY — the core table-maintenance op
    `merge_upsert` (upserts only) and `cdc_snapshot_diff` (diffing)
    bracket but neither performs: replay an insert/update/DELETE stream
    over a snapshot with sequence-number ordering, latest op wins per
    key and a terminal delete REMOVES the key (the Debezium/Kafka
    compaction contract).  The changelog is synthesized
    deterministically from the snapshot (every 3rd key updated, every
    7th deleted, every 11th spawning a new insert) so both engines
    replay the identical stream.

    Scale shape: one (snapshot ∪ changelog) frame, one key-partitioned
    row_number window picks the latest version (the same
    `win_rownum_latest` kernel every CDC consumer runs), delete
    filtering is a post-window predicate, and the output collapses to
    |nations| rows.  At 100 TB the window shuffles snapshot+log once —
    there is no join, so no skew pairing; compaction = this exact plan
    written back partitioned by key range.
    """
    # round-11 (guide §2.4): the four changelog branches re-scanned the
    # snapshot once EACH (Catalyst does not share scans across a union);
    # one scan now emits each row's whole op list via a flatten+explode —
    # identical (k, nat, bal, seq, op) rows, 4 scans → 1
    merged = (
        T(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("k"),
            F.col("c_nationkey").alias("nat"),
            F.round(F.lit(100) * F.col("c_acctbal")).cast("long").alias("bal"),
        )
        .select(
            F.explode(
                F.expr(
                    "flatten(array("
                    " array(named_struct('k', k, 'nat', nat, 'bal', bal,"
                    "   'seq', 0L, 'op', 'I')),"
                    " IF(k % 3 = 0, array(named_struct('k', k, 'nat', nat,"
                    "   'bal', bal + 100000L, 'seq', 1L, 'op', 'U')),"
                    "   array()),"
                    " IF(k % 7 = 0, array(named_struct('k', k, 'nat', nat,"
                    "   'bal', 0L, 'seq', 2L, 'op', 'D')), array()),"
                    " IF(k % 11 = 0, array(named_struct('k', k + 10000000,"
                    "   'nat', nat, 'bal', 555500L, 'seq', 3L, 'op', 'I')),"
                    "   array())))"
                )
            ).alias("r")
        )
        .select("r.k", "r.nat", "r.bal", "r.seq", "r.op")
    )
    w = Window.partitionBy("k").orderBy(F.desc("seq"))
    latest = merged.withColumn("rn", F.row_number().over(w)).filter(
        (F.col("rn") == 1) & (F.col("op") != "D")
    )
    return (
        latest.groupBy(F.col("nat").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_live"),
            F.sum("bal").cast("long").alias("sum_bal_centi"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# audit_constraint_violations — declarative ingest-gate rule audit
# ---------------------------------------------------------------------------

#: (rule name, violation predicate over orders) — shared SQL text so both
#: engines evaluate the identical condition.  Two rules are business
#: bounds real data DOES violate (non-zero counts), three are schema-level
#: invariants healthy TPC-H passes (zero counts prove the gate is wired).
_RULES = [
    ("key_not_null", "o_custkey IS NULL"),
    ("status_enum", "o_orderstatus NOT IN ('O', 'F', 'P')"),
    ("date_in_range",
     "o_orderdate < DATE '1992-01-01' OR o_orderdate > DATE '2005-12-31'"),
    ("price_business_bound", "o_totalprice > 300000"),
    ("priority_format", "o_orderpriority NOT LIKE '_-%'"),
]


def _rules_oracle() -> str:
    parts = [
        f"""
        SELECT '{name}' AS rule,
               CAST(count(*) AS BIGINT) AS n_checked,
               CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_violations,
               CAST((1000000 * sum(CASE WHEN {pred} THEN 1 ELSE 0 END))
                    // nullif(count(*), 0) AS BIGINT) AS share_micro
        FROM orders
        """
        for name, pred in _RULES
    ]
    return " UNION ALL ".join(parts) + " ORDER BY rule"


@register("audit_constraint_violations", oracle=_rules_oracle())
def audit_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARATIVE CONSTRAINT AUDIT — the ingest gate as data: five
    rules (not-null, enum membership, date range, a business bound, a
    format LIKE) evaluated in ONE scan with per-rule violation counts
    and shares; `audit_referential_integrity` checks the edges, this
    checks the rows.  Two rules are bounds real data violates (the
    counts prove detection), three are invariants healthy data passes
    (the zeros prove wiring).  The oracle is the five-scan UNION ALL a
    rule engine would naively emit.

    Scale shape: one scan → five conditional sums in a single 1-row
    agg → literal stack() unpivot (the `audit_column_profile` shape) —
    adding a rule costs one expression, never another pass.
    """
    o = T(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_checked")]
    for name, pred in _RULES:
        aggs.append(
            F.expr(f"sum(CASE WHEN {pred} THEN 1 ELSE 0 END)")
            .cast("long")
            .alias(f"v_{name}")
        )
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', n_checked, v_{name}" for name, _ in _RULES
    )
    return (
        one.select(
            F.expr(
                f"stack({len(_RULES)}, {stack_args})"
                " AS (rule, n_checked, n_violations)"
            )
        )
        .withColumn(
            "share_micro",
            F.expr("(1000000 * n_violations) div nullif(n_checked, 0)"),
        )
        .orderBy("rule")
    )


# ---------------------------------------------------------------------------
# text_ngram_entropy_rate — bigram conditional entropy of the corpus
# ---------------------------------------------------------------------------

#: per-(w1, w2) entropy term, micro-quantized: p(w1,w2)·ln(c(w1)/c(w1,w2))
#: over the BIGRAM total — one ln per bigram row of exact integer ratio.
_BIGRAM_TERM = (
    "CAST(round(1000000 * (CAST(c2 AS DOUBLE) / CAST(tot AS DOUBLE))"
    " * ln(CAST(c1 AS DOUBLE) / CAST(c2 AS DOUBLE))) AS BIGINT)"
)


@register(
    "text_ngram_entropy_rate",
    oracle=f"""
    WITH w AS (
      SELECT list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
      FROM documents
    ),
    bg AS (
      SELECT ws[i] AS w1, ws[i + 1] AS w2
      FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM w)
    ),
    c2t AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
      FROM bg GROUP BY w1, w2
    ),
    c1t AS (
      SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
             CAST(sum(sum(c2)) OVER () AS BIGINT) AS tot
      FROM c2t GROUP BY w1
    ),
    terms AS (
      SELECT {_BIGRAM_TERM} AS t
      FROM c2t JOIN c1t USING (w1)
    )
    SELECT CAST((SELECT count(*) FROM c2t) AS BIGINT) AS n_bigram_types,
           CAST((SELECT max(tot) FROM c1t) AS BIGINT) AS n_bigrams,
           CAST(sum(t) AS BIGINT) AS cond_entropy_micro
    FROM terms
    HAVING count(*) > 0
    """,
)
def text_ngram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIGRAM CONDITIONAL ENTROPY H(w₂|w₁) of the corpus — the
    language-naturalness rate `corpus_bigram_lm_score` scores documents
    WITH, here measured for the corpus itself: natural text sits a few
    nats per word, template/boilerplate corpora collapse toward zero
    (next word is predictable), shredded/garbage text inflates toward
    the unigram entropy.  The single number mixture tuning watches as
    dedup and filtering reshape the corpus.

    Determinism: H = Σ p(w₁,w₂)·ln(c(w₁)/c(w₁,w₂)) — each term is one
    ln over an exact integer ratio, micro-quantized PER BIGRAM ROW (the
    `events_entropy_profile` discipline scaled to the bigram domain),
    so the corpus sum is an order-free integer add.

    Scale shape: scan-side bigram expansion (array zip of the word
    array with itself, no self-join) → (w₁,w₂) hash agg (the one
    corpus-sized shuffle, map-side combined) → w₁ marginals by a second
    vocabulary-sized agg → broadcast-scale join back on w₁ → one-row
    finale.
    """
    w = T(spark, sf_dir, "documents").select(
        F.expr("filter(split(text, ' '), x -> length(x) > 0)").alias("ws")
    )
    bg = w.select(
        F.explode(
            F.expr(
                "CASE WHEN size(ws) >= 2 THEN"
                " transform(sequence(1, size(ws) - 1),"
                " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
                " ELSE array() END"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c2t = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    c1t = c2t.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    tot = c1t.agg(F.sum("c1").cast("long").alias("tot"))
    terms = (
        c2t.join(c1t, "w1")
        .crossJoin(F.broadcast(tot))
        .select(F.expr(_BIGRAM_TERM).alias("t"))
    )
    n2 = c2t.agg(F.count(F.lit(1)).cast("long").alias("n_bigram_types"))
    return (
        terms.agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("t").cast("long").alias("cond_entropy_micro"),
        )
        .filter(F.col("_n") > 0)
        .crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(tot.select(F.col("tot").alias("n_bigrams"))))
        .select("n_bigram_types", "n_bigrams", "cond_entropy_micro")
    )


# ---------------------------------------------------------------------------
# win_outlier_iqr_fences — Tukey fences via counting selection
# ---------------------------------------------------------------------------


@register(
    "win_outlier_iqr_fences",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS grp,
             CAST(round(100 * l_extendedprice) AS BIGINT) AS vc
      FROM lineitem
    ),
    q AS (
      SELECT grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(round(4 * quantile_cont(vc, 0.25)) AS BIGINT) AS q1_x4,
             CAST(round(4 * quantile_cont(vc, 0.75)) AS BIGINT) AS q3_x4
      FROM v GROUP BY grp
    )
    SELECT v.grp AS l_returnflag, q.n AS n_rows, q.q1_x4, q.q3_x4,
           CAST(sum(CASE WHEN 4 * v.vc < q.q1_x4 - 6 * (q.q3_x4 - q.q1_x4) / 4
                         OR 4 * v.vc > q.q3_x4 + 6 * (q.q3_x4 - q.q1_x4) / 4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM v JOIN q ON v.grp = q.grp
    GROUP BY v.grp, q.n, q.q1_x4, q.q3_x4
    ORDER BY l_returnflag
    """,
)
def win_outlier_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUKEY IQR FENCES per group — the boxplot outlier rule (flag
    outside Q1−1.5·IQR / Q3+1.5·IQR), the rank-based robust sibling of
    `events_anomaly_zscore` (moment-based) and `events_anomaly_mad`
    (median-based): quartiles are interpolated order statistics, so the
    quadrupled values (4·Q stays integer: type-7 interpolation at .25/
    .75 lands on quarter grid) and 1.5·IQR = 6·IQR/4 keep the whole
    fence comparison in exact integer arithmetic.

    Scale shape (round-9 swap, VERDICT r8 #3): quartiles by COUNTING
    SELECTION over the per-group value domain — the `agg_median_
    selection` machinery at four positions (v_⌊h⌋ / v_⌊h⌋+1 for each
    quartile; type-7 h = (n−1)p+1, so 4·Q1 = (4−r)·v_j + r·v_{j+1}
    with j = (n+3) div 4, r = (n+3) mod 4, and Q3 via (3n+1)) — then
    the |groups|-row fence frame broadcasts back against the scan for
    one conditional count.  The previous sort-based `percentile` agg
    buffered every group's rows (1.8× at 10×, SCALING r8); the domain
    window is price-grid bounded, CONSTANT in corpus size.
    """
    v = T(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.lit(100) * F.col("l_extendedprice")).cast("long").alias("vc"),
    )
    g = v.groupBy("grp", "vc").agg(F.count(F.lit(1)).alias("cnt"))
    wg = Window.partitionBy("grp")
    wc = Window.partitionBy("grp").orderBy("vc").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        "grp",
        "vc",
        F.sum("cnt").over(wg).alias("n"),
        F.sum("cnt").over(wc).alias("cum"),
    )
    q = (
        c.groupBy("grp")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.expr("min(CASE WHEN cum >= (n + 3) div 4 THEN vc END)").alias("v1a"),
            F.expr(
                "min(CASE WHEN cum >= (n + 3) div 4 + 1 THEN vc END)"
            ).alias("v1b"),
            F.expr(
                "min(CASE WHEN cum >= (3 * n + 1) div 4 THEN vc END)"
            ).alias("v3a"),
            F.expr(
                "min(CASE WHEN cum >= (3 * n + 1) div 4 + 1 THEN vc END)"
            ).alias("v3b"),
        )
        .select(
            "grp",
            "n",
            F.expr(
                "CAST((4 - (n + 3) % 4) * v1a"
                " + ((n + 3) % 4) * coalesce(v1b, v1a) AS BIGINT)"
            ).alias("q1_x4"),
            F.expr(
                "CAST((4 - (3 * n + 1) % 4) * v3a"
                " + ((3 * n + 1) % 4) * coalesce(v3b, v3a) AS BIGINT)"
            ).alias("q3_x4"),
        )
    )
    return (
        v.join(F.broadcast(q), "grp")
        .groupBy(F.col("grp").alias("l_returnflag"), "n", "q1_x4", "q3_x4")
        .agg(
            F.sum(
                F.when(
                    (4 * F.col("vc")
                     < F.col("q1_x4") - 6 * (F.col("q3_x4") - F.col("q1_x4")) / 4)
                    | (4 * F.col("vc")
                       > F.col("q3_x4") + 6 * (F.col("q3_x4") - F.col("q1_x4")) / 4),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "l_returnflag",
            F.col("n").alias("n_rows"),
            "q1_x4",
            "q3_x4",
            "n_outliers",
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# graph_component_size_histogram — near-dup cluster size distribution
# ---------------------------------------------------------------------------


def _comp_hist_sql() -> str:
    from cassandra_syncer_spark.queries.llm_dedup import _COMPONENTS_SQL

    return (
        _COMPONENTS_SQL.replace(
            """
    SELECT CAST(id AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS component
    FROM reach GROUP BY id
    """,
            """
    , comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
    sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
              FROM comp GROUP BY component)
    SELECT sz AS component_size,
           CAST(count(*) AS BIGINT) AS n_components,
           CAST(sum(sz) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz ORDER BY component_size
    """,
        )
    )


@register("graph_component_size_histogram", oracle=_comp_hist_sql())
def graph_component_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-DUP CLUSTER SIZE DISTRIBUTION — the histogram dedup POLICY
    is set from (`corpus_dupsize_histogram` is exact-hash families;
    this is the MinHash component graph): pairs and triples are normal
    crawl duplication to keep-one, hundred-doc components are template
    farms to drop wholesale, and a giant component means banding has
    collapsed (threshold too loose) — the pre-flight
    `dedup_candidate_degree_hist` reads edges, this reads the clusters
    those edges imply.

    Scale shape: connected components via the shared min-label operator
    (diameter-bounded rounds, checkpointed), then two dimension-sized
    aggs (component → size → histogram).  Output is ≤|distinct sizes|
    rows regardless of corpus scale.
    """
    from cassandra_syncer_spark.queries.llm_dedup import dedup_cluster_components

    labels = dedup_cluster_components(spark, sf_dir)
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return (
        sizes.groupBy(F.col("sz").alias("component_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_components"),
            F.sum("sz").cast("long").alias("n_docs"),
        )
        .orderBy("component_size")
    )
