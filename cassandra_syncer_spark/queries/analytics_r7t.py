"""Round-7 batch 20 — sequence motif matching, grouped OLS, referential
integrity audit, drawdown analytics, and multimodal chunk-hash dedup.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.operators import fingerprint as fp
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# events_pattern_match — MATCH_RECOGNIZE-style motif counting
# ---------------------------------------------------------------------------

#: view → purchase with only clicks/errors between (no second view, no
#: signup inside the window) — the classic row-pattern funnel motif.
_MOTIF = "v[ce]*p"


@register(
    "events_pattern_match",
    oracle=f"""
    WITH j AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS journey
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT user_id,
             CAST(len(regexp_extract_all(journey, '{_MOTIF}')) AS BIGINT)
               AS n_matches,
             CAST(length(journey) AS BIGINT) AS journey_len
      FROM j
    )
    SELECT n_matches, CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(journey_len) AS BIGINT) AS sum_journey_len
    FROM m GROUP BY n_matches ORDER BY n_matches
    """,
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW-PATTERN MATCHING (the MATCH_RECOGNIZE analogue Spark lacks):
    each user's event stream collapses to a symbol string (one char per
    event type, ordered by ts then event_id), and the funnel motif
    ``v[ce]*p`` — a view converting to a purchase with only clicks or
    errors in between — is counted per user with leftmost-non-overlapping
    regex semantics, identical in Java regex and RE2.  Output is the
    match-count histogram: how many users converted 0, 1, 2, … times.

    Scale shape: ONE shuffle (the per-user hash agg); the journey build
    is an ordered struct-sort inside the aggregate whose size is bounded
    by per-user event count (the same per-key bound every sessionization
    query here relies on — users are humans, not firehoses), and the
    regex pass is linear in journey length, scan-fused on the aggregated
    rows.  The histogram re-agg shuffles |distinct match counts| rows.
    The naive alternative — window + self-join per funnel stage — is a
    shuffle per stage; this is the 100 TB form with stage count folded
    into one regex.
    """
    ev = T(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.expr("substring(event_type, 1, 1)").alias("sym"),
    )
    j = ev.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(ts, event_id, sym))),"
            " x -> x.sym), '')"
        ).alias("journey")
    )
    m = j.select(
        F.expr(f"cast(size(regexp_extract_all(journey, '{_MOTIF}', 0)) as bigint)").alias(
            "n_matches"
        ),
        F.length("journey").cast("long").alias("journey_len"),
    )
    return (
        m.groupBy("n_matches")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("journey_len").cast("long").alias("sum_journey_len"),
        )
        .orderBy("n_matches")
    )


# ---------------------------------------------------------------------------
# agg_ols_fit — grouped least-squares from exact integer moments
# ---------------------------------------------------------------------------

#: shared OLS finale over double-cast exact sums (identical text on both
#: engines; inputs are exact integers so the IEEE op sequence matches).
_OLS_EXPRS = [
    "round((dn * dsxy - dsx * dsy) / nullif(dn * dsxx - dsx * dsx, 0.0), 6)"
    " AS slope_r6",
    "round((dsy - ((dn * dsxy - dsx * dsy) / nullif(dn * dsxx - dsx * dsx, 0.0))"
    " * dsx) / dn, 2) AS intercept_centi_r2",
    "round(((dn * dsxy - dsx * dsy) * (dn * dsxy - dsx * dsy))"
    " / nullif((dn * dsxx - dsx * dsx) * (dn * dsyy - dsy * dsy), 0.0), 6)"
    " AS r2_r6",
]
_OLS_FINALE = ", ".join(_OLS_EXPRS)


@register(
    "agg_ols_fit",
    oracle=f"""
    WITH pts AS (
      SELECT l_returnflag AS grp,
             CAST(round(100 * l_quantity) AS BIGINT) AS x,
             CAST(round(100 * l_extendedprice) AS BIGINT) AS y
      FROM lineitem
    ),
    s AS (
      SELECT grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(y AS HUGEINT) * y) AS syy
      FROM pts GROUP BY grp
    ),
    d AS (
      SELECT grp, n,
             CAST(n AS DOUBLE) AS dn, CAST(sx AS DOUBLE) AS dsx,
             CAST(sy AS DOUBLE) AS dsy, CAST(sxx AS DOUBLE) AS dsxx,
             CAST(sxy AS DOUBLE) AS dsxy, CAST(syy AS DOUBLE) AS dsyy
      FROM s
    )
    SELECT grp, n, {_OLS_FINALE}
    FROM d ORDER BY grp
    """,
)
def agg_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped LEAST-SQUARES FIT — slope, intercept, and R² of
    extendedprice on quantity per returnflag, from EXACT integer
    moments: one scan accumulates n, Σx, Σy, Σx², Σxy, Σy² in
    centi-units (decimal(38,0) for the product sums — y² sums pass
    2⁶³ near sf100), and the closed-form finale runs once per group on
    double casts of those exact integers, so both engines execute the
    identical IEEE op sequence (`win_rolling_slope` is the windowed
    sibling; this is the grouped model-fit with goodness-of-fit).

    Scale shape: a single map-side-combined hash agg over the scan — the
    moments are algebraic, so the 100 TB cost is one pass plus a
    |groups|-row shuffle; the finale is arithmetic on |groups| rows.
    There is no second pass (the naive two-pass mean-centered form
    reads the corpus twice for the same answer).
    """
    pts = T(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.lit(100) * F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.lit(100) * F.col("l_extendedprice")).cast("long").alias("y"),
    )
    s = pts.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    d = s.select(
        "grp",
        "n",
        F.col("n").cast("double").alias("dn"),
        F.col("sx").cast("double").alias("dsx"),
        F.col("sy").cast("double").alias("dsy"),
        F.col("sxx").cast("double").alias("dsxx"),
        F.col("sxy").cast("double").alias("dsxy"),
        F.col("syy").cast("double").alias("dsyy"),
    )
    return d.selectExpr("grp", "n", *_OLS_EXPRS).orderBy("grp")


# ---------------------------------------------------------------------------
# audit_referential_integrity — FK orphan / coverage audit
# ---------------------------------------------------------------------------

#: (edge label, child table, fk column, parent table, pk column)
_EDGES = [
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]


def _edge_sql(label: str, child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
    SELECT '{label}' AS edge,
           CAST(coalesce(sum(c.cnt), 0) AS BIGINT) AS n_child,
           CAST(count(c.fk) AS BIGINT) AS n_distinct_fk,
           CAST(coalesce(sum(CASE WHEN p.pk IS NULL THEN c.cnt END), 0) AS BIGINT)
             AS n_orphan_rows,
           CAST(sum(CASE WHEN c.cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unref_parents
    FROM (SELECT {fk} AS fk, CAST(count(*) AS BIGINT) AS cnt
          FROM {child} GROUP BY {fk}) c
    FULL OUTER JOIN (SELECT DISTINCT {pk} AS pk FROM {parent}) p
      ON c.fk = p.pk
    """


@register(
    "audit_referential_integrity",
    oracle=" UNION ALL ".join(_edge_sql(*e) for e in _EDGES) + " ORDER BY edge",
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REFERENTIAL-INTEGRITY AUDIT across the star schema's FK edges —
    the ingest-gate every warehouse copy job needs: per edge, child row
    count, distinct FK count, ORPHAN child rows (FK references a missing
    parent — corruption; zero on healthy TPC-H data), and UNREFERENCED
    parents (parents with no children — expected business slack, e.g.
    customers who never ordered).  One full-outer join per edge between
    the child's FK-count table and the parent's key set answers all four
    numbers in a single pass per edge.

    Scale shape: each edge is (child groupBy fk) → full-outer join on
    the key → one-row agg.  The child agg is map-side combined to
    |distinct fk| rows BEFORE the join, so the join never sees child
    row volume; nation-sized parents broadcast automatically and the
    orders/customer joins are key-partitioned equi joins AQE can size.
    Four edges = four independent branches unioned at one row each —
    at 100 TB each branch is one scan + one shrunken join, and branches
    share nothing (no barrier).
    """
    parts = []
    for label, child, fk, parent, pk in _EDGES:
        c = (
            T(spark, sf_dir, child)
            .groupBy(F.col(fk).alias("fk"))
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        p = T(spark, sf_dir, parent).select(F.col(pk).alias("pk")).distinct()
        joined = c.join(p, c.fk == p.pk, "full_outer")
        parts.append(
            joined.agg(
                F.lit(label).alias("edge"),
                F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_child"),
                F.count("fk").cast("long").alias("n_distinct_fk"),
                F.coalesce(
                    F.sum(F.when(F.col("pk").isNull(), F.col("cnt"))), F.lit(0)
                )
                .cast("long")
                .alias("n_orphan_rows"),
                F.sum(F.when(F.col("cnt").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_unref_parents"),
            )
        )
    out = parts[0]
    for frag in parts[1:]:
        out = out.unionByName(frag)
    return out.orderBy("edge")


# ---------------------------------------------------------------------------
# events_max_drawdown — running-peak drawdown per user
# ---------------------------------------------------------------------------


@register(
    "events_max_drawdown",
    oracle="""
    WITH r AS (
      SELECT user_id, ts, event_id,
             sum(CAST(round(100 * value) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS running
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    d AS (
      SELECT user_id,
             max(running) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) - running AS dd
      FROM r
    ),
    m AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(max(dd) AS BIGINT) AS max_drawdown_centi
      FROM d GROUP BY user_id
    )
    SELECT user_id, n_events, max_drawdown_centi
    FROM m ORDER BY max_drawdown_centi DESC, user_id LIMIT 10
    """,
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX DRAWDOWN per user over a signed value stream (purchases
    credit, errors debit — any running balance works): running sum,
    running peak of that sum, and the largest peak-to-trough gap — the
    sequential statistic that summarizes worst-case decline and is the
    canonical example of "needs two nested running windows", exact in
    centi-units on both engines.

    Scale shape: both windows share ONE partitioning (user_id) and ONE
    sort (ts, event_id) — Spark plans them in a single Window stage
    after a single shuffle, then the per-user agg reuses the same
    partitioning (no second shuffle of event volume).  The top-10 is a
    TakeOrderedAndProject over |users| rows.  Per-user event counts are
    human-bounded, the same per-key bound as sessionization.
    """
    ev = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.round(F.lit(100) * F.col("value")).cast("long")).over(w).alias("running"),
    )
    d = r.select("user_id", (F.max("running").over(w) - F.col("running")).alias("dd"))
    m = d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("dd").cast("long").alias("max_drawdown_centi"),
    )
    return m.orderBy(F.desc("max_drawdown_centi"), "user_id").limit(10)


# ---------------------------------------------------------------------------
# dedup_media_chunkhash — multimodal near-dup via banded chunk hashes
# ---------------------------------------------------------------------------

_CHUNK_BITS = 15
_CHUNK_MOD = 1 << _CHUNK_BITS  # 32768 — Hamming-code field width per chunk
_N_CHUNKS = 4
_MIN_SHARED = 2  # candidate pairs must share ≥2 of 4 quartile chunks
#: planted "re-encode" copies: id offset keeps doc_id % 3 (media type) and
#: clears every real doc_id range (BIGINT-safe)
_COPY_OFFSET = 3_000_000_000_000


def _chunk_hash_sqls(*, duck: bool) -> list[str]:
    """Four quartile-chunk 32-bit hashes (one md5 per chunk).  Identical
    text on both engines modulo the div spelling."""
    div = "//" if duck else "div"
    out = []
    for i in range(_N_CHUNKS):
        start = f"1 + ({i} * n) {div} 4"
        ln = f"(({i + 1}) * n) {div} 4 - ({i} * n) {div} 4"
        out.append(fp.hash32(f"substr(txt, {start}, {ln})", duck=duck))
    return out


#: packed 60-bit code from the four chunk-hash columns h0..h3
_CODE_SQL = " + ".join(
    f"(h{i} % {_CHUNK_MOD}) * {_CHUNK_MOD ** i}" for i in range(_N_CHUNKS)
)

_MEDIA_TYPE_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN 'image/png' "
    "WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END"
)


def _mutate_sql(*, duck: bool) -> str:
    """Same-length 2nd-quartile corruption — the planted 'partial
    re-encode' (chunk boundaries depend only on length, so chunks
    1, 3, 4 stay byte-identical)."""
    div = "//" if duck else "div"
    return (
        f"concat(substr(text, 1, n {div} 4),"
        f" repeat('x', (2 * n) {div} 4 - n {div} 4),"
        f" substr(text, 1 + (2 * n) {div} 4))"
    )


@register(
    "dedup_media_chunkhash",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
      FROM documents WHERE text IS NOT NULL
    ),
    copies AS (
      SELECT orig_id + {_COPY_OFFSET} AS doc_id,
             CASE WHEN mut THEN {_mutate_sql(duck=True)} ELSE text END AS text
      FROM (SELECT doc_id AS orig_id, text, n, (doc_id % 100 = 0) AS mut
            FROM base WHERE doc_id % 100 < 2) t
    ),
    staged AS (
      SELECT doc_id, {_MEDIA_TYPE_SQL} AS media_type, txt,
             CAST(length(txt) AS BIGINT) AS n
      FROM (SELECT doc_id, text AS txt FROM base
            UNION ALL SELECT doc_id, text AS txt FROM copies)
    ),
    hashed AS (
      SELECT doc_id, media_type,
             {', '.join(f'CAST({h} AS BIGINT) AS h{i}' for i, h in enumerate(_chunk_hash_sqls(duck=True)))}
      FROM staged
    ),
    coded AS (
      SELECT doc_id, media_type, h0, h1, h2, h3,
             CAST({_CODE_SQL} AS BIGINT) AS code
      FROM hashed
    ),
    bands AS (
      SELECT doc_id, media_type, code, b.k AS band_id,
             CASE b.k WHEN 0 THEN h0 WHEN 1 THEN h1 WHEN 2 THEN h2
                      ELSE h3 END AS band_val
      FROM coded, (SELECT unnest(range({_N_CHUNKS})) AS k) b
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.media_type,
             a.code AS code_a, b.code AS code_b,
             CAST(count(*) AS BIGINT) AS n_shared_bands
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
       AND a.media_type = b.media_type AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT doc_a, doc_b, media_type, n_shared_bands,
           CAST(bit_count(xor(code_a, code_b)) AS BIGINT) AS hamming
    FROM pairs WHERE n_shared_bands >= {_MIN_SHARED}
    ORDER BY doc_a, doc_b
    """,
)
def dedup_media_chunkhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIMODAL NEAR-DUP — the missing dedup family for binary media
    columns: each payload (the deterministic text-derived stand-in from
    `multimodal_cols`; a real pipeline swaps in pHash/chromaprint bytes
    with the identical downstream shape) is cut into 4 quartile chunks,
    each chunk hashed to 15 bits, packed into one 60-bit code.  Chunks
    ARE the LSH bands: payloads sharing ≥2 of 4 chunk hashes within the
    same media_type become candidates (re-encodes or partial corruptions
    share most chunks; unrelated media share none), verified by Hamming
    distance over the packed code — 0 = byte-identical media, ≤15 = one
    chunk diverged.  Null payloads are skipped (the decode stage already
    flags them; nothing to fingerprint).

    Since the fixture corpus carries no natural binary dups, the staging
    UNIONS a deterministic planted set (same construction in the oracle):
    every doc_id ≡ 1 (mod 100) gains a byte-identical copy (exact dup,
    Hamming 0, 4/4 bands) and every doc_id ≡ 0 (mod 100) a same-length
    copy with its 2nd quartile overwritten (the partial re-encode:
    3/4 bands shared, Hamming ≤ 15) — planted volume scales with the
    corpus, ids offset by 3e12 to keep media_type and avoid collisions.

    Scale shape: the chunk/hash/pack kernel is scan-fused (4 md5 calls
    per payload, no explode of payload bytes); candidates come from a
    bucket-local SELF-JOIN on (band_id, band_val, media_type) — the same
    no-collect_list discipline as ``dedup_simhash`` — with the code
    carried on the band rows so verification needs NO join back to the
    corpus; the shared-band count and Hamming verify ride the one
    pair-key agg.  Band values are the FULL 32-bit chunk hashes (not the
    packed 15-bit fields), so buckets hold only truly-equal chunks plus
    rare 32-bit collisions — bucket size is dup-bounded, never
    corpus/bandspace; a hot-bucket salt cap slots in unchanged from
    ``dedup_minhash_salted`` if payload skew (e.g. an all-black-frame
    chunk) demands it.
    """
    base = (
        T(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text", F.length("text").cast("long").alias("n"))
    )
    copies = base.filter(F.col("doc_id") % 100 < 2).select(
        (F.col("doc_id") + F.lit(_COPY_OFFSET)).alias("doc_id"),
        F.when(F.col("doc_id") % 100 == 0, F.expr(_mutate_sql(duck=False)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    staged = (
        base.select("doc_id", "text")
        .unionByName(copies)
        .select(
            "doc_id",
            F.expr(_MEDIA_TYPE_SQL).alias("media_type"),
            F.col("text").alias("txt"),
            F.length("text").cast("long").alias("n"),
        )
    )
    hashed = staged.select(
        "doc_id",
        "media_type",
        *[
            F.expr(f"cast({h} as bigint)").alias(f"h{i}")
            for i, h in enumerate(_chunk_hash_sqls(duck=False))
        ],
    )
    coded = hashed.select(
        "doc_id",
        "media_type",
        "h0",
        "h1",
        "h2",
        "h3",
        F.expr(f"cast({_CODE_SQL} as bigint)").alias("code"),
    )
    bands = coded.select(
        "doc_id",
        "media_type",
        "code",
        F.posexplode(F.array("h0", "h1", "h2", "h3")).alias("band_id", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_type") == F.col("b.media_type"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.media_type").alias("media_type"),
            F.col("a.code").alias("code_a"),
            F.col("b.code").alias("code_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_bands"))
        .filter(F.col("n_shared_bands") >= _MIN_SHARED)
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "media_type",
        "n_shared_bands",
        F.expr("cast(bit_count(code_a ^ code_b) as bigint)").alias("hamming"),
    ).orderBy("doc_a", "doc_b")
