"""Round-5 batch 3: the remaining scale patterns a 100 TB training-data
pipeline leans on — deterministic corpus splits, per-key reservoir
sampling, bitmap-partial exact distinct counting, binary-code Hamming
ANN, bloom-prefiltered joins (Spark's runtime-filter pattern made
explicit), and corpus duplication profiling.

Every query is oracle-checked; hash/sampling formulas are md5-derived so
DuckDB evaluates identical arithmetic (operators/fingerprint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.operators import fingerprint as fp
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register


@register(
    "split_train_valid_test",
    oracle=f"""
    WITH d AS (
      SELECT source,
             CASE WHEN {fp.hash32("CAST(doc_id AS VARCHAR)", duck=True)} % 100 < 98
                  THEN 'train'
                  WHEN {fp.hash32("CAST(doc_id AS VARCHAR)", duck=True)} % 100 = 98
                  THEN 'valid' ELSE 'test' END AS split,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    )
    SELECT split, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM d GROUP BY split, source ORDER BY split, source
    """,
)
def split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 98/1/1 train/valid/test corpus split by key hash —
    the assignment every training pipeline must make exactly once and
    reproduce forever.

    rand() would re-deal the split on every run (and differently per
    engine); the md5 bucket is stable across runs, engines, repartitioning
    and corpus growth — a doc keeps its split when new data arrives, so
    eval contamination can't creep in through re-splits.  Scale shape:
    pure scan-fused projection plus one tiny agg (|splits|×|sources|
    rows); zero wide shuffle before the final combine.
    """
    d = T(spark, sf_dir, "documents")
    bucket = F.expr(fp.hash32("CAST(doc_id AS STRING)", duck=False)) % 100
    return (
        d.select(
            "source",
            F.when(bucket < 98, "train")
            .when(bucket == 98, "valid")
            .otherwise("test")
            .alias("split"),
            F.size(F.split("text", " ")).alias("n_tok"),
        )
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .orderBy("split", "source")
    )


@register(
    "sample_reservoir_perkey",
    oracle=f"""
    WITH r AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {fp.hash32("CAST(doc_id AS VARCHAR)", duck=True)}, doc_id
             ) AS rk
      FROM documents
    )
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 3 ORDER BY source, rk
    """,
)
def sample_reservoir_perkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key deterministic k-sample (k=3 docs per source) — the
    "show me a few examples from every source" query, run constantly
    during corpus QA.

    A true reservoir sample is rand()-seeded and irreproducible; ranking
    by key hash gives the same statistical guarantee (uniform over the
    key's docs, independent of input order) while staying identical
    across runs and engines.  Scale shape: one shuffle on the key; the
    rank window never sees more than one key's rows per partition, and
    Spark's WindowExec streams them — no per-key materialization.  A
    skewed key costs one task its row count, not memory (row_number
    needs no buffering beyond the frame row).
    """
    d = T(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.expr(fp.hash32("CAST(doc_id AS STRING)", duck=False)), "doc_id"
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= 3)
        .orderBy("source", "rk")
    )


@register(
    "agg_distinct_bitmap",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-user counts per event type via bitmap partials —
    the scalable exact alternative when approx_count_distinct's error is
    unacceptable but a naive count(DISTINCT) expand is too wide.

    Shape: bucket = user_id div 64, partial = bit_or of one bit per user
    within the bucket.  The first agg combines map-side (bit_or is
    commutative/associative), so the shuffle carries at most
    |types| × |id-space|/64 8-byte partials instead of every (type, user)
    pair; the second agg sums popcounts.  For dense integer id spaces
    this is the roaring-bitmap pattern Spark lacks natively — partials
    are also mergeable across days, the same property `agg_partial_merge`
    demonstrates for sum/count sketches.

    Assumes a NON-NEGATIVE integer id space (true of every surrogate-key
    scheme this engine generates): negative ids would truncate toward
    zero in the bucket division and flip the shift sign.  Sparse or
    signed spaces first remap through dense_rank or an offset.
    """
    ev = T(spark, sf_dir, "events")
    partial = (
        ev.select(
            "event_type",
            F.expr("user_id div 64").alias("bucket"),
            F.expr("shiftleft(1L, int(user_id % 64))").alias("bit"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bit_or(bit)").alias("bm"))
    )
    return (
        partial.groupBy("event_type")
        .agg(F.sum(F.bit_count("bm")).cast("long").alias("n_users"))
        .orderBy("event_type")
    )


_HAMMING_CODE_DUCK = """
      SELECT vec_id,
             CAST(list_sum(list_transform(range(0, 63),
                    i -> CASE WHEN embedding[i + 1] > 0
                              THEN CAST(1 AS BIGINT) << i ELSE 0 END))
                  AS BIGINT) AS code
      FROM embeddings
"""


@register(
    "sim_hamming_ann",
    oracle=f"""
    WITH c AS ({_HAMMING_CODE_DUCK}),
    probes AS (SELECT vec_id AS probe_id, code AS pcode FROM c WHERE vec_id % 100 = 0),
    scored AS (
      SELECT p.probe_id, c.vec_id,
             CAST(bit_count(xor(p.pcode, c.code)) AS BIGINT) AS hamming,
             row_number() OVER (
               PARTITION BY p.probe_id
               ORDER BY bit_count(xor(p.pcode, c.code)), c.vec_id
             ) AS rk
      FROM probes p JOIN c ON c.vec_id <> p.probe_id
    )
    SELECT probe_id, vec_id, hamming, CAST(rk AS BIGINT) AS rk
    FROM scored WHERE rk <= 5 ORDER BY probe_id, rk
    """,
)
def sim_hamming_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-code ANN: 63-bit sign codes over the embedding dims,
    EXACT top-5 neighbors per probe by Hamming distance — the fourth ANN
    family next to brute-force cosine, IVF, and LSH
    (llm_similarity.py), and the cheapest: 64 float dims (256 B)
    compress to one BIGINT (8 B), and the distance is a single XOR +
    popcount, SIMD-friendly JVM intrinsics instead of a 64-term float
    dot product.

    Round-11 adaptive plan — banded short-circuit, brute fallback,
    CORPUS-COUNT GATED: probes whose corpus-derived band buckets
    (operators/adaptive_bands.py, the dedup_embed_simhash geometry)
    already hold >= 5 neighbors within Hamming 6 are answered FROM THE
    BUCKETS: banding recall at radius 6 is exact (pigeonhole), so every
    vector at Hamming <= 6 is a candidate, and if 5+ exist the global
    top-5 is among them — provably identical to the brute answer.  Only
    the remaining probes fall back to the probes-x-corpus XOR scan.  On
    a dup-dense corpus (the regime a 100 TB crawl dedup actually runs
    in) nearly every probe short-circuits and the job is ~linear in the
    corpus.  The whole banded dataflow engages only past
    ``ab.EMB_THRESHOLD`` vectors — the same driver-side metadata count
    that flips the band geometry (the join_null_safe_rows strategy-pick
    precedent): below it the probes-x-corpus XOR scan is a few 10^4
    comparisons and the banding pass is pure stage overhead (measured
    2.91x the vanilla gate at sf0.1's 2k vectors when run
    unconditionally — the round-11 bench repair), so the small-corpus
    plan IS the brute scan.  Because the output is bit-identical either
    way, the ORACLE stays the plain brute-force SQL — the parity gate
    therefore re-proves the short-circuit's exactness at every scale
    factor that crosses the threshold (sf1+; the forced-geometry test
    covers it below).

    Sign binarization is deterministic (no trained codebook), so unlike
    the k-means/LSH variants this one IS oracle-checkable: both engines
    build identical codes.  63 bits, not 64 — bit 63 would overflow
    signed BIGINT differently per engine.  Scale shape of the fallback
    mirrors sim_cosine_topk: the probe set broadcasts, the corpus scans
    in place (never shuffles), and per-probe top-k is a partial
    TakeOrdered under the window.  At 100 TB the code column is the
    only thing read — a 32× narrower scan than the float embeddings.
    """
    from cassandra_syncer_spark.operators import adaptive_bands as ab

    code = F.expr(
        "aggregate(sequence(0, 62), 0L,"
        " (acc, i) -> acc + IF(element_at(v, i + 1) > 0D, shiftleft(1L, i), 0L))"
    )
    c = (
        T(spark, sf_dir, "embeddings")
        .select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
        )
        .select("vec_id", code.alias("code"))
    )
    probes = c.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("code").alias("pcode")
    )
    w = Window.partitionBy("probe_id").orderBy("hamming", "vec_id")
    # driver-side metadata count gates the banded dataflow: below the
    # geometry threshold the brute scan is cheaper than the banding
    # pass's fixed stage overhead, and the output is identical.  Round 11:
    # the count comes from parquet footers (exact, no scan job — the gate
    # previously paid a full count() job per invocation)
    from cassandra_syncer_spark.session import table_row_count

    n_corpus = table_row_count(sf_dir, "embeddings", spark)
    if n_corpus < ab.EMB_THRESHOLD:
        return (
            F.broadcast(probes)
            .join(c, F.col("vec_id") != F.col("probe_id"))
            .select(
                "probe_id",
                "vec_id",
                F.bit_count(F.expr("pcode ^ code")).cast("long").alias("hamming"),
            )
            .withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= 5)
            .orderBy("probe_id", "rk")
        )
    geom = T(spark, sf_dir, "embeddings").agg(
        F.expr(
            ab.geometry_case(ab.EMB_NARROW, ab.EMB_WIDE, ab.EMB_THRESHOLD, duck=False)
        ).alias("masks")
    )
    bands = (
        c.crossJoin(F.broadcast(geom))
        .select("vec_id", "code", F.explode("masks").alias("band_id"))
        .withColumn("band_val", F.expr("code & band_id"))
    )
    pb = bands.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("code").alias("pcode"),
        "band_id",
        "band_val",
    )
    # exact-recall radius-6 candidates, bucket-local (pigeonhole: every
    # Hamming<=6 pair shares a band key under either geometry)
    cand6 = (
        pb.join(bands, ["band_id", "band_val"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.bit_count(F.expr("pcode ^ code")).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
        .distinct()
    )
    # probes with >= 5 in-radius candidates are fully answered by cand6
    sat = cand6.groupBy("probe_id").count().filter(F.col("count") >= 5).select(
        "probe_id"
    )
    short = cand6.join(F.broadcast(sat), "probe_id", "left_semi")
    rest = probes.join(F.broadcast(sat), "probe_id", "left_anti")
    brute = (
        F.broadcast(rest)
        .join(c, F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.bit_count(F.expr("pcode ^ code")).cast("long").alias("hamming"),
        )
    )
    scored = short.unionByName(brute)
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .orderBy("probe_id", "rk")
    )


#: bloom geometry: m = 2^16 bits (1024 longs, 8 KiB broadcast), k = 3
#: salted md5 hashes.  For the ~3k-key dim sides this pattern serves,
#: the false-positive rate is (1 - e^(-kn/m))^k ≈ 0.2% — the prefilter
#: drops ~99.8% of non-matching fact rows before the shuffle.
_BLOOM_BITS = 1 << 16
_BLOOM_K = 3


def _bloom_pos_sql(key_expr: str, salt: int) -> str:
    """Bit position of salted hash j — shared verbatim by the bitmap
    build and the probe predicate so both sides hash identically."""
    h = fp.hash32(f"concat(CAST({key_expr} AS STRING), '#', '{salt}')", duck=False)
    return f"({h} % {_BLOOM_BITS})"


def bloom_bitmap(keys: DataFrame, key_col: str) -> list[int]:
    """Build the bitmap driver-side: k salted bit positions per key,
    OR-combined into ``m/64`` longs.

    The collect is 1024 longs (8 KiB) of *metadata*, not data — the same
    driver-side hop Spark's own InjectRuntimeFilter performs when it
    builds a bloom from the build side of a join and rewrites the probe
    side's scan filter.  The per-key positions are computed
    distributed; only the OR-reduced bitmap rows transit the driver.
    """
    pos = keys.select(
        *[
            F.expr(_bloom_pos_sql(key_col, j)).alias(f"p{j}")
            for j in range(_BLOOM_K)
        ]
    )
    stacked = pos.select(
        F.explode(F.array(*[F.col(f"p{j}") for j in range(_BLOOM_K)])).alias("p")
    )
    rows = (
        stacked.select(
            F.expr("p div 64").alias("bucket"),
            F.expr("shiftleft(1L, int(p % 64))").alias("bit"),
        )
        .groupBy("bucket")
        .agg(F.expr("bit_or(bit)").alias("bm"))
        .collect()
    )
    bitmap = [0] * (_BLOOM_BITS // 64)
    for r in rows:
        bitmap[r["bucket"]] = r["bm"]
    return bitmap


def bloom_probe(key_expr: str, bitmap: list[int]) -> F.Column:
    """Predicate: all k salted bits of ``key_expr`` set in ``bitmap``
    (embedded as a literal array — Catalyst constant-folds the element
    lookups into the scan filter)."""
    arr = F.array(*[F.lit(v) for v in bitmap])
    cond = F.lit(True)
    for j in range(_BLOOM_K):
        pos_sql = _bloom_pos_sql(key_expr, j)
        bit = F.element_at(arr, F.expr(f"int({pos_sql} div 64) + 1")).bitwiseAND(
            F.expr(f"shiftleft(1L, int({pos_sql} % 64))")
        )
        cond = cond & (bit != 0)
    return cond


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT o.o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    WHERE o.o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')
    GROUP BY 1 ORDER BY 1
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join with an explicit bloom-filter runtime prefilter — the
    pattern Spark applies automatically (InjectRuntimeFilter) made
    first-class: build an 8 KiB bloom over the filtered dim keys, push
    it into the fact scan as a constant predicate, THEN run the exact
    semi join on the ~0.2%-false-positive survivors.

    Why it matters at 100 TB: the exact semi join must shuffle every
    fact row that *might* match; the bloom eliminates ~all non-matching
    rows at the scan, before the exchange, for the cost of 3 md5s per
    row — shuffle volume drops from |fact| to ~|matches|.  The bloom
    never changes the answer (no false negatives by construction; false
    positives die in the exact join), so the oracle is the plain semi
    join.  tests/test_operators.py gates the selectivity and the
    no-false-negative property.
    """
    cust = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    bitmap = bloom_bitmap(cust.select("c_custkey"), "c_custkey")
    orders = T(spark, sf_dir, "orders").filter(bloom_probe("o_custkey", bitmap))
    return (
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left_semi",
        )
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("status")
    )


@register(
    "corpus_dupsize_histogram",
    oracle="""
    WITH g AS (SELECT md5(text) AS h, count(*) AS s FROM documents GROUP BY 1)
    SELECT CAST(s AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(s * count(*) AS BIGINT) AS n_docs
    FROM g GROUP BY s ORDER BY s
    """,
)
def corpus_dupsize_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication profile of the corpus: how many exact-dup clusters of
    each size exist — the first diagnostic run on a new crawl (a heavy
    tail of large clusters means boilerplate/SEO spam; all-1s means the
    crawl was pre-deduped).

    Two cheap agg passes, both map-side combining: content hash → cluster
    size, then size → cluster count.  Output is O(max cluster size) rows
    regardless of corpus scale.
    """
    docs = T(spark, sf_dir, "documents")
    g = docs.groupBy(F.md5("text").alias("h")).agg(F.count(F.lit(1)).alias("s"))
    return (
        g.groupBy(F.col("s").cast("long").alias("cluster_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


_EWMA_ALPHA = 0.5
_EWMA_SPAN = 10


@register(
    "win_ewma",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, value,
             list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_EWMA_SPAN - 1} PRECEDING AND CURRENT ROW
             ) AS l
      FROM events
    )
    SELECT event_id, user_id,
           CAST(list_sum(list_transform(range(1, len(l) + 1),
                  p -> CAST(round(1000000 * l[p] * {_EWMA_ALPHA}
                            * power({1 - _EWMA_ALPHA}, len(l) - p)) AS BIGINT)))
                AS BIGINT) AS ewma_micro
    FROM e ORDER BY event_id
    """,
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of each user's event values
    — the smoothing every metrics/anomaly stack applies before
    thresholding (`events_anomaly_zscore`'s rolling-mean sibling with
    recency weighting).

    The textbook EWMA is a recurrence (ewma_t = α·x_t + (1-α)·ewma_{{t-1}})
    Spark can't express without a sequential scan; the span-truncated
    form Σ_j α(1-α)^j·x_{{t-j}} (j < 10) is its standard streaming-system
    approximation — the dropped tail's weight is (1-α)^10 < 0.1%.  Each
    term is quantized to integer micro-units BEFORE summation, so both
    engines sum identical integers in any order — the same determinism
    rule as `corpus_bigram_lm_score` (float Σ order differs between
    engines; integer Σ cannot).

    Scale shape: ONE key-sorted shuffle on user_id; the bounded 10-row
    frame means WindowExec buffers ≤ 10 rows per position regardless of
    a user's history length — memory O(span), never O(partition).
    """
    # order by the loader's normalized ts_ns (house rule: exact integer
    # epochs for ns-precision fixtures, both physical shapes)
    ev = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(-(_EWMA_SPAN - 1), 0)
    )
    term = (
        f"cast(round(1000000 * element_at(l, p) * {_EWMA_ALPHA}"
        f" * power({1 - _EWMA_ALPHA}, size(l) - p)) as bigint)"
    )
    return (
        ev.select(
            "event_id", "user_id", F.collect_list("value").over(w).alias("l")
        )
        .select(
            "event_id",
            "user_id",
            F.expr(f"aggregate(sequence(1, size(l)), 0L, (acc, p) -> acc + {term})")
            .alias("ewma_micro"),
        )
        .orderBy("event_id")
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH li AS (
      SELECT l_returnflag, round(l_extendedprice, 2) AS price,
             CAST(l_quantity AS BIGINT) AS qty,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    c AS (
      SELECT l_returnflag, price,
             sum(qty) OVER (
               PARTITION BY l_returnflag
               ORDER BY price, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum,
             sum(qty) OVER (PARTITION BY l_returnflag) AS total
      FROM li
    )
    SELECT l_returnflag, min(price) AS w_median_price
    FROM c WHERE 2 * cum >= total
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the weighted
    percentile Spark has no built-in for (percentile_approx weights every
    row equally).

    Definition: smallest price whose cumulative weight reaches half the
    group's total.  Cumulative weights are integer (quantities cast to
    bigint) and the threshold test is an integer comparison, so the cut
    row is identical on both engines — no float-boundary hazard.

    Scale shape — the naive form (cumsum window partitioned by the group
    key) is a trap when the group key has few values: each group's FULL
    sort lands on one task (measured 7.7× at the 10× replica, 3 return
    flags).  This is the two-pass bucketed exact form instead:

    1. histogram pass: prices fold into 1024 equal-width buckets per
       group (map-side combining agg, like `agg_percentile_hist`); a
       window over the 3×1024-row histogram locates each group's CUT
       bucket — the first whose end-of-bucket cumulative weight crosses
       half the total — and the weight entering it;
    2. exact pass: only the cut bucket's rows (~1/1024 of the group)
       re-sort, in a cumsum window seeded with the entering weight.

    Both passes shuffle ≤ fact rows once; no task ever sorts more than
    one bucket of one group.  The first qualifying row overall provably
    lies in the cut bucket (the threshold predicate is monotone in the
    sort order), so the result equals the naive form's — the oracle IS
    the naive form.
    """
    from cassandra_syncer_spark.operators.weighted_median import weighted_median

    li = T(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round("l_extendedprice", 2).alias("price"),
        F.col("l_quantity").cast("long").alias("qty"),
        "l_orderkey",
        "l_linenumber",
    )
    return (
        weighted_median(
            li,
            group_col="l_returnflag",
            value_col="price",
            weight_col="qty",
            tiebreak_cols=["l_orderkey", "l_linenumber"],
        )
        .select("l_returnflag", F.col("w_median").alias("w_median_price"))
        .orderBy("l_returnflag")
    )


def sim_knn_graph_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETIRED demo (round 6): k-NN graph blocked on the fixed-cardinality
    ``label`` column.  Blocking on a key whose cardinality does NOT grow
    with the corpus makes within-block pairs quadratic in corpus size
    (measured 11.6× at 10×, SCALING.md) — the registered production form
    is ``sim_knn_graph_ivf`` (llm_similarity.py), whose sign-code-prefix
    cells scale in count with the corpus so block size stays bounded
    (within-cell exactness is oracle-checked there).  Kept unregistered
    as the documented counter-example.
    """
    e = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("nbr_id"),
        F.round(dot, 4).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), "nbr_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .orderBy("vec_id", "rk")
    )
