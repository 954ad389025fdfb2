"""Round-11 batch 1 — the knn-graph MULTI-PROBE recall curve.

``sim_knn_graph_ivf`` (llm_similarity.py) blocks the all-vectors k-NN
graph on corpus-scaled sign-code prefix cells; its docstring names
Hamming-1 prefix-cell probing as the standard recall lever.  This module
registers the MEASUREMENT of that lever: recall@3 against exact
brute-force truth on a constant-size probe sample, at probe level 0 (own
cell only — the registered graph's recall) and probe level 1 (own cell +
all b Hamming-1 neighbor cells — cost factor b+1, the recall the lever
buys).  The ``sim_ivf_probe_curve`` posture for the sign-prefix family.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); exact integer/micro-unit formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# sim_knn_graph_multiprobe — recall@3 vs probed prefix cells
# ---------------------------------------------------------------------------

#: constant probe-sample SIZE (the dedup_banding_recall modulus idiom):
#: the exact-truth side is probes x corpus, so a fixed RATE would make the
#: audit quadratic in the corpus; ~100 probes keep it linear forever.
_MP_PROBE_TARGET = 100

_MP_CODE_SPARK = (
    "aggregate(sequence(0, 62), 0L,"
    " (acc, i) -> acc + IF(element_at(v, i + 1) > 0D, shiftleft(1L, i), 0L))"
)
_MP_CODE_DUCK = (
    "CAST(list_sum(list_transform(range(0, 63),"
    " i -> CASE WHEN v[i + 1] > 0 THEN CAST(1 AS BIGINT) << i ELSE 0 END))"
    " AS BIGINT)"
)


def _multiprobe_sql() -> str:
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (
      SELECT CAST(length(bin(greatest((count(*) + 249) // 250, 8) - 1))
             AS BIGINT) AS b,
             greatest(1, count(*) // {_MP_PROBE_TARGET}) AS md
      FROM e
    ),
    cells AS (
      SELECT vec_id, v, ({_MP_CODE_DUCK}) >> (63 - n.b) AS cell
      FROM e, n
    ),
    probes AS (
      SELECT c.vec_id AS q_id, c.v AS qv, c.cell AS qcell
      FROM cells c, n WHERE c.vec_id % n.md = 0
    ),
    truth AS (
      SELECT q_id, vec_id FROM (
        SELECT p.q_id, c.vec_id,
               row_number() OVER (
                 PARTITION BY p.q_id
                 ORDER BY round(list_inner_product(p.qv, c.v), 4) DESC,
                          c.vec_id) AS rk
        FROM probes p JOIN cells c ON c.vec_id <> p.q_id
      ) WHERE rk <= 3
    ),
    exp_t AS (SELECT CAST(count(*) AS BIGINT) AS n_expected FROM truth),
    pc1 AS (
      SELECT p.q_id, p.qv,
             unnest(list_prepend(p.qcell,
               list_transform(range(0, CAST(n.b AS INTEGER)),
                              j -> xor(p.qcell, CAST(1 AS BIGINT) << j)))) AS cell
      FROM probes p, n
    ),
    top0 AS (
      SELECT q_id, vec_id FROM (
        SELECT p.q_id, c.vec_id,
               row_number() OVER (
                 PARTITION BY p.q_id
                 ORDER BY round(list_inner_product(p.qv, c.v), 4) DESC,
                          c.vec_id) AS rk
        FROM probes p JOIN cells c ON c.cell = p.qcell AND c.vec_id <> p.q_id
      ) WHERE rk <= 3
    ),
    top1 AS (
      SELECT q_id, vec_id FROM (
        SELECT p.q_id, c.vec_id,
               row_number() OVER (
                 PARTITION BY p.q_id
                 ORDER BY round(list_inner_product(p.qv, c.v), 4) DESC,
                          c.vec_id) AS rk
        FROM pc1 p JOIN cells c ON c.cell = p.cell AND c.vec_id <> p.q_id
      ) WHERE rk <= 3
    ),
    hit0 AS (SELECT CAST(0 AS BIGINT) AS n_flip,
                    CAST(count(*) AS BIGINT) AS n_hits
             FROM top0 t JOIN truth USING (q_id, vec_id)),
    hit1 AS (SELECT CAST(1 AS BIGINT) AS n_flip,
                    CAST(count(*) AS BIGINT) AS n_hits
             FROM top1 t JOIN truth USING (q_id, vec_id))
    SELECT u.n_flip, u.n_hits, x.n_expected,
           CAST((1000000 * u.n_hits) // nullif(x.n_expected, 0) AS BIGINT)
             AS recall_micro
    FROM (SELECT * FROM hit0 UNION ALL SELECT * FROM hit1) u
    CROSS JOIN exp_t x
    ORDER BY n_flip
    """


@register("sim_knn_graph_multiprobe", oracle=_multiprobe_sql())
def sim_knn_graph_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-PROBE RECALL CURVE for the sign-prefix knn graph — measures
    what the Hamming-1 probing lever buys: recall@3 against exact
    brute-force truth on a ~{_MP_PROBE_TARGET}-probe sample, at probe
    level 0 (own prefix cell, the ``sim_knn_graph_ivf`` configuration)
    and level 1 (own cell plus the b cells one prefix-bit flip away —
    b+1 cells scanned, the standard SRP-LSH multi-probe union).  Two
    rows, one per level; the monotonicity law (level-1 candidates ⊇
    level-0's, so recall never decreases) is property-tested.

    Scale shape: the exact truth is a constant-size probe sample
    broadcast against the corpus (count-derived modulus, the
    ``dedup_banding_recall`` idiom — a fixed rate would make the audit
    quadratic); both curve points reuse the SAME cell assignment (b
    corpus-derived prefix bits off a 1-row count broadcast, identical
    arithmetic to ``sim_knn_graph_ivf``), so the swept cost is the
    probed cell count, never a new index build.  The probe-cell fan-out
    is b+1 rows per probe — metadata-sized, joined against the
    cell-keyed corpus like any other bucket-local candidate join (no
    cartesian anywhere).  Ranking round(·,4)+vec_id tie-broken →
    hash-identical rows in both engines.
    """
    spark_sql = f"""
    WITH e0 AS (SELECT vec_id, embedding FROM embeddings),
    e AS (SELECT vec_id,
                 transform(embedding, x -> cast(x AS DOUBLE)) AS v
          FROM e0),
    n AS (
      SELECT cast(length(bin(greatest((count(*) + 249) div 250, 8) - 1))
             AS BIGINT) AS b,
             greatest(1, count(*) div {_MP_PROBE_TARGET}) AS md
      FROM e
    ),
    cells AS (
      SELECT vec_id, v,
             shiftright({_MP_CODE_SPARK}, cast(63 - n.b AS INT)) AS cell
      FROM e CROSS JOIN n
    ),
    probes AS (
      SELECT c.vec_id AS q_id, c.v AS qv, c.cell AS qcell
      FROM cells c CROSS JOIN n WHERE c.vec_id % n.md = 0
    ),
    truth AS (
      SELECT q_id, vec_id FROM (
        SELECT p.q_id, c.vec_id,
               row_number() OVER (
                 PARTITION BY p.q_id
                 ORDER BY round(aggregate(zip_with(p.qv, c.v, (x, y) -> x * y),
                                0D, (acc, x) -> acc + x), 4) DESC,
                          c.vec_id) AS rk
        FROM probes p JOIN cells c ON c.vec_id <> p.q_id
      ) WHERE rk <= 3
    ),
    exp_t AS (SELECT cast(count(*) AS BIGINT) AS n_expected FROM truth),
    pc1 AS (
      SELECT p.q_id, p.qv, pcell.cell
      FROM probes p CROSS JOIN n
      LATERAL VIEW explode(concat(array(p.qcell),
        transform(sequence(0, cast(n.b AS INT) - 1),
                  j -> p.qcell ^ shiftleft(1L, j)))) pcell AS cell
    ),
    top0 AS (
      SELECT q_id, vec_id FROM (
        SELECT p.q_id, c.vec_id,
               row_number() OVER (
                 PARTITION BY p.q_id
                 ORDER BY round(aggregate(zip_with(p.qv, c.v, (x, y) -> x * y),
                                0D, (acc, x) -> acc + x), 4) DESC,
                          c.vec_id) AS rk
        FROM probes p JOIN cells c ON c.cell = p.qcell AND c.vec_id <> p.q_id
      ) WHERE rk <= 3
    ),
    top1 AS (
      SELECT q_id, vec_id FROM (
        SELECT p.q_id, c.vec_id,
               row_number() OVER (
                 PARTITION BY p.q_id
                 ORDER BY round(aggregate(zip_with(p.qv, c.v, (x, y) -> x * y),
                                0D, (acc, x) -> acc + x), 4) DESC,
                          c.vec_id) AS rk
        FROM pc1 p JOIN cells c ON c.cell = p.cell AND c.vec_id <> p.q_id
      ) WHERE rk <= 3
    ),
    hit0 AS (SELECT cast(0 AS BIGINT) AS n_flip,
                    cast(count(*) AS BIGINT) AS n_hits
             FROM top0 t JOIN truth USING (q_id, vec_id)),
    hit1 AS (SELECT cast(1 AS BIGINT) AS n_flip,
                    cast(count(*) AS BIGINT) AS n_hits
             FROM top1 t JOIN truth USING (q_id, vec_id))
    SELECT u.n_flip, u.n_hits, x.n_expected,
           cast((1000000 * u.n_hits) div nullif(x.n_expected, 0) AS BIGINT)
             AS recall_micro
    FROM (SELECT * FROM hit0 UNION ALL SELECT * FROM hit1) u
    CROSS JOIN exp_t x
    ORDER BY n_flip
    """
    T(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(spark_sql)
