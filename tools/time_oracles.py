#!/usr/bin/env python3
"""Dev gate against oracle-side pathology (the q574/q281 class: a DuckDB
CTE re-inlining or quadratic oracle that runs for minutes and kills the
driver's correctness board).

Usage: python3 tools/time_oracles.py <sfDir> <oracleSqlJson> [budget_sec]

Runs every oracle once in DuckDB over <sfDir>'s tables, prints a table
sorted by elapsed (slowest first), and exits non-zero if any oracle
exceeds the per-oracle budget (default 10 s). <oracleSqlJson> is the
oracle_sql.json a graft.Verify run dumps.
"""
import json
import sys
import time

import duckdb


def main(sf_dir: str, oracle_json: str, budget: float) -> int:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(oracle_json))
    timings = []
    errors = []
    for name in sorted(oracles):
        t0 = time.monotonic()
        try:
            con.execute(oracles[name]).fetchall()
            timings.append((time.monotonic() - t0, name))
        except Exception as e:
            errors.append((name, str(e).split("\n")[0]))
    over = [(el, n) for el, n in timings if el > budget]
    for el, name in sorted(timings, reverse=True)[:25]:
        flag = "  OVER-BUDGET" if el > budget else ""
        print(f"{el:9.2f}s  {name}{flag}")
    for name, msg in errors:
        print(f"    ERROR  {name}: {msg}")
    total = sum(el for el, _ in timings)
    print(f"== {len(timings)} oracles, total {total:.1f}s, "
          f"{len(over)} over {budget:.0f}s budget, {len(errors)} errors")
    return 1 if over or errors else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 10.0))
