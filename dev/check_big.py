#!/usr/bin/env python3
"""DuckDB-native variant of dev/check.py for outputs too large to
canonicalize through pandas (sf100 families emit up to 600M rows; the
pandas sort in check.py needs tens of GB there).

Compares Spark output vs oracle WITHOUT materializing either side:
  - column-name sets must match (same contract as check.py);
  - row counts must match;
  - an order-independent multiset fingerprint over the name-sorted
    column tuple must match: (sum(hash(row)), bit_xor(hash(row))) —
    two independent 64-bit folds of the same per-row hash, computed by
    the same engine on both sides, so any multiset difference must
    cancel in BOTH folds simultaneously to slip through.

This is the driver gate's rows+schema+hash check re-expressed as
streaming aggregates; values are compared at full binary precision
(strictly no looser than check.py's repr()-level float compare).

Usage: check_big.py [sfDir] [outDir] [names_csv]
"""
import json, os, sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    path = f"{sf}/{t}.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

if os.environ.get("CHECK_THREADS"):
    con.execute(f"SET threads={int(os.environ['CHECK_THREADS'])}")

oracles = json.load(open(f"{out}/oracle_sql.json"))
subset_label = ""
if len(sys.argv) > 3:
    only = set(sys.argv[3].split(","))
    oracles = {k: v for k, v in oracles.items() if k in only}
    subset_label = f" of FILTERED subset {sorted(only)}"

def fingerprint(rel_sql):
    cols = [r[0] for r in con.sql(f"DESCRIBE {rel_sql}").fetchall()]
    ordered = ", ".join(f'"{c}"' for c in sorted(cols))
    n, s, x = con.sql(
        f"SELECT COUNT(*), SUM(CAST(h AS HUGEINT)), BIT_XOR(h) FROM "
        f"(SELECT hash(ROW({ordered})) AS h FROM {rel_sql})").fetchall()[0]
    return sorted(cols), n, s, x

fails = 0
for name in sorted(oracles):
    try:
        gc, gn, gs, gx = fingerprint(f"(SELECT * FROM '{out}/{name}/*.parquet')")
        ec, en, es, ex = fingerprint(f"({oracles[name]})")
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}"); fails += 1
        elif gn != en:
            print(f"FAIL {name}: row count {gn} vs {en}"); fails += 1
        elif (gs, gx) != (es, ex):
            print(f"FAIL {name}: fingerprint {(gs, gx)} vs {(es, ex)} "
                  f"on {gn} rows"); fails += 1
        else:
            print(f"OK   {name} ({gn} rows, multiset-hash)", flush=True)
    except Exception as e:
        print(f"ERR  {name}: {e}"); fails += 1

print(f"\n{len(oracles) - fails}/{len(oracles)} queries match{subset_label}")
sys.exit(1 if fails else 0)
