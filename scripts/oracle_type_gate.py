#!/usr/bin/env python3
"""Oracle-side output-type gate (VERDICT r15 #2).

Round 14 gated the SPARK side of the edge-typing rule ("cast to
BIGINT/DOUBLE at the output edge on BOTH sides") with
OutputContractSpec, but never the ORACLE side — and round 15 shipped
two oracles whose window-SUM columns silently widened to HUGEINT in
DuckDB (compaction_plan.bin_id, yuen_test.n0/n1), hashing red in the
driver while replaying bit-green locally. This script closes the
class: DESCRIBE every registered oracle query in DuckDB and fail on
any output column whose type is outside the allowed set.

Usage (driver-side python; duckdb is a verification tool, never a
library dependency):

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"
    python3 scripts/oracle_type_gate.py /tmp/vout/oracle_sql.json \
        /root/testdata/sf0.01

Exit 0 = every column of every oracle is BIGINT/DOUBLE/VARCHAR/DATE/
BOOLEAN/TIMESTAMP/INTEGER or a list thereof; exit 1 lists offenders
(query, column, type). HUGEINT, DECIMAL, FLOAT, SMALLINT, UTINYINT
etc. are all rejected — any of them can fetch with a different value
class in a different driver environment and flip the hash.
"""
import json
import re
import sys

import duckdb

ALLOWED = {
    "BIGINT", "DOUBLE", "VARCHAR", "DATE", "BOOLEAN",
    "TIMESTAMP", "TIMESTAMP_NS", "INTEGER",
}
TABLES = ["lineitem", "orders", "events", "documents", "embeddings",
          "customer", "nation", "part", "supplier", "region"]


def type_ok(t: str) -> bool:
    t = t.strip().upper()
    # allow one level of list-of-allowed (Spark array columns)
    m = re.fullmatch(r"(.+)\[\]", t)
    if m:
        t = m.group(1).strip()
    return t in ALLOWED


def main() -> int:
    oracle_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout/oracle_sql.json"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf}/{t}.parquet')")
    bad = []
    for q, sql in sorted(oracle.items()):
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # a DESCRIBE failure is itself a red
            bad.append((q, "<describe-error>", str(e).splitlines()[0][:160]))
            continue
        for col, typ, *_ in rows:
            if not type_ok(typ):
                bad.append((q, col, typ))
    if bad:
        for q, col, typ in bad:
            print(f"TYPE-GATE FAIL {q}.{col}: {typ}", file=sys.stderr)
        print(f"oracle_type_gate: {len(bad)} offending columns "
              f"across {len({b[0] for b in bad})} queries")
        return 1
    print(f"oracle_type_gate: OK ({len(oracle)} queries, all output "
          f"columns in {sorted(ALLOWED)} or lists thereof)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
