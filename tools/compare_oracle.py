#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only, not part
of the library): run each oracle SQL from Verify's oracle_sql.json in DuckDB
over the same parquet tables, and compare against the engine's parquet output.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    # driver behavior per contract: sort columns by name before hashing
    df = df[sorted(df.columns)]
    return df


# DuckDB type pairs that hash identically at the driver despite differing
# names — filled ONLY with pairs empirically proven driver-green in
# CORRECTNESS_r10.json (q143/q144 INTEGER-vs-BIGINT, q146/q153 the reverse,
# q154/q161 DECIMAL(3,2)-vs-DOUBLE all hash_match=true there): pandas
# renders every signed-int width as the same int value and small decimals
# as float64, so the driver's value hash cannot tell them apart. HUGEINT
# is NOT here — it lands as float (1435.0 vs 1435) and fails the driver
# (q73 round 5, q175 round 10), which is exactly what this check exists
# to catch locally.
INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
TYPE_COMPAT = {("DECIMAL(3,2)", "DOUBLE")}


def types_compat(a, b):
    if a == b:
        return True
    if a in INT_FAMILY and b in INT_FAMILY:
        return True
    return (a, b) in TYPE_COMPAT


def type_mismatches(con, sql, parquet_glob):
    """Strict oracle-vs-engine type check (judge round-10 item 3).

    DuckDB silently promotes e.g. sum(BIGINT) to HUGEINT and integer
    division of DECIMAL to DOUBLE; values then compare equal under the
    tolerant cell_eq but the driver's hash (which sees the dtype) does
    not. Compare the DuckDB-reported result types of the oracle query
    against the engine parquet's types, column-name matched.
    """
    orel = con.sql(sql)
    grel = con.sql(f"SELECT * FROM '{parquet_glob}'")
    otypes = dict(zip(orel.columns, [str(t) for t in orel.types]))
    gtypes = dict(zip(grel.columns, [str(t) for t in grel.types]))
    bad = []
    for c in sorted(set(otypes) & set(gtypes)):
        if not types_compat(otypes[c], gtypes[c]):
            bad.append((c, otypes[c], gtypes[c]))
    return bad


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b == 0.0:
            # IEEE says -0.0 == 0.0, but the driver hashes the rendered
            # value and "-0.0" != "0.0" (q260 round 12): require same sign
            return math.copysign(1.0, a) == math.copysign(1.0, b)
        return a == b  # engineered for bit parity; exact compare
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = canon(con.sql(sql).df())
            got = canon(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        try:
            tbad = type_mismatches(con, sql, f"{out_dir}/{name}/*.parquet")
        except Exception as e:
            print(f"FAIL {name}: type-check exception {e}")
            n_fail += 1
            continue
        if tbad:
            for c, ot, gt in tbad:
                print(f"FAIL {name}: col {c} type oracle={ot} engine={gt}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = None
        ev, gv = exp.values, got.values
        for i in range(len(exp)):
            for j, c in enumerate(exp.columns):
                a, b = ev[i][j], gv[i][j]
                try:
                    a = a.item()
                except AttributeError:
                    pass
                try:
                    b = b.item()
                except AttributeError:
                    pass
                if not cell_eq(a, b):
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: oracle={a!r} engine={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracle)} oracled queries ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
