#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/local_oracle.py <sfDir> <verifyOutDir>
Reads each <name> result parquet written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the sf
tables, and diffs (column names sorted, rows sorted, approx-equal floats
reported separately from hard mismatches).
"""
import json, sys, glob, os
import duckdb

def canon(rows, cols, types):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return (sorted(cols), [str(types[i]) for i in idx],
            sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for name in ["region","nation","customer","supplier","part","orders",
                 "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{name}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_glob:
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_types, s_rows = canon(spark_rel.fetchall(), spark_rel.columns,
                                            spark_rel.types)
            duck_rel = con.sql(sql)
            d_cols, d_types, d_rows = canon(duck_rel.fetchall(), duck_rel.columns,
                                            duck_rel.types)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if s_cols != d_cols:
            print(f"FAIL {name}: cols spark={s_cols} duck={d_cols}"); n_fail += 1; continue
        # Mirror the driver's type-tagged hash: the oracle's declared column
        # types must match the Spark result parquet's (e.g. an uncast integer
        # SUM is HUGEINT in DuckDB but BIGINT from Spark — values compare
        # equal in Python, but the driver's hash is type-tagged and differs).
        if s_types != d_types:
            print(f"FAIL {name}: types spark={s_types} duck={d_types}")
            n_fail += 1; continue
        if s_rows == d_rows:
            print(f"PASS {name} ({len(s_rows)} rows)"); n_pass += 1; continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1; continue
        # find first diff
        bad = None
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            if a != b:
                bad = (i, a, b); break
        print(f"FAIL {name}: first diff row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
