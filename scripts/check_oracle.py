#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify's output dir against DuckDB: for each <name>.parquet
(Spark result) and the matching SQL in oracle_sql.json, executes the SQL
over the testdata parquet tables and compares row-sets (columns sorted by
name, rows sorted, values stringified like a hash compare would see them).

Usage: python3 scripts/check_oracle.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import decimal


def canon(v):
    # Mimic the driver's hash compare: values pass through pandas first
    # (rel.df()), so e.g. a DuckDB HUGEINT column becomes float64 and
    # stringifies as "6.0" — a REAL driver-side mismatch vs Spark's int64
    # "6".  Do NOT normalize integral floats back to ints here: round 1
    # proved the driver doesn't (12 queries failed on exactly that).
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    return str(v)


def table_rows(rel, names):
    # Route through pandas like the driver does — this is what converts
    # HUGEINT→float64, TIMESTAMP→Timestamp, etc.  NaT/NaN → None first.
    # KNOWN CONFLATION (deliberate): the notna() mask below maps a genuine
    # float NaN to None/"NULL" too, so canon's "NaN" branch is unreachable
    # on the oracle side.  This mimics the driver's own rel.df() routing
    # (pandas merges NULL and NaN in float64 columns — an int64 column with
    # NULLs arrives as float64+NaN, and "fixing" NaN here would turn those
    # genuine NULLs into false mismatches).  The engine-side contract is
    # therefore: queries must never EMIT NaN (all divisions are guarded
    # with when()/nullif()); a NaN-producing query would be ambiguous under
    # this gate and is a bug in the query, not the gate.
    df = rel.df()
    # astype(object) first: float64/datetime64 columns silently cast None
    # back to NaN/NaT, which would leave canon's NULL branch unreachable
    recs = (df.astype(object).where(df.notna(), None).to_dict("records")
            if len(df) else [])
    idx = sorted(range(len(names)), key=lambda i: names[i])
    rows = [tuple(canon(r[names[i]]) for i in idx) for r in recs]
    return sorted(rows), [names[i] for i in idx]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # generated SFs are parquet DIRECTORIES
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = n_noracle = 0
    produced = {os.path.basename(d.rstrip("/"))
                for d in glob.glob(f"{out_dir}/*/")}
    for name in sorted(set(oracle) - produced):
        n_fail += 1
        print(f"  ✗ {name}: declared in oracle_sql.json but NO OUTPUT (query failed?)")
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        spark_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        srows, scols = table_rows(spark_rel, spark_rel.columns)
        if name not in oracle:
            n_noracle += 1
            print(f"  ~ {name}: no oracle ({len(srows)} rows)")
            continue
        try:
            orel = con.sql(oracle[name])
            orows, ocols = table_rows(orel, orel.columns)
        except Exception as e:
            n_fail += 1
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            continue
        if scols != ocols:
            n_fail += 1
            print(f"  ✗ {name}: column mismatch spark={scols} oracle={ocols}")
        elif srows != orows:
            n_fail += 1
            print(f"  ✗ {name}: rows spark={len(srows)} oracle={len(orows)}")
            for i, (a, b) in enumerate(zip(srows, orows)):
                if a != b:
                    print(f"      first diff at {i}:\n      spark : {a}\n      oracle: {b}")
                    break
            else:
                print(f"      (length mismatch only)")
        else:
            n_pass += 1
            print(f"  ✓ {name} ({len(srows)} rows)")
    print(f"\nPASS {n_pass}  FAIL {n_fail}  NO-ORACLE {n_noracle}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
