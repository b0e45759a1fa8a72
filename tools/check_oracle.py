#!/usr/bin/env python3
"""Local simulation of the driver's t2 correctness gate: run each
oracle SQL from Verify's oracle_sql.json in DuckDB over the same
parquet tables, and compare with the Spark result parquet
(columns sorted by name, rows in output order, values stringified).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--json OUT.json]
           [--query NAME[,NAME...]]

--query restricts the run to the named queries and, on any mismatch,
dumps the first differing row with per-value Python types on both
sides (the r10 q_chunk_bpe driver red was a type divergence invisible
to the value dump alone).

Every oracle's output schema is also audited for DuckDB types that do
not survive a pandas conversion losslessly (HUGEINT -> float64 etc.);
those WARN even when the fetchall() comparison passes, because the
driver's fetch path may differ from this script's.

With --json, also writes a CORRECTNESS_r{N}.json-shaped record
(per-query rows_match/schema_match/hash_match/spark_rows/oracle_rows/
err) so bench_compare.py's --rows adjudication can consume local runs
directly.
"""
import sys, json, math, glob
import duckdb

json_out = None
if "--json" in sys.argv:
    i = sys.argv.index("--json")
    json_out = sys.argv[i + 1]
    del sys.argv[i:i + 2]

only = None
if "--query" in sys.argv:
    i = sys.argv.index("--query")
    only = set(sys.argv[i + 1].split(","))
    del sys.argv[i:i + 2]

# DuckDB output types that a pandas/arrow fetch renders differently
# than fetchall() (HUGEINT -> float64, DECIMAL -> Decimal/float):
# a driver using a dataframe fetch diverges even when this script's
# tuple compare passes.
LOSSY_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT", "DECIMAL")

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest repr == bit-exact comparison
    if isinstance(v, bool):
        return str(v)
    return str(v)


def table_of(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm(r[i]) for i in order) for r in rows]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    rec = {}
    def note(name, rows=None, schema=None, hash_=None,
             spark_rows=None, oracle_rows=None, err=None):
        rec[name] = {"rows_match": rows, "schema_match": schema,
                     "hash_match": hash_, "spark_rows": spark_rows,
                     "oracle_rows": oracle_rows, "err": err}
    lossy = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        try:
            o = con.sql(sql)
            o_cols = [c.lower() for c in o.columns]
            sus = [(c, str(t)) for c, t in zip(o.columns, o.types)
                   if any(str(t).startswith(lt) for lt in LOSSY_TYPES)]
            if sus:
                print(f"WARN {name}: pandas-lossy oracle output types {sus} "
                      f"- CAST them (driver fetch path may not be fetchall)")
                lossy += 1
            o_rows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            note(name, False, False, False, err=f"oracle error: {e}")
            fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            note(name, False, False, False, oracle_rows=len(o_rows),
                 err="no spark output")
            fail += 1
            continue
        s = con.sql(f"SELECT * FROM read_parquet({files!r})")
        s_cols = [c.lower() for c in s.columns]
        s_rows = s.fetchall()
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: cols oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            note(name, None, False, False, len(s_rows), len(o_rows),
                 "schema mismatch")
            fail += 1
            continue
        ot, st = table_of(o_rows, o_cols), table_of(s_rows, s_cols)
        if len(ot) != len(st):
            print(f"FAIL {name}: rows oracle={len(ot)} spark={len(st)}")
            note(name, False, True, False, len(st), len(ot), "row count")
            fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(ot, st)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(ot)} rows differ; first row {i}:")
            print(f"  oracle: {a}\n  spark : {b}")
            if only is not None:
                order = sorted(range(len(o_cols)), key=lambda k: o_cols[k])
                oraw = tuple(o_rows[i][k] for k in order)
                sraw = tuple(s_rows[i][k] for k in order)
                print(f"  cols  : {[o_cols[k] for k in order]}")
                print(f"  oracle raw: {[(v, type(v).__name__) for v in oraw]}")
                print(f"  spark  raw: {[(v, type(v).__name__) for v in sraw]}")
            note(name, True, True, False, len(st), len(ot),
                 f"{len(bad)} rows differ")
            fail += 1
        else:
            print(f"OK   {name} ({len(ot)} rows)")
            note(name, True, True, True, len(st), len(ot))
            ok += 1
    if lossy:
        print(f"WARN {lossy} oracle(s) emit pandas-lossy types (see above)")
    # rows-only check for oracle-less queries
    import os
    declared = set(oracle)
    for d in sorted(os.listdir(out_dir)):
        if only is not None:
            break
        if d.startswith("q_") and d not in declared:
            files = glob.glob(f"{out_dir}/{d}/*.parquet")
            n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
            print(f"{'OK  ' if n > 0 else 'WARN'} {d} rows-only ({n} rows)")
            note(d, spark_rows=n)
    # parity gate: every declared query must have produced an output dir.
    # Round 5 lost two broken queries SILENTLY (they errored during the
    # Spark run, left no dir, and the report looked green); diff against
    # the manifest so absence is a hard failure, not a blind spot.
    manifest = f"{out_dir}/declared_queries.json"
    if only is not None:
        manifest = ""  # subset run: parity over all declared is meaningless
    if manifest and os.path.exists(manifest):
        all_declared = set(json.load(open(manifest)))
        absent = sorted(n for n in all_declared
                        if not glob.glob(f"{out_dir}/{n}/*.parquet"))
        if absent:
            print(f"FAIL parity: {len(absent)} declared queries produced no "
                  f"output: {absent}")
            fail += len(absent)
    elif only is None:
        print("WARN parity: no declared_queries.json manifest "
              "(re-run Verify to generate it)")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
