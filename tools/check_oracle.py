#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (t2).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (SparkEntry.queries output),
runs <verifyOutDir>/oracle_sql.json[name] in DuckDB with views over the
sfDir parquet tables, sorts columns by name, and compares values.
Dev-only tool — not part of the Scala library.
"""
import sys, json, glob, math, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v, coerce_dec=False):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(canon(x, coerce_dec) for x in v)
    if v.__class__.__name__ == "Decimal":
        # Type-tagged by default: the driver's hash distinguishes DuckDB
        # HUGEINT/DECIMAL results from Spark int64/double — coercing to
        # float would hide exactly the mismatch that broke q23 in r1.
        # coerce_dec=True is used only AFTER the schema gate has already
        # failed the query, to report whether the VALUES at least agree
        # numerically (the key round-2 diagnostic signal).
        if coerce_dec:
            return float(v)
        return ("decimal", str(v))
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output at {qdir}")
            n_bad += 1
            continue
        spark_tbl = pq.read_table(files[0])
        try:
            duck = con.sql(sql).fetch_arrow_table()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}")
            n_bad += 1
            continue
        # The driver's pandas-layer hash treats Spark-parquet vs DuckDB
        # decimals as distinct even at identical declared precision
        # (r2: q27/q28/q29/s2/s4 value-matched here but hash-failed the
        # driver). Flag raw DECIMAL schemas ON EITHER SIDE as failures,
        # but still run the value comparison below — "values match but
        # schema is DECIMAL" vs "values differ too" was the key
        # diagnostic signal in round 2.
        dec_fail = None
        s_dec = [f.name for f in spark_tbl.schema
                 if "decimal" in str(f.type).lower()]
        d_dec = [f.name for f in duck.schema
                 if "decimal" in str(f.type).lower()]
        if s_dec or d_dec:
            side = []
            if s_dec:
                side.append(f"spark={s_dec}")
            if d_dec:
                side.append(f"duck={d_dec}")
            dec_fail = ("raw DECIMAL in final schema (" + ", ".join(side) +
                        ") — driver hash-fails these; cast to DOUBLE on both sides")
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            extra = f"; {dec_fail}" if dec_fail else ""
            print(f"[FAIL] {name}: columns spark={s_cols} duck={d_cols}{extra}")
            n_bad += 1
            continue
        coerce = dec_fail is not None
        s_rows = [tuple(canon(spark_tbl.column(c)[i].as_py(), coerce) for c in s_cols)
                  for i in range(spark_tbl.num_rows)]
        d_rows = [tuple(canon(duck.column(c)[i].as_py(), coerce) for c in d_cols)
                  for i in range(duck.num_rows)]
        if len(s_rows) != len(d_rows):
            extra = f"; {dec_fail}" if dec_fail else ""
            print(f"[FAIL] {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}{extra}")
            for i in range(min(3, len(s_rows))):
                print(f"   spark[{i}]: {s_rows[i]}")
            for i in range(min(3, len(d_rows))):
                print(f"   duck [{i}]: {d_rows[i]}")
            n_bad += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        if bad:
            extra = f"; {dec_fail}" if dec_fail else ""
            print(f"[FAIL] {name}: {len(bad)}/{len(s_rows)} rows differ; cols={s_cols}{extra}; first:")
            for i, a, b in bad[:3]:
                print(f"   row {i}:\n     spark={a}\n     duck ={b}")
            n_bad += 1
        elif dec_fail:
            print(f"[FAIL] {name}: {dec_fail} (values match)")
            n_bad += 1
        else:
            print(f"[ OK ] {name}: {len(s_rows)} rows match")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
