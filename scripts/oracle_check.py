#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`: reads each
<outDir>/<name>/ parquet result plus <outDir>/oracle_sql.json, executes the
oracle SQL in DuckDB against the same testdata parquet tables, and compares
values THE WAY THE DRIVER DOES: both sides are fetched into pandas
DataFrames (`res.df()`), columns sorted by name, rows sorted with
`DataFrame.sort_values` over all columns, then compared cell-by-cell on
python-native values. This deliberately reproduces the driver's failure
modes that a fetchall()+repr compare hides:

  * array/list output columns -> numpy.ndarray cells -> sort_values raises
    `TypeError: unhashable type: 'numpy.ndarray'` (driver ERR);
  * DuckDB HUGEINT (bare sum over ints) -> pandas float64 `39.0` vs Spark
    int64 `39` -> value mismatch (driver hash FAIL).

Exit code 1 if any query mismatches.

This script is NOT part of the shipped engine — it exists so oracle SQL is
validated locally before the driver runs it.
"""
import json, math, sys, glob, os
import duckdb


def canon_df(df):
    """Driver-shaped canonicalization: columns sorted by name, rows sorted
    by all columns (raises on unsortable cells, exactly like the driver)."""
    df = df[sorted(df.columns)]
    if len(df.columns) > 0 and len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cell_repr(v):
    # numpy scalar -> python scalar, so int32(5) == int64(5) == 5 but
    # float64(39.0) != int64(39), matching the driver's value hash.
    if hasattr(v, "item") and not isinstance(v, (bytes, str)):
        try:
            v = v.item()
        except Exception:
            pass
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        v = float(v)
    return repr(v)


def rows_of(df):
    return [tuple(cell_repr(v) for v in row)
            for row in df.itertuples(index=False, name=None)]


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noora = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        g_df = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        if name in skip:
            n_noora += 1
            print(f"SKIP {name}: {len(g_df)} rows (oracle skipped by flag)")
            continue
        if name not in oracles:
            n_noora += 1
            print(f"ROWS {name}: {len(g_df)} rows (no oracle)")
            continue
        try:
            e_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1
            continue
        try:
            g_can = canon_df(g_df)
            e_can = canon_df(e_df)
        except Exception as e:
            # This is the driver's ERR mode (e.g. ndarray cells).
            print(f"FAIL {name}: driver-style sort raised: "
                  f"{type(e).__name__}: {e}")
            n_fail += 1
            continue
        gc, ec = list(g_can.columns), list(e_can.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}"); n_fail += 1
            continue
        gr, er = rows_of(g_can), rows_of(e_can)
        if len(gr) != len(er):
            print(f"FAIL {name}: {len(gr)} rows vs oracle {len(er)}")
            n_fail += 1
        elif gr != er:
            bad = next(i for i in range(len(gr)) if gr[i] != er[i])
            print(f"FAIL {name}: first diff row {bad}:\n"
                  f"  spark  {gr[bad]}\n  oracle {er[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(gr)} rows"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    # --skip q1,q2: skip oracles that do not scale in DUCKDB (e.g. d04's
    # exhaustive all-pairs check is quadratic by design — provable-recall
    # argument — and is only run at sf<=0.1)
    args = [a for a in sys.argv[1:] if not a.startswith("--skip")]
    skip = tuple(a.split("=", 1)[1].split(",")
                 for a in sys.argv[1:] if a.startswith("--skip="))
    main(args[0] if len(args) > 0 else "/root/testdata/sf0.01",
         args[1] if len(args) > 1 else "/tmp/graft_verify",
         skip=skip[0] if skip else ())
