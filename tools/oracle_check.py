#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Reads the parquet dumps produced by `graft.Verify` (one dir per query) plus
`oracle_sql.json`, runs each oracle SQL in DuckDB against the same
`{sfDir}/*.parquet` tables, and compares values after sorting columns by
name — the same shape of comparison the driver performs. Dev-only tool; the
shipped engine (src/main/scala) has no Python dependency.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [jsonOut]

With a third argument, also writes a per-query JSON record in the driver's
CORRECTNESS_r{N}.json schema ({name: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}}) — the committed self-artifact
(CORRECTNESS_SELF_r{N}.json) that keeps a round evidence-carrying even if
the driver-side artifact pipeline fails (VERDICT r7 #3/#4).
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def cell(v):
    # canonical scalar: numpy -> python, NaN/None -> None, float -> repr
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return repr(v)
    if hasattr(v, "item") and not isinstance(v, (list, tuple)):
        try:
            return cell(v.item())
        except Exception:
            pass
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(cell(x) for x in v)
    return v


def table_repr(df: pd.DataFrame):
    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]


def main(sf_dir: str, out_dir: str, json_out: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table (directory of part files) — e.g. the
            # ScaleFixture sf1 corpus; the driver-generated testdata SFs
            # are single files.
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    # Iterate the EXPECTED inventory (manifest written by Verify, falling
    # back to oracle keys ∪ dump dirs) so a query whose Spark execution
    # failed — no dump dir at all — counts as FAIL instead of vanishing.
    manifest = os.path.join(out_dir, "queries.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            expected = sorted(set(json.load(f)) | set(oracle))
    else:
        dirs = [d for d in os.listdir(out_dir)
                if os.path.isdir(os.path.join(out_dir, d))]
        expected = sorted(set(dirs) | set(oracle))

    errs = {}
    errf = os.path.join(out_dir, "errors.json")
    if os.path.exists(errf):
        with open(errf) as f:
            errs = json.load(f)

    n_pass = n_fail = n_noracle = 0
    records = {}

    def rec(name, rows=None, schema=None, hsh=None, sr=None, orr=None, err=None):
        records[name] = {"rows_match": rows, "schema_match": schema,
                         "hash_match": hsh, "spark_rows": sr,
                         "oracle_rows": orr, "err": err}
        # Incremental flush: a long pass killed mid-run (e.g. a DuckDB
        # oracle spilling the disk full at sf1) keeps every completed
        # query's record instead of losing the whole run.
        if json_out:
            with open(json_out, "w") as f:
                json.dump(records, f, indent=1, sort_keys=True)

    for name in expected:
        qdir = os.path.join(out_dir, name)
        # A recorded error wins even when a dump dir exists: a RUNTIME
        # failure after mode("overwrite") deletes the old dump leaves a
        # parquet-less dir behind, and read_parquet on it would abort the
        # whole gate instead of failing one query.
        if name in errs:
            print(f"  [FAIL] {name}: {errs[name]}")
            rec(name, False, False, False, err=str(errs[name]))
            n_fail += 1
            continue
        if not os.path.isdir(qdir):
            print(f"  [FAIL] {name}: no dump dir (spark execution failed)")
            rec(name, False, False, False, err="no dump dir (spark execution failed)")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(qdir))
        except Exception as e:
            print(f"  [FAIL] {name}: unreadable dump: {e}")
            rec(name, False, False, False, err=f"unreadable dump: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: rows={len(got)}")
            if len(got) == 0:
                print(f"    !! EMPTY RESULT")
                rec(name, False, None, None, sr=0, err="rows-only query returned 0 rows")
                n_fail += 1
            else:
                rec(name, True, None, None, sr=len(got))
            continue
        try:
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            rec(name, False, False, False, sr=len(got), err=f"oracle SQL error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"  [FAIL] {name}: columns {list(got.columns)} != {list(want.columns)}")
            rec(name, len(got) == len(want), False, False,
                sr=len(got), orr=len(want),
                err=f"columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        g, w = table_repr(got), table_repr(want)
        if g == w:
            n_pass += 1
            print(f"  [ok]   {name}: {len(g)} rows")
            rec(name, True, True, True, sr=len(g), orr=len(w))
        else:
            n_fail += 1
            print(f"  [FAIL] {name}: rows {len(g)} vs {len(w)}")
            rec(name, len(g) == len(w), True, False, sr=len(g), orr=len(w),
                err="value mismatch")
            for i, (a, b) in enumerate(zip(g, w)):
                if a != b:
                    print(f"    first diff at row {i}:\n      spark:  {a}\n      duckdb: {b}")
                    break
            else:
                if len(g) != len(w):
                    print(f"    row-count mismatch; spark[0]={g[0] if g else None} duckdb[0]={w[0] if w else None}")
    print(f"PASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_noracle}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
        print(f"wrote {len(records)} records to {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
