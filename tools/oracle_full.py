"""Full-catalog oracle gate: run EVERY queries() entry against its
oracle_sql() via DuckDB at sf0.01 and write a CORRECTNESS_r*-format JSON
artifact covering all 358 entries (the driver samples only the head of the
catalog; this artifact is the committed evidence for the rest — round-4
VERDICT task 1).

Usage:
    python tools/oracle_full.py [--out ORACLE_FULL_r5.json] [--sf /root/testdata/sf0.01]
                                [--only name1,name2] [--start-at name]

Owns its Ray session (script entry point, not library code).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


KIND = {"i": "int", "u": "int", "f": "float", "M": "datetime",
        "m": "timedelta", "b": "bool", "O": "obj", "U": "obj", "S": "obj"}


def compare(got: pd.DataFrame, exp: pd.DataFrame) -> dict:
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": len(got), "oracle_rows": len(exp), "err": None}
    rec["rows_match"] = len(got) == len(exp)
    cols_ok = list(got.columns) == list(exp.columns)
    dtypes_ok = cols_ok and all(
        KIND.get(got[c].dtype.kind) == KIND.get(exp[c].dtype.kind)
        for c in got.columns)
    rec["schema_match"] = bool(dtypes_ok)
    if rec["rows_match"] and cols_ok:
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=True)
            rec["hash_match"] = True
        except AssertionError as e:
            rec["err"] = f"values: {str(e)[:200]}"
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ORACLE_FULL_r5.json")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--start-at", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="skip entries already hash-green in --out "
                         "(restart-after-crash mode: a known Ray 2.49 "
                         "task-manager crash can kill long sweeps; rerun "
                         "with --resume until DONE)")
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    names = list(qs)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]
    if args.start_at:
        names = names[names.index(args.start_at):]

    con = duckdb.connect()
    for p in glob.glob(f"{args.sf}/*.parquet"):
        t = p.rsplit("/", 1)[-1].removesuffix(".parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    out: dict[str, dict] = {}
    if os.path.exists(args.out) and (args.start_at or args.only
                                     or args.resume):
        with open(args.out) as f:
            out = json.load(f)
    if args.resume:
        names = [n for n in names
                 if not (n in out and out[n].get("hash_match"))]
        print(f"resume: {len(out)} done, {len(names)} to run", flush=True)

    t_all = time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            got = normalize(to_pandas(qs[name](args.sf)))
            sql = sqls.get(name)
            if sql is None:
                out[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(got),
                             "oracle_rows": None, "err": "rows-only"}
            else:
                exp = normalize(con.execute(sql).fetchdf())
                out[name] = compare(got, exp)
        except Exception:
            out[name] = {"rows_match": False, "schema_match": False,
                         "hash_match": False, "spark_rows": None,
                         "oracle_rows": None,
                         "err": traceback.format_exc()[-400:]}
        ok = out[name]["hash_match"]
        print(f"[{i+1}/{len(names)}] {name}: "
              f"{'PASS' if ok else 'FAIL'} ({time.time()-t0:.1f}s)",
              flush=True)
        if (i + 1) % 10 == 0:
            with open(args.out, "w") as f:
                json.dump(out, f, indent=2)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    n_pass = sum(1 for r in out.values() if r["hash_match"])
    print(f"DONE {n_pass}/{len(out)} hash-green in {time.time()-t_all:.0f}s")
    ray.shutdown()
    return 0 if n_pass == len(out) else 1


if __name__ == "__main__":
    sys.exit(main())
