#!/usr/bin/env python3
"""check_oracle with a per-query wall-clock budget (for the sf1 matrix).

Usage: check_oracle_budget.py <sfDir> <verifyOutDir> [budget_seconds] [out_json]

Differences from check_oracle.py (the sf0.01 driver-gate stand-in):

- Each query's oracle run AND compare execute in a subprocess with a
  wall-clock budget; a query that blows it is reported TIMEOUT instead
  of hanging the matrix (the r9 lesson: the next scale cliff is often
  the ORACLE, not Spark).
- The value compare runs inside DuckDB as a two-way EXCEPT ALL over the
  sorted-by-name column list — an exact multiset compare that stays
  fast at sf1 row counts (millions), where the per-cell Python compare
  in check_oracle.py would take minutes per query. DuckDB's set-op type
  resolution coerces decimal/double the same way the Python `==` did;
  NaN hashes equal to NaN.
- The child hands results back via a temp file, not mp.Queue — a Queue
  payload larger than the pipe buffer deadlocks against join(timeout)
  and would mislabel big results as TIMEOUT.

Emits a per-query line and a final JSON summary (also written to
out_json when given): {"ok","total","failed","timeout","times"}.
"""
import json
import multiprocessing as mp
import os
import sys
import tempfile
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_one(sfdir, outdir, name, sql, result_path):
    res = {"status": "err", "detail": "unknown"}
    try:
        import duckdb
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
        t0 = time.time()
        con.execute(f"CREATE TEMP TABLE want AS {sql}")
        oracle_s = round(time.time() - t0, 2)
        con.execute(
            "CREATE TEMP TABLE got AS SELECT * FROM "
            f"parquet_scan('{outdir}/{name}/*.parquet')")
        wcols = sorted(r[0] for r in con.execute(
            "SELECT column_name FROM information_schema.columns "
            "WHERE table_name='want'").fetchall())
        gcols = sorted(r[0] for r in con.execute(
            "SELECT column_name FROM information_schema.columns "
            "WHERE table_name='got'").fetchall())
        if wcols != gcols:
            res = {"status": "fail",
                   "detail": f"columns spark={gcols} vs oracle={wcols}"}
        else:
            nw = con.execute("SELECT count(*) FROM want").fetchone()[0]
            ng = con.execute("SELECT count(*) FROM got").fetchone()[0]
            if nw != ng:
                res = {"status": "fail",
                       "detail": f"rows spark={ng} vs oracle={nw}"}
            else:
                cols = ", ".join(f'"{c}"' for c in wcols)
                extra = con.execute(
                    f"SELECT count(*) FROM (SELECT {cols} FROM got "
                    f"EXCEPT ALL SELECT {cols} FROM want)").fetchone()[0]
                missing = con.execute(
                    f"SELECT count(*) FROM (SELECT {cols} FROM want "
                    f"EXCEPT ALL SELECT {cols} FROM got)").fetchone()[0]
                if extra or missing:
                    res = {"status": "fail",
                           "detail": f"values differ: {extra} spark-only, "
                                     f"{missing} oracle-only of {nw} rows"}
                else:
                    res = {"status": "ok", "rows": nw, "oracle_s": oracle_s}
    except Exception as e:  # noqa: BLE001 — report, don't crash the matrix
        res = {"status": "err", "detail": str(e)[:500]}
    with open(result_path, "w") as f:
        json.dump(res, f)


def main(sfdir, outdir, budget, out_json):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed, timed_out, ok = [], [], []
    times = {}
    for name, sql in sorted(oracle.items()):
        fd, rpath = tempfile.mkstemp(suffix=".json")
        os.close(fd)
        t0 = time.time()
        p = mp.Process(target=run_one,
                       args=(sfdir, outdir, name, sql, rpath))
        p.start()
        p.join(budget)
        if p.is_alive():
            p.terminate()
            p.join()
            print(f"TIMEOUT {name}: exceeded {budget}s", flush=True)
            timed_out.append(name)
            times[name] = budget
            os.unlink(rpath)
            continue
        times[name] = round(time.time() - t0, 2)
        try:
            res = json.load(open(rpath))
        except Exception:
            res = {"status": "err", "detail": f"child died rc={p.exitcode}"}
        os.unlink(rpath)
        if res["status"] == "ok":
            print(f"OK   {name} ({res['rows']} rows, {times[name]}s, "
                  f"oracle {res['oracle_s']}s)", flush=True)
            ok.append(name)
        else:
            print(f"FAIL {name}: {res['detail']}", flush=True)
            failed.append(name)
    print()
    print(f"{len(ok)}/{len(oracle)} oracle-matched; "
          f"failed: {failed or 'none'}; timeout: {timed_out or 'none'}")
    summary = {"sf_dir": sfdir, "budget_s": budget,
               "ok": len(ok), "total": len(oracle),
               "failed": failed, "timeout": timed_out,
               "times": {k: v for k, v in sorted(
                   times.items(), key=lambda kv: -kv[1])}}
    print(json.dumps(summary))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(summary, f, indent=1)
    return 1 if (failed or timed_out) else 0


if __name__ == "__main__":
    b = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    oj = sys.argv[4] if len(sys.argv) > 4 else None
    sys.exit(main(sys.argv[1], sys.argv[2], b, oj))
