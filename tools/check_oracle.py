#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

Registers each parquet table as a DuckDB view, runs every SQL in
oracle_sql.json, and compares against the Spark-written parquet in
<verifyOutDir>/<name>/ : row count, column names (sorted), dtypes, and
exact values.  Reports near-misses (float tolerance) separately so
determinism gaps are visible before the real driver run.  With the
optional third argument, also writes a per-query JSON artifact in the
driver's CORRECTNESS_r{N}.json shape (rows/schema/hash match booleans) —
used to commit CORRECTNESS_SCALE.json for the scaled multibyte corpora.
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    import os
    con = duckdb.connect()
    # 100x-decade runs: DuckDB's default memory limit (80% of RAM) lets
    # blocking operators build giant in-memory state whose spill can
    # exceed the free disk (observed: dedup_cluster's shared-shingle
    # pair join at scaledata/sf10 filled the device). A bounded limit
    # spills earlier but far smaller. Optional, driver-compatible:
    # unset means DuckDB defaults, as the real driver runs.
    for pragma, env in [("memory_limit", "GRAFT_DUCKDB_MEMLIMIT"),
                        ("threads", "GRAFT_DUCKDB_THREADS"),
                        ("temp_directory", "GRAFT_DUCKDB_TEMPDIR")]:
        v = os.environ.get(env)
        if v:
            # DuckDB SET does not accept bound parameters, so escape
            # single quotes instead — a value containing one otherwise
            # breaks the statement confusingly
            con.execute(f"""SET {pragma}='{v.replace("'", "''")}'""")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if not (os.path.exists(p) or glob.glob(p)):
            continue  # partial scaling dirs (e.g. 100x documents/events/embeddings)
        # driver testdata is a single parquet file; Spark-written scaling
        # dirs are directories of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        if t == "events":
            # driver testdata stores ts as TIMESTAMP(NANOS) (DuckDB:
            # naive TIMESTAMP); Spark-written scaling dirs store the raw
            # INT64 nanos (Spark cannot write nanos timestamps). Present
            # both identically by deriving micros the same way
            # Tables.events does (ts DIV 1000 -> timestamp_micros).
            kind = con.execute(
                f"SELECT typeof(ts) FROM '{src}' LIMIT 1").fetchone()[0]
            if kind == "BIGINT":
                # Spark DIV truncates toward zero; DuckDB // floors. They
                # differ by 1 us on negative (pre-epoch) nanos, so spell
                # out truncation explicitly to match Tables.events.
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * REPLACE "
                    f"(make_timestamp(CASE WHEN ts >= 0 THEN ts // 1000 "
                    f"ELSE -((-ts) // 1000) END) AS ts) FROM '{src}'")
                continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    report = {}

    def record(name, ok, spark_rows=None, oracle_rows=None, err=None):
        report[name] = {
            "rows_match": ok if err is None else None,
            "schema_match": ok if err is None else None,
            "hash_match": ok if err is None else None,
            "spark_rows": spark_rows, "oracle_rows": oracle_rows,
            "err": err}

    # mirror the driver: registered queries WITHOUT oracle SQL appear as
    # no_oracle rows (rows-only evidence), keyed off the Verify out dirs
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").rsplit("/", 1)[-1]
        if name not in oracle:
            try:
                nrows = con.execute(
                    f"SELECT count(*) FROM read_parquet('{d}*.parquet')"
                ).fetchone()[0]
            except Exception:
                nrows = None
            record(name, None, spark_rows=nrows, err="no_oracle")

    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            record(name, False, err="no spark output"); continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1
            record(name, False, err=str(e)[:200]); continue
        probs = []
        if list(got.columns) != list(exp.columns):
            probs.append(f"cols got={list(got.columns)} exp={list(exp.columns)}")
        elif len(got) != len(exp):
            probs.append(f"rows got={len(got)} exp={len(exp)}")
        else:
            for c in got.columns:
                if str(got[c].dtype) != str(exp[c].dtype):
                    probs.append(f"dtype[{c}] got={got[c].dtype} exp={exp[c].dtype}")
            if not probs:
                for c in got.columns:
                    g, e = got[c], exp[c]
                    if g.dtype.kind == 'f':
                        eq = (g.fillna(np.nan)).equals(e.fillna(np.nan))
                        if not eq:
                            close = np.allclose(g.fillna(0), e.fillna(0),
                                                rtol=1e-9, atol=1e-9, equal_nan=True)
                            mism = int((~((g == e) | (g.isna() & e.isna()))).sum())
                            probs.append(f"val[{c}] {mism} mismatches"
                                         + (" (within 1e-9: NEAR-MISS)" if close else ""))
                    else:
                        eqmask = (g == e) | (g.isna() & e.isna())
                        if not bool(eqmask.all()):
                            i = int((~eqmask).idxmax())
                            probs.append(f"val[{c}] {int((~eqmask).sum())} mismatches "
                                         f"e.g. row {i}: got={g.iloc[i]!r} exp={e.iloc[i]!r}")
        if probs:
            print(f"FAIL {name}: " + "; ".join(probs[:4])); n_fail += 1
            report[name] = {
                "rows_match": len(got) == len(exp),
                "schema_match": list(got.columns) == list(exp.columns),
                "hash_match": False,
                "spark_rows": len(got), "oracle_rows": len(exp),
                "err": "; ".join(probs[:4])[:200]}
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
            record(name, True, spark_rows=len(got), oracle_rows=len(exp))
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} total")
    if len(sys.argv) > 3:
        # provenance header: which corpus/HEAD/date this artifact
        # certifies — the three-scale gate is auditable from the
        # artifacts alone ("_meta" sorts before the lowercase query ids)
        import datetime
        import subprocess
        try:
            head = subprocess.run(
                ["git", "-C", os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), "rev-parse", "HEAD"],
                capture_output=True, text=True, timeout=10).stdout.strip()
        except Exception:
            head = None
        n_no_oracle = sum(1 for v in report.values()
                          if v.get("err") == "no_oracle")
        meta = {
            "sf_dir": os.path.abspath(sf_dir),
            "verify_dir": os.path.abspath(out_dir),
            "git_head": head or None,
            "date_utc": datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds"),
            "queries_total": len(report),
            "oracled": len(oracle),
            "no_oracle": n_no_oracle,
            "oracled_pass": n_pass,
            "oracled_fail": n_fail,
        }
        out = {"_meta": meta}
        out.update(dict(sorted(report.items())))
        with open(sys.argv[3], "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {sys.argv[3]}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
