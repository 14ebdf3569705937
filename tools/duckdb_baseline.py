#!/usr/bin/env python3
"""Times the DuckDB oracle for the 15 bench HEADLINE queries — the
external denominator for the bench gate (VERDICT r12 task #4: the
reference publishes no numbers, so the honest baseline is the other
engine that provably computes the SAME answers every verify round).

Usage: python3 tools/duckdb_baseline.py <sfDir> <oracle_sql.json> [timeout_s]

Prints one JSON object {query: seconds} (min of 2 materialized runs,
all cores — the same machine and the same parquet as graft.Bench) plus
a total. Paste the result into Bench.DuckDbBaselineSec and BASELINE.md.

With a [timeout_s] argument each query runs in its OWN subprocess and
is killed at the limit (recorded as "timeout") — required at the 10×
corpus, where the exact all-pairs oracle spellings (dedup_minhash's
shingle self-join, dedup_clusters' recursive-CTE closure) grow
quadratically and can exceed any reasonable wall. A timeout is DATA,
not a failure: it is the honest record that the oracle spelling has no
feasible wall at that scale while the engine side does.
"""
import json, subprocess, sys, time

import duckdb

HEADLINE = [
    "agg_group", "join_fk", "topk", "agg_cube", "join_asof",
    "dedup_minhash", "dedup_clusters", "sim_topk_brute", "text_tfidf",
    "pipeline_full_etl", "src_parquet", "stream_window_agg",
    "pipeline_training_corpus", "sim_topk_ivf_kmeans", "dedup_incremental",
]

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def time_one(sf_dir, sql, runs=2):
    con = duckdb.connect()
    # queries >2s print a progress bar ON STDOUT in the python client,
    # which corrupts the subprocess JSON protocol — off for timing
    con.sql("SET enable_progress_bar = false")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    walls = []
    for _ in range(runs):
        t0 = time.monotonic()
        con.sql(sql).fetchall()
        walls.append(time.monotonic() - t0)
    return walls


def main(sf_dir, oracle_json, timeout=None):
    oracles = json.load(open(oracle_json))
    out = {}
    for name in HEADLINE:
        sql = oracles[name]
        if timeout is None:
            runs = time_one(sf_dir, sql)
            out[name] = round(min(runs), 3)
            print(f"  {name}: {runs}", file=sys.stderr)
        else:
            # subprocess isolation: a killed query can't wedge the rest
            code = (f"import json,sys; sys.path.insert(0, {sys.path[0]!r}); "
                    f"from duckdb_baseline import time_one; "
                    f"print(json.dumps(time_one({sf_dir!r}, "
                    f"json.load(open({oracle_json!r}))[{name!r}])))")
            try:
                r = subprocess.run([sys.executable, "-c", code],
                                   capture_output=True, text=True,
                                   timeout=timeout)
                # a child that died for a NON-timeout reason (SQL
                # error, OOM kill) leaves empty stdout / nonzero rc —
                # record it as an error instead of crashing the whole
                # baseline run on the splitlines()[-1] IndexError
                if r.returncode != 0 or not r.stdout.strip():
                    out[name] = "error"
                    print(f"  {name}: child failed rc={r.returncode} "
                          f"stderr={r.stderr.strip()[-200:]}",
                          file=sys.stderr)
                    continue
                try:
                    runs = json.loads(r.stdout.strip().splitlines()[-1])
                except ValueError:
                    # exit 0 but a non-JSON last line (late warning):
                    # record, don't crash the whole baseline run
                    out[name] = "error"
                    print(f"  {name}: unparseable child output "
                          f"{r.stdout.strip()[-200:]!r}", file=sys.stderr)
                    continue
                out[name] = round(min(runs), 3)
                print(f"  {name}: {runs}", file=sys.stderr)
            except subprocess.TimeoutExpired:
                out[name] = f"timeout>{timeout}s"
                print(f"  {name}: TIMEOUT at {timeout}s", file=sys.stderr)
    numeric = [v for v in out.values() if isinstance(v, float)]
    out["__total"] = round(sum(numeric), 3)
    out["__timeouts"] = sorted(k for k, v in out.items()
                               if isinstance(v, str) and "timeout" in v)
    out["__errors"] = sorted(k for k, v in out.items() if v == "error")
    out["__sf_dir"] = sf_dir
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else None)
