#!/usr/bin/env python3
"""Times the DuckDB oracle for the 15 bench HEADLINE queries — the
external denominator for the bench gate (VERDICT r12 task #4: the
reference publishes no numbers, so the honest baseline is the other
engine that provably computes the SAME answers every verify round).

Usage: python3 tools/duckdb_baseline.py <sfDir> <oracle_sql.json>

Prints one JSON object {query: seconds} (min of 2 materialized runs,
all cores — the same machine and the same parquet as graft.Bench) plus
a total. Paste the result into Bench.DuckDbBaselineSec and BASELINE.md.
"""
import json, sys, time
import duckdb

HEADLINE = [
    "agg_group", "join_fk", "topk", "agg_cube", "join_asof",
    "dedup_minhash", "dedup_clusters", "sim_topk_brute", "text_tfidf",
    "pipeline_full_etl", "src_parquet", "stream_window_agg",
    "pipeline_training_corpus", "sim_topk_ivf_kmeans", "dedup_incremental",
]

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def main(sf_dir, oracle_json):
    oracles = json.load(open(oracle_json))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    out = {}
    for name in HEADLINE:
        sql = oracles[name]
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            con.sql(sql).fetchall()
            runs.append(time.monotonic() - t0)
        out[name] = round(min(runs), 3)
        print(f"  {name}: {runs}", file=sys.stderr)
    out["__total"] = round(sum(v for k, v in out.items()
                               if not k.startswith("__")), 3)
    out["__sf_dir"] = sf_dir
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
