#!/usr/bin/env python3
"""Generate the sf10-equivalent spot-bench data: a 100x SELF-CONSISTENT
replication of sf0.1 under target/sf10.0x (measurement harness ONLY —
never a correctness input; correctness always runs against the
driver-generated /root/testdata). Third point of the scaling curve:
sf0.1 -> sf1.0x (10x, make_sf10x.py) -> sf10.0x (100x, this script),
two decades of data growth for the headline serial set.

Same replication scheme as make_sf10x.py — per replica i in 0..99
every key column shifts by a clean offset (orderkey +1e6*i,
custkey/partkey/doc_id/vec_id +1e5*i, suppkey +1e4*i, event_id
+1e6*i; every base max key < its offset, verified, so replicas never
collide) and each replica's document text gets a ' rep<i>' suffix so
cross-replica texts are not EXACT twins. They remain near-dups by
construction (shared shingles scale df ~100x, pair space ~10^4x), so
judge dedup-family times at this SF against PAIR space, not row
count — same caveat as the 10x corpus, squared. Tiny dims (region,
nation) stay fixed, as at any real SF.

Usage: python3 tools/make_sf100x.py  (from /root/repo)
Then:  SPARK_GRAFT_SF_DIR=/root/repo/target/sf10.0x \
       SPARK_GRAFT_BENCH_ONLY="<headliners>" SPARK_GRAFT_BENCH_REPEAT=2 \
       SBT_OPTS=-Xmx48g sbt -batch "runMain graft.Bench"
"""
import os, time
import duckdb

S = "/root/testdata/sf0.1"
D = "target/sf10.0x"
os.makedirs(D, exist_ok=True)
con = duckdb.connect()
R = "(SELECT unnest(range(100)) AS i)"


def gen(t, sql):
    t0 = time.time()
    con.sql(f"COPY ({sql}) TO '{D}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{D}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows in {time.time()-t0:.1f}s", flush=True)


gen("region", f"SELECT * FROM '{S}/region.parquet'")
gen("nation", f"SELECT * FROM '{S}/nation.parquet'")
gen("customer", f"""SELECT c_custkey + i*100000 AS c_custkey, c_name,
    c_nationkey, c_acctbal, c_mktsegment FROM '{S}/customer.parquet', {R}""")
gen("supplier", f"""SELECT s_suppkey + i*10000 AS s_suppkey, s_name,
    s_nationkey, s_acctbal FROM '{S}/supplier.parquet', {R}""")
gen("part", f"""SELECT p_partkey + i*100000 AS p_partkey, p_name, p_brand,
    p_type, p_size, p_retailprice FROM '{S}/part.parquet', {R}""")
gen("orders", f"""SELECT o_orderkey + i*1000000 AS o_orderkey,
    o_custkey + i*100000 AS o_custkey, o_orderstatus, o_totalprice,
    o_orderdate, o_orderpriority FROM '{S}/orders.parquet', {R}""")
gen("lineitem", f"""SELECT l_orderkey + i*1000000 AS l_orderkey,
    l_partkey + i*100000 AS l_partkey, l_suppkey + i*10000 AS l_suppkey,
    l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
    l_returnflag, l_linestatus, l_shipdate FROM '{S}/lineitem.parquet', {R}""")
gen("events", f"""SELECT event_id + i*1000000 AS event_id, ts,
    user_id + i*100000 AS user_id, event_type, value, props
    FROM '{S}/events.parquet', {R}""")
gen("documents", f"""SELECT doc_id + i*100000 AS doc_id,
    text || ' rep' || CAST(i AS VARCHAR) AS text, lang, source,
    CAST(length(text || ' rep' || CAST(i AS VARCHAR)) AS BIGINT) AS n_chars
    FROM '{S}/documents.parquet', {R}""")
gen("embeddings", f"""SELECT vec_id + i*100000 AS vec_id, embedding, label
    FROM '{S}/embeddings.parquet', {R}""")
