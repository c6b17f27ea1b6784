#!/usr/bin/env python3
"""Dev probe: max-per-node rank delta per PageRank round (integer
nano-unit recurrence, same as GraphQueries.pagerankStep) on a given
sf dir — used to pin the epsilon for q_pagerank_eps so the
convergence count is known per scale factor.
"""
import sys
import duckdb

d = sys.argv[1]
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 30
con = duckdb.connect()
con.execute("SET threads=1")
con.execute(f"""
CREATE TABLE pairs AS
SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
FROM '{d}/orders.parquet' o JOIN '{d}/lineitem.parquet' l
  ON o_orderkey = l_orderkey""")
con.execute("""
CREATE TABLE edges AS
SELECT c AS src, s AS dst FROM pairs
UNION ALL SELECT s AS src, c AS dst FROM pairs""")
con.execute("""CREATE TABLE deg AS
SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src""")
con.execute("""CREATE TABLE r0 AS
SELECT src AS node, CAST(1000000000 AS BIGINT) AS r FROM deg""")
prev = "r0"
for k in range(1, rounds + 1):
    cur = f"r{k}"
    con.execute(f"""CREATE TABLE {cur} AS
SELECT e.dst AS node,
       CAST(150000000 + (85 * SUM(r.r // d.deg)) // 100 AS BIGINT) AS r
FROM edges e JOIN deg d ON d.src = e.src JOIN {prev} r ON r.node = e.src
GROUP BY e.dst""")
    delta = con.execute(f"""SELECT max(abs(a.r - b.r))
FROM {cur} a JOIN {prev} b ON a.node = b.node""").fetchone()[0]
    print(f"round {k:2d} max_delta {delta}")
    prev = cur
