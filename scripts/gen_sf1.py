#!/usr/bin/env python3
"""Dev-only sf1 upscaler (VERDICT r2 item 8: 10x-data stress check).

Builds a relationally consistent ~sf1 dataset from the driver's sf0.1
tables by unioning 10 key-shifted copies: every foreign key moves by the
same stride as its referenced primary key, so join cardinalities scale
linearly and no dangling references appear. Fixed-cardinality dims
(region, nation) stay as-is, like real TPC-H scaling.

Copies are perturbed where exact duplicates would distort the query under
test rather than stress it:
  - documents.text gets a per-copy suffix (otherwise every doc becomes a
    10-way exact duplicate and the dedup family degenerates);
  - embeddings get one coordinate nudged per copy (otherwise cosine
    distances tie 10-way and top-k becomes order-unstable in BOTH engines,
    which tests the comparator, not the operator).

Output: /tmp/graft_sf1/*.parquet. NOT part of the shipped engine; the
engine is tested against this data via graft.Verify + oracle_check.py.
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key strides, safely beyond every sf0.1 key domain
OK = 10_000_000   # orderkey
CK = 1_000_000    # custkey
PK = 1_000_000    # partkey
SK = 100_000      # suppkey
EV = 10_000_000   # event_id
UID = 1_000_000   # user_id
DOC = 1_000_000   # doc_id
VEC = 1_000_000   # vec_id

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")


def gen(table, sql_per_copy, copies=COPIES):
    parts = " UNION ALL ".join(sql_per_copy(i) for i in range(copies))
    con.execute(f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


# fixed dims: copy through unchanged
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

gen("customer", lambda i:
    f"SELECT c_custkey + {i * CK} AS c_custkey, c_name, c_nationkey,"
    f" c_acctbal, c_mktsegment FROM {src('customer')}")

gen("supplier", lambda i:
    f"SELECT s_suppkey + {i * SK} AS s_suppkey, s_name, s_nationkey,"
    f" s_acctbal FROM {src('supplier')}")

gen("part", lambda i:
    f"SELECT p_partkey + {i * PK} AS p_partkey, p_name, p_brand, p_type,"
    f" p_size, p_retailprice FROM {src('part')}")

gen("orders", lambda i:
    f"SELECT o_orderkey + {i * OK} AS o_orderkey,"
    f" o_custkey + {i * CK} AS o_custkey, o_orderstatus, o_totalprice,"
    f" o_orderdate, o_orderpriority FROM {src('orders')}")

gen("lineitem", lambda i:
    f"SELECT l_orderkey + {i * OK} AS l_orderkey,"
    f" l_partkey + {i * PK} AS l_partkey,"
    f" l_suppkey + {i * SK} AS l_suppkey,"
    f" l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
    f" l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}")

gen("events", lambda i:
    f"SELECT event_id + {i * EV} AS event_id, ts,"
    f" user_id + {i * UID} AS user_id, event_type, value, props"
    f" FROM {src('events')}")

gen("documents", lambda i:
    f"SELECT doc_id + {i * DOC} AS doc_id,"
    + ("text," if i == 0 else f"text || ' c{i}' AS text,")
    + f" lang, source, n_chars + {0 if i == 0 else len(f' c{i}')} AS n_chars"
    f" FROM {src('documents')}")

# nudge coordinate (vec_id % len) by i/1000 — breaks 10-way cosine ties
# without moving neighborhoods
gen("embeddings", lambda i:
    f"SELECT vec_id + {i * VEC} AS vec_id,"
    f" list_transform(embedding, (x, j) ->"
    f"   CAST(CASE WHEN j - 1 = vec_id % len(embedding)"
    f"        THEN x + {i} * 0.001 ELSE x END AS FLOAT)) AS embedding,"
    f" label FROM {src('embeddings')}")

print(f"done -> {DST}")
