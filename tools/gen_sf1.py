#!/usr/bin/env python3
"""Generate a local sf1 set (10x sf0.1) for scale smoke-testing, under
target/sf1 (gitignored). Facts replicate 10x with INTERLEAVED ids
(id*10+copy), so id-based slice predicates in the catalog (doc_id < 250
history splits, vec_id < 5 ANN query sets, vec_id % 40 batch tags) keep
their proportional semantics; dimension tables stay fixed (dims grow
slower than facts in any real warehouse). Document text gets a per-copy
token suffix so the corpus DUP-RATE stays constant instead of giving
every doc 9 exact clones; embeddings replicate verbatim (identical
vectors are legal and common — exact-dup corpora)."""
import duckdb, glob, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
for p in glob.glob(f"{src}/*.parquet"):
    con.sql(f"CREATE VIEW {os.path.basename(p).replace('.parquet','')} "
            f"AS SELECT * FROM read_parquet('{p}')")

copies = "(SELECT unnest(range(0, 10)) AS i) c"

def emit(table, sql):
    con.sql(f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")

for dim in ["region", "nation", "customer", "supplier", "part"]:
    emit(dim, f"SELECT * FROM {dim}")

emit("orders", f"""
  SELECT o_orderkey * 10 + c.i AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders CROSS JOIN {copies}""")

emit("lineitem", f"""
  SELECT l_orderkey * 10 + c.i AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM lineitem CROSS JOIN {copies}""")

emit("events", f"""
  SELECT event_id * 10 + c.i AS event_id, ts, user_id * 10 + c.i AS user_id,
         event_type, value, props
  FROM events CROSS JOIN {copies}""")

emit("documents", f"""
  SELECT doc_id * 10 + c.i AS doc_id,
         CASE WHEN c.i = 0 THEN text
              ELSE array_to_string(
                     list_transform(string_split(text, ' '),
                                    t -> t || '_c' || CAST(c.i AS VARCHAR)), ' ')
         END AS text,
         lang, source,
         CAST(len(CASE WHEN c.i = 0 THEN text
              ELSE array_to_string(
                     list_transform(string_split(text, ' '),
                                    t -> t || '_c' || CAST(c.i AS VARCHAR)), ' ')
              END) AS BIGINT) AS n_chars
  FROM documents CROSS JOIN {copies}""")

emit("embeddings", f"""
  SELECT vec_id * 10 + c.i AS vec_id, embedding, label
  FROM embeddings CROSS JOIN {copies}""")
