#!/usr/bin/env python3
"""Dev-side scale-up generator (r13, the sf1 gate task).

Replicates an existing testdata scale factor K times with disjoint key
spaces, producing a decade-larger corpus that exercises the int64/
DECIMAL width budgets the sf0.01 gate never reaches (E11/E12 Q20 sums,
H6c token quotas, seed-hash wrap paths). This does NOT reproduce the
driver's generator bit-for-bit (that code is driver-side); it does not
need to — the correctness gate is self-consistent (Verify dumps Spark
results over dir X, check.py runs the DuckDB oracles over the SAME
dir X), so any schema-faithful corpus is a valid gate corpus.

Replica construction (replica 0 is the source verbatim):
 - every entity key shifts by k * stride(entity), strides disjoint
   powers of 10 above the source max, FKs remapped consistently;
 - document text gets every word suffixed with _rK (the ScaleSmoke
   novelty trick: same lengths/structure, disjoint shingles and
   fingerprints — a 10x corpus, not one corpus duplicated 10 times);
   n_chars recomputed;
 - embeddings get deterministic per-(vec, dim) hash noise (+-2% scale)
   so replica vectors are near but not exact duplicates;
 - events timestamps keep their values (the time axis is shared — a
   bigger corpus over the same window, which is how real traffic
   scales), ids/users shift.

Usage: python3 tools/gen_sf.py <srcDir> <outDir> <K>
e.g.:  python3 tools/gen_sf.py /root/testdata/sf0.1 /root/repo/testdata_sf1 10
"""
import os
import sys

import duckdb


def stride_above(con, expr, table):
    m = con.execute(f"SELECT max({expr}) FROM {table}").fetchone()[0] or 0
    s = 10
    while s <= m:
        s *= 10
    return s


def main(src, out, k):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{src}/{t}.parquet')")
    # fixed dimensions copy verbatim
    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM {t}) TO '{out}/{t}.parquet' "
                    f"(FORMAT PARQUET)")
    ks = stride_above(con, "c_custkey", "customer")
    ss = stride_above(con, "s_suppkey", "supplier")
    ps = stride_above(con, "p_partkey", "part")
    os_ = stride_above(con, "o_orderkey", "orders")
    es = stride_above(con, "event_id", "events")
    us = stride_above(con, "user_id", "events")
    ds = stride_above(con, "doc_id", "documents")
    vs = stride_above(con, "vec_id", "embeddings")
    rep = f"(SELECT unnest(range({k})) AS r)"
    sfx = ("CASE WHEN r = 0 THEN text ELSE "
           "regexp_replace(text, '(\\S+)', '\\1_r' || r, 'g') END")
    copies = {
        "customer": f"""SELECT c_custkey + r * {ks} AS c_custkey, c_name,
            c_nationkey, c_acctbal, c_mktsegment FROM customer, {rep}""",
        "supplier": f"""SELECT s_suppkey + r * {ss} AS s_suppkey, s_name,
            s_nationkey, s_acctbal FROM supplier, {rep}""",
        "part": f"""SELECT p_partkey + r * {ps} AS p_partkey, p_name,
            p_brand, p_type, p_size, p_retailprice FROM part, {rep}""",
        "orders": f"""SELECT o_orderkey + r * {os_} AS o_orderkey,
            o_custkey + r * {ks} AS o_custkey, o_orderstatus,
            o_totalprice, o_orderdate, o_orderpriority
            FROM orders, {rep}""",
        "lineitem": f"""SELECT l_orderkey + r * {os_} AS l_orderkey,
            l_partkey + r * {ps} AS l_partkey,
            l_suppkey + r * {ss} AS l_suppkey, l_linenumber, l_quantity,
            l_extendedprice, l_discount, l_tax, l_returnflag,
            l_linestatus, l_shipdate FROM lineitem, {rep}""",
        "events": f"""SELECT event_id + r * {es} AS event_id, ts,
            user_id + r * {us} AS user_id, event_type, value, props
            FROM events, {rep}""",
        "documents": f"""SELECT doc_id + r * {ds} AS doc_id,
            {sfx} AS text, lang, source,
            CAST(length({sfx}) AS BIGINT) AS n_chars
            FROM documents, {rep}""",
        "embeddings": f"""SELECT vec_id + r * {vs} AS vec_id,
            CASE WHEN r = 0 THEN embedding ELSE
              list_transform(embedding, (x, i) -> CAST(x +
                (CAST(hash((vec_id + r * {vs}) * 64 + i) % 1000 AS DOUBLE)
                 / 1000.0 - 0.5) * 0.04 * abs(x) AS FLOAT))
            END AS embedding, label FROM embeddings, {rep}""",
    }
    for t, q in copies.items():
        con.execute(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
