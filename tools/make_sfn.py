"""Scale-up testdata generator: tile the driver's sf0.1 tables K times
with key-shifted copies, preserving referential integrity, so the full
parity gate can run at sf1.0 (~6 M lineitem rows) — 10x the bench scale.

Why tiling (vs a fresh generator): the parity gate compares Spark vs
DuckDB on the SAME parquet, so any same-schema data works; tiling keeps
the per-key distributions of the driver's data byte-for-byte while
pushing aggregate magnitudes past the 2^53 decimal->double cliff that
sf0.01 can never reach (the known class of sf-dependent divergence).

Tiling rules (tile i in 0..K-1):
- region/nation: tiny dims, copied once (FKs from tiled tables still
  resolve because nationkeys are not shifted);
- customer/supplier/part/orders/lineitem: primary keys shift by
  i*(max(key)+1); FK columns shift by the same stride as their target, so
  every tile is a self-contained TPC-H-ish sub-universe;
- events: event_id and user_id shift (each tile = new users with the
  same activity shape, so per-user window/tie behavior matches sf0.1);
- documents: doc_id shifts, text kept verbatim — the 10-way exact-dup
  clusters that creates are a feature (dedup operators at scale);
- embeddings: vec_id shifts and each component gets +i*1e-4 so tiled
  vectors are distinct (identical vectors would create giant cosine-tie
  surfaces that no top-k tiebreak contract promises to order).

Usage: python tools/make_sfn.py [SRC_DIR] [DST_DIR] [K]
Defaults: /root/testdata/sf0.1  /root/repo/.sf1  10
"""

from __future__ import annotations

import os
import sys

import duckdb


def build(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{src}/{t}.parquet'"
        )
    # stride = max+1: several tables are 0-based, and a max-only stride
    # collides tile i's lowest ids with tile i-1's highest (observed:
    # duplicate vec_id rows with different vectors made Spark and DuckDB
    # legitimately disagree on join/window row choice)
    strides = {
        n: con.execute(f"SELECT MAX({key}) + 1 FROM {n}").fetchone()[0]
        for n, key in [
            ("customer", "c_custkey"),
            ("supplier", "s_suppkey"),
            ("part", "p_partkey"),
            ("orders", "o_orderkey"),
            ("events", "event_id"),
            ("documents", "doc_id"),
            ("embeddings", "vec_id"),
        ]
    }
    max_user = con.execute("SELECT MAX(user_id) + 1 FROM events").fetchone()[0]

    def emit(name: str, select: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{dst}/{name}.parquet'"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    tiles = f"(SELECT UNNEST(range({k})) AS i) t"
    emit("region", "SELECT * FROM region")
    emit("nation", "SELECT * FROM nation")
    emit(
        "customer",
        f"SELECT c_custkey + i*{strides['customer']} AS c_custkey, c_name, "
        f"c_nationkey, c_acctbal, c_mktsegment FROM customer, {tiles}",
    )
    emit(
        "supplier",
        f"SELECT s_suppkey + i*{strides['supplier']} AS s_suppkey, s_name, "
        f"s_nationkey, s_acctbal FROM supplier, {tiles}",
    )
    emit(
        "part",
        f"SELECT p_partkey + i*{strides['part']} AS p_partkey, p_name, "
        f"p_brand, p_type, p_size, p_retailprice FROM part, {tiles}",
    )
    emit(
        "orders",
        f"SELECT o_orderkey + i*{strides['orders']} AS o_orderkey, "
        f"o_custkey + i*{strides['customer']} AS o_custkey, o_orderstatus, "
        f"o_totalprice, o_orderdate, o_orderpriority FROM orders, {tiles}",
    )
    emit(
        "lineitem",
        f"SELECT l_orderkey + i*{strides['orders']} AS l_orderkey, "
        f"l_partkey + i*{strides['part']} AS l_partkey, "
        f"l_suppkey + i*{strides['supplier']} AS l_suppkey, "
        f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        f"l_returnflag, l_linestatus, l_shipdate FROM lineitem, {tiles}",
    )
    emit(
        "events",
        f"SELECT event_id + i*{strides['events']} AS event_id, ts, "
        f"user_id + i*{max_user} AS user_id, event_type, value, props "
        f"FROM events, {tiles}",
    )
    emit(
        "documents",
        f"SELECT doc_id + i*{strides['documents']} AS doc_id, text, lang, "
        f"source, n_chars FROM documents, {tiles}",
    )
    emit(
        "embeddings",
        f"SELECT vec_id + i*{strides['embeddings']} AS vec_id, "
        f"list_transform(embedding, x -> CAST(x + i*0.0001 AS FLOAT)) "
        f"AS embedding, label FROM embeddings, {tiles}",
    )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    build(src, dst, k)
