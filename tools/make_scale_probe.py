#!/usr/bin/env python3
"""Synthesize an N-times scale probe from an existing sf directory.

Usage: python3 tools/make_scale_probe.py <srcSfDir> <outDir> [replicas=10]

Replicates every fact/dim table `replicas` times with consistent key
offsets (offset = replica * (max_key + 1), applied to the key and every
foreign key that references it), so join selectivities and group sizes
match a genuinely larger scale factor. region/nation are fixed-size dims
and are copied once. Schemas are preserved exactly (pyarrow passthrough)
— in particular events.ts keeps whatever encoding the generator shipped
(TIMESTAMP(NANOS) historically, TIMESTAMP(MICROS) currently); graft.Tables
normalizes either on read.

Text/embedding payloads are replicated verbatim: replicas become exact
duplicates, which the dedup operators are SUPPOSED to find — output and
candidate volume stay linear in the corpus because LSH buckets hold
replica groups, not cross-products of unrelated docs.
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def max_plus_one(table, col):
    return pc.max(table.column(col)).as_py() + 1


def offset_col(table, col, delta):
    i = table.schema.get_field_index(col)
    typ = table.schema.field(i).type
    shifted = pc.cast(pc.add(table.column(col), delta), typ)
    return table.set_column(i, table.schema.field(i), shifted)


def main(src, out, replicas=10):
    import os

    os.makedirs(out, exist_ok=True)
    tables = {
        t: pq.read_table(f"{src}/{t}.parquet")
        for t in [
            "region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings",
        ]
    }
    # one offset constant per key-space, shared by key and foreign keys
    spans = {
        "cust": max_plus_one(tables["customer"], "c_custkey"),
        "supp": max_plus_one(tables["supplier"], "s_suppkey"),
        "part": max_plus_one(tables["part"], "p_partkey"),
        "order": max_plus_one(tables["orders"], "o_orderkey"),
        "event": max_plus_one(tables["events"], "event_id"),
        "user": max_plus_one(tables["events"], "user_id"),
        "doc": max_plus_one(tables["documents"], "doc_id"),
        "vec": max_plus_one(tables["embeddings"], "vec_id"),
    }
    # (table, [(column, key-space)]) — nation keys are NOT offset (fixed dim)
    plan = {
        "customer": [("c_custkey", "cust")],
        "supplier": [("s_suppkey", "supp")],
        "part": [("p_partkey", "part")],
        "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
        "lineitem": [("l_orderkey", "order"), ("l_partkey", "part"),
                     ("l_suppkey", "supp")],
        "events": [("event_id", "event"), ("user_id", "user")],
        "documents": [("doc_id", "doc")],
        "embeddings": [("vec_id", "vec")],
    }
    for t in ["region", "nation"]:
        pq.write_table(tables[t], f"{out}/{t}.parquet")
        print(f"{t}: copied ({len(tables[t])} rows)")
    for t, keys in plan.items():
        parts = []
        for r in range(replicas):
            rep = tables[t]
            for col, space in keys:
                rep = offset_col(rep, col, r * spans[space])
            parts.append(rep)
        combined = pa.concat_tables(parts)
        pq.write_table(combined, f"{out}/{t}.parquet")
        print(f"{t}: {len(tables[t])} -> {len(combined)} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
