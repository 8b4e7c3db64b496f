#!/usr/bin/env python3
"""Derive a ~sf1 stress dataset from the driver's sf0.1 parquet.

Usage: python3 tools/make_sf1.py [srcDir] [dstDir] [factor]
Defaults: /root/testdata/sf0.1 -> ./testdata-sf1, factor 10.

NOT a data generator — a key-offset scale-up of the DRIVER's tables so
every gate can run at 10x rows and surface width/cap bounds (decimal
overflow, posting-list caps, window state) before real data does.
Copy i of each fact table offsets its keys by i*stride (stride = max
key + 1), preserving FK integrity (orders.o_custkey and
lineitem.l_orderkey shift in lockstep with their parents). region and
nation are dims and stay as-is. Arrow round-trip preserves the exact
physical types (events keeps its ns timestamps).
"""
import sys, os
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: stride-source-table}; stride of X = max(key in X)+1
OFFSETS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
KEY = {"customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
       "orders": "o_orderkey", "events": "event_id",
       "documents": "doc_id", "embeddings": "vec_id"}


def main(src, dst, factor):
    os.makedirs(dst, exist_ok=True)
    strides = {}
    for t, k in KEY.items():
        col = pq.read_table(f"{src}/{t}.parquet", columns=[k])[k]
        strides[t] = pc.max(col).as_py() + 1
    for t in ["region", "nation"]:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"),
                       f"{dst}/{t}.parquet")
    for t, offs in OFFSETS.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        copies = [base]
        for i in range(1, factor):
            cols = []
            for name in base.column_names:
                c = base[name]
                if name in offs:
                    c = pc.add(c, pa.scalar(i * strides[offs[name]],
                                            type=c.type))
                cols.append(c)
            copies.append(pa.table(cols, schema=base.schema))
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {len(base)} -> {len(out)} rows")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "/root/testdata/sf0.1",
         a[1] if len(a) > 1 else
         os.path.join(os.path.dirname(os.path.dirname(
             os.path.abspath(__file__))), "testdata-sf1"),
         int(a[2]) if len(a) > 2 else 10)
