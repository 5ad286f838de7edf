#!/usr/bin/env python3
"""Scale-up generator: replicate a fixture sf directory K times with
key-domain offsets, producing an sf1-class dataset for the scaling
bench (driver-side harness tooling, like check.py — the engine itself
stays Scala).

Usage: python3 tools/scalegen.py <srcSfDir> <dstDir> <K>

Each copy i>0 shifts every key/FK column by i*10^8, so referential
integrity is preserved copy-locally (copy i's lineitems point at copy
i's orders, etc). Non-key payloads (texts, embeddings, timestamps,
prices) are replicated verbatim: documents become a 1/K-unique corpus —
a dedup-heavy workload by construction — and every embedding gains K-1
exact clones. region/nation are TPC-H-style fixed dimensions and are
copied once. pyarrow preserves physical types exactly — events.ts keeps
whatever timestamp unit the source fixture has (ns in early rounds, µs
since round 5); the Scala loader self-describes via the parquet footer
(Tables.eventsTsUnit) so either vintage reads correctly.
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFF = 10 ** 8
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]


def main(src, dst, k):
    os.makedirs(dst, exist_ok=True)
    for t in COPY_ONLY:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")
        print(f"{t}: copied")
    for t, keys in KEYS.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        parts = []
        for i in range(k):
            tbl = base
            if i:
                for c in keys:
                    idx = tbl.schema.get_field_index(c)
                    shifted = pc.add(tbl.column(c), pa.scalar(i * OFF, type=pa.int64()))
                    tbl = tbl.set_column(idx, tbl.schema.field(idx), shifted)
            parts.append(tbl)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {base.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
