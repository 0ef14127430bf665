#!/usr/bin/env python3
"""Exact coreness checker for graph_coreness at scales where the DuckDB
replay exceeds the box: the 24-round windowed h-index CTE chain spills
past the disk at 100x (each round materializes a ranked 2|E|-row join).
This recomputes every node's core number EXACTLY with the O(E)
Batagelj-Zaversnik bin-sort peel over the same bipartite
customer-supplier graph and compares node-for-node with the entry dump
- the same linear-checker pattern as cc/kb/fn/sc_check.

Usage: python3 tools/core_check.py <sfDir> <verifyOutDir>
"""
import glob
import os
import sys

import duckdb
import numpy as np
import pyarrow.parquet as pq


def src(sf, t):
    p = f"{sf}/{t}.parquet"
    return f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else \
        f"read_parquet('{p}')"


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    rel = con.sql(f"""
      SELECT DISTINCT CAST(o_custkey AS BIGINT) AS c,
             CAST(l_suppkey AS BIGINT) + 10000000 AS s
      FROM {src(sf, 'orders')} o
      JOIN {src(sf, 'lineitem')} l ON l.l_orderkey = o.o_orderkey
    """).fetchnumpy()
    c, s = rel["c"], rel["s"]
    # dense node ids over both endpoint sets
    nodes, inv = np.unique(np.concatenate([c, s]), return_inverse=True)
    n = len(nodes)
    u = inv[: len(c)]
    v = inv[len(c):]
    # symmetric adjacency in CSR form
    heads = np.concatenate([u, v])
    tails = np.concatenate([v, u])
    deg = np.bincount(heads, minlength=n).astype(np.int64)
    order_e = np.argsort(heads, kind="stable")
    adj = tails[order_e]
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=offs[1:])

    # Batagelj-Zaversnik O(E) peel: process vertices in increasing
    # current-degree order; a vertex's degree when processed IS its
    # core number; larger-degree neighbors decrement and re-bin.
    d = deg.copy()
    md = int(d.max()) if n else 0
    bin_start = np.zeros(md + 2, dtype=np.int64)
    np.cumsum(np.bincount(d, minlength=md + 1), out=bin_start[1:])
    vert = np.argsort(d, kind="stable").astype(np.int64)
    pos = np.empty(n, dtype=np.int64)
    pos[vert] = np.arange(n)
    binp = bin_start[:-1].copy()  # next unprocessed slot per degree
    d = d.tolist()
    vert_l = vert.tolist()
    pos_l = pos.tolist()
    binp_l = binp.tolist()
    adj_l = adj.tolist()
    offs_l = offs.tolist()
    core = [0] * n
    for i in range(n):
        x = vert_l[i]
        dx = d[x]
        core[x] = dx
        for k in range(offs_l[x], offs_l[x + 1]):
            w = adj_l[k]
            dw = d[w]
            if dw > dx:
                # swap w with the first unprocessed vertex of degree dw
                pw = pos_l[w]
                ps = binp_l[dw]
                y = vert_l[ps]
                if w != y:
                    vert_l[ps], vert_l[pw] = w, y
                    pos_l[w], pos_l[y] = ps, pw
                binp_l[dw] = ps + 1
                d[w] = dw - 1
        binp_l[dx] = max(binp_l[dx], i + 1)

    expected = {int(nodes[i]): core[i] for i in range(n)}

    files = glob.glob(os.path.join(out, "graph_coreness", "*.parquet"))
    if not files:
        print("[FAIL] graph_coreness: no dump found")
        sys.exit(1)
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    got_nodes = tbl["node"].to_pylist()
    got_core = tbl["coreness"].to_pylist()
    got_kind = tbl["kind"].to_pylist()
    ok = len(got_nodes) == n
    bad = 0
    for nd, cr, kd in zip(got_nodes, got_core, got_kind):
        if expected.get(nd) != cr or \
                kd != ("supplier" if nd >= 10000000 else "customer"):
            bad += 1
            if bad <= 5:
                print(f"  mismatch node={nd} got={cr} want={expected.get(nd)}")
    if ok and bad == 0:
        print(f"[PASS] graph_coreness: exact peel match ({n} nodes)")
    else:
        print(f"[FAIL] graph_coreness: rows {len(got_nodes)} vs {n}, "
              f"{bad} mismatches")
        sys.exit(1)


if __name__ == "__main__":
    main()
