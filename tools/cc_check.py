#!/usr/bin/env python3
"""Exact connected-components check for the dedup_components entry at
scales where the DuckDB recursive-closure oracle is impractical (the
closure materializes sum(|comp|^2) rows — 46M at 10x). Union-find over
the verified pair output is exact and linear. Usage:
    python3 tools/cc_check.py <sfDir> <verifyOutDir>
"""
import sys, glob
import pyarrow.parquet as pq


def read(pattern, cols):
    out = []
    for f in glob.glob(pattern):
        t = pq.read_table(f, columns=cols)
        out.extend(zip(*(t[c].to_pylist() for c in cols)))
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    pairs = read(f"{out_dir}/dedup_minhash/*.parquet", ["id_a", "id_b"])
    entries = ["dedup_components"]
    import os.path
    if glob.glob(f"{out_dir}/dedup_components_incremental/*.parquet"):
        entries.append("dedup_components_incremental")
    docs_path = f"{sf_dir}/documents.parquet"
    import os
    doc_files = (glob.glob(f"{docs_path}/*.parquet")
                 if os.path.isdir(docs_path) else glob.glob(docs_path))
    n_docs = sum(pq.read_metadata(f).num_rows for f in doc_files)

    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    want = {n: find(n) for n in set(x for p in pairs for x in p)}
    all_ok = True
    for entry in entries:
        rows = read(f"{out_dir}/{entry}/*.parquet", ["doc_id", "rep_id"])
        got = dict(rows)
        bad = [(d, r, want.get(d, d)) for d, r in got.items()
               if r != want.get(d, d)]
        ok = not bad and len(got) == n_docs and len(rows) == n_docs
        if bad:
            print(f"[FAIL] {entry}: {len(bad)} mislabeled, e.g. {bad[:3]}")
        elif len(rows) != len(got):
            print(f"[FAIL] {entry}: {len(rows)} rows but {len(got)} doc_ids")
        elif len(got) != n_docs:
            print(f"[FAIL] {entry}: {len(got)} rows != {n_docs} docs")
        else:
            n_comp = len(set(got.values()))
            print(f"[PASS] {entry}: {len(got)} docs, {n_comp} components,"
                  f" {len(pairs)} pairs — exact union-find match")
        all_ok = all_ok and ok
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
