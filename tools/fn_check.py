#!/usr/bin/env python3
"""Exact check for pipeline_forget_neardup at scales where the DuckDB
recursive-closure oracle is impractical (same sum(|comp|^2) blowup as
dedup_components). Union-find over the dedup_minhash entry's verified
pair output (the entry shares its pair parameters by contract), then
the forget verdict = any requested doc in the component. Usage:
    python3 tools/fn_check.py <sfDir> <verifyOutDir>
"""
import sys, glob, os
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
    docs_path = f"{sf_dir}/documents.parquet"
    doc_files = (glob.glob(f"{docs_path}/*.parquet")
                 if os.path.isdir(docs_path) else glob.glob(docs_path))
    doc_ids = []
    for f in doc_files:
        doc_ids.extend(pq.read_table(f, columns=["doc_id"])["doc_id"]
                       .to_pylist())
    n_docs = len(doc_ids)

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

    # component verdict: any requested (doc_id % 29 == 0) member
    linked = {}
    for d in doc_ids:
        if d % 29 == 0:
            linked[find(d)] = True

    rows = read(f"{out_dir}/pipeline_forget_neardup/*.parquet",
                ["doc_id", "requested", "linked", "purged"])
    got = {d: (r, l, p) for d, r, l, p in rows}
    bad = []
    for d in doc_ids:
        want_req = (d % 29 == 0)
        want_link = linked.get(find(d), False)
        if got.get(d) != (want_req, want_link, want_link):
            bad.append((d, got.get(d), (want_req, want_link, want_link)))
    dup = len(rows) != len(got)
    if bad or dup or len(got) != n_docs:
        print(f"[FAIL] pipeline_forget_neardup: {len(bad)} wrong verdicts"
              f" (e.g. {bad[:3]}), rows={len(rows)} distinct={len(got)}"
              f" docs={n_docs}")
        sys.exit(1)
    n_purged = sum(1 for v in got.values() if v[2])
    print(f"[PASS] pipeline_forget_neardup: {n_docs} docs, {n_purged}"
          f" purged via {len(pairs)} pairs — exact union-find match")
    sys.exit(0)


if __name__ == "__main__":
    main()
