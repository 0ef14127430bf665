#!/usr/bin/env python3
"""Exact check for the sample_split_component entry at scales where the
DuckDB recursive-closure oracle is impractical (same sum(|comp|^2)
blowup as dedup_components). Union-find over the verified pair output
gives the exact component label; the split is the portable md5 cut on
that label. Usage:
    python3 tools/sc_check.py <sfDir> <verifyOutDir>
"""
import sys, glob, os, hashlib
import pyarrow.parquet as pq


def read(pattern, cols):
    out = []
    for f in glob.glob(pattern):
        t = pq.read_table(f, columns=cols)
        out.extend(zip(*(t[c].to_pylist() for c in cols)))
    return out


def md5_split(group_id):
    h = hashlib.md5(str(group_id).encode()).hexdigest()[:8]
    if h < "cccccccc":
        return "train"
    if h < "e6666666":
        return "val"
    return "test"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    pairs = read(f"{out_dir}/dedup_minhash/*.parquet", ["id_a", "id_b"])
    raw_rows = read(f"{out_dir}/sample_split_component/*.parquet",
                    ["doc_id", "group_id", "split"])
    got = {d: (g, s) for d, g, s in raw_rows}
    # duplicate output rows for the same doc_id would collapse silently in
    # the dict — count raw rows separately and fail on any difference
    if len(raw_rows) != len(got):
        print(f"[FAIL] sample_split_component: {len(raw_rows)} raw rows "
              f"but only {len(got)} distinct doc_ids — duplicated output")
        sys.exit(1)
    docs_path = f"{sf_dir}/documents.parquet"
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

    bad = []
    for d, (g, s) in got.items():
        want_g = find(d)
        want_s = md5_split(want_g)
        if g != want_g or s != want_s:
            bad.append((d, (g, s), (want_g, want_s)))
    ok = not bad and len(got) == n_docs
    if bad:
        print(f"[FAIL] sample_split_component: {len(bad)} wrong, "
              f"e.g. {bad[:3]}")
    elif len(got) != n_docs:
        print(f"[FAIL] sample_split_component: {len(got)} rows != "
              f"{n_docs} docs")
    else:
        from collections import Counter
        frac = Counter(s for _, s in got.values())
        print(f"[PASS] sample_split_component: {len(got)} docs, "
              f"{len(pairs)} pairs honored, splits {dict(frac)} — "
              f"exact union-find + md5 match")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
