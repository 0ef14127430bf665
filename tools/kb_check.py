#!/usr/bin/env python3
"""Exact keep-best check for the dedup_keep_best entry at scales where
the DuckDB recursive-closure oracle is impractical (same sum(|comp|^2)
blowup as dedup_components). Three exact checks, no closure CTE:

  1. component labels == union-find over the verified dedup_minhash
     pairs (the pair VALUES are oracle-checked separately);
  2. the entry's quality column == the hash-gated text_stats dump's
     quality (bit-for-bit, joined on doc_id) — so quality correctness
     rides on an oracle-green entry;
  3. keep rule replay: within every component, keep_id is the
     (quality desc, id asc) argmax, exactly one kept row, and all
     members agree on keep_id.

Usage: python3 tools/kb_check.py <sfDir> <verifyOutDir>
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
    rows = read(f"{out_dir}/dedup_keep_best/*.parquet",
                ["doc_id", "rep_id", "keep_id", "kept", "quality"])
    assert rows, "empty dedup_keep_best output"

    # 1. union-find labels
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    bad = [(d, r, find(d)) for d, r, _, _, _ in rows if find(d) != r]
    assert not bad, f"{len(bad)} label mismatches, e.g. {bad[:3]}"

    # 2. quality values against the oracle-green text_stats dump
    tq = dict(read(f"{out_dir}/text_stats/*.parquet", ["doc_id", "quality"]))
    if tq:
        badq = [(d, q, tq[d]) for d, _, _, _, q in rows
                if d in tq and q != tq[d]]
        assert not badq, f"{len(badq)} quality mismatches, e.g. {badq[:3]}"
    else:
        print("[kb_check] WARNING: no text_stats dump; quality unchecked")

    # 3. keep rule replay
    from collections import defaultdict
    comp = defaultdict(list)
    for d, r, k, kept, q in rows:
        comp[r].append((d, k, kept, q))
    n_docs_rows = len(rows)
    for r, ms in comp.items():
        best = max((q, -d) for d, _, _, q in ms)
        keep = -best[1]
        assert all(k == keep for _, k, _, _ in ms), f"component {r} keep_id drift"
        kept_ids = [d for d, _, kept, _ in ms if kept]
        assert kept_ids == [keep] or set(kept_ids) == {keep}, \
            f"component {r} kept {kept_ids}, want {keep}"
        assert sum(1 for _, _, kept, _ in ms if kept) == 1

    # row count == corpus size
    docs_path = f"{sf_dir}/documents.parquet"
    doc_files = (glob.glob(f"{docs_path}/*.parquet")
                 if os.path.isdir(docs_path) else glob.glob(docs_path))
    n_docs = sum(pq.read_metadata(f).num_rows for f in doc_files)
    assert n_docs_rows == n_docs, f"{n_docs_rows} rows for {n_docs} docs"

    print(f"[kb_check] PASS: {len(rows)} rows, {len(comp)} components, "
          f"{len(pairs)} pairs, keep rule exact")


if __name__ == "__main__":
    main()
