#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle on the same parquet tables. Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    import datetime, decimal, math
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v

def load_parquet_rows(path_dir):
    files = glob.glob(os.path.join(path_dir, "*.parquet"))
    if not files:
        return None, None
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    cols = sorted(tbl.column_names)
    rows = []
    data = {c: tbl[c].to_pylist() for c in cols}
    for i in range(tbl.num_rows):
        rows.append(tuple(norm_cell(data[c][i]) for c in cols))
    rows.sort(key=repr)
    return cols, rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # lambda-heavy pair-value oracles otherwise run in order-preserving
    # (serial) pipelines; we sort rows ourselves, so order is irrelevant
    con.sql("SET preserve_insertion_order = false")
    for t in TABLES:
        tpath = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(tpath):  # ScaleUp output: directory of part files
            tpath = f"{tpath}/*.parquet"
        # no per-table type translation: driver fixtures carry events.ts as
        # TIMESTAMP(NANOS) and ScaleUp-derived dirs as TIMESTAMP(MICROS) —
        # DuckDB reads both natively (oracle SQL uses second-or-coarser
        # derivations, so ns-vs-us precision never reaches a hash)
        src = f"read_parquet('{tpath}')"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    qdirs = [d for d in os.listdir(out_dir)
             if os.path.isdir(os.path.join(out_dir, d))]
    # GRAFT_CHECK_SKIP: comma-separated entry names whose DuckDB oracle is
    # skipped (checked by a dedicated tool instead — e.g. dedup_components
    # at 10x, where the recursive-closure CTE is quadratic in component
    # size; tools/cc_check.py verifies it exactly with union-find).
    skip = set(filter(None, os.environ.get("GRAFT_CHECK_SKIP", "").split(",")))
    # GRAFT_CHECK_ONLY: restrict the sweep to a comma-separated subset —
    # lets a big 10x gate shard across parallel checker processes
    only = set(filter(None, os.environ.get("GRAFT_CHECK_ONLY", "").split(",")))
    if only:
        qdirs = [d for d in qdirs if d in only]
    # graft.Verify dumps are repartition(1) single-row-group parquet;
    # DuckDB parallelizes scans per row group, so a pair-value oracle
    # over a 2.4M-row dump runs single-threaded (~40 min each at 10x).
    # Rewrite large dumps into row-group-chunked files once up front —
    # same directory glob, 32-way parallel scans afterwards.
    for name in sorted(qdirs):
        d = os.path.join(out_dir, name)
        if os.path.islink(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            continue
        metas = [pq.read_metadata(f) for f in files]
        total = sum(m.num_rows for m in metas)
        groups = sum(m.num_row_groups for m in metas)
        chunk = 65536
        if total >= 200_000 and groups < total // chunk:
            import pyarrow as pa
            tbl = pa.concat_tables([pq.read_table(f) for f in files])
            for f in files:
                os.remove(f)
            pq.write_table(tbl, os.path.join(d, "chunked.parquet"),
                           row_group_size=chunk)
            print(f"[chunk] {name}: {total} rows -> "
                  f"{(total + chunk - 1) // chunk} row groups", flush=True)
    def emit(name):
        # print incrementally: a long 10x run killed mid-way still
        # leaves per-entry evidence in the log
        v = results[name]
        flag = "PASS" if (v.startswith(("OK", "rows-only")) and "FAIL" not in v) else "FAIL"
        print(f"[{flag}] {name}: {v}", flush=True)

    for name in sorted(qdirs):
        if name in skip:
            results[name] = "rows-only (skipped by GRAFT_CHECK_SKIP)"
            emit(name)
            continue
        cols, rows = load_parquet_rows(os.path.join(out_dir, name))
        if cols is None:
            results[name] = "EMPTY-OUTPUT"
            emit(name)
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(rows)} rows)" + (" FAIL-ZERO" if len(rows) == 0 else "")
            emit(name)
            continue
        try:
            res = con.sql(oracle[name])
            ocols = sorted(res.columns)
            order = [res.columns.index(c) for c in ocols]
            orows = [tuple(norm_cell(r[i]) for i in order) for r in res.fetchall()]
            orows.sort(key=repr)
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {e}"
            emit(name)
            continue
        if cols != ocols:
            results[name] = f"SCHEMA-MISMATCH spark={cols} oracle={ocols}"
        elif len(rows) != len(orows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(rows)} oracle={len(orows)}"
        elif rows != orows:
            # find first diff
            diff = next((i for i, (a, b) in enumerate(zip(rows, orows)) if a != b), -1)
            results[name] = (f"VALUE-MISMATCH at sorted-row {diff}:\n"
                             f"    spark : {rows[diff]}\n"
                             f"    oracle: {orows[diff]}")
        else:
            results[name] = f"OK ({len(rows)} rows)"
        emit(name)
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")) and "FAIL" not in v)
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == "__main__":
    main()
