#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, execute each oracle SQL in DuckDB over the same parquet tables,
and compare row counts + column names + canonicalized value hashes.

Dev tooling only (runs driver-side; the Scala library does not depend on it).

Usage: python3 tools/check_oracle.py [sfDir] [outDir]
"""
import sys, os, json, hashlib
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    # The driver's pandas canonicalizer dies on complex values (the r13
    # q_center_normalize err: unhashable numpy.ndarray). str()-ing them
    # here made this local gate WEAKER than the driver's — reject loudly
    # instead so an array/struct/map column can never pass locally.
    if isinstance(v, (list, tuple, dict, set)):
        raise ValueError(
            f"non-scalar value {type(v).__name__} — serialize complex "
            "columns with to_json/array_join in the query projection")
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    with open(os.path.join(OUT_DIR, "oracle_sql.json")) as f:
        oracle = json.load(f)

    results = {}
    for name in sorted(os.listdir(OUT_DIR)):
        path = os.path.join(OUT_DIR, name)
        if not os.path.isdir(path):
            continue
        # Verify writes a _FAILED marker (and no parquet) for a query
        # that threw — surface it as a failed row instead of crashing on
        # the empty glob (the r9 comparator silently dropped these)
        marker = os.path.join(path, "_FAILED")
        if os.path.exists(marker):
            with open(marker) as mf:
                results[name] = {"check": "failed", "ok": False,
                                 "err": mf.read().strip()[:200]}
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{path}/*.parquet')").fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracle:
            results[name] = {"check": "rows_only", "rows": len(got),
                             "ok": len(got) > 0}
            continue
        try:
            rel = con.sql(oracle[name])
            # Types with no exact parquet/pandas twin hash differently in
            # the driver even when values are equal (the three-round
            # q_bool_aggs red row: count_if -> HUGEINT -> float64 in
            # pandas). fetchall() masks this (HUGEINT -> Python int), so
            # check declared types explicitly.
            risky = [c for c, ty in zip(rel.columns, rel.types)
                     if str(ty) in ("HUGEINT", "UHUGEINT")]
            if risky:
                results[name] = {"check": "oracle", "ok": False,
                                 "error": f"oracle returns HUGEINT cols {risky}; "
                                          "cast to BIGINT"}
                continue
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            results[name] = {"check": "oracle_error", "ok": False,
                             "error": str(e)[:300]}
            continue
        ok_cols = sorted(got_cols) == sorted(exp_cols)
        ok_rows = len(got) == len(exp)
        try:
            gh = table_hash(got, got_cols)
            eh = table_hash(exp, exp_cols)
        except ValueError as e:
            results[name] = {"check": "non_scalar", "ok": False,
                             "error": str(e)[:300]}
            continue
        results[name] = {
            "check": "oracle", "rows": len(got), "exp_rows": len(exp),
            "cols_ok": ok_cols, "rows_ok": ok_rows, "hash_ok": gh == eh,
            "ok": ok_cols and ok_rows and gh == eh,
        }
        if not ok_cols:
            results[name]["got_cols"] = got_cols
            results[name]["exp_cols"] = exp_cols

    n_ok = sum(1 for r in results.values() if r["ok"])
    print(json.dumps(results, indent=1))
    print(f"\n{n_ok}/{len(results)} OK")
    bad = [k for k, r in results.items() if not r["ok"]]
    if bad:
        print("FAILING:", ", ".join(bad))
        sys.exit(1)


if __name__ == "__main__":
    main()
