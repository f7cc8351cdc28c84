#!/usr/bin/env python3
"""Measured single-node baseline: the reference's core dataflow
(pandas, single-threaded — Compare.py's keep-last dedup and the
old-vs-new diff classification) on the same parquet inputs the Spark
bench reads. The reference publishes no numbers (BASELINE.md), so this
replica IS the throughput baseline for 'matches-or-beats the reference
single-node'.

Dev tooling only (runs driver-side; the Scala library does not use it).

Usage: python3 tools/pandas_baseline.py [sfDir]
"""
import sys, time, json
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def t(name):
    orders = pd.read_parquet(f"{SF}/orders.parquet")

    t0 = time.time()
    # keep-last dedup (Compare.py:55-63): last o_orderkey per customer
    kl = (orders.sort_values("o_orderkey")
          .drop_duplicates("o_custkey", keep="last")
          [["o_custkey", "o_orderkey", "o_totalprice"]])
    keep_last_s = time.time() - t0

    t0 = time.time()
    # diff classification (Compare.py old-vs-new merge), mirroring
    # q_diff_classify's derivation of the two quarters
    oldq = orders[orders.o_orderkey % 3 != 0][
        ["o_orderkey", "o_orderpriority", "o_orderstatus"]].copy()
    oldq["k"] = oldq.o_orderkey.astype(str)
    newq = orders[["o_orderkey", "o_orderpriority", "o_orderstatus"]].copy()
    newq["k"] = newq.o_orderkey.astype(str)
    prio = newq.o_orderpriority.where(newq.o_orderkey % 7 != 0, "X-MUTATED")
    newq["o_orderpriority"] = prio.where(newq.o_orderkey % 11 != 0, "")
    m = newq.merge(oldq, on="k", how="left", suffixes=("_new", "_old"))
    frames = []
    for c in ("o_orderpriority", "o_orderstatus"):
        new = m[f"{c}_new"].fillna("")
        old = m[f"{c}_old"].fillna("")
        status = pd.Series("UNCHANGED", index=m.index)
        status[m[f"{c}_old"].isna() & m.o_orderkey_old.isna()] = "NEW"
        status[(new != old) & (new != "") & (status != "NEW")] = "CHANGED"
        status[(new == "") & (old != "") & (status != "NEW")] = "CLEARED"
        frames.append(pd.DataFrame(
            {"k": m.k, "col_name": c, "old": old, "new": new,
             "status": status}))
    diff = pd.concat(frames, ignore_index=True)
    diff_s = time.time() - t0

    print(json.dumps({
        "sf": SF, "engine": "pandas-single-thread",
        "keep_last_rows": len(kl), "keep_last_sec": round(keep_last_s, 3),
        "diff_rows": len(diff), "diff_sec": round(diff_s, 3)}))


if __name__ == "__main__":
    t(SF)
