#!/usr/bin/env python3
"""Replicate sf0.1 orders N times (shifted keys) into /tmp, so the
pandas-vs-spark crossover can be measured on identical larger-than-SF
inputs. Dev tooling for BASELINE.md measurements only — catalog/gate
queries read /root/testdata exclusively.

Usage: python3 tools/make_scaled_orders.py [N] [outDir]
"""
import sys
import pandas as pd

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_scale"

orders = pd.read_parquet("/root/testdata/sf0.1/orders.parquet")
parts = []
for i in range(N):
    c = orders.copy()
    c["o_orderkey"] = c.o_orderkey + i * 1_000_000_000
    c["o_custkey"] = c.o_custkey + (i % 8) * 100_000_000
    parts.append(c)
big = pd.concat(parts, ignore_index=True)
import os
os.makedirs(OUT, exist_ok=True)
big.to_parquet(f"{OUT}/orders.parquet", index=False)
print(f"wrote {len(big)} rows to {OUT}/orders.parquet")
