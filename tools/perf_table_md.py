#!/usr/bin/env python
"""Render artifacts/perf_families.json as the docs/perf.md markdown table
(VERDICT r3 #5). Prints the table; paste/update into docs/perf.md.

Usage: python tools/perf_table_md.py
"""
from __future__ import annotations

import json

with open("artifacts/perf_families.json") as f:
    d = json.load(f)

rows = [(tag, rec) for tag, rec in d.items()
        if isinstance(rec, dict) and "steps_per_s" in rec]
print("| family / config | dtype | batch | d | ms/step | steps/s | rows/s "
      "| TFLOP/s (MXU %) | GB/s (HBM %) | bound |")
print("|---|---|---|---|---|---|---|---|---|---|")
for tag, r in rows:
    print(f"| {r['config'].split('.')[-1]} ({tag.split('-')[0]}) | {r['dtype']} "
          f"| {r['batch']:,} | {r['ndim_x']} | {r['step_ms']:.2f} "
          f"| {r['steps_per_s']:.1f} | {r['rows_per_s']:,.0f} "
          f"| {r['achieved_tflops']:.2f} ({r['mxu_util']*100:.1f}%) "
          f"| {r['achieved_gbps']:.0f} ({r['hbm_util']*100:.1f}%) "
          f"| {r['bound']} |")

for key, rec in d.items():
    if key.startswith("compile32:"):
        print(f"\n{key}: scanned {rec['scanned_compile_s']:.1f}s vs unrolled "
              f"{rec['unrolled_compile_s']:.1f}s compile; terms_close={rec['terms_close']}")
