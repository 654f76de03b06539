#!/usr/bin/env python
"""Emit the r15-vs-r14 bench comparison markdown for BASELINE.md /
OPTIMIZATION_r15.md from the two committed artifacts.

Usage: python scripts/opt_benchdiff.py OLD.json NEW.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    qo, qn = old["queries"], new["queries"]
    shared = sorted(k for k in qn if k in qo)
    so, sn = sum(qo[k] for k in shared), sum(qn[k] for k in shared)
    ratios = sorted(qn[k] / qo[k] for k in shared)
    med = ratios[len(ratios) // 2]
    print(f"shared rows: {len(shared)}")
    print(f"sum: {so:.2f} -> {sn:.2f}  ({sn/so:.3f}x raw)")
    print(f"per-row median ratio: {med:.3f}")
    print(f"probe: {old.get('probe_sec')} (ratio {old.get('probe_ratio')})"
          f" -> {new.get('probe_sec')} (ratio {new.get('probe_ratio')})")
    pr = (new.get("probe_sec") or 1) / (old.get("probe_sec") or 1)
    print(f"probe-normalized sum ratio: {(sn/so)/pr:.3f}")
    print("\ntop improvements (raw):")
    movers = sorted(shared, key=lambda k: qn[k] - qo[k])
    for k in movers[:20]:
        print(f"  {qo[k]:7.3f} -> {qn[k]:7.3f} ({qn[k]/qo[k]:.2f}x)  {k}")
    print("\ntop regressions (raw):")
    for k in movers[-12:]:
        print(f"  {qo[k]:7.3f} -> {qn[k]:7.3f} ({qn[k]/qo[k]:.2f}x)  {k}")


if __name__ == "__main__":
    main()
