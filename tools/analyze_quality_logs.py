#!/usr/bin/env python
"""Summarize quality-campaign logs into a markdown table.

Parses ``<logs>/phases.txt`` (phase exit/wall lines) and each
``test_*.log`` / ``test3_*.log``'s final ``Best epoch`` metric row, and
classifies flagship MD results against the synthetic corpus's degenerate
poles (docs/RESULTS.md base-rate caveat):

- flag-everything pole: PRE ~= 23.48, REC ~= 65.14 (F1 ~= 34.51)
- flag-nothing pole:    F1 = 0

Usage: python tools/analyze_quality_logs.py /tmp/mlvae_r4/logs
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

BASE_PRE, BASE_REC = 23.48, 65.14


def parse_metrics(line: str) -> dict:
    out = {}
    for key, val in re.findall(r"([\w.]+): (-?[0-9.]+)", line):
        try:
            out[key] = float(val)
        except ValueError:
            pass
    return out


def pole(m: dict) -> str:
    f1 = m.get("plvl_md.F1")
    pre = m.get("plvl_md.PRE")
    rec = m.get("plvl_md.REC")
    if f1 is None:
        return ""
    if f1 == 0.0:
        return "flag-NOTHING pole"
    if (pre is not None and rec is not None
            and abs(pre - BASE_PRE) < 1.2 and abs(rec - BASE_REC) < 3.0):
        return "~flag-EVERYTHING pole (base rate)"
    return "off-pole"


def main(logs_dir: str) -> int:
    logs = Path(logs_dir)
    walls = {}
    for line in (logs / "phases.txt").read_text().splitlines():
        m = re.match(r"(\S+) exit=(\d+) wall=(\d+)s", line)
        if m:
            walls[m.group(1)] = (int(m.group(2)), int(m.group(3)))

    print("| phase | exit | wall | best ep | F1 | soft_F1 | boundary.f1 "
          "| r_value | pole |")
    print("|---|---|---|---|---|---|---|---|---|")
    for name, (rc, wall) in walls.items():
        row = [name, str(rc), f"{wall}s"]
        log = logs / f"{name}.log"
        best = None
        if log.exists():
            for line in log.read_text().splitlines():
                if "Best epoch" in line:
                    best = line
        if best and name.startswith(("test", "train")):
            m = parse_metrics(best)
            row += [
                str(int(m.get("epoch", m.get("Best epoch", 0)) or 0)) or "",
                f"{m.get('plvl_md.F1', float('nan')):.2f}"
                if "plvl_md.F1" in m else "-",
                f"{m.get('plvl_md.soft_F1', float('nan')):.2f}"
                if "plvl_md.soft_F1" in m else "-",
                f"{m.get('boundary.f1', float('nan')):.2f}"
                if "boundary.f1" in m else "-",
                f"{m.get('boundary.r_value', float('nan')):.2f}"
                if "boundary.r_value" in m else "-",
                pole(m),
            ]
        else:
            row += [""] * 6
        print("| " + " | ".join(row) + " |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1
                          else "/tmp/mlvae_r4/logs"))
