"""Parsers for external scoring artifacts.

``parse_filt_prf``: NIST sclite ``.filt.prf`` alignment files -> DNN-HMM
result JSON (parity with reference ``utils/parsers/parse_filt_prf.py``:
keep File/REF/HYP/H_T1/H_T2 rows, drop insertions, deletions inherit the
previous segment's span).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List

VALID_PREFIXES = ["File", "REF:", "HYP:", "H_T1", "H_T2"]


def parse_filt_prf(file_path, output_path=None,
                   header_lines: int = 25) -> Dict[str, List]:
    file_path = Path(file_path)
    if not file_path.exists():
        raise FileNotFoundError(f"file not found: {file_path.absolute()}")

    with open(file_path) as f:
        lines = f.readlines()[header_lines:]
    rows = [line.split()[1:] for line in lines
            if line[:4] in VALID_PREFIXES]
    assert len(rows) % len(VALID_PREFIXES) == 0

    parsed: Dict[str, List] = {}
    n = len(rows) // len(VALID_PREFIXES)
    for i in range(n):
        block = rows[i * len(VALID_PREFIXES): (i + 1) * len(VALID_PREFIXES)]
        utt_id = block[0][0]
        result = []
        j = 0
        for gt_phn, pred_phn in zip(block[1], block[2]):
            if "*" in gt_phn:  # insertion: ignore
                continue
            if "*" in pred_phn:  # deletion: inherit the previous span
                if result:
                    start, end, _ = result[-1]
                else:
                    start = end = 0.0
            else:
                start, end = float(block[3][j]), float(block[4][j])
                j += 1
            result.append([float(start), float(end), pred_phn.lower()])
        parsed[utt_id] = result

    if output_path is not None:
        output_path = Path(output_path)
        output_path.parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w") as f:
            json.dump(parsed, f, indent=4)
    return parsed
