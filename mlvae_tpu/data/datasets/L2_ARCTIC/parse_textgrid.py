"""L2-ARCTIC TextGrid annotation parsing.

Capability parity with reference ``datasets/L2_ARCTIC/parse_textgrid.py``:
the ``phones`` tier encodes "canonical,pronounced[,...]" per interval; a
single token means correct pronunciation; alphabetic symbols are extracted
from each token.  Built on the in-framework TextGrid reader instead of the
``tgt`` package.
"""
from __future__ import annotations

import re
from pathlib import Path

from mlvae_tpu.data.textgrid import read_textgrid

_ALPHA = re.compile(r"[a-zA-Z]+")


def parse_textgrid(path, level: str):
    tg = read_textgrid(path)
    annotation = {
        "all": {
            "start_time": tg.start_time,
            "end_time": tg.end_time,
            "word": [],
            "phoneme": [],
            "canonical_phoneme": [],
        },
        "word": [],
        "phoneme": [],
        "canonical_phoneme": [],
    }

    for interval in tg.get_tier_by_name("words"):
        annotation["word"].append(interval.text)
        annotation["all"]["word"].append(
            (interval.start_time, interval.end_time, interval.text)
        )

    for interval in tg.get_tier_by_name("phones"):
        parts = interval.text.lower().split(",")
        pronounced = parts[0] if len(parts) == 1 else parts[1]
        canonical = parts[0]
        pronounced = _ALPHA.findall(pronounced)[0]
        canonical = _ALPHA.findall(canonical)[0]
        annotation["phoneme"].append(pronounced)
        annotation["all"]["phoneme"].append(
            (interval.start_time, interval.end_time, pronounced)
        )
        annotation["canonical_phoneme"].append(canonical)
        annotation["all"]["canonical_phoneme"].append(
            (interval.start_time, interval.end_time, canonical)
        )

    return annotation[level]
