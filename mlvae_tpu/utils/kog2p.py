"""Korean grapheme-to-phoneme conversion (capability counterpart of the
reference's dormant ``utils/KoG2P`` utility — imported nowhere in the
reference either, SURVEY §2.4; reference ``src/utils/KoG2P/g2p.py``).

Same pipeline shape as the reference implementation:

1. ``graph2phone``: Hangul syllables -> romanized phone string via Unicode
   jamo arithmetic (U+AC00 block; onset/nucleus/coda index math), with
   ``-`` as the syllable delimiter, ``#`` as the word delimiter, silent
   onset ``oh`` deleted and coda ``oh`` realized as the velar nasal ``ng``
   (reference ``g2p.py:128-190``).
2. A regex *rule engine* applied to the comma-delimited phone string until
   fixpoint (reference ``phone2prono`` + the iteration loop in
   ``graph2prono``, ``g2p.py:193-198,235-260``).  Rules live in the same
   tab-separated ``pattern<TAB>replacement`` format as the reference's
   ``rulebook.txt`` (212 rules), so that file — or any user rulebook — can
   be loaded verbatim with :func:`read_rules`.
3. A built-in core rule set (:data:`DEFAULT_RULES`) covering the standard
   phonological processes in the rulebook's documented order: cluster
   aspiration, cluster liaison, tensification, cluster simplification,
   nasalization, liquidization, palatalization, simple aspiration,
   liaison, and coda neutralization.

Phone inventory (Korean Spontaneous Speech corpus romanization): onsets
``k0 kk nn t0 tt rr mm p0 pp s0 ss oh c0 cc ch kh th ph h0``; nuclei
``aa qq ya yq vv ee yv ye oo wa wq wo yo uu wv we wi yu xx xi ii``; codas
``kf kk ks nf nc nh tf ll lk lm lb ls lt lp lh mf pf ps s0 ss oh c0 ch
kh th ph h0`` (``oh`` -> ``ng``).
"""
from __future__ import annotations

import re
from typing import List, Sequence, Tuple

_ONSETS = ["k0", "kk", "nn", "t0", "tt", "rr", "mm", "p0", "pp",
           "s0", "ss", "oh", "c0", "cc", "ch", "kh", "th", "ph", "h0"]
_NUCLEI = ["aa", "qq", "ya", "yq", "vv", "ee", "yv", "ye", "oo", "wa",
           "wq", "wo", "yo", "uu", "wv", "we", "wi", "yu", "xx", "xi", "ii"]
_CODAS = ["", "kf", "kk", "ks", "nf", "nc", "nh", "tf",
          "ll", "lk", "lm", "lb", "ls", "lt", "lp", "lh",
          "mf", "pf", "ps", "s0", "ss", "oh", "c0", "ch",
          "kh", "th", "ph", "h0"]

# vowel-initial syllable lookahead (the silent 'oh' onset is deleted, so a
# vowel-initial syllable is '-<nucleus>')
_V = "(?=(?:%s),)" % "|".join(_NUCLEI)


def decompose(text: str) -> List[List[str]]:
    """Hangul string -> per-syllable [onset, nucleus, coda] phone lists
    (coda '' when absent).  Non-Hangul characters are skipped."""
    out = []
    for ch in text:
        code = ord(ch)
        if not 0xAC00 <= code <= 0xD7A3:
            continue
        idx = code - 0xAC00
        out.append([_ONSETS[idx // 588], _NUCLEI[(idx % 588) // 28],
                    _CODAS[idx % 28]])
    return out


def graph2phone(text: str) -> str:
    """Romanize Hangul text: comma-delimited phones, '-' between
    syllables, '#' between words; silent onset dropped, coda 'oh'->'ng'."""
    parts: List[str] = []
    for word in text.split():
        sylls = []
        for onset, nucleus, coda in decompose(word):
            s = "" if onset == "oh" else onset + ","
            s += nucleus + ","
            if coda:
                s += ("ng" if coda == "oh" else coda) + ","
            sylls.append(s)
        if sylls:
            parts.append("-".join(sylls))
    return "#".join(parts)


def read_rules(path: str) -> List[Tuple[str, str]]:
    """Parse a KoG2P-format rulebook: tab-separated ``pattern<TAB>
    replacement`` per line, '#'-prefixed comment lines skipped.  The
    reference's 212-rule ``rulebook.txt`` loads unmodified."""
    rules = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            fields = line.split("\t")
            if len(fields) < 2:
                continue
            rules.append((fields[0], fields[1]))
    return rules


def apply_rules(phones: str, rules: Sequence[Tuple[str, str]],
                max_iters: int = 10) -> str:
    """Apply the rule list repeatedly until the string stops changing
    (the reference iterates ``phone2prono`` to fixpoint)."""
    for _ in range(max_iters):
        prev = phones
        for pattern, replacement in rules:
            phones = re.sub(pattern, replacement, phones)
        if phones == prev:
            break
    return phones


def _tense_rules() -> List[Tuple[str, str]]:
    """Tensification: plain stop/affricate/fricative onsets become tense
    after an obstruent coda (fixed-width lookbehind per onset)."""
    # h-codas aspirate the following stop instead of tensing it
    obstruents = ("kf|kk|ks|lk|kh|tf|s0|ss|c0|ch|th|pf|ps|lb|lp|ph")
    tense = {"k0": "kk", "t0": "tt", "p0": "pp", "s0": "ss", "c0": "cc"}
    return [(r"(?<=(?:%s),-)%s," % (obstruents, plain), t + ",")
            for plain, t in tense.items()]


def _liaison_rules() -> List[Tuple[str, str]]:
    """Simple liaison: a single coda before a vowel-initial syllable
    resyllabifies as that syllable's onset (h0 deletes)."""
    onset_of = {"kf": "k0", "kk": "kk", "nf": "nn", "tf": "t0",
                "ll": "rr", "mf": "mm", "pf": "p0", "s0": "s0",
                "ss": "ss", "c0": "c0", "ch": "ch", "kh": "kh",
                "th": "th", "ph": "ph"}
    # the lookahead keeps the nucleus in place; only the coda moves
    rules = [(coda + ",-" + _V, "-" + ons + ",")
             for coda, ons in onset_of.items()]
    rules.append(("h0,-" + _V, "-"))  # intervocalic h deletion
    return rules


#: Core phonological processes in the rulebook's documented order
#: (cluster aspiration -> cluster rules -> tensification -> cluster
#: simplification -> nasalization -> liquidization -> palatalization ->
#: simple aspiration -> liaison -> coda neutralization).
DEFAULT_RULES: List[Tuple[str, str]] = (
    # --- aspiration with cluster codas: C+h / h+C -> aspirated onset
    [("nh,-k0,", "nf,-kh,"), ("nh,-t0,", "nf,-th,"), ("nh,-c0,", "nf,-ch,"),
     ("lh,-k0,", "ll,-kh,"), ("lh,-t0,", "ll,-th,"), ("lh,-c0,", "ll,-ch,"),
     ("lk,-h0,", "ll,-kh,"), ("lb,-h0,", "ll,-ph,"),
     ("nh,-" + _V, "nf,-"), ("lh,-" + _V, "ll,-")]
    # --- cluster liaison before a vowel-initial syllable
    + [("ks,-" + _V, "kf,-ss,"), ("ps,-" + _V, "pf,-ss,"),
       ("lk,-" + _V, "ll,-k0,"), ("lm,-" + _V, "ll,-mm,"),
       ("lb,-" + _V, "ll,-p0,"), ("ls,-" + _V, "ll,-ss,"),
       ("lt,-" + _V, "ll,-th,"), ("lp,-" + _V, "ll,-ph,"),
       ("nc,-" + _V, "nf,-c0,")]
    # --- tensification after obstruent codas
    + _tense_rules()
    # --- cluster simplification before consonants / word-finally
    + [("ks,", "kf,"), ("lk,", "kf,"), ("lm,", "mf,"), ("lb,", "ll,"),
       ("ls,", "ll,"), ("lt,", "ll,"), ("lp,", "pf,"), ("lh,", "ll,"),
       ("nc,", "nf,"), ("nh,", "nf,"), ("ps,", "pf,")]
    # --- nasalization of obstruent codas before nasals
    + [("(?:kf|kk|kh)(?=,-(?:nn|mm),)", "ng"),
       ("(?:tf|s0|ss|c0|ch|th|h0)(?=,-(?:nn|mm),)", "nf"),
       ("(?:pf|ph)(?=,-(?:nn|mm),)", "mf"),
       # stop/nasal + rr -> nasal + nn (e.g. 독립 -> 동닙)
       ("kf,-rr,", "ng,-nn,"), ("pf,-rr,", "mf,-nn,"),
       ("tf,-rr,", "nf,-nn,"), ("mf,-rr,", "mf,-nn,"),
       ("ng,-rr,", "ng,-nn,")]
    # --- liquidization (n + l / l + n -> l l)
    + [("nf,-rr,", "ll,-rr,"), ("ll,-nn,", "ll,-rr,")]
    # --- palatalization of t-codas before 'ii'
    + [("tf,-(?=ii,)", "-c0,"), ("th,-(?=ii,)", "-ch,")]
    # --- aspiration with simple codas
    + [("h0,-k0,", "-kh,"), ("h0,-t0,", "-th,"), ("h0,-c0,", "-ch,"),
       ("h0,-s0,", "-ss,"),
       ("kf,-h0,", "-kh,"), ("tf,-h0,", "-th,"), ("pf,-h0,", "-ph,"),
       ("c0,-h0,", "-ch,"), ("th,-h0,", "-th,"), ("s0,-h0,", "-th,")]
    # --- liaison
    + _liaison_rules()
    # --- coda neutralization (종성중화)
    + [("kk,-", "kf,-"), ("kh,-", "kf,-"), ("(?:s0|ss|c0|ch|th|h0),-",
        "tf,-"), ("ph,-", "pf,-"),
       ("kk,#", "kf,#"), ("kh,#", "kf,#"), ("(?:s0|ss|c0|ch|th|h0),#",
        "tf,#"), ("ph,#", "pf,#"),
       ("kk,$", "kf,"), ("kh,$", "kf,"), ("(?:s0|ss|c0|ch|th|h0),$",
        "tf,"), ("ph,$", "pf,")]
)


def g2p(text: str, rulebook: str | None = None) -> List[str]:
    """Korean text -> phone list.  With ``rulebook`` (a KoG2P-format rule
    file, e.g. the reference's ``rulebook.txt``) those rules are applied
    instead of the built-in core set."""
    phones = graph2phone(text)
    if not phones:
        return []
    rules = read_rules(rulebook) if rulebook else DEFAULT_RULES
    phones = apply_rules(phones, rules)
    return [p for p in re.split(r"[,\-#]+", phones) if p]
