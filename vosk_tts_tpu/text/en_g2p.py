"""English G2P for the GPT-SoVITS cloner frontend.

Behavioral re-implementation of
/root/reference/training/gpt-sovits/text/english.py: CMU pronouncing
dictionary lookup (cmudict.rep main table from line 57, cmudict-fast.rep
supplement, engdict-hot.rep overrides) with the reference's OOV fallbacks:

  * words of <= 3 letters are spelled letter by letter (english.py:228-230);
  * possessive ``<word>'s`` -> phones of the word + Z (english.py:232-236);
  * lone "a" reads EY1 not AH0 (english.py:221);
  * longer OOV words fall back to a rule-based letter-to-sound pass — the
    reference uses the g2p_en neural net + wordsegment here (not available in
    this environment); deviation documented in PARITY.md. Dictionary words
    (the overwhelming majority at inference) are exact.

The dictionary files are DATA shipped with a model bundle (like the Russian
``dictionary``); pass their directory explicitly.
"""

from __future__ import annotations

import os
import re

ARPA_VOWELS = ("AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY",
               "IH", "IY", "OW", "OY", "UH", "UW")
ARPA_CONSONANTS = ("B", "CH", "D", "DH", "F", "G", "HH", "JH", "K", "L", "M",
                   "N", "NG", "P", "R", "S", "SH", "T", "TH", "V", "W", "Y",
                   "Z", "ZH")


def arpa_symbols() -> set:
    """The 71-symbol ARPA set of english.py:17-88 (stressed vowels + the two
    bare variants the reference keeps + consonants)."""
    out = {v + s for v in ARPA_VOWELS for s in ("0", "1", "2")}
    out.update({"ER", "IH"})
    out.update(ARPA_CONSONANTS)
    return out


def read_cmu_dict(dict_dir: str) -> dict:
    """english.py read_dict_new(): cmudict.rep main table (from line 57,
    double-space separated), cmudict-fast.rep fill-ins, engdict-hot.rep
    overrides."""
    g2p_dict: dict = {}
    main = os.path.join(dict_dir, "cmudict.rep")
    if os.path.exists(main):
        with open(main, encoding="utf-8", errors="ignore") as f:
            for line_index, line in enumerate(f, start=1):
                if line_index < 57:
                    continue
                parts = line.strip().split("  ")
                if len(parts) >= 2:
                    g2p_dict[parts[0].lower()] = parts[1].split(" ")
    fast = os.path.join(dict_dir, "cmudict-fast.rep")
    if os.path.exists(fast):
        with open(fast, encoding="utf-8", errors="ignore") as f:
            for line in f:
                items = line.strip().split(" ")
                if len(items) >= 2 and items[0].lower() not in g2p_dict:
                    g2p_dict[items[0].lower()] = items[1:]
    hot = os.path.join(dict_dir, "engdict-hot.rep")
    if os.path.exists(hot):
        with open(hot, encoding="utf-8", errors="ignore") as f:
            for line in f:
                items = line.strip().split(" ")
                if len(items) >= 2:
                    g2p_dict[items[0].lower()] = items[1:]
    return g2p_dict


def text_normalize(text: str) -> str:
    """english.py:193-206 punctuation unification."""
    rep_map = {
        "[;:：，；]": ",",
        '["’]': "'",
        "。": ".",
        "！": "!",
        "？": "?",
    }
    for p, r in rep_map.items():
        text = re.sub(p, r, text)
    return text


# ---------------------------------------------------------------------------
# Rule-based letter-to-sound for long OOV words — the stand-in for the
# reference's g2p_en neural model (english.py:256; its checkpoint is not
# retrievable in this environment). Three layers, in the spirit of the
# classic NRL/Elovitz text-to-sound rules:
#   1. productive suffix morphology (-tion, -ing, -ed with voicing, ...);
#   2. longest-match context rules (soft c/g, magic-e, r-controlled vowels,
#      vowel digraphs, silent kn-/wr-/-mb, doubled consonants);
#   3. stress: exactly one primary stress on the first vowel, 0 elsewhere —
#      matching g2p_en's output alphabet (stressed ARPA).
# Dictionary words (the overwhelming majority at inference) are exact; this
# path only shapes coined/rare words. Deviation documented in PARITY.md.
# ---------------------------------------------------------------------------

_VOWELS_SET = set("aeiouy")
_VOICELESS = {"P", "T", "K", "F", "TH", "S", "SH", "CH", "HH"}
_SIBILANTS = {"S", "Z", "SH", "ZH", "CH", "JH"}
_ARPA_VOWEL_BASES = set(ARPA_VOWELS)

# short and long (magic-e / open) readings of single vowel letters
_SHORT = {"a": "AE", "e": "EH", "i": "IH", "o": "AA", "u": "AH", "y": "IH"}
_LONG = {"a": "EY", "e": "IY", "i": "AY", "o": "OW", "u": "UW", "y": "AY"}

# longest-match grapheme rules; "V" entries are vowel bases (stress added
# later). Order within a length class matters only where patterns overlap.
_CLUSTERS = [
    ("eigh", ["EY"]), ("augh", ["AO"]), ("ough", ["AO"]),
    ("tch", ["CH"]), ("dge", ["JH"]), ("igh", ["AY"]), ("sch", ["S", "K"]),
    ("ch", ["CH"]), ("sh", ["SH"]), ("th", ["TH"]), ("ph", ["F"]),
    ("ck", ["K"]), ("ng", ["NG"]), ("qu", ["K", "W"]), ("wh", ["W"]),
    ("ee", ["IY"]), ("ea", ["IY"]), ("ai", ["EY"]), ("ay", ["EY"]),
    ("oa", ["OW"]), ("oo", ["UW"]), ("ou", ["AW"]), ("oi", ["OY"]),
    ("oy", ["OY"]), ("au", ["AO"]), ("aw", ["AO"]), ("ew", ["UW"]),
    ("ue", ["UW"]), ("ui", ["UW"]), ("ei", ["EY"]), ("ey", ["EY"]),
    ("ie", ["IY"]),
    ("ar", ["AA", "R"]), ("or", ["AO", "R"]), ("er", ["ER"]),
    ("ir", ["ER"]), ("ur", ["ER"]),
]

_CONS = {
    "b": ["B"], "d": ["D"], "f": ["F"], "h": ["HH"], "j": ["JH"],
    "k": ["K"], "l": ["L"], "m": ["M"], "n": ["N"], "p": ["P"],
    "q": ["K"], "r": ["R"], "t": ["T"], "v": ["V"], "w": ["W"],
    "z": ["Z"],
}

# (suffix, phones, min stem length) — applied once, longest first
_SUFFIXES = [
    ("ization", ["IH0", "Z", "EY1", "SH", "AH0", "N"], 3),
    ("ational", ["EY1", "SH", "AH0", "N", "AH0", "L"], 3),
    ("ability", ["AH0", "B", "IH1", "L", "IH0", "T", "IY0"], 3),
    ("ation", ["EY1", "SH", "AH0", "N"], 2),
    ("cious", ["SH", "AH0", "S"], 3),
    ("tious", ["SH", "AH0", "S"], 3),
    ("cial", ["SH", "AH0", "L"], 3),
    ("tial", ["SH", "AH0", "L"], 3),
    ("tion", ["SH", "AH0", "N"], 2),
    ("sion", ["SH", "AH0", "N"], 2),
    ("ture", ["CH", "ER0"], 2),
    ("ment", ["M", "AH0", "N", "T"], 3),
    ("ness", ["N", "AH0", "S"], 3),
    ("less", ["L", "AH0", "S"], 3),
    ("able", ["AH0", "B", "AH0", "L"], 3),
    ("ible", ["IH0", "B", "AH0", "L"], 3),
    ("ful", ["F", "AH0", "L"], 3),
    ("ing", ["IH0", "NG"], 3),
    ("ous", ["AH0", "S"], 3),
    ("ism", ["IH0", "Z", "AH0", "M"], 3),
    ("est", ["AH0", "S", "T"], 3),
    ("ers", ["ER0", "Z"], 3),
    ("ly", ["L", "IY0"], 3),
    ("er", ["ER0"], 3),
    ("le", ["AH0", "L"], 3),  # -ble/-dle/-gle...
]


def _is_vowel(ch: str) -> bool:
    return ch in _VOWELS_SET


def _core_scan(word: str, *, word_final: bool = True) -> list:
    """Grapheme scan -> ARPA bases (vowels WITHOUT stress digits).
    word_final=False for suffix-stripped stems (end-of-word silent-letter
    rules like -mb must not fire mid-word: shi[mb]le keeps its B)."""
    out, i, n = [], 0, len(word)
    emitted_vowel = False
    while i < n:
        ch = word[i]
        # word-initial silent clusters
        if i == 0:
            for pat, phs in (("kn", ["N"]), ("wr", ["R"]), ("ps", ["S"]),
                             ("gn", ["N"]), ("pn", ["N"]), ("mn", ["N"])):
                if word.startswith(pat):
                    out.extend(phs)
                    i = 2
                    break
            else:
                if ch == "x":  # xylo- reads Z word-initially
                    out.append("Z")
                    i = 1
                elif ch == "y":  # consonantal y
                    out.append("Y")
                    i = 1
            if i > 0:
                continue
        # doubled consonants collapse
        if not _is_vowel(ch) and i + 1 < n and word[i + 1] == ch:
            i += 1
            continue
        # silent -mb at word end
        if word_final and word.startswith("mb", i) and i + 2 == n:
            out.append("M")
            break
        # longest-match clusters (with a couple of positional exceptions)
        hit = None
        for pat, phs in _CLUSTERS:
            if word.startswith(pat, i):
                if pat == "ow" and i + 2 < n:
                    continue  # mid-word "ow" falls through to o + w
                hit = (pat, phs)
                break
        if word.startswith("ow", i) and i + 2 >= n:
            hit = ("ow", ["OW"])
        if hit is not None:
            pat, phs = hit
            out.extend(phs)
            emitted_vowel = emitted_vowel or any(p in _ARPA_VOWEL_BASES for p in phs)
            i += len(pat)
            continue
        if ch == "c":
            out.append("S" if i + 1 < n and word[i + 1] in "eiy" else "K")
            i += 1
            continue
        if ch == "g":
            out.append("JH" if i + 1 < n and word[i + 1] in "eiy" else "G")
            i += 1
            continue
        if ch == "x":
            out.extend(["K", "S"])
            i += 1
            continue
        if ch == "s":
            intervocalic = (0 < i < n - 1 and _is_vowel(word[i - 1])
                            and _is_vowel(word[i + 1]))
            out.append("Z" if intervocalic else "S")
            i += 1
            continue
        if not _is_vowel(ch):
            out.extend(_CONS.get(ch, []))
            i += 1
            continue
        # ---- single vowel letter ----
        last = i == n - 1
        if last:
            # open word-final vowels
            final = {"a": "AH", "e": None, "i": "AY", "o": "OW",
                     "u": "UW", "y": "IY"}[ch]
            if ch == "e" and not emitted_vowel:
                final = "IY"  # no other vowel: "the"-like, read it
            if ch == "i" and not word_final:
                final = "IY"  # stem-final i before a suffix (-ious, -iment)
            if final:
                out.append(final)
                emitted_vowel = True
            i += 1
            continue
        # magic-e: V + single consonant + final e
        if (i + 2 < n and i + 2 == n - 1 and word[i + 2] == "e"
                and not _is_vowel(word[i + 1]) and word[i + 1] != "r"):
            out.append(_LONG[ch])
            emitted_vowel = True
            i += 1
            continue
        # open syllable heuristic: vowel directly followed by another
        # syllable's vowel ("ia", "io" hiatus) — glide the first
        if _is_vowel(word[i + 1]) and word[i + 1] != ch:
            out.append("IY" if ch == "i" else  # -ious/-ia/-io hiatus
                       _LONG[ch] if ch in "aou" else _SHORT[ch])
            emitted_vowel = True
            i += 1
            continue
        out.append(_SHORT[ch])
        emitted_vowel = True
        i += 1
    return out


def _assign_stress(bases: list, *, has_primary: bool = False) -> list:
    """First undigited vowel gets 1 (or 2 when a suffix already owns the
    primary), the rest get 0 — g2p_en's stressed-ARPA output alphabet."""
    out, first = [], True
    for p in bases:
        if p in _ARPA_VOWEL_BASES:
            if first:
                out.append(p + ("2" if has_primary else "1"))
                first = False
            else:
                out.append(p + "0")
        else:
            out.append(p)
    return out


def _strip_suffix(word: str):
    """(stem, suffix_phones) or (word, None); applies the consonant-doubling
    convention: 'mapping' -> map (short), 'maping' -> map+e (long)."""
    for suf, phs, min_stem in _SUFFIXES:
        if word.endswith(suf) and len(word) - len(suf) >= min_stem:
            stem = word[: -len(suf)]
            if suf[0] in "aeiouy" and len(stem) >= 2:
                if stem[-1] == stem[-2] and not _is_vowel(stem[-1]):
                    stem = stem[:-1]  # doubled consonant: short vowel stays
                elif (not _is_vowel(stem[-1]) and _is_vowel(stem[-2])
                      and (len(stem) < 3 or not _is_vowel(stem[-3]))):
                    stem = stem + "e"  # restore the magic-e the suffix ate
            return stem, list(phs)
    # -ed / -es / -s with voicing assimilation (sentinel phones resolved in
    # _voice_assimilate). The 'e' of -es belongs to the suffix only after
    # sibilant letters (boxes, wishes); otherwise it's the stem's magic-e
    # (makes = make+s).
    if word.endswith("ed") and len(word) >= 5 and not _is_vowel(word[-3]):
        stem = word[:-2]
        if stem[-1] == stem[-2] and not _is_vowel(stem[-1]):
            stem = stem[:-1]
        elif _is_vowel(stem[-2]) and (len(stem) < 3 or not _is_vowel(stem[-3])):
            stem = stem + "e"
        return stem, ["D"]
    if (word.endswith("es") and len(word) >= 5
            and (word[-3] in "sxz" or word.endswith(("ches", "shes")))):
        return word[:-2], ["Z"]
    if word.endswith("s") and len(word) >= 4 and word[-2] not in "su":
        return word[:-1], ["Z"]
    return word, None


def letter_to_sound(word: str) -> list:
    """Rule-based LTS for OOV words: suffix morphology + context rules +
    single primary stress. Output phones are stressed ARPA (g2p_en alphabet)."""
    word = "".join(ch for ch in word.lower() if ch.isalpha())
    if not word:
        return []
    stem, suffix = _strip_suffix(word)
    bases = _core_scan(stem, word_final=suffix is None)
    if suffix is not None:
        has_primary = any(p[-1] == "1" for p in suffix if p[-1].isdigit())
        stem_phones = _assign_stress(bases, has_primary=has_primary)
        return stem_phones + _voice_assimilate(stem_phones, suffix)
    return _assign_stress(bases)


def _voice_assimilate(stem_phones: list, suffix: list) -> list:
    """-ed and -s/-es agree in voicing with the stem's final phone."""
    last = stem_phones[-1] if stem_phones else ""
    base = last.rstrip("012")
    if suffix == ["D"]:  # set by callers for 'ed' (see _SUFFIXES note)
        if base in ("T", "D"):
            return ["IH0", "D"]
        return ["T"] if base in _VOICELESS else ["D"]
    if suffix == ["Z"]:
        if base in _SIBILANTS:
            return ["IH0", "Z"]
        return ["S"] if base in _VOICELESS else ["Z"]
    return suffix


class EnglishG2P:
    """Dictionary-first English G2P (the en_G2p class, english.py:209-245)."""

    def __init__(self, dict_dir: str | None = None, extra_dict: dict | None = None):
        self.cmu = read_cmu_dict(dict_dir) if dict_dir else {}
        if extra_dict:
            self.cmu.update({k.lower(): list(v) for k, v in extra_dict.items()})
        # reference removes a few wrong-reading abbreviations (english.py:218)
        for word in ("ae", "ai", "ar", "ios", "hud", "os"):
            self.cmu.pop(word, None)
        # lone "a" reads EY1 (english.py:221)
        self.cmu["a"] = ["EY1"]
        self._arpa = arpa_symbols()

    # ------------------------------------------------------------------
    def word_phones(self, word: str) -> list:
        word = word.lower()
        if word in self.cmu:
            return list(self.cmu[word])
        return self.predict(word)

    def predict(self, word: str) -> list:
        # short OOV: spell letter by letter (english.py:228-230)
        if len(word) <= 3:
            return [ph for w in word for ph in self.word_phones(w)]
        # possessive (english.py:232-236)
        m = re.match(r"^([a-z]+)('s)$", word)
        if m:
            return self.word_phones(m.group(1)) + ["Z"]
        return self._letter_to_sound(word)

    def _letter_to_sound(self, word: str) -> list:
        return letter_to_sound(word)

    # ------------------------------------------------------------------
    def __call__(self, text: str) -> list:
        """english.py g2p(): phones for a text span, punctuation kept, phones
        outside the ARPA set dropped with ' -> - (replace_phs)."""
        out = []
        for token in re.split(r"([,.?!;:\"() \-])", text.lower()):
            if token == "" or token == " ":
                continue
            if re.match(r"[,.?!;:\"()\-]", token):
                out.append(token)
                continue
            for ph in self.word_phones(token):
                if ph in self._arpa:
                    out.append(ph)
                elif ph == "'":
                    out.append("-")
        return out
