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


# naive letter-to-sound rules for long OOV words (g2p_en stand-in)
_LTS = {
    "a": ["AE1"], "b": ["B"], "c": ["K"], "d": ["D"], "e": ["EH1"],
    "f": ["F"], "g": ["G"], "h": ["HH"], "i": ["IH1"], "j": ["JH"],
    "k": ["K"], "l": ["L"], "m": ["M"], "n": ["N"], "o": ["AA1"],
    "p": ["P"], "q": ["K"], "r": ["R"], "s": ["S"], "t": ["T"],
    "u": ["AH1"], "v": ["V"], "w": ["W"], "x": ["K", "S"], "y": ["Y"],
    "z": ["Z"],
}

_DIGRAPHS = [("tch", ["CH"]), ("ch", ["CH"]), ("sh", ["SH"]), ("th", ["TH"]),
             ("ph", ["F"]), ("ck", ["K"]), ("ng", ["NG"]), ("qu", ["K", "W"]),
             ("oo", ["UW1"]), ("ee", ["IY1"]), ("ea", ["IY1"]), ("ai", ["EY1"]),
             ("ay", ["EY1"]), ("ou", ["AW1"]), ("ow", ["AW1"]), ("oi", ["OY1"]),
             ("oy", ["OY1"])]


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
        phones, i = [], 0
        while i < len(word):
            for pat, phs in _DIGRAPHS:
                if word.startswith(pat, i):
                    phones.extend(phs)
                    i += len(pat)
                    break
            else:
                phones.extend(_LTS.get(word[i], []))
                i += 1
        return phones

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
