#!/usr/bin/env python3
"""Error analysis of the English OOV prediction path (VERDICT r4 next-9).

Runs the held-out CMUdict eval (3000 words, same protocol as
tests/test_cleaner.py::test_predict_path_per_floor), aligns predicted vs
gold phone sequences, and classifies every edit:

  * substitutions split into vowel-quality (vowel->vowel, stress stripped),
    consonant, and vowel<->consonant;
  * stress-placement errors counted separately (phones right, primary
    stress on the wrong syllable) — NOT part of PER (PER strips stress)
    but reported because they are audible;
  * insertions / deletions by phone class;
  * per-terminal-suffix PER for the 30 most frequent 3-letter endings, to
    find systematic suffix-class failures.

Usage: python tools/lts_error_analysis.py [--n 3000] [--top 25]
"""

import argparse
import collections
import os
import random
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
REF_TEXT = "/root/reference/training/gpt-sovits/text"

VOWELS = {"AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY", "IH",
          "IY", "OW", "OY", "UH", "UW"}


def read_cmu(path):
    cmu = {}
    with open(os.path.join(path, "cmudict.rep"), encoding="latin-1") as f:
        for i, line in enumerate(f):
            if i < 57 or not line.strip():
                continue
            parts = line.strip().split("  ")
            if len(parts) != 2:
                continue
            w = parts[0].lower()
            if not re.fullmatch(r"[a-z']+", w):
                continue
            cmu.setdefault(w, tuple(parts[1].split(" ")))
    return cmu


def align(a, b):
    """Levenshtein alignment; returns list of (op, pa, pb)."""
    n, m = len(a), len(b)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    ops = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and d[i][j] == d[i - 1][j - 1] + (a[i - 1] != b[j - 1]):
            ops.append(("sub" if a[i - 1] != b[j - 1] else "eq", a[i - 1], b[j - 1]))
            i, j = i - 1, j - 1
        elif i > 0 and d[i][j] == d[i - 1][j] + 1:
            ops.append(("ins", a[i - 1], None))  # predicted extra
            i -= 1
        else:
            ops.append(("del", None, b[j - 1]))  # missing gold phone
            j -= 1
    return ops[::-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3000)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from vosk_tts_tpu.text.en_g2p import EnglishG2P

    cmu = read_cmu(REF_TEXT)
    random.seed(0)
    words = [w for w in cmu if re.fullmatch(r"[a-z]{4,12}", w)]
    sample = random.sample(words, args.n)

    g = EnglishG2P(REF_TEXT)
    strip = lambda ps: [p.rstrip("012") for p in ps]

    cat = collections.Counter()
    sub_pairs = collections.Counter()
    ins_ph = collections.Counter()
    del_ph = collections.Counter()
    suffix_err = collections.Counter()
    suffix_tot = collections.Counter()
    stress_wrong = 0
    exact = 0
    tot_e = tot_p = 0
    worst = []

    for w in sample:
        saved = g.cmu.pop(w, None)
        got = g.word_phones(w)
        if saved is not None:
            g.cmu[w] = saved
        gold = list(cmu[w])
        gs, ps = strip(gold), strip(got)
        ops = align(ps, gs)
        errs = sum(1 for op, *_ in ops if op != "eq")
        tot_e += errs
        tot_p += len(gs)
        sfx = w[-3:]
        suffix_err[sfx] += errs
        suffix_tot[sfx] += len(gs)
        if errs == 0:
            exact += 1
            # stress placement: index of the primary-stressed vowel
            def stress_idx(ph):
                return next((i for i, p in enumerate(ph) if p.endswith("1")), -1)
            if stress_idx(got) != stress_idx(gold):
                stress_wrong += 1
        else:
            worst.append((errs / len(gs), w, " ".join(ps), " ".join(gs)))
        for op, pa, pb in ops:
            if op == "sub":
                va, vb = pa in VOWELS, pb in VOWELS
                if va and vb:
                    cat["sub_vowel_quality"] += 1
                elif not va and not vb:
                    cat["sub_consonant"] += 1
                else:
                    cat["sub_vowel_consonant"] += 1
                sub_pairs[(pa, pb)] += 1
            elif op == "ins":
                cat["ins_vowel" if pa in VOWELS else "ins_consonant"] += 1
                ins_ph[pa] += 1
            elif op == "del":
                cat["del_vowel" if pb in VOWELS else "del_consonant"] += 1
                del_ph[pb] += 1

    per = tot_e / tot_p
    print(f"held-out words: {args.n};  PER (stress-stripped): {per:.4f}")
    print(f"exact (phones): {exact} ({exact/args.n:.1%});  of those, primary "
          f"stress misplaced: {stress_wrong} ({stress_wrong/max(exact,1):.1%})")
    print("\nerror categories (share of all edits):")
    total = sum(cat.values())
    for k, v in cat.most_common():
        print(f"  {k:22s} {v:6d}  {v/total:.1%}")
    print(f"\ntop substitutions (pred -> gold):")
    for (pa, pb), v in sub_pairs.most_common(args.top):
        print(f"  {pa:4s}-> {pb:4s} {v:5d}")
    print(f"\ntop insertions (predicted extra): "
          f"{ins_ph.most_common(10)}")
    print(f"top deletions (gold missing):     {del_ph.most_common(10)}")
    print(f"\nworst suffix classes (>=30 gold phones):")
    rows = [(e / t, s, e, t) for s, t in suffix_tot.items()
            if t >= 30 for e in [suffix_err[s]]]
    for r, s, e, t in sorted(rows, reverse=True)[: args.top]:
        print(f"  -{s:4s} PER {r:.3f}  ({e}/{t})")
    print(f"\nworst words:")
    for r, w, p, gd in sorted(worst, reverse=True)[:15]:
        print(f"  {w:14s} {r:.2f}  pred: {p}")
        print(f"  {'':14s}       gold: {gd}")


if __name__ == "__main__":
    main()
