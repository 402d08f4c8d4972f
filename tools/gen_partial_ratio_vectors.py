#!/usr/bin/env python3
"""Generate golden vectors for fuzz.partial_ratio parity.

Replicates fuzzywuzzy's published partial_ratio algorithm with CPython
difflib (autojunk=False, matching the engine's pinned semantics): for
each matching block (i, j, size) of (shorter, longer), score the window
longer[max(0, j-i) : +len(shorter)] with SequenceMatcher.ratio, take the
max, int(round(x*100)).

Writes src/test/resources/partial_ratio_vectors.json.
"""
import difflib
import json
import random


def partial_ratio(a, b):
    s, l = (a, b) if len(a) <= len(b) else (b, a)
    if not s:
        return 100 if not l else 0
    if len(s) == len(l):
        sm = difflib.SequenceMatcher(None, s, l, autojunk=False)
        return int(round(sm.ratio() * 100))
    best = 0.0
    sm = difflib.SequenceMatcher(None, s, l, autojunk=False)
    # fuzzywuzzy iterates ALL blocks including the terminal zero-size
    # sentinel (len(s), len(l), 0), which anchors the tail window at
    # max(0, len(l)-len(s)) — do NOT skip size == 0
    for (i, j, size) in sm.get_matching_blocks():
        start = max(0, j - i)
        sub = l[start:start + len(s)]
        r = difflib.SequenceMatcher(None, s, sub, autojunk=False).ratio()
        if r > best:
            best = r
    return int(round(best * 100))


def main():
    random.seed(20260817)
    fixed = [
        ("machine", "advanced machine learning"),
        ("advanced machine learning", "machine"),
        ("green", "sorted distinct part names olive drab"),
        ("data science", "datascience and engineering"),
        ("abc", "xyz"),
        ("kitten", "sitting in the kitchen"),
        ("statistik", "statistics and probability"),
        ("", ""),
        ("abc", ""),
    ]
    words = ["data", "green", "steel", "machine", "learning", "intro",
             "analysis", "metallic", "burnished", "olive", "lavender",
             "chocolate", "linen", "navy"]
    rand = []
    for _ in range(60):
        a = " ".join(random.choices(words, k=random.randint(1, 2)))
        b = " ".join(random.choices(words, k=random.randint(2, 8)))
        rand.append((a, b))
    vecs = [{"a": a, "b": b, "score": partial_ratio(a, b)}
            for a, b in fixed + rand]
    with open("src/test/resources/partial_ratio_vectors.json", "w") as f:
        json.dump(vecs, f)
    print(f"wrote {len(vecs)} vectors")


if __name__ == "__main__":
    main()
