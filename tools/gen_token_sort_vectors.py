#!/usr/bin/env python3
"""Generate golden vectors for fuzz.token_sort_ratio parity.

token_sort_ratio = difflib ratio over the sorted token join, KEEPING
duplicate tokens (fuzzywuzzy sorts the processed token list, it does not
dedup it). Processing = lowercase + split on non-[a-z0-9].

Writes src/test/resources/token_sort_vectors.json.
"""
import difflib
import json
import random
import re


def tokens(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def token_sort_ratio(a, b):
    sa = " ".join(sorted(tokens(a)))
    sb = " ".join(sorted(tokens(b)))
    sm = difflib.SequenceMatcher(None, sa, sb, autojunk=False)
    return int(round(sm.ratio() * 100))


def main():
    random.seed(20260816)
    fixed = [
        ("big big data", "big data"),
        ("Intro to Databases", "databases to intro"),
        ("machine learning", "learning machine"),
        ("data data analysis", "data analysis analysis"),
        ("", ""),
        ("a", ""),
        ("C# and .NET", "net and c"),
        ("Vorlesung: Statistik II", "statistik ii vorlesung"),
    ]
    words = ["data", "analysis", "intro", "to", "databases", "machine",
             "learning", "advanced", "systems", "prog", "programming",
             "ii", "statistics", "big", "net", "c"]
    rand = []
    for _ in range(60):
        a = " ".join(random.choices(words, k=random.randint(1, 5)))
        b = " ".join(random.choices(words, k=random.randint(1, 5)))
        rand.append((a, b))
    vecs = [{"a": a, "b": b, "score": token_sort_ratio(a, b)}
            for a, b in fixed + rand]
    with open("src/test/resources/token_sort_vectors.json", "w") as f:
        json.dump(vecs, f)
    print(f"wrote {len(vecs)} vectors")


if __name__ == "__main__":
    main()
