#!/usr/bin/env python3
"""Generate golden vectors for _normalize_skill parity.

Replicates the reference normalization exactly
(/root/reference/recommendation_system/backend/student_recommender.py:28-41):
strip, lowercase, then delete every char outside
[a-z0-9Ͱ-Ͽἀ-῿\s\-\+\.#].

Writes src/test/resources/normalize_vectors.json.
"""
import json
import re


def normalize_skill(s):
    if not s:
        return ""
    s = str(s).strip().lower()
    s = re.sub(r"[^a-z0-9Ͱ-Ͽἀ-῿\s\-\+\.#]", "", s)
    return s


def main():
    cases = [
        "",
        "   ",
        "Python",
        "  Machine Learning  ",
        "C++/Java",
        "C# and .NET",
        "ΠΛΗΡΟΦΟΡΙΚΗ",
        "Ανάλυση Δεδομένων",
        "μαθηματικά",
        "ὕδωρ ἀρχή",          # polytonic block
        "ΤΕΛΟΣ τέλος τέλοσ",   # final sigma stays ς after .lower()? no: ς input
        "τέλος",
        "e-mail & web 2.0!",
        "tabs\there\tand\nnewlines",
        "non breaking space",
        "narrow space and figure space",
        "nelchar",
        "Data—Science – analysis",   # em/en dash deleted (not ASCII hyphen)
        "café résumé",               # accented latin deleted
        "skill (advanced) [v2] {x}",
        "100% effort!!",
        "a+b-c.d#e",
        "ΔΙΟΊΚΗΣΗ ΕΠΙΧΕΙΡΉΣΕΩΝ",     # Greek with tonos
        "I İ ı",                      # dotted/dotless I edge
        "mixed Ελληνικά and English 42",
        "  trailing punct!  ",
        "...", "###", "+-+",
        "русский текст",              # Cyrillic deleted entirely
        "日本語テキスト",
    ]
    vecs = [{"in": c, "out": normalize_skill(c)} for c in cases]
    with open("src/test/resources/normalize_vectors.json", "w") as f:
        json.dump(vecs, f)  # ensure_ascii: \uXXXX escapes keep the file ASCII-parseable
    print(f"wrote {len(vecs)} vectors")


if __name__ == "__main__":
    main()
