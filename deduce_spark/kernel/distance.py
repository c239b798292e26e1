"""Bounded Damerau-Levenshtein edit distance.

Replaces ``rapidfuzz.distance.DamerauLevenshtein.distance(..., score_cutoff=k)``
(not installable offline).  All reference call sites only ever test
``distance <= 1`` (fuzzy name matching, reference deduce/utils.py:13-32;
redactor grouping, deduce/redactor.py:40-44), where the restricted (OSA) and
unrestricted variants coincide, so an OSA dynamic program with a band cutoff
is exact for every use in this engine.

Behavior pinned by reference tests/unit/test_utils.py:17-29 (e.g.
"willem"~"Willem" within 1, "willem"~"wilhelm" not).
"""

from __future__ import annotations


def within_edit_distance(a: str, b: str, k: int = 1) -> bool:
    """True iff OSA Damerau-Levenshtein distance(a, b) <= k. Case-sensitive."""
    if a == b:
        return True
    if k <= 0:
        return False
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    if k == 1:
        return _within_one(a, b, la, lb)
    return _osa_banded(a, b, k)


def _within_one(a: str, b: str, la: int, lb: int) -> bool:
    """Specialized distance<=1 check: one substitution, indel, or adjacent swap."""
    if la == lb:
        # first mismatch position
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        if i == la:
            return True
        # single substitution?
        if a[i + 1 :] == b[i + 1 :]:
            return True
        # adjacent transposition?
        return (
            i + 1 < la
            and a[i] == b[i + 1]
            and a[i + 1] == b[i]
            and a[i + 2 :] == b[i + 2 :]
        )
    # length differs by one: single insertion/deletion
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _osa_banded(a: str, b: str, k: int) -> bool:
    """Full OSA DP (short strings only; generic k fallback)."""
    la, lb = len(a), len(b)
    prev2: list[int] = []
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d = min(d, prev2[j - 2] + 1)
            cur[j] = d
        prev2, prev = prev, cur
    return prev[lb] <= k
