"""Mention-set operators: overlap resolution, merge-adjacent, tag cleanup.

Reproduces the reference's post-processing set operators:

- OverlapResolver (docdeid, wired at deduce/deduce.py:255-291 and inside
  PersonAnnotationConverter, deduce/annotation_processor.py:69-83): sort by
  a priority key; winners claim their char span; losers are TRIMMED to their
  uncovered remainder (possibly split into several fragments), not dropped —
  pinned by tests/unit/test_annotation_processor.py:139-161.
- DeduceMergeAdjacentAnnotations (deduce/annotation_processor.py:8-54):
  merge neighbours whose gap matches a slack regexp and whose tags are equal
  or {patient,persoon} (-> patient).
- PersonAnnotationConverter (deduce/annotation_processor.py:57-101),
  RemoveAnnotations / CleanAnnotationTag (:104-143).

All pure functions over ``set[Mention]`` — page-local, shuffle-free.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable, Optional

from deduce_spark.kernel.mention import Mention

SortKey = Callable[[Mention], tuple]


def resolve_overlap(
    mentions: Iterable[Mention],
    text: str,
    sort_key: Optional[SortKey] = None,
) -> set[Mention]:
    """Trim-on-overlap resolution.

    Default key = the post-processing config (priority desc, length desc,
    deduce/base_config.json:3-12) with a deterministic positional
    tie-break (the reference inherits set iteration order there).
    """
    if sort_key is None:
        def sort_key(m: Mention) -> tuple:
            return (-m.priority, -m.length) + m.sort_key()

    out: set[Mention] = set()
    covered: list[tuple[int, int]] = []  # disjoint, sorted claimed intervals
    for m in sorted(mentions, key=sort_key):
        for lo, hi in _uncovered_runs(m.start, m.end, covered):
            out.add(
                Mention(text[lo:hi], lo, hi, m.tag, m.priority,
                        m.start_i if (lo, hi) == (m.start, m.end) else None,
                        m.end_i if (lo, hi) == (m.start, m.end) else None)
            )
            _claim(covered, lo, hi)
    return out


def _uncovered_runs(
    start: int, end: int, covered: list[tuple[int, int]]
) -> list[tuple[int, int]]:
    """Maximal sub-intervals of [start, end) not intersecting any claimed one."""
    runs = []
    cur = start
    for lo, hi in covered:
        if hi <= cur:
            continue
        if lo >= end:
            break
        if lo > cur:
            runs.append((cur, min(lo, end)))
        cur = max(cur, hi)
        if cur >= end:
            break
    if cur < end:
        runs.append((cur, end))
    return [(lo, hi) for lo, hi in runs if hi > lo]


def _claim(covered: list[tuple[int, int]], start: int, end: int) -> None:
    """Insert [start,end) keeping ``covered`` sorted and disjoint."""
    i = 0
    while i < len(covered) and covered[i][0] < start:
        i += 1
    covered.insert(i, (start, end))
    # coalesce neighbours (claimed runs never overlap by construction)
    j = 0
    while j + 1 < len(covered):
        a, b = covered[j], covered[j + 1]
        if a[1] >= b[0]:
            covered[j] = (a[0], max(a[1], b[1]))
            covered.pop(j + 1)
        else:
            j += 1


def merge_adjacent(
    mentions: Iterable[Mention],
    text: str,
    slack_regexp: Optional[str] = None,
) -> set[Mention]:
    """Merge neighbours whose gap text fullmatches the slack regexp and whose
    tags match per Deduce logic (equal, or {patient, persoon} -> patient)."""
    slack = re.compile(slack_regexp) if slack_regexp is not None else None
    ordered = sorted(mentions, key=lambda m: (m.start, m.end) + m.sort_key())
    out: set[Mention] = set()
    cur: Optional[Mention] = None
    for m in ordered:
        if cur is None:
            cur = m
            continue
        gap = text[cur.end : m.start]
        adjacent = (gap == "") if slack is None else (
            slack.fullmatch(gap) is not None
        )
        if adjacent and _tags_match(cur.tag, m.tag):
            tag = cur.tag if cur.tag == m.tag else "patient"
            cur = Mention(text[cur.start : m.end], cur.start, m.end, tag)
        else:
            out.add(cur)
            cur = m
    if cur is not None:
        out.add(cur)
    return out


def _tags_match(left: str, right: str) -> bool:
    return left == right or {left, right} == {"patient", "persoon"}


def convert_person_mentions(mentions: Iterable[Mention], text: str) -> set[Mention]:
    """Name-group post-pass (reference PersonAnnotationConverter,
    deduce/annotation_processor.py:57-101): resolve overlap with key
    (pseudo < patient < other, then longer-first), drop pseudo tags and
    whitespace-only remnants, map tags to patient/persoon."""

    def tag_rank(tag: str) -> int:
        if "pseudo" in tag:
            return 0
        if "patient" in tag:
            return 1
        return 2

    def key(m: Mention) -> tuple:
        return (tag_rank(m.tag), -m.length) + m.sort_key()

    resolved = resolve_overlap(mentions, text, sort_key=key)
    return {
        Mention(
            m.text,
            m.start,
            m.end,
            "patient" if "patient" in m.tag else "persoon",
        )
        for m in resolved
        if "pseudo" not in m.tag and m.text.strip() != ""
    }


def drop_tags(mentions: Iterable[Mention], tags: Iterable[str]) -> set[Mention]:
    blocked = set(tags)
    return {m for m in mentions if m.tag not in blocked}


def remap_tags(mentions: Iterable[Mention], tag_map: dict[str, str]) -> set[Mention]:
    return {
        Mention(m.text, m.start, m.end, tag_map.get(m.tag, m.tag), m.priority,
                m.start_i, m.end_i)
        for m in mentions
    }
