"""Redaction: per-tag numbered placeholders with fuzzy text grouping.

Reference semantics (deduce/redactor.py:5-64, pinned by
tests/unit/test_redactor.py:6-81):

- group mentions by tag; within a group process in end_char order;
- tag ``patient`` -> ``[PATIENT]``;
- other tags -> ``[TAG-n]`` where n increments per fuzzy-distinct text:
  a mention joins the FIRST earlier mention in the group whose text is
  within Damerau-Levenshtein distance 1 (first-come numbering);
- replacements spliced into the text right-to-left so offsets stay valid.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Iterable

from deduce_spark.kernel.distance import within_edit_distance
from deduce_spark.kernel.mention import Mention


def redact(
    text: str,
    mentions: Iterable[Mention],
    open_char: str = "[",
    close_char: str = "]",
) -> str:
    replacement: dict[Mention, str] = {}
    by_tag: dict[str, list[Mention]] = defaultdict(list)
    for m in mentions:
        by_tag[m.tag].append(m)

    for tag, group in by_tag.items():
        ordered = sorted(group, key=lambda m: (m.end,) + m.sort_key())
        if tag == "patient":
            for m in ordered:
                replacement[m] = f"{open_char}PATIENT{close_char}"
            continue
        seen: list[tuple[str, str]] = []  # (text, placeholder) first-come
        counter = 1
        for m in ordered:
            assigned = None
            for prev_text, placeholder in seen:
                if within_edit_distance(m.text, prev_text, 1):
                    assigned = placeholder
                    break
            if assigned is None:
                assigned = f"{open_char}{tag.upper()}-{counter}{close_char}"
                counter += 1
            seen.append((m.text, assigned))
            replacement[m] = assigned

    return splice(text, replacement)


def splice(text: str, replacement: dict[Mention, str]) -> str:
    """Apply span replacements right-to-left (docdeid
    ``_replace_annotations_in_text`` contract)."""
    for m in sorted(replacement, key=lambda m: -m.end):
        text = text[: m.start] + replacement[m] + text[m.end :]
    return text


def annotate_intext(text: str, mentions: Iterable[Mention]) -> str:
    """Wrap spans as <TAG>text</TAG> (docdeid ``utils.annotate_intext``
    contract, used at reference tests/pipeline/test_deduce.py:72-87)."""
    for m in sorted(mentions, key=lambda m: -m.end):
        tag = m.tag.upper()
        text = (
            text[: m.start] + f"<{tag}>" + text[m.start : m.end] + f"</{tag}>"
            + text[m.end :]
        )
    return text
