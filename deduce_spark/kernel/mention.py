"""Mention (annotation) value type.

Mirrors the observable contract of the reference's Annotation (a docdeid
frozen dataclass, fields used at reference deduce/annotator.py:188-196,
471-483): half-open char interval ``[start, end)`` over the document text,
string ``tag``, int ``priority``.  Equality and hash EXCLUDE priority and
token links — the reference's pipeline test compares sets built without
priority against annotators that set one (reference
tests/pipeline/test_deduce.py:18-56 vs bsn priority 100 in
deduce/base_config.json:493).
"""

from __future__ import annotations

from typing import NamedTuple, Optional


class Mention:
    """Immutable text span with a tag. Set-semantics key: (text,start,end,tag)."""

    __slots__ = ("text", "start", "end", "tag", "priority", "start_i", "end_i")

    def __init__(
        self,
        text: str,
        start: int,
        end: int,
        tag: str,
        priority: int = 0,
        start_i: Optional[int] = None,
        end_i: Optional[int] = None,
    ) -> None:
        object.__setattr__(self, "text", text)
        object.__setattr__(self, "start", start)
        object.__setattr__(self, "end", end)
        object.__setattr__(self, "tag", tag)
        object.__setattr__(self, "priority", priority)
        # optional token indices (first/last token of the span), used by
        # token-walking annotators; never part of equality
        object.__setattr__(self, "start_i", start_i)
        object.__setattr__(self, "end_i", end_i)

    def __setattr__(self, *_args) -> None:  # pragma: no cover
        raise AttributeError("Mention is immutable")

    @property
    def length(self) -> int:
        return self.end - self.start

    def _key(self) -> tuple:
        return (self.text, self.start, self.end, self.tag)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Mention) and self._key() == other._key()

    def __hash__(self) -> int:
        return hash(self._key())

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"Mention({self.text!r}, {self.start}, {self.end}, "
            f"{self.tag!r}, prio={self.priority})"
        )

    def sort_key(self) -> tuple:
        """Deterministic total order used for tie-breaking everywhere."""
        return (self.start, self.end, self.tag, self.text)


class TokSpan(NamedTuple):
    """A (start_index, end_index) pair into a token list, inclusive."""

    start_i: int
    end_i: int
