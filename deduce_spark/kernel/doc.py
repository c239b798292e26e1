"""Lightweight per-document state used by the kernel annotators.

Stands in for the reference's docdeid ``Document`` (usage at reference
tests/unit/test_annotator.py:44-47): text, lazily-computed tokens,
metadata dict, and a growing set of mentions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from deduce_spark.kernel.mention import Mention
from deduce_spark.kernel.tokenize import Tok, Tokenizer


@dataclass
class Person:
    """Per-document known person (reference deduce/person.py:7-53)."""

    first_names: Optional[list[str]] = None
    initials: Optional[str] = None
    surname: Optional[str] = None


class Doc:
    __slots__ = ("text", "metadata", "_tokenizer", "_toks", "mentions")

    def __init__(
        self,
        text: str,
        tokenizer: Optional[Tokenizer] = None,
        metadata: Optional[dict[str, Any]] = None,
    ) -> None:
        self.text = text
        self.metadata: dict[str, Any] = metadata or {}
        self._tokenizer = tokenizer
        self._toks: Optional[list[Tok]] = None
        self.mentions: set[Mention] = set()

    @property
    def toks(self) -> list[Tok]:
        if self._toks is None:
            tokenizer = self._tokenizer or Tokenizer()
            self._toks = tokenizer.tokenize(self.text)
        return self._toks
