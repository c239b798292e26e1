"""Tokenizer: regex split + greedy phrase merge.

Semantics (reference deduce/tokenizer.py:6,31-136; pinned by reference
tests/unit/test_tokenizer.py:24-98):

- tokens are the matches of ``\\w+|[\\n\\r\\t]| {4,}|[^ ]`` (case-insensitive,
  multiline, ``regex`` package \\w semantics): words, a single
  newline/tab/CR, a run of >=4 spaces, or any single non-space char.
  Runs of 1-3 spaces yield no token.
- optional merge pass: greedy left-to-right; wherever the token text is the
  first word of a merge phrase, the longest phrase whose words match the
  following token texts exactly is collapsed into one token whose text is
  the original char span.

Representation is array-based (no linked lists): a token is a ``Tok``
(text, start, end) and navigation is by index.
"""

from __future__ import annotations

from typing import Iterable, NamedTuple, Optional, Sequence

try:  # the reference depends on the `regex` package's \w semantics
    import regex as _re
    _SPLIT_RE = _re.compile(r"\w+|[\n\r\t]| {4,}|[^ ]", flags=_re.I | _re.M)
except ImportError:  # pragma: no cover - fallback, near-identical for our data
    import re as _re
    _SPLIT_RE = _re.compile(r"\w+|[\n\r\t]| {4,}|[^ ]", flags=_re.I | _re.M)


class Tok(NamedTuple):
    text: str
    start: int
    end: int


class PhraseSet:
    """Multi-word phrase dictionary with longest-prefix matching.

    Hash layout instead of a pointer trie: ``first word -> [(suffix_len,
    frozenset of suffix tuples), longest first]``.  Matching probes one
    hash set per distinct phrase length under a first word (a handful)
    instead of walking trie nodes — equivalent to the reference LookupTrie
    ``longest_matching_prefix`` (reference deduce/tokenizer.py:88-96,
    deduce/utils.py:261-280), O(1)-gated on the first word, and memory-lean
    enough to broadcast at full dictionary scale (~770k street phrases).

    ``norm`` is the match-time normalization pipeline (e.g. lowercase for
    hospitals, reference deduce/lookup_struct_loader.py:208), applied to
    items at build; CALLERS pass already-normalized word sequences to
    ``longest_match`` (normalize the token array once per document, not
    once per probe).
    """

    __slots__ = ("by_first", "norm", "max_len", "_dirty")

    def __init__(self, norm=None) -> None:
        self.by_first: dict[str, object] = {}  # building: set; frozen: list
        self.norm = norm
        self.max_len = 0
        self._dirty = False

    def add(self, words: Sequence[str]) -> None:
        if not words:
            return
        if self.norm is not None:
            words = [self.norm(w) for w in words]
        bucket = self.by_first.get(words[0])
        if bucket is None:
            bucket = self.by_first[words[0]] = set()
        elif not isinstance(bucket, set):
            bucket = self.by_first[words[0]] = {
                s for _, sset in bucket for s in sset
            }
        bucket.add(tuple(words[1:]))
        if len(words) > self.max_len:
            self.max_len = len(words)
        self._dirty = True

    def freeze(self) -> None:
        """Finalize buckets to [(len, frozenset), ...] longest-first."""
        if self._dirty:
            for key, bucket in self.by_first.items():
                by_len: dict[int, set] = {}
                for suffix in bucket:
                    by_len.setdefault(len(suffix), set()).add(suffix)
                self.by_first[key] = [
                    (ls, frozenset(by_len[ls])) for ls in sorted(by_len, reverse=True)
                ]
            self._dirty = False

    def __len__(self) -> int:
        self.freeze()
        return sum(len(sset) for v in self.by_first.values() for _, sset in v)

    def longest_match(self, words: Sequence[str], i: int) -> Optional[int]:
        """Length (in words) of the longest phrase matching words[i:], or
        None.  ``words`` must already be normalized per ``norm``."""
        if self._dirty:
            self.freeze()
        bucket = self.by_first.get(words[i])
        if bucket is None:
            return None
        n = len(words)
        for ls, sset in bucket:  # longest first
            if i + 1 + ls > n:  # not enough tokens left
                continue
            if ls == 0 or tuple(words[i + 1 : i + 1 + ls]) in sset:
                return ls + 1
        return None


class Tokenizer:
    """Split + merge tokenizer (reference DeduceTokenizer)."""

    def __init__(self, merge_terms: Optional[Iterable[str]] = None) -> None:
        self._phrases: Optional[PhraseSet] = None
        if merge_terms is not None:
            phrases = PhraseSet()
            for term in merge_terms:
                words = [t.text for t in self.split(term)]
                if words:
                    phrases.add(words)
            self._phrases = phrases

    @staticmethod
    def split(text: str) -> list[Tok]:
        return [
            Tok(m.group(0), m.start(), m.end()) for m in _SPLIT_RE.finditer(text)
        ]

    def tokenize(self, text: str) -> list[Tok]:
        toks = self.split(text)
        if self._phrases is None or not toks:
            return toks
        return self._merge(text, toks)

    def _merge(self, text: str, toks: list[Tok]) -> list[Tok]:
        words = [t.text for t in toks]
        out: list[Tok] = []
        i = 0
        n = len(toks)
        phrases = self._phrases
        by_first = phrases.by_first
        while i < n:
            if words[i] not in by_first:
                out.append(toks[i])
                i += 1
                continue
            m = phrases.longest_match(words, i)
            if m is None or m == 1:
                # single-word phrase still merges to itself; emit as-is
                out.append(toks[i])
                i += 1 if m is None else m
            else:
                first, last = toks[i], toks[i + m - 1]
                out.append(Tok(text[first.start : last.end], first.start, last.end))
                i += m
        return out
