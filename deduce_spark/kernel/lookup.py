"""Lookup structures: normalizers, word sets, raw itemset loading, transforms.

Reproduces:
- string modifiers/filters (reference deduce/str/processor.py:7-101 and the
  docdeid ones used at deduce/lookup_struct_loader.py:21-236), pinned by
  reference tests/unit/str/test_str.py:15-79;
- raw itemset loading: items.txt minus exceptions.txt, union of nested
  ``lst_*`` dirs, then transform.json variant expansion (reference
  deduce/lookup_structs.py:50-112), pinned by
  tests/unit/test_lookup_struct.py:19-43;
- variant expansion ``str_variations``/``apply_transform`` (reference
  deduce/utils.py:91-220), pinned by tests/unit/test_utils.py:96-214
  including output order.

Normalizers are plain callables ``str -> str | None`` (None = filtered out),
applied driver-side at dictionary build; match-time normalization is a
single composed function so it stays cheap inside UDF batches.
"""

from __future__ import annotations

import json
import re
import unicodedata
from pathlib import Path
from typing import Callable, Iterable, Optional, Sequence

Norm = Callable[[str], Optional[str]]


# ---------------------------------------------------------------------------
# scalar string functions (modifiers return str, filters return str | None)
# ---------------------------------------------------------------------------

def lowercase(s: str) -> str:
    return s.lower()


def uppercase(s: str) -> str:
    return s.upper()


def upper_first(s: str) -> str:
    return (s[0].upper() + s[1:]) if s else s


def titlecase(s: str) -> str:
    return s.title()


def strip_string(s: str) -> str:
    return s.strip()


def take_last_token(s: str) -> str:
    return s.split(" ")[-1]


def ascii_fold(s: str) -> str:
    """Replace non-ASCII chars by their decomposed ASCII base (é -> e)."""
    return unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")


def min_length(n: int) -> Norm:
    def _f(s: str) -> Optional[str]:
        return s if len(s) >= n else None

    return _f


def replace_value(old: str, new: str) -> Norm:
    def _f(s: str) -> str:
        return s.replace(old, new)

    return _f


def remove_values(values: Sequence[str]) -> Norm:
    """Remove words between spaces or at the very start/end (space-bounded),
    matching the reference's regex construction exactly
    (deduce/str/processor.py:36-58, incl. the 'vanSchip' quirk)."""
    patterns = [
        re.compile(r"(^" + v + r" | " + v + r" | " + v + r"$)") for v in values
    ]

    def _f(s: str) -> str:
        for pat in patterns:
            s = pat.sub("", s)
        return s

    return _f


def acronimify(split_value: str = " ", join_value: str = "") -> Norm:
    def _f(s: str) -> str:
        return join_value.join(x[0] for x in s.split(split_value) if x)

    return _f


def not_in_set(filter_items: Iterable[str], case_sensitive: bool = True) -> Norm:
    """Filter out items present in ``filter_items`` (reference
    FilterBasedOnLookupSet, deduce/str/processor.py:83-101)."""
    if case_sensitive:
        blocked = frozenset(filter_items)

        def _f(s: str) -> Optional[str]:
            return None if s in blocked else s

    else:
        blocked = frozenset(x.lower() for x in filter_items)

        def _f(s: str) -> Optional[str]:
            return None if s.lower() in blocked else s

    return _f


def chain(*norms: Norm) -> Norm:
    """Compose normalizers left-to-right; short-circuits on None."""

    def _f(s: str) -> Optional[str]:
        for n in norms:
            s = n(s)
            if s is None:
                return None
        return s

    return _f


def apply_pipeline(items: Iterable[str], pipeline: Sequence[Norm]) -> set[str]:
    out = set()
    for item in items:
        cur: Optional[str] = item
        for n in pipeline:
            cur = n(cur)
            if cur is None:
                break
        if cur is not None:
            out.add(cur)
    return out


# ---------------------------------------------------------------------------
# WordSet — LookupSet equivalent
# ---------------------------------------------------------------------------

class WordSet:
    """A set of strings with an optional match-time normalizer.

    Items are stored normalized (symmetric normalization), membership
    normalizes the probe; e.g. the whitelist matches lowercase (reference
    deduce/lookup_struct_loader.py:49).
    """

    __slots__ = ("items", "match_norm")

    def __init__(
        self,
        items: Iterable[str] = (),
        match_norm: Optional[Norm] = None,
    ) -> None:
        self.match_norm = match_norm
        self.items: set[str] = set()
        self.update(items)

    def update(self, items: Iterable[str]) -> None:
        if self.match_norm is None:
            self.items.update(items)
        else:
            for it in items:
                n = self.match_norm(it)
                if n is not None:
                    self.items.add(n)

    def add_variants(self, pipeline: Sequence[Norm], replace: bool = False) -> None:
        """Apply a cleaning pipeline to current items; add (or replace with)
        the results — docdeid ``add_items_from_self`` semantics."""
        cleaned = apply_pipeline(self.items, pipeline)
        if replace:
            self.items = cleaned
        else:
            self.items.update(cleaned)

    def discard(self, items: Iterable[str]) -> None:
        for it in items:
            self.items.discard(it)

    def __contains__(self, probe: str) -> bool:
        if self.match_norm is not None:
            probe = self.match_norm(probe)
            if probe is None:
                return False
        return probe in self.items

    def __len__(self) -> int:
        return len(self.items)

    def __iter__(self):
        return iter(self.items)


# ---------------------------------------------------------------------------
# variant expansion (transform.json)
# ---------------------------------------------------------------------------

def _spans_overlap(spans: list[tuple]) -> bool:
    ordered = sorted(spans, key=lambda t: t[0])
    return any(
        ordered[i][1] > ordered[i + 1][0] for i in range(len(ordered) - 1)
    )


def segment_options(s: str, matches: list[tuple]) -> list[list[str]]:
    """Cut ``s`` into consecutive segments, each with 1+ replacement options
    (reference repl_segments, deduce/utils.py:112-144)."""
    if not matches:
        return [[s]]
    segments: list[list[str]] = []
    pos = 0
    for start, end, options in sorted(matches, key=lambda t: t[0]):
        if pos != start:
            segments.append([s[pos:start]])
        segments.append(options)
        pos = end
    if matches[-1][1] != len(s):
        segments.append([s[pos:]])
    return segments


def string_variations(s: str, repl: dict[str, list[str]]) -> list[str]:
    """All variants of ``s`` under the replacement map; patterns are regexes
    (reference str_variations, deduce/utils.py:147-191; order pinned by
    tests/unit/test_utils.py:187-199)."""
    matches: list[tuple] = []
    for pattern, options in repl.items():
        for m in re.finditer(pattern, s):
            matches.append((m.start(), m.end(), options))
    if not matches:
        return [s]
    if _spans_overlap(matches):
        raise RuntimeError(
            f"overlapping replacement spans while expanding {s!r}"
        )
    variations = [""]
    for options in segment_options(s, matches):
        variations = [prefix + opt for opt in options for prefix in variations]
    return variations


def expand_transform(items: set[str], transform_config: dict) -> set[str]:
    """Apply transform groups sequentially, each adding variants of every
    current item (reference apply_transform, deduce/utils.py:194-220)."""
    strip_lines = transform_config.get("strip_lines", True)
    for _, repl in transform_config.get("transforms", {}).items():
        added: list[str] = []
        for item in items:
            added.extend(string_variations(item, repl))
        items.update(added)
    if strip_lines:
        items = {i.strip() for i in items}
    return items


# ---------------------------------------------------------------------------
# raw itemset loading (items.txt / exceptions.txt / transform.json / lst_*)
# ---------------------------------------------------------------------------

def _read_lines(path: Path) -> Optional[set[str]]:
    try:
        with open(path, "r", encoding="utf-8") as fh:
            return {line.strip() for line in fh}
    except FileNotFoundError:
        return None


def load_raw_itemset(path: Path) -> set[str]:
    """Load one list dir (reference load_raw_itemset,
    deduce/lookup_structs.py:50-89): items minus exceptions, union nested
    ``lst_*`` dirs, then transform expansion.  Note ``streets_bag.txt`` and
    other stray files are intentionally ignored."""
    path = Path(path)
    items = _read_lines(path / "items.txt")
    exceptions = _read_lines(path / "exceptions.txt")
    subdirs = sorted(path.glob("lst_*"))
    if items is None:
        if not subdirs:
            raise RuntimeError(f"no items.txt or lst_* sublists under {path}")
        items = set()
    if exceptions is not None:
        items -= exceptions
    for sub in subdirs:
        items |= load_raw_itemset(sub)
    try:
        with open(path / "transform.json", "r", encoding="utf-8") as fh:
            transform_config = json.load(fh)
    except FileNotFoundError:
        transform_config = None
    if transform_config is not None:
        items = expand_transform(items, transform_config)
    return items


def load_raw_itemsets(
    base_path: Path, subdirs: Iterable[str], src_subdir: str = "src"
) -> dict[str, set[str]]:
    """Load several lists keyed by dirname stripped of ``lst_`` (reference
    load_raw_itemsets, deduce/lookup_structs.py:92-112; the reference
    resolves paths under ``<base>/src/<subdir>``)."""
    base_path = Path(base_path) / src_subdir if src_subdir else Path(base_path)
    out = {}
    for rel in subdirs:
        name = rel.split("/")[-1].removeprefix("lst_")
        out[name] = load_raw_itemset(base_path / rel)
    return out
