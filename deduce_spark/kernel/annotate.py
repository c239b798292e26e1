"""Mention detectors (annotators).

Each class reproduces one reference annotator family; citations point into
/root/reference/ so parity can be audited:

- token-pattern DSL + sequence matcher  (deduce/annotator.py:29-227)
- context extension with fixpoint       (deduce/annotator.py:230-340)
- known-person matcher                  (deduce/annotator.py:343-485)
- regexp annotator (+ pseudo filter)    (docdeid RegexpAnnotator contract;
                                         deduce/annotator.py:488-594)
- BSN elfproef                          (deduce/annotator.py:597-651)
- NL phone numbers                      (deduce/annotator.py:654-722)
- multi-token dictionary lookup         (docdeid MultiTokenLookupAnnotator
                                         contract, config
                                         deduce/base_config.json:149-436)

All operate on array-based tokens (``Tok`` + index navigation) instead of
the reference's linked lists; semantics are pinned by the ported tests in
tests/unit/test_annotate.py.
"""

from __future__ import annotations

import re
from bisect import bisect_right
from typing import Optional, Sequence

from deduce_spark.kernel.distance import within_edit_distance
from deduce_spark.kernel.doc import Doc
from deduce_spark.kernel.mention import Mention
from deduce_spark.kernel.tokenize import PhraseSet, Tok, Tokenizer


def _fuzzy(a: str, b: str, max_edit: Optional[int] = None) -> bool:
    """str_match equivalent (reference deduce/utils.py:13-32)."""
    if max_edit is None:
        return a == b
    return within_edit_distance(a, b, max_edit)


# ---------------------------------------------------------------------------
# token navigation helpers (replace docdeid's linked-list next()/previous())
# ---------------------------------------------------------------------------

def step_skip(
    toks: Sequence[Tok], i: int, delta: int, skip: frozenset[str] | set[str]
) -> Optional[int]:
    """Index of the nearest token in direction ``delta`` whose text is not in
    ``skip``; None at either end (reference _get_chained_token,
    deduce/annotator.py:133-143)."""
    n = len(toks)
    j = i + delta
    while 0 <= j < n and toks[j].text in skip:
        j += delta
    return j if 0 <= j < n else None


def token_index_at(toks: Sequence[Tok], start_char: int) -> Optional[int]:
    """Index of the token starting at ``start_char`` (bisect; used to recover
    token anchors for mentions that only carry char offsets)."""
    starts = [t.start for t in toks]
    i = bisect_right(starts, start_char) - 1
    return i if 0 <= i < len(toks) and toks[i].start == start_char else None


# ---------------------------------------------------------------------------
# pattern-position predicates (reference _PatternPositionMatcher,
# deduce/annotator.py:29-83)
# ---------------------------------------------------------------------------

def compile_position(pred: dict, ds):
    """Compile one pattern-position dict into a ``str -> bool`` closure
    (regexes precompiled, lookup sets bound once)."""
    if len(pred) != 1:
        raise ValueError(f"pattern position must have exactly 1 key: {pred}")
    op, arg = next(iter(pred.items()))
    if op == "equal":
        return lambda w: w == arg
    if op == "re_match":
        rx = re.compile(arg)
        return lambda w: rx.match(w) is not None
    if op == "is_initials":
        return lambda w: (len(w) <= 4 and w.isupper()) == arg
    if op == "like_name":
        return lambda w: (
            len(w) >= 3 and w.istitle() and not any(c.isdigit() for c in w)
        ) == arg
    if op in ("lookup", "neg_lookup"):
        ws = ds[arg]
        items = getattr(ws, "items", ws)
        norm = getattr(ws, "match_norm", None)
        if op == "lookup":
            if norm is None:
                return lambda w: w in items
            return lambda w: norm(w) in items
        if norm is None:
            return lambda w: w not in items
        return lambda w: norm(w) not in items
    if op == "and":
        fns = [compile_position(p, ds) for p in arg]
        return lambda w: all(f(w) for f in fns)
    if op == "or":
        fns = [compile_position(p, ds) for p in arg]
        return lambda w: any(f(w) for f in fns)
    raise NotImplementedError(f"unknown pattern predicate {op!r}")


def match_position(pred: dict, word: str, ds) -> bool:
    """Uncompiled single-shot form (tests / ad-hoc use)."""
    return compile_position(pred, ds)(word)


def match_sequence(
    text: str,
    toks: Sequence[Tok],
    pattern: Sequence,
    start_i: int,
    ds=None,
    *,
    direction: str = "right",
    skip: frozenset[str] | set[str] = frozenset(),
    tag: str = "_",
    priority: int = 0,
) -> Optional[Mention]:
    """Match ``pattern`` token-by-token from ``start_i`` going right or left
    (reference _match_sequence, deduce/annotator.py:145-196).  ``pattern``
    holds position dicts (compiled here) or precompiled closures."""
    delta = 1 if direction == "right" else -1
    order = pattern if direction == "right" else list(reversed(pattern))
    cur: Optional[int] = start_i
    last = start_i
    for pred in order:
        if not callable(pred):
            pred = compile_position(pred, ds)
        if cur is None or not pred(toks[cur].text):
            return None
        last = cur
        cur = step_skip(toks, cur, delta, skip)
    lo, hi = (start_i, last) if direction == "right" else (last, start_i)
    return Mention(
        text=text[toks[lo].start : toks[hi].end],
        start=toks[lo].start,
        end=toks[hi].end,
        tag=tag,
        priority=priority,
        start_i=lo,
        end_i=hi,
    )


class TokenPatternAnnotator:
    """Token-pattern DSL annotator (reference TokenPatternAnnotator,
    deduce/annotator.py:86-227)."""

    def __init__(
        self,
        pattern: list[dict],
        ds=None,
        skip: Optional[list[str]] = None,
        tag: str = "_",
        priority: int = 0,
    ) -> None:
        self.pattern = pattern
        self.ds = ds
        self.skip = frozenset(skip or ())
        self.tag = tag
        self.priority = priority
        self._compiled = [compile_position(p, ds) for p in pattern]
        self._start_words = None
        if pattern and "lookup" in pattern[0]:
            if ds is None:
                raise RuntimeError("lookup pattern requires datastructures")
            # candidate-start gate: only tokens in the first position's set
            ws = ds[pattern[0]["lookup"]]
            if getattr(ws, "match_norm", None) is None:
                self._start_words = getattr(ws, "items", ws)
            else:  # gate must apply the set's matching pipeline
                self._start_words = ws

    def annotate(self, doc: Doc) -> list[Mention]:
        toks = doc.toks
        out = []
        gate = self._start_words
        compiled = self._compiled
        for i in range(len(toks)):
            if gate is not None and toks[i].text not in gate:
                continue
            m = match_sequence(
                doc.text,
                toks,
                compiled,
                i,
                direction="right",
                skip=self.skip,
                tag=self.tag,
                priority=self.priority,
            )
            if m is not None:
                out.append(m)
        return out

    # compiled predicate closures are not picklable; rebuild after transfer
    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_compiled", None)
        state.pop("_start_words", None)
        return state

    def __setstate__(self, state):
        self.__init__(
            state["pattern"], ds=state["ds"], skip=list(state["skip"]),
            tag=state["tag"], priority=state["priority"],
        )


class ContextAnnotator:
    """Iteratively extends existing mentions left/right (reference
    ContextAnnotator, deduce/annotator.py:230-340). Mutates doc.mentions."""

    def __init__(self, pattern: list[dict], ds=None, iterative: bool = True) -> None:
        self.patterns = pattern
        self.ds = ds
        self.iterative = iterative
        self._compiled = {
            id(cpat): [compile_position(p, ds) for p in cpat["pattern"]]
            for cpat in pattern
        }

    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_compiled", None)
        return state

    def __setstate__(self, state):
        self.__init__(
            state["patterns"], ds=state["ds"], iterative=state["iterative"]
        )

    def _anchor(self, toks: Sequence[Tok], mention: Mention, right: bool) -> Optional[int]:
        i = mention.end_i if right else mention.start_i
        if i is not None:
            return i
        return token_index_at(toks, mention.start) if not right else None

    def _apply_one(
        self, text: str, toks: Sequence[Tok], mentions: set[Mention], cpat: dict
    ) -> set[Mention]:
        direction = cpat["direction"]
        right = direction == "right"
        skip = frozenset(cpat.get("skip", ()))
        pre_tags = cpat["pre_tag"]
        for mention in sorted(mentions, key=Mention.sort_key):
            parts = mention.tag.split("+")
            edge_tag = parts[-1] if right else parts[0]
            if edge_tag not in pre_tags:
                continue
            anchor = self._anchor(toks, mention, right)
            if anchor is None:
                continue
            start_i = step_skip(toks, anchor, 1 if right else -1, skip)
            if start_i is None:
                continue
            ext = match_sequence(
                text,
                toks,
                self._compiled.get(id(cpat), cpat["pattern"]),
                start_i,
                self.ds,
                direction=direction,
                skip=skip,
            )
            if ext is None:
                continue
            left, right_m = (mention, ext) if right else (ext, mention)
            merged = Mention(
                text=text[left.start : right_m.end],
                start=left.start,
                end=right_m.end,
                tag=cpat["tag"].format(tag=mention.tag),
                priority=mention.priority,
                start_i=left.start_i,
                end_i=right_m.end_i,
            )
            mentions.discard(mention)
            mentions.add(merged)
        return mentions

    def _extend(self, text: str, toks: Sequence[Tok], mentions: set[Mention]) -> set[Mention]:
        original = set(mentions)
        for cpat in self.patterns:
            mentions = self._apply_one(text, toks, mentions, cpat)
        if self.iterative:
            changed = mentions - original
            kept = mentions & original
            if changed:
                kept |= self._extend(text, toks, changed)
            return kept
        return mentions

    def annotate(self, doc: Doc) -> list[Mention]:
        doc.mentions = self._extend(doc.text, doc.toks, set(doc.mentions))
        return []


class MultiTokenLookupAnnotator:
    """Dictionary phrase matching over token sequences (docdeid
    MultiTokenLookupAnnotator contract; all reference configs use
    ``overlapping=true``, deduce/base_config.json:155-433)."""

    def __init__(
        self,
        phrases: PhraseSet,
        tag: str,
        priority: int = 0,
        overlapping: bool = True,
    ) -> None:
        self.phrases = phrases
        self.tag = tag
        self.priority = priority
        self.overlapping = overlapping

    def annotate(self, doc: Doc) -> list[Mention]:
        toks = doc.toks
        text = doc.text
        phrases = self.phrases
        norm = phrases.norm
        # normalize the token array once per (document, normalizer) and
        # share across the 7 phrase annotators (several reuse the same
        # normalizer; rebuilding per annotator measured ~8% of deidentify)
        cache_key = ("_norm_words", id(norm))
        words = doc.metadata.get(cache_key)
        if words is None:
            words = [t.text for t in toks] if norm is None else [
                norm(t.text) for t in toks
            ]
            doc.metadata[cache_key] = words
        by_first = phrases.by_first
        out = []
        i = 0
        n = len(toks)
        while i < n:
            if words[i] not in by_first:
                i += 1
                continue
            m = phrases.longest_match(words, i)
            if m is None:
                i += 1
                continue
            lo, hi = toks[i], toks[i + m - 1]
            out.append(
                Mention(
                    text=text[lo.start : hi.end],
                    start=lo.start,
                    end=hi.end,
                    tag=self.tag,
                    priority=self.priority,
                    start_i=i,
                    end_i=i + m - 1,
                )
            )
            i += 1 if self.overlapping else m
        return out


class RegexpAnnotator:
    """Regex mention detector with optional document gate (docdeid
    RegexpAnnotator contract; configs deduce/base_config.json:401-532).

    ``pre_match_words`` is a performance gate: the document is skipped
    entirely unless one of the words occurs in the lowercased text.  Every
    reference config lists words the regex itself requires, so the substring
    form never changes results — and it maps to a Catalyst-pushable
    ``contains`` predicate in the Spark plan."""

    def __init__(
        self,
        regexp_pattern: str,
        tag: str,
        capturing_group: int = 0,
        priority: int = 0,
        pre_match_words: Optional[list[str]] = None,
    ) -> None:
        self.pattern = re.compile(regexp_pattern)
        self.tag = tag
        self.group = capturing_group
        self.priority = priority
        self.pre_match_words = (
            tuple(w.lower() for w in pre_match_words) if pre_match_words else None
        )

    def _validate(self, match: re.Match, doc: Doc) -> bool:
        return True

    def annotate(self, doc: Doc) -> list[Mention]:
        if self.pre_match_words is not None:
            low = doc.metadata.get("_low_text")
            if low is None:
                low = doc.metadata["_low_text"] = doc.text.lower()
            if not any(w in low for w in self.pre_match_words):
                return []
        out = []
        for match in self.pattern.finditer(doc.text):
            captured = match.group(self.group)
            if captured is None or not self._validate(match, doc):
                continue
            start, end = match.span(self.group)
            out.append(
                Mention(captured, start, end, self.tag, self.priority)
            )
        return out


class RegexpPseudoAnnotator(RegexpAnnotator):
    """Regex annotator rejecting matches flanked by pseudo words (reference
    RegexpPseudoAnnotator, deduce/annotator.py:488-594)."""

    def __init__(
        self,
        *args,
        pre_pseudo: Optional[list[str]] = None,
        post_pseudo: Optional[list[str]] = None,
        lowercase: bool = True,
        **kwargs,
    ) -> None:
        super().__init__(*args, **kwargs)
        self.pre_pseudo = frozenset(pre_pseudo or ())
        self.post_pseudo = frozenset(post_pseudo or ())
        self.lowercase = lowercase

    @staticmethod
    def word_before(text: str, pos: int) -> str:
        """Run of alphabetic chars ending at the last non-space before pos."""
        chunk = text[:pos].strip()
        i = len(chunk)
        while i > 0 and chunk[i - 1].isalpha():
            i -= 1
        return chunk[i:]

    @staticmethod
    def word_after(text: str, pos: int) -> str:
        chunk = text[pos:].strip()
        i = 0
        while i < len(chunk) and chunk[i].isalpha():
            i += 1
        return chunk[:i]

    def _validate(self, match: re.Match, doc: Doc) -> bool:
        start, end = match.span(0)
        prev_word = self.word_before(doc.text, start)
        next_word = self.word_after(doc.text, end)
        if self.lowercase:
            prev_word = prev_word.lower()
            next_word = next_word.lower()
        return prev_word not in self.pre_pseudo and next_word not in self.post_pseudo


class BsnAnnotator:
    """BSN detector with elfproef checksum (reference BsnAnnotator,
    deduce/annotator.py:597-651)."""

    _WEIGHTS = (9, 8, 7, 6, 5, 4, 3, 2, -1)

    def __init__(
        self, bsn_regexp: str, tag: str, capture_group: int = 0, priority: int = 0
    ) -> None:
        self.pattern = re.compile(bsn_regexp)
        self.tag = tag
        self.group = capture_group
        self.priority = priority

    @classmethod
    def elfproef(cls, bsn: str) -> bool:
        if len(bsn) != 9 or not bsn.isdigit():
            raise ValueError("elfproef requires exactly 9 digits")
        return sum(int(c) * w for c, w in zip(bsn, cls._WEIGHTS)) % 11 == 0

    def annotate(self, doc: Doc) -> list[Mention]:
        out = []
        for match in self.pattern.finditer(doc.text):
            captured = match.group(self.group)
            digits = re.sub(r"\D", "", captured)
            if self.elfproef(digits):
                start, end = match.span(self.group)
                out.append(Mention(captured, start, end, self.tag, self.priority))
        return out


class PhoneNumberAnnotator:
    """NL phone numbers (reference PhoneNumberAnnotator,
    deduce/annotator.py:654-722): regex with (paren-prefix, country, area,
    number) groups, max one hyphen, digit count within [min,max] shifted -2
    for 0800/0900/0906/0909, unbalanced leading '(' trimmed."""

    _SHORT_PREFIXES = frozenset(("0800", "0900", "0906", "0909"))

    def __init__(
        self,
        phone_regexp: str,
        tag: str,
        min_digits: int = 9,
        max_digits: int = 11,
        priority: int = 0,
    ) -> None:
        self.pattern = re.compile(phone_regexp)
        self.tag = tag
        self.min_digits = min_digits
        self.max_digits = max_digits
        self.priority = priority

    def annotate(self, doc: Doc) -> list[Mention]:
        out = []
        for match in self.pattern.finditer(doc.text):
            whole = match.group(0)
            if whole.count("-") > 1:
                continue
            paren_prefix = match.group(1)
            area_digits = "0" + re.sub(r"\D", "", match.group(3))
            number_digits = re.sub(r"\D", "", match.group(4))
            shift = -2 if area_digits in self._SHORT_PREFIXES else 0
            total = len(area_digits) + len(number_digits)
            if not (self.min_digits + shift <= total <= self.max_digits + shift):
                continue
            trim = 1 if paren_prefix.startswith("(") and not paren_prefix.endswith(")") else 0
            start, end = match.span(0)
            out.append(
                Mention(whole[trim:], start + trim, end, self.tag, self.priority)
            )
        return out


class PatientNameAnnotator:
    """Metadata-driven known-person matcher (reference PatientNameAnnotator,
    deduce/annotator.py:343-485): exact/fuzzy first names, initials (with
    trailing period absorption), full-initials string, fuzzy multi-token
    surname."""

    def __init__(self, tokenizer: Tokenizer, tag: str = "_", priority: int = 0) -> None:
        self.tokenizer = tokenizer
        self.tag = tag
        self.priority = priority

    @staticmethod
    def _first_name_hit(first_names, word: str) -> bool:
        for name in first_names:
            if _fuzzy(word, name) or (
                len(word) > 3 and _fuzzy(word, name, max_edit=1)
            ):
                return True
        return False

    def _match_surname(
        self, pattern_words: list[str], toks: Sequence[Tok], i: int
    ) -> Optional[int]:
        """Try to match the tokenized surname starting at token i; returns the
        last matched token index.  NOTE: the reference's punctuation skip at
        deduce/annotator.py:396-405 compares Token objects against strings
        and therefore never skips (dataclass eq vs str is always False); we
        reproduce that observable behavior by advancing one token at a time.
        """
        n = len(toks)
        pi = 0
        j = i
        while True:
            if not within_edit_distance(pattern_words[pi], toks[j].text, 1):
                return None
            last = j
            pi += 1
            j += 1
            if pi >= len(pattern_words):
                return last
            if j >= n:
                return None

    def annotate(self, doc: Doc) -> list[Mention]:
        patient = doc.metadata.get("patient")
        if patient is None:
            return []
        toks = doc.toks
        text = doc.text
        n = len(toks)
        first_names = patient.first_names
        initials = patient.initials
        surname_words = None
        if patient.surname is not None:
            cached = doc.metadata.get("surname_pattern")
            if cached is None:
                cached = [t.text for t in self.tokenizer.tokenize(patient.surname)]
                doc.metadata["surname_pattern"] = cached
            surname_words = cached

        out = []
        for i, tok in enumerate(toks):
            word = tok.text
            if first_names is not None:
                if self._first_name_hit(first_names, word):
                    out.append(
                        Mention(word, tok.start, tok.end, "voornaam_patient",
                                self.priority, i, i)
                    )
                # initial-from-name: first char of any first name, absorbing
                # a directly following "." token
                if any(word == name[0] for name in first_names):
                    if i + 1 < n and toks[i + 1].text == ".":
                        out.append(
                            Mention(
                                text[tok.start : toks[i + 1].end],
                                tok.start,
                                toks[i + 1].end,
                                "initiaal_patient",
                                self.priority,
                                i,
                                i + 1,
                            )
                        )
                    else:
                        out.append(
                            Mention(word, tok.start, tok.end, "initiaal_patient",
                                    self.priority, i, i)
                        )
            if initials is not None and word == initials:
                out.append(
                    Mention(word, tok.start, tok.end, "initiaal_patient",
                            self.priority, i, i)
                )
            if surname_words:
                last = self._match_surname(surname_words, toks, i)
                if last is not None:
                    out.append(
                        Mention(
                            text[tok.start : toks[last].end],
                            tok.start,
                            toks[last].end,
                            "achternaam_patient",
                            self.priority,
                            i,
                            last,
                        )
                    )
        return out
