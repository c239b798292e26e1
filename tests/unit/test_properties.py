"""Property-based invariants (hypothesis) for the kernel.

The regression corpus pins exact golden behavior on curated Dutch text;
these properties pin STRUCTURAL invariants on arbitrary web garbage —
unicode soup, emoji, control chars — which a Common-Crawl-scale run will
definitely contain (SURVEY.md §7 risk 6)."""

import re

from hypothesis import given, settings, strategies as st

from deduce_spark.kernel.distance import within_edit_distance
from deduce_spark.kernel.intervals import merge_adjacent, resolve_overlap
from deduce_spark.kernel.mention import Mention
from deduce_spark.kernel.tokenize import Tokenizer

# Dutch-ish words plus unicode garbage, whitespace runs, punctuation
_words = st.sampled_from(
    ["Jan", "Jansen", "de", "van", "ziekenhuis", "10", "oktober", "2018",
     "UMCU", "bsn", "111222333", "j.jansen@umcutrecht.nl", "(030)", "1234",
     "één", "straße", "Ĳsselmeer", "🙂", "‍", "ﬁets"]
)
_garbage = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=24
)
_texts = st.lists(
    st.one_of(_words, _garbage, st.sampled_from([" ", "  ", "    ", "\n", "\t", ". "])),
    max_size=40,
).map("".join)

_TOKENIZER = Tokenizer()


@settings(max_examples=200, deadline=None)
@given(_texts)
def test_tokenizer_span_invariants(text):
    toks = _TOKENIZER.tokenize(text)
    prev_end = 0
    for t in toks:
        assert 0 <= t.start < t.end <= len(text)
        assert text[t.start : t.end] == t.text
        assert t.start >= prev_end  # ordered, non-overlapping
        prev_end = t.end
    # every word character of the input is covered by some token
    covered = set()
    for t in toks:
        covered.update(range(t.start, t.end))
    for m in re.finditer(r"\w", text, re.UNICODE):
        assert m.start() in covered


def _mk_mentions(text, spans):
    out = []
    for (start, length, tag, prio) in spans:
        start = min(start, len(text))
        end = min(start + 1 + length, len(text))
        if start < end:
            out.append(Mention(text[start:end], start, end, tag, prio))
    return out


_spans = st.lists(
    st.tuples(
        st.integers(0, 60), st.integers(0, 8),
        st.sampled_from(["persoon", "patient", "locatie", "datum"]),
        st.integers(0, 2),
    ),
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(_texts, _spans)
def test_resolve_overlap_invariants(text, spans):
    mentions = _mk_mentions(text, spans)
    resolved = resolve_overlap(mentions, text)
    ordered = sorted(resolved, key=lambda m: m.start)
    for a, b in zip(ordered, ordered[1:]):
        assert a.end <= b.start  # pairwise disjoint
    for m in ordered:
        assert text[m.start : m.end] == m.text
    # idempotent: resolving a resolved set changes nothing
    assert resolve_overlap(resolved, text) == resolved
    # total coverage never grows
    assert sum(m.length for m in resolved) <= sum(
        min(m.end, len(text)) - m.start for m in mentions
    )


@settings(max_examples=200, deadline=None)
@given(_texts, _spans)
def test_merge_adjacent_invariants(text, spans):
    resolved = resolve_overlap(_mk_mentions(text, spans), text)
    merged = merge_adjacent(resolved, text, slack_regexp=r"[\. \-]?[\. ]?")
    ordered = sorted(merged, key=lambda m: m.start)
    for a, b in zip(ordered, ordered[1:]):
        assert a.end <= b.start
    for m in ordered:
        assert text[m.start : m.end] == m.text
    # fixpoint: merging again is a no-op
    assert merge_adjacent(merged, text, slack_regexp=r"[\. \-]?[\. ]?") == merged


def _osa_bruteforce(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[la][lb]


_short = st.text(alphabet="abcé", max_size=5)


@settings(max_examples=400, deadline=None)
@given(_short, _short, st.integers(0, 2))
def test_within_edit_distance_matches_bruteforce(a, b, k):
    assert within_edit_distance(a, b, k) == (_osa_bruteforce(a, b) <= k)


from deduce_spark.kernel.engine import Engine  # noqa: E402

_ENGINE = None


def _get_engine():
    global _ENGINE
    if _ENGINE is None:
        _ENGINE = Engine()
    return _ENGINE


@settings(max_examples=60, deadline=None)
@given(_texts)
def test_full_engine_on_garbage(text):
    """deidentify must never crash on web garbage; final mentions are
    in-bounds, slice-consistent, pairwise disjoint; redaction is applied."""
    doc = _get_engine().deidentify(text)
    ordered = sorted(doc.mentions, key=lambda m: m.start)
    for m in ordered:
        assert 0 <= m.start < m.end <= len(text)
        assert text[m.start : m.end] == m.text
    for a, b in zip(ordered, ordered[1:]):
        assert a.end <= b.start
    red = doc.metadata.get("redacted_text")
    assert isinstance(red, str)
    if not ordered:
        assert red == text
