"""Annotator semantics, pinned by reference tests/unit/test_annotator.py."""

import re

import pytest

from deduce_spark.kernel import annotate as ann
from deduce_spark.kernel.doc import Doc, Person
from deduce_spark.kernel.lookup import WordSet
from deduce_spark.kernel.mention import Mention
from deduce_spark.kernel.tokenize import PhraseSet, Tokenizer


@pytest.fixture
def ds():
    return {
        "first_names": WordSet(["Andries", "pieter", "Aziz", "Bernard"]),
        "surnames": WordSet(["Meijer", "Smit", "Bakker", "Heerma"]),
    }


@pytest.fixture
def tokenizer():
    return Tokenizer()


@pytest.fixture
def pattern_doc(tokenizer):
    return Doc("De man heet Andries Meijer-Heerma, voornaam Andries.", tokenizer)


# ---- pattern position predicates ----

class TestPositionMatcher:
    def test_equal(self):
        assert ann.match_position({"equal": "test"}, "test", None)
        assert not ann.match_position({"equal": "_"}, "test", None)

    def test_re_match(self):
        assert ann.match_position({"re_match": "[a-z]"}, "abc", None)
        assert ann.match_position({"re_match": "[a-z]"}, "abc123", None)
        assert not ann.match_position({"re_match": "[a-z]"}, "", None)
        assert not ann.match_position({"re_match": "[a-z]"}, "123", None)
        assert not ann.match_position({"re_match": "[a-z]"}, "123abc", None)

    def test_is_initials(self):
        for word in ("A", "AB", "ABC", "ABCD"):
            assert ann.match_position({"is_initials": True}, word, None)
        for word in ("ABCDE", "", "abcd", "abcde"):
            assert not ann.match_position({"is_initials": True}, word, None)

    def test_like_name(self):
        assert ann.match_position({"like_name": True}, "Diederik", None)
        assert not ann.match_position({"like_name": True}, "Le", None)
        assert not ann.match_position({"like_name": True}, "diederik", None)
        assert not ann.match_position({"like_name": True}, "Diederik3", None)

    def test_lookup(self, ds):
        assert ann.match_position({"lookup": "first_names"}, "Andries", ds)
        assert not ann.match_position({"lookup": "first_names"}, "andries", ds)
        assert not ann.match_position({"lookup": "surnames"}, "Andries", ds)
        assert ann.match_position({"lookup": "surnames"}, "Smit", ds)

    def test_neg_lookup(self, ds):
        assert not ann.match_position({"neg_lookup": "first_names"}, "Andries", ds)
        assert ann.match_position({"neg_lookup": "first_names"}, "andries", ds)
        assert ann.match_position({"neg_lookup": "surnames"}, "smit", ds)

    def test_and_or(self, ds):
        assert ann.match_position(
            {"and": [{"equal": "Abcd"}, {"like_name": True}]}, "Abcd", ds
        )
        assert not ann.match_position(
            {"and": [{"equal": "dcef"}, {"like_name": True}]}, "Abcd", ds
        )
        assert ann.match_position(
            {"or": [{"equal": "A"}, {"like_name": True}]}, "A", ds
        )
        assert not ann.match_position(
            {"or": [{"equal": "b"}, {"like_name": True}]}, "a", ds
        )


# ---- sequence matching ----

class TestTokenPattern:
    def test_match_sequence(self, pattern_doc, ds):
        pattern = [{"lookup": "first_names"}, {"like_name": True}]
        m = ann.match_sequence(pattern_doc.text, pattern_doc.toks, pattern, 3, ds)
        assert m == Mention("Andries Meijer", 12, 26, "_")
        assert ann.match_sequence(pattern_doc.text, pattern_doc.toks, pattern, 7, ds) is None

    def test_match_sequence_left(self, pattern_doc, ds):
        pattern = [{"lookup": "first_names"}, {"like_name": True}]
        m = ann.match_sequence(
            pattern_doc.text, pattern_doc.toks, pattern, 4, ds, direction="left"
        )
        assert m == Mention("Andries Meijer", 12, 26, "_")
        assert (
            ann.match_sequence(
                pattern_doc.text, pattern_doc.toks, pattern, 8, ds, direction="left"
            )
            is None
        )

    def test_match_sequence_skip(self, pattern_doc, ds):
        pattern = [{"lookup": "surnames"}, {"like_name": True}]
        m = ann.match_sequence(
            pattern_doc.text, pattern_doc.toks, pattern, 4, ds, skip={"-"}
        )
        assert m == Mention("Meijer-Heerma", 20, 33, "_")
        assert (
            ann.match_sequence(pattern_doc.text, pattern_doc.toks, pattern, 4, ds)
            is None
        )

    def test_annotate(self, pattern_doc, ds):
        tpa = ann.TokenPatternAnnotator(
            pattern=[{"lookup": "first_names"}, {"like_name": True}], ds=ds, tag="_"
        )
        assert tpa.annotate(pattern_doc) == [Mention("Andries Meijer", 12, 26, "_")]


# ---- context annotator ----

class TestContextAnnotator:
    def _mention(self, doc, text, start, end, tag, start_i, end_i):
        return Mention(text, start, end, tag, 0, start_i, end_i)

    def test_apply_right(self, pattern_doc):
        ca = ann.ContextAnnotator(pattern=[])
        mentions = {self._mention(pattern_doc, "Andries", 12, 19, "voornaam", 3, 3)}
        out = ca._apply_one(
            pattern_doc.text,
            pattern_doc.toks,
            mentions,
            {
                "pattern": [{"like_name": True}],
                "direction": "right",
                "pre_tag": "voornaam",
                "tag": "{tag}+naam",
            },
        )
        assert out == {Mention("Andries Meijer", 12, 26, "voornaam+naam")}

    def test_apply_left(self, pattern_doc):
        ca = ann.ContextAnnotator(pattern=[])
        mentions = {self._mention(pattern_doc, "Meijer", 20, 26, "achternaam", 4, 4)}
        out = ca._apply_one(
            pattern_doc.text,
            pattern_doc.toks,
            mentions,
            {
                "pattern": [{"like_name": True}],
                "direction": "left",
                "pre_tag": "achternaam",
                "tag": "naam+{tag}",
            },
        )
        assert out == {Mention("Andries Meijer", 12, 26, "naam+achternaam")}

    def test_apply_skip(self, pattern_doc):
        ca = ann.ContextAnnotator(pattern=[])
        mentions = {self._mention(pattern_doc, "Meijer", 20, 26, "achternaam", 4, 4)}
        out = ca._apply_one(
            pattern_doc.text,
            pattern_doc.toks,
            mentions,
            {
                "pattern": [{"like_name": True}],
                "direction": "right",
                "skip": ["-"],
                "pre_tag": "achternaam",
                "tag": "{tag}+naam",
            },
        )
        assert out == {Mention("Meijer-Heerma", 20, 33, "achternaam+naam")}

    def test_annotate_multiple(self, pattern_doc):
        ca = ann.ContextAnnotator(
            pattern=[
                {
                    "pattern": [{"like_name": True}],
                    "direction": "right",
                    "pre_tag": "voornaam",
                    "tag": "{tag}+naam",
                },
                {
                    "pattern": [{"like_name": True}],
                    "direction": "right",
                    "skip": ["-"],
                    "pre_tag": "achternaam",
                    "tag": "{tag}+naam",
                },
            ],
            iterative=False,
        )
        mentions = {self._mention(pattern_doc, "Andries", 12, 19, "voornaam", 3, 3)}
        out = ca._extend(pattern_doc.text, pattern_doc.toks, mentions)
        assert out == {Mention("Andries Meijer-Heerma", 12, 33, "voornaam+naam+naam")}

    def test_annotate_iterative(self, pattern_doc):
        ca = ann.ContextAnnotator(
            pattern=[
                {
                    "pattern": [{"like_name": True}],
                    "direction": "right",
                    "skip": ["-"],
                    "pre_tag": ["naam", "voornaam"],
                    "tag": "{tag}+naam",
                }
            ],
            iterative=True,
        )
        mentions = {self._mention(pattern_doc, "Andries", 12, 19, "voornaam", 3, 3)}
        out = ca._extend(pattern_doc.text, pattern_doc.toks, mentions)
        assert out == {Mention("Andries Meijer-Heerma", 12, 33, "voornaam+naam+naam")}


# ---- patient names ----

class TestPatientName:
    def _doc(self, text, patient, tokenizer):
        return Doc(text, tokenizer, metadata={"patient": patient})

    def test_first_name_exact_and_fuzzy(self, tokenizer):
        a = ann.PatientNameAnnotator(tokenizer)
        assert a._first_name_hit(["Jan", "Adriaan"], "Jan")
        assert a._first_name_hit(["Adriaan"], "Adriana")  # fuzzy, len>3
        assert not a._first_name_hit(["Jan"], "Dan")  # fuzzy blocked, len<=3

    def test_annotate_first_name(self, tokenizer):
        doc = self._doc(
            "De patient heet Jan",
            Person(first_names=["Jan", "Johan"], initials="JJ", surname="Jansen"),
            tokenizer,
        )
        ms = ann.PatientNameAnnotator(tokenizer).annotate(doc)
        assert Mention("Jan", 16, 19, "voornaam_patient") in ms
        # "Jan" is not also an initial ("J" is first char but token != "J")
        assert all(m.tag != "initiaal_patient" for m in ms)

    def test_annotate_initials(self, tokenizer):
        doc = self._doc(
            "De patient heet JJ",
            Person(first_names=["Jan", "Johan"], initials="JJ", surname="Jansen"),
            tokenizer,
        )
        ms = ann.PatientNameAnnotator(tokenizer).annotate(doc)
        assert ms == [Mention("JJ", 16, 18, "initiaal_patient")]

    def test_annotate_initial_with_period(self, tokenizer):
        doc = self._doc(
            "De patient heet J.",
            Person(first_names=["Jan", "Johan"], initials="JJ", surname="Jansen"),
            tokenizer,
        )
        ms = ann.PatientNameAnnotator(tokenizer).annotate(doc)
        assert ms == [Mention("J.", 16, 18, "initiaal_patient")]

    def test_annotate_surname(self, tokenizer):
        doc = self._doc(
            "De patient heet Jansen",
            Person(first_names=["Jan", "Johan"], initials="JJ", surname="Jansen"),
            tokenizer,
        )
        ms = ann.PatientNameAnnotator(tokenizer).annotate(doc)
        assert ms == [Mention("Jansen", 16, 22, "achternaam_patient")]

    def test_surname_fuzzy_multitoken(self):
        tokenizer = Tokenizer(merge_terms=["Van der"])
        a = ann.PatientNameAnnotator(tokenizer)
        doc = self._doc(
            "naam Van der Heijde-Ginkle is bekend",
            Person(surname="Van der Heide-Ginkel"),
            tokenizer,
        )
        ms = a.annotate(doc)
        assert ms == [
            Mention("Van der Heijde-Ginkle", 5, 26, "achternaam_patient")
        ]

    def test_surname_unequal_first_token(self):
        tokenizer = Tokenizer(merge_terms=["Van der"])
        a = ann.PatientNameAnnotator(tokenizer)
        doc = self._doc(
            "naam v/der Heide-Ginkel is bekend",
            Person(surname="Van der Heide-Ginkel"),
            tokenizer,
        )
        assert a.annotate(doc) == []

    def test_surname_longer_than_tokens(self):
        tokenizer = Tokenizer(merge_terms=["Van der"])
        a = ann.PatientNameAnnotator(tokenizer)
        doc = self._doc(
            "naam Van der Heide",
            Person(surname="Van der Heide-Ginkel"),
            tokenizer,
        )
        assert a.annotate(doc) == []


# ---- regexp pseudo (ages) ----

class TestRegexpPseudo:
    DOC = Doc("De patient is Na 12 jaar gestopt met medicijnen.")

    def test_word_before(self):
        f = ann.RegexpPseudoAnnotator.word_before
        assert f("12 jaar", 0) == ""
        assert f("<12 jaar", 1) == ""
        assert f("patient 12 jaar", 8) == "patient"
        assert f("(sinds 12 jaar)", 7) == "sinds"
        assert f("patient is 12 jaar)", 11) == "is"

    def test_word_after(self):
        f = ann.RegexpPseudoAnnotator.word_after
        assert f("12 jaar", 7) == ""
        assert f("12 jaar, geleden", 7) == ""
        assert f("12 jaar geleden", 7) == "geleden"
        assert f("12 jaar geleden geopereerd", 7) == "geleden"

    def _match(self):
        return next(re.finditer(r"\d+ jaar", self.DOC.text))

    def test_validate(self):
        r = ann.RegexpPseudoAnnotator("_", tag="_")
        assert r._validate(self._match(), self.DOC)

    def test_validate_pre(self):
        r = ann.RegexpPseudoAnnotator("_", tag="_", pre_pseudo=["sinds", "al", "vanaf"])
        assert r._validate(self._match(), self.DOC)

    def test_validate_post(self):
        r = ann.RegexpPseudoAnnotator(
            "_", tag="_", post_pseudo=["geleden", "getrouwd", "gestopt"]
        )
        assert not r._validate(self._match(), self.DOC)

    def test_validate_lowercase(self):
        r = ann.RegexpPseudoAnnotator("_", tag="_", pre_pseudo=["na"], lowercase=True)
        assert not r._validate(self._match(), self.DOC)


# ---- bsn ----

class TestBsn:
    def test_elfproef(self):
        assert ann.BsnAnnotator.elfproef("111222333")
        assert not ann.BsnAnnotator.elfproef("111222334")
        assert ann.BsnAnnotator.elfproef("123456782")
        assert not ann.BsnAnnotator.elfproef("123456783")

    def test_elfproef_invalid_input(self):
        with pytest.raises(ValueError):
            ann.BsnAnnotator.elfproef("12345678")
        with pytest.raises(ValueError):
            ann.BsnAnnotator.elfproef("test")

    def test_annotate(self):
        doc = Doc(
            "Geldige voorbeelden zijn: 111222333 en 123456782. "
            "Patientnummer is 01234, en ander id 01234567890."
        )
        a = ann.BsnAnnotator("(\\D|^)(\\d{9})(\\D|$)", tag="_", capture_group=2)
        assert a.annotate(doc) == [
            Mention("111222333", 26, 35, "_"),
            Mention("123456782", 39, 48, "_"),
        ]

    def test_annotate_with_nondigits(self):
        doc = Doc("1234.56.782")
        a = ann.BsnAnnotator(r"\d{4}\.\d{2}\.\d{3}", tag="_")
        assert a.annotate(doc) == [Mention("1234.56.782", 0, 11, "_")]


# ---- phone ----

PHONE_RE = (
    r"(?<!\d)"
    r"(\(?(0031|\+31|0)"
    r"(1[035]|2[0347]|3[03568]|4[03456]|5[0358]|6|7|88|800|91|90[069]|"
    r"[1-5]\d{2})\)?)"
    r" ?-? ?"
    r"((\d{2,4}[ -]?)+\d{2,4})"
)

PHONE_DOC = Doc(
    "Telefoonnummers zijn 0314-555555, (088 755 55 55) of (06)55555555, "
    "maar 065555 is te kort en 065555555555 is te lang. "
    "Verwijsnummer is 0800-9003."
)


class TestPhone:
    def test_defaults(self):
        a = ann.PhoneNumberAnnotator(PHONE_RE, tag="_")
        assert a.annotate(PHONE_DOC) == [
            Mention("0314-555555", 21, 32, "_"),
            Mention("088 755 55 55", 35, 48, "_"),
            Mention("(06)55555555", 53, 65, "_"),
            Mention("0800-9003", 135, 144, "_"),
        ]

    def test_short(self):
        a = ann.PhoneNumberAnnotator(PHONE_RE, tag="_", min_digits=4, max_digits=8)
        assert a.annotate(PHONE_DOC) == [Mention("065555", 72, 78, "_")]

    def test_long(self):
        a = ann.PhoneNumberAnnotator(PHONE_RE, tag="_", min_digits=11, max_digits=12)
        assert a.annotate(PHONE_DOC) == [Mention("065555555555", 93, 105, "_")]


# ---- multi-token lookup ----

class TestMultiTokenLookup:
    def test_overlapping(self):
        ps = PhraseSet()
        ps.add(["Albert", "Schweitzer"])
        ps.add(["Schweitzer"])
        doc = Doc("in het Albert Schweitzer ziekenhuis")
        a = ann.MultiTokenLookupAnnotator(ps, tag="zkh", overlapping=True)
        assert a.annotate(doc) == [
            Mention("Albert Schweitzer", 7, 24, "zkh"),
            Mention("Schweitzer", 14, 24, "zkh"),
        ]

    def test_non_overlapping(self):
        ps = PhraseSet()
        ps.add(["Albert", "Schweitzer"])
        ps.add(["Schweitzer"])
        doc = Doc("in het Albert Schweitzer ziekenhuis")
        a = ann.MultiTokenLookupAnnotator(ps, tag="zkh", overlapping=False)
        assert a.annotate(doc) == [Mention("Albert Schweitzer", 7, 24, "zkh")]

    def test_norm(self):
        from deduce_spark.kernel.lookup import lowercase

        ps = PhraseSet(norm=lowercase)
        ps.add(["UMCU"])
        doc = Doc("opgenomen in het umcu gisteren")
        a = ann.MultiTokenLookupAnnotator(ps, tag="zkh")
        assert a.annotate(doc) == [Mention("umcu", 17, 21, "zkh")]
