"""Redaction semantics, pinned by reference tests/unit/test_redactor.py."""

from deduce_spark.kernel.mention import Mention
from deduce_spark.kernel.redact import annotate_intext, redact


def M(text, start, end, tag):
    return Mention(text, start, end, tag)


def test_redact_patient():
    assert (
        redact("Jan Jansen", [M("Jan", 0, 3, "patient"), M("Jansen", 4, 10, "patient")])
        == "[PATIENT] [PATIENT]"
    )


def test_redact_mixed():
    out = redact(
        "Jan Jansen, wonende in Rotterdam",
        [M("Jan Jansen", 0, 10, "patient"), M("Rotterdam", 23, 32, "woonplaats")],
    )
    assert out == "[PATIENT], wonende in [WOONPLAATS-1]"


def test_redact_count_multiple():
    out = redact(
        "Jan Jansen, wonende in Rotterdam, verhuisd vanuit Groningen",
        [M("Rotterdam", 23, 32, "woonplaats"), M("Groningen", 50, 59, "woonplaats")],
    )
    assert out == "Jan Jansen, wonende in [WOONPLAATS-1], verhuisd vanuit [WOONPLAATS-2]"


def test_redact_count_multiple_fuzzy():
    out = redact(
        "Jan Jansen, wonende in Ommen, verhuisd vanuit Emmen",
        [M("Ommen", 23, 28, "woonplaats"), M("Emmen", 46, 51, "woonplaats")],
    )
    assert out == "Jan Jansen, wonende in [WOONPLAATS-1], verhuisd vanuit [WOONPLAATS-1]"


def test_annotate_intext():
    out = annotate_intext(
        "Jan was hier", [M("Jan", 0, 3, "persoon")]
    )
    assert out == "<PERSOON>Jan</PERSOON> was hier"
