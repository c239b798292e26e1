"""Tokenizer semantics, pinned by reference tests/unit/test_tokenizer.py:24-98."""

from deduce_spark.kernel.tokenize import Tok, Tokenizer


def test_split_alpha():
    assert Tokenizer.split("Pieter van der Zee") == [
        Tok("Pieter", 0, 6),
        Tok("van", 7, 10),
        Tok("der", 11, 14),
        Tok("Zee", 15, 18),
    ]


def test_split_nonalpha():
    assert Tokenizer.split("prematuur (<p3)") == [
        Tok("prematuur", 0, 9),
        Tok("(", 10, 11),
        Tok("<", 11, 12),
        Tok("p3", 12, 14),
        Tok(")", 14, 15),
    ]


def test_split_multiple_spaces():
    # 1-3 spaces vanish; runs of >=4 are a single token
    assert Tokenizer.split("Pieter van der Zee     Bergen Op  Zoom") == [
        Tok("Pieter", 0, 6),
        Tok("van", 7, 10),
        Tok("der", 11, 14),
        Tok("Zee", 15, 18),
        Tok("     ", 18, 23),
        Tok("Bergen", 23, 29),
        Tok("Op", 30, 32),
        Tok("Zoom", 34, 38),
    ]


def test_split_newline():
    assert Tokenizer.split("regel 1 \n gevolgd door regel 2") == [
        Tok("regel", 0, 5),
        Tok("1", 6, 7),
        Tok("\n", 8, 9),
        Tok("gevolgd", 10, 17),
        Tok("door", 18, 22),
        Tok("regel", 23, 28),
        Tok("2", 29, 30),
    ]


def test_merge():
    tokenizer = Tokenizer(merge_terms=["van der"])
    assert tokenizer.tokenize("Pieter van der Zee") == [
        Tok("Pieter", 0, 6),
        Tok("van der", 7, 14),
        Tok("Zee", 15, 18),
    ]


def test_merge_longest_wins():
    tokenizer = Tokenizer(merge_terms=["van der", "van der Zee"])
    assert tokenizer.tokenize("Pieter van der Zee fietst") == [
        Tok("Pieter", 0, 6),
        Tok("van der Zee", 7, 18),
        Tok("fietst", 19, 25),
    ]


def test_merge_preserves_original_span_text():
    # merged token text is the original char span, including whitespace
    tokenizer = Tokenizer(merge_terms=["van der"])
    toks = tokenizer.tokenize("A van  der B")
    # "van  der" has a 2-space gap -> token texts are "van","der" and the
    # merge phrase matches on token texts; span text keeps both spaces
    assert Tok("van  der", 2, 10) in toks


def test_merge_no_match_on_partial():
    tokenizer = Tokenizer(merge_terms=["van der"])
    assert tokenizer.tokenize("van Zee") == [Tok("van", 0, 3), Tok("Zee", 4, 7)]
