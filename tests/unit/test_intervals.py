"""Set-operator semantics, pinned by reference
tests/unit/test_annotation_processor.py."""

from deduce_spark.kernel import intervals
from deduce_spark.kernel.mention import Mention


def M(text, start, end, tag, priority=0):
    return Mention(text, start, end, tag, priority)


class TestMergeAdjacent:
    SLACK = "[\\. \\-]?[\\. ]?"

    def test_tags_match(self):
        assert intervals._tags_match("a", "a")
        assert intervals._tags_match("patient", "persoon")
        assert intervals._tags_match("persoon", "patient")
        assert not intervals._tags_match("a", "b")
        assert not intervals._tags_match("persoon", "huisnummer")

    def test_merge_equal_tags(self):
        text = "Jan Jansen"
        out = intervals.merge_adjacent(
            [M("Jan", 0, 3, "naam"), M("Jansen", 4, 10, "naam")], text, self.SLACK
        )
        assert out == {M("Jan Jansen", 0, 10, "naam")}

    def test_merge_patient_persoon(self):
        text = "Jan Jansen"
        out = intervals.merge_adjacent(
            [M("Jan", 0, 3, "patient"), M("Jansen", 4, 10, "persoon")], text, self.SLACK
        )
        assert out == {M("Jan Jansen", 0, 10, "patient")}

    def test_no_merge_distinct_tags(self):
        text = "Jan Jansen"
        out = intervals.merge_adjacent(
            [M("Jan", 0, 3, "naam"), M("Jansen", 4, 10, "locatie")], text, self.SLACK
        )
        assert out == {M("Jan", 0, 3, "naam"), M("Jansen", 4, 10, "locatie")}

    def test_no_merge_large_gap(self):
        text = "Jan  -  Jansen"
        out = intervals.merge_adjacent(
            [M("Jan", 0, 3, "naam"), M("Jansen", 8, 14, "naam")], text, self.SLACK
        )
        assert len(out) == 2

    def test_merge_chain(self):
        text = "Jan de Jansen"
        out = intervals.merge_adjacent(
            [M("Jan", 0, 3, "naam"), M("de", 4, 6, "naam"), M("Jansen", 7, 13, "naam")],
            text,
            self.SLACK,
        )
        assert out == {M("Jan de Jansen", 0, 13, "naam")}


class TestOverlapResolver:
    def test_trim_keeps_remainder(self):
        # pinned: tests/unit/test_annotation_processor.py:139-161 via the
        # person converter (patient wins, loser trimmed to " Jansen")
        text = "Jan Jansen"
        out = intervals.convert_person_mentions(
            [M("Jan", 0, 3, "voornaam_patient"), M("Jan Jansen", 0, 10, "naam_onbekend")],
            text,
        )
        assert out == {M("Jan", 0, 3, "patient"), M(" Jansen", 3, 10, "persoon")}

    def test_patient_overlap_longest_patient_wins(self):
        text = "Jan Jansen"
        out = intervals.convert_person_mentions(
            [M("Jan", 0, 3, "voornaam_patient"), M("Jan Jansen", 0, 10, "naam_patient")],
            text,
        )
        assert out == {M("Jan Jansen", 0, 10, "patient")}

    def test_no_overlap_mapping(self):
        text = "Jan Jansen"
        out = intervals.convert_person_mentions(
            [
                M("Jan", 0, 3, "voornaam_patient"),
                M("Jansen", 4, 10, "achternaam_onbekend"),
            ],
            text,
        )
        assert out == {M("Jan", 0, 3, "patient"), M("Jansen", 4, 10, "persoon")}

    def test_pseudo_drops_overlapped(self):
        text = "Henoch Schonlein"
        out = intervals.convert_person_mentions(
            [
                M("Henoch", 0, 6, "voornaam"),
                M("Henoch Schonlein", 0, 16, "pseudo_naam"),
            ],
            text,
        )
        assert out == set()

    def test_priority_resolution(self):
        # post-processing key: priority desc then length desc
        text = "nummer 111222333 hier"
        out = intervals.resolve_overlap(
            [M("111222333", 7, 16, "bsn", 100), M("111222333", 7, 16, "id", 0)], text
        )
        assert out == {M("111222333", 7, 16, "bsn", 100)}

    def test_split_into_fragments(self):
        text = "abcdefghij"
        out = intervals.resolve_overlap(
            [
                M("cdef", 2, 6, "win", 10),
                M("abcdefghij", 0, 10, "lose", 0),
            ],
            text,
        )
        assert out == {
            M("cdef", 2, 6, "win", 10),
            M("ab", 0, 2, "lose"),
            M("ghij", 6, 10, "lose"),
        }


class TestTagOps:
    def test_drop_tags(self):
        out = intervals.drop_tags(
            [M("Jan", 0, 3, "voornaam_patient"), M("Jansen", 4, 10, "achternaam_patient")],
            ["voornaam_patient", "nonexisting_tag"],
        )
        assert out == {M("Jansen", 4, 10, "achternaam_patient")}

    def test_remap_tags(self):
        out = intervals.remap_tags(
            [M("Jan", 0, 3, "voornaam_patient"), M("Jansen", 4, 10, "achternaam_patient")],
            {"voornaam_patient": "voornaam", "nonexistent": "test"},
        )
        assert out == {
            M("Jan", 0, 3, "voornaam"),
            M("Jansen", 4, 10, "achternaam_patient"),
        }
