"""Parity tests for the pure-Python kernel.

Cases mirror the reference's pinned behaviors (its tests/test_dedup.py groups
A-F); these constants define bit-exactness for the scoring cascade.
"""

import difflib

import pytest

from ufo_dedup_spark import kernel
from ufo_dedup_spark.kernel import (
    SRC_MUFON,
    SRC_NUFORC,
    compute_similarity,
    normalize_city,
    parse_ufosearch_city_state,
    strip_mufon_boilerplate,
    strip_nuforc_prefix,
    token_jaccard,
)

DESC_ORB = (
    "A bright orange orb hovered over the treeline for several minutes "
    "before shooting straight up into the clouds at incredible speed."
)
DESC_ORB_NUFORC = "NUFORC UFO Sighting 4242 " + DESC_ORB
DESC_TRIANGLE = (
    "Three lights in a triangular formation moved slowly across the night "
    "sky, completely silent, before fading out one by one."
)
DESC_MUFON_BOILERPLATE = (
    "Submitted by razor via e-mail case 991. Investigator Notes: " + DESC_TRIANGLE
)
DESC_UNRELATED = "Grocery prices continued to rise throughout the quarter."
DESC_MODERATE_A = (
    "Saw a bright light over the lake moving north very fast then it stopped"
)
DESC_MODERATE_B = (
    "Bright light observed over the lake headed north at high speed before stopping"
)


class TestNormalizeCity:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("phoenix", "PHOENIX"),
            ("PHOENIX", "PHOENIX"),
            ("Springfield (North)", "SPRINGFIELD"),
            ("Phoenix?", "PHOENIX"),
            ("Phoenix.", "PHOENIX"),
            ("Phoenix!", "PHOENIX"),
            ("San  Francisco", "SAN FRANCISCO"),
            ("  Phoenix  ", "PHOENIX"),
            ("", ""),
            (None, ""),
            # parens stripped only when trailing; '?' after ')' blocks the
            # paren regex, then the punct regex removes the '?'
            ("Springfield (IL)?", "SPRINGFIELD (IL)"),
            ("São Paulo", "SÃO PAULO"),
            ("   ", ""),
        ],
    )
    def test_cases(self, raw, expected):
        assert normalize_city(raw) == expected

    def test_mid_string_parens_preserved(self):
        assert "SPRINGFIELD" in normalize_city("(North) Springfield")


class TestParseUfosearchCityState:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("Phoenix, AZ", ("PHOENIX", "AZ")),
            ("Phoenix, AZ?", ("PHOENIX", "AZ")),
            ("San Francisco, CA", ("SAN FRANCISCO", "CA")),
            ("Toronto, ON", ("TORONTO", "ON")),
            ("London, XX", (None, None)),
            ("Phoenix AZ", (None, None)),
            ("Phoenix, AZZ", (None, None)),
            ("", (None, None)),
            (None, (None, None)),
            ("phoenix, az", ("PHOENIX", "AZ")),
            ("  Phoenix ,  AZ  ", ("PHOENIX", "AZ")),
            ("St. Louis, MO", ("ST. LOUIS", "MO")),
            (", AZ", (None, None)),
        ],
    )
    def test_cases(self, raw, expected):
        assert parse_ufosearch_city_state(raw) == expected


class TestStripNuforcPrefix:
    def test_with_prefix(self):
        assert (
            strip_nuforc_prefix("NUFORC UFO Sighting 12345 Bright light seen")
            == "Bright light seen"
        )

    def test_no_prefix(self):
        assert strip_nuforc_prefix("Bright light seen") == "Bright light seen"

    def test_prefix_no_number(self):
        original = "NUFORC UFO Sighting description here"
        assert strip_nuforc_prefix(original) == original

    def test_empty(self):
        assert strip_nuforc_prefix("") == ""

    def test_none(self):
        assert strip_nuforc_prefix(None) is None

    def test_prefix_only(self):
        assert strip_nuforc_prefix("NUFORC UFO Sighting 99999") == ""


class TestStripMufonBoilerplate:
    def test_investigator_notes(self):
        text = (
            "Submitted by razor via e-mail foo bar Investigator Notes: "
            "The witness saw a light."
        )
        assert strip_mufon_boilerplate(text) == "The witness saw a light."

    def test_investigators_note(self):
        text = (
            "Submitted by razor via e-mail stuff Investigators Note: "
            "Actual content here."
        )
        assert strip_mufon_boilerplate(text) == "Actual content here."

    def test_no_boilerplate(self):
        assert (
            strip_mufon_boilerplate("Regular MUFON description")
            == "Regular MUFON description"
        )

    def test_marker_without_notes_section(self):
        text = "Submitted by razor via e-mail with nothing useful"
        assert strip_mufon_boilerplate(text) == text

    def test_empty_and_none(self):
        assert strip_mufon_boilerplate("") == ""
        assert strip_mufon_boilerplate(None) is None

    def test_marker_beyond_60_chars(self):
        text = "X" * 61 + "Submitted by razor via e-mail Investigator Notes: Content"
        assert strip_mufon_boilerplate(text) == text

    def test_marker_within_60_chars(self):
        text = "Submitted by razor via e-mail. Investigator Notes: Found this."
        assert strip_mufon_boilerplate(text) == "Found this."


class TestTokenJaccard:
    def test_identical(self):
        assert token_jaccard("bright light in the sky", "bright light in the sky") == 1.0

    def test_no_overlap(self):
        assert token_jaccard("bright light sky", "dark object ground") == 0.0

    def test_partial_overlap(self):
        result = token_jaccard("bright light in the sky", "bright light over the ground")
        assert abs(result - 3.0 / 7.0) < 1e-9

    @pytest.mark.parametrize(
        "a,b",
        [("", "something"), ("something", ""), ("", ""), (None, "text"),
         ("text", None), ("   ", "text")],
    )
    def test_empty_inputs(self, a, b):
        assert token_jaccard(a, b) == 0.0

    def test_case_insensitive(self):
        assert token_jaccard("BRIGHT LIGHT", "bright light") == 1.0

    def test_punctuation_ignored(self):
        assert token_jaccard("bright, light!", "bright light") == 1.0

    def test_numbers_as_tokens(self):
        assert abs(token_jaccard("ufo 123 sighting", "ufo 123 report") - 0.5) < 1e-9


class TestComputeSimilarity:
    def test_null_inputs(self):
        assert compute_similarity(None, "text", SRC_MUFON, SRC_NUFORC) == 0.0
        assert compute_similarity("text", None, SRC_MUFON, SRC_NUFORC) == 0.0
        assert compute_similarity("", "text") == 0.0

    def test_nuforc_prefix_stripped(self):
        assert compute_similarity(DESC_ORB, DESC_ORB_NUFORC, None, SRC_NUFORC) >= 0.9

    def test_mufon_boilerplate_stripped(self):
        assert (
            compute_similarity(DESC_MUFON_BOILERPLATE, DESC_TRIANGLE, SRC_MUFON, None)
            >= 0.9
        )

    def test_starts_with_shortcut(self):
        assert compute_similarity("A" * 50, "A" * 50) == 0.95

    def test_starts_with_too_short(self):
        score = compute_similarity("A" * 19, "A" * 19)
        assert score != 0.95 and score > 0.0

    def test_identical_long(self):
        assert compute_similarity(DESC_ORB, DESC_ORB) == 0.95

    def test_completely_different(self):
        assert compute_similarity(DESC_ORB, DESC_UNRELATED) < 0.3

    def test_moderate(self):
        assert 0.1 < compute_similarity(DESC_MODERATE_A, DESC_MODERATE_B) < 0.8

    def test_preprocessing_makes_empty(self):
        assert (
            compute_similarity("NUFORC UFO Sighting 12345", "Some text", SRC_NUFORC, None)
            == 0.0
        )

    def test_jaccard_gate_returns_jaccard_itself(self):
        # two long texts with exactly one rare shared token -> jaccard < 0.03
        a = " ".join(f"alpha{i}" for i in range(40)) + " shared"
        b = " ".join(f"bravo{i}" for i in range(40)) + " shared"
        expected = token_jaccard(a, b)
        assert expected < kernel.JACCARD_GATE
        assert compute_similarity(a, b) == expected

    def test_seqmatch_truncation_at_1000(self):
        shared = " ".join(f"word{i}" for i in range(150))
        a = shared + " " + " ".join(f"alpha{i}" for i in range(50))
        b = shared + " " + " ".join(f"bravo{i}" for i in range(50))
        score = compute_similarity(a, b)
        assert score > 0.7
        expected = difflib.SequenceMatcher(None, a[:1000], b[:1000]).ratio()
        assert score == expected

    def test_symmetry(self):
        ab = compute_similarity(DESC_MODERATE_A, DESC_MODERATE_B, SRC_MUFON, SRC_NUFORC)
        ba = compute_similarity(DESC_MODERATE_B, DESC_MODERATE_A, SRC_NUFORC, SRC_MUFON)
        # SequenceMatcher is only approximately symmetric
        assert abs(ab - ba) < 0.02
