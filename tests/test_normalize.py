"""T5 normalization parity corpus (FIXTURES.md F4;
reference algorithm at src/DatabaseAgentMysql.php:327-344)."""

from google_sheets_etl_spark.operators.normalize import (
    normalize_column_name,
    normalized_column_names,
)


def test_basic_lower_trim():
    assert normalized_column_names(["  Amount Due  "]) == ["amount due"]


def test_transliterate_unicode():
    assert normalize_column_name("Café É") == "cafe e"


def test_leading_digit_gets_underscore():
    assert normalized_column_names(["2024 budget"]) == ["_2024 budget"]


def test_strip_punctuation():
    assert normalized_column_names(["a!@#b"]) == ["ab"]


def test_empty_becomes_underscore_not_col_n():
    # PHP order of operations: '' → prefix '_' → fallback check sees a
    # non-empty '_' → kept. Only a SECOND empty collides into col_N.
    assert normalized_column_names(["", ""]) == ["_", "col_2"]


def test_duplicates_fall_back_to_col_n():
    assert normalized_column_names(["name", "Name", "name"]) == [
        "name", "col_2", "col_3"]


def test_reserved_col_pattern_renamed():
    # a literal "col_7" in position 0 becomes col_1 (index+1)
    assert normalized_column_names(["col_7"]) == ["col_1"]


def test_col_pattern_not_matching_survives():
    assert normalized_column_names(["col_7x", "col_"]) == ["col_7x", "col_"]


def test_whitespace_only_and_symbols():
    assert normalized_column_names(["  !!  "]) == ["_"]


def test_mixed_real_world_header():
    raw = ["Date", "Amount ($)", "Café", "2 Fast", "Date"]
    assert normalized_column_names(raw) == [
        "date", "amount", "cafe", "_2 fast", "col_5"]
