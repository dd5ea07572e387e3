"""Date-parser kernel tests (mirrors reference
tests/test_pipeline/test_date_parser.py:12-89, plus ladder edges)."""

from datetime import date

import pytest

from universal_pdf_extractor_spark.kernels.dates import (
    is_date_like,
    parse_date,
)

TODAY = date(2026, 1, 1)


def test_reference_pairs(sample_date_strings):
    for raw, expected in sample_date_strings:
        p = parse_date(raw, today=TODAY)
        assert p.parsed_date == date.fromisoformat(expected), raw


def test_dd_mm_yyyy_uk_dayfirst():
    p = parse_date("01/02/2024", today=TODAY)
    assert p.parsed_date == date(2024, 2, 1)
    assert p.confidence >= 0.70


def test_ambiguous_flagged():
    p = parse_date("05/06/2024", today=TODAY)
    assert p.parsed_date == date(2024, 6, 5)
    assert p.is_ambiguous
    assert p.confidence == 0.70


def test_unambiguous_not_flagged():
    p = parse_date("25/06/2024", today=TODAY)
    assert p.parsed_date == date(2024, 6, 25)
    assert not p.is_ambiguous
    assert p.confidence == 0.95


def test_period_disambiguation():
    p = parse_date("05/01/2024", date(2024, 1, 1), date(2024, 1, 31), today=TODAY)
    assert p.parsed_date == date(2024, 1, 5)
    assert not p.is_ambiguous


def test_rbs_ddmonyy():
    p = parse_date("25JUN20", today=TODAY)
    assert p.parsed_date == date(2020, 6, 25)
    assert p.format_detected == "DDMONYY"


def test_rbs_ddmon_no_year_uses_period():
    p = parse_date("25JUN", period_start=date(2023, 6, 1), today=TODAY)
    assert p.parsed_date == date(2023, 6, 25)
    assert p.format_detected == "DDMON"


def test_ddmon_year_wrap():
    p = parse_date("05JAN", period_start=date(2023, 12, 1), today=TODAY)
    assert p.parsed_date == date(2024, 1, 5)


def test_dd_mon_no_year():
    p = parse_date("07 May", period_start=date(2024, 5, 1), today=TODAY)
    assert p.parsed_date == date(2024, 5, 7)
    assert p.format_detected == "DD_MON"


def test_dd_mon_no_year_dec_jan_wrap():
    p = parse_date("03 Jan", period_start=date(2024, 12, 1), today=TODAY)
    assert p.parsed_date == date(2025, 1, 3)


def test_dd_slash_mm_no_year():
    p = parse_date("15/01", period_start=date(2024, 12, 1), today=TODAY)
    assert p.parsed_date == date(2025, 1, 15)


def test_unparseable():
    p = parse_date("not a date", today=TODAY)
    assert p.parsed_date is None
    assert p.confidence == 0.0
    assert p.format_detected == "UNKNOWN"


def test_empty():
    assert parse_date("", today=TODAY).parsed_date is None


def test_old_date_low_confidence():
    p = parse_date("01/02/1999", today=TODAY)
    assert p.parsed_date == date(1999, 2, 1)
    assert p.confidence == 0.5


def test_future_date_suspicious():
    p = parse_date("01/02/2030", today=TODAY)
    assert p.confidence == 0.3


def test_is_date_like():
    assert is_date_like("01/02/2024")
    assert is_date_like("15 Jan 2024")
    assert is_date_like("2024-01-15")
    assert is_date_like("25JUN20")
    assert not is_date_like("hello world")
    assert not is_date_like("")


def test_parse_date_batch_parity():
    import pandas as pd

    from universal_pdf_extractor_spark.kernels.dates import parse_date_batch

    cases = ["01/02/2024", "15 Jan 2024", "2024-01-15", "25JUN20",
             "31/02/2020", "99/99/2020", "12/01/2020", "hello", "",
             None, "1/2/2024", "05.06.2023", "3rd Mar 2021", "07/08/24"]
    batch = parse_date_batch(pd.Series(cases), today=TODAY)
    for raw, got in zip(cases, batch):
        exp = parse_date(raw, today=TODAY).parsed_date if raw is not None else None
        assert got == exp, f"{raw!r}: batch={got} row={exp}"
