"""Amount-parser kernel tests (mirrors reference
tests/test_pipeline/test_amount_parser.py:12-100)."""

from decimal import Decimal

import pandas as pd
import pytest

from universal_pdf_extractor_spark.kernels.amounts import (
    is_amount_like,
    is_amount_like_batch,
    parse_amount,
    parse_amount_batch,
)

POUND = chr(163)


@pytest.mark.parametrize(
    "raw,expected,neg",
    [
        ("1234.56", "1234.56", False),
        ("1,234.56", "1234.56", False),
        (POUND + "500.00", "500.00", False),
        ("(500.00)", "-500.00", True),
        ("100.00 DR", "-100.00", True),
        ("250.00 CR", "250.00", False),
        ("-75.50", "-75.50", True),
        ("75.50-", "-75.50", True),
        ("0.00", "0.00", False),
        ("500", "500", False),
        ("1,234,567.89", "1234567.89", False),
        ("0.01", "0.01", False),
        ("10000", "10000", False),
        ("GBP1,234.56", "1234.56", False),
    ],
)
def test_parse_values(raw, expected, neg):
    p = parse_amount(raw)
    assert p.amount == Decimal(expected)
    assert p.is_negative == neg


@pytest.mark.parametrize("raw", ["", "-", "--", "---", "hello", None])
def test_parse_nulls(raw):
    p = parse_amount(raw)
    assert p.amount is None
    assert p.confidence == 0.0


def test_sign_conventions():
    assert parse_amount("(500.00)").sign_convention == "PARENTHESES"
    assert parse_amount("100.00 DR").sign_convention == "DR_CR"
    assert parse_amount("250.00 CR").sign_convention == "DR_CR"
    assert parse_amount("-75.50").sign_convention == "MINUS"
    assert parse_amount("75.50-").sign_convention == "MINUS"
    assert parse_amount("−" + "75.50").sign_convention == "MINUS"
    assert parse_amount("1.00").sign_convention == "NONE"


def test_confidence_table():
    assert parse_amount("1234.56").confidence == 0.95
    assert parse_amount("(500.00)").confidence == 0.95
    assert parse_amount("100.00 DR").confidence == 0.90
    assert parse_amount("-75.50").confidence == 0.90
    assert parse_amount("99,000,000.00").confidence == 0.5  # > 10M
    assert parse_amount("0.00").confidence == 0.80


def test_is_amount_like():
    assert is_amount_like("1234.56")
    assert is_amount_like(POUND + "500")
    assert is_amount_like("100.00 DR")
    assert is_amount_like("(500.00)")
    assert not is_amount_like("hello world")
    assert not is_amount_like("")


def test_batch_matches_scalar(sample_amounts):
    raws = [r for r, _, _ in sample_amounts] + ["", "junk", "£9.99", "5 CR"]
    s = pd.Series(raws)
    out = parse_amount_batch(s)
    flags = is_amount_like_batch(s)
    for i, raw in enumerate(raws):
        p = parse_amount(raw)
        assert out.loc[i, "amount"] == p.amount
        assert bool(out.loc[i, "is_negative"]) == p.is_negative
        assert out.loc[i, "confidence"] == p.confidence
        assert bool(flags.loc[i]) == is_amount_like(raw)
