"""Property-based tests (hypothesis) over the parsing kernels.

The reference ships only example-based tests; these properties pin
the invariants its semantics imply: render->parse round trips,
predicate consistency (parse succeeds => is_*_like true), batch ==
scalar, and solver conservation laws.
"""

from __future__ import annotations

from datetime import date, timedelta
from decimal import Decimal

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from universal_pdf_extractor_spark.kernels.amounts import (
    is_amount_like,
    parse_amount,
    parse_amount_batch,
)
from universal_pdf_extractor_spark.kernels.dates import is_date_like, parse_date
from universal_pdf_extractor_spark.kernels.solver import (
    find_best_tolerance,
    solve_case3_balance_inference,
)

TODAY = date(2026, 1, 1)

amounts = st.decimals(min_value=Decimal("0.01"), max_value=Decimal("9999999.99"),
                      places=2, allow_nan=False, allow_infinity=False)


@given(amounts, st.sampled_from(["plain", "comma", "paren", "dr", "cr",
                                 "lead_minus", "trail_minus", "pound"]))
@settings(max_examples=200, deadline=None)
def test_amount_render_parse_roundtrip(value, style):
    s = f"{value:,.2f}" if style in ("comma", "paren", "dr", "cr") else f"{value:.2f}"
    if style == "paren":
        rendered, expected = f"({s})", -value
    elif style == "dr":
        rendered, expected = f"{s} DR", -value
    elif style == "cr":
        rendered, expected = f"{s} CR", value
    elif style == "lead_minus":
        rendered, expected = f"-{s}", -value
    elif style == "trail_minus":
        rendered, expected = f"{s}-", -value
    elif style == "pound":
        rendered, expected = chr(163) + s, value
    else:
        rendered, expected = s, value
    p = parse_amount(rendered)
    assert p.amount == expected
    assert is_amount_like(rendered)


@given(st.lists(st.text(min_size=0, max_size=24), min_size=0, max_size=40))
@settings(max_examples=60, deadline=None)
def test_amount_batch_equals_scalar_on_arbitrary_text(texts):
    out = parse_amount_batch(pd.Series(texts, dtype=object))
    for i, t in enumerate(texts):
        p = parse_amount(t)
        assert out.iloc[i]["amount"] == p.amount
        assert out.iloc[i]["confidence"] == p.confidence


@given(st.dates(min_value=date(2001, 1, 1), max_value=date(2025, 12, 31)),
       st.sampled_from(["%d/%m/%Y", "%d %b %Y", "%d %B %Y", "%Y-%m-%d",
                        "%d/%m/%y", "%d.%m.%Y", "%d-%m-%Y"]))
@settings(max_examples=200, deadline=None)
def test_date_render_parse_roundtrip(d, fmt):
    rendered = d.strftime(fmt)
    p = parse_date(rendered, today=TODAY)
    assert p.parsed_date == d, (rendered, p)
    assert is_date_like(rendered)


@given(st.dates(min_value=date(2001, 1, 15), max_value=date(2025, 12, 15)))
@settings(max_examples=100, deadline=None)
def test_date_period_disambiguation_inside_period(d):
    start = d.replace(day=1)
    end = start + timedelta(days=27)
    p = parse_date(d.strftime("%d/%m/%Y"), start, end, today=TODAY)
    assert p.parsed_date == d
    assert not p.is_ambiguous  # in-period parses are never left ambiguous


@given(st.decimals(min_value=Decimal("0.01"), max_value=Decimal("99999.99"), places=2),
       st.lists(st.tuples(st.decimals(min_value=Decimal("0.51"),
                                      max_value=Decimal("999.99"), places=2),
                          st.booleans()),
                min_size=1, max_size=12))
@settings(max_examples=100, deadline=None)
def test_balance_chain_consistent_rows_always_confirm(opening, moves):
    """A chain with exactly consistent running balances is always fully
    solved with direction matching the move sign and tolerance 0.

    Amounts must exceed 0.50: when 2*amount fits inside the loosest
    ladder rung (1.00), BOTH hypotheses match and the solver correctly
    refuses to guess (balance_solver.py:215-219 -> UNKNOWN)."""
    rows = []
    bal = opening
    for amount, is_credit in moves:
        bal = bal + amount if is_credit else bal - amount
        rows.append({"amount": amount, "running_balance": bal,
                     "_expected": "CREDIT" if is_credit else "DEBIT"})
    results = solve_case3_balance_inference(rows, opening)
    for row, res in zip(rows, results):
        if row["amount"] == 0:
            continue
        assert res["direction"] == row["_expected"]
        assert res["balance_confirmed"]
        assert res["tolerance_used"] == Decimal("0.00")
        assert res["confidence"] == 0.98


@given(st.decimals(min_value=Decimal("0"), max_value=Decimal("2.00"), places=2))
@settings(max_examples=60, deadline=None)
def test_tolerance_ladder_monotone(diff):
    tol = find_best_tolerance(Decimal("100.00"), Decimal("100.00") + diff)
    if diff > Decimal("1.00"):
        assert tol is None
    else:
        assert tol is not None and tol >= diff


@given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=50))
@settings(max_examples=60, deadline=None)
def test_signed_direction_batch_equals_per_row(texts):
    """signed_direction_batch == the per-row parse_signed_amount ladder
    on arbitrary strings (including garbage and unicode)."""
    from universal_pdf_extractor_spark.kernels.solver import (
        parse_signed_amount,
        signed_direction_batch,
    )

    def per_row(s):
        parsed = parse_signed_amount(s)
        if parsed is None:
            return "UNKNOWN"
        amount, _ = parsed
        return "DEBIT" if amount < 0 else ("CREDIT" if amount > 0 else "UNKNOWN")

    batch = signed_direction_batch(pd.Series(texts))
    for raw, got in zip(texts, batch):
        assert got == per_row(raw), raw


_datish = st.one_of(
    st.dates(min_value=date(1990, 1, 1), max_value=date(2030, 12, 28))
      .map(lambda d: d.strftime("%d/%m/%Y")),
    st.dates(min_value=date(1990, 1, 1), max_value=date(2030, 12, 28))
      .map(lambda d: d.strftime("%d %b %Y")),
    st.dates(min_value=date(1990, 1, 1), max_value=date(2030, 12, 28))
      .map(lambda d: d.strftime("%Y-%m-%d")),
    st.text(min_size=0, max_size=20),  # garbage
)


@given(st.lists(_datish, min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_parse_date_batch_equals_per_row(texts):
    """parse_date_batch (fast path + ladder fallback) == per-row
    parse_date on mixed valid/garbage inputs."""
    from universal_pdf_extractor_spark.kernels.dates import parse_date_batch

    batch = parse_date_batch(pd.Series(texts), today=TODAY)
    for raw, got in zip(texts, batch):
        assert got == parse_date(raw, today=TODAY).parsed_date, raw


@given(st.sampled_from(["NaN", "nan", "Infinity", "-Infinity", "inf",
                        "(NaN)", "NaN DR", "snan", "sNaN"]))
@settings(max_examples=20, deadline=None)
def test_non_finite_spellings_rejected(raw):
    """Decimal's NaN/Infinity spellings must parse as non-amounts, not
    crash downstream magnitude comparisons."""
    p = parse_amount(raw)
    assert p.amount is None
    assert not is_amount_like(raw)
