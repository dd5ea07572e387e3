"""Direction inference and balance-chain reconciliation.

Parity with the reference balance solver
(app/pipeline/balance_solver.py:33-430).  Never guesses a direction:
UNKNOWN when uncertain.  Four routed strategies:

  case 1  separate debit/credit columns -> direction by population
  case 2  single signed amount (>=30% of rows show a sign convention)
  case 3  single amount + balance column -> sequential chain fitting
          through the tolerance ladder [0.00, 0.01, 0.02, 0.05, 1.00],
          with OCR digit-substitution rescue at +/-0.01
  case 4  single amount only -> description DR/CR keyword hints

followed by a chain-validation pass that upgrades confidence via the
tolerance->confidence map {0: .98, .01: .95, .02: .90, .05: .80,
1.00: .60} and sets balance_confirmed.  Both sequential walks carry
`current <- reported (else expected)` state, which is why the solver
runs inside a per-segment grouped UDF rather than a window function.
"""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation
from typing import Optional

DIRECTION_SOURCE_BALANCE = "BALANCE_SOLVER"
DIRECTION_SOURCE_COLUMN = "COLUMN"
DIRECTION_SOURCE_SIGN = "SIGN"
DIRECTION_SOURCE_HEADER = "HEADER"
DIRECTION_SOURCE_UNKNOWN = "UNKNOWN"

TOLERANCES = [Decimal("0.00"), Decimal("0.01"), Decimal("0.02"),
              Decimal("0.05"), Decimal("1.00")]

_TOLERANCE_CONFIDENCE = {
    Decimal("0.00"): 0.98,
    Decimal("0.01"): 0.95,
    Decimal("0.02"): 0.90,
    Decimal("0.05"): 0.80,
    Decimal("1.00"): 0.60,
}

_SIGN_CONVENTION_RE = re.compile(r"[\(\)]|DR|CR|\-$|^\-", re.IGNORECASE)

_OCR_SUBSTITUTIONS = {
    "0": ["O", "o", "Q"],
    "1": ["l", "I", "7"],
    "5": ["S", "s"],
    "8": ["B", "3"],
    "6": ["G", "b"],
    "9": ["g", "q"],
}


def _result(direction="UNKNOWN", source=DIRECTION_SOURCE_UNKNOWN,
            confidence=0.0, balance_confirmed=False,
            tolerance=Decimal("0.00"), correction=None) -> dict:
    return {
        "direction": direction,
        "direction_source": source,
        "confidence": confidence,
        "balance_confirmed": balance_confirmed,
        "tolerance_used": tolerance,
        "correction_applied": correction,
    }


def find_best_tolerance(computed: Decimal, reported: Decimal) -> Optional[Decimal]:
    diff = abs(computed - reported)
    for tolerance in TOLERANCES:
        if diff <= tolerance:
            return tolerance
    return None


def tolerance_to_confidence(tolerance: Decimal) -> float:
    return _TOLERANCE_CONFIDENCE.get(tolerance, 0.50)


def parse_signed_amount(raw: str) -> Optional[tuple[Decimal, str]]:
    """Sign-convention parse used by case 2."""
    s = raw.strip().replace(chr(163), "").replace(",", "").replace(" ", "")
    m = re.match(r"^\((\d+\.?\d*)\)$", s)
    if m:
        return (-Decimal(m.group(1)), "PARENTHESES")
    m = re.match(r"^(\d+\.?\d*)\s*(DR|CR)$", s, re.IGNORECASE)
    if m:
        val = Decimal(m.group(1))
        return (-val, "DR_CR") if m.group(2).upper() == "DR" else (val, "DR_CR")
    m = re.match(r"^(\d+\.?\d*)\-$", s)
    if m:
        return (-Decimal(m.group(1)), "TRAILING_MINUS")
    m = re.match(r"^[\-−](\d+\.?\d*)$", s)
    if m:
        return (-Decimal(m.group(1)), "LEADING_MINUS")
    m = re.match(r"^(\d+\.?\d*)$", s)
    if m:
        return (Decimal(m.group(1)), "UNSIGNED")
    return None


def signed_direction_batch(values) -> "pd.Series":  # noqa: F821
    """Vectorized case-2 direction inference over a string Series.

    Same ladder and precedence as :func:`parse_signed_amount` (which
    mirrors app/pipeline/balance_solver.py's sign-convention parse),
    but evaluated with pandas regex extracts instead of per-row Python:
    parentheses -> DR/CR suffix -> trailing minus -> leading minus ->
    unsigned.  Returns 'DEBIT' / 'CREDIT' / 'UNKNOWN'.
    """
    import numpy as np
    import pandas as pd

    s = (values.fillna("").str.strip()
         .str.replace(chr(163), "", regex=False)
         .str.replace(",", "", regex=False)
         .str.replace(" ", "", regex=False))

    out = pd.Series("UNKNOWN", index=values.index, dtype=object)
    undecided = pd.Series(True, index=values.index)

    # (pattern, numeric-group, sign) — sign -1 debit, +1 credit,
    # 0 means "sign of the magnitude decides nothing" (unsigned=credit
    # unless zero).  DR/CR needs a per-match sign so handle separately.
    def _take(mask: pd.Series, nums: pd.Series, neg: pd.Series):
        nz = pd.to_numeric(nums, errors="coerce") != 0
        out.loc[mask & nz & neg] = "DEBIT"
        out.loc[mask & nz & ~neg] = "CREDIT"
        # zero amounts stay UNKNOWN (parse yields amount == 0)
        undecided.loc[mask] = False

    m = s.str.extract(r"^\((\d+\.?\d*)\)$")[0]
    hit = undecided & m.notna()
    if hit.any():
        _take(hit, m, pd.Series(True, index=values.index))

    drcr = s.str.extract(re.compile(r"^(\d+\.?\d*)(DR|CR)$", re.IGNORECASE))
    hit = undecided & drcr[0].notna()
    if hit.any():
        _take(hit, drcr[0], drcr[1].str.upper() == "DR")

    m = s.str.extract(r"^(\d+\.?\d*)\-$")[0]
    hit = undecided & m.notna()
    if hit.any():
        _take(hit, m, pd.Series(True, index=values.index))

    m = s.str.extract(r"^[\-−](\d+\.?\d*)$")[0]
    hit = undecided & m.notna()
    if hit.any():
        _take(hit, m, pd.Series(True, index=values.index))

    m = s.str.extract(r"^(\d+\.?\d*)$")[0]
    hit = undecided & m.notna()
    if hit.any():
        _take(hit, m, pd.Series(False, index=values.index))

    return out


def rows_have_sign_convention(rows: list[dict]) -> bool:
    sign_count = sum(1 for row in rows
                     if _SIGN_CONVENTION_RE.search(row.get("amount_raw", "")))
    return sign_count > len(rows) * 0.3


def solve_case1_separate_columns(rows: list[dict]) -> list[dict]:
    results = []
    for row in rows:
        debit_val = row.get("debit_amount")
        credit_val = row.get("credit_amount")
        if debit_val is not None and credit_val is not None:
            results.append(_result("UNKNOWN", DIRECTION_SOURCE_COLUMN, 0.3,
                                   correction="BOTH_COLUMNS_POPULATED"))
        elif debit_val is not None:
            results.append(_result("DEBIT", DIRECTION_SOURCE_COLUMN, 0.90))
        elif credit_val is not None:
            results.append(_result("CREDIT", DIRECTION_SOURCE_COLUMN, 0.90))
        else:
            results.append(_result("UNKNOWN", DIRECTION_SOURCE_COLUMN, 0.2,
                                   correction="NO_AMOUNT_IN_EITHER_COLUMN"))
    return results


def solve_case2_signed_amounts(rows: list[dict]) -> list[dict]:
    results = []
    for row in rows:
        parsed = parse_signed_amount(row.get("amount_raw", ""))
        if parsed is None:
            results.append(_result("UNKNOWN", DIRECTION_SOURCE_SIGN, 0.0))
            continue
        amount_value, sign_source = parsed
        if amount_value < 0:
            direction = "DEBIT"
        elif amount_value > 0:
            direction = "CREDIT"
        else:
            direction = "UNKNOWN"
        conf = 0.85 if sign_source in ("PARENTHESES", "DR_CR") else 0.75
        results.append(_result(direction, DIRECTION_SOURCE_SIGN, conf))
    return results


def attempt_balance_correction(prev_balance: Decimal, amount: Decimal,
                               reported_balance: Decimal) -> tuple:
    """OCR digit-substitution rescue when neither hypothesis fits."""
    reported_str = str(reported_balance)
    for i, char in enumerate(reported_str):
        for digit, subs in _OCR_SUBSTITUTIONS.items():
            if char in subs:
                corrected_str = reported_str[:i] + digit + reported_str[i + 1:]
                try:
                    corrected = Decimal(corrected_str)
                except (InvalidOperation, ValueError):
                    continue
                if abs((prev_balance - amount) - corrected) <= Decimal("0.01"):
                    return ("DEBIT", Decimal("0.01"), 0.70)
                if abs((prev_balance + amount) - corrected) <= Decimal("0.01"):
                    return ("CREDIT", Decimal("0.01"), 0.70)
    return ("UNKNOWN", None, 0.0)


def solve_case3_balance_inference(rows: list[dict],
                                  opening_balance: Optional[Decimal]) -> list[dict]:
    results = []
    current_balance = opening_balance
    for row in rows:
        amount = row.get("amount")
        reported_balance = row.get("running_balance")

        if amount is None or current_balance is None:
            results.append(_result("UNKNOWN", DIRECTION_SOURCE_UNKNOWN, 0.0))
            if reported_balance is not None:
                current_balance = reported_balance
            continue

        hypothesis_debit = current_balance - amount
        hypothesis_credit = current_balance + amount

        if reported_balance is not None:
            debit_match = find_best_tolerance(hypothesis_debit, reported_balance)
            credit_match = find_best_tolerance(hypothesis_credit, reported_balance)

            if debit_match is not None and credit_match is None:
                direction, tolerance = "DEBIT", debit_match
                confidence = tolerance_to_confidence(tolerance)
            elif credit_match is not None and debit_match is None:
                direction, tolerance = "CREDIT", credit_match
                confidence = tolerance_to_confidence(tolerance)
            elif debit_match is not None and credit_match is not None:
                direction, tolerance, confidence = "UNKNOWN", min(debit_match, credit_match), 0.3
            else:
                direction, tolerance, confidence = attempt_balance_correction(
                    current_balance, amount, reported_balance)

            results.append(_result(direction, DIRECTION_SOURCE_BALANCE, confidence,
                                   balance_confirmed=(direction != "UNKNOWN"),
                                   tolerance=tolerance or Decimal("0.00")))
            current_balance = reported_balance
        else:
            results.append(_result("UNKNOWN", DIRECTION_SOURCE_BALANCE, 0.2))
    return results


def solve_case4_no_balance(rows: list[dict], column_roles: dict) -> list[dict]:
    results = []
    for row in rows:
        desc = row.get("description_raw", "").upper()
        if " DR" in desc or "DEBIT" in desc:
            results.append(_result("DEBIT", DIRECTION_SOURCE_HEADER, 0.6))
        elif " CR" in desc or "CREDIT" in desc:
            results.append(_result("CREDIT", DIRECTION_SOURCE_HEADER, 0.6))
        else:
            results.append(_result("UNKNOWN", DIRECTION_SOURCE_UNKNOWN, 0.0))
    return results


def validate_with_balance_chain(rows: list[dict], results: list[dict],
                                opening_balance: Decimal) -> list[dict]:
    """Second sequential walk: confirm/upgrade via the chain."""
    current = opening_balance
    for row, result in zip(rows, results):
        amount = row.get("amount")
        reported_balance = row.get("running_balance")

        if amount is None or result["direction"] == "UNKNOWN":
            if reported_balance is not None:
                current = reported_balance
            continue

        if result["direction"] == "DEBIT":
            expected = current - amount
        elif result["direction"] == "CREDIT":
            expected = current + amount
        else:
            if reported_balance is not None:
                current = reported_balance
            continue

        if reported_balance is not None:
            tolerance = find_best_tolerance(expected, reported_balance)
            if tolerance is not None:
                result["balance_confirmed"] = True
                result["tolerance_used"] = tolerance
                result["confidence"] = max(result["confidence"],
                                           tolerance_to_confidence(tolerance))
            current = reported_balance
        else:
            current = expected
    return results


def solve_directions(rows: list[dict],
                     opening_balance: Optional[Decimal],
                     closing_balance: Optional[Decimal],
                     column_roles: dict) -> list[dict]:
    """Route to a strategy, then chain-validate when a balance exists."""
    role_values = list(column_roles.values())
    has_separate_columns = "DEBIT" in role_values and "CREDIT" in role_values
    has_single_amount = "SINGLE_AMOUNT" in role_values
    has_balance = "BALANCE" in role_values

    if has_separate_columns:
        results = solve_case1_separate_columns(rows)
    elif has_single_amount and rows_have_sign_convention(rows):
        results = solve_case2_signed_amounts(rows)
    elif has_single_amount and has_balance:
        results = solve_case3_balance_inference(rows, opening_balance)
    elif has_single_amount:
        results = solve_case4_no_balance(rows, column_roles)
    else:
        results = [_result() for _ in rows]

    if has_balance and opening_balance is not None:
        results = validate_with_balance_chain(rows, results, opening_balance)
    return results
