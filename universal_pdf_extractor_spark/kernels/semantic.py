"""Semantic column-role assignment (header-first, statistics-second).

Parity with the reference semantic mapper
(app/pipeline/semantic_mapper.py:50-281): per-column value stats
(date rate, amount rate, empty rate, text rate, mean length, unique
ratio, sign-change "monotonic" score), four assignment passes —
header keyword map with specificity overrides and duplicate-DATE ->
VALUE_DATE, statistical thresholds, leftmost/widest-UNKNOWN
fallbacks, and UNKNOWN-between-DATE-and-amounts -> DESCRIPTION.

Roles are plain strings from the reference ColumnRole enum.
"""

from __future__ import annotations

import re
from typing import Optional

from .amounts import is_amount_like
from .dates import is_date_like

ROLE_DATE = "DATE"
ROLE_VALUE_DATE = "VALUE_DATE"
ROLE_DESCRIPTION = "DESCRIPTION"
ROLE_DEBIT = "DEBIT"
ROLE_CREDIT = "CREDIT"
ROLE_SINGLE_AMOUNT = "SINGLE_AMOUNT"
ROLE_BALANCE = "BALANCE"
ROLE_REFERENCE = "REFERENCE"
ROLE_TYPE = "TYPE"
ROLE_UNKNOWN = "UNKNOWN"

AMOUNT_ROLES = {ROLE_DEBIT, ROLE_CREDIT, ROLE_SINGLE_AMOUNT, ROLE_BALANCE}

HEADER_MAP: list[tuple[str, list[str]]] = [
    (ROLE_DATE, ["date", "when", "posted"]),
    (ROLE_VALUE_DATE, ["value date", "value"]),
    (ROLE_DESCRIPTION, ["description", "details", "particulars", "narrative", "transaction"]),
    (ROLE_DEBIT, ["debit", "paid out", "money out", "withdrawal", "payments", "dr"]),
    (ROLE_CREDIT, ["credit", "paid in", "money in", "deposit", "receipts", "cr"]),
    (ROLE_SINGLE_AMOUNT, ["amount"]),
    (ROLE_BALANCE, ["balance", "running", "closing"]),
    (ROLE_REFERENCE, ["ref", "reference", "cheque"]),
    (ROLE_TYPE, ["type", "code"]),
]

_TEXTY_RE = re.compile(r"^[a-zA-Z\s\-\.]+$")
_CURRENCY_STRIP_RE = re.compile(r"[£$€,\s]")


def column_values(rows: list[dict], col_idx: int) -> list[str]:
    """Cell text per row for one column ('' when absent); skips markers."""
    values = []
    for row in rows:
        if row["is_balance_marker"]:
            continue
        found = ""
        for cell in row["cells"]:
            if cell["column_index"] == col_idx:
                found = cell["text"].strip()
                break
        values.append(found)
    return values


def compute_stats(values: list[str], col: dict) -> dict:
    """Statistical fingerprint of one column's values."""
    position = (col["x_start"] + col["x_end"]) / 2.0
    if not values:
        return {"date_rate": 0.0, "amount_rate": 0.0, "empty_rate": 0.0,
                "text_rate": 0.0, "mean_length": 0.0, "unique_ratio": 0.0,
                "monotonic_score": 0.0, "position": position}

    total = len(values)
    non_empty = [v for v in values if v]
    empty_count = total - len(non_empty)

    date_count = sum(1 for v in non_empty if is_date_like(v))
    amount_count = sum(1 for v in non_empty if is_amount_like(v))
    text_count = sum(1 for v in non_empty if _TEXTY_RE.match(v) and len(v) > 3)

    lengths = [len(v) for v in non_empty]
    mean_len = sum(lengths) / len(lengths) if lengths else 0.0
    unique_ratio = len(set(non_empty)) / len(non_empty) if non_empty else 0.0

    # sign-change score: a true balance column alternates direction,
    # so after inversion a high score marks balance candidates
    monotonic_score = 0.0
    numeric_values = []
    for v in non_empty:
        cleaned = _CURRENCY_STRIP_RE.sub("", v)
        try:
            numeric_values.append(float(cleaned))
        except ValueError:
            pass
    if len(numeric_values) >= 3:
        diffs = [numeric_values[i + 1] - numeric_values[i] for i in range(len(numeric_values) - 1)]
        if diffs:
            sign_changes = sum(1 for i in range(len(diffs) - 1) if diffs[i] * diffs[i + 1] < 0)
            monotonic_score = sign_changes / len(diffs)
            monotonic_score = 1.0 - monotonic_score if len(diffs) > 2 else 0.0

    n = len(non_empty) if non_empty else 1
    return {
        "date_rate": date_count / n,
        "amount_rate": amount_count / n,
        "empty_rate": empty_count / total,
        "text_rate": text_count / n,
        "mean_length": mean_len,
        "unique_ratio": unique_ratio,
        "monotonic_score": monotonic_score,
        "position": position,
    }


def match_header(header_text: str) -> Optional[str]:
    """Single header cell -> role, with specificity overrides."""
    h = header_text.lower().strip()
    if not h:
        return None
    h = re.sub(r"\([a-z]{3}\)\s*", "", h).strip()
    h = re.sub(r"[£$€]\s*", "", h).strip()
    if not h:
        return None
    if "value" in h and "date" in h:
        return ROLE_VALUE_DATE
    if "paid out" in h or "money out" in h:
        return ROLE_DEBIT
    if "paid in" in h or "money in" in h:
        return ROLE_CREDIT
    for role, keywords in HEADER_MAP:
        if any(kw in h for kw in keywords):
            return role
    return None


def assign_column_roles(columns: list[dict],
                        header_texts: Optional[list[str]],
                        sample_rows: list[dict]) -> dict[int, str]:
    """Four-pass role assignment; mutates columns[i]['role'] too."""
    roles: dict[int, str] = {}

    # pass 1: header keywords
    if header_texts:
        for i, header in enumerate(header_texts):
            if i >= len(columns):
                break
            role = match_header(header)
            if role:
                if role == ROLE_DATE and ROLE_DATE in roles.values():
                    role = ROLE_VALUE_DATE
                roles[i] = role

    # pass 2: statistics for unassigned columns
    for i, col in enumerate(columns):
        if i in roles:
            continue
        stats = compute_stats(column_values(sample_rows, i), col)

        if stats["date_rate"] > 0.5 and ROLE_DATE not in roles.values():
            roles[i] = ROLE_DATE
        elif stats["date_rate"] > 0.3:
            roles[i] = ROLE_VALUE_DATE
        elif stats["amount_rate"] > 0.3:
            if stats["empty_rate"] > 0.3:
                if ROLE_DEBIT not in roles.values():
                    roles[i] = ROLE_DEBIT
                elif ROLE_CREDIT not in roles.values():
                    roles[i] = ROLE_CREDIT
                else:
                    roles[i] = ROLE_SINGLE_AMOUNT
            elif stats["monotonic_score"] > 0.6:
                roles[i] = ROLE_BALANCE
            else:
                roles[i] = ROLE_SINGLE_AMOUNT
        elif stats["text_rate"] > 0.4 and stats["mean_length"] > 8:
            roles[i] = ROLE_DESCRIPTION
        elif stats["unique_ratio"] > 0.7 and stats["mean_length"] < 12:
            roles[i] = ROLE_REFERENCE
        else:
            roles[i] = ROLE_UNKNOWN

    # pass 3: fallbacks
    if ROLE_DATE not in set(roles.values()):
        for i in sorted(roles):
            if roles[i] == ROLE_UNKNOWN:
                roles[i] = ROLE_DATE
                break

    if ROLE_DESCRIPTION not in set(roles.values()):
        unknown_cols = [(i, columns[i]) for i in roles
                        if roles[i] == ROLE_UNKNOWN and i < len(columns)]
        if unknown_cols:
            widest = max(unknown_cols, key=lambda x: x[1]["x_end"] - x[1]["x_start"])
            roles[widest[0]] = ROLE_DESCRIPTION

    # pass 4: UNKNOWN between DATE and amount columns -> DESCRIPTION
    date_cols = [i for i, r in roles.items() if r == ROLE_DATE]
    amount_cols = [i for i, r in roles.items() if r in AMOUNT_ROLES]
    if date_cols and amount_cols:
        date_max_pos = max(columns[i]["x_end"] for i in date_cols if i < len(columns))
        amount_min_pos = min(columns[i]["x_start"] for i in amount_cols if i < len(columns))
        for i in sorted(roles):
            if roles[i] == ROLE_UNKNOWN and i < len(columns):
                col_mid = (columns[i]["x_start"] + columns[i]["x_end"]) / 2
                if date_max_pos <= col_mid <= amount_min_pos:
                    roles[i] = ROLE_DESCRIPTION

    for i, role in roles.items():
        if i < len(columns):
            columns[i]["role"] = role
    return roles
