"""Per-segment record extraction: the full analysis chain.

Mirrors the reference orchestrator's segment analysis
(app/pipeline/orchestrator.py:516-690): collect the segment's lines,
detect columns, find + strip the header line, preliminary row pass,
role assignment, final row pass, per-row field projection, opening /
closing balance from marker rows, direction solving, merge, and the
no-amount/blank-description quality gate
(app/pipeline/orchestrator.py:367-385).

DOCUMENTED DIVERGENCE from the reference orchestrator: the reference
passes its field dicts straight into ``solve_directions`` although the
solver contract reads different keys (``amount``, ``running_balance``,
``debit_amount``, ``credit_amount``, ``amount_raw``,
``description_raw`` — app/pipeline/balance_solver.py:82-280 — while
``_extract_fields_from_row`` emits ``parsed_amount``,
``parsed_balance``, ``raw_debit``, ... — orchestrator.py:699-789).
The key mismatch makes every solver path return UNKNOWN/unconfirmed
in the integrated reference pipeline; its own unit tests
(tests/test_pipeline/test_balance_solver.py) call the solver with the
documented keys.  This engine feeds the solver the documented
contract via an explicit adapter, so balance-chain inference actually
runs; the solver kernel itself is parity-exact.
"""

from __future__ import annotations

from datetime import date
from decimal import Decimal
from typing import Optional

from .amounts import parse_amount
from .columns import detect_columns
from .dates import DEFAULT_TODAY
from .rows import (
    detect_header_line,
    extract_fields_from_row,
    extract_header_texts,
    precompute_cells,
    reconstruct_rows,
)
from .semantic import AMOUNT_ROLES, ROLE_BALANCE, ROLE_DATE, assign_column_roles
from .solver import solve_directions


def _solver_view(fields: dict) -> dict:
    """Adapter: field projection -> the solver's documented row keys."""
    debit_amount = None
    if fields["raw_debit"]:
        p = parse_amount(fields["raw_debit"])
        debit_amount = p.amount
    credit_amount = None
    if fields["raw_credit"]:
        p = parse_amount(fields["raw_credit"])
        credit_amount = p.amount
    return {
        "amount": fields["parsed_amount"],
        "running_balance": fields["parsed_balance"],
        "amount_raw": fields["raw_amount"],
        "debit_amount": debit_amount,
        "credit_amount": credit_amount,
        "description_raw": fields["description"],
    }


def analyse_segment(lines: list[dict], today: date = DEFAULT_TODAY) -> dict:
    """Segment lines -> {records, opening_balance, closing_balance}.

    Each record carries the output-fields of the reference
    ``transactions`` row (tables.py:298-382) minus identifiers, which
    the caller attaches: row_index, turn_idx (of the row's first
    line), posted_date, description, amount, direction,
    direction_source, running_balance, balance_confirmed,
    tolerance_used, confidence_{amount,date,direction}.
    """
    empty = {"records": [], "opening_balance": None, "closing_balance": None,
             "closing_balance_distinct": False}
    if not lines:
        return empty

    columns = detect_columns(lines)
    if not columns:
        return empty

    header_idx = detect_header_line(lines)
    header_texts = None
    if header_idx is not None:
        header_texts = extract_header_texts(lines[header_idx], columns)
        lines = lines[header_idx + 1:]

    cells_per_line = precompute_cells(lines, columns)
    preliminary_rows = reconstruct_rows(
        lines, columns,
        date_column_index=0,
        amount_column_indices=[c["column_index"] for c in columns if c["column_index"] > 0],
        cells_per_line=cells_per_line,
    )
    roles = assign_column_roles(columns, header_texts, preliminary_rows)

    date_col = next((i for i, r in roles.items() if r == ROLE_DATE), 0)
    amount_cols = [i for i, r in roles.items() if r in AMOUNT_ROLES]
    if not amount_cols:
        # reference falls back to pdfplumber/tabula/camelot native table
        # engines here (orchestrator.py:569-578); no raster/PDF path
        # exists for transcript turns, so the segment yields nothing.
        return empty

    rows = reconstruct_rows(lines, columns, date_col, amount_cols,
                            cells_per_line=cells_per_line)
    transaction_rows = [r for r in rows if not r["is_balance_marker"]]
    if not transaction_rows:
        return empty

    raw_transactions = []
    for row_idx, row in enumerate(transaction_rows):
        fields = extract_fields_from_row(row, roles, today=today)
        fields["row_index"] = row_idx
        fields["_row"] = row
        raw_transactions.append(fields)

    # opening/closing balance from marker rows (first/last BALANCE cell,
    # orchestrator.py:599-612).  n_marker_cells distinguishes a real
    # closing marker from the first==last single-marker case: the
    # conversation-level scorer only trusts closing_balance for its
    # balance-mismatch gate when it came from a distinct later marker.
    opening_balance = None
    closing_balance = None
    n_marker_cells = 0
    for marker in (r for r in rows if r["is_balance_marker"]):
        for cell in marker["cells"]:
            if roles.get(cell["column_index"]) == ROLE_BALANCE and cell["text"].strip():
                parsed = parse_amount(cell["text"].strip())
                if parsed.amount is not None:
                    if opening_balance is None:
                        opening_balance = parsed.amount
                    closing_balance = parsed.amount
                    n_marker_cells += 1

    role_map = {i: r for i, r in roles.items()}
    solver_rows = [_solver_view(tx) for tx in raw_transactions]
    solver_results = solve_directions(solver_rows, opening_balance,
                                      closing_balance, role_map)

    for tx, sr in zip(raw_transactions, solver_results):
        if tx["direction"] == "UNKNOWN" and sr["direction"] != "UNKNOWN":
            tx["direction"] = sr["direction"]
            tx["direction_source"] = sr["direction_source"]
            tx["direction_confidence"] = sr["confidence"]
        tx["balance_confirmed"] = sr["balance_confirmed"]
        tx["tolerance_used"] = sr["tolerance_used"]

    records = []
    for tx in raw_transactions:
        amount = tx["parsed_amount"]
        if amount is not None:
            amount = Decimal(amount).quantize(Decimal("0.01"))
        balance = tx["parsed_balance"]
        if balance is not None:
            balance = Decimal(balance).quantize(Decimal("0.01"))

        description = tx["description"]
        # quality gate (orchestrator.py:367-385): no amount AND blank
        # description -> drop
        if amount is None and not description.strip():
            continue

        row = tx.pop("_row")
        first_line = lines[row["line_indices"][0]] if row["line_indices"] else {}
        records.append({
            "row_index": tx["row_index"],
            "turn_idx": int(first_line.get("turn_idx", 0)),
            "line_indices": row["line_indices"],
            "posted_date": tx["parsed_date"],
            "description_raw": description,
            "description_clean": description.strip(),
            "amount": amount,
            "direction": tx["direction"],
            "direction_source": tx["direction_source"],
            "running_balance": balance,
            "balance_confirmed": bool(tx.get("balance_confirmed", False)),
            "balance_tolerance_used": Decimal(tx.get("tolerance_used") or 0).quantize(Decimal("0.0001")),
            "confidence_amount": round(float(tx["amount_confidence"]), 4),
            "confidence_date": round(float(tx["date_confidence"]), 4),
            "confidence_direction": round(float(tx["direction_confidence"]), 4),
        })

    return {"records": records,
            "opening_balance": opening_balance,
            "closing_balance": closing_balance,
            "closing_balance_distinct": n_marker_cells >= 2}
