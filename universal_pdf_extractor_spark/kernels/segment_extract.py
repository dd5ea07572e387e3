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
from .dates import DEFAULT_TODAY, parse_date
from .patterns import is_summary_row
from .rows import (
    detect_header_line,
    extract_fields_from_row,
    extract_header_texts,
    precompute_cells,
    reconstruct_rows,
)
from .semantic import AMOUNT_ROLES, ROLE_BALANCE, ROLE_DATE, assign_column_roles
from .solver import solve_directions

# ── text-grid fallback (the transcripts analogue of the reference's
# pdfplumber native-table fallback, orchestrator.py:793-930) ─────────
#
# Keyword sets verbatim from the reference header mapper
# (orchestrator.py:1336-1377 `_map_table_columns`).
_FB_DATE_KW = ["date", "posted dte"]
_FB_DESC_KW = ["description", "details", "particulars", "narrative", "transaction"]
_FB_PAID_IN_KW = ["paid in", "credit", "money in", "deposit", "receipts"]
_FB_WITHDRAWN_KW = ["withdrawn", "debit", "money out", "paid out", "withdrawal", "payments"]
_FB_BALANCE_KW = ["balance"]
_FB_AMOUNT_KW = ["amount"]

import re as _re

_FB_CCY_PREFIX_RE = _re.compile(r"\([a-z]{3}\)\s*")
_FB_CCY_SYMBOL_RE = _re.compile("[" + chr(163) + chr(36) + chr(8364) + r"]\s*")


def _grid_cells(line: dict) -> list[dict]:
    """Split a tokenized line into cells on >=2-char gaps.

    Token ``start``/``end`` are char offsets into the original turn
    text, so a gap of >= 2 between consecutive tokens is exactly a
    multi-space run in the source — the character-grid analogue of
    pdfplumber's text-strategy vertical splits (snap/join tolerance,
    orchestrator.py:820-827).
    """
    cells: list[dict] = []
    cur: list[dict] = []
    prev_end = None
    for t in line["tokens"]:
        if prev_end is not None and t["start"] - prev_end >= 2:
            cells.append(cur)
            cur = []
        cur.append(t)
        prev_end = t["end"]
    if cur:
        cells.append(cur)
    return [
        {
            "text": " ".join(t["text"] for t in c),
            "x_mid": (c[0]["x0"] + c[-1]["x1"]) / 2.0,
            "start": c[0].get("start"),
            "end": c[-1].get("end"),
        }
        for c in cells
    ]


def _map_grid_columns(header_cells: list[dict]) -> dict:
    """Header cells -> column roles (orchestrator.py:1336-1377)."""
    result = {"date_col": None, "desc_col": None, "amount_cols": []}
    for i, cell in enumerate(header_cells):
        h = cell["text"].lower().strip()
        if not h:
            continue
        h = _FB_CCY_PREFIX_RE.sub("", h).strip()
        h = _FB_CCY_SYMBOL_RE.sub("", h).strip()
        if not h:
            continue
        if any(kw in h for kw in _FB_DATE_KW) and result["date_col"] is None:
            result["date_col"] = i
        elif any(kw in h for kw in _FB_DESC_KW) and result["desc_col"] is None:
            result["desc_col"] = i
        elif any(kw in h for kw in _FB_PAID_IN_KW):
            result["amount_cols"].append({"index": i, "role": "paid_in"})
        elif any(kw in h for kw in _FB_WITHDRAWN_KW):
            result["amount_cols"].append({"index": i, "role": "withdrawn"})
        elif any(kw in h for kw in _FB_BALANCE_KW):
            result["amount_cols"].append({"index": i, "role": "balance"})
        elif any(kw in h for kw in _FB_AMOUNT_KW):
            result["amount_cols"].append({"index": i, "role": "amount"})
    return result


def _grid_col_map_valid(col_map: dict) -> bool:
    """Reference acceptance rule (orchestrator.py:845-850): date column
    plus at least one non-balance amount column."""
    return bool(
        col_map.get("amount_cols")
        and col_map.get("date_col") is not None
        and any(ac["role"] != "balance" for ac in col_map["amount_cols"])
    )


def _assign_cells(header_cells: list[dict], row_cells: list[dict]) -> list[str]:
    """Assignment of data cells to header columns.

    pdfplumber hands the reference pre-aligned table columns; the text
    grid has to re-align ragged rows itself.  When a row has exactly
    one cell per header the mapping is positional (robust to rows
    whose x-geometry is distorted by long gap runs); otherwise each
    cell lands on the header column with the closest x-midpoint,
    collisions concatenating left to right.
    """
    if len(row_cells) == len(header_cells):
        return [dict(c) for c in row_cells]
    out = [None] * len(header_cells)
    for cell in row_cells:
        j = min(range(len(header_cells)),
                key=lambda i: abs(header_cells[i]["x_mid"] - cell["x_mid"]))
        if out[j] is None:
            out[j] = dict(cell)
        else:
            out[j]["text"] += " " + cell["text"]
            out[j]["end"] = cell.get("end", out[j]["end"])
    return [c if c is not None else {"text": "", "start": None, "end": None}
            for c in out]


def _fallback_grid_records(lines: list[dict], today: date) -> list[dict]:
    """Delimiter/multi-space grid parse when column detection fails.

    Mirrors the reference pdfplumber fallback row loop
    (orchestrator.py:838-930): header mapped by keywords (row 0, then
    row 1), last-date carry for dateless rows, role-driven
    amount/direction (paid_in -> CREDIT, withdrawn -> DEBIT, balance ->
    running balance, amount -> sign inference), rows without an amount
    or matching is_summary_row skipped, fixed fallback confidences
    (0.80 amount, 0.80/0.30 date, 0.90/0.40 direction,
    orchestrator.py:957-962) and balance_confirmed=False.
    """
    grid = [(ln, _grid_cells(ln)) for ln in lines]
    grid = [(ln, cells) for ln, cells in grid if cells]
    if len(grid) < 2:
        return []

    # pdfplumber hands the reference an already-localized table, so it
    # only probes table[0] / table[1] for the header
    # (orchestrator.py:838-858); the text grid has no cropping step, so
    # the header scan walks the segment for the first line whose cells
    # map to a valid column set.
    header_cells = None
    col_map = None
    data_start = None
    for probe, (_, probe_cells) in enumerate(grid):
        candidate = _map_grid_columns(probe_cells)
        if _grid_col_map_valid(candidate):
            header_cells, col_map = probe_cells, candidate
            data_start = probe + 1
            break
    if col_map is None:
        return []

    records: list[dict] = []
    last_date = None
    for ln, cells in grid[data_start:]:
        row_cells = _assign_cells(header_cells, cells)
        turn = int(ln.get("turn_idx", 0))
        evidence: list[dict] = []

        def _ev(field: str, cell: dict) -> None:
            if cell.get("start") is not None:
                evidence.append({"field": field, "turn_idx": turn,
                                 "start": int(cell["start"]),
                                 "end": int(cell["end"])})

        date_val = None
        date_cell = row_cells[col_map["date_col"]]
        if date_cell["text"]:
            parsed = parse_date(date_cell["text"], today=today)
            if parsed.parsed_date:
                date_val = parsed.parsed_date
                last_date = date_val
                _ev("date", date_cell)
        if date_val is None and last_date:
            date_val = last_date

        desc = ""
        if col_map.get("desc_col") is not None:
            desc_cell = row_cells[col_map["desc_col"]]
            desc = desc_cell["text"]
            if desc:
                _ev("description", desc_cell)

        amount = None
        direction = "UNKNOWN"
        balance = None
        for ac in col_map["amount_cols"]:
            idx, role = ac["index"], ac["role"]
            if idx < len(row_cells) and row_cells[idx]["text"]:
                ap = parse_amount(row_cells[idx]["text"])
                if ap.amount is None:
                    continue
                if role == "paid_in":
                    amount = abs(ap.amount)
                    direction = "CREDIT"
                    _ev("credit", row_cells[idx])
                elif role == "withdrawn":
                    amount = abs(ap.amount)
                    direction = "DEBIT"
                    _ev("debit", row_cells[idx])
                elif role == "balance":
                    balance = ap.amount
                    _ev("balance", row_cells[idx])
                elif role == "amount" and amount is None:
                    amount = abs(ap.amount)
                    if ap.amount < 0:
                        direction = "DEBIT"
                    elif ap.amount > 0:
                        direction = "CREDIT"
                    _ev("amount", row_cells[idx])

        if amount is None:
            continue
        full_row_text = " ".join(c["text"] for c in cells)
        if is_summary_row(desc) or is_summary_row(full_row_text):
            continue

        records.append({
            "row_index": len(records),
            "turn_idx": int(ln.get("turn_idx", 0)),
            "line_indices": [ln.get("line_index", 0)],
            "posted_date": date_val,
            "description_raw": desc[:500] if desc else "",
            "description_clean": (desc[:500] if desc else "").strip(),
            "amount": Decimal(amount).quantize(Decimal("0.01")),
            "direction": direction,
            "direction_source": "text_grid_table",
            "running_balance": (Decimal(balance).quantize(Decimal("0.01"))
                                if balance is not None else None),
            "balance_confirmed": False,
            "balance_tolerance_used": Decimal("0").quantize(Decimal("0.0001")),
            "confidence_amount": 0.80,
            "confidence_date": 0.80 if date_val else 0.30,
            "confidence_direction": 0.90 if direction != "UNKNOWN" else 0.40,
            "evidence": evidence,
        })
    return records


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
             "closing_balance_distinct": False, "fallback_used": False}
    if not lines:
        return empty

    all_lines = lines  # pre-header-strip view for the fallback parser

    def _fallback():
        """pdfplumber-fallback analogue (orchestrator.py:569-578): a
        text-grid parse rescues the segment before giving up."""
        records = _fallback_grid_records(all_lines, today)
        if not records:
            return empty
        return {"records": records, "opening_balance": None,
                "closing_balance": None, "closing_balance_distinct": False,
                "fallback_used": True}

    columns = detect_columns(lines)
    if not columns:
        return _fallback()

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
        # reference cascades to pdfplumber native tables here
        # (orchestrator.py:569-578); the transcripts analogue is the
        # text-grid split (the raster engines tabula/camelot stay out
        # of scope — no PDF bytes exist for transcript turns).
        return _fallback()

    rows = reconstruct_rows(lines, columns, date_col, amount_cols,
                            cells_per_line=cells_per_line)
    transaction_rows = [r for r in rows if not r["is_balance_marker"]]
    if not transaction_rows:
        return _fallback()

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
            "evidence": tx["evidence"],
        })

    if not records:
        # mis-detected column geometry can survive role assignment yet
        # extract nothing (e.g. one mega-column whose header matches an
        # amount keyword) — the worst silent failure at corpus scale.
        # Give the grid fallback the same rescue chance the reference
        # gives pdfplumber when detection fails outright.
        rescue = _fallback()
        if rescue["records"]:
            return rescue

    return {"records": records,
            "opening_balance": opening_balance,
            "closing_balance": closing_balance,
            "closing_balance_distinct": n_marker_cells >= 2,
            "fallback_used": False}
