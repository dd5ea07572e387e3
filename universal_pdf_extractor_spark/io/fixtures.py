"""Deterministic synthetic transcripts generator (FIXTURES.md §1-2).

Emits the engine's primary input table
(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp) with turn payloads that exercise every
operator: provider headers, UK postcodes, statement periods, table
headers, fixed-width transaction rows across the four solver layouts
(separate debit/credit, signed amounts, amount+balance, amount only),
date/amount format ladders, balance chains with penny-off rows,
continuation lines, boilerplate noise, multi-segment conversations,
motor-finance and pure-chatter negatives.

Everything is keyed off (seed, conv_index): generation is reproducible
per conversation, so the table can be built distributed (one Spark
task generates a conv range) or on the driver, with identical output.
Wall-clock-free: timestamps derive from a fixed epoch.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

SEED = 42
EPOCH = datetime(2024, 1, 1, 0, 0, 0)
MAX_TURNS = 200
ROLES = ("user", "assistant", "tool")

_PROVIDER_HEADERS = [
    ("Barclays", "Barclays Bank PLC", "20-14-53"),
    ("HSBC", "HSBC UK", "40-11-22"),
    ("Lloyds", "Lloyds Bank", "30-99-01"),
    ("NatWest", "NatWest", "60-02-49"),
    ("Monzo", "Monzo Bank", "04-00-04"),
    ("Starling", "Starling Bank", "60-83-71"),
    ("Santander", "Santander", "09-01-28"),
    ("Halifax", "Halifax", "11-00-77"),
]

_NAMES = ["Mr. John Smith", "Mrs. Ada Clarke", "Dr. Sam Patel", "Ms. Eve Turner"]
_STREETS = ["12 High Street", "4 Mill Lane", "221B Baker Street", "7 Acacia Avenue"]
_TOWNS = ["Manchester", "Leeds", "Bristol", "Norwich"]
_POSTCODES = ["M1 4BT", "LS2 8JQ", "BS1 5TR", "NR2 1QA"]

_MERCHANTS = [
    "TESCO STORES 3141", "SAINSBURYS LOCAL", "AMAZON RETAIL",
    "SHELL PETROL 22", "COSTA COFFEE", "GREGGS LEEDS",
    "DIRECT DEBIT GYM", "COUNCIL TAX", "NETFLIX.COM",
    "TFL TRAVEL CH", "BOOTS PHARMACY", "WAITROSE 882",
]
_CREDIT_MERCHANTS = ["SALARY ACME LTD", "REFUND AMAZON", "TRANSFER IN", "HMRC REPAYMENT"]

_CHATTER = [
    "hey can you summarise my spending for last month",
    "sure here is what I found in the statement you uploaded",
    "the largest payment went to your landlord",
    "could you check whether the gym membership went out twice",
    "I only see one gym direct debit in this period",
    "thanks that is helpful",
    "let me know if you want a category breakdown",
]

_MOTOR_FINANCE_LINES = [
    "Hire Purchase Agreement Schedule",
    "Vehicle Registration: WX19 KLM",
    "This personal contract purchase includes a balloon payment",
    "Settlement figure valid for 14 days",
    "Total amount payable 18,540.00",
    "Annual percentage rate APR 7.9%",
    "Optional final payment 6,200.00",
]

_BOILERPLATE_LINES = [
    "Page {p} of {n}",
    "Financial Services Compensation Scheme FSCS protected",
    "Registered in England company number 00123456",
    "Authorised and regulated by the Financial Conduct Authority",
    "Important information about compensation arrangements",
]

# date renderers cycling the ladder (all within the statement period)
_DATE_STYLES = [
    lambda d: d.strftime("%d/%m/%Y"),
    lambda d: d.strftime("%d %b %Y"),
    lambda d: d.strftime("%d/%m/%y"),
    lambda d: d.strftime("%Y-%m-%d"),
    lambda d: d.strftime("%d %B %Y"),
    lambda d: d.strftime("%d%b%y").upper(),  # RBS DDMONYY
]


def _fmt_row_case1(date_s, desc, debit, credit, balance):
    return f"{date_s:<18} {desc:<34}{debit:>12}{credit:>12}{balance:>14}"


def _fmt_row_single(date_s, desc, amount, balance=""):
    if balance:
        return f"{date_s:<18} {desc:<40}{amount:>13}{balance:>14}"
    return f"{date_s:<18} {desc:<40}{amount:>13}"


def _money(v_pennies: int) -> str:
    v = v_pennies / 100.0
    return f"{v:,.2f}"


def conversation_payload(conv_index: int, seed: int = SEED) -> list[dict]:
    """All turns for one conversation, deterministic in (seed, index)."""
    rng = random.Random((seed << 20) ^ conv_index)
    # Zipf-ish turn counts (heavy tail capped at 200) so grouped-stage
    # skew is exercised; calibrated to ~30 turns/conv mean -> ~600k
    # turns at sf0.1 (FIXTURES.md §6)
    n_turns = min(MAX_TURNS, max(1, int(9.0 * (rng.random() ** -0.8))))

    kind_draw = rng.random()
    if kind_draw < 0.10:
        kind = "chatter"
    elif kind_draw < 0.20:
        kind = "motor_finance"
    else:
        kind = "bank_statement"

    variant = conv_index % 4  # solver layout case 1..4
    # table rendering style: most statements are fixed-width columns
    # (the histogram path); a deterministic slice are pipe-delimited
    # (defeats the >=2-space grid split -> delim fallback tier) or
    # single-spaced (defeats both splitters -> pattern fallback tier)
    table_style = "columns"
    if conv_index % 23 == 7:
        table_style = "pipes"
    elif conv_index % 23 == 15:
        table_style = "spaces"
    provider, provider_line, sort_code = _PROVIDER_HEADERS[conv_index % len(_PROVIDER_HEADERS)]
    name = _NAMES[conv_index % len(_NAMES)]
    who = conv_index % len(_POSTCODES)

    turns: list[dict] = []
    balance_pennies = rng.randrange(50_000, 300_000)
    row_date = datetime(2024, 1 + (conv_index % 6), 1 + rng.randrange(20))
    date_style = _DATE_STYLES[conv_index % len(_DATE_STYLES)]
    multi_segment = kind == "bank_statement" and rng.random() < 0.20 and n_turns >= 6

    def header_block(page_no: int = 1) -> list[str]:
        return [
            f"{provider_line}",
            f"{name}",
            f"{_STREETS[who]}",
            f"{_TOWNS[who]} {_POSTCODES[who]}",
            f"Sort Code: {sort_code}  Account Number 48291002",
            f"Statement Period: 01/0{1 + (conv_index % 6)}/2024 to 28/0{1 + (conv_index % 6)}/2024",
            f"Page {page_no} of {max(2, n_turns // 3)}",
        ]

    def table_header() -> str:
        if table_style == "pipes":
            return "Date | Description | Amount | Balance"
        if table_style == "spaces":
            return "Date Description Amount Balance"
        if variant == 0:
            return f"{'Date':<18} {'Description':<34}{'Paid Out':>12}{'Paid In':>12}{'Balance':>14}"
        if variant == 2:
            return f"{'Date':<18} {'Description':<40}{'Amount':>13}{'Balance':>14}"
        return f"{'Date':<18} {'Description':<40}{'Amount':>13}"

    def opening_line() -> str:
        s = _money(balance_pennies)
        if table_style == "pipes":
            return f" | Balance brought forward | | {s}"
        if table_style == "spaces":
            return f"Balance brought forward {s}"
        if variant == 0:
            return _fmt_row_case1("", "Balance brought forward", "", "", s)
        if variant == 2:
            return _fmt_row_single("", "Balance brought forward", "", s)
        return f"{'':<18} {'Balance brought forward':<40}{s:>27}"

    def tx_rows(n: int) -> list[str]:
        nonlocal balance_pennies, row_date
        out = []
        for _ in range(n):
            row_date += timedelta(days=rng.randrange(0, 2))
            is_credit = rng.random() < 0.3
            amt = rng.randrange(100, 50_000)
            desc = rng.choice(_CREDIT_MERCHANTS if is_credit else _MERCHANTS)
            delta = amt if is_credit else -amt
            balance_pennies += delta
            reported = balance_pennies
            if rng.random() < 0.02:  # penny-off row for the tolerance ladder
                reported += rng.choice([-1, 1])
            date_s = date_style(row_date)
            amt_s = _money(amt)
            bal_s = _money(reported)
            if table_style == "pipes":
                signed = amt_s if is_credit else f"-{amt_s}"
                out.append(f"{date_s} | {desc} | {signed} | {bal_s}")
                continue
            if table_style == "spaces":
                signed = amt_s if is_credit else f"-{amt_s}"
                # ragged indentation (OCR'd-plaintext analogue): keeps
                # the x-histogram from finding stable columns, so these
                # segments exercise the pattern fallback tier
                out.append(f"{' ' * (len(out) % 7)}{date_s} {desc} {signed} {bal_s}")
                continue
            if variant == 0:
                out.append(_fmt_row_case1(
                    date_s, desc, "" if is_credit else amt_s,
                    amt_s if is_credit else "", bal_s))
            elif variant == 1:
                signed = amt_s if is_credit else rng.choice(
                    [f"({amt_s})", f"{amt_s} DR", f"-{amt_s}", f"{amt_s}-"])
                if is_credit and rng.random() < 0.5:
                    signed = f"{amt_s} CR"
                out.append(_fmt_row_single(date_s, desc, signed))
            elif variant == 2:
                out.append(_fmt_row_single(date_s, desc, amt_s, bal_s))
            else:
                out.append(_fmt_row_single(date_s, desc, amt_s))
            if rng.random() < 0.12:  # continuation description line
                out.append(f"{'':<14}{'REF ' + str(rng.randrange(10_000, 99_999)):<34}")
        return out

    boundary_turn = n_turns // 2 if multi_segment else -1

    for t in range(n_turns):
        role = ROLES[t % 3]
        lines: list[str] = []
        if kind == "chatter":
            lines = [rng.choice(_CHATTER) for _ in range(rng.randrange(1, 4))]
        elif kind == "motor_finance":
            if t == 0:
                lines = list(_MOTOR_FINANCE_LINES)
            else:
                lines = [rng.choice(_MOTOR_FINANCE_LINES + _CHATTER)
                         for _ in range(rng.randrange(1, 5))]
        else:
            if t == 0:
                lines = header_block(1) + [table_header(), opening_line()] + tx_rows(rng.randrange(8, 14))
            elif t == boundary_turn:
                lines = header_block(1) + [table_header(), opening_line()] + tx_rows(rng.randrange(6, 12))
            elif t % 3 == 2:  # occasional chatter turn inside a statement conv
                lines = [rng.choice(_CHATTER)]
            else:
                lines = tx_rows(rng.randrange(4, 10))
                if rng.random() < 0.2:
                    bp = rng.choice(_BOILERPLATE_LINES)
                    lines.append(bp.format(p=t, n=n_turns))

        text = "\n".join(lines)
        if rng.random() < 0.05:
            text = ""
        tool_payload = None
        if role == "tool":
            # OCR-path analogue: payload arrives via the tool column
            tool_payload = text
            text = None

        turns.append({
            "conv_id": f"conv_{conv_index:08d}",
            "turn_idx": t,
            "role": role,
            "text": text,
            "tool": tool_payload,
            "ts": EPOCH + timedelta(seconds=conv_index * 3600 + t * 60),
        })
    return turns


def generate_transcripts(n_convs: int, seed: int = SEED,
                         first_conv: int = 0) -> pd.DataFrame:
    """Transcripts frame for conv indices [first_conv, first_conv+n)."""
    rows: list[dict] = []
    for i in range(first_conv, first_conv + n_convs):
        rows.extend(conversation_payload(i, seed))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    return df


SF_CONVS = {0.001: 200, 0.01: 2_000, 0.1: 20_000}


def n_convs_for_sf(sf: float) -> int:
    return SF_CONVS.get(sf, max(1, int(round(200_000 * sf))))


def transcripts_sdf(spark, n_convs: int, seed: int = SEED, partitions: int = 32):
    """Distributed generation: one task generates a conv range."""
    from pyspark.sql import functions as F  # noqa: N812
    from ..schemas import TRANSCRIPTS_SCHEMA

    def gen(batches):
        for pdf in batches:
            for idx in pdf["id"].tolist():
                yield pd.DataFrame(conversation_payload(int(idx), seed))

    base = spark.range(0, n_convs, 1, partitions)
    return base.mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
