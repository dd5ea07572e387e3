"""UK monetary-amount parsing kernel.

Semantics parity with the reference's amount parser
(app/pipeline/amount_parser.py:29-148): currency-symbol stripping,
sign conventions in precedence order (parentheses -> DR/CR/D/C suffix
-> trailing minus -> leading minus incl. U+2212), comma/space removal,
Decimal parse, and its exact confidence table (0.95 base, 0.90 for
DR_CR / MINUS, 0.5 for |amount| > 10M, 0.80 for zero).

Functions return plain tuples/columns rather than objects so they can
be used directly inside Arrow-batched pandas UDFs; a vectorized batch
wrapper is provided for Series input.
"""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation
from typing import NamedTuple, Optional

import numpy as np
import pandas as pd

_DRCR_SUFFIX_RE = re.compile(r"^(.+?)\s*(DR|CR|D|C)$", re.IGNORECASE)
_POUND = chr(163)
_MINUS_SIGN = chr(8722)  # U+2212

# Fast vectorized pre-filter: anything that could possibly parse as an
# amount contains at least one digit.  Used to skip the Python ladder
# for the (dominant) non-amount cells in wide batches.
_HAS_DIGIT_RE = re.compile(r"\d")


class AmountParse(NamedTuple):
    amount: Optional[Decimal]
    is_negative: bool
    sign_convention: Optional[str]
    confidence: float


_NULL_PARSE = AmountParse(None, False, None, 0.0)

_DEC_10M = Decimal("10000000")
# currency-marker fast probe: every stripped marker contains one of
# these characters, so a string without any of them skips the 8-way
# replace chain (the overwhelmingly common case for plain numerals)
_CCY_CHARS = frozenset("GgEe$\\" + _POUND)
# a DR/CR/D/C suffix must end in one of these characters
_DRCR_LAST = frozenset("RrCcDd")


def parse_amount(raw: str) -> AmountParse:
    """Parse one amount string under UK statement conventions."""
    if raw is None:
        return _NULL_PARSE
    s = raw.strip()
    if not s or s in ("-", "--", "---"):
        return _NULL_PARSE

    # currency markers (incl. the literal escaped sequences the
    # reference strips, for byte parity)
    if not _CCY_CHARS.isdisjoint(s):
        for marker in ("GBP", "gbp", "$", "EUR", "eur", "\\u00a3", "\\u20a4", _POUND):
            s = s.replace(marker, "")
        s = s.strip()
        if not s:
            return _NULL_PARSE

    is_negative = False
    sign_convention = "NONE"

    if s.startswith("(") and s.endswith(")"):
        s = s[1:-1].strip()
        is_negative = True
        sign_convention = "PARENTHESES"

    m = _DRCR_SUFFIX_RE.match(s) if s[-1:] in _DRCR_LAST else None
    if m:
        s = m.group(1).strip()
        suffix = m.group(2).upper()
        if suffix in ("DR", "D"):
            is_negative = True
            sign_convention = "DR_CR"
        else:  # CR / C
            is_negative = False
            sign_convention = "DR_CR"

    if not is_negative and s.endswith("-"):
        s = s[:-1].strip()
        is_negative = True
        sign_convention = "MINUS"

    if not is_negative and (s.startswith("-") or s.startswith(_MINUS_SIGN)):
        s = s[1:].strip()
        is_negative = True
        sign_convention = "MINUS"

    s = s.replace(",", "").replace(" ", "")

    try:
        amount = Decimal(s)
    except (InvalidOperation, ValueError):
        return _NULL_PARSE
    # Decimal accepts 'NaN'/'Infinity' spellings; downstream magnitude
    # comparisons raise InvalidOperation on them (the reference's
    # parser has the same latent crash, amount_parser.py:29-148)
    if not amount.is_finite():
        return _NULL_PARSE

    if is_negative:
        amount = -amount

    confidence = 0.95
    if sign_convention in ("DR_CR", "MINUS"):
        confidence = 0.90
    abs_amount = abs(amount)
    if abs_amount > _DEC_10M:
        confidence = 0.5
    if not abs_amount:
        confidence = 0.80

    return AmountParse(amount, is_negative, sign_convention, confidence)


_PLAIN_NUMBER_RE = re.compile(r"\d+(\.\d*)?")
_DRCR_STRIP_RE = re.compile(r"\s*(DR|CR|D|C)$", re.IGNORECASE)


def is_amount_like(text: str) -> bool:
    """Cheap predicate: does the text parse as money after stripping?"""
    if text is None:
        return False
    t = text.strip()
    if not t:
        return False
    # fast accept: a bare decimal number (the overwhelmingly common
    # case) parses without the Decimal try/except round trip
    if _PLAIN_NUMBER_RE.fullmatch(t):
        return True
    cleaned = t.replace(_POUND, "").replace("GBP", "").replace(",", "").strip()
    cleaned = _DRCR_STRIP_RE.sub("", cleaned).strip()
    if cleaned.startswith("(") and cleaned.endswith(")"):
        cleaned = cleaned[1:-1].strip()
    if cleaned.startswith("-") or cleaned.startswith(_MINUS_SIGN):
        cleaned = cleaned[1:].strip()
    if cleaned.endswith("-"):
        cleaned = cleaned[:-1].strip()
    try:
        return Decimal(cleaned.replace(",", "").replace(" ", "")).is_finite()
    except (InvalidOperation, ValueError):
        return False


def parse_amount_batch(values: pd.Series) -> pd.DataFrame:
    """Vectorized wrapper: Series[str] -> frame of parse components.

    A digit pre-filter skips the ladder for obviously-non-numeric
    cells so wide description batches stay cheap.
    """
    out_amount: list[Optional[Decimal]] = []
    out_neg = np.zeros(len(values), dtype=bool)
    out_conv: list[Optional[str]] = []
    out_conf = np.zeros(len(values), dtype=np.float64)

    vals = values.to_numpy(dtype=object)
    for i, v in enumerate(vals):
        if v is None or not isinstance(v, str) or not _HAS_DIGIT_RE.search(v):
            out_amount.append(None)
            out_conv.append(None)
            continue
        p = parse_amount(v)
        out_amount.append(p.amount)
        out_neg[i] = p.is_negative
        out_conv.append(p.sign_convention)
        out_conf[i] = p.confidence

    return pd.DataFrame(
        {
            "amount": pd.Series(out_amount, dtype=object),
            "is_negative": out_neg,
            "sign_convention": pd.Series(out_conv, dtype=object),
            "confidence": out_conf,
        },
        index=values.index,
    )


def is_amount_like_batch(values: pd.Series) -> pd.Series:
    """Vectorized is_amount_like with a digit pre-filter."""
    mask = values.fillna("").str.contains(_HAS_DIGIT_RE)
    out = pd.Series(False, index=values.index)
    if mask.any():
        out.loc[mask] = values[mask].map(is_amount_like)
    return out
