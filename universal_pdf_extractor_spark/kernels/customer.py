"""Account-holder (customer) info extraction from header text.

Parity with app/pipeline/orchestrator.py:79-146: find a UK postcode in
the first 50 lines, walk up to 6 lines back to assemble the name +
address block (stopping at blanks, boilerplate, or >80-char lines),
normalize postcode spacing; fall back to a title-prefix name scan.
"""

from __future__ import annotations

import re
from typing import Optional

from .patterns import (
    CUSTOMER_BOILERPLATE_PATTERN,
    NAME_PREFIX_PATTERN,
    UK_POSTCODE_PATTERN,
)

HEADER_SCAN_LINES = 50
ADDRESS_LOOKBACK = 7
MAX_ADDRESS_LINE_LEN = 80

_POSTCODE_RE = re.compile(UK_POSTCODE_PATTERN, re.IGNORECASE)
_NAME_PREFIX_RE = re.compile(NAME_PREFIX_PATTERN, re.IGNORECASE)
_BOILERPLATE_RE = re.compile(CUSTOMER_BOILERPLATE_PATTERN, re.IGNORECASE)


def extract_customer_info(all_text: str) -> dict[str, Optional[str]]:
    """Name / address / postcode from the first-page header area."""
    result = {
        "account_holder_name": None,
        "account_holder_address": None,
        "account_holder_postcode": None,
    }
    header_lines = (all_text or "").split("\n")[:HEADER_SCAN_LINES]

    postcode = None
    postcode_line_idx = None
    for i, line in enumerate(header_lines):
        m = _POSTCODE_RE.search(line)
        if m:
            postcode = m.group(1).upper()
            pc = postcode.replace(" ", "")
            if len(pc) >= 5:
                postcode = pc[:-3] + " " + pc[-3:]
            postcode_line_idx = i
            break
    result["account_holder_postcode"] = postcode

    if postcode_line_idx is None:
        for line in header_lines:
            stripped = line.strip()
            if _NAME_PREFIX_RE.match(stripped) and not _BOILERPLATE_RE.search(stripped):
                result["account_holder_name"] = stripped
                break
        return result

    block_end = postcode_line_idx
    block_start = postcode_line_idx
    for i in range(postcode_line_idx - 1,
                   max(postcode_line_idx - ADDRESS_LOOKBACK, -1), -1):
        stripped = header_lines[i].strip()
        if not stripped:
            break
        if _BOILERPLATE_RE.search(stripped):
            break
        if len(stripped) > MAX_ADDRESS_LINE_LEN:
            break
        block_start = i

    block = [header_lines[i].strip()
             for i in range(block_start, block_end + 1)
             if header_lines[i].strip()]
    if block:
        result["account_holder_name"] = block[0]
        if len(block) >= 2:
            result["account_holder_address"] = ", ".join(block[1:])
    return result
