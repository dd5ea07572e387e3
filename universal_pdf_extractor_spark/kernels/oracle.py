"""Single-process whole-conversation oracle.

Runs the complete extraction chain for ONE conversation exactly as
the Spark pipeline is required to compute it (and as the reference
orchestrator does per document, app/pipeline/orchestrator.py:168-432).
The e2e equality tests compare the distributed pipeline's output
against this oracle per (conv_id, turn_idx) — the north-rule gate.

Integrated-path parity notes (all mirrored by the Spark stages):
- classification, provider detection and customer-info extraction all
  receive ONE combined string `"\\n".join(non-empty per-turn
  raw_texts)` (orchestrator.py:317-330), so provider detection
  effectively scans the whole conversation despite its
  first-3-pages signature;
- document confidence is the weighted score over per-record
  confidences with confidence_balance := 0.8 if balance_confirmed
  else 0.0 (orchestrator.py:392-400);
- validation/final status come from the confidence thresholds
  directly (orchestrator.py:406-417), not score_document's gates.
"""

from __future__ import annotations

from datetime import date
from typing import Optional

from .classify import (
    CONFIDENCE_FAIL_THRESHOLD,
    CONFIDENCE_PASS_THRESHOLD,
    CONFIDENCE_WARN_THRESHOLD,
    DOCUMENT_WEIGHTS,
    build_segments,
    boundary_score,
    classify_document,
    detect_provider,
)
from .customer import extract_customer_info
from .dates import DEFAULT_TODAY
from .layout import tokenize_turn, turn_view
from .segment_extract import analyse_segment

BOUNDARY_THRESHOLD = 0.8


def segment_index_per_turn(top_texts: list[str]) -> list[int]:
    """Cumulative boundary count - 1 per turn (turn 0 is a boundary)."""
    seg = -1
    out = []
    for i, top in enumerate(top_texts):
        if i == 0 or boundary_score(top)[0] >= BOUNDARY_THRESHOLD:
            seg += 1
        out.append(seg)
    return out


def status_from_confidence(confidence: float) -> tuple[str, str]:
    """(validation_status, final_status) per orchestrator.py:406-417."""
    if confidence >= CONFIDENCE_PASS_THRESHOLD:
        return "PASS", "COMPLETED"
    if confidence >= CONFIDENCE_WARN_THRESHOLD:
        return "PASS_WITH_WARNINGS", "COMPLETED"
    if confidence >= CONFIDENCE_FAIL_THRESHOLD:
        return "NEEDS_REVIEW", "NEEDS_REVIEW"
    return "FAIL", "NEEDS_REVIEW"


def document_confidence(records: list[dict]) -> tuple[float, float]:
    """(document_confidence, reconciliation_rate) over final records."""
    n = len(records)
    if n == 0:
        return 0.0, 0.0
    mean_amount = sum(r["confidence_amount"] for r in records) / n
    mean_direction = sum(r["confidence_direction"] for r in records) / n
    mean_date = sum(r["confidence_date"] for r in records) / n
    mean_balance = sum(0.8 if r["balance_confirmed"] else 0.0 for r in records) / n
    recon_rate = sum(1 for r in records if r["balance_confirmed"]) / n
    weighted = (
        DOCUMENT_WEIGHTS["reconciliation_rate"] * recon_rate
        + DOCUMENT_WEIGHTS["mean_balance_confidence"] * mean_balance
        + DOCUMENT_WEIGHTS["mean_direction_confidence"] * mean_direction
        + DOCUMENT_WEIGHTS["mean_amount_confidence"] * mean_amount
        + DOCUMENT_WEIGHTS["mean_date_confidence"] * mean_date
    )
    return round(weighted, 4), round(recon_rate, 4)


def process_conversation(turns: list[tuple[int, Optional[str]]],
                         today: date = DEFAULT_TODAY) -> dict:
    """Full oracle for one conversation.

    ``turns``: [(turn_idx, text)] sorted by turn_idx.
    Returns {turns, records, segments, conversation}.
    """
    views = [turn_view(text) for _, text in turns]
    top_texts = [v["top_text"] for v in views]
    seg_per_turn = segment_index_per_turn(top_texts)

    turn_rows = [
        {
            "turn_idx": t_idx,
            "raw_text": v["raw_text"],
            "clean_text": v["clean_text"],
            "spans": v["spans"],
            "top_text": v["top_text"],
            "n_lines": v["n_lines"],
            "n_tokens": v["n_tokens"],
            "segment_index": seg,
        }
        for (t_idx, _), v, seg in zip(turns, views, seg_per_turn)
    ]

    # conversation-level analysis over combined text
    conv_text = "\n".join(v["raw_text"] for v in views if v["raw_text"])
    classification = classify_document([conv_text])
    provider = detect_provider([conv_text])
    customer = extract_customer_info(conv_text)

    # per-segment extraction: lines (tagged with turn_idx) in reading order
    records = []
    segments = []
    n_segments = seg_per_turn[-1] + 1 if seg_per_turn else 0
    for seg_idx in range(n_segments):
        seg_lines = []
        for (t_idx, text), s in zip(turns, seg_per_turn):
            if s != seg_idx:
                continue
            _, lines = tokenize_turn(text)
            for ln in lines:
                ln["turn_idx"] = t_idx
                seg_lines.append(ln)
        result = analyse_segment(seg_lines, today=today)
        segments.append({
            "segment_index": seg_idx,
            "opening_balance": result["opening_balance"],
            "closing_balance": result["closing_balance"],
            "n_records": len(result["records"]),
        })
        for rec in result["records"]:
            rec["segment_index"] = seg_idx
            records.append(rec)

    confidence, recon_rate = document_confidence(records)
    validation_status, final_status = status_from_confidence(confidence)

    conversation = {
        "doc_family": classification["doc_family"],
        "doc_family_confidence": round(classification["confidence"], 4),
        "provider": provider["provider_name"],
        "provider_confidence": round(provider["confidence"], 4),
        "account_holder_name": customer["account_holder_name"],
        "account_holder_address": customer["account_holder_address"],
        "account_holder_postcode": customer["account_holder_postcode"],
        "document_confidence": confidence,
        "reconciliation_rate": recon_rate,
        "validation_status": validation_status,
        "final_status": final_status,
        "row_count": len(records),
        "n_segments": n_segments,
    }
    return {"turns": turn_rows, "records": records,
            "segments": segments, "conversation": conversation}
