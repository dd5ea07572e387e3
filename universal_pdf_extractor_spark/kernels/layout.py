"""Layout-aware tokenization over transcript turns.

The reference tokenizes PDF pages into (text, bbox) tokens normalized
to [0,1] page space, clusters them into lines by y-proximity, and
joins line text with single spaces
(app/engines/pdfplumber_engine.py:19-65,110-133; ordering invariants
app/schemas/contracts.py:90-98).  In the transcripts graft a turn is
a page: deterministic synthetic coordinates are derived from the turn
text itself (original line number -> y, character offset -> x) so
every downstream geometric heuristic keeps its exact thresholds.

Geometry constants (all in [0,1] "page" space):
  line i (0-based, counting ORIGINAL lines incl. blanks):
      y0 = Y_START + i * LINE_PITCH,  y1 = y0 + LINE_HEIGHT
  token at chars [a, b):  x0 = X_MARGIN + (a / W) * X_SPAN,
                          x1 = X_MARGIN + (b / W) * X_SPAN
      with W = max(PAGE_WIDTH_CHARS, longest line in the turn);
      the 5% margin mirrors real page margins and keeps the leftmost
      column's histogram bin off index 0, where no local maximum can
      exist (scipy and our peak finder agree on that edge rule)
All bbox values rounded to 6 dp like the reference engine
(pdfplumber_engine.py:120-123).

Derived properties used downstream:
  - same-line tokens share y0 exactly; distinct lines differ by
    LINE_PITCH (0.012) > y_tolerance (0.005) -> line clustering is
    the identity on original lines;
  - adjacent-line gap (0.004) <= 1.8 * LINE_HEIGHT (0.0144) -> the
    continuation-merge heuristic fires for adjacent lines and breaks
    across a skipped line (gap 0.016), mirroring real pages;
  - "top 15% of the page" (segmenter y<0.15) == original lines 0-11.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pandas as pd

from .patterns import is_summary_row, is_summary_row_batch

Y_START = 0.01
LINE_PITCH = 0.012
LINE_HEIGHT = 0.008
PAGE_WIDTH_CHARS = 100.0
X_MARGIN = 0.05
X_SPAN = 0.9
Y_TOLERANCE = 0.005          # text-path line clustering tolerance
TOP_REGION_Y = 0.15          # segmenter header-scan band
TOP_REGION_LINES = 12        # lines with y0 < 0.15 under the constants above
TOKEN_CONFIDENCE = 0.95      # PDF-text-path default confidence
# TOOL-path (OCR-fallback analogue) token confidence: the reference's
# tesseract path reports per-token OCR confidences that average below
# the text path's fixed 0.95 (tesseract_engine.py:108-133,195-212) and
# drive preprocessing-profile selection.  Transcript tool payloads
# have no OCR noise source, so the analogue is a deterministic
# sub-0.95 tier marking the fallback channel.
TOOL_TOKEN_CONFIDENCE = 0.88

_TOKEN_RE = re.compile(r"\S+")

# coordinate memo tables: x positions repeat per page width, y per
# line index — identical values to the inline formulas (same round)
_X_TABLES: dict[float, list[float]] = {}
_Y0S: list[float] = []
_Y1S: list[float] = []


def _x_table(width: float, need: int) -> list[float]:
    table = _X_TABLES.get(width)
    if table is None or len(table) <= need:
        table = [round(X_MARGIN + (i / width) * X_SPAN, 6)
                 for i in range(max(need + 1, int(width) + 2))]
        _X_TABLES[width] = table
        if len(_X_TABLES) > 64:  # bound the cache for adversarial widths
            _X_TABLES.clear()
            _X_TABLES[width] = table
    return table


def _y_tables(need: int) -> tuple[list[float], list[float]]:
    while len(_Y0S) <= need:
        i = len(_Y0S)
        _Y0S.append(round(Y_START + i * LINE_PITCH, 6))
        _Y1S.append(round(Y_START + i * LINE_PITCH + LINE_HEIGHT, 6))
    return _Y0S, _Y1S


def _page_width(text_lines: list[str]) -> float:
    longest = max((len(ln) for ln in text_lines), default=0)
    return max(PAGE_WIDTH_CHARS, float(longest))


def tokenize_turn(text: Optional[str]) -> tuple[list[dict], list[dict]]:
    """Turn text -> (tokens, lines) IR.

    tokens: {text, x0, y0, x1, y1, confidence, line_origin, start, end}
      where start/end are char offsets into the ORIGINAL turn text.
    lines:  {text, x0, y0, x1, y1, line_index, confidence, tokens: [...]}
      ordered by y0, text == ' '.join(token texts) per the contract.
    """
    if not text:
        return [], []
    raw_lines = text.split("\n")
    width = _page_width(raw_lines)
    xs = _x_table(width, max(len(ln) for ln in raw_lines))
    y0s, y1s = _y_tables(len(raw_lines))

    tokens: list[dict] = []
    lines: list[dict] = []
    offset = 0
    for i, raw in enumerate(raw_lines):
        line_tokens = []
        y0 = y0s[i]
        y1 = y1s[i]
        for m in _TOKEN_RE.finditer(raw):
            a, b = m.span()
            tok = {
                "text": m.group(0),
                "x0": xs[a],
                "y0": y0,
                "x1": xs[b],
                "y1": y1,
                "confidence": TOKEN_CONFIDENCE,
                "line_origin": i,
                "start": offset + a,
                "end": offset + b,
                # line-local char columns: segment-level analysis
                # re-normalizes geometry over a shared width so tokens
                # from turns of different widths stay comparable (the
                # reference's pages share one coordinate system;
                # per-turn scaling is a transcripts artifact)
                "col0": a,
                "col1": b,
            }
            line_tokens.append(tok)
            tokens.append(tok)
        if line_tokens:
            lines.append({
                "text": " ".join(t["text"] for t in line_tokens),
                "x0": min(t["x0"] for t in line_tokens),
                "y0": y0,
                "x1": max(t["x1"] for t in line_tokens),
                "y1": y1,
                "line_index": len(lines),
                "confidence": TOKEN_CONFIDENCE,
                "tokens": line_tokens,
            })
        offset += len(raw) + 1
    return tokens, lines


def tokenize_turn_lines(text: Optional[str]) -> list[dict]:
    """Lean tokenizer for the segment-analysis path: lines only.

    Emits exactly :func:`tokenize_turn`'s ``lines`` (same text, y0/y1,
    line_index, token text/start/end/col0/col1) MINUS the fields that
    path provably never reads before they are overwritten or at all:
    token x0/x1 (``_rescale_segment_geometry`` re-derives every x from
    col0/col1 over the segment-wide width as the first step of
    ``analyse_segment``), token y0/y1/confidence/line_origin, and line
    x0/x1/confidence.  Skipping them also skips the per-turn page-width
    scan and the x/y memo-table lookups — about a third of the full
    tokenizer's cost on statement-shaped turns.  Parity of the shared
    fields is pinned by tests/test_layout.py.
    """
    if not text:
        return []
    raw_lines = text.split("\n")
    y0s, y1s = _y_tables(len(raw_lines))
    finditer = _TOKEN_RE.finditer

    lines: list[dict] = []
    offset = 0
    for i, raw in enumerate(raw_lines):
        line_tokens = [
            {
                "text": m.group(0),
                "start": offset + m.start(),
                "end": offset + m.end(),
                "col0": m.start(),
                "col1": m.end(),
            }
            for m in finditer(raw)
        ]
        if line_tokens:
            lines.append({
                "text": " ".join(t["text"] for t in line_tokens),
                "y0": y0s[i],
                "y1": y1s[i],
                "line_index": len(lines),
                "tokens": line_tokens,
            })
        offset += len(raw) + 1
    return lines


def cluster_tokens_to_lines(tokens: list[dict], y_tolerance: float = Y_TOLERANCE) -> list[dict]:
    """Greedy y-clustering of an arbitrary token soup into lines.

    Sorts by (y0, x0) and opens a new line when a token's y0 drifts
    more than ``y_tolerance`` from the FIRST token of the current line
    (the reference updates its comparison anchor only on line break,
    pdfplumber_engine.py:28-46).  With synthetic coordinates this is
    the identity on original lines; it exists so the engine also
    handles externally-supplied token tables.
    """
    if not tokens:
        return []
    ordered = sorted(tokens, key=lambda t: (t["y0"], t["x0"]))
    lines: list[dict] = []
    current = [ordered[0]]
    anchor_y = ordered[0]["y0"]
    for tok in ordered[1:]:
        if abs(tok["y0"] - anchor_y) <= y_tolerance:
            current.append(tok)
        else:
            lines.append(_make_line(current, len(lines)))
            current = [tok]
            anchor_y = tok["y0"]
    lines.append(_make_line(current, len(lines)))
    return lines


def _make_line(tokens: list[dict], line_index: int) -> dict:
    ordered = sorted(tokens, key=lambda t: t["x0"])
    return {
        "text": " ".join(t["text"] for t in ordered),
        "x0": min(t["x0"] for t in ordered),
        "y0": min(t["y0"] for t in ordered),
        "x1": max(t["x1"] for t in ordered),
        "y1": max(t["y1"] for t in ordered),
        "line_index": line_index,
        "confidence": sum(t["confidence"] for t in ordered) / len(ordered),
        "tokens": ordered,
    }


def turn_view(text: Optional[str]) -> dict:
    """Reference-path per-turn view via the full token IR (oracle path).

    raw_text:   reading-order reconstruction ('\\n'.join of line texts)
    top_text:   lowered ' '.join of tokens in the top-15% band
    clean_text: raw_text minus summary/boilerplate lines (north rule)
    spans:      (field='content', start, end) char offsets into the
                ORIGINAL text for each kept line
    """
    tokens, lines = tokenize_turn(text)
    raw_text = "\n".join(ln["text"] for ln in lines)
    top_text = " ".join(t["text"] for t in tokens if t["y0"] < TOP_REGION_Y).lower()
    kept = [ln for ln in lines if not is_summary_row(ln["text"])]
    clean_text = "\n".join(ln["text"] for ln in kept)
    spans = [
        {"field": "content",
         "start": ln["tokens"][0]["start"],
         "end": ln["tokens"][-1]["end"]}
        for ln in kept
    ]
    return {
        "raw_text": raw_text,
        "top_text": top_text,
        "clean_text": clean_text,
        "spans": spans,
        "n_lines": len(lines),
        "n_tokens": len(tokens),
    }


def turn_view_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized fast path for :func:`turn_view` over a batch of turns.

    Avoids materializing the token IR: line splitting, whitespace
    normalization, boilerplate flags and span offsets are computed
    with pandas/numpy column ops.  Must stay bit-identical to the IR
    route (enforced by tests/test_layout.py).
    """
    s = texts.fillna("").astype(str)
    n = len(s)
    if n == 0:
        return pd.DataFrame({
            "raw_text": pd.Series(dtype=str), "top_text": pd.Series(dtype=str),
            "clean_text": pd.Series(dtype=str), "spans": pd.Series(dtype=object),
            "n_lines": pd.Series(dtype=np.int32), "n_tokens": pd.Series(dtype=np.int32),
        })

    rows = np.repeat(np.arange(n), s.str.count("\n").to_numpy() + 1)
    lines = s.str.split("\n").explode()
    lf = pd.DataFrame({"row": rows, "line": lines.to_numpy(dtype=object)})
    lf["line_idx"] = lf.groupby("row").cumcount()

    raw = lf["line"].astype(str)
    lf["len1"] = raw.str.len() + 1
    # char offset of each original line within its turn
    lf["line_start"] = lf.groupby("row")["len1"].cumsum() - lf["len1"]

    stripped = raw.str.strip()
    nonempty = stripped != ""
    # whitespace-normalized line text (token join)
    norm = stripped.str.split().str.join(" ")
    lf["norm"] = norm
    lf["n_tok"] = np.where(nonempty, stripped.str.split().str.len(), 0)

    lstrip_len = raw.str.len() - raw.str.lstrip().str.len()
    rstrip_len = raw.str.rstrip().str.len()
    lf["span_start"] = (lf["line_start"] + lstrip_len).astype(np.int64)
    lf["span_end"] = (lf["line_start"] + rstrip_len).astype(np.int64)

    nonempty_np = nonempty.to_numpy()
    keep_np = nonempty_np & ~is_summary_row_batch(norm).to_numpy()
    in_top_np = (lf["line_idx"] < TOP_REGION_LINES).to_numpy()
    norm_np = norm.to_numpy(dtype=object)
    rows_np = lf["row"].to_numpy()

    def _grouped_join(mask: np.ndarray, sep: str) -> list:
        """Per-row join of masked line texts (rows_np is row-ordered),
        without pandas groupby-apply overhead."""
        out_list = [""] * n
        sel_rows = rows_np[mask]
        if not len(sel_rows):
            return out_list
        sel_vals = norm_np[mask]
        bounds = np.flatnonzero(np.diff(sel_rows)) + 1
        heads = sel_rows[np.concatenate(([0], bounds))] if len(bounds) else sel_rows[:1]
        for r, chunk in zip(heads, np.split(sel_vals, bounds)):
            out_list[int(r)] = sep.join(chunk)
        return out_list

    idx = np.arange(n)
    out = pd.DataFrame(index=idx)
    out["raw_text"] = _grouped_join(nonempty_np, "\n")
    out["top_text"] = [t.lower() for t in _grouped_join(nonempty_np & in_top_np, " ")]
    out["clean_text"] = _grouped_join(keep_np, "\n")

    # spans ride as two parallel int arrays — the Arrow/cache-compact
    # form; the output stage zips them into (field, start, end) structs
    starts_np = lf["span_start"].to_numpy()
    ends_np = lf["span_end"].to_numpy()
    span_starts: list = [[] for _ in range(n)]
    span_ends: list = [[] for _ in range(n)]
    kept_rows = rows_np[keep_np]
    if len(kept_rows):
        bounds = np.flatnonzero(np.diff(kept_rows)) + 1
        heads = kept_rows[np.concatenate(([0], bounds))] if len(bounds) else kept_rows[:1]
        for r, s_chunk, e_chunk in zip(heads,
                                       np.split(starts_np[keep_np], bounds),
                                       np.split(ends_np[keep_np], bounds)):
            span_starts[int(r)] = [int(x) for x in s_chunk]
            span_ends[int(r)] = [int(x) for x in e_chunk]
    out["span_starts"] = span_starts
    out["span_ends"] = span_ends

    out["n_lines"] = np.bincount(rows_np, weights=nonempty_np.astype(np.float64),
                                 minlength=n).astype(np.int32)
    out["n_tokens"] = np.bincount(rows_np, weights=lf["n_tok"].to_numpy().astype(np.float64),
                                  minlength=n).astype(np.int32)
    out.index = texts.index
    return out
