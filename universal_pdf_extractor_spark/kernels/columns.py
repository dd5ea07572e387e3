"""Whitespace-gap column detection and token->cell assignment.

Parity with the reference table extractor
(app/pipeline/table_extractor.py:107-213): a 120-bin histogram of
token x0 positions over [0,1], gaussian smoothing (sigma=1.5), peak
finding with an occupancy relaxation ladder [0.08, 0.05, 0.03] until
at least 3 peaks emerge, then column bands [peak_start - 0.01,
midpoint-to-next-peak] with the first band clamped to 0.  Zero peaks
fall back to a single full-width column; fewer than 5 tokens yield no
columns at all.

Columns are plain dicts: {column_index, x_start, x_end, role}.
"""

from __future__ import annotations

import numpy as np

from .peaks import find_peaks_simple, gaussian_smooth_1d

N_BINS = 120
MIN_COLUMN_OCCUPANCY = 0.08
OCCUPANCY_LADDER = (MIN_COLUMN_OCCUPANCY, 0.05, 0.03)
PEAK_DISTANCE = 4
SMOOTH_SIGMA = 1.5


def detect_columns(lines: list[dict],
                   min_column_occupancy: float = MIN_COLUMN_OCCUPANCY,
                   n_bins: int = N_BINS) -> list[dict]:
    """Histogram/peak column detection over a segment's lines."""
    if not lines:
        return []

    x_positions = [tok["x0"] for line in lines for tok in line["tokens"]]
    if len(x_positions) < 5:
        return []

    hist, bin_edges = np.histogram(np.asarray(x_positions), bins=n_bins, range=(0.0, 1.0))
    smoothed = gaussian_smooth_1d(hist.astype(float), sigma=SMOOTH_SIGMA)

    ladder = [min_column_occupancy] + [o for o in OCCUPANCY_LADDER[1:]]
    peaks = np.array([], dtype=np.int64)
    for occupancy in ladder:
        threshold = max(len(lines) * occupancy, 2.0)
        peaks = find_peaks_simple(smoothed, height=threshold, distance=PEAK_DISTANCE)
        if len(peaks) >= 3:  # date, description, amount at minimum
            break

    if len(peaks) == 0:
        return [{"column_index": 0, "x_start": 0.0, "x_end": 1.0, "role": "UNKNOWN"}]

    columns = []
    for i, peak in enumerate(peaks):
        x_start = bin_edges[peak]
        if i + 1 < len(peaks):
            x_end = (bin_edges[peak] + bin_edges[peaks[i + 1]]) / 2.0
        else:
            x_end = 1.0
        columns.append({
            "column_index": i,
            "x_start": max(0.0, float(x_start) - 0.01),
            "x_end": min(1.0, float(x_end)),
            "role": "UNKNOWN",
        })
    columns[0]["x_start"] = 0.0
    return columns


def assign_token_to_column(token: dict, columns: list[dict]) -> int:
    """x-center containment, falling back to nearest column center."""
    if not columns:
        return 0
    x_center = (token["x0"] + token["x1"]) / 2.0
    for col in columns:
        if col["x_start"] <= x_center <= col["x_end"]:
            return col["column_index"]
    distances = [abs(x_center - (c["x_start"] + c["x_end"]) / 2.0) for c in columns]
    return columns[distances.index(min(distances))]["column_index"]


def make_column_assigner(columns: list[dict]):
    """Memoized token->column lookup for one fixed column layout.

    Fixed-width statement layouts repeat token x-spans across rows, so
    the (x0, x1) -> column mapping hits the cache almost always."""
    cache: dict[tuple, int] = {}

    def assign(token: dict) -> int:
        key = (token["x0"], token["x1"])
        col = cache.get(key)
        if col is None:
            col = assign_token_to_column(token, columns)
            cache[key] = col
        return col

    return assign


def assign_line_to_cells(line: dict, columns: list[dict], assigner=None) -> list[dict]:
    """Group a line's tokens into per-column cells.

    Cell: {text, column_index, turn_idx, start, end} — start/end are
    char offsets of the cell's token span into its ORIGINAL turn text
    (the transaction_evidence analogue, tables.py:388-420: the
    reference stores a bbox per extracted field; the transcripts graft
    stores the provenance span instead).  The reference's cell
    envelope bbox + mean confidence (table_extractor.py:205-211) stay
    omitted: nothing downstream reads them.
    """
    if assigner is None:
        assigner = lambda t: assign_token_to_column(t, columns)  # noqa: E731
    cell_tokens: dict[int, list[dict]] = {}
    for token in line["tokens"]:
        cell_tokens.setdefault(assigner(token), []).append(token)

    turn_idx = line.get("turn_idx")
    cells = []
    for col_idx in sorted(cell_tokens):
        toks = cell_tokens[col_idx]
        if len(toks) > 1:
            toks = sorted(toks, key=lambda t: t["x0"])
        cells.append({
            "text": " ".join(t["text"] for t in toks),
            "column_index": col_idx,
            "turn_idx": turn_idx,
            "start": toks[0].get("start"),
            "end": toks[-1].get("end"),
        })
    return cells
