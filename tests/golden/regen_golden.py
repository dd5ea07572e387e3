"""Regenerate tests/golden/golden_conversations.json from the
single-process oracle (kernels/oracle.py).

Run only when a deliberate, justified semantics change lands (the
golden gate exists to make every such change explicit in review):

    PYTHONPATH=. python tests/golden/regen_golden.py [--check]

--check prints the conversation-level diff against the current file
without rewriting it.
"""

from __future__ import annotations

import json
import os
import sys

from universal_pdf_extractor_spark.io.fixtures import generate_transcripts
from universal_pdf_extractor_spark.kernels.oracle import process_conversation

N_CONVS = 12
PATH = os.path.join(os.path.dirname(__file__), "golden_conversations.json")


def _jsonable(v):
    if v is None or isinstance(v, (str, int, float, bool)):
        return v
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)  # Decimal -> exact string


def build() -> dict:
    pdf = generate_transcripts(N_CONVS)
    out = {}
    for conv_id, grp in pdf.groupby("conv_id"):
        grp = grp.sort_values("turn_idx")
        payloads = [
            (int(t), (x if isinstance(x, str) and x else
                      (tl if isinstance(tl, str) and tl else "")))
            for t, x, tl in zip(grp["turn_idx"], grp["text"], grp["tool"])
        ]
        r = process_conversation(payloads)
        out[conv_id] = {
            "conversation": _jsonable(r["conversation"]),
            "records": _jsonable(r["records"]),
            "turns": _jsonable([
                {k: t[k] for k in ("turn_idx", "raw_text", "clean_text",
                                   "spans", "segment_index", "n_tokens")}
                for t in r["turns"]
            ]),
        }
    return out


def main() -> None:
    new = build()
    if os.path.exists(PATH):
        with open(PATH) as fh:
            old = json.load(fh)
        for cid in new:
            o = old.get(cid, {}).get("conversation", {})
            n = new[cid]["conversation"]
            diffs = {k: (o.get(k), n[k]) for k in n
                     if k in o and o.get(k) != n[k]}
            extra = {k: n[k] for k in n if k not in o}
            if diffs or extra:
                print(f"{cid}: changed={diffs} new_fields={list(extra)}")
    if "--check" in sys.argv:
        return
    with open(PATH, "w") as fh:
        json.dump(new, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {PATH}")


if __name__ == "__main__":
    main()
