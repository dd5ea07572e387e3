"""Golden-fixture gate (the reference's golden_fixtures design,
tables.py:545-569: expected outputs frozen per document).

tests/golden/golden_conversations.json snapshots the full expected
output — per-turn clean text + spans + segment ids, every extracted
record field, and the conversation rollup — for 12 fixture
conversations.  Unlike the oracle-equality e2e test (which would
follow a kernel-semantics drift on both sides), this pins absolute
values: any change to parser ladders, thresholds, solver rules or
layout constants fails here and must be justified.
"""

from __future__ import annotations

import json
import os

import pytest

from universal_pdf_extractor_spark.io.fixtures import generate_transcripts
from universal_pdf_extractor_spark.schemas import TRANSCRIPTS_SCHEMA
from universal_pdf_extractor_spark.stages.pipeline import run_pipeline

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "golden_conversations.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH) as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def outputs(spark, golden):
    pdf = generate_transcripts(len(golden))
    sdf = spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)
    out = run_pipeline(sdf)
    return {k: v.toPandas() for k, v in out.items()}


def test_turns_match_golden(outputs, golden):
    turns = outputs["turns"].set_index(["conv_id", "turn_idx"])
    checked = 0
    for conv_id, g in golden.items():
        for t in g["turns"]:
            row = turns.loc[(conv_id, t["turn_idx"])]
            assert row["clean_text"] == t["clean_text"], (conv_id, t["turn_idx"])
            assert row["raw_text"] == t["raw_text"]
            assert row["segment_index"] == t["segment_index"]
            assert row["n_tokens"] == t["n_tokens"]
            got_spans = [{"field": s["field"], "start": s["start"], "end": s["end"]}
                         for s in row["spans"]]
            assert got_spans == t["spans"], (conv_id, t["turn_idx"])
            checked += 1
    assert checked == sum(len(g["turns"]) for g in golden.values())


def test_records_match_golden(outputs, golden):
    records = outputs["records"]
    for conv_id, g in golden.items():
        got = records[records["conv_id"] == conv_id] \
            .sort_values(["segment_index", "row_index"]).reset_index(drop=True)
        exp = g["records"]
        assert len(got) == len(exp), conv_id
        for i, e in enumerate(exp):
            r = got.iloc[i]
            key = (conv_id, e["segment_index"], e["row_index"])
            assert r["direction"] == e["direction"], key
            assert (str(r["amount"]) if r["amount"] is not None else None) == e["amount"], key
            assert (r["posted_date"].isoformat() if r["posted_date"] else None) == e["posted_date"], key
            assert r["description_clean"] == e["description_clean"], key
            assert bool(r["balance_confirmed"]) == e["balance_confirmed"], key
            assert (str(r["running_balance"]) if r["running_balance"] is not None else None) \
                == e["running_balance"], key
            if "evidence" in e:
                got_ev = [(v["field"], v["turn_idx"], v["start"], v["end"])
                          for v in r["evidence"]]
                exp_ev = [(v["field"], v["turn_idx"], v["start"], v["end"])
                          for v in e["evidence"]]
                assert got_ev == exp_ev, key


def test_conversations_match_golden(outputs, golden):
    conv = outputs["conversations"].set_index("conv_id")
    for conv_id, g in golden.items():
        e = g["conversation"]
        r = conv.loc[conv_id]
        assert r["doc_family"] == e["doc_family"], conv_id
        assert r["validation_status"] == e["validation_status"], conv_id
        assert r["row_count"] == e["row_count"], conv_id
        assert r["n_segments"] == e["n_segments"], conv_id
