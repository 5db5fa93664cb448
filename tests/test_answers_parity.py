"""Live answer-extraction parity vs the reference.

Loads the ACTUAL reference parsers — `parse_dvc_prediction` /
`extract_time_from_para` / `extract_time_part` from
eval/vllm_inference/eval_dvc.py and `extract_answer` from evaluate.py
(AST-extracted: that module imports vllm at top level) — and asserts our
implementations produce identical results over a battery of realistic
generated outputs. Benchmark scores are only comparable if the parse of
the generated text is identical.
"""

from __future__ import annotations

import ast
import re
import sys

import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_dvc():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from eval.vllm_inference import eval_dvc
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference eval_dvc unimportable: {e}")
    # the reference's 'start time X, end time Y' branch contains a stray
    # pdb.set_trace() (eval_dvc.py:717) — stub it so parity over that
    # branch is testable
    eval_dvc.pdb.set_trace = lambda: None
    return eval_dvc


@pytest.fixture(scope="module")
def ref_extract_answer(ref_dvc):
    """The reference evaluate.py:252-299 extract_answer, extracted by AST
    (the module itself imports vllm/timeviper at top level)."""
    src = open(f"{REF}/evaluate.py").read()
    tree = ast.parse(src)
    fn = next(n for n in ast.walk(tree)
              if isinstance(n, ast.FunctionDef) and n.name == "extract_answer")
    ns = {"re": re}
    exec(compile(ast.Module([fn], type_ignores=[]), "evaluate.py", "exec"),
         ns)
    return ns["extract_answer"]


DVC_CASES = [
    # type 1: "N - M" / "N to M" paragraph layouts
    "From 0 to 10 seconds, a person chops onions. From 12.5 to 30 "
    "seconds, the pan heats up.",
    "0 - 15 seconds, whisk the eggs thoroughly. 15 - 42 seconds, pour "
    "the mixture into the pan.",
    "The video shows cooking from 3.5 to 20 seconds with detailed prep "
    "work happening throughout the scene.",
    # type 1: Start/End time blocks with Description lines
    "1. Start time: 105 seconds\nEnd time: 109 seconds\nDescription: "
    "Making brown sugar sandwiches",
    "Start time: 5\nEnd time: 12\nDescription: slicing tomatoes\n"
    "Start time: 14\nEnd time: 30\nDescription: frying the slices",
    "Starting time: 8 seconds\nEnding time: 19 seconds\n* stirring the "
    "soup gently",
    # 'start time X, end time Y' branch (the pdb one)
    "start time 10, end time 20, person washes vegetables carefully",
    # type 2: sentence-level "…seconds" parsing incl. mm:ss and widening
    "At 0:05 - 0:30 in the clip, mixing flour happens. around 180 "
    "seconds, add olive oil to the pan.",
    "* Using a wok to cook dishes (from 1:09 to 1:20 seconds) in the "
    "kitchen.",
    "The chef works at 2:30 seconds, kneading the dough on the counter.",
    "around 15 seconds, a cat jumps onto the table and knocks a cup.",
    # no timestamps at all
    "A person is cooking in a kitchen.",
    "",
    # mixed noise
    "Answer: the event spans 33.0 to 48.5 seconds, a man ties his shoes "
    "near the door. Then from 50 to 61 seconds, he leaves.",
    "I think it is 100-120 seconds, the girl paints the fence white.",
]


def _norm(ts):
    # the reference's third branch leaves timestamps as string tuples
    # (documented defect, eval_dvc.py:705-717); ours converts to float —
    # normalize both sides for comparison
    return [[float(a), float(b)] for a, b in ts]


def test_parse_dvc_prediction_parity(ref_dvc):
    from timeviper_tpu.eval.answers import parse_dvc_prediction

    for text in DVC_CASES:
        ref_ts, ref_caps = ref_dvc.parse_dvc_prediction(text)
        our_ts, our_caps = parse_dvc_prediction(text)
        assert _norm(our_ts) == _norm(ref_ts), text
        assert our_caps == list(ref_caps), text


def test_extract_time_part_parity(ref_dvc):
    from timeviper_tpu.eval.answers import _extract_time_part

    for frag in [
        "10 - 38", "1. The video starts at 0:00.", "from 1:09 to 1:20",
        "start - 180", "around 15", "5 and 9 and 12", "no numbers here",
        "2:30", "12.5 - 30.0", "3 - 4 - 5",
    ]:
        # identical raises count as parity: a fragment like "0:00." makes
        # BOTH sides crash on int("00.") — inside parse_dvc_prediction
        # that surfaces as the try/except skipping the sentence
        try:
            ref = ("ok", ref_dvc.extract_time_part(frag))
        except Exception as e:
            ref = ("raise", type(e).__name__)
        try:
            ours = ("ok", _extract_time_part(frag))
        except Exception as e:
            ours = ("raise", type(e).__name__)
        assert ours == ref, frag


def test_extract_time_from_para_parity(ref_dvc):
    from timeviper_tpu.eval.answers import _extract_time_from_para

    for text in DVC_CASES:
        if "start time 10" in text:
            continue  # string-tuple defect branch, covered normalized above
        ref = ref_dvc.extract_time_from_para(text)
        ours = _extract_time_from_para(text)
        assert ours == (list(ref[0]), list(ref[1])), text


TG_CASES = [
    "from 20.8 to 30.0 seconds", "<answer>5 and 9</answer>",
    "no times here", "the span is 3 to 7, then 10 and 12.",
    "<answer>nothing numeric</answer>", "0.5 to 1.5",
]

MCQ_CASES = ["(B) something", "C. option", "A", "(D)", "x", ""]


def test_tg_mcq_parity(ref_extract_answer):
    from timeviper_tpu.eval.answers import extract_answer

    for text in TG_CASES:
        assert extract_answer(text, "tg") == ref_extract_answer(text, "tg"), text
    for text in MCQ_CASES:
        assert extract_answer(text, "mcq") == ref_extract_answer(text, "mcq"), text


def test_caption_datatype_parity(ref_dvc, ref_extract_answer):
    # the reference wraps parse_dvc_prediction into a dict in evaluate.py's
    # caption branch; the function imports it from eval.vllm_inference
    from timeviper_tpu.eval.answers import extract_answer

    for text in DVC_CASES[:4]:
        ref = ref_extract_answer(text, "caption")
        ours = extract_answer(text, "caption")
        assert _norm(ours["timestamps"]) == _norm(ref["timestamps"])
        assert ours["captions"] == list(ref["captions"])
