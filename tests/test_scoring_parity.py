"""Live scoring-layer parity vs the reference's eval_all.py.

AST-extracts `compute_IoU`, `mcq_is_correct`, `load_scored_data`, and
`calc_score` from /root/reference/eval/vllm_inference/eval_all.py (the
module itself imports the full data-loader chain: pandas, pysubs2,
decord, …) and runs them against our `timeviper_tpu.eval.scoring` on the
same synthetic prediction shards, end to end: jsonl records ->
load_scored_data -> calc_score for each datatype family (TVG, MCQ with
duration splits, MCQ with task-type splits, plain MCQ).
"""

from __future__ import annotations

import ast
import json
import os
import re
from collections import defaultdict

import numpy as np
import pytest

REF_EVAL_ALL = "/root/reference/eval/vllm_inference/eval_all.py"


@pytest.fixture(scope="module")
def ref():
    src = open(REF_EVAL_ALL).read()
    tree = ast.parse(src)
    want = {"compute_IoU", "mcq_is_correct", "load_scored_data",
            "calc_score"}
    fns = [n for n in tree.body
           if isinstance(n, ast.FunctionDef) and n.name in want]
    assert {f.name for f in fns} == want
    from timeviper_tpu.eval.answers import get_dataset_type

    ns = {"np": np, "re": re, "os": os, "json": json,
          "defaultdict": defaultdict, "get_dataset_type": get_dataset_type}
    exec(compile(ast.Module(fns, type_ignores=[]), REF_EVAL_ALL, "exec"), ns)
    return ns


def _write_shards(tmp_path, recs, n_shards=2):
    for i in range(n_shards):
        with open(tmp_path / f"out_{i}.jsonl", "w") as f:
            for r in recs[i::n_shards]:
                f.write(json.dumps(r) + "\n")
    # a score file and a non-jsonl file must both be ignored
    (tmp_path / "scores.json").write_text("{}")
    (tmp_path / "notes.txt").write_text("x")
    return str(tmp_path)


def _ours(data_dir, name):
    from timeviper_tpu.eval.scoring import calc_score, load_scored_data

    return calc_score(load_scored_data(data_dir, name), name)


def _refs(ref, data_dir, name):
    return ref["calc_score"](
        ref["load_scored_data"](data_dir, name, "default"), name)


def _close(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _close(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, float):
        assert abs(a - float(b)) < 1e-9, (path, a, b)
    else:
        assert a == b, (path, a, b)


def test_tvg_parity(ref, tmp_path):
    recs = [
        {"qid": "q1", "pred": [1.0, 5.0], "target": [2.0, 6.0]},
        {"qid": "q2", "pred": [None, None], "target": [2.0, 6.0]},
        {"qid": "q3", "pred": [10.0, 30.0], "target": [12.0, 25.0]},
        {"qid": "q4", "pred": [0.0, 100.0], "target": [40.0, 60.0]},
        {"qid": "q5", "pred": [40.0, 60.0], "target": [40.0, 60.1]},
    ]
    d = _write_shards(tmp_path, recs)
    for name in ("charades", "activitynet", "tvgbench"):
        _close(_ours(d, name), _refs(ref, d, name))


def test_mcq_duration_split_parity(ref, tmp_path):
    recs = [
        {"qid": f"q{i}", "pred": p, "target": t, "output_text": o,
         "duration": dur, "task_type": tt}
        for i, (p, t, o, dur, tt) in enumerate([
            (1, 1, "", "short", "ocr"),
            (2, 1, "", "short", "ocr"),
            (None, 0, "A. first option", "medium", "counting"),
            (None, 2, "B. nope", "long", "counting"),
            (3, 3, "", "long", "reasoning"),
        ])
    ]
    d = _write_shards(tmp_path, recs)
    _close(_ours(d, "videomme"), _refs(ref, d, "videomme"))
    _close(_ours(d, "longvideobench"), _refs(ref, d, "longvideobench"))


def test_mcq_tasktype_split_parity(ref, tmp_path):
    recs = [
        {"qid": "a", "pred": 0, "target": 0, "task_type": "tt1"},
        {"qid": "b", "pred": 1, "target": 0, "task_type": "tt1"},
        # mlvu carries task_type lists; every element gets the score
        {"qid": "c", "pred": 2, "target": 2, "task_type": ["tt1", "tt2"]},
        {"qid": "d", "pred": None, "target": 1, "output_text": "(B) x",
         "task_type": "tt2"},
    ]
    d = _write_shards(tmp_path, recs)
    for name in ("mlvu", "lvbench", "cgbench"):
        ours, theirs = _ours(d, name), _refs(ref, d, name)
        _close(ours, dict(theirs))


def test_mcq_plain_parity(ref, tmp_path):
    recs = [
        {"qid": "a", "pred": 0, "target": 0},
        {"qid": "b", "pred": 1, "target": 0},
        {"qid": "c", "pred": None, "target": 1, "output_text": "B. yes"},
    ]
    d = _write_shards(tmp_path, recs)
    for name in ("egoschema", "mvbench", "tempcompass"):
        _close(_ours(d, name), _refs(ref, d, name))


def test_iou_and_mcq_primitive_parity(ref):
    from timeviper_tpu.eval.scoring import compute_IoU, mcq_is_correct

    for pred, gt in [([1, 5], [2, 6]), ([0, 10], [0, 10]),
                     ([5, 6], [8, 9]), ([0.5, 2.5], [1.0, 2.0])]:
        assert abs(compute_IoU(pred, gt)
                   - float(ref["compute_IoU"](list(pred), list(gt)))) < 1e-12
    for text, gt in [("B. yes", 1), ("A. no", 1), ("C", 2), ("(D) k", 3),
                     ("The answer is B. trust me", 1), ("b lowercase", 1)]:
        assert mcq_is_correct(text, gt) == ref["mcq_is_correct"](text, gt)
