"""Eval metrics: answers, scoring, CIDEr, SODA/DVC."""

import numpy as np

from timeviper_tpu.eval.answers import extract_answer
from timeviper_tpu.eval.cider import CiderScorer, cider_score
from timeviper_tpu.eval.dvc import (
    dp_assignment,
    evaluate_youcook2_dvc,
    segment_iou_matrix,
)
from timeviper_tpu.eval.scoring import (
    calc_score,
    compute_IoU,
    mcq_is_correct,
    zigzag_split,
)


def test_extract_answers():
    assert extract_answer("from 20.8 to 30.0 seconds", "tg") == [20.8, 30.0]
    assert extract_answer("<answer>5 and 9</answer>", "tg") == [5.0, 9.0]
    assert extract_answer("no times here", "tg") == [None, None]
    assert extract_answer("(B) something", "mcq") == 1
    assert extract_answer("C. option", "mcq") == 2
    dvc = extract_answer("90 - 102 seconds, stir the pot.", "caption")
    assert dvc["timestamps"] == [[90.0, 102.0]]


def test_scoring_primitives():
    assert compute_IoU([0, 10], [5, 15]) == 5 / 15
    assert mcq_is_correct("B. the right one", 1) == 1
    assert mcq_is_correct("A. wrong", 1) == 0
    assert zigzag_split(list(range(12)), 0, 3) == [0, 1, 10, 11]


def test_calc_score_tvg_and_mcq():
    tvg = calc_score({"a": 0.6, "b": 0.4}, "charades")
    assert abs(tvg["mIoU"] - 50.0) < 1e-9
    assert tvg["IoU R1@0.5"] == 50.0
    mcq = calc_score(
        {"q1": {"score": 1, "duration": "short", "task_type": "t"},
         "q2": {"score": 0, "duration": "short", "task_type": "t"}},
        "videomme",
    )
    assert mcq["total"]["avg"] == 50.0
    assert mcq["short"]["total"] == 2


def test_cider_ranks_similarity():
    cands = ["a man is cooking pasta", "the dog runs outside"]
    refs = [["a man is cooking pasta"], ["a cat sleeps indoors"]]
    res = {i: [c] for i, c in enumerate(cands)}
    gts = {i: r for i, r in enumerate(refs)}
    _, scores = CiderScorer().compute_score(res, gts)
    assert scores[0] > scores[1]
    assert abs(scores[0] - 10.0) < 1e-6  # identical = max score


def test_soda_dvc():
    s = np.eye(3) * 0.9 + 0.05
    ms, pairs = dp_assignment(s)
    assert pairs == [(0, 0), (1, 1), (2, 2)]
    iou = segment_iou_matrix(
        np.array([[0.0, 10.0]]), np.array([[0.0, 10.0]]))
    assert iou[0, 0] == 1.0
    good = [{
        "qid": "youcook2|v0",
        "pred": {"timestamps": [[0, 10], [12, 20]],
                 "captions": ["boil the pasta", "add tomato sauce"]},
        "target": [
            {"segment": [0, 10], "sentence": "boil the pasta", "id": 0},
            {"segment": [11, 20], "sentence": "add the tomato sauce", "id": 1},
        ],
    }]
    bad = [{
        "qid": "youcook2|v0",
        "pred": {"timestamps": [[50, 60]],
                 "captions": ["totally unrelated nonsense"]},
        "target": [
            {"segment": [0, 10], "sentence": "boil the pasta", "id": 0}],
    }]
    # METEOR-1.5 similarity (the reference's, eval/metrics/meteor.py) caps
    # well below 1.0 even for exact matches: penalty gamma*(chunks/m)^beta
    # with beta=0.2 leaves an exact 3-token match at ~0.52, so SODA_c for
    # two near-perfect segments lands near 40, not 90+ as under token-F1.
    assert evaluate_youcook2_dvc(good)["SODA_c"] > 30
    assert evaluate_youcook2_dvc(bad)["SODA_c"] == 0.0


def test_ptb_tokenizer_golden():
    """Pinned Penn-Treebank tokenizations (the sed-script algorithm
    Stanford PTBTokenizer implements), post punctuation-removal exactly
    as the reference wrapper does (eval/metrics/ptbtokenizer.py:60-117)."""
    from timeviper_tpu.eval.ptb import ptb_tokenize

    cases = {
        "A man doesn't like the dog.":
            ["a", "man", "does", "n't", "like", "the", "dog"],
        "It's a well-known fact, isn't it?":
            ["it", "'s", "a", "well-known", "fact", "is", "n't", "it"],
        "They cannot swim (yet).":
            ["they", "can", "not", "swim", "yet"],
        'He said "hello there" twice...':
            ["he", "said", "hello", "there", "twice"],
        "We're gonna cook pasta; then we'll eat it!":
            ["we", "'re", "gon", "na", "cook", "pasta", "then", "we",
             "'ll", "eat", "it"],
        "the chef adds 1,500 ml of water at 3:30":
            ["the", "chef", "adds", "1,500", "ml", "of", "water",
             "at", "3:30"],
    }
    for text, want in cases.items():
        assert ptb_tokenize(text) == want, (text, ptb_tokenize(text))


def test_cider_fixture_pinned():
    import pytest
    """CIDEr-D on a small fixture, pinned to the pycocoevalcap-semantics
    value computed with this scorer (guards the tokenizer+scorer pair
    against regressions)."""
    from timeviper_tpu.eval.cider import CiderScorer

    gts = {
        "a": ["a man is cooking pasta in a kitchen",
              "someone cooks noodles"],
        "b": ["a dog doesn't catch the ball",
              "the dog misses a well-thrown ball"],
        "c": ["children play football on a field",
              "kids are playing soccer outside"],
    }
    res = {
        "a": ["a man is cooking pasta"],
        "b": ["the dog doesn't catch the ball"],
        "c": ["children play soccer on a field"],
    }
    score, per = CiderScorer().compute_score(gts, res)
    assert len(per) == 3
    assert score == pytest.approx(expected=6.2762, abs=2e-3)
