"""Pure-Python METEOR (eval/meteor_py.py) — algebraic and behavioral tests.

The METEOR 1.5 jar (reference eval/metrics/meteor.py:21-35) cannot run here
(no JRE), so correctness is checked against hand-computed scores from the
published formula (Denkowski & Lavie 2014) plus the behavioral properties
the SODA similarity matrix depends on: order sensitivity, stem matching,
multi-reference max, and [0, 1) range.
"""

from __future__ import annotations

import numpy as np
import pytest

from timeviper_tpu.eval.meteor_py import (
    ALPHA, BETA, DELTA, GAMMA, MeteorPyScorer, _align, normalize,
    sentence_score,
)


def test_identical_single_content_word():
    # 1 match, 1 chunk, P=R=1 -> Fmean=1; frag=1 -> score = 1 - gamma
    assert sentence_score("cooking", ["cooking"]) == pytest.approx(1 - GAMMA)


def test_identical_sentence_hand_computed():
    # "chop the onions": chop/onions content (delta), "the" function.
    # All matched exactly, one chunk of 3 -> frag = 1/3.
    expected = 1.0 * (1 - GAMMA * (1 / 3) ** BETA)
    assert sentence_score("chop the onions",
                          ["chop the onions"]) == pytest.approx(expected)


def test_no_overlap_scores_zero():
    assert sentence_score("stir the pot", ["seven purple elephants"]) == 0.0


def test_empty_strings():
    assert sentence_score("", ["anything"]) == 0.0
    assert sentence_score("anything", [""]) == 0.0


def test_stem_match_scores_between_zero_and_exact():
    exact = sentence_score("person chops onions", ["person chops onions"])
    stem = sentence_score("person chopping onions", ["person chops onions"])
    none = sentence_score("person dices shallots", ["person chops onions"])
    assert none < stem < exact
    # stem stage carries weight 0.6: hand-compute the middle case.
    # All 3 words content; matches: person (exact 1.0), chopping~chops
    # (stem 0.6), onions (exact 1.0). One contiguous chunk.
    p = r = (1.0 + 0.6 + 1.0) / 3.0
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    expected = fmean * (1 - GAMMA * (1 / 3) ** BETA)
    assert stem == pytest.approx(expected)


def _force_bundled_table(monkeypatch):
    """Pin the synonym source to the bundled table: on a machine with
    nltk's WordNet corpus installed _synonym_groups would pick WordNet
    and the exact-value assertions below would depend on its synsets."""
    import timeviper_tpu.eval.meteor_py as mp

    groups = mp._groups_from_lines(
        [ln.split() for ln in mp._CORE_SYNONYM_GROUPS.splitlines()
         if ln.strip()])
    monkeypatch.setattr(mp, "_synonym_groups", lambda: groups)


def test_synonym_match_weight(monkeypatch):
    """'slice' ~ 'chop' share a bundled synonym group (different stems),
    so the synonym stage (weight 0.8) fires: between stem and exact."""
    from timeviper_tpu.eval.meteor_py import W_SYN

    _force_bundled_table(monkeypatch)
    exact = sentence_score("person chop onions", ["person chop onions"])
    syn = sentence_score("person slice onions", ["person chop onions"])
    stem_w = sentence_score("person chopping onions", ["person chop onions"])
    assert stem_w < syn < exact
    p = r = (1.0 + W_SYN + 1.0) / 3.0
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    expected = fmean * (1 - GAMMA * (1 / 3) ** BETA)
    assert syn == pytest.approx(expected)


def test_synonym_table_from_env_file(tmp_path, monkeypatch):
    import pytest

    import timeviper_tpu.eval.meteor_py as mp

    f = tmp_path / "syn.txt"
    f.write_text("glorbix fnuzzle\n")
    monkeypatch.setenv("TIMEVIPER_METEOR_SYNONYMS", str(f))
    mp._synonym_groups.cache_clear()
    try:
        with pytest.warns(UserWarning, match="synonym table: file"):
            assert mp._are_synonyms("glorbix", "fnuzzle")
        assert not mp._are_synonyms("glorbix", "onions")
        # a set-but-missing path must error, not silently fall through
        monkeypatch.setenv("TIMEVIPER_METEOR_SYNONYMS",
                           str(tmp_path / "nope.txt"))
        mp._synonym_groups.cache_clear()
        with pytest.raises(FileNotFoundError):
            mp._are_synonyms("glorbix", "fnuzzle")
    finally:
        mp._synonym_groups.cache_clear()


def test_synonym_stage_effect_bounded_on_caption_corpus(monkeypatch):
    """Quantifies the no-WordNet bias band the module docstring cites:
    on paraphrased caption pairs, the bundled synonym stage shifts the
    mean sentence score by a measurable but small amount; disabling it
    (the lower bound of any WordNet-coverage gap) never moves a score
    by more than the stage weight itself."""
    import timeviper_tpu.eval.meteor_py as mp

    _force_bundled_table(monkeypatch)
    pairs = [
        ("put the meat in the pan", "place the beef in the skillet"),
        ("cut the onions into pieces", "slice the onions into chunks"),
        ("stir the soup in the pot", "mix the soup in the saucepan"),
        ("the man walks down the street", "the guy strolls down the road"),
        ("a child jumps over the rock", "a kid leaps over the stone"),
        ("she begins to cook the meal", "she starts to prepare the dish"),
        ("wash the plate and dry it", "rinse the dish and drain it"),
        ("he throws the ball quickly", "he tosses the ball rapidly"),
        ("open the container of oil", "unwrap the bowl of grease"),
        ("heat the pan and add oil", "warm the skillet and pour grease"),
    ]
    with_syn = [sentence_score(h, [r]) for h, r in pairs]
    monkeypatch.setattr(mp, "_are_synonyms", lambda a, b: False)
    without = [sentence_score(h, [r]) for h, r in pairs]
    gain = np.mean(with_syn) - np.mean(without)
    # measured: ~+0.28 mean on these synonym-dense pairs (each content
    # word paraphrased) — the band the module docstring cites. Sentences
    # sharing surface vocabulary are unaffected (last assert).
    assert 0.15 < gain < 0.45
    assert all(w >= wo for w, wo in zip(with_syn, without))
    assert sentence_score("person chops onions", ["pan heats pot"]) == 0.0


def test_word_order_penalized_via_chunks():
    ref = ["the man slices the bread on the table"]
    in_order = sentence_score("the man slices the bread", ref)
    scrambled = sentence_score("bread the slices man the", ref)
    assert scrambled < in_order


def test_function_words_weighted_down():
    # matching only function words moves P/R far less than content words
    content = sentence_score("slices bread", ["slices bread carefully"])
    function = sentence_score("of the", ["of the knife's edge"])
    assert content > function


def test_multi_reference_takes_best():
    refs = ["completely unrelated words here", "stir the soup in the pot"]
    both = sentence_score("stir the soup", refs)
    only_good = sentence_score("stir the soup", [refs[1]])
    assert both == pytest.approx(only_good)


def test_normalize_splits_punctuation():
    assert normalize("Mix flour, eggs.") == ["mix", "flour", ",", "eggs", "."]


def test_align_prefers_fewer_chunks_on_duplicates():
    # "the" appears twice in the ref; aligning hyp's "the" to the second
    # occurrence keeps "the pan" contiguous (1 chunk instead of 2)
    matches, chunks = _align(normalize("the pan"),
                             normalize("the oil in the pan"))
    assert len(matches) == 2 and chunks == 1
    assert sorted((i, j) for i, j, _ in matches) == [(0, 3), (1, 4)]


def test_scores_bounded():
    rng = np.random.RandomState(0)
    words = ["person", "chops", "the", "onions", "pan", "stirs", "of"]
    for _ in range(20):
        hyp = " ".join(rng.choice(words, size=rng.randint(1, 8)))
        ref = " ".join(rng.choice(words, size=rng.randint(1, 8)))
        s = sentence_score(hyp, [ref])
        assert 0.0 <= s < 1.0


def test_scorer_api_matches_jar_wrapper():
    scorer = MeteorPyScorer()
    res = {"0": ["chop the onions"], "1": ["boil water"]}
    gts = {"0": ["chop the onions"], "1": ["the water boils"]}
    mean, scores = scorer.compute_score(res, gts)
    assert len(scores) == 2
    assert mean == pytest.approx(sum(scores) / 2)
    assert scores[0] == pytest.approx(
        sentence_score("chop the onions", ["chop the onions"]))


def test_soda_uses_meteor_by_default(monkeypatch):
    # no java in the image -> get_caption_scorer falls through to MeteorPy
    import timeviper_tpu.eval.dvc as dvc

    monkeypatch.setattr(dvc.shutil, "which", lambda _: None)
    scorer = dvc.get_caption_scorer()
    assert isinstance(scorer, MeteorPyScorer)
    assert isinstance(dvc.get_caption_scorer(prefer="f1"), dvc.TokenF1Scorer)


def test_soda_c_parity_with_meteor_similarity():
    """VERDICT item 7 'Done' check: the SODA matching core agrees with the
    live reference when both sides use the METEOR similarity."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from eval.vllm_inference import eval_dvc
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference eval_dvc unimportable: {e}")
    finally:
        sys.path.remove("/root/reference")

    from timeviper_tpu.eval.dvc import soda_c

    rng = np.random.RandomState(7)
    words = ["person", "chops", "onions", "pan", "heats", "stirs", "pot"]

    def sent():
        return " ".join(rng.choice(words, size=rng.randint(3, 7)))

    def segs(n):
        starts = np.sort(rng.rand(n) * 90)
        return np.stack([starts, starts + 1 + rng.rand(n) * 20], 1)

    scorer = MeteorPyScorer()
    for n_pred, n_gt in [(3, 4), (5, 2), (2, 2)]:
        ps, gs = segs(n_pred), segs(n_gt)
        pc = [sent() for _ in range(n_pred)]
        gc = [sent() for _ in range(n_gt)]
        splits = np.zeros(n_gt, int)
        _, _, iou_matrices = eval_dvc.evaluate_detections(
            ps, gs, splits, iou_thresholds=(0.3, 0.5, 0.7, 0.9))
        ref_fs = eval_dvc.sodac(iou_matrices, scorer, pc, gc, splits, (0.0,))
        ours = soda_c([ps], [gs], [pc], [gc], scorer=scorer)
        assert abs(ours - float(ref_fs[0])) < 1e-6, (n_pred, n_gt)
