"""Live SODA/DVC matching-core parity vs the reference eval_dvc.py.

Our `dp_assignment` is an iterative redesign of the reference's
recursive `chased_dp_assignment` (eval_dvc.py:188-227) and `soda_c`
restructures `sodac` (eval_dvc.py:230-258); these tests run the ACTUAL
reference functions on the same inputs and assert identical optimal
scores, identical matchings, and identical per-video SODA_c F1s (same
sentence-similarity scorer injected on both sides).
"""

from __future__ import annotations

import sys

import numpy as np
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
    return eval_dvc


def test_dp_assignment_parity(ref_dvc):
    from timeviper_tpu.eval.dvc import dp_assignment

    rng = np.random.RandomState(0)
    shapes = [(1, 1), (1, 6), (6, 1), (4, 7), (7, 4), (12, 12), (3, 20)]
    for m, n in shapes:
        for _ in range(3):
            scores = rng.rand(m, n)
            ref_score, _ = ref_dvc.chased_dp_assignment(scores)
            our_score, our_pairs = dp_assignment(scores)
            # SODA consumes only the optimal VALUE (sodac discards pairs,
            # eval_dvc.py:252); the reference's get_pairs recovery scans
            # each row for diag marks — those marks need not lie on the
            # optimal path, so its pair list is not the ground truth.
            # Ours must achieve the (identical) optimal value and be a
            # valid monotonic matching.
            assert abs(our_score - float(ref_score)) < 1e-12, (m, n)
            assert abs(sum(scores[i, j] for i, j in our_pairs)
                       - our_score) < 1e-12, (m, n)
            assert all(a2 > a1 and b2 > b1 for (a1, b1), (a2, b2)
                       in zip(our_pairs, our_pairs[1:]))


def test_dp_assignment_sparse_scores(ref_dvc):
    # zero-heavy matrices (thresholded IoU·similarity products are mostly
    # zero in practice): optimal VALUE must match; with ties several
    # matchings are optimal, so check our pairs achieve the same value
    from timeviper_tpu.eval.dvc import dp_assignment

    rng = np.random.RandomState(1)
    for _ in range(5):
        scores = rng.rand(6, 8)
        scores[scores < 0.7] = 0.0
        ref_score, _ = ref_dvc.chased_dp_assignment(scores)
        our_score, our_pairs = dp_assignment(scores)
        assert abs(our_score - float(ref_score)) < 1e-12
        assert abs(sum(scores[i, j] for i, j in our_pairs) - our_score) < 1e-12
        # monotonic matching invariant
        assert all(a2 > a1 and b2 > b1 for (a1, b1), (a2, b2)
                   in zip(our_pairs, our_pairs[1:]))


def _random_video(rng, n_pred, n_gt):
    words = ["person", "chops", "onions", "pan", "heats", "stirs", "pot",
             "adds", "oil", "mixes", "flour", "eggs", "bakes", "bread"]

    def sent():
        return " ".join(rng.choice(words, size=rng.randint(3, 7)))

    def segs(n):
        starts = np.sort(rng.rand(n) * 90)
        return np.stack([starts, starts + 1 + rng.rand(n) * 20], 1)

    return segs(n_pred), segs(n_gt), [sent() for _ in range(n_pred)], \
        [sent() for _ in range(n_gt)]


def test_soda_c_parity(ref_dvc):
    """Per-video SODA_c through the reference `sodac` (fed its own
    evaluate_detections iou matrices) equals our `soda_c`, with the same
    token-F1 sentence scorer injected into both."""
    from timeviper_tpu.eval.dvc import TokenF1Scorer, soda_c

    rng = np.random.RandomState(2)
    scorer = TokenF1Scorer()
    for n_pred, n_gt in [(3, 4), (5, 2), (1, 1), (6, 6)]:
        ps, gs, pc, gc = _random_video(rng, n_pred, n_gt)
        splits = np.zeros(n_gt, int)
        _, _, iou_matrices = ref_dvc.evaluate_detections(
            ps, gs, splits, iou_thresholds=(0.3, 0.5, 0.7, 0.9))
        ref_fs = ref_dvc.sodac(iou_matrices, scorer, pc, gc, splits, (0.0,))
        ours = soda_c([ps], [gs], [pc], [gc], scorer=scorer)
        assert abs(ours - float(ref_fs[0])) < 1e-6, (n_pred, n_gt)


def test_soda_c_empty_pred_parity(ref_dvc):
    from timeviper_tpu.eval.dvc import TokenF1Scorer, soda_c

    ref_fs = ref_dvc.sodac({}, TokenF1Scorer(), [], ["a gt caption"],
                           np.zeros(1, int), (0.0,))
    ours = soda_c([np.zeros((0, 2))], [np.array([[0.0, 5.0]])], [[]],
                  [["a gt caption"]], scorer=TokenF1Scorer())
    assert ours == 0.0 and float(ref_fs[0]) == 0.0


def test_segment_iou_parity(ref_dvc):
    from timeviper_tpu.eval.dvc import segment_iou_matrix

    rng = np.random.RandomState(3)
    ps, gs, _, _ = _random_video(rng, 5, 7)
    ours = segment_iou_matrix(ps, gs)
    for gi in range(len(gs)):
        for pi in range(len(ps)):
            assert abs(ours[gi, pi] - ref_dvc.iou(ps[pi], gs[gi])) < 1e-6
