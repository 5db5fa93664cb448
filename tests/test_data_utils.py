"""Data-layer utilities: image strategies, frame sampling, fusion, labels."""

import numpy as np
import pytest

from timeviper_tpu.data.datasets import mask_labels_by_separator
from timeviper_tpu.data.fusion import fuse_labels, plan_fusion
from timeviper_tpu.data.image_processing import ImageTransform, smart_resize
from timeviper_tpu.data.video import (
    fps_indices,
    smart_nframes,
    uniform_indices,
)


def test_image_strategies_shapes():
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (120, 200, 3), dtype=np.uint8)
    for strategy in ("resize-naive", "resize-crop", "letterbox"):
        t = ImageTransform(56, (0.5,) * 3, (0.5,) * 3, strategy)
        out = t(frame)
        assert out.shape == (56, 56, 3), strategy
        assert out.dtype == np.float32
        assert -1.01 <= out.min() and out.max() <= 1.01


def test_smart_resize_factor():
    h, w = smart_resize(480, 640, factor=28)
    assert h % 28 == 0 and w % 28 == 0


def test_frame_sampling():
    assert uniform_indices(4, 100).tolist() == [12, 37, 62, 87]
    assert len(uniform_indices(10, 5)) == 5  # fewer frames than requested
    idx = fps_indices(30.0, 300, fps=1.0, min_frames=4, max_frames=8)
    assert len(idx) == 8  # 10s * 1fps = 10, clamped to 8
    assert smart_nframes(300, 30.0, fps=1.0, min_frames=32, max_frames=256) == 32


def test_fusion_plan_packed():
    img = 99
    # two packed samples: [t t i i t] and [t i t t]
    ids = [1, 2, img, img, 3, 4, img, 5, 6]
    plan = plan_fusion(ids, img, tokens_per_frame=3, txt_seq_lens=[5, 4])
    # sample 0: 2 text + 2*3 visual + 1 text = 9; sample 1: 1 + 3 + 2 = 6
    assert plan.fused_len == 9 + 6
    assert plan.num_visual == 9
    assert plan.sample_layouts == ((2, 6, 1), (1, 3, 2))
    assert plan.seq_idx is not None
    assert plan.seq_idx.tolist() == [0] * 9 + [1] * 6
    # positions restart per sample
    assert plan.position_ids[:3].tolist() == [0, 1, 2]
    assert plan.position_ids[9:12].tolist() == [0, 1, 2]
    labels = fuse_labels(plan, [-100, -100, -100, -100, 7, -100, -100, 8, 9])
    assert labels[plan.is_visual].tolist() == [-100] * 9


def test_label_masking_by_separator():
    # layout: [sys sep] [user... sep] [answer... sep]
    sep = 42
    ids = np.array([1, sep, 5, 6, sep, 7, 8, sep])
    labels = mask_labels_by_separator(ids, sep, has_system=True)
    # spans after seps alternate user(IGNORE)/assistant(supervised);
    # with a system prompt, span 1 (user) is masked, span 2 supervised
    assert labels.tolist()[:5] == [-100] * 5
    assert labels.tolist()[5:] == [7, 8, sep]
