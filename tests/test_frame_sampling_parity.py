"""Golden parity of frame-index sampling vs the LIVE reference functions.

The reference's `fps_indices` (eval/utils/vision_process.py:103-134)
samples by stride input_fps/output_fps from 0, truncates at max, pads the
index list to a multiple of 4 (the IV2 clip size), and falls back to
`uniform_indices` under the min; `uniform_indices` (:84-100) uses an
INTEGER linspace then floor-div midpoints. Different frames in → different
answers out, so these must match index-for-index (VERDICT r2 weak #6).

The reference module imports decord/pysubs2/torchvision at module scope;
they are stubbed (same pattern as tests/ref_stubs.py) — the functions
under test use only torch + numpy.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from timeviper_tpu.data.video import (
    fps_indices,
    smart_nframes,
    timestamp_indices,
    uniform_indices,
)


@pytest.fixture(scope="module")
def ref_vp():
    """Import the live reference vision_process with CUDA-less stubs.

    The stub insertions (and the reference's `eval` package) are rolled
    back afterwards — a bare `requests` stub otherwise breaks
    huggingface_hub imports in later tests of the same process. Real
    packages imported along the way (torch, …) are left alone: deleting
    a C-extension module and re-importing it segfaults."""
    inserted = []
    for name in ["pysubs2", "requests", "decord"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            inserted.append(name)
    sys.modules["decord"].VideoReader = object
    sys.modules["decord"].cpu = lambda *_: None
    tv = types.ModuleType("torchvision")
    tv_t = types.ModuleType("torchvision.transforms")
    tv_t.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
    tv.io = types.ModuleType("torchvision.io")
    tv.transforms = tv_t
    tv.__version__ = "0.20.0"
    # vision_process imports one helper from the timeviper package
    tvp = types.ModuleType("timeviper")
    tvp_d = types.ModuleType("timeviper.data")
    tvp_d.get_resize_output_image_size = lambda *a, **k: (0, 0)
    for name, m in [("torchvision", tv), ("torchvision.io", tv.io),
                    ("torchvision.transforms", tv_t),
                    ("timeviper", tvp), ("timeviper.data", tvp_d)]:
        if name not in sys.modules:
            sys.modules[name] = m
            inserted.append(name)
    sys.path.insert(0, "/root/reference")
    try:
        import importlib

        mod = importlib.import_module("eval.utils.vision_process")
    finally:
        sys.path.remove("/root/reference")
    yield mod
    for name in inserted:
        sys.modules.pop(name, None)
    # drop the reference's `eval` package so the name can't shadow anything
    for name in [n for n in sys.modules
                 if n == "eval" or n.startswith("eval.")]:
        del sys.modules[name]


GRID_FPS = [
    # (video_fps, total_frames, output_fps, max_frames, min_frames)
    (30.0, 300, 1.0, -1, 1),
    (30.0, 300, 1.0, 256, 32),
    (29.97, 1801, 1.0, 256, 32),
    (23.976, 86, 1.0, 256, 32),
    (25.0, 12543, 1.0, 256, 32),
    (25.0, 12543, 2.0, 768, 4),
    (30.0, 30, 1.0, 256, 32),       # min_frames fallback
    (30.0, 3, 1.0, 256, 32),        # shorter than min
    (60.0, 100000, 0.5, 512, 4),
    (24.0, 97, None, -1, 1),        # output_fps None => stride 1
    (15.0, 451, 1.0, 64, 8),
    (30.0, 299, 1.0, -1, 1),        # pad-to-4 tail
]


def test_fps_indices_parity(ref_vp):
    for vfps, total, ofps, mx, mn in GRID_FPS:
        ref = ref_vp.fps_indices(vfps, total, ofps, mx, mn)
        ours = fps_indices(vfps, total, ofps, min_frames=mn, max_frames=mx)
        assert ours.tolist() == [int(i) for i in ref], (
            vfps, total, ofps, mx, mn, ours.tolist()[:8], list(ref)[:8])


def test_uniform_indices_parity(ref_vp):
    for n, total in [(4, 100), (16, 100), (7, 23), (10, 10), (10, 5),
                     (256, 12543), (3, 1000000), (1, 7), (33, 97)]:
        ref = ref_vp.uniform_indices(n, total)
        ours = uniform_indices(n, total)
        assert ours.tolist() == [int(i) for i in ref], (n, total)


def test_smart_nframes_parity(ref_vp):
    for total, vfps, ele in [
        (300, 30.0, {}),
        (300, 30.0, {"fps": 1.0}),
        (300, 30.0, {"fps": 1.0, "min_frames": 32, "max_frames": 256}),
        (1801, 29.97, {"fps": 1.0, "min_frames": 32, "max_frames": 256}),
        (86, 23.976, {"fps": 2.0}),
        (12543, 25.0, {"nframes": 100}),
        (12543, 25.0, {"nframes": 101}),
        (97, 24.0, {"fps": 0.5, "min_frames": 4, "max_frames": 64}),
    ]:
        ref = ref_vp.smart_nframes(dict(ele), total_frames=total,
                                   video_fps=vfps)
        ours = smart_nframes(
            total, vfps,
            fps=ele.get("fps"), nframes=ele.get("nframes"),
            min_frames=ele.get("min_frames", 4),
            max_frames=ele.get("max_frames"),
        )
        assert ours == int(ref), (total, vfps, ele, ours, ref)


def test_timestamp_indices_parity(ref_vp):
    """Mirror _read_video_decord_w_timestamp's index math
    (eval/vllm_inference/utils.py:27-57) against the live smart_nframes +
    torch.linspace chain."""
    import torch

    for total, vfps, start, end, ele in [
        (3000, 30.0, 0.0, None, {"fps": 1.0, "min_frames": 32,
                                 "max_frames": 256}),
        (3000, 30.0, 10.0, 20.0, {"fps": 1.0, "min_frames": 4,
                                  "max_frames": 256}),
        (3000, 30.0, 95.0, 99.0, {"fps": 2.0}),
        (120, 24.0, 4.9, 5.0, {"fps": 2.0}),   # tiny window
    ]:
        video_end = end if end is not None else total / vfps
        start_frame = max(0, int(start * vfps))
        end_frame = min(total, int(video_end * vfps))
        if end_frame <= start_frame:
            end_frame = start_frame + 1
            if end_frame > total:
                end_frame = total
                start_frame = max(0, end_frame - 1)
        effective = end_frame - start_frame
        n_ref = ref_vp.smart_nframes(dict(ele), total_frames=effective,
                                     video_fps=vfps)
        idx_ref = (
            torch.linspace(start_frame, end_frame - 1, n_ref)
            .round().long().tolist()
        )
        ours, sample_fps = timestamp_indices(
            total, vfps, video_start=start, video_end=end,
            fps=ele.get("fps"), min_frames=ele.get("min_frames", 4),
            max_frames=ele.get("max_frames"),
        )
        assert ours.tolist() == idx_ref, (total, vfps, start, end, ele)
        assert sample_fps == pytest.approx(
            n_ref / max(effective, 1e-6) * vfps)

    # degenerate 1-frame window: the reference's smart_nframes raises
    # (floor_by_factor(min(768, 1), 2) == 0 < FRAME_FACTOR) — parity means
    # we raise identically rather than silently inventing frames
    with pytest.raises(ValueError):
        ref_vp.smart_nframes({"fps": 2.0}, total_frames=1, video_fps=24.0)
    with pytest.raises(ValueError):
        timestamp_indices(120, 24.0, video_start=10.0, video_end=2.0,
                          fps=2.0)
