"""Native C++ preprocessing vs the PIL reference path."""

import numpy as np
import pytest

from timeviper_tpu.data.image_processing import ImageTransform
from timeviper_tpu.data.native import native_available


@pytest.mark.skipif(not native_available(), reason="g++ unavailable")
def test_native_matches_pil():
    from timeviper_tpu.data.native import preprocess_frames_native

    t = ImageTransform(112, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
              for _ in range(4)]
    pil = np.stack([t(f) for f in frames])
    nat = preprocess_frames_native(np.stack(frames), 112, t.mean, t.std)
    # PIL rounds internally at u8; 2 u8-steps tolerance on the [-1,1] scale
    assert np.abs(pil - nat).max() <= 2.5 * (2 / 255) / 0.5


@pytest.mark.skipif(not native_available(), reason="g++ unavailable")
def test_native_upscale_and_identity():
    from timeviper_tpu.data.native import preprocess_frames_native

    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (2, 56, 56, 3), dtype=np.uint8)
    up = preprocess_frames_native(frames, 112, (0, 0, 0), (1, 1, 1))
    assert up.shape == (2, 112, 112, 3)
    same = preprocess_frames_native(frames, 56, (0, 0, 0), (1, 1, 1))
    np.testing.assert_allclose(
        same, frames.astype(np.float32) / 255.0, atol=1 / 255 + 1e-6
    )
