"""Native libav video decoder: probe/read/load_video dispatch.

The test video is a hand-written raw-RGB AVI (no encoder needed in the
image). Skipped when the g++/ffmpeg toolchain is unavailable.
"""

import struct

import numpy as np
import pytest

from timeviper_tpu.data.native_video import native_video_available

pytestmark = pytest.mark.skipif(
    not native_video_available(), reason="native video decoder unavailable"
)


def write_raw_avi(path, frames, fps=10):
    """Minimal RIFF/AVI with raw BGR24 ('DIB ') frames."""
    n, h, w, _ = frames.shape
    frame_size = w * h * 3

    def chunk(tag, data):
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    movi_items = b""
    for f in frames:
        movi_items += chunk(b"00db", f[::-1, :, ::-1].tobytes())
    avih = struct.pack("<14I", int(1e6 / fps), frame_size * fps, 0, 0x10,
                       n, 0, 1, frame_size, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0,
                       1, fps, 0, n, frame_size, 0xFFFFFFFF, 0, 0, 0,
                       int(w), int(h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size,
                       0, 0, 0, 0)
    strl = (b"LIST" + struct.pack(
        "<I", 4 + len(chunk(b"strh", strh)) + len(chunk(b"strf", strf)))
        + b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl_body = chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_body)) + b"hdrl" + hdrl_body
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_items)) + b"movi" + movi_items
    body = hdrl + movi
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body)


def _ramp_video(tmp_path, n=12, fps=10):
    frames = np.zeros((n, 48, 64, 3), np.uint8)
    for i in range(n):
        frames[i, :, :, 0] = i * 20
        frames[i, :, :, 1] = 100
    path = str(tmp_path / "ramp.avi")
    write_raw_avi(path, frames, fps=fps)
    return path


def test_probe_and_exact_frame_reads(tmp_path):
    from timeviper_tpu.data.native_video import probe, read_frames

    path = _ramp_video(tmp_path)
    w, h, fps, total, duration = probe(path)
    assert (w, h, total) == (64, 48, 12)
    assert abs(fps - 10.0) < 1e-6
    out = read_frames(path, np.array([0, 3, 7, 11]))
    assert out.shape == (4, 48, 64, 3)
    assert [int(out[k, 0, 0, 0]) for k in range(4)] == [0, 60, 140, 220]
    assert (out[:, :, :, 1] == 100).all()


def test_load_video_dispatch(tmp_path):
    from timeviper_tpu.data.video import load_video, probe_backend

    assert probe_backend() == "native"
    path = _ramp_video(tmp_path)
    frames, ts, meta = load_video(path, sampling="uniform", num_frames=4)
    assert frames.shape == (4, 48, 64, 3)
    assert meta.total_frames == 12
    assert len(ts) == 4
    frames2, _, _ = load_video(path, sampling="fps", fps=10.0,
                               min_frames=2, max_frames=6)
    # reference fps_indices pads the truncated 6 to a multiple of 4
    # (vision_process.py:127-128) by repeating the last index
    assert frames2.shape[0] == 8
    assert (frames2[5] == frames2[7]).all()
