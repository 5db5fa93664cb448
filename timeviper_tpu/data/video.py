"""Host-side video IO + frame sampling.

Replaces the decord-based loaders (reference: timeviper/data/data.py:343-416,
eval/utils/vision_process.py:84-233, eval/vllm_inference/utils.py:13-66).
Video decode is input-pipeline work and stays on the CPU host (SURVEY.md §2.2
N8); the device sees ready frame arrays, streamed in via `jax.device_put`
double-buffering (data/loader.py).

Backends are probed in order native (our C++ libav decoder,
native/videodec.cpp — the decord replacement) → decord → PyAV → OpenCV and
gated gracefully.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Frame index sampling (reference vision_process.py:84-133)
# ---------------------------------------------------------------------------


def uniform_indices(num_frames: int, total_frames: int) -> np.ndarray:
    """`num_frames` evenly spaced indices over [0, total_frames)."""
    if total_frames <= num_frames:
        return np.arange(total_frames, dtype=np.int64)
    seg = np.linspace(0, total_frames, num_frames + 1)
    return ((seg[:-1] + seg[1:]) / 2).astype(np.int64)


def fps_indices(
    video_fps: float,
    total_frames: int,
    fps: float = 1.0,
    min_frames: Optional[int] = None,
    max_frames: Optional[int] = None,
) -> np.ndarray:
    """Sample at `fps` frames/sec, clamped to [min_frames, max_frames]."""
    duration = total_frames / max(video_fps, 1e-6)
    n = int(duration * fps)
    if min_frames is not None:
        n = max(n, min_frames)
    if max_frames is not None:
        n = min(n, max_frames)
    n = max(min(n, total_frames), 1)
    return uniform_indices(n, total_frames)


def round_by_factor(n: int, factor: int) -> int:
    return max(factor, round(n / factor) * factor)


def smart_nframes(
    total_frames: int,
    video_fps: float,
    fps: float = 1.0,
    min_frames: int = 32,
    max_frames: int = 256,
    frame_factor: int = 1,
) -> int:
    """Qwen2-VL-style frame-count pick (reference vision_process.py:386-430):
    duration·fps clamped, rounded to `frame_factor`."""
    n = total_frames / max(video_fps, 1e-6) * fps
    n = min(max(n, min_frames), max_frames, total_frames)
    return max(int(round(n / frame_factor) * frame_factor), frame_factor)


# ---------------------------------------------------------------------------
# Decode backends
# ---------------------------------------------------------------------------


@dataclass
class VideoMeta:
    total_frames: int
    fps: float
    duration: float


def _load_native(path: str, indices: np.ndarray) -> Tuple[np.ndarray, VideoMeta]:
    from timeviper_tpu.data import native_video as nv

    w, h, fps, total, duration = nv.probe(path)
    frames = nv.read_frames(path, indices)
    return frames, VideoMeta(total, fps, duration)


def load_subtitle(
    srt_path: str,
    timestamps: Optional[Sequence[float]] = None,
    max_chars: int = 0,
) -> str:
    """Parse an .srt subtitle file into one text block, optionally keeping
    only cues overlapping the sampled-frame timestamps (reference
    eval/utils/vision_process.py:52-83 subtitle loading for cgbench)."""
    import re

    def to_sec(t: str) -> float:
        h, m, rest = t.split(":")
        s, ms = rest.split(",")
        return int(h) * 3600 + int(m) * 60 + int(s) + int(ms) / 1000.0

    cues = []
    with open(srt_path, encoding="utf-8", errors="ignore") as f:
        blocks = re.split(r"\n\s*\n", f.read())
    for block in blocks:
        lines = [ln.strip() for ln in block.strip().splitlines() if ln.strip()]
        if len(lines) < 2 or "-->" not in lines[1 if lines[0].isdigit() else 0]:
            continue
        ts_line = lines[1] if lines[0].isdigit() else lines[0]
        text_lines = lines[2:] if lines[0].isdigit() else lines[1:]
        try:
            start_s, end_s = [to_sec(t.strip()) for t in ts_line.split("-->")]
        except Exception:
            continue
        cues.append((start_s, end_s, " ".join(text_lines)))
    if timestamps is not None:
        ts = list(timestamps)
        cues = [
            (s, e, txt) for s, e, txt in cues
            if any(s <= t <= e for t in ts)
        ]
    text = " ".join(txt for _, _, txt in cues)
    if max_chars and len(text) > max_chars:
        text = text[:max_chars]
    return text


def probe_backend() -> Optional[str]:
    # native libav decoder first (the decord replacement; always available
    # when g++ + ffmpeg libs exist), then python backends
    from timeviper_tpu.data.native_video import native_video_available

    if native_video_available():
        return "native"
    for name, mod in (("decord", "decord"), ("pyav", "av"), ("opencv", "cv2")):
        try:
            __import__(mod)
            return name
        except ImportError:
            continue
    return None


def _load_decord(path: str, indices: np.ndarray) -> Tuple[np.ndarray, VideoMeta]:
    import decord

    vr = decord.VideoReader(path, num_threads=2)
    meta = VideoMeta(len(vr), float(vr.get_avg_fps()),
                     len(vr) / max(float(vr.get_avg_fps()), 1e-6))
    frames = vr.get_batch(list(indices)).asnumpy()
    return frames, meta


def _load_pyav(path: str, indices: np.ndarray) -> Tuple[np.ndarray, VideoMeta]:
    import av

    with av.open(path) as container:
        stream = container.streams.video[0]
        total = stream.frames or 0
        fps = float(stream.average_rate or 30.0)
        want = set(int(i) for i in indices)
        frames = {}
        for i, frame in enumerate(container.decode(stream)):
            if total == 0:
                pass
            if i in want:
                frames[i] = frame.to_ndarray(format="rgb24")
            if len(frames) == len(want):
                break
        total = total or (max(frames) + 1 if frames else 0)
        out = np.stack([frames[int(i)] for i in indices if int(i) in frames])
    return out, VideoMeta(total, fps, total / max(fps, 1e-6))


def _load_opencv(path: str, indices: np.ndarray) -> Tuple[np.ndarray, VideoMeta]:
    import cv2

    cap = cv2.VideoCapture(path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    for i in indices:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[..., ::-1])  # BGR -> RGB
    cap.release()
    return np.stack(frames), VideoMeta(total, fps, total / max(fps, 1e-6))


def video_meta(path: str) -> VideoMeta:
    backend = probe_backend()
    if backend == "native":
        from timeviper_tpu.data import native_video as nv

        w, h, fps, total, duration = nv.probe(path)
        return VideoMeta(total, fps, duration)
    if backend == "decord":
        import decord

        vr = decord.VideoReader(path, num_threads=1)
        fps = float(vr.get_avg_fps())
        return VideoMeta(len(vr), fps, len(vr) / max(fps, 1e-6))
    if backend == "pyav":
        import av

        with av.open(path) as c:
            s = c.streams.video[0]
            fps = float(s.average_rate or 30.0)
            total = s.frames or int(
                (c.duration or 0) / 1e6 * fps
            )
            return VideoMeta(total, fps, total / max(fps, 1e-6))
    if backend == "opencv":
        import cv2

        cap = cv2.VideoCapture(path)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        cap.release()
        return VideoMeta(total, fps, total / max(fps, 1e-6))
    raise RuntimeError("No video decode backend (decord/pyav/opencv) available")


def load_video(
    path: str,
    *,
    sampling: str = "fps",
    fps: float = 1.0,
    num_frames: Optional[int] = None,
    min_frames: int = 4,
    max_frames: int = 256,
) -> Tuple[np.ndarray, np.ndarray, VideoMeta]:
    """Decode sampled frames.

    Returns (frames (F, H, W, 3) uint8, timestamps (F,) float seconds, meta).
    `sampling`: "fps" (reference eval default, 1 fps clamped 32-256,
    evaluate.py:100-110) or "uniform" (fixed `num_frames`).
    """
    meta = video_meta(path)
    if sampling == "uniform":
        assert num_frames is not None
        idx = uniform_indices(num_frames, meta.total_frames)
    else:
        idx = fps_indices(meta.fps, meta.total_frames, fps, min_frames, max_frames)
    backend = probe_backend()
    loader = {"native": _load_native, "decord": _load_decord,
              "pyav": _load_pyav, "opencv": _load_opencv}[backend]
    frames, meta = loader(path, idx)
    ts = idx.astype(np.float64) / max(meta.fps, 1e-6)
    return frames, ts, meta
