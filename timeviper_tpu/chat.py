"""Interactive chat CLI.

    python -m timeviper_tpu.chat --checkpoint ckpts/timeviper-9b \
        [--video path.mp4] [--fps 1.0 --max_frames 256] [--int8]

Loads the checkpoint, optionally samples frames from a video, and runs a
REPL over `TimeViperModel.chat`.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="TimeViper-TPU chat")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--video", default=None)
    p.add_argument("--fps", type=float, default=1.0)
    p.add_argument("--min_frames", type=int, default=8)
    p.add_argument("--max_frames", type=int, default=256)
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--int8", action="store_true")
    args = p.parse_args(argv)

    from timeviper_tpu.models.api import load_pretrained_vlm
    from timeviper_tpu.ops.sampling import SamplingParams
    from timeviper_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    model = load_pretrained_vlm(
        args.checkpoint,
        max_new_tokens=args.max_new_tokens,
        sampling=SamplingParams(temperature=args.temperature),
        quantize_int8=args.int8,
    )

    frames = None
    if args.video:
        from timeviper_tpu.data.video import load_video

        frames, _, meta = load_video(
            args.video, sampling="fps", fps=args.fps,
            min_frames=args.min_frames, max_frames=args.max_frames,
        )
        print(f"[loaded {frames.shape[0]} frames from {args.video} "
              f"({meta.duration:.0f}s)]")

    print("TimeViper-TPU chat — empty line or Ctrl-D to exit")
    seed = 0
    while True:
        try:
            text = input("you> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not text:
            break
        reply = model.chat(text, frames=frames, rng_seed=seed)
        seed += 1
        print(f"model> {reply}")


if __name__ == "__main__":
    main()
