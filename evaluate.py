#!/usr/bin/env python
"""Evaluation entry point (reference-compatible location).

Thin shim over `timeviper_tpu.eval.evaluate` — see docs/USAGE.md for flags.
"""

from timeviper_tpu.utils.cache import enable_compilation_cache


if __name__ == "__main__":
    enable_compilation_cache()
    from timeviper_tpu.eval.evaluate import main

    main()
