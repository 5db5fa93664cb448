#!/usr/bin/env python
"""Training entry point (reference-compatible location).

Thin shim over `timeviper_tpu.train.cli` — see docs/USAGE.md for flags.
"""

from timeviper_tpu.utils.cache import enable_compilation_cache


if __name__ == "__main__":
    enable_compilation_cache()
    from timeviper_tpu.train.cli import main

    main()
