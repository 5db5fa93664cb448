from timeviper_tpu.serving.engine import ServingEngine, Request  # noqa: F401
