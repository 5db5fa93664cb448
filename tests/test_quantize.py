"""int8 weight-only quantization: fidelity + argmax stability."""

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import tiny_nano_config, tiny_qwen2_config
from timeviper_tpu.models.nano import init_nano_params, nano_forward
from timeviper_tpu.models.qwen2 import init_qwen2_params, qwen2_forward
from timeviper_tpu.train.quantize import quantize_params_int8


def test_nano_int8_argmax_stable():
    cfg = tiny_nano_config()
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qp = quantize_params_int8(params, min_size=1)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, cfg.vocab_size)
    o1 = np.asarray(nano_forward(params, cfg, input_ids=ids)["logits"])
    o2 = np.asarray(nano_forward(qp, cfg, input_ids=ids)["logits"])
    rel = np.abs(o1 - o2) / (np.abs(o1) + 1)
    assert rel.mean() < 0.01, rel.mean()
    assert (o1.argmax(-1) == o2.argmax(-1)).mean() > 0.9


def test_qwen2_int8_runs():
    cfg = tiny_qwen2_config()
    params = init_qwen2_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qp = quantize_params_int8(params, min_size=1)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    o = np.asarray(qwen2_forward(qp, cfg, input_ids=ids)["logits"])
    assert np.isfinite(o).all()


def test_quantized_leaves_structure():
    cfg = tiny_nano_config()
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qp = quantize_params_int8(params, min_size=1)
    m = qp["layers"][0]["mixer"]["in_proj"]["x"]
    assert "kernel_q" in m and m["kernel_q"].dtype == jnp.int8
    assert "kernel_scale" in m and "kernel" not in m
    # embeddings stay full precision
    assert qp["embeddings"].dtype == params["embeddings"].dtype
