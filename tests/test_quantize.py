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


def test_vit_int8_both_paths_match_bf16(monkeypatch):
    """The ViT understands int8 kernels on both dispatch branches:
    weight-only dequant (CPU default) and the calibrated static-scale
    W8A8 path (TPU default, forced here via TIMEVIPER_VIT_INT8_MXU)."""
    from timeviper_tpu.config import tiny_vit_config
    from timeviper_tpu.models.vit import init_vit_params, vit_forward
    from timeviper_tpu.train.quantize import calibrate_act_scales

    cfg = tiny_vit_config()
    params = init_vit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qp = quantize_params_int8(params, min_size=1)
    px = jax.random.normal(jax.random.PRNGKey(2), (2, 28, 28, 3), jnp.float32)
    qp = calibrate_act_scales(
        lambda p, b: vit_forward(p, cfg, b), qp, [px])
    # every executed block got an act_inv (forward runs L-1 blocks)
    n_cal = sum("act_inv" in l[m][k]
                for l in qp["layers"] for m, k in
                (("attn", "qkv"), ("attn", "proj"),
                 ("mlp", "fc1"), ("mlp", "fc2")))
    assert n_cal == 4 * (cfg.num_hidden_layers - 1), n_cal

    ref = np.asarray(vit_forward(params, cfg, px), np.float32)
    rms = float(np.sqrt((ref ** 2).mean()))
    for mode in ("0", "1"):
        monkeypatch.setenv("TIMEVIPER_VIT_INT8_MXU", mode)
        out = np.asarray(vit_forward(qp, cfg, px), np.float32)
        err = float(np.sqrt(((out - ref) ** 2).mean())) / rms
        assert err < 0.05, (mode, err)


def test_quantized_leaves_structure():
    cfg = tiny_nano_config()
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qp = quantize_params_int8(params, min_size=1)
    m = qp["layers"][0]["mixer"]["in_proj"]["x"]
    assert "kernel_q" in m and m["kernel_q"].dtype == jnp.int8
    assert "kernel_scale" in m and "kernel" not in m
    # embeddings stay full precision
    assert qp["embeddings"].dtype == params["embeddings"].dtype


def test_w8a8_static_scale_matches_oracle():
    """apply_linear_w8a8's int8-MXU branch == explicit quant/dequant math,
    and a saturating activation clips instead of overflowing."""
    from timeviper_tpu.ops.int8_linear import apply_linear_w8a8

    k = jax.random.split(jax.random.PRNGKey(0), 2)
    M, K, N = 70, 256, 130
    x = jax.random.normal(k[0], (M, K), jnp.float32)
    w = jax.random.normal(k[1], (K, N), jnp.float32) * 0.05
    amax = jnp.abs(w).max(0)
    ws = jnp.where(amax > 0, amax / 127.0, 1.0)
    wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
    act_inv = jnp.asarray(127.0 / float(jnp.abs(x).max()), jnp.float32)
    p = {"kernel_q": wq, "kernel_scale": ws, "act_inv": act_inv,
         "bias": None}

    got = np.asarray(apply_linear_w8a8(p, x, use_int8_mxu=True))
    xq = jnp.clip(jnp.round(x * act_inv), -127, 127)
    want = np.asarray((xq @ wq.astype(jnp.float32)) * (ws / act_inv))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # ~1% of the unquantized product
    ref = np.asarray(x @ w)
    rms = np.sqrt((ref ** 2).mean())
    assert np.sqrt(((got - ref) ** 2).mean()) / rms < 0.02
    # out-of-calibration activations saturate finitely (5x the range)
    out = np.asarray(apply_linear_w8a8(p, x * 5.0, use_int8_mxu=True))
    assert np.isfinite(out).all()


def test_nano_w8a8_calibrated_matches_weight_only(monkeypatch):
    """The nano backbone understands calibrated W8A8 leaves on both
    dispatch branches: forced int8-MXU (TIMEVIPER_LLM_INT8_MXU=1, the TPU
    serving path) stays within tolerance of the exact weight-only dequant
    path, with logits argmax stable."""
    from timeviper_tpu.train.quantize import calibrate_act_scales

    cfg = tiny_nano_config()
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qp = quantize_params_int8(params, min_size=1)
    emb = jax.random.normal(
        jax.random.PRNGKey(2), (1, 16, cfg.hidden_size), jnp.float32) * 0.1
    qp = calibrate_act_scales(
        lambda p, e: nano_forward(p, cfg, inputs_embeds=e)["logits"],
        qp, [emb])
    def count_act_inv(node):
        if isinstance(node, dict):
            return ("act_inv" in node) + sum(
                count_act_inv(v) for v in node.values())
        if isinstance(node, list):
            return sum(count_act_inv(v) for v in node)
        return 0

    assert count_act_inv(qp) > 0

    monkeypatch.setenv("TIMEVIPER_LLM_INT8_MXU", "0")
    ref = np.asarray(nano_forward(qp, cfg, inputs_embeds=emb)["logits"])
    monkeypatch.setenv("TIMEVIPER_LLM_INT8_MXU", "1")
    got = np.asarray(nano_forward(qp, cfg, inputs_embeds=emb)["logits"])
    rms = float(np.sqrt((ref ** 2).mean()))
    err = float(np.sqrt(((got - ref) ** 2).mean())) / rms
    assert err < 0.05, err
    assert (ref.argmax(-1) == got.argmax(-1)).mean() > 0.9


def test_fuse_decode_in_proj_parity():
    """fuse_decode_in_proj: the single fused in_proj matmul must reproduce
    the split-leaf forward/prefill/decode exactly (plain f32) and at int8
    tolerance (quantized leaves; shared activation scale fuses as min)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from timeviper_tpu.config import tiny_nano_config
    from timeviper_tpu.models.nano import (
        init_nano_params,
        nano_decode_step,
        nano_forward,
    )
    from timeviper_tpu.train.quantize import (
        fuse_decode_in_proj,
        quantize_params_int8,
    )

    cfg = tiny_nano_config()
    p = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = jnp.asarray([[5, 6, 7, 8, 9, 10]])
    ref = nano_forward(p, cfg, input_ids=ids, fill_cache=True,
                       cache_max_len=16)
    pf = fuse_decode_in_proj(p)
    got = nano_forward(pf, cfg, input_ids=ids, fill_cache=True,
                       cache_max_len=16)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-6, atol=1e-6)
    l1, _ = nano_decode_step(p, cfg, jnp.asarray([[3]]), ref["cache"])
    l2, _ = nano_decode_step(pf, cfg, jnp.asarray([[3]]), got["cache"])
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               rtol=1e-6, atol=1e-6)

    # quantized leaves (force min_size 0 so tiny kernels quantize)
    q = quantize_params_int8(p, min_size=0)
    qf = fuse_decode_in_proj(q)
    lq1 = nano_forward(q, cfg, input_ids=ids)["logits"]
    lq2 = nano_forward(qf, cfg, input_ids=ids)["logits"]
    np.testing.assert_allclose(np.asarray(lq2), np.asarray(lq1),
                               rtol=1e-5, atol=1e-5)
