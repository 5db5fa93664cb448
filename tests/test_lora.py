"""LoRA: zero-init equivalence, training delta, merge, state split."""

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import tiny_nano_config
from timeviper_tpu.models.nano import init_nano_params, nano_forward
from timeviper_tpu.train.lora import (
    add_lora,
    lora_trainable_mask,
    merge_lora,
    split_lora_state,
)

CFG = tiny_nano_config()


def test_lora_zero_init_is_identity():
    params = init_nano_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, CFG.vocab_size)
    base = nano_forward(params, CFG, input_ids=ids)["logits"]
    lp = add_lora({"llm_backbone": params}, rank=4)["llm_backbone"]
    wrapped = nano_forward(lp, CFG, input_ids=ids)["logits"]
    np.testing.assert_allclose(np.asarray(base), np.asarray(wrapped),
                               rtol=1e-6, atol=1e-6)


def test_lora_changes_output_after_b_update_and_merge_matches():
    params = init_nano_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    lp = add_lora({"llm_backbone": params}, rank=4,
                  key=jax.random.PRNGKey(2))["llm_backbone"]
    # poke one lora_b to nonzero
    mixer = lp["layers"][0]["mixer"]["in_proj"]["x"]
    mixer["lora_b"] = jnp.ones_like(mixer["lora_b"]) * 0.05
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, CFG.vocab_size)
    base = nano_forward(params, CFG, input_ids=ids)["logits"]
    out = nano_forward(lp, CFG, input_ids=ids)["logits"]
    assert not np.allclose(np.asarray(base), np.asarray(out))
    merged = merge_lora(lp)
    m_out = nano_forward(merged, CFG, input_ids=ids)["logits"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(m_out),
                               rtol=2e-4, atol=2e-4)
    # merged params carry no lora leaves
    leaves = jax.tree_util.tree_flatten_with_path(merged)[0]
    assert not any("lora" in "/".join(map(str, p)) for p, _ in leaves)


def test_split_and_mask():
    params = init_nano_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    lp = add_lora({"llm_backbone": params}, rank=4)
    lora, non_lora = split_lora_state(lp)
    assert lora and non_lora
    assert all("lora" in k for k in lora)
    mask = lora_trainable_mask(lp)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    trainable = [p for p, v in flat if v]
    assert trainable and all(
        "lora_a" in "/".join(map(str, p)) or "lora_b" in "/".join(map(str, p))
        for p in trainable
    )


# --------------------------- QLoRA (int8 base) ---------------------------


def _quantized_base():
    from timeviper_tpu.train.quantize import quantize_params_int8

    params = init_nano_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    return quantize_params_int8(params, min_size=0)


def test_qlora_zero_init_is_identity():
    qparams = _quantized_base()
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, CFG.vocab_size)
    base = nano_forward(qparams, CFG, input_ids=ids)["logits"]
    lp = add_lora({"llm_backbone": qparams}, rank=4,
                  dtype=jnp.float32)["llm_backbone"]
    # factors actually planted next to int8 leaves
    leaves = jax.tree_util.tree_flatten_with_path(lp)[0]
    paths = {"/".join(str(getattr(k, "key", getattr(k, "idx", "")))
                      for k in p) for p, _ in leaves}
    assert any(p.endswith("mixer/in_proj/x/lora_a") for p in paths), paths
    wrapped = nano_forward(lp, CFG, input_ids=ids)["logits"]
    np.testing.assert_allclose(np.asarray(base), np.asarray(wrapped),
                               rtol=1e-6, atol=1e-6)


def test_qlora_grads_flow_only_to_factors_and_merge_matches():
    import optax

    qparams = _quantized_base()
    lp = add_lora({"llm_backbone": qparams}, rank=4,
                  key=jax.random.PRNGKey(2), dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, CFG.vocab_size)

    def loss_fn(p):
        out = nano_forward(p["llm_backbone"], CFG, input_ids=ids)
        lpx = jax.nn.log_softmax(out["logits"][:, :-1].astype(jnp.float32))
        return -jnp.take_along_axis(lpx, ids[:, 1:, None], axis=-1).mean()

    grads = jax.grad(loss_fn, allow_int=True)(lp)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    lora_b_norms = [
        float(jnp.abs(g).sum()) for p, g in flat
        if "lora_b" in "/".join(str(getattr(k, "key", "")) for k in p)
    ]
    assert lora_b_norms and any(n > 0 for n in lora_b_norms)
    # int8 leaves produce float0 tangents — maskable, no real grad
    n_q = 0
    for p, g in flat:
        if "kernel_q" in "/".join(str(getattr(k, "key", "")) for k in p):
            assert g.dtype == jax.dtypes.float0
            n_q += 1
    assert n_q > 0

    # one masked optimizer step updates only the factors
    mask = lora_trainable_mask(lp)
    tx = optax.masked(optax.sgd(1e-2), mask)
    # optax can't thread float0/int leaves: zero out non-trainable grads
    grads_f = jax.tree_util.tree_map(
        lambda m, g, x: g if m else jnp.zeros_like(x), mask, grads, lp)
    state = tx.init(lp)
    updates, _ = tx.update(grads_f, state, lp)
    lp2 = optax.apply_updates(lp, updates)
    out_before = nano_forward(lp["llm_backbone"], CFG, input_ids=ids)["logits"]
    out_after = nano_forward(lp2["llm_backbone"], CFG, input_ids=ids)["logits"]
    assert not np.allclose(np.asarray(out_before), np.asarray(out_after))

    # exact merge: full-precision kernel (requantize=False)
    merged = merge_lora(lp2)["llm_backbone"]
    m_out = nano_forward(merged, CFG, input_ids=ids)["logits"]
    np.testing.assert_allclose(np.asarray(out_after), np.asarray(m_out),
                               rtol=2e-4, atol=2e-4)
    leaves2 = jax.tree_util.tree_flatten_with_path(merged)[0]
    joined = ["/".join(str(getattr(k, "key", getattr(k, "idx", "")))
                       for k in p) for p, _ in leaves2]
    assert not any("lora" in p for p in joined)
    # LoRA-targeted leaves merged to full precision; untargeted quantized
    # leaves legitimately keep their int8 layout
    assert any(p.endswith("mixer/in_proj/x/kernel") for p in joined)
    assert not any(p.endswith("mixer/in_proj/x/kernel_q") for p in joined)

    # requantized merge keeps the int8 layout, output close to exact
    merged_q = merge_lora(lp2, requantize=True)["llm_backbone"]
    leaves3 = jax.tree_util.tree_flatten_with_path(merged_q)[0]
    joined3 = ["/".join(str(getattr(k, "key", getattr(k, "idx", "")))
                        for k in p) for p, _ in leaves3]
    assert any("kernel_q" in p for p in joined3)
    mq_out = nano_forward(merged_q, CFG, input_ids=ids)["logits"]
    err = float(jnp.max(jnp.abs(mq_out - m_out)))
    ref = float(jnp.max(jnp.abs(m_out))) + 1e-6
    assert err / ref < 0.05, (err, ref)
