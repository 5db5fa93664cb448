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
