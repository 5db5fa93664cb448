"""Attention vs. naive softmax reference; ToMe vs. a numpy port of the
reference algorithm (tome.py:14-147)."""

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.ops.attention import attention, causal_self_attention, make_attention_mask
from timeviper_tpu.ops.rope import apply_rope, rope_cos_sin
from timeviper_tpu.ops.tome import merge_schedule, tome_merge


def naive_attention(q, k, v, mask=None):
    B, Lq, Hq, D = q.shape
    Hkv = k.shape[2]
    rep = Hq // Hkv
    kr = np.repeat(k, rep, axis=2)
    vr = np.repeat(v, rep, axis=2)
    logits = np.einsum("bqhd,bkhd->bhqk", q, kr) / np.sqrt(D)
    if mask is not None:
        logits = np.where(mask[:, None], logits, -1e30)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", w, vr)


def test_attention_gqa_matches_naive():
    rng = np.random.RandomState(0)
    q = rng.randn(2, 6, 4, 8).astype(np.float32)
    k = rng.randn(2, 9, 2, 8).astype(np.float32)
    v = rng.randn(2, 9, 2, 8).astype(np.float32)
    mask = rng.rand(2, 6, 9) > 0.3
    mask[:, :, 0] = True  # avoid fully-masked rows
    out = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
                    precision=jax.lax.Precision.HIGHEST)
    ref = naive_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    # default precision may use bf16 passes (the TPU-normal mode) — loose check
    out_def = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out_def), ref, rtol=0.05, atol=0.02)


def test_causal_packed_isolation():
    """Packed attention: a segment's outputs are unchanged by other segments."""
    rng = np.random.RandomState(1)
    q = rng.randn(1, 12, 2, 8).astype(np.float32)
    seg = jnp.asarray(np.array([[0] * 5 + [1] * 7]))
    out = causal_self_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
                                segment_ids=seg)
    out2 = causal_self_attention(jnp.asarray(q[:, 5:]), jnp.asarray(q[:, 5:]),
                                 jnp.asarray(q[:, 5:]))
    np.testing.assert_allclose(np.asarray(out)[:, 5:], np.asarray(out2),
                               rtol=1e-4, atol=1e-5)


def test_decode_mask_positions():
    mask = make_attention_mask(
        1, 8, causal=True,
        q_positions=jnp.asarray([[4]]),
        kv_positions=jnp.arange(8)[None],
        kv_valid=jnp.asarray(np.arange(8) < 5)[None],
    )
    assert mask.shape == (1, 1, 8)
    np.testing.assert_array_equal(np.asarray(mask)[0, 0],
                                  [True] * 5 + [False] * 3)


def test_rope_rotation_property():
    """RoPE preserves inner products under equal position shifts."""
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 4, 2, 16).astype(np.float32))
    for shift in (0, 3):
        pos = jnp.arange(4)[None] + shift
        cos, sin = rope_cos_sin(pos, 16, 10000.0)
        qr = apply_rope(q, cos, sin)
        if shift == 0:
            base = np.einsum("blhd,bmhd->bhlm", np.asarray(qr), np.asarray(qr))
        else:
            shifted = np.einsum("blhd,bmhd->bhlm", np.asarray(qr), np.asarray(qr))
    np.testing.assert_allclose(base, shifted, rtol=1e-4, atol=1e-4)


# ---- ToMe ----------------------------------------------------------------


def np_bipartite_merge(x, size, metric, r):
    """Direct numpy port of reference tome.py:14-84 (single batch)."""
    m = metric / np.linalg.norm(metric, axis=-1, keepdims=True)
    a, b = m[::2], m[1::2]
    scores = a @ b.T
    node_max = scores.max(-1)
    node_idx = scores.argmax(-1)
    edge_idx = np.argsort(-node_max, kind="stable")
    unm_idx, src_idx = edge_idx[r:], edge_idx[:r]
    dst_idx = node_idx[src_idx]
    xs = x * size
    src_x, dst_x = xs[::2].copy(), xs[1::2].copy()
    src_s, dst_s = size[::2].copy(), size[1::2].copy()
    for i, d in enumerate(dst_idx):
        dst_x[d] += src_x[src_idx[i]]
        dst_s[d] += src_s[src_idx[i]]
    xm = np.concatenate([src_x[unm_idx], dst_x], 0)
    sm = np.concatenate([src_s[unm_idx], dst_s], 0)
    return xm / sm, sm


def test_tome_matches_numpy_port():
    rng = np.random.RandomState(3)
    T, C, head = 36, 16, 4
    x = rng.randn(2, T, C).astype(np.float32)
    target = 6
    out = tome_merge(jnp.asarray(x), target, num_attention_heads=head)
    # numpy reference per batch
    for bi in range(2):
        xb = x[bi].astype(np.float64)
        size = np.ones((xb.shape[0], 1))
        for r in merge_schedule(T, target):
            p = xb.shape[0]
            metric = xb.reshape(p, head, C // head).mean(1)
            xb, size = np_bipartite_merge(xb, size, metric, r)
        np.testing.assert_allclose(np.asarray(out)[bi], xb, rtol=1e-3, atol=1e-3)


def test_merge_schedule():
    # 729 -> 16 the production path: halves until within reach
    sched = merge_schedule(729, 16)
    p = 729
    for r in sched:
        p -= r
    assert p == 16
    assert merge_schedule(32, 16) == [16]


def test_vit_whole_frame_attention_matches_oracle():
    """Pallas whole-frame ViT attention (interpret) vs the jnp oracle,
    incl. token padding (T=100 -> pad 128) and head_dim padding (hd=24)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from timeviper_tpu.ops.attention import attention
    from timeviper_tpu.ops.vit_attention import vit_attention

    B, T, H, hd = 2, 100, 3, 24
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k[0], (B, T, H, hd), jnp.float32)
    kx = jax.random.normal(k[1], (B, T, H, hd), jnp.float32)
    v = jax.random.normal(k[2], (B, T, H, hd), jnp.float32)
    got = vit_attention(q, kx, v, interpret=True)
    want = attention(q, kx, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_vit_attention_qkv_fused_layout_matches_oracle():
    """Zero-relayout kernel reading the fused (B, T, 3*H*hd) qkv projection
    output (interpret) vs splitting heads and running the jnp oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from timeviper_tpu.ops.attention import attention
    from timeviper_tpu.ops.vit_attention import (
        qkv_kernel_supported, vit_attention_qkv)

    B, T, H, hd = 2, 100, 2, 64  # H*hd = 128: the kernel's column alignment
    assert qkv_kernel_supported(T, H, hd, itemsize=4)
    qkv = jax.random.normal(jax.random.PRNGKey(7), (B, T, 3 * H * hd),
                            jnp.float32)
    got = vit_attention_qkv(qkv, H, hd, interpret=True)
    q, k, v = jnp.split(qkv.reshape(B, T, 3, H, hd), 3, axis=2)
    want = attention(q[:, :, 0], k[:, :, 0], v[:, :, 0]).reshape(B, T, H * hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_vit_attention_qkv_multi_row_block():
    """The production SigLIP shape (T=729, H*hd=1152, bf16) needs several
    query row blocks per program grid (VMEM budget) plus tail padding —
    exercise that path in interpret mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from timeviper_tpu.ops.attention import attention
    from timeviper_tpu.ops.vit_attention import (
        _qkv_row_block, vit_attention_qkv)

    B, T, H, hd = 1, 729, 16, 72
    assert _qkv_row_block(T, H * hd, 2) not in (None, -(-T // 8) * 8), (
        "shape no longer exercises multiple row blocks; pick a bigger one")
    qkv = (jax.random.normal(jax.random.PRNGKey(9), (B, T, 3 * H * hd),
                             jnp.float32) * 0.5).astype(jnp.bfloat16)
    got = vit_attention_qkv(qkv, H, hd, interpret=True).astype(jnp.float32)
    q, k, v = jnp.split(qkv.reshape(B, T, 3, H, hd), 3, axis=2)
    want = attention(q[:, :, 0], k[:, :, 0], v[:, :, 0]).astype(
        jnp.float32).reshape(B, T, H * hd)
    g, w = np.asarray(got), np.asarray(want)
    rms = np.sqrt(((g - w) ** 2).mean()) / (np.sqrt((w ** 2).mean()) + 1e-9)
    assert rms < 3e-2, rms


def test_encoder_attention_qkv_dispatch_fallback():
    """Unaligned head layouts (H*hd % 128 != 0) must fall back to the
    head-split path and still match the oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from timeviper_tpu.ops.attention import attention
    from timeviper_tpu.ops.vit_attention import encoder_attention_qkv

    B, T, H, hd = 2, 50, 3, 24
    qkv = jax.random.normal(jax.random.PRNGKey(8), (B, T, 3 * H * hd),
                            jnp.float32)
    got = encoder_attention_qkv(qkv, H, hd)
    q, k, v = jnp.split(qkv.reshape(B, T, 3, H, hd), 3, axis=2)
    want = attention(q[:, :, 0], k[:, :, 0], v[:, :, 0]).reshape(B, T, H * hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
