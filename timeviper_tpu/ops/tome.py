"""ToMe token merging (bipartite soft matching) in jnp.

TPU-native redesign of the projector-side token compression (reference:
timeviper/model/projector/tome.py:14-177). Every frame's patch tokens are
merged down to `target_num_tokens` through a fixed schedule of bipartite
merge rounds. All shapes are static: the merge schedule is derived from the
(static) token count in Python, and each round is a fixed-size top-k +
gather/scatter — exactly the shape discipline XLA wants.

Semantics match `bipartite_soft_matching` + `merge_wavg`: tokens are split
into even ("src"/a) and odd ("dst"/b) sets; each src token's best cosine
match in dst is scored; the r highest-scoring src tokens are merged
(size-weighted average) into their matched dst token; output order is
[unmerged src (by descending score), dst], matching the torch `torch.cat`
ordering so converted checkpoints see identical token streams.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def merge_schedule(num_tokens: int, target: int) -> List[int]:
    """The per-round merge counts (reference tome.py:118-139). Empty when
    already at or below target (merge is a no-op)."""
    if num_tokens <= target:
        return []
    r_list = []
    p = num_tokens
    while p != target:
        if p - target <= p // 2:
            r_list.append(p - target)
            break
        r_list.append(p // 2)
        p = p - p // 2
    return r_list


def _bipartite_merge_round(
    x: jax.Array, size: jax.Array, metric: jax.Array, r: int
) -> Tuple[jax.Array, jax.Array]:
    """One ToMe round. x: (B, T, C); size: (B, T, 1); metric: (B, T, Cm).

    Returns merged (B, T - r, C) and sizes (B, T - r, 1), float32 math.
    """
    B, T, C = x.shape
    t_a = (T + 1) // 2  # even indices
    t_b = T // 2
    r = min(r, T // 2)

    m = metric / (jnp.linalg.norm(metric, axis=-1, keepdims=True) + 1e-6)
    a, b = m[:, ::2], m[:, 1::2]
    scores = jnp.einsum(
        "bic,bjc->bij", a, b, precision=jax.lax.Precision.HIGHEST
    )  # (B, t_a, t_b)

    node_max = jnp.max(scores, axis=-1)
    node_idx = jnp.argmax(scores, axis=-1)  # (B, t_a) best dst per src
    # stable descending sort to mirror torch argsort(descending=True)
    order = jnp.argsort(-node_max, axis=-1, stable=True)
    unm_idx = order[:, r:]  # (B, t_a - r) kept src tokens
    src_idx = order[:, :r]  # (B, r) merged src tokens
    dst_idx = jnp.take_along_axis(node_idx, src_idx, axis=-1)  # (B, r)

    xs = x * size  # weighted values
    src_x, dst_x = xs[:, ::2], xs[:, 1::2]
    src_s, dst_s = size[:, ::2], size[:, 1::2]

    # Merge via a one-hot matmul instead of scatter-add: TPU scatters
    # serialize (measured: the scatter formulation made ToMe ~12% of the
    # whole encode). M[b, i, j] = 1 iff src i merges into dst j, i.e. src
    # rank by score < r. The accumulation dst += M^T src is then a batched
    # (t_b, t_a) x (t_a, C) MXU matmul, and duplicate dst targets
    # accumulate exactly as the scatter did.
    rank = jnp.argsort(order, axis=-1)  # inverse permutation: rank by score
    is_merged = (rank < r).astype(jnp.float32)  # (B, t_a)
    onehot = (
        node_idx[:, :, None] == jnp.arange(t_b)[None, None, :]
    ).astype(jnp.float32) * is_merged[:, :, None]  # (B, t_a, t_b)
    dx = dst_x + jnp.einsum("bit,bic->btc", onehot, src_x)
    ds = dst_s + jnp.einsum("bit,bic->btc", onehot, src_s)

    unm_x = jnp.take_along_axis(src_x, unm_idx[..., None], axis=1)
    unm_s = jnp.take_along_axis(src_s, unm_idx[..., None], axis=1)
    return (
        jnp.concatenate([unm_x, dx], axis=1),
        jnp.concatenate([unm_s, ds], axis=1),
    )


def tome_merge(
    x: jax.Array,
    target_num_tokens: int,
    num_attention_heads: int = 16,
    token_order: str = "raw",
) -> jax.Array:
    """Merge (B, T, C) tokens down to (B, target, C).

    `num_attention_heads` controls the metric: per-round metric is the mean
    over head groups of the current tokens (reference tome.py:140-147).
    `token_order` optionally reorders outputs by merged size.
    """
    B, T, C = x.shape
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    size = jnp.ones((B, T, 1), jnp.float32)
    head = num_attention_heads
    for r in merge_schedule(T, target_num_tokens):
        p = xf.shape[1]
        metric = xf.reshape(B, p, head, C // head).mean(axis=2)
        xw, size = _bipartite_merge_round(xf, size, metric, r)
        xf = xw / size
        # keep xf unweighted; next round re-weights by size
    if token_order in ("ascending", "descending"):
        key = size[..., 0]
        order = jnp.argsort(-key if token_order == "descending" else key, axis=-1)
        xf = jnp.take_along_axis(xf, order[..., None], axis=1)
    return xf.astype(dtype)
