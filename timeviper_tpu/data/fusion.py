"""Host-side fusion planning: where visual tokens go in the fused sequence.

The reference splices visual embeddings into the text embedding stream at
`<image>` placeholder positions with dynamic python tensor surgery
(generic_vlm.py:517-664). Under jit, shapes must be static — so the *plan*
(a gather index array + static layout) is computed here on the host from
input_ids, and the jitted model applies one `jnp.take`. One `<image>`
placeholder expands to one frame's `tokens_per_frame` projected tokens.

The same plan drives packing (block-diagonal seq_idx, per-sample position
ids; generic_vlm.py:593-660) and pdrop layouts (sample boundaries +
vision spans, modeling_nano.py:1779+).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

IGNORE_INDEX = -100


@dataclass(frozen=True)
class FusionPlan:
    """Static plan for fusing one (possibly packed) row.

    gather_idx[i] indexes into concat([text_embeds (Lt), visual_flat (Nv)]):
    values < Lt are text positions, >= Lt are visual token indices + Lt.
    """

    fused_len: int
    text_len: int
    num_visual: int
    gather_idx: np.ndarray  # (fused_len,) int32
    is_visual: np.ndarray  # (fused_len,) bool
    seq_idx: Optional[np.ndarray]  # (fused_len,) int32 or None
    position_ids: np.ndarray  # (fused_len,) int32 (restart per sample)
    # per-sample pdrop layout: (vision_start, num_vision, text_suffix)
    sample_layouts: Tuple[Tuple[int, int, int], ...]

    @property
    def cache_key(self):
        """Hashable identity for jit-program caches."""
        return (self.fused_len, self.text_len, self.num_visual,
                self.sample_layouts)


def plan_fusion(
    input_ids: Sequence[int],
    image_token_id: int,
    tokens_per_frame: int,
    txt_seq_lens: Optional[Sequence[int]] = None,
) -> FusionPlan:
    """Build the fusion plan for one row.

    input_ids: the tokenized row; each `image_token_id` occurrence stands for
    one frame. txt_seq_lens: packed per-sample token lengths (including their
    image placeholders); None/single entry = unpacked.
    """
    ids = np.asarray(input_ids, np.int64)
    Lt = len(ids)
    if txt_seq_lens is None:
        txt_seq_lens = [Lt]
    assert sum(txt_seq_lens) == Lt, (sum(txt_seq_lens), Lt)

    gather: List[int] = []
    seq: List[int] = []
    pos: List[int] = []
    layouts: List[Tuple[int, int, int]] = []
    vis_counter = 0
    text_off = 0
    for si, tl in enumerate(txt_seq_lens):
        sample = ids[text_off : text_off + tl]
        img_pos = np.nonzero(sample == image_token_id)[0]
        n_img = len(img_pos)
        sample_start_fused = len(gather)
        if n_img == 0:
            vision_start, num_vision = tl, 0
            for j in range(tl):
                gather.append(text_off + j)
        else:
            first, last = int(img_pos[0]), int(img_pos[-1])
            assert np.all(np.diff(img_pos) == 1), (
                "interleaved vision tokens not supported (matches reference "
                "generic_vlm.py:560 contiguous-<image>-block assumption)")
            vision_start = first
            num_vision = n_img * tokens_per_frame
            for j in range(first):
                gather.append(text_off + j)
            for v in range(num_vision):
                gather.append(Lt + vis_counter + v)
            vis_counter += num_vision
            for j in range(last + 1, tl):
                gather.append(text_off + j)
        fused_sample_len = len(gather) - sample_start_fused
        text_suffix = fused_sample_len - vision_start - num_vision
        layouts.append((vision_start, num_vision, text_suffix))
        seq.extend([si] * fused_sample_len)
        pos.extend(range(fused_sample_len))
        text_off += tl

    gather_idx = np.asarray(gather, np.int32)
    is_visual = gather_idx >= Lt
    return FusionPlan(
        fused_len=len(gather),
        text_len=Lt,
        num_visual=vis_counter,
        gather_idx=gather_idx,
        is_visual=is_visual,
        seq_idx=np.asarray(seq, np.int32) if len(txt_seq_lens) > 1 else None,
        position_ids=np.asarray(pos, np.int32),
        sample_layouts=tuple(layouts),
    )


@dataclass(frozen=True)
class HeteroPlan:
    """Static SHAPE bundle for a heterogeneous batch: rows carry their own
    (traced) gather/segment arrays, only the padded dims are compile-time.

    Lifts the reference's per-row ragged splicing (generic_vlm.py:517-564,
    data.py:598-671) into a bucket: rows with different image-token layouts
    batch together; each row's fusion plan travels as data (`gather_idx`,
    `seq_idx` arrays in the batch dict), so ONE compiled program serves
    every layout mix at these dims.
    """

    fused_len: int
    text_len: int
    num_visual: int  # padded flat visual-token capacity (frames * tpf)
    num_frames: int  # padded frame capacity

    @property
    def cache_key(self):
        return self

    # make_pdrop_spec needs static layouts; hetero rows have none
    sample_layouts: Tuple = ()


def pad_row_plan(
    plan: FusionPlan,
    text_len: int,
    fused_len: int,
    num_visual: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Remap one row's plan into the padded batch coordinate system.

    Returns (gather_idx (fused_len,), seq_idx (fused_len,)): visual indices
    shift from `plan.text_len` to `text_len` base; the pad tail points at
    text slot 0 under a fresh segment id, so SSD state resets and attention
    segment-masks isolate it (pads are trailing — nothing real follows).
    """
    g = plan.gather_idx.astype(np.int64)
    g = np.where(plan.is_visual, g - plan.text_len + text_len, g)
    seq = (
        plan.seq_idx.astype(np.int64)
        if plan.seq_idx is not None
        else np.zeros((plan.fused_len,), np.int64)
    )
    pad = fused_len - plan.fused_len
    assert pad >= 0 and text_len >= plan.text_len
    assert num_visual >= plan.num_visual
    if pad:
        g = np.concatenate([g, np.zeros((pad,), np.int64)])
        seq = np.concatenate([seq, np.full((pad,), seq.max() + 1)])
    return g.astype(np.int32), seq.astype(np.int32)


def fuse_labels(plan: FusionPlan, labels: Sequence[int]) -> np.ndarray:
    """Expand per-token labels to the fused layout; visual spans get IGNORE
    (generic_vlm.py:545-563)."""
    lab = np.asarray(labels, np.int64)
    out = np.full((plan.fused_len,), IGNORE_INDEX, np.int64)
    text_mask = ~plan.is_visual
    out[text_mask] = lab[plan.gather_idx[text_mask]]
    return out
