"""Golden parity of visual-token fusion vs the LIVE reference splicing.

The reference splices visual embeddings into the text stream with dynamic
per-row tensor surgery (`get_fused_data_nopacked` generic_vlm.py:517-564,
`get_fused_data_packed` :593-636) and builds packed position/segment ids in
`get_attention_mask_packed` (:639-662). Our redesign plans the fusion on
the host (`data/fusion.py:plan_fusion`) and applies ONE static `jnp.take`
in-graph (`models/vlm.py:fuse_embeddings`). These must produce identical
fused streams or every downstream logit diverges.

The reference methods are extracted from the live source via `ast` (they
touch only `self.default_token_id`, `self.llm_backbone.embed_input_ids`,
and the attn-impl flag), so the byte-identical reference code runs against
a fake `self` — importing generic_vlm wholesale would drag in timm/CUDA.

Known-divergence note (asserted below): the reference concatenates ALL
vision IGNORE labels at the FRONT of the per-sample label stream
(generic_vlm.py:545-563 "Only support multi-round conversations") rather
than positionally; ours (`fuse_labels`) is positional. The two agree
exactly whenever the text prefix before the vision block is label-masked —
which the training pipeline guarantees (prompt tokens are IGNORE).
"""

from __future__ import annotations

import ast
import os
import types

import numpy as np
import pytest

from timeviper_tpu.data.fusion import IGNORE_INDEX, fuse_labels, plan_fusion

REF_VLM = "/root/reference/timeviper/model/generic_vlm.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_VLM), reason="reference tree not mounted")

IMG = 9      # <image> token id
VOCAB = 64
D = 16


@pytest.fixture(scope="module")
def ref():
    """Extract the live reference fusion methods + build a fake self."""
    import torch

    src = open(REF_VLM).read()
    tree = ast.parse(src)
    cls = next(n for n in tree.body
               if isinstance(n, ast.ClassDef)
               and n.name == "GenericTimeViperVLM")
    wanted = {"get_fused_data_nopacked", "get_fused_data_packed",
              "get_attention_mask_packed"}
    ns = {"torch": torch, "IGNORE_INDEX": IGNORE_INDEX}
    for node in cls.body:
        if isinstance(node, ast.FunctionDef) and node.name in wanted:
            exec(compile(ast.Module(body=[node], type_ignores=[]),
                         REF_VLM, "exec"), ns)
    assert wanted <= set(ns), "reference methods moved — update extraction"

    g = torch.Generator().manual_seed(0)
    table = torch.randn((VOCAB, D), generator=g)

    fake = types.SimpleNamespace(
        default_token_id=IMG,
        llm_backbone=types.SimpleNamespace(
            embed_input_ids=lambda ids: table[ids],
            llm=types.SimpleNamespace(config=types.SimpleNamespace(
                _attn_implementation="flash_attention_2")),
        ),
    )
    for name in wanted:
        setattr(fake, name, ns[name].__get__(fake))
    return types.SimpleNamespace(self=fake, table=table, torch=torch)


def _ours_fused(ids, visual, table, tokens_per_frame, txt_seq_lens=None):
    """Apply the production plan exactly as models/vlm.py:fuse_embeddings:
    gather over concat([text_embeds, visual_flat])."""
    plan = plan_fusion(ids, IMG, tokens_per_frame, txt_seq_lens)
    text = table[np.asarray(ids)]
    src = np.concatenate([text, visual.reshape(-1, visual.shape[-1])], 0)
    return plan, src[plan.gather_idx]


def _row(rng, prefix, n_img, suffix):
    """Token row: text prefix, contiguous <image> block, text suffix."""
    t = rng.integers(10, VOCAB, size=prefix + suffix)
    return np.concatenate(
        [t[:prefix], np.full(n_img, IMG), t[prefix:]]).astype(np.int64)


@pytest.mark.parametrize("prefix,n_img,suffix,tpf", [
    (5, 1, 7, 4),    # single image
    (3, 6, 11, 4),   # multi-frame video block
    (0, 2, 9, 3),    # row starts with the vision block
])
def test_nopacked_fused_embeddings_match(ref, prefix, n_img, suffix, tpf):
    rng = np.random.default_rng(prefix * 100 + n_img)
    ids = _row(rng, prefix, n_img, suffix)
    visual = rng.standard_normal((n_img, tpf, D)).astype(np.float32)

    r_fused, _ = ref.self.get_fused_data_nopacked(
        visual_embeddings=ref.torch.from_numpy(visual),
        input_ids=ref.torch.from_numpy(ids)[None],
        labels=None,
    )
    _, ours = _ours_fused(ids, visual, ref.table.numpy(), tpf)
    np.testing.assert_allclose(r_fused[0].numpy(), ours, rtol=0, atol=0)


def test_nopacked_labels_match_when_prefix_masked(ref):
    """Positional (ours) == front-loaded (reference) label fusion whenever
    the pre-vision prefix is IGNORE — the pipeline's invariant."""
    rng = np.random.default_rng(7)
    prefix, n_img, suffix, tpf = 4, 3, 8, 4
    ids = _row(rng, prefix, n_img, suffix)
    labels = ids.copy()
    labels[:prefix + n_img] = IGNORE_INDEX  # prompt + placeholders masked
    visual = rng.standard_normal((n_img, tpf, D)).astype(np.float32)

    _, r_labels = ref.self.get_fused_data_nopacked(
        visual_embeddings=ref.torch.from_numpy(visual),
        input_ids=ref.torch.from_numpy(ids)[None],
        labels=ref.torch.from_numpy(labels)[None],
    )
    plan = plan_fusion(ids, IMG, tpf)
    ours = fuse_labels(plan, labels)
    np.testing.assert_array_equal(r_labels[0].numpy(), ours)


def test_packed_split_case_matches(ref):
    """Case 2 (generic_vlm.py:612): one packed row of multiple conversations,
    each owning its images — visual embeddings split across samples."""
    rng = np.random.default_rng(11)
    tpf = 4
    rows = [_row(rng, 3, 2, 6), _row(rng, 5, 4, 2), _row(rng, 2, 1, 9)]
    vis_nums = [2, 4, 1]
    txt_seq_lens = [len(r) for r in rows]
    ids = np.concatenate(rows)
    labels = ids.copy()
    off = 0
    for r, (p, n) in zip(rows, [(3, 2), (5, 4), (2, 1)]):
        labels[off:off + p + n] = IGNORE_INDEX
        off += len(r)
    visual = rng.standard_normal((sum(vis_nums), tpf, D)).astype(np.float32)

    t = ref.torch
    ids_t = t.from_numpy(ids)
    r_fused, r_labels = ref.self.get_fused_data_packed(
        t.from_numpy(visual),
        t.split(ids_t, txt_seq_lens),
        t.from_numpy(labels)[None],
        [t.tensor(v) for v in vis_nums],
        txt_seq_lens,
    )
    plan, ours = _ours_fused(ids, visual, ref.table.numpy(), tpf,
                             txt_seq_lens)
    np.testing.assert_allclose(r_fused[0].numpy(), ours, rtol=0, atol=0)
    np.testing.assert_array_equal(r_labels[0].numpy(),
                                  fuse_labels(plan, labels))

    # packed position/segment ids (get_attention_mask_packed :639-662)
    vis_seq_lens = [v * tpf for v in vis_nums]
    true_text = [tl - v for tl, v in zip(txt_seq_lens, vis_nums)]
    pos, mask, _, seq_idx = ref.self.get_attention_mask_packed(
        vis_seq_lens, true_text, plan.fused_len, "cpu")
    assert mask is None  # flash path, like our segment-mask kernels
    np.testing.assert_array_equal(pos[0].numpy(), plan.position_ids)
    np.testing.assert_array_equal(seq_idx[0].numpy(), plan.seq_idx)


def test_packed_duplicate_case_matches(ref):
    """Case 1 (generic_vlm.py:608): one video shared by several packed
    conversation rounds — the reference duplicates the visual embeddings
    per sample; our pipeline performs the same duplication on the host."""
    rng = np.random.default_rng(13)
    tpf = 3
    n_img = 2
    rows = [_row(rng, 4, n_img, 5), _row(rng, 2, n_img, 7)]
    txt_seq_lens = [len(r) for r in rows]
    ids = np.concatenate(rows)
    visual = rng.standard_normal((n_img, tpf, D)).astype(np.float32)

    t = ref.torch
    r_fused, _ = ref.self.get_fused_data_packed(
        t.from_numpy(visual),
        t.split(t.from_numpy(ids), txt_seq_lens),
        t.from_numpy(np.full_like(ids, IGNORE_INDEX))[None],
        [t.tensor(n_img), t.tensor(n_img)],
        txt_seq_lens,
    )
    dup = np.concatenate([visual, visual], 0)  # host-side duplication
    _, ours = _ours_fused(ids, dup, ref.table.numpy(), tpf, txt_seq_lens)
    np.testing.assert_allclose(r_fused[0].numpy(), ours, rtol=0, atol=0)
