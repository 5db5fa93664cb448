"""Generation engine: jit-compiled bucketed prefill + fused decode loop.

TPU re-design of the reference's HF GenerationMixin path
(generic_vlm.py:744-848 + HybridMambaAttentionDynamicCache): instead of a
python decode loop over a dynamically-growing cache, generation is

  1. host: tokenize, plan fusion (data/fusion.py), pick a length bucket;
  2. device: ONE jitted prefill (vision encode chunked into clips →
     projector → fused LLM forward filling a fixed-capacity cache);
  3. device: ONE jitted `lax.while_loop` decode that samples, appends, and
     stops on any terminator id (llm_registry.py init hooks) or max tokens.

Length buckets avoid per-prompt recompiles: the fused row is LEFT-padded to
the bucket with pad ids carrying segment id -1, so Mamba states reset at the
real start (state through pads stays zero) and attention never sees pads
(segment mismatch + cache `valid_from`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.data.fusion import FusionPlan, plan_fusion
from timeviper_tpu.models.vlm import (
    VLMArch,
    decode_step,
    encode_visual,
    vlm_forward,
)  # noqa: F401 — encode_visual re-exported for engine use
from timeviper_tpu.ops.sampling import SamplingParams, sample_token

DEFAULT_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)


def _fused_conv_default() -> bool:
    """Route prefill through the fused conv+SiLU+scan Pallas program
    (ops/ssd_pallas.py ssd_conv_scan_fused). Off by default: measured
    ~2% slower than the separate path at the 9B shape — XLA already
    fuses the unrolled-shift conv into the in_proj epilogue, so the HBM
    round trips the fusion eliminates were largely elided. Kept
    selectable for shapes/toolchains where that fusion fails."""
    import os

    return os.environ.get("TIMEVIPER_FUSED_CONV", "0") == "1"



def pad_text_to_bucket(ids_arr, gather_idx, bucket, pad_token_id):
    """Pad raw text ids to the fused bucket length so prefill executables
    are keyed on the bucket alone — the fusion source is
    concat(text_embeds[Lt], visual), so the visual gather entries
    (>= Lt) shift by the pad amount. Without this, every distinct prompt
    length compiled its own 52-layer program (~25-60 s each through the
    remote helper — the serving bench measured 0.04 req/s from this)."""
    Lt = ids_arr.shape[0]
    if Lt >= bucket:
        return ids_arr, gather_idx
    import numpy as _np

    ids_pad = _np.concatenate(
        [ids_arr, _np.full((bucket - Lt,), pad_token_id, ids_arr.dtype)])
    gidx = _np.asarray(gather_idx)
    gidx = _np.where(gidx >= Lt, gidx + (bucket - Lt), gidx).astype(
        gidx.dtype)
    return ids_pad, gidx


def pick_bucket(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


@dataclasses.dataclass
class GenerationOutput:
    token_ids: np.ndarray  # (num_generated,) includes terminator if emitted
    num_generated: int


@dataclasses.dataclass
class PrefixState:
    """A cached video prefix: the decode cache after prefilling
    `system + <video>` once, reusable across questions on the same video
    (models/prefix_cache.py). `cache` is an immutable pytree — every
    continuation builds new arrays, so one PrefixState serves any number
    of generate(prefix=...) calls."""

    cache: Any
    bucket: int        # prefix rows filled (cache["length"], static)
    cache_len: int     # cache capacity (static)
    suffix_budget: int # max suffix bucket this prefix can absorb
    pad: int = 0       # leading pad rows (valid_from) — ServingEngine slots


def split_prompt_at_last_image(
    input_ids: Sequence[int], image_token_id: int
) -> Tuple[list, list]:
    """(prefix_ids incl. the last <image> token, suffix_ids). The prefix is
    what is shared across questions on one video; the suffix is the
    question + options."""
    ids = list(input_ids)
    last = max(i for i, t in enumerate(ids) if t == image_token_id)
    return ids[: last + 1], ids[last + 1:]


# Process-wide executable cache. Two Generators/ServingEngines with the same
# config must reuse ONE compiled program: besides avoiding recompiles, a
# fresh in-memory compile and a persistent-cache AOT load can differ in the
# last bits (different codegen targets), which flips argmax on near-ties —
# sharing the executable keeps same-process results bitwise reproducible.
_EXECUTABLE_CACHE: Dict[Tuple, Any] = {}


def cached_jit(key: Tuple, make_fn):
    if key not in _EXECUTABLE_CACHE:
        _EXECUTABLE_CACHE[key] = jax.jit(make_fn())
    return _EXECUTABLE_CACHE[key]


class Generator:
    """Holds jitted executables, keyed by static bucket shapes.

    `mesh`: optional `jax.sharding.Mesh`. With a `seq` axis > 1 (and the
    nano backbone), prefill runs sequence-sharded over the mesh
    (parallel/seq_parallel.py) and emits the same decode-ready cache as
    the single-chip path — the multi-chip inference analog of the
    reference's vLLM TP serving (vllm_infer.py:44-60). With a `model`
    axis, pass params already device_put with the TP shardings
    (parallel/sharding.py) and GSPMD partitions prefill and decode.
    """

    def __init__(
        self,
        params: Dict[str, Any],
        arch: VLMArch,
        *,
        terminator_ids: Sequence[int],
        pad_token_id: int = 0,
        max_new_tokens: int = 128,
        sampling: SamplingParams = SamplingParams(),
        clip_size: int = 256,
        cache_dtype=jnp.bfloat16,
        mesh=None,
        speculative: Optional[str] = None,  # "ngram" => prompt-lookup
                                            # speculative decoding
                                            # (models/speculative.py)
        n_draft: int = 7,
    ) -> None:
        self.params = params
        self.arch = arch
        self.terminators = tuple(int(t) for t in terminator_ids)
        self.pad_token_id = pad_token_id
        self.max_new_tokens = max_new_tokens
        self.sampling = sampling
        self.clip_size = clip_size
        self.cache_dtype = cache_dtype
        self.mesh = mesh
        if speculative not in (None, "ngram"):
            raise ValueError(f"unknown speculative mode {speculative!r}")
        self.speculative = speculative
        self.n_draft = n_draft

    @property
    def _seq_shards(self) -> int:
        if self.mesh is None:
            return 1
        return int(self.mesh.shape.get("seq", 1))

    # -- vision ----------------------------------------------------------

    def encode_frames(self, pixels: np.ndarray) -> jax.Array:
        """(F, H, W, 3) -> (F*tokens_per_frame, D); clip-chunked like the
        reference eval path (generic_vlm.py:274-281). With a seq mesh and
        a frame count divisible by it, the encode itself shards over
        devices (each device encodes its span of frames — zero
        collectives, parallel/seq_parallel.py:encode_frames_seq_parallel).
        """
        F = pixels.shape[0]
        nseq = self._seq_shards
        if (nseq > 1 and F % nseq == 0
                and not self.arch.vision_backbones
                and self.arch.vision_family != "internvideo2"):
            from timeviper_tpu.parallel.seq_parallel import (
                encode_frames_seq_parallel,
            )

            key = ("encode_sp", repr(self.arch), F, nseq)

            def make():
                def enc(vp, pp, px):
                    return encode_frames_seq_parallel(
                        vp, pp, self.arch.vision, px, self.mesh,
                        projector_type=self.arch.vlm.projector_type,
                        num_compressed_tokens=(
                            self.arch.vlm.num_compressed_tokens),
                    )

                return enc

            enc = cached_jit(key, make)
            out = enc(self.params["vision_backbone"],
                      self.params["projector"], jnp.asarray(pixels))
            return out.reshape(-1, out.shape[-1])
        outs = []
        for s in range(0, F, self.clip_size):
            clip = pixels[s : s + self.clip_size]
            n = clip.shape[0]
            enc = cached_jit(("encode", repr(self.arch)),
                             lambda: partial(encode_visual, arch=self.arch))
            outs.append(enc(self.params, pixels=jnp.asarray(clip)))
        ve = jnp.concatenate(outs, axis=0)
        return ve.reshape(-1, ve.shape[-1])

    # -- prefill ---------------------------------------------------------

    def _get_prefill(self, bucket_len: int, cache_len: int):
        """Non-pdrop prefill: keyed on bucket dims ONLY — prompt layout is
        traced data (gather/seq arrays), so any prompt at these dims shares
        one executable (per-prompt layouts in the key caused a recompile
        per prompt length in round 1)."""
        key = ("prefill", repr(self.arch), bucket_len, cache_len)

        def make():
            def prefill(params, input_ids, gather_idx, seq_idx, visual,
                        valid_from):
                plan = FusionPlan(
                    fused_len=bucket_len,
                    text_len=input_ids.shape[0],
                    num_visual=visual.shape[0],
                    gather_idx=gather_idx,
                    is_visual=None,
                    seq_idx=seq_idx,
                    position_ids=None,
                    sample_layouts=(),
                )
                out = vlm_forward(
                    params, self.arch,
                    input_ids=input_ids,
                    plan=plan,
                    visual_embeddings=visual,
                    fill_cache=True,
                    cache_max_len=cache_len,
                    fused_conv=_fused_conv_default(),
                    valid_from=valid_from,
                )
                return out["logits"][:, -1], out["cache"]

            return prefill

        return cached_jit(key, make)

    def _get_prefill_pdrop(self, bucket_len: int, cache_len: int,
                           num_visual: int):
        """Bucketed pdrop prefill: layout arrives as traced scalars
        (vision_start, query_pos); only num_visual (keep-count schedule) is
        compile-time. One executable per (bucket, frame count)."""
        key = ("prefill_pdrop", repr(self.arch), bucket_len, cache_len,
               num_visual)

        def make():
            def prefill(params, input_ids, gather_idx, seq_idx, visual,
                        valid_from, vision_start, query_pos):
                plan = FusionPlan(
                    fused_len=bucket_len,
                    text_len=input_ids.shape[0],
                    num_visual=num_visual,
                    gather_idx=gather_idx,
                    is_visual=None,
                    seq_idx=seq_idx,
                    position_ids=None,
                    sample_layouts=(),
                )
                out = vlm_forward(
                    params, self.arch,
                    input_ids=input_ids,
                    plan=plan,
                    visual_embeddings=visual,
                    fill_cache=True,
                    cache_max_len=cache_len,
                    fused_conv=_fused_conv_default(),
                    use_pdrop=True,
                    pdrop_vision_start=vision_start,
                    pdrop_query_pos=query_pos,
                    valid_from=valid_from,
                )
                return out["logits"][:, -1], out["cache"]

            return prefill

        return cached_jit(key, make)

    def _get_prefill_seq_parallel(self, bucket_len: int, cache_len: int,
                                  num_visual: int = 0,
                                  use_pdrop: bool = False):
        """Sequence-sharded prefill over the mesh's `seq` axis, emitting
        the decode-ready cache (parallel/seq_parallel.py). Keyed on bucket
        dims + mesh shape; prompt layout stays traced data. With
        `use_pdrop`, the masked pdrop/TransV stages run inside the sharded
        prefill (keyed additionally on the static frame count)."""
        from timeviper_tpu.parallel.seq_parallel import (
            nano_prefill_seq_parallel,
        )

        key = ("prefill_sp", repr(self.arch), bucket_len, cache_len,
               tuple(sorted(self.mesh.shape.items())),
               num_visual if use_pdrop else -1)

        def make():
            def prefill(params, input_ids, gather_idx, visual, valid_from,
                        vision_start=None, query_pos=None):
                emb_table = params["llm_backbone"]["embeddings"]
                text = jnp.take(emb_table, input_ids, axis=0)
                src = jnp.concatenate(
                    [text, visual.astype(text.dtype)], axis=0)
                fused = jnp.take(src, gather_idx, axis=0)[None]
                logits, cache = nano_prefill_seq_parallel(
                    params["llm_backbone"], self.arch.llm, fused,
                    self.mesh, logits_to_keep=1, valid_from=valid_from,
                    fill_cache=True, cache_max_len=cache_len,
                    cache_dtype=self.cache_dtype,
                    use_pdrop=use_pdrop,
                    pdrop_vision_start=vision_start,
                    pdrop_num_vision=num_visual,
                    pdrop_query_pos=query_pos,
                    merge_params=params.get("merge_modules"),
                )
                return logits[:, -1], cache

            return prefill

        return cached_jit(key, make)

    def _get_continue(self, suffix_bucket: int, cache_len: int):
        """Multi-token continuation on a cached prefix (prefix_cache.py).
        Keyed on (suffix bucket, cache capacity) — the real suffix length
        is traced, so one executable serves every question length in the
        bucket."""
        key = ("continue", repr(self.arch), suffix_bucket, cache_len)

        def make():
            def cont(params, input_ids, cache, real_len):
                from timeviper_tpu.models import prefix_cache as pc

                fn = (pc.nano_forward_continue
                      if self.arch.llm_family == "nano"
                      else pc.qwen2_forward_continue)
                lp = params["llm_backbone"]
                embeds = jnp.take(lp["embeddings"], input_ids, axis=0)[None]
                logits, new_cache = fn(
                    lp, self.arch.llm, embeds, cache, real_len,
                    pdrop_params=params.get("merge_modules"),
                )
                return logits, new_cache

            return cont

        return cached_jit(key, make)

    # -- decode loop -----------------------------------------------------

    def _get_decode(self):
        key = ("decode", repr(self.arch), self.max_new_tokens,
               repr(self.sampling), self.terminators)

        def make():
            terminators = jnp.asarray(self.terminators, jnp.int32)
            max_new = self.max_new_tokens
            samp = self.sampling

            def decode(params, first_logits, cache, key):
                def cond(state):
                    i, _, _, done, _, _ = state
                    return (i < max_new) & (~done)

                def body(state):
                    i, tok, cache, done, out, key = state
                    key, sub = jax.random.split(key)
                    logits, cache = decode_step(params, self.arch, tok, cache)
                    nxt = sample_token(logits, sub, samp)
                    out = out.at[i].set(nxt[0])
                    done = jnp.any(nxt[0] == terminators)
                    return (i + 1, nxt[:, None], cache, done, out, key)

                key, sub = jax.random.split(key)
                first = sample_token(first_logits, sub, samp)
                out = jnp.full((max_new,), -1, jnp.int32).at[0].set(first[0])
                done0 = jnp.any(first[0] == terminators)
                state = (jnp.asarray(1), first[:, None], cache, done0, out, key)
                i, _, cache, _, out, _ = jax.lax.while_loop(cond, body, state)
                return out, i

            return decode

        return cached_jit(key, make)

    # -- speculative decode -----------------------------------------------

    @property
    def _spec_on(self) -> bool:
        """Speculation applies to the greedy single-program decode path:
        temperature 0 (acceptance is an argmax comparison) and no kv_valid
        bookkeeping (masked sharded-pdrop prefills keep the plain loop)."""
        return (self.speculative == "ngram"
                and self.sampling.temperature == 0.0)

    @property
    def _spec_margin(self) -> int:
        """Extra cache rows a speculative verify pass may touch past
        max_new_tokens (the S-token suffix window writes beyond the last
        accepted row; margin keeps dynamic_update_slice from clamping)."""
        return (self.n_draft + 2) if self._spec_on else 0

    def _get_spec_decode(self, buf_size: int):
        key = ("spec_decode", repr(self.arch), self.max_new_tokens,
               self.terminators, self.n_draft, buf_size)

        def make():
            from timeviper_tpu.models.speculative import make_spec_decode

            return make_spec_decode(
                self.arch,
                max_new_tokens=self.max_new_tokens,
                terminators=self.terminators,
                n_draft=self.n_draft,
                pad_token_id=self.pad_token_id,
            )

        return cached_jit(key, make)

    def _run_decode(self, ids, first_logits, cache, rng_seed,
                    image_token_id=None):
        """Dispatch the decode loop (plain or speculative) and package the
        output. `ids` is the full prompt id list (speculation mines it for
        n-gram continuations)."""
        if self._spec_on and cache.get("kv_valid") is None:
            from timeviper_tpu.models.speculative import text_history

            buf, buf_len = text_history(
                ids, image_token_id, self.pad_token_id,
                self.max_new_tokens, self.n_draft)
            spec = self._get_spec_decode(buf.shape[0])
            out, n = spec(self.params, first_logits, cache,
                          jnp.asarray(buf), jnp.asarray(buf_len, jnp.int32))
        else:
            decode = self._get_decode()
            out, n = decode(self.params, first_logits, cache,
                            jax.random.PRNGKey(rng_seed))
        out = np.asarray(out)
        n = int(n)
        return GenerationOutput(token_ids=out[:n], num_generated=n)

    # -- public ----------------------------------------------------------

    def _plan_prompt(self, ids, image_token_id):
        """Host-side bucket geometry shared by generate / prefill_prefix /
        the serving engine: left-pad the fused layout to a bucket, mask
        <image> placeholders to the pad token, and pad the text ids.
        Returns (plan, bucket, pad, ids_arr, gather_idx, seq_idx)."""
        img = image_token_id if image_token_id is not None else -1
        plan = plan_fusion(ids, img, self.arch.tokens_per_frame)
        bucket = pick_bucket(plan.fused_len)
        pad = bucket - plan.fused_len
        gather_idx = np.concatenate(
            [np.zeros((pad,), np.int32), plan.gather_idx])
        seq = plan.seq_idx if plan.seq_idx is not None else np.zeros(
            (plan.fused_len,), np.int32)
        seq_idx = np.concatenate([np.full((pad,), -1, np.int32), seq])
        ids_arr = np.asarray(ids, np.int32)
        ids_arr = np.where(ids_arr == img, self.pad_token_id, ids_arr)
        ids_arr, gather_idx = pad_text_to_bucket(
            ids_arr, gather_idx, bucket, self.pad_token_id)
        return plan, bucket, pad, ids_arr, gather_idx, seq_idx

    def prefill_prefix(
        self,
        input_ids: Sequence[int],
        pixels: Optional[np.ndarray] = None,
        image_token_id: Optional[int] = None,
        suffix_budget: int = 512,
        cache_len: Optional[int] = None,
        use_pdrop: bool = False,
    ) -> PrefixState:
        """Prefill a shared prompt prefix (typically `system + <video>`)
        once and return a reusable PrefixState (models/prefix_cache.py).
        The reference re-prefills the full video for every question on it
        (evaluate.py:359-679); here questions continue from the cached
        O(1)-per-Mamba-layer state + 4 attention layers' KV.

        With `use_pdrop`, the pdrop/TransV stages run inside the prefix
        prefill with the LAST PREFIX TOKEN as the attn-ranking query
        (question-agnostic compression — the question isn't known yet, a
        deliberate divergence from per-question pdrop); the cached ca_kv
        is re-merged into every continuation + decode step."""
        # a suffix bucket is at least one Mamba chunk (the continuation
        # pads the question to a chunk multiple) — a budget below that
        # could never admit any suffix, so round it up
        chunk = getattr(self.arch.llm, "chunk_size", None) or 16
        suffix_budget = max(suffix_budget, chunk)
        ids = list(input_ids)
        visual = None
        if pixels is not None:
            visual = self.encode_frames(pixels)

        plan, bucket, pad, ids_arr, gather_idx, seq_idx = \
            self._plan_prompt(ids, image_token_id)
        nv = visual.shape[0] if visual is not None else 0
        assert plan.num_visual == nv, (plan.num_visual, nv)
        if visual is None:
            visual = jnp.zeros((0, self.arch.llm.hidden_size),
                               self.cache_dtype)

        if cache_len is None:
            cache_len = (bucket + suffix_budget + self.max_new_tokens
                         + self._spec_margin)
        assert cache_len >= (bucket + suffix_budget + self.max_new_tokens
                             + self._spec_margin), (
            "cache_len too small for prefix + suffix_budget + max_new")
        use_sp = (self._seq_shards > 1
                  and self.arch.llm_family == "nano"
                  and bucket % self._seq_shards == 0)
        if use_pdrop:
            assert len(plan.sample_layouts) == 1, (
                "pdrop prefix caching is single-sample")
            vs, _, _ = plan.sample_layouts[0]
        if use_sp and use_pdrop:
            prefill = self._get_prefill_seq_parallel(
                bucket, cache_len, num_visual=plan.num_visual,
                use_pdrop=True)
            _, cache = prefill(
                self.params, jnp.asarray(ids_arr), jnp.asarray(gather_idx),
                visual, jnp.asarray(pad, jnp.int32),
                jnp.asarray(pad + vs, jnp.int32),
                jnp.asarray(bucket - 1, jnp.int32))
        elif use_sp:
            prefill = self._get_prefill_seq_parallel(bucket, cache_len)
            _, cache = prefill(
                self.params, jnp.asarray(ids_arr), jnp.asarray(gather_idx),
                visual, jnp.asarray(pad, jnp.int32))
        elif use_pdrop:
            prefill = self._get_prefill_pdrop(
                bucket, cache_len, plan.num_visual)
            _, cache = prefill(
                self.params, jnp.asarray(ids_arr), jnp.asarray(gather_idx),
                jnp.asarray(seq_idx), visual, pad,
                jnp.asarray(pad + vs, jnp.int32),
                jnp.asarray(bucket - 1, jnp.int32))
        else:
            prefill = self._get_prefill(bucket, cache_len)
            _, cache = prefill(
                self.params, jnp.asarray(ids_arr), jnp.asarray(gather_idx),
                jnp.asarray(seq_idx), visual, pad)
        return PrefixState(cache=cache, bucket=bucket, cache_len=cache_len,
                           suffix_budget=suffix_budget, pad=pad)

    def generate(
        self,
        input_ids: Sequence[int],
        pixels: Optional[np.ndarray] = None,
        image_token_id: Optional[int] = None,
        answer_prompt_ids: Optional[Sequence[int]] = None,
        use_pdrop: bool = False,
        rng_seed: int = 0,
        prefix: Optional[PrefixState] = None,
    ) -> GenerationOutput:
        """Generate a completion for one prompt (batch-1, like the reference
        eval loop, evaluate.py:359-679).

        With `prefix` (from prefill_prefix), `input_ids` is the SUFFIX only
        (question tokens after the video) and must contain no <image>
        placeholders — the video lives in the prefix cache."""
        ids = list(input_ids)
        if answer_prompt_ids:
            # answer-prompt injection at prefill (generic_vlm.py:771-784)
            ids = ids + list(answer_prompt_ids)

        if prefix is not None:
            # ValueErrors (not asserts): callers like the eval loop catch
            # these per item and fall back to a full prefill — and asserts
            # vanish under -O, which would let dynamic_update_slice clamp
            # and silently corrupt the cache
            if pixels is not None:
                raise ValueError("video already lives in the prefix cache")
            if not ids:
                raise ValueError(
                    "empty suffix on a cached prefix (real_len=0 would "
                    "decode from a pad row and corrupt the conv window)")
            chunk = getattr(self.arch.llm, "chunk_size", None) or 16
            sb = max(chunk, -(-len(ids) // chunk) * chunk)
            if sb > prefix.suffix_budget:
                raise ValueError(
                    f"suffix of {len(ids)} tokens needs a {sb}-token "
                    f"bucket (chunk multiple) > the prefix's "
                    f"suffix_budget {prefix.suffix_budget}")
            ids_arr = np.full((sb,), self.pad_token_id, np.int32)
            ids_arr[: len(ids)] = ids  # trailing pads are exactly inert
            cont = self._get_continue(sb, prefix.cache_len)
            first_logits, cache = cont(
                self.params, jnp.asarray(ids_arr), prefix.cache,
                jnp.asarray(len(ids), jnp.int32))
            return self._run_decode(ids, first_logits, cache, rng_seed)

        visual = None
        if pixels is not None:
            visual = self.encode_frames(pixels)

        plan, bucket, pad, ids_arr, gather_idx, seq_idx = \
            self._plan_prompt(ids, image_token_id)
        nv = visual.shape[0] if visual is not None else 0
        assert plan.num_visual == nv, (plan.num_visual, nv)

        cache_len = bucket + self.max_new_tokens + self._spec_margin
        if visual is None:
            visual = jnp.zeros((0, self.arch.llm.hidden_size), self.cache_dtype)
        use_seq_parallel = (
            self._seq_shards > 1
            and self.arch.llm_family == "nano"
            and bucket % self._seq_shards == 0
        )
        if use_seq_parallel and use_pdrop:
            assert len(plan.sample_layouts) == 1, (
                "pdrop generation is single-sample")
            vs, _, _ = plan.sample_layouts[0]
            prefill = self._get_prefill_seq_parallel(
                bucket, cache_len, num_visual=plan.num_visual,
                use_pdrop=True)
            first_logits, cache = prefill(
                self.params,
                jnp.asarray(ids_arr),
                jnp.asarray(gather_idx),
                visual,
                jnp.asarray(pad, jnp.int32),
                jnp.asarray(pad + vs, jnp.int32),
                jnp.asarray(bucket - 1, jnp.int32),
            )
        elif use_seq_parallel:
            prefill = self._get_prefill_seq_parallel(bucket, cache_len)
            first_logits, cache = prefill(
                self.params,
                jnp.asarray(ids_arr),
                jnp.asarray(gather_idx),
                visual,
                jnp.asarray(pad, jnp.int32),
            )
        elif use_pdrop:
            # bucketed pdrop: layout as traced scalars (dynamic stage path)
            assert len(plan.sample_layouts) == 1, (
                "pdrop generation is single-sample (packed rows train-only)")
            vs, _, _ = plan.sample_layouts[0]
            prefill = self._get_prefill_pdrop(
                bucket, cache_len, plan.num_visual)
            first_logits, cache = prefill(
                self.params,
                jnp.asarray(ids_arr),
                jnp.asarray(gather_idx),
                jnp.asarray(seq_idx),
                visual,
                pad,
                jnp.asarray(pad + vs, jnp.int32),
                # attn-ranking query: last prompt token (bucket coords)
                jnp.asarray(bucket - 1, jnp.int32),
            )
        else:
            prefill = self._get_prefill(bucket, cache_len)
            first_logits, cache = prefill(
                self.params,
                jnp.asarray(ids_arr),
                jnp.asarray(gather_idx),
                jnp.asarray(seq_idx),
                visual,
                pad,
            )
        return self._run_decode(ids, first_logits, cache, rng_seed,
                                image_token_id=image_token_id)
