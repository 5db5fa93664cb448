"""Batched serving engine — the TPU-native vLLM-path analog.

The reference serves through vLLM with paged KV + TP, feeding externally
computed prompt embeddings (eval/vllm_inference/vllm_infer.py:42-264;
SURVEY.md §2.2 N7). A hybrid Mamba model makes paging unnecessary: per
sequence the state is O(1) for the ~46 Mamba layers (conv state + SSM
state) plus a fixed-capacity KV for the 4-6 attention layers. This engine
exploits that with **slot-based continuous batching**:

* The batched cache holds `num_slots` independent sequence states.
* Prefill runs one request at a time through the bucketed single-row
  prefill (shared compiled programs with models/generate.py), then the
  resulting state is *inserted* into a free slot of the batched cache —
  a pytree scatter, cheap because Mamba state is O(1).
* Decode steps run ALL active slots in one jitted batched step; finished
  slots are freed and refilled from the queue (continuous batching).
* Like the reference's vLLM path, vision encoding + fusion happens outside
  the engine (prompt embeddings in, vllm_infer.py:118-190).
* Unlike the reference's vLLM path (which cannot apply pdrop at all —
  it lives inside the HF-model forward), this engine serves pdrop
  requests when constructed with `pdrop_frames`: vision requests with
  exactly that frame budget run the Generator's bucketed pdrop prefill,
  and the post-drop state inserts into a slot. pdrop geometry is static
  (fixed ratios x fixed frame budget), so the batched cache carries
  slot-uniform extras: per-attention-layer `kv_len` (a pre-stage layer's
  cache keeps its pre-drop rows — see models/nano.attention_mixer_decode)
  and per-stage TransV `ca_kv` rows that decode re-merges.

All shapes are static: (num_slots, max_len) caches + one compiled decode
step regardless of the request mix.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.models.generate import Generator
from timeviper_tpu.models.vlm import VLMArch, decode_step, init_cache
from timeviper_tpu.ops.sampling import SamplingParams, sample_token


@dataclasses.dataclass
class Request:
    request_id: int
    input_ids: List[int]
    pixels: Optional[np.ndarray] = None
    image_token_id: int = -1
    max_new_tokens: int = 128
    # multi-question serving: continue from a cached video prefix
    # (engine.prefill_prefix; models/prefix_cache.py). input_ids is then
    # the post-video question suffix only.
    prefix: Optional[Any] = None
    # filled by the engine
    output_ids: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    error: Optional[str] = None


def _tree_insert(batched, single, slot):
    """Scatter a single-sequence cache pytree into slot `slot`.

    Must run under jit (ServingEngine._get_insert): executed eagerly this
    is ~80 separate dispatches, and through the tunnel's ~30 ms/dispatch
    latency a single insert costs seconds."""
    def ins(b, s):
        if s.ndim == b.ndim - 1:  # scalar-per-slot leaves (kv_len, ca_kv)
            s = s[None]
        return jax.lax.dynamic_update_slice_in_dim(
            b, s.astype(b.dtype), slot, axis=0
        )

    return jax.tree_util.tree_map(ins, batched, single)


class ServingEngine:
    def __init__(
        self,
        params: Dict[str, Any],
        arch: VLMArch,
        *,
        terminator_ids: Sequence[int],
        num_slots: int = 8,
        max_len: int = 32768,
        max_new_tokens: int = 128,
        sampling: SamplingParams = SamplingParams(),
        pad_token_id: int = 0,
        cache_dtype=jnp.bfloat16,
        steps_per_sync: int = 4,
        mesh=None,
        batch_prefill: bool = True,
        prefill_chunk_tokens: Optional[int] = None,
        pdrop_frames: Optional[int] = None,
    ) -> None:
        self.params = params
        self.arch = arch
        self.num_slots = num_slots
        self.max_len = max_len
        self.max_new_tokens = max_new_tokens
        self.sampling = sampling
        self.terminators = tuple(int(t) for t in terminator_ids)
        # batching bypasses the sequence-sharded prefill — keep the mesh
        # path (TP/SP serving) on the per-request program
        self.batch_prefill = batch_prefill and mesh is None
        # chunked prefill (the vLLM chunked-prefill analog): a long prompt
        # advances one chunk per scheduling round through the continuation
        # path (models/prefix_cache.py), so active decode streams are
        # stalled at most one chunk's worth of compute per round instead
        # of the whole multi-second prefill. One long prompt is in flight
        # at a time; its slot is reserved until the state is inserted.
        if prefill_chunk_tokens is not None:
            chunk = getattr(arch.llm, "chunk_size", None) or 16
            prefill_chunk_tokens = -(-prefill_chunk_tokens // chunk) * chunk
        self.prefill_chunk_tokens = prefill_chunk_tokens
        self.cache_dtype = cache_dtype
        self._chunked: Optional[Dict[str, Any]] = None
        # single-row prefill machinery shared with the offline generator;
        # with a mesh, prefill runs sequence-sharded (the vLLM-TP analog)
        # and vision encode shards over frames — decode then continues on
        # the replicated cache (TP via GSPMD when params are sharded)
        self._gen = Generator(
            params, arch, terminator_ids=terminator_ids,
            pad_token_id=pad_token_id, max_new_tokens=max_new_tokens,
            sampling=sampling, cache_dtype=cache_dtype, mesh=mesh,
        )
        self.cache = init_cache(arch, num_slots, max_len, cache_dtype)
        # pdrop serving (see module doc): static per-stage drop counts at
        # the configured frame budget size the slot-uniform cache extras
        self._pdrop: Optional[Dict[str, Any]] = None
        if pdrop_frames is not None:
            from timeviper_tpu.models.pdrop import pdrop_drop_counts

            llm = arch.llm
            assert getattr(llm, "use_pdrop", False) and llm.pdrop_stages, \
                "pdrop_frames requires a pdrop-configured llm"
            assert all(s.layer < llm.num_hidden_layers
                       for s in llm.pdrop_stages), (
                "pdrop stage beyond the layer stack never fires but its "
                "drop count would corrupt host-side length tracking")
            assert arch.llm_family == "nano", \
                "pdrop serving: nano family only"
            assert not getattr(llm, "attention_bias", False), (
                "pdrop serving relies on zero ca_kv rows being exactly "
                "inert for non-pdrop slots (no attention biases)")
            nv = pdrop_frames * arch.tokens_per_frame
            drops = pdrop_drop_counts(llm, nv)
            merge = params.get("merge_modules")
            Hkv, hd = llm.num_key_value_heads, llm.head_dim
            ca = []
            for si, _stage in enumerate(llm.pdrop_stages):
                has = (merge is not None and si < len(merge)
                       and merge[si] is not None and drops[si] > 0)
                ca.append({
                    "k": jnp.zeros((num_slots, drops[si], Hkv, hd),
                                   cache_dtype),
                    "v": jnp.zeros((num_slots, drops[si], Hkv, hd),
                                   cache_dtype),
                } if has else {})
            kinds = tuple(llm.layers_block_type)
            for idx, bt in enumerate(kinds):
                if bt == "attention":
                    self.cache["layers"][idx]["kv_len"] = jnp.zeros(
                        (num_slots,), jnp.int32)
            self._pdrop = {
                "frames": pdrop_frames, "num_visual": nv,
                "drops": drops, "total_drop": sum(drops),
                "has_ca": any(len(c) for c in ca),
            }
            if self._pdrop["has_ca"]:
                self.cache["ca_kv"] = ca
        # per-slot host state
        self.slot_req: List[Optional[Request]] = [None] * num_slots
        self.slot_lengths = np.zeros((num_slots,), np.int32)
        self.slot_valid_from = np.zeros((num_slots,), np.int32)
        self.queue: List[Request] = []
        self._last_tokens = np.zeros((num_slots,), np.int32)
        # decode steps batched per host round trip: each dispatch+sync pays
        # the full host<->device latency, so amortize it over several tokens
        # (slots that hit a terminator mid-burst get trimmed on the host)
        self.steps_per_sync = max(1, steps_per_sync)

    # ------------------------------------------------------------------

    def submit(self, req: Request) -> None:
        self.queue.append(req)

    def prefill_prefix(self, input_ids, pixels=None, image_token_id=-1,
                       suffix_budget: int = 512):
        """Prefill a shared `system + <video>` prefix once for this engine;
        the returned PrefixState is valid for any number of Requests
        (prefix=state, input_ids=question suffix). The state's cache is
        engine-capacity-sized so continuations land directly in slots."""
        return self._gen.prefill_prefix(
            input_ids, pixels=pixels, image_token_id=image_token_id,
            suffix_budget=suffix_budget, cache_len=self.max_len)

    def _dispatch_continue(self, req: Request, slot: int):
        """Continuation analog of _dispatch_prefill: run the question
        suffix on the cached video prefix (models/prefix_cache.py) and
        insert the resulting state into a slot."""
        st = req.prefix
        if st.cache.get("ca_kv") is not None:
            raise ValueError(
                f"request {req.request_id}: pdrop prefix states are not"
                " servable — dropping compacts the cache so its true row"
                " count lives on device, but engine slots track lengths"
                " host-side (use the offline Generator for pdrop)")
        if st.cache_len != self.max_len:
            raise ValueError(
                f"request {req.request_id}: prefix cache_len {st.cache_len}"
                f" != engine max_len {self.max_len} — build the prefix via"
                " engine.prefill_prefix")
        ids = list(req.input_ids)
        if req.pixels is not None or req.image_token_id in ids:
            raise ValueError(
                f"request {req.request_id}: prefix requests are text-only"
                " (the video lives in the prefix cache) — dropping frames"
                " silently would return plausible-but-wrong output")
        if not ids:
            raise ValueError(
                f"request {req.request_id}: empty suffix on a cached"
                " prefix")
        chunk = getattr(self.arch.llm, "chunk_size", None) or 16
        sb = max(chunk, -(-len(ids) // chunk) * chunk)
        if sb > st.suffix_budget:
            raise ValueError(
                f"request {req.request_id}: suffix of {len(ids)} tokens"
                f" needs a {sb}-token bucket (chunk multiple) > the"
                f" prefix's suffix_budget {st.suffix_budget}")
        total = st.bucket + len(ids)
        if total + req.max_new_tokens > self.max_len:
            raise ValueError(
                f"request {req.request_id}: prefix {st.bucket} + suffix"
                f" {len(ids)} + max_new_tokens {req.max_new_tokens}"
                f" exceeds engine max_len {self.max_len}")
        ids_arr = np.full((sb,), self._gen.pad_token_id, np.int32)
        ids_arr[: len(ids)] = ids  # trailing pads are exactly inert
        cont = self._gen._get_continue(sb, self.max_len)
        logits, cache1 = cont(self.params, jnp.asarray(ids_arr), st.cache,
                              jnp.asarray(len(ids), jnp.int32))
        first_tok = sample_token(
            logits, jax.random.PRNGKey(req.request_id), self.sampling)
        return {"req": req, "slot": slot, "cache1": cache1,
                "first_tok": first_tok, "bucket": total, "pad": st.pad}

    def _free_slots(self) -> List[int]:
        held = self._chunked["slot"] if self._chunked else -1
        return [i for i, r in enumerate(self.slot_req)
                if r is None and i != held]

    def _start_chunked(self, req: Request, slot: int) -> None:
        """Begin a chunked prefill: reserve `slot` and an empty single-row
        cache; _advance_chunked moves it one chunk per round."""
        self._chunked = {
            "req": req, "slot": slot, "ids": list(req.input_ids), "pos": 0,
            "cache": init_cache(self.arch, 1, self.max_len,
                                self.cache_dtype),
        }

    def _advance_chunked(self):
        """Run ONE chunk of the in-flight long prompt (async dispatch).
        Returns a pending record when the prompt completes, else None."""
        st = self._chunked
        C = self.prefill_chunk_tokens
        ids, pos = st["ids"], st["pos"]
        n = min(C, len(ids) - pos)
        ids_arr = np.full((C,), self._gen.pad_token_id, np.int32)
        ids_arr[:n] = ids[pos: pos + n]  # trailing pads are exactly inert
        cont = self._gen._get_continue(C, self.max_len)
        logits, st["cache"] = cont(
            self.params, jnp.asarray(ids_arr), st["cache"],
            jnp.asarray(n, jnp.int32))
        st["pos"] = pos + n
        if st["pos"] < len(ids):
            return None
        req = st["req"]
        first_tok = sample_token(
            logits, jax.random.PRNGKey(req.request_id), self.sampling)
        pending = {"req": req, "slot": st["slot"], "cache1": st["cache"],
                   "first_tok": first_tok, "bucket": len(ids), "pad": 0}
        self._chunked = None
        return pending

    def _dispatch_prefill(self, req: Request, slot: int):
        """Dispatch a request's prefill WITHOUT blocking on it.

        Returns a pending record; the device arrays inside are async
        handles. The caller inserts the state into the batched cache after
        dispatching the round's decode burst (the overlap that keeps the
        device fed — vLLM interleaves prompt processing with decode the
        same way, vllm_infer.py:49-60)."""
        visual = None
        if req.pixels is not None:
            visual = self._gen.encode_frames(req.pixels)
        # reuse the generator's bucketed prefill: returns (logits, cache)
        if self._pdrop is not None and req.pixels is not None:
            return self._dispatch_prefill_pdrop(req, slot, visual)
        bucket, pad, ids_arr, gather_idx, seq_idx = self._prefill_plan(req)
        if visual is None:
            visual = jnp.zeros(
                (0, self.arch.llm.hidden_size), jnp.bfloat16)
        use_sp = (self._gen._seq_shards > 1
                  and self.arch.llm_family == "nano"
                  and bucket % self._gen._seq_shards == 0)
        if use_sp:
            prefill = self._gen._get_prefill_seq_parallel(bucket,
                                                          self.max_len)
            logits, cache1 = prefill(
                self.params, jnp.asarray(ids_arr),
                jnp.asarray(gather_idx), visual,
                jnp.asarray(pad, jnp.int32),
            )
        else:
            prefill = self._gen._get_prefill(bucket, self.max_len)
            logits, cache1 = prefill(
                self.params, jnp.asarray(ids_arr),
                jnp.asarray(gather_idx), jnp.asarray(seq_idx), visual, pad,
            )
        first_tok = sample_token(
            logits, jax.random.PRNGKey(req.request_id), self.sampling)
        return {"req": req, "slot": slot, "cache1": cache1,
                "first_tok": first_tok, "bucket": bucket, "pad": pad}

    def _dispatch_prefill_pdrop(self, req: Request, slot: int, visual):
        """Bucketed pdrop prefill for a vision request at the engine's
        configured frame budget; the post-drop compacted state (+ per-layer
        kv_len, + TransV ca_kv) inserts into a slot. The reference's vLLM
        path cannot do this at all (pdrop lives inside the HF forward)."""
        pd = self._pdrop
        plan, bucket, pad, ids_arr, gather_idx, seq_idx = \
            self._gen._plan_prompt(list(req.input_ids), req.image_token_id)
        if plan.num_visual != pd["num_visual"]:
            raise ValueError(
                f"request {req.request_id}: pdrop engine is compiled for"
                f" {pd['num_visual']} visual tokens ({pd['frames']}"
                f" frames); request has {plan.num_visual}")
        if len(plan.sample_layouts) != 1:
            raise ValueError("pdrop serving is single-sample per request")
        post_len = bucket - pd["total_drop"]
        if bucket + req.max_new_tokens > self.max_len:
            # decode appends attention KV at the PRE-drop kv_len for
            # pre-stage layers, so capacity is bounded by bucket, not the
            # post-drop length
            raise ValueError(
                f"request {req.request_id}: bucket {bucket} + "
                f"max_new_tokens {req.max_new_tokens} exceeds engine "
                f"max_len {self.max_len}")
        vs, _, _ = plan.sample_layouts[0]
        prefill = self._gen._get_prefill_pdrop(
            bucket, self.max_len, plan.num_visual)
        logits, cache1 = prefill(
            self.params, jnp.asarray(ids_arr), jnp.asarray(gather_idx),
            jnp.asarray(seq_idx), visual, pad,
            jnp.asarray(pad + vs, jnp.int32),
            jnp.asarray(bucket - 1, jnp.int32))
        first_tok = sample_token(
            logits, jax.random.PRNGKey(req.request_id), self.sampling)
        return {"req": req, "slot": slot, "cache1": cache1,
                "first_tok": first_tok, "bucket": post_len, "pad": pad}

    def _prefill_plan(self, req: Request):
        """Host-side bucket geometry for one request (the Generator's
        shared planner + this engine's capacity check). Returns (bucket,
        pad, ids_arr, gather_idx, seq_idx) or raises ValueError."""
        _, bucket, pad, ids_arr, gather_idx, seq_idx = \
            self._gen._plan_prompt(list(req.input_ids), req.image_token_id)
        if bucket + req.max_new_tokens > self.max_len:
            # decode writes KV at slots [bucket, bucket+max_new); without
            # headroom dynamic_update_slice clamps and silently overwrites
            # the last prompt token's KV (like vLLM, reject the request)
            raise ValueError(
                f"request {req.request_id}: bucket {bucket} + "
                f"max_new_tokens {req.max_new_tokens} exceeds engine "
                f"max_len {self.max_len}"
            )
        return bucket, pad, ids_arr, gather_idx, seq_idx

    def _get_prefill_batched(self, bucket: int, B: int):
        """B same-bucket text-only prompts in ONE compiled program (vmap
        over the row prefill). Short prompts underfill the MXU row dim —
        batching them recovers it; this is the analog of vLLM batching
        prompt processing across waiting requests."""
        from timeviper_tpu.data.fusion import FusionPlan
        from timeviper_tpu.models.generate import cached_jit
        from timeviper_tpu.models.vlm import vlm_forward

        key = ("serve_prefill_batch", repr(self.arch), bucket,
               self.max_len, B)
        cache_len = self.max_len
        arch = self.arch

        def make():
            def one(params, ids1, gather1, seq1, vf1):
                plan = FusionPlan(
                    fused_len=bucket, text_len=ids1.shape[0],
                    num_visual=0, gather_idx=gather1, is_visual=None,
                    seq_idx=seq1, position_ids=None, sample_layouts=(),
                )
                out = vlm_forward(
                    params, arch, input_ids=ids1, plan=plan,
                    visual_embeddings=jnp.zeros(
                        (0, arch.llm.hidden_size), jnp.bfloat16),
                    fill_cache=True, cache_max_len=cache_len,
                    valid_from=vf1,
                )
                return out["logits"][:, -1], out["cache"]["layers"]

            def batched(params, ids, gather, seqi, vf):
                return jax.vmap(one, in_axes=(None, 0, 0, 0, 0))(
                    params, ids, gather, seqi, vf)

            return batched

        return cached_jit(key, make)

    def _dispatch_prefill_batch(self, group):
        """Dispatch one batched prefill for [(req, slot, plan), ...] of
        the same bucket (plan = the _prefill_plan tuple computed at
        grouping time). Returns one pending record per request; the
        vmapped state rows are scattered into slots by _insert_pending
        (row-indexed)."""
        reqs_slots, rows = [], []
        for req, slot, plan in group:
            bucket, pad, ids_arr, gather_idx, seq_idx = plan
            rows.append((pad, ids_arr, gather_idx, seq_idx))
            reqs_slots.append((req, slot, bucket, pad))
        B = len(rows)
        bucket = reqs_slots[0][2]
        prefill = self._get_prefill_batched(bucket, B)
        logits, layers = prefill(
            self.params,
            jnp.asarray(np.stack([r[1] for r in rows])),
            jnp.asarray(np.stack([r[2] for r in rows])),
            jnp.asarray(np.stack([r[3] for r in rows])),
            jnp.asarray(np.asarray([r[0] for r in rows], np.int32)),
        )
        pendings = []
        for row, (req, slot, bucket, pad) in enumerate(reqs_slots):
            first_tok = sample_token(
                logits[row], jax.random.PRNGKey(req.request_id),
                self.sampling)
            pendings.append({
                "req": req, "slot": slot, "cache1": {"layers": layers},
                "row": row, "first_tok": first_tok,
                "bucket": bucket, "pad": pad,
            })
        return pendings

    def _get_insert(self):
        from timeviper_tpu.models.generate import cached_jit

        key = ("serve_insert", repr(self.arch), self.max_len)

        def make():
            def ins(batched_layers, single_layers, slot):
                return [
                    _tree_insert(bl, sl, slot)
                    for bl, sl in zip(batched_layers, single_layers)
                ]

            import jax as _jax

            return _jax.jit(ins, donate_argnums=(0,))

        return cached_jit(key, make)

    def _get_insert_row(self):
        """Row-indexed insert for vmapped batched-prefill states: slice
        row `row` out of every (B, 1, ...) leaf and scatter it into slot
        `slot` — one jitted dispatch, no eager per-leaf slicing."""
        from timeviper_tpu.models.generate import cached_jit

        key = ("serve_insert_row", repr(self.arch), self.max_len)

        def make():
            def ins(batched_layers, vmapped_layers, row, slot):
                def one(b, s):
                    r = jax.lax.dynamic_index_in_dim(
                        s, row, axis=0, keepdims=False).astype(b.dtype)
                    if r.ndim == b.ndim - 1:  # scalar-per-slot (kv_len)
                        r = r[None]
                    return jax.lax.dynamic_update_slice_in_dim(
                        b, r, slot, axis=0)

                return [
                    jax.tree_util.tree_map(lambda b, s: one(b, s), bl, vl)
                    for bl, vl in zip(batched_layers, vmapped_layers)
                ]

            import jax as _jax

            return _jax.jit(ins, donate_argnums=(0,))

        return cached_jit(key, make)

    def _insert_pending(self, pending) -> None:
        """Insert a dispatched prefill's state into the batched cache
        (ONE jitted device scatter, async) and activate the slot
        host-side. Lengths come from the static bucket geometry — no
        device sync needed."""
        slot = pending["slot"]
        cache1 = pending["cache1"]
        if self._pdrop is not None:
            cache1 = self._pdrop_normalize_single(cache1, pending)
        if "row" in pending:
            ins = self._get_insert_row()
            layers = ins(self.cache["layers"], cache1["layers"],
                         jnp.asarray(pending["row"], jnp.int32),
                         jnp.asarray(slot, jnp.int32))
        else:
            ins = self._get_insert()
            layers = ins(self.cache["layers"], cache1["layers"],
                         jnp.asarray(slot, jnp.int32))
        new_cache = {
            "layers": layers,
            "length": self.cache["length"],
            "valid_from": self.cache["valid_from"],
        }
        if self._pdrop is not None and self._pdrop["has_ca"]:
            # pdrop prefills carry real ca_kv rows; every other insert
            # writes zeros (stale rows from a previous pdrop occupant
            # must be neutralized — zero K/V cross-attn is exactly inert)
            ca1 = cache1.get("ca_kv") or jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape[1:], x.dtype),
                self.cache["ca_kv"])
            new_cache["ca_kv"] = self._get_insert()(
                self.cache["ca_kv"], ca1, jnp.asarray(slot, jnp.int32))
        self.cache = new_cache
        self.slot_req[slot] = pending["req"]
        self.slot_lengths[slot] = pending["bucket"]
        self.slot_valid_from[slot] = pending["pad"]
        # placeholder until the async first token is synced this round
        self._last_tokens[slot] = 0

    def _pdrop_normalize_single(self, cache1, pending):
        """Make any prefill's cache structurally match the pdrop-enabled
        batched cache: attention layers missing a per-layer `kv_len` get
        their global length (bucket geometry; (B,) for vmapped rows)."""
        kinds = tuple(self.arch.llm.layers_block_type)
        layers = list(cache1["layers"])
        length = pending["bucket"]
        for idx, bt in enumerate(kinds):
            if bt == "attention" and "kv_len" not in layers[idx]:
                if "row" in pending:
                    leaf = layers[idx]["k"]
                    fill = jnp.full((leaf.shape[0],), length, jnp.int32)
                else:
                    fill = jnp.asarray(length, jnp.int32)
                layers[idx] = {**layers[idx], "kv_len": fill}
        return {**cache1, "layers": layers}

    def _get_decode(self):
        from timeviper_tpu.models.generate import cached_jit

        key = ("serve_decode", repr(self.arch), self.steps_per_sync,
               repr(self.sampling),
               None if self._pdrop is None else self._pdrop["frames"])

        def make():
            arch = self.arch
            n_steps = self.steps_per_sync
            has_ca = self._pdrop is not None and self._pdrop["has_ca"]

            def one_step(params, tokens, layers_all, ca_all, lengths,
                         valid_from, key):
                # per-slot lengths: override the scalar cache length with a
                # vector — decode_step uses cache["length"] for positions and
                # KV writes, so run with per-slot state via vmap
                def one(p, tok, layers, ca, length, vf):
                    # vmap strips the slot axis; decode_step expects batch=1
                    # (kv_len scalars survive the [None]: the decode mixer
                    # reshapes them, models/nano.attention_mixer_decode)
                    layers = jax.tree_util.tree_map(lambda x: x[None], layers)
                    c = {"layers": layers, "length": length,
                         "valid_from": vf}
                    if ca is not None:
                        c["ca_kv"] = ca  # per-slot TransV rows (pdrop)
                    logits, c2 = decode_step(p, arch, tok[None, None], c)
                    new_layers = jax.tree_util.tree_map(
                        lambda x: x[0], c2["layers"])
                    return logits[0], new_layers

                logits, new_layers = jax.vmap(
                    one, in_axes=(None, 0, 0, 0, 0, 0))(
                    params, tokens, layers_all, ca_all, lengths, valid_from)
                return sample_token(logits, key, self.sampling), new_layers

            def step(params, tokens, cache, lengths, valid_from, key):
                ca_all = cache.get("ca_kv") if has_ca else None

                def body(i, carry):
                    toks, layers, lens, out = carry
                    sub = jax.random.fold_in(key, i)
                    nxt, layers = one_step(
                        params, toks, layers, ca_all, lens, valid_from, sub)
                    out = jax.lax.dynamic_update_index_in_dim(
                        out, nxt, i, axis=1)
                    return (nxt, layers, lens + 1, out)

                out0 = jnp.zeros((tokens.shape[0], n_steps), jnp.int32)
                _, layers, _, out = jax.lax.fori_loop(
                    0, n_steps, body,
                    (tokens, cache["layers"], lengths, out0))
                new_cache = {"layers": layers,
                             "length": cache["length"],
                             "valid_from": cache["valid_from"]}
                if ca_all is not None:
                    new_cache["ca_kv"] = ca_all
                return out, new_cache

            return step

        return cached_jit(key, make)

    def _dispatch_decode(self, rng_key):
        """Dispatch one decode burst for the currently-active slots and
        swap in the post-burst cache handle. Returns (async burst handle,
        active slot list, pre-burst lengths) or None when idle."""
        active = [i for i, r in enumerate(self.slot_req) if r is not None]
        if not active:
            return None
        step = self._get_decode()
        tokens = jnp.asarray(self._last_tokens)
        lengths = jnp.asarray(self.slot_lengths)
        vf = jnp.asarray(self.slot_valid_from)
        burst, self.cache = step(
            self.params, tokens, self.cache, lengths, vf, rng_key)
        return burst, active, np.asarray(self.slot_lengths).copy()

    def _process_burst(self, dispatched) -> None:
        burst, active, lengths = dispatched
        burst = np.asarray(burst)  # (slots, steps_per_sync) — sync point
        n = burst.shape[1]
        for i in active:
            req = self.slot_req[i]
            for j in range(n):
                tok = int(burst[i, j])
                req.output_ids.append(tok)
                self.slot_lengths[i] += 1
                self._last_tokens[i] = tok
                if (tok in self.terminators
                        or len(req.output_ids) >= req.max_new_tokens):
                    req.done = True
                    self.slot_req[i] = None
                    # tokens past the stop were speculative; lengths for this
                    # slot stop mattering — the next prefill overwrites it
                    break
            else:
                continue
        # slots that stopped mid-burst advanced their device-side length by
        # the full burst; correct the host view for slots still running
        # THIS burst (not slots a pending prefill just activated)
        for i in active:
            if self.slot_req[i] is not None:
                self.slot_lengths[i] = int(lengths[i]) + n

    # ------------------------------------------------------------------

    def _finish_pending(self, pending) -> None:
        """Sync a dispatched prefill's first token and finalize the slot."""
        req = pending["req"]
        slot = pending["slot"]
        tok = int(np.asarray(pending["first_tok"])[0])
        req.output_ids.append(tok)
        if tok in self.terminators or req.max_new_tokens <= 1:
            req.done = True
            self.slot_req[slot] = None  # inserted state is abandoned
        else:
            self._last_tokens[slot] = tok

    def run(self, requests: Sequence[Request], rng_seed: int = 0) -> List[Request]:
        """Process all requests to completion (continuous batching).

        Each round pipelines the device work: prefills for queued requests
        and the decode burst for active slots are dispatched back-to-back
        (JAX dispatch is async), prefilled states are scattered into the
        post-burst cache as device ops, and the host syncs once at the end
        of the round — prefill never stalls decode on host round-trips."""
        import time as _time

        for r in requests:
            self.submit(r)
        key = jax.random.PRNGKey(rng_seed)
        # wall-clock stamp after each round's sync: consecutive gaps are
        # the decode-stream stall profile (what chunked prefill bounds)
        self.round_stamps: List[float] = [_time.perf_counter()]
        while (self.queue or self._chunked is not None
               or any(r is not None for r in self.slot_req)):
            # 0. advance the in-flight chunked long-prompt prefill by ONE
            # chunk (async) — bounds how long this round's decode burst
            # waits behind prompt processing
            pending_chunk = (self._advance_chunked()
                             if self._chunked is not None else None)
            # 1. dispatch prefills into free slots (async). Text-only
            # requests landing in the same bucket run as ONE batched
            # prefill program (vLLM batches waiting prompts the same way;
            # short prompts underfill the MXU row dim when run one-by-one).
            pendings = []
            free = self._free_slots()
            taken = []
            while free and self.queue:
                taken.append((self.queue.pop(0), free.pop(0)))
            groups: Dict[int, list] = {}
            singles = []
            requeue = []
            for req, slot in taken:
                if (self.prefill_chunk_tokens
                        and req.prefix is None and req.pixels is None
                        and len(req.input_ids) > self.prefill_chunk_tokens):
                    if (len(req.input_ids) + req.max_new_tokens
                            > self.max_len):
                        req.done = True
                        req.error = (
                            f"request {req.request_id}: prompt "
                            f"{len(req.input_ids)} + max_new_tokens "
                            f"{req.max_new_tokens} exceeds engine "
                            f"max_len {self.max_len}")
                    elif self._chunked is None:
                        self._start_chunked(req, slot)
                    else:
                        # one long prompt in flight at a time — wait
                        requeue.append(req)
                    continue
                if (self.batch_prefill and req.prefix is None
                        and req.pixels is None):
                    try:
                        plan = self._prefill_plan(req)
                    except ValueError as e:
                        req.done = True
                        req.error = str(e)
                        continue
                    groups.setdefault(plan[0], []).append((req, slot, plan))
                else:
                    singles.append((req, slot))
            for bucket, grp in groups.items():
                # split into power-of-two batches so the executable set
                # stays small (keyed on (bucket, B)); remainders of 1 take
                # the serial path
                while len(grp) > 1:
                    b = 1 << (len(grp).bit_length() - 1)
                    pendings.extend(self._dispatch_prefill_batch(grp[:b]))
                    grp = grp[b:]
                singles.extend((req, slot) for req, slot, _ in grp)
            if requeue:
                self.queue = requeue + self.queue
            for req, slot in singles:
                try:
                    if req.prefix is not None:
                        pendings.append(self._dispatch_continue(req, slot))
                    else:
                        pendings.append(self._dispatch_prefill(req, slot))
                except ValueError as e:
                    # per-request capacity failure (like vLLM's per-request
                    # rejection, vllm_infer.py) — don't abort the batch
                    req.done = True
                    req.error = str(e)
            # 2. dispatch the decode burst for already-active slots
            key, sub = jax.random.split(key)
            dispatched = self._dispatch_decode(sub)
            # 3. scatter prefilled states into the post-burst cache
            if pending_chunk is not None:
                pendings.append(pending_chunk)
            for p in pendings:
                self._insert_pending(p)
            # 4. single host sync point for the whole round
            if dispatched is not None:
                self._process_burst(dispatched)
            for p in pendings:
                self._finish_pending(p)
            self.round_stamps.append(_time.perf_counter())
        return list(requests)
