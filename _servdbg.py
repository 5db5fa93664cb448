"""Serving engine phase timing on chip (tiny 4L config, fast compiles)."""
import time, numpy as np, jax, jax.numpy as jnp
from timeviper_tpu.config import NanoConfig, VLMConfig, tiny_vit_config
from timeviper_tpu.models.vlm import VLMArch, init_vlm_params
from timeviper_tpu.serving import engine as E

lcfg = NanoConfig(num_hidden_layers=4, hybrid_override_pattern="M-M*",
                  vocab_size=2048)
arch = VLMArch(vlm=VLMConfig(arch_specifier="tome_mlp-16"),
               vision=tiny_vit_config(), llm=lcfg, llm_family="nano")
params = jax.jit(lambda k: init_vlm_params(k, arch, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
eng = E.ServingEngine(params, arch, terminator_ids=[-2], num_slots=8,
                      max_len=4096, max_new_tokens=16)
rng = np.random.default_rng(0)
reqs = [E.Request(request_id=i, input_ids=rng.integers(3, 2000, (900,)).tolist(),
                  max_new_tokens=16) for i in range(16)]
# warmup
eng.run([E.Request(request_id=99, input_ids=[5]*900, max_new_tokens=2)])
print("warm done", flush=True)

# instrument phases
orig_dp = eng._dispatch_prefill
orig_ip = eng._insert_pending
orig_dd = eng._dispatch_decode
orig_pb = eng._process_burst
orig_fp = eng._finish_pending
acc = {"prefill": 0.0, "insert": 0.0, "decode": 0.0, "burst_sync": 0.0, "finish": 0.0, "n": 0}
def wrap(name, f):
    def g(*a, **k):
        t0 = time.perf_counter(); r = f(*a, **k)
        acc[name] += time.perf_counter() - t0
        return r
    return g
eng._dispatch_prefill = wrap("prefill", orig_dp)
eng._insert_pending = wrap("insert", orig_ip)
eng._dispatch_decode = wrap("decode", orig_dd)
eng._process_burst = wrap("burst_sync", orig_pb)
eng._finish_pending = wrap("finish", orig_fp)

t0 = time.perf_counter()
done = eng.run(reqs)
dt = time.perf_counter() - t0
out = sum(len(r.output_ids) for r in done)
print(f"total {dt:.1f}s for 16 req / {out} tokens -> {16/dt:.2f} req/s", flush=True)
print({k: round(v, 2) for k, v in acc.items()}, flush=True)
