"""Prefill breakdown at small batch: where do the ~150 ms go?

Times, at the bench first-chunk shape (B=8, T=64, 32L x 2048E):

  * full forward        rwkv7.forward with lengths (what the engine runs)
  * forward, no lengths rwkv7.forward without the masked-prefill extras
  * WKV only x32        wkv7_chunked_fused at the per-layer shape, scanned
                        over 32 layers (same dispatch as the forward)
  * phase A only x32    the paired pair-bt kernel alone
  * combine only x32    phases B+C given precomputed phase-A outputs

Everything is timed at serving granularity with a final scalar device_get
(axon tunnel rule — see docs/PERF.md "Timing methodology caveat").

Usage: python tools/profile_prefill_pieces.py [batch] [T]
"""

import dataclasses
import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rwkv_tts_tpu.config import RwkvConfig
from rwkv_tts_tpu.models import rwkv7
from rwkv_tts_tpu.ops import wkv7


def timeit(fn, n=10, tag=""):
    fence = lambda out: jax.device_get(
        jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    fence(fn())
    print(f"  [{tag}] compiled+warm in {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fence(out)
    dt = (time.perf_counter() - t0) / n
    print(f"  {tag:<22}: {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    on_tpu = jax.default_backend() == "tpu"

    cfg = dataclasses.replace(RwkvConfig(), state_dtype="bfloat16")
    H, N, nl = cfg.n_head, cfg.head_size, cfg.n_layer
    print(f"backend={jax.default_backend()} shape={nl}Lx{cfg.n_embd}E"
          f" B={B} T={T} chunk={wkv7.prefill_chunk_for(T)}", flush=True)

    qparams = rwkv7.make_serving_params(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(qparams)
    state0 = rwkv7.init_state(cfg, B)
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        12293, 40000, (B, T)), jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)

    t_fwd = timeit(lambda: rwkv7.forward(
        qparams, tokens, state0, cfg, use_pallas=on_tpu, lengths=lengths)[0],
        tag="forward(lengths)")
    t_fwd_nl = timeit(lambda: rwkv7.forward(
        qparams, tokens, state0, cfg, use_pallas=on_tpu)[0],
        tag="forward(no lengths)")

    # per-layer WKV inputs at the real shape, random but fixed
    rng = np.random.default_rng(1)
    def mk():
        return jnp.asarray(rng.standard_normal((B, T, H, N)) * 0.1,
                           jnp.float32)
    r, k, v, a = mk(), mk(), mk(), mk()
    b = -a
    w = jnp.asarray(rng.standard_normal((B, T, H, N)) * 0.1 - 0.6,
                    jnp.float32)
    s0 = jnp.zeros((B, H, N, N), jnp.float32)
    L = wkv7.prefill_chunk_for(T)

    @jax.jit
    def wkv32():
        def body(s, _):
            y, s2 = wkv7.wkv7_prefill_tpu(r, w, k, v, a, b, s)
            return s2, y[:, -1, :, :1]
        s_fin, ys = jax.lax.scan(body, s0, None, length=nl)
        return ys
    timeit(wkv32, tag="WKV dispatch x32")

    n_c = T // L
    resh = lambda x: x.astype(jnp.float32).reshape(B * n_c, L, H, N)
    r2, w2, k2, v2, a2, b2 = map(resh, (r, w, k, v, a, b))

    @jax.jit
    def phase_a32():
        def body(c, _):
            y_loc, rho, s_loc, P = wkv7.wkv7_chunk_pair_bt_pallas(
                r2, w2, k2, v2, a2, b2)
            return c + y_loc[0, 0, 0, 0], (s_loc[0, 0, 0, 0],)
        acc, _ = jax.lax.scan(body, 0.0, None, length=nl)
        return acc
    timeit(phase_a32, tag="phase A x32")

    y_loc, rho, s_loc, P = wkv7.wkv7_chunk_pair_bt_pallas(
        r2, w2, k2, v2, a2, b2)
    jax.block_until_ready(P)

    @jax.jit
    def combine32():
        def body(s, _):
            y, s_fin = wkv7._chunk_combine(s, y_loc, rho, s_loc, P,
                                           B, T, L, H, N)
            return s_fin, y[0, 0, 0, 0]
        s_fin, ys = jax.lax.scan(body, s0, None, length=nl)
        return ys
    timeit(combine32, tag="combine (B+C) x32")


if __name__ == "__main__":
    main()
