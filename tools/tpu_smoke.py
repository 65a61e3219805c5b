"""Real-TPU smoke: compile + run every Pallas kernel and dispatch path at
serving-critical shapes, against the scan oracle.

WHY THIS EXISTS: the CPU test suite runs Pallas kernels in interpret mode,
which does not enforce Mosaic's lowering constraints — e.g. the rule that a
lane-dim block must be 128-divisible or span the whole axis. That let a
real crash ship: `_lane_blocks(448) -> 112` compiled fine in interpret mode
but Mosaic refused it on hardware, so a B=28/T=256 zero-shot prefill 500'd
(fixed by `_pad_lane_axis`; see docs/PERF.md). This harness is the
regression gate for that class of bug: run it on the real chip after any
kernel/dispatch change.

Shapes covered (flagship head geometry H·N and the engine's real batch /
bucket combinations, including non-128-multiple packed lane counts):

  * decode step kernels: bt single, bt stack (both state dtypes)
  * prefill dispatch: every (B, T) the engine can emit, incl. B >= 128
    and the 448-lane class
  * the superseded-but-exposed kernels: seq bt, pair kernel, packed heads

Exits non-zero on any compile failure or oracle mismatch. ~2-4 min warm
(compiles cache under /root/.cache/jax).

Usage: python tools/tpu_smoke.py [--quick]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rwkv_tts_tpu.ops import wkv7 as W

TOL = 5e-4
FAILURES = []


def rand_inputs(B, T, H, N, seed=0):
    rng = np.random.default_rng(seed)
    shape = (B, T, H, N)
    mk = lambda s=0.3: jnp.asarray(rng.normal(0, s, shape), jnp.float32)
    r, k, v, a0 = mk(), mk(), mk(), mk()
    kk = a0 / jnp.maximum(jnp.linalg.norm(a0, axis=-1, keepdims=True), 1e-6)
    iclr = jax.nn.sigmoid(mk())
    w = jnp.asarray(rng.uniform(-3, -0.5, shape), jnp.float32)
    s0 = jnp.asarray(rng.normal(0, 0.3, (B, H, N, N)), jnp.float32)
    return r, w, k, v, -kk, kk * iclr, s0


def check(tag, fn, args, want):
    t0 = time.perf_counter()
    try:
        got_y, got_s = fn(*args)
        got_y, got_s = np.asarray(got_y), np.asarray(got_s)
    except Exception as e:  # compile/runtime failure IS the signal here
        print(f"FAIL {tag}: {type(e).__name__}: {str(e)[:200]}", flush=True)
        FAILURES.append(tag)
        return
    dy = np.abs(got_y - np.asarray(want[0])).max()
    ds = np.abs(got_s - np.asarray(want[1])).max()
    ok = dy < TOL and ds < TOL and np.isfinite(got_y).all()
    print(f"{'ok  ' if ok else 'FAIL'} {tag}: max|dy|={dy:.2e} "
          f"max|ds|={ds:.2e}  ({time.perf_counter()-t0:.1f}s)", flush=True)
    if not ok:
        FAILURES.append(tag)


def main():
    quick = "--quick" in sys.argv
    if jax.default_backend() != "tpu":
        print(f"refusing: backend is {jax.default_backend()}, not tpu "
              "(this harness exists to catch Mosaic-only constraints)")
        sys.exit(2)
    H, N = (4, 64) if quick else (32, 64)  # real head geometry unless quick

    # --- prefill dispatch: engine batch x bucket combinations -------------
    # (28, 256) is the 448-lane regression; B >= 128 exercises seq-bt.
    shapes = [(8, 64), (28, 256), (7, 16), (130, 64)]
    if not quick:
        shapes += [(32, 512), (128, 64), (3, 12)]  # 12: 4|T but not pow2>4
    for B, T in shapes:
        args = rand_inputs(B, T, H, N, seed=B * 1000 + T)
        want = W.wkv7_scan(*args)
        check(f"prefill_dispatch B={B} T={T}", W.wkv7_prefill_tpu, args, want)

    # --- superseded kernels still exposed ---------------------------------
    B, T = 28, 64
    args = rand_inputs(B, T, H, N, seed=7)
    want = W.wkv7_scan(*args)
    check("seq_bt B=28 T=64", W.wkv7_seq_bt_pallas, args, want)
    check("pair-kernel chunked B=28 T=64 (448 lanes)",
          lambda *a: W.wkv7_chunked_fused(*a, chunk=4), args, want)
    check("packed B=28 T=64", W.wkv7_pallas_packed, args, want)
    check("wy_pallas B=28 T=64 L=16",
          lambda *a: W.wkv7_chunked_wy_pallas(*a, chunk=16), args, want)

    # Pallas inside shard_map (the TP path's wrapping, check_vma=False):
    # Mosaic lowering under a manual mesh is a distinct code path from the
    # plain jit lowering — exercise it on hardware with a 1-device mesh.
    from jax.sharding import Mesh, PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()[:1]), ("model",))
    sm = jax.shard_map(lambda *x: W.wkv7_chunked_wy_pallas(*x, chunk=16),
                       mesh=mesh, in_specs=(P(),) * 7,
                       out_specs=(P(), P()), check_vma=False)
    check("wy_pallas in shard_map (1-dev mesh)", sm, args, want)

    # --- decode-step kernels at serving batch -----------------------------
    B = 128
    r, w, k, v, a, b, s0 = rand_inputs(B, 1, H, N, seed=11)
    want_y, want_s = W.wkv7_scan(r, w, k, v, a, b, s0)
    bt = lambda x: jnp.transpose(x[:, 0], (1, 2, 0))
    s_bt = jnp.transpose(s0, (1, 2, 3, 0))
    y, s = W.wkv7_single_bt(bt(r), bt(w), bt(k), bt(v), bt(a), bt(b), s_bt)
    dy = np.abs(np.transpose(np.asarray(y), (2, 0, 1))
                - np.asarray(want_y[:, 0])).max()
    ds = np.abs(np.transpose(np.asarray(s), (3, 0, 1, 2))
                - np.asarray(want_s)).max()
    status = "ok  " if (dy < TOL and ds < TOL) else "FAIL"
    print(f"{status} single_bt B=128: max|dy|={dy:.2e} max|ds|={ds:.2e}",
          flush=True)
    if status == "FAIL":
        FAILURES.append("single_bt")

    for sdt in (jnp.float32, jnp.bfloat16):
        stack = jnp.stack([s_bt, s_bt * 0.5]).astype(sdt)
        try:
            y2, stack2 = W.wkv7_single_bt_stack(
                bt(r), bt(w), bt(k), bt(v), bt(a), bt(b), stack,
                jnp.int32(0))
            dy2 = np.abs(np.asarray(y2) - np.asarray(y)).max()
            tol = 3e-2 if sdt == jnp.bfloat16 else TOL
            status = "ok  " if dy2 < tol else "FAIL"
            print(f"{status} single_bt_stack[{sdt.__name__}] B=128: "
                  f"max|dy|={dy2:.2e}", flush=True)
            if status == "FAIL":
                FAILURES.append(f"single_bt_stack {sdt}")
        except Exception as e:
            print(f"FAIL single_bt_stack[{sdt.__name__}]: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            FAILURES.append(f"single_bt_stack {sdt}")

    # --- folded decode-step layout (bt_fold): small batch, g heads in
    # lanes — the serving path at 8 <= B < 128 (models/rwkv7.bt_fold).
    # Same kernels, leading dim H/g and lanes g*B: Mosaic sees different
    # block shapes than the unfolded B=128 case, so check on hardware.
    for B, g in ([(8, 16), (32, 4)] if not quick else [(8, 2)]):
        if H % g:
            continue
        r, w, k, v, a, b, s0 = rand_inputs(B, 1, H, N, seed=B * 31 + g)
        want_y, want_s = W.wkv7_scan(r, w, k, v, a, b, s0)

        def fold(x):          # [B, 1, H, N] -> [H/g, N, g*B]
            t = x[:, 0].reshape(B, H // g, g, N)
            return jnp.transpose(t, (1, 3, 2, 0)).reshape(H // g, N, g * B)

        s_f = jnp.transpose(s0.reshape(B, H // g, g, N, N),
                            (1, 3, 4, 2, 0)).reshape(H // g, N, N, g * B)
        y, s = W.wkv7_single_bt(fold(r), fold(w), fold(k), fold(v),
                                fold(a), fold(b), s_f)
        y_u = np.transpose(np.asarray(y).reshape(H // g, N, g, B),
                           (3, 0, 2, 1)).reshape(B, H, N)
        s_u = np.transpose(np.asarray(s).reshape(H // g, N, N, g, B),
                           (4, 0, 3, 1, 2)).reshape(B, H, N, N)
        dy = np.abs(y_u - np.asarray(want_y[:, 0])).max()
        ds = np.abs(s_u - np.asarray(want_s)).max()
        status = "ok  " if (dy < TOL and ds < TOL) else "FAIL"
        print(f"{status} single_bt folded B={B} g={g}: "
              f"max|dy|={dy:.2e} max|ds|={ds:.2e}", flush=True)
        if status == "FAIL":
            FAILURES.append(f"single_bt folded B={B}")
        try:
            stack = jnp.stack([s_f, s_f * 0.5])
            y2, _ = W.wkv7_single_bt_stack(
                fold(r), fold(w), fold(k), fold(v), fold(a), fold(b),
                stack, jnp.int32(0))
            dy2 = np.abs(np.asarray(y2) - np.asarray(y)).max()
            status = "ok  " if dy2 < TOL else "FAIL"
            print(f"{status} single_bt_stack folded B={B} g={g}: "
                  f"max|dy|={dy2:.2e}", flush=True)
            if status == "FAIL":
                FAILURES.append(f"single_bt_stack folded B={B}")
        except Exception as e:
            print(f"FAIL single_bt_stack folded B={B}: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            FAILURES.append(f"single_bt_stack folded B={B}")

    # vocoder MXU conv kernel (ops/conv1d): plain, fused-snake and
    # fused-snake+residual paths vs the XLA conv oracle at a wave-generator
    # shape (bf16 compute → bounded drift, not TOL-exact)
    from rwkv_tts_tpu.models.bicodec import _conv1d, _snake
    from rwkv_tts_tpu.ops.conv1d import conv1d_mxu

    rng = np.random.default_rng(7)
    Ci, T, K, dil = 192, 2048, 7, 3
    xc = jnp.asarray(rng.normal(0, 1, (2, Ci, T)), jnp.float32)
    wc = jnp.asarray(rng.normal(0, (Ci * K) ** -0.5, (Ci, Ci, K)), jnp.float32)
    bc = jnp.asarray(rng.normal(0, 0.1, (Ci,)), jnp.float32)
    ac = jnp.asarray(rng.uniform(0.1, 2.0, (Ci,)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, Ci ** -0.5, (Ci, Ci, 1)), jnp.float32)
    pad = (K - 1) * dil // 2
    for tag, fn, ref_fn in (
        ("conv1d_mxu k7 d3", lambda: conv1d_mxu(xc, wc, bc, dilation=dil,
                                                padding=pad),
         lambda: _conv1d(xc, wc, bc, dilation=dil, padding=pad)),
        ("conv1d_mxu fused snake", lambda: conv1d_mxu(
            xc, wc, bc, dilation=dil, padding=pad, snake_alpha=ac),
         lambda: _conv1d(_snake(xc, ac), wc, bc, dilation=dil, padding=pad)),
        ("conv1d_mxu fused snake+res", lambda: conv1d_mxu(
            xc, w1, bc, snake_alpha=ac, residual=xc),
         lambda: xc + _conv1d(_snake(xc, ac), w1, bc)),
    ):
        t0 = time.perf_counter()
        try:
            got = np.asarray(fn())
            ref = np.asarray(ref_fn())
        except Exception as e:
            print(f"FAIL {tag}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            FAILURES.append(tag)
            continue
        scale = np.abs(ref).max()
        err = np.abs(got - ref).max()
        ok = err < 0.02 * scale and np.isfinite(got).all()
        print(f"{'ok  ' if ok else 'FAIL'} {tag}: max|dy|={err:.2e} "
              f"(scale {scale:.2e})  ({time.perf_counter()-t0:.1f}s)",
              flush=True)
        if not ok:
            FAILURES.append(tag)

    print(f"\n{'ALL OK' if not FAILURES else 'FAILURES: ' + str(FAILURES)}")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
