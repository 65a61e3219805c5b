"""WKV-7 recurrence: Pallas kernel vs lax.scan oracle vs NumPy loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tts_tpu.ops.wkv7 import (wkv7_pallas, wkv7_scan, wkv7_single,
                                   wkv7_single_pallas)


def numpy_wkv7(r, w, k, v, a, b, state):
    """Direct NumPy transcription of the RWKV-7 state evolution."""
    B, T, H, N = r.shape
    s = state.astype(np.float64).copy()
    y = np.zeros((B, T, H, N), np.float64)
    decay = np.exp(-np.exp(w.astype(np.float64)))
    for t in range(T):
        for bi in range(B):
            for h in range(H):
                S = s[bi, h]
                sa = S @ a[bi, t, h]
                S = (S * decay[bi, t, h][None, :]
                     + np.outer(sa, b[bi, t, h])
                     + np.outer(v[bi, t, h], k[bi, t, h]))
                s[bi, h] = S
                y[bi, t, h] = S @ r[bi, t, h]
    return y, s


def _rand_inputs(B=2, T=17, H=2, N=64, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.normal(0, 1, (B, T, H, N)).astype(np.float32)
    w = (-rng.uniform(0.5, 4.0, (B, T, H, N))).astype(np.float32)  # log-log decay ≤ -0.5
    k = rng.normal(0, 1, (B, T, H, N)).astype(np.float32)
    v = rng.normal(0, 1, (B, T, H, N)).astype(np.float32)
    kk = rng.normal(0, 1, (B, T, H, N)).astype(np.float32)
    kk /= np.linalg.norm(kk, axis=-1, keepdims=True)
    iclr = 1 / (1 + np.exp(-rng.normal(0, 1, (B, T, H, N)))).astype(np.float32)
    a = -kk
    b = kk * iclr
    s0 = rng.normal(0, 0.1, (B, H, N, N)).astype(np.float32)
    return r, w, k, v, a.astype(np.float32), b.astype(np.float32), s0


def test_scan_matches_numpy():
    inputs = _rand_inputs()
    y_ref, s_ref = numpy_wkv7(*inputs)
    y, s = wkv7_scan(*map(jnp.asarray, inputs))
    np.testing.assert_allclose(np.array(y), y_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.array(s), s_ref, rtol=1e-4, atol=1e-4)


def test_pallas_matches_scan():
    inputs = _rand_inputs(seed=1)
    y_ref, s_ref = wkv7_scan(*map(jnp.asarray, inputs))
    y, s = wkv7_pallas(*map(jnp.asarray, inputs),
                       interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(np.array(y), np.array(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.array(s), np.array(s_ref), rtol=1e-5, atol=1e-5)


def test_single_step_matches_scan():
    r, w, k, v, a, b, s0 = _rand_inputs(T=5, seed=2)
    y_seq, s_seq = wkv7_scan(*map(jnp.asarray, (r, w, k, v, a, b, s0)))
    s = jnp.asarray(s0)
    ys = []
    for t in range(5):
        y_t, s = wkv7_single(*(jnp.asarray(x[:, t]) for x in (r, w, k, v, a, b)), s)
        ys.append(np.array(y_t))
    np.testing.assert_allclose(np.stack(ys, 1), np.array(y_seq), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.array(s), np.array(s_seq), rtol=1e-4, atol=1e-5)


def test_single_step_pallas_matches_jnp():
    """The decode-step Pallas kernel == the portable jnp single step, for
    f32 and bf16 state storage (the serving configuration)."""
    r, w, k, v, a, b, s0 = _rand_inputs(T=4, B=3, H=2, seed=7)
    interp = jax.default_backend() != "tpu"
    for sdt in (jnp.float32, jnp.bfloat16):
        s_ref = jnp.asarray(s0).astype(sdt)
        s_pal = jnp.asarray(s0).astype(sdt)
        for t in range(4):
            args = tuple(jnp.asarray(x[:, t]) for x in (r, w, k, v, a, b))
            y_ref, s_ref = wkv7_single(*args, s_ref)
            s_ref = s_ref.astype(sdt)
            y_pal, s_pal = wkv7_single_pallas(*args, s_pal, interpret=interp)
            assert s_pal.dtype == sdt
            np.testing.assert_allclose(
                np.array(y_pal), np.array(y_ref, np.float32),
                rtol=2e-3 if sdt == jnp.bfloat16 else 1e-5,
                atol=2e-3 if sdt == jnp.bfloat16 else 1e-5)
        np.testing.assert_allclose(
            np.array(s_pal, np.float32), np.array(s_ref, np.float32),
            rtol=2e-2 if sdt == jnp.bfloat16 else 1e-5,
            atol=2e-2 if sdt == jnp.bfloat16 else 1e-5)


def test_single_step_bt_matches_jnp():
    """Batch-in-lanes decode kernel (serving layout: seq [H, N, B], state
    [H, N, N, B]) == the portable jnp single step, f32 and bf16 state."""
    from rwkv_tts_tpu.ops.wkv7 import wkv7_single_bt, wkv7_single_bt_pallas

    r, w, k, v, a, b, s0 = _rand_inputs(T=4, B=3, H=4, seed=11)
    interp = jax.default_backend() != "tpu"

    def to_bt(x):        # [B, H, N] -> [H, N, B]
        return jnp.transpose(jnp.asarray(x), (1, 2, 0))

    for sdt in (jnp.float32, jnp.bfloat16):
        s_ref = jnp.asarray(s0).astype(sdt)                    # [B, H, N, N]
        s_bt = jnp.moveaxis(jnp.asarray(s0), 0, -1).astype(sdt)
        for t in range(4):
            args = tuple(jnp.asarray(x[:, t]) for x in (r, w, k, v, a, b))
            bt_args = tuple(to_bt(x) for x in args)
            y_ref, s_ref = wkv7_single(*args, s_ref)
            s_ref = s_ref.astype(sdt)
            # jnp oracle in bt layout
            y_o, s_o = wkv7_single_bt(*bt_args, s_bt)
            # pallas kernel
            y_p, s_bt = wkv7_single_bt_pallas(*bt_args, s_bt, interpret=interp)
            assert s_bt.dtype == sdt
            tol = 2e-3 if sdt == jnp.bfloat16 else 1e-5
            y_ref_bt = np.transpose(np.array(y_ref, np.float32), (1, 2, 0))
            np.testing.assert_allclose(np.array(y_o), y_ref_bt,
                                       rtol=tol, atol=tol)
            np.testing.assert_allclose(np.array(y_p), y_ref_bt,
                                       rtol=tol, atol=tol)
        tol = 2e-2 if sdt == jnp.bfloat16 else 1e-5
        np.testing.assert_allclose(
            np.moveaxis(np.array(s_bt, np.float32), -1, 0),
            np.array(s_ref, np.float32), rtol=tol, atol=tol)


def test_step_bt_layout_matches_portable():
    """models/rwkv7.step with use_pallas=True (bt state layout) produces the
    same logits/state as the portable path, via interpret-mode Pallas."""
    import dataclasses as _dc

    from rwkv_tts_tpu.config import RwkvConfig
    from rwkv_tts_tpu.models import rwkv7 as m

    if jax.default_backend() == "tpu":
        pytest.skip("interpret-mode patching is for CPU CI; TPU runs real kernel")

    cfg = RwkvConfig(n_layer=2, n_embd=128, head_size=64, vocab_size=512,
                     ffn_mult=2)
    cfg = _dc.replace(cfg, state_dtype="float32")
    params = m.init_params(cfg, jax.random.PRNGKey(0))
    B = 2
    state = m.init_state(cfg, B)
    tok = jnp.asarray(np.arange(B), jnp.int32)

    import rwkv_tts_tpu.ops.wkv7 as wkv7mod
    orig = wkv7mod.wkv7_single_bt_pallas
    orig_thresh = m.BT_MIN_BATCH
    # route the kernel through its jnp oracle so the layout plumbing (the
    # thing under test) runs without a TPU; drop the batch threshold so
    # the tiny test batch takes the bt path
    try:
        wkv7mod.wkv7_single_bt_pallas = wkv7mod.wkv7_single_bt
        m.wkv7_single_bt_pallas = wkv7mod.wkv7_single_bt
        m.BT_MIN_BATCH = 0
        g = m.bt_fold(cfg.n_head, B)
        assert g == 2    # H=2, B=2: the head fold itself is under test
        logits_p, st_p = m.step(params, tok, m.state_to_bt(state, g), cfg,
                                use_pallas=True)
        st_p = m.state_from_bt(st_p, g)
    finally:
        wkv7mod.wkv7_single_bt_pallas = orig
        m.wkv7_single_bt_pallas = orig
        m.BT_MIN_BATCH = orig_thresh
    logits_r, st_r = m.step(params, tok, state, cfg, use_pallas=False)
    np.testing.assert_allclose(np.array(logits_p), np.array(logits_r),
                               rtol=1e-4, atol=1e-4)
    for k_ in ("att_x", "ffn_x", "wkv"):
        np.testing.assert_allclose(
            np.array(st_p[k_], np.float32), np.array(st_r[k_], np.float32),
            rtol=1e-4, atol=1e-4, err_msg=k_)


def test_chunked_equals_full():
    """Scanning two chunks with carried state == one full pass (the chunked
    prefill contract, token_chunk_size analog)."""
    r, w, k, v, a, b, s0 = _rand_inputs(T=16, seed=3)
    y_full, s_full = wkv7_scan(*map(jnp.asarray, (r, w, k, v, a, b, s0)))
    s = jnp.asarray(s0)
    y1, s = wkv7_scan(*(jnp.asarray(x[:, :9]) for x in (r, w, k, v, a, b)), s)
    y2, s = wkv7_scan(*(jnp.asarray(x[:, 9:]) for x in (r, w, k, v, a, b)), s)
    np.testing.assert_allclose(
        np.concatenate([np.array(y1), np.array(y2)], 1), np.array(y_full),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(np.array(s), np.array(s_full), rtol=1e-5, atol=1e-6)


def test_decay_bounds():
    # decay must stay in (0, exp(-exp(-0.5))] for valid log-log decays
    w = jnp.full((1, 1, 1, 64), -0.5)
    d = np.exp(-np.exp(np.array(w)))
    assert float(d.max()) <= np.exp(-np.exp(-0.5)) + 1e-7


def test_packed_kernel_matches_scan():
    from rwkv_tts_tpu.ops.wkv7 import wkv7_pallas_packed
    inputs = _rand_inputs(B=2, T=32, H=4, N=64, seed=9)
    y_ref, s_ref = wkv7_scan(*map(jnp.asarray, inputs))
    y, s = wkv7_pallas_packed(*map(jnp.asarray, inputs), t_block=16,
                              interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(np.array(y), np.array(y_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.array(s), np.array(s_ref), rtol=1e-4, atol=1e-4)


def test_packed_kernel_wide_model_blocks():
    """Flagship width (H·N = 2048): the packed kernel must shrink its time
    block to stay within the TPU's 16 MB scoped-VMEM budget and still match
    the scan oracle (regression: BENCH r2 OOMed at C=2048 with the 64-token
    block)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rwkv_tts_tpu.ops.wkv7 import wkv7_pallas_packed, wkv7_scan

    rng = np.random.default_rng(0)
    B, T, H, N = 2, 64, 32, 64          # H·N = 2048 (the 32L×2048E shape)
    shape = (B, T, H, N)
    r, k, v, a = (rng.normal(size=shape).astype(np.float32) * 0.3
                  for _ in range(4))
    a = -a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-6)
    b = -a * rng.uniform(0, 1, shape).astype(np.float32)
    w = -np.exp(rng.normal(size=shape)).astype(np.float32) - 0.5
    s0 = rng.normal(size=(B, H, N, N)).astype(np.float32) * 0.1

    want_y, want_s = wkv7_scan(*map(jnp.asarray, (r, w, k, v, a, b, s0)))
    y, s = wkv7_pallas_packed(*map(jnp.asarray, (r, w, k, v, a, b, s0)),
                              interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               rtol=2e-4, atol=2e-4)


def test_chunked_matches_scan():
    """Chunkwise-parallel formulation must reproduce the sequential scan:
    nonzero entry state, several chunk sizes, non-divisible fallback."""
    from rwkv_tts_tpu.ops.wkv7 import wkv7_chunked, wkv7_scan

    rng = np.random.default_rng(3)
    B, T, H, N = 2, 64, 3, 16
    shape = (B, T, H, N)
    r, k, v, a = (rng.normal(size=shape).astype(np.float32) * 0.3
                  for _ in range(4))
    a = -a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-6)
    b = -a * rng.uniform(0, 1, shape).astype(np.float32)
    w = -np.exp(rng.normal(size=shape)).astype(np.float32) - 0.5
    s0 = rng.normal(size=(B, H, N, N)).astype(np.float32) * 0.1
    args = tuple(map(jnp.asarray, (r, w, k, v, a, b, s0)))

    want_y, want_s = wkv7_scan(*args)
    for chunk in (8, 16, 32):
        y, s = wkv7_chunked(*args, chunk=chunk)
        np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                                   rtol=3e-4, atol=3e-4, err_msg=f"chunk={chunk}")
        np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                                   rtol=3e-4, atol=3e-4, err_msg=f"chunk={chunk}")
    # T=10 not divisible by 16 -> sequential fallback, still exact
    short = tuple(x[:, :8] if x.ndim == 4 else x for x in args[:6]) + (args[6],)
    ys, ss = wkv7_chunked(*short, chunk=16)
    wy, ws = wkv7_scan(*short)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(wy), rtol=3e-4, atol=3e-4)


def test_seq_bt_matches_scan():
    """Sequence bt kernel (prefill): exact vs the scan oracle, nonzero
    entry state, T crossing several t-blocks."""
    from rwkv_tts_tpu.ops.wkv7 import wkv7_scan, wkv7_seq_bt_pallas

    rng = np.random.default_rng(5)
    B, T, H, N = 4, 16, 4, 16
    shape = (B, T, H, N)
    r, k, v, a = (rng.normal(size=shape).astype(np.float32) * 0.3
                  for _ in range(4))
    a = -a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-6)
    b = -a * rng.uniform(0, 1, shape).astype(np.float32)
    w = -np.exp(rng.normal(size=shape)).astype(np.float32) - 0.5
    s0 = rng.normal(size=(B, H, N, N)).astype(np.float32) * 0.1
    args = tuple(map(jnp.asarray, (r, w, k, v, a, b, s0)))

    want_y, want_s = wkv7_scan(*args)
    y, s = wkv7_seq_bt_pallas(*args,
                              interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               rtol=2e-4, atol=2e-4)


def test_chunked_with_seq_bt_inner():
    """The chunked wrapper with the sequence kernel as phase-A inner (the
    small-batch TPU prefill path) matches the scan oracle."""
    import functools
    from rwkv_tts_tpu.ops.wkv7 import (wkv7_chunked, wkv7_scan,
                                       wkv7_seq_bt_pallas)

    rng = np.random.default_rng(6)
    B, T, H, N = 2, 32, 2, 16
    shape = (B, T, H, N)
    r, k, v, a = (rng.normal(size=shape).astype(np.float32) * 0.3
                  for _ in range(4))
    a = -a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-6)
    b = -a * rng.uniform(0, 1, shape).astype(np.float32)
    w = -np.exp(rng.normal(size=shape)).astype(np.float32) - 0.5
    s0 = rng.normal(size=(B, H, N, N)).astype(np.float32) * 0.1
    args = tuple(map(jnp.asarray, (r, w, k, v, a, b, s0)))

    want_y, want_s = wkv7_scan(*args)
    inner = functools.partial(wkv7_seq_bt_pallas,
                              interpret=jax.default_backend() != "tpu")
    y, s = wkv7_chunked(*args, chunk=8, inner=inner)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               rtol=3e-4, atol=3e-4)


def test_step_fused_bt_matches_unfused_chain():
    """The fused decode-step kernel (decay/sigmoids/l2norm/v-blend + WKV +
    group-norm/bonus/gate) must match the model's unfused op chain."""
    from rwkv_tts_tpu.ops.wkv7 import wkv7_single, wkv7_step_fused_bt_pallas

    rng = np.random.default_rng(9)
    B, H, N = 4, 3, 16
    C = H * N
    f32 = np.float32
    r, k, v, v_first, g = (rng.normal(size=(B, C)).astype(f32) * 0.5
                           for _ in range(5))
    lo_w, lo_a, lo_v = (rng.normal(size=(B, C)).astype(f32)
                        for _ in range(3))
    k_k = rng.uniform(0.5, 1.0, C).astype(f32)
    k_a = rng.uniform(0.5, 1.0, C).astype(f32)
    w0 = rng.normal(size=C).astype(f32) - 4.0
    a0, v0 = (rng.normal(size=C).astype(f32) * 0.1 for _ in range(2))
    r_k = rng.normal(size=C).astype(f32) * 0.3
    ln_w = rng.uniform(0.8, 1.2, C).astype(f32)
    ln_b = rng.normal(size=C).astype(f32) * 0.1
    state = rng.normal(size=(B, H, N, N)).astype(f32) * 0.2
    eps = 64e-5

    # ---- unfused oracle (mirrors models/rwkv7.step's bt-less chain) ----
    def hv(t):
        return t.reshape(B, H, N)

    w = -np.logaddexp(0, -(w0 + lo_w)) - 0.5          # -softplus(-x)
    iclr = 1.0 / (1.0 + np.exp(-(a0 + lo_a)))
    gate = 1.0 / (1.0 + np.exp(-(v0 + lo_v)))
    v_eff = v + (v_first - v) * gate
    kk0 = (k * k_k).reshape(B, H, N)
    kk = kk0 / np.sqrt((kk0 ** 2).sum(-1, keepdims=True) + 1e-12)
    k_in = (k * (1 + (iclr - 1) * k_a)).reshape(B, H, N)
    b_in = kk * iclr.reshape(B, H, N)
    y, s2 = wkv7_single(*map(jnp.asarray, (
        hv(r), hv(w), k_in, hv(v_eff), -kk, b_in, state)))
    y = np.asarray(y)                                  # [B, H, N]
    mu = y.mean(-1, keepdims=True)
    var = y.var(-1, keepdims=True)
    yn = (y - mu) / np.sqrt(var + eps)
    yn = yn * ln_w.reshape(1, H, N) + ln_b.reshape(1, H, N)
    rk = (hv(r) * k_in * r_k.reshape(1, H, N)).sum(-1, keepdims=True)
    want = ((yn + rk * hv(v_eff)) * hv(g)).reshape(B, C)

    # ---- fused kernel (bt layout) ----
    def bt(t):
        return jnp.asarray(np.transpose(t.reshape(B, H, N), (1, 2, 0)))

    params8 = jnp.asarray(np.stack(
        [x.reshape(H, N) for x in (k_k, k_a, w0, a0, v0, r_k, ln_w, ln_b)]))
    out, s_out = wkv7_step_fused_bt_pallas(
        bt(r), bt(lo_w), bt(lo_a), bt(lo_v), bt(k), bt(v), bt(g),
        bt(v_first), jnp.asarray(np.transpose(state, (1, 2, 3, 0))),
        params8, 1.0, gn_eps=eps,
        interpret=jax.default_backend() != "tpu")
    got = np.transpose(np.asarray(out), (2, 0, 1)).reshape(B, C)
    got_s = np.transpose(np.asarray(s_out), (3, 0, 1, 2))

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_s, np.asarray(s2), rtol=2e-4, atol=2e-4)

    # notfirst = 0 captures v (gate off): v_eff == v
    out0, _ = wkv7_step_fused_bt_pallas(
        bt(r), bt(lo_w), bt(lo_a), bt(lo_v), bt(k), bt(v), bt(g),
        bt(np.zeros_like(v_first)), jnp.asarray(np.transpose(state, (1, 2, 3, 0))),
        params8, 0.0, gn_eps=eps,
        interpret=jax.default_backend() != "tpu")
    assert np.all(np.isfinite(np.asarray(out0)))


def test_chunked_fused_pair_matches_scan():
    """The paired phase-A kernel (one pass for both the local and
    transition runs) must reproduce the sequential scan."""
    import functools
    from rwkv_tts_tpu.ops import wkv7 as W

    rng = np.random.default_rng(11)
    B, T, H, N = 2, 32, 2, 16
    shape = (B, T, H, N)
    r, k, v, a = (rng.normal(size=shape).astype(np.float32) * 0.3
                  for _ in range(4))
    a = -a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-6)
    b = -a * rng.uniform(0, 1, shape).astype(np.float32)
    w = -np.exp(rng.normal(size=shape)).astype(np.float32) - 0.5
    s0 = rng.normal(size=(B, H, N, N)).astype(np.float32) * 0.1
    args = tuple(map(jnp.asarray, (r, w, k, v, a, b, s0)))

    want_y, want_s = W.wkv7_scan(*args)
    interp = jax.default_backend() != "tpu"
    y, s = W.wkv7_chunked_fused(*args, chunk=8, interpret=interp)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               rtol=3e-4, atol=3e-4)


def test_chunked_wy_pallas_matches_scan_and_xla_wy():
    """The VMEM-tiled WY phase-A kernel (wkv7_chunked_wy_pallas) must
    reproduce the sequential scan to f32 tolerance, and its per-cell math
    must be bitwise batch-invariant (grid cells are independent per
    (batch, chunk, head-block))."""
    from rwkv_tts_tpu.ops import wkv7 as W

    rng = np.random.default_rng(13)
    B, T, H, N = 3, 32, 4, 16
    shape = (B, T, H, N)
    r, k, v, a = (rng.normal(size=shape).astype(np.float32) * 0.3
                  for _ in range(4))
    a = -a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-6)
    b = -a * rng.uniform(0, 1, shape).astype(np.float32)
    w = -np.exp(rng.normal(size=shape)).astype(np.float32) - 0.5
    s0 = rng.normal(size=(B, H, N, N)).astype(np.float32) * 0.1
    args = tuple(map(jnp.asarray, (r, w, k, v, a, b, s0)))

    interp = jax.default_backend() != "tpu"
    want_y, want_s = W.wkv7_scan(*args)
    y, s = W.wkv7_chunked_wy_pallas(*args, chunk=8, interpret=interp)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               rtol=3e-4, atol=3e-4)

    # batch invariance: row 0 is bitwise-identical when batched with more
    y1, s1 = W.wkv7_chunked_wy_pallas(
        *(x[:1] for x in args), chunk=8, interpret=interp)
    np.testing.assert_array_equal(np.asarray(y1[0]), np.asarray(y[0]))
    np.testing.assert_array_equal(np.asarray(s1[0]), np.asarray(s[0]))

    # non-power-of-two chunk: the nilpotent-doubling count must still
    # cover every G-power < L (bit_length(L)-2 dropped G⁴·G⁵ at L=6 —
    # found in review; wy_doublings is the fixed formula)
    assert W.wy_doublings(6) == 2 and W.wy_doublings(64) == 5
    assert W.wy_doublings(4) == 1 and W.wy_doublings(1) == 0
    args24 = tuple(x[:, :24] if x.ndim == 4 else x for x in args)
    want_y24, want_s24 = W.wkv7_scan(*args24)
    for fn in (W.wkv7_chunked_wy,
               lambda *a, chunk: W.wkv7_chunked_wy_pallas(
                   *a, chunk=chunk, interpret=interp)):
        y24, s24 = fn(*args24, chunk=6)
        np.testing.assert_allclose(np.asarray(y24), np.asarray(want_y24),
                                   rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(np.asarray(s24), np.asarray(want_s24),
                                   rtol=3e-4, atol=3e-4)


def test_prefill_chunk_is_batch_invariant():
    """Engine token-identity (CLAUDE.md) requires prefill numerics to be
    independent of how many requests share the batch: the chunk length is
    a pure function of T, and a request's rows through the chunked
    decomposition must be bitwise-equal at different batch sizes."""
    from rwkv_tts_tpu.ops import wkv7 as W

    # chunk length is a pure function of T (never of B) — and bounded n_c
    assert W.prefill_chunk_for(16) == 4
    assert W.prefill_chunk_for(64) == 4
    assert W.prefill_chunk_for(256) == 16
    assert W.prefill_chunk_for(1024) == 64
    assert W.prefill_chunk_for(6) is None
    # the WY dispatch rule: largest pow-2 divisor of T, capped at 64
    assert W.wy_chunk_for(16) == 16
    assert W.wy_chunk_for(64) == 64
    assert W.wy_chunk_for(48) == 16
    assert W.wy_chunk_for(256) == 64
    assert W.wy_chunk_for(6) is None
    # lane-axis padding: >128 lane counts must round to 128 multiples
    assert W._pad_lane_axis(28) == 28
    assert W._pad_lane_axis(128) == 128
    assert W._pad_lane_axis(448) == 512
    assert W._pad_lane_axis(512) == 512

    rng = np.random.default_rng(12)
    T, H, N = 16, 2, 16
    one = [rng.normal(size=(1, T, H, N)).astype(np.float32) * 0.3
           for _ in range(4)]
    r, k, v, a = one
    a = -a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-6)
    b = -a * rng.uniform(0, 1, (1, T, H, N)).astype(np.float32)
    w = -np.exp(rng.normal(size=(1, T, H, N))).astype(np.float32) - 0.5
    s0 = rng.normal(size=(1, H, N, N)).astype(np.float32) * 0.1

    def run(batch):
        tile = lambda x: jnp.asarray(np.tile(x, (batch,) + (1,) * (x.ndim - 1)))
        y, s = W.wkv7_chunked_fused(
            tile(r), tile(w), tile(k), tile(v), tile(a), tile(b), tile(s0),
            chunk=W.prefill_chunk_for(T),
            interpret=jax.default_backend() != "tpu")
        return np.asarray(y[0]), np.asarray(s[0])

    y1, s1 = run(1)
    y8, s8 = run(8)
    np.testing.assert_array_equal(y1, y8)
    np.testing.assert_array_equal(s1, s8)

    def run_wy(batch):
        tile = lambda x: jnp.asarray(np.tile(x, (batch,) + (1,) * (x.ndim - 1)))
        y, s = W.wkv7_chunked_wy(
            tile(r), tile(w), tile(k), tile(v), tile(a), tile(b), tile(s0),
            chunk=W.wy_chunk_for(T))
        return np.asarray(y[0]), np.asarray(s[0])

    y1, s1 = run_wy(1)
    y8, s8 = run_wy(8)
    np.testing.assert_array_equal(y1, y8)
    np.testing.assert_array_equal(s1, s8)


def test_single_bt_stack_in_place():
    """The in-place stack decode kernel (wkv7_single_bt_stack): updates
    exactly layer ``l``'s slab of the full [L, H, N, N, B] state stack
    (aliased buffer), matches the per-layer kernel's math, and preserves
    every other layer's slab."""
    from rwkv_tts_tpu.ops.wkv7 import wkv7_single_bt, wkv7_single_bt_stack

    L = 3
    r, w, k, v, a, b, s0 = _rand_inputs(T=1, B=3, H=4, seed=21)
    interp = jax.default_backend() != "tpu"

    def to_bt(x):        # [B, H, N] -> [H, N, B]
        return jnp.transpose(jnp.asarray(x[:, 0]), (1, 2, 0))

    bt_args = tuple(to_bt(x) for x in (r, w, k, v, a, b))
    rng = np.random.default_rng(5)
    for sdt in (jnp.float32, jnp.bfloat16):
        stack = jnp.asarray(
            rng.normal(size=(L,) + bt_args[0].shape[:2]
                       + (bt_args[0].shape[1], bt_args[0].shape[2]))
            .astype(np.float32) * 0.2).astype(sdt)  # [L, H, N, N, B]
        for layer in (0, 2):
            y_ref, s_ref = wkv7_single_bt(*bt_args,
                                          stack[layer].astype(jnp.float32))
            y, stack2 = wkv7_single_bt_stack(*bt_args, stack,
                                             jnp.int32(layer),
                                             interpret=interp)
            assert stack2.dtype == sdt
            tol = 2e-2 if sdt == jnp.bfloat16 else 1e-5
            np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                       rtol=tol, atol=tol)
            np.testing.assert_allclose(
                np.asarray(stack2[layer], np.float32),
                np.asarray(s_ref.astype(sdt), np.float32),
                rtol=tol, atol=tol)
            for other in range(L):       # untouched slabs preserved
                if other != layer:
                    np.testing.assert_array_equal(
                        np.asarray(stack2[other]), np.asarray(stack[other]))


def test_single_bt_stack_hb_override_identical():
    """The profiling block-size override (wkv7_single_bt_stack hb=) must
    be bit-identical to the heuristic default — it only re-tiles the grid
    (tools/profile_stack_kernel.py relies on this to A/B block sizes),
    and cast=False must agree to bf16 tolerance when fed bf16 operands."""
    from rwkv_tts_tpu.ops.wkv7 import wkv7_single_bt_stack

    L = 2
    r, w, k, v, a, b, s0 = _rand_inputs(T=1, B=3, H=4, seed=33)
    interp = jax.default_backend() != "tpu"

    def to_bt(x):
        return jnp.transpose(jnp.asarray(x[:, 0]), (1, 2, 0))

    bt_args = tuple(to_bt(x) for x in (r, w, k, v, a, b))
    rng = np.random.default_rng(6)
    stack = jnp.asarray(rng.normal(
        size=(L,) + bt_args[0].shape[:2]
        + (bt_args[0].shape[1], bt_args[0].shape[2])
    ).astype(np.float32) * 0.2)
    y0, s_def = wkv7_single_bt_stack(*bt_args, stack, jnp.int32(1),
                                     interpret=interp)
    for hb in (1, 2, 4):
        y, s = wkv7_single_bt_stack(*bt_args, stack, jnp.int32(1),
                                    interpret=interp, hb=hb)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y0))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(s_def))
    bt16 = tuple(x.astype(jnp.bfloat16) for x in bt_args)
    y16, s16 = wkv7_single_bt_stack(*bt16, stack, jnp.int32(1),
                                    interpret=interp, cast=False)
    # bf16 operands through exp(-exp(w)) etc. — coarse agreement only
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y0),
                               rtol=0.15, atol=0.15)
    np.testing.assert_allclose(np.asarray(s16, np.float32),
                               np.asarray(s_def, np.float32),
                               rtol=0.15, atol=0.15)


def test_lane_blocks_bounded_for_any_B():
    """_lane_blocks must never return a block wider than 128 lanes: the
    chunked-prefill pair kernel packs B·n_c lanes (e.g. 28 requests × 16
    chunks = 448) and a single padded block blew the 16 MB VMEM limit on
    real TPU."""
    from rwkv_tts_tpu.ops.wkv7 import _lane_blocks

    for B in (1, 7, 28, 33, 127, 128, 129, 448, 511, 512, 528):
        Bb, n = _lane_blocks(B)
        assert Bb * n == B and Bb <= 128, (B, Bb, n)


def test_chunk_pair_kernel_non_multiple_lane_count():
    """The pair kernel must stay correct when the packed lane count is not
    a multiple of 128 (divisor blocking path)."""
    import numpy as np

    from rwkv_tts_tpu.ops.wkv7 import wkv7_chunked_fused, wkv7_scan

    rng = np.random.default_rng(0)
    B, T, H, N = 7, 16, 2, 64     # chunk L=4 -> 7*4=28 lanes per... B*n_c=28
    def mk(scale=0.5):
        return jnp.asarray(rng.normal(0, scale, (B, T, H, N)), jnp.float32)
    r, k, v, a0 = mk(), mk(), mk(), mk()
    w = jnp.asarray(rng.uniform(-3, -0.5, (B, T, H, N)), jnp.float32)
    kk = a0 / jnp.maximum(jnp.linalg.norm(a0, axis=-1, keepdims=True), 1e-6)
    iclr = jax.nn.sigmoid(mk())
    state = jnp.asarray(rng.normal(0, 0.3, (B, H, N, N)), jnp.float32)

    want_y, want_s = wkv7_scan(r, w, k, v, -kk, kk * iclr, state)
    got_y, got_s = wkv7_chunked_fused(r, w, k, v, -kk, kk * iclr, state,
                                      chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=2e-4, atol=2e-5)


def test_chunked_wy_matches_scan():
    """The WY (all-GEMM) phase A must reproduce the sequential scan at
    every supported chunk length, including the L=64 cap, with a nonzero
    entry state and RWKV-shaped a/b (a = -kk unit-normed, b = kk·iclr)."""
    from rwkv_tts_tpu.ops.wkv7 import wkv7_chunked_wy, wkv7_scan

    rng = np.random.default_rng(17)
    B, T, H, N = 2, 64, 3, 16
    shape = (B, T, H, N)
    r, k, v, a = (rng.normal(size=shape).astype(np.float32) * 0.3
                  for _ in range(4))
    a = -a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-6)
    b = -a * rng.uniform(0, 1, shape).astype(np.float32)
    w = -np.exp(rng.normal(size=shape)).astype(np.float32) - 0.5
    s0 = rng.normal(size=(B, H, N, N)).astype(np.float32) * 0.1
    args = tuple(map(jnp.asarray, (r, w, k, v, a, b, s0)))

    want_y, want_s = wkv7_scan(*args)
    for chunk in (4, 8, 16, 32, 64):
        y, s = wkv7_chunked_wy(*args, chunk=chunk)
        np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"chunk={chunk}")
        np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"chunk={chunk}")


def test_chunked_wy_decay_floor_stress():
    """WY score factors carry exp(-Σ log d), which grows as (1/0.545)^L at
    the softplus decay floor (w = -0.5 exactly). At the L=64 cap that is
    e^{38.8} ≈ 7e16 — must stay finite and ACCURATE in f32 because every
    exposed product telescopes back to ≤ 1 decay ratios."""
    from rwkv_tts_tpu.ops.wkv7 import wkv7_chunked_wy, wkv7_scan

    rng = np.random.default_rng(19)
    B, T, H, N = 1, 64, 2, 16
    shape = (B, T, H, N)
    r, k, v, a = (rng.normal(size=shape).astype(np.float32) * 0.3
                  for _ in range(4))
    a = -a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-6)
    b = -a * rng.uniform(0, 1, shape).astype(np.float32)
    w = np.full(shape, -0.5, np.float32)        # decay floor everywhere
    s0 = rng.normal(size=(B, H, N, N)).astype(np.float32) * 0.1
    args = tuple(map(jnp.asarray, (r, w, k, v, a, b, s0)))

    want_y, want_s = wkv7_scan(*args)
    y, s = wkv7_chunked_wy(*args, chunk=64)
    assert np.all(np.isfinite(np.asarray(y)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               rtol=3e-4, atol=3e-4)
