"""Int8 weight quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tts_tpu.config import RwkvConfig
from rwkv_tts_tpu.models import rwkv7
from rwkv_tts_tpu.ops.quant import (
    dequantize_tensor,
    qmatmul,
    quantize_rwkv_params,
    quantize_tensor,
)

CFG = RwkvConfig(
    n_layer=2, n_embd=128, head_size=64, vocab_size=1000,
    padded_vocab_size=1024, decay_lora=32, a_lora=32, v_lora=16,
    gate_lora=32, dtype="float32", param_dtype="float32",
)


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 256, 128)) * 0.1
    q = quantize_tensor(w)
    assert q["q"].dtype == jnp.int8
    assert q["s"].shape == (4, 1, 128)
    back = dequantize_tensor(q)
    err = jnp.max(jnp.abs(back - w)) / jnp.max(jnp.abs(w))
    assert float(err) < 1.2 / 127


def test_qmatmul_matches_dequant():
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 32)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 64))
    q = quantize_tensor(w)
    y_q = qmatmul(x, q)
    y_ref = x @ dequantize_tensor(q)
    # qmatmul additionally quantizes the activations per row (s8xs8 MXU
    # dot); tolerance covers that extra <=1/254 relative rounding
    scale = np.abs(np.asarray(x)).max(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_ref),
                               rtol=5e-3, atol=float(scale.max()) * 0.05)
    # plain weights pass through
    np.testing.assert_allclose(np.asarray(qmatmul(x, w)), np.asarray(x @ w),
                               rtol=1e-5, atol=1e-6)


def test_quantized_forward_close_to_fp():
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    qparams = quantize_rwkv_params(params)
    tokens = jnp.array([[5, 17, 300, 42, 7]])
    state = rwkv7.init_state(CFG, 1)
    logits_fp, st_fp = rwkv7.forward(params, tokens, state, CFG)
    logits_q, st_q = rwkv7.forward(qparams, tokens, state, CFG)
    assert bool(jnp.all(jnp.isfinite(logits_q)))
    # int8 weight-only quant: logits track fp closely in rank
    a, b = np.asarray(logits_fp[0]), np.asarray(logits_q[0])
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr
    # step path too
    lq, _ = rwkv7.step(qparams, jnp.array([3]), st_q, CFG)
    assert bool(jnp.all(jnp.isfinite(lq)))


def test_quant_layers_zero_is_identity():
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    out = quantize_rwkv_params(params, quant_layers=0)
    assert out is params


def test_quant_layers_partial_first_n_only():
    """--quant-layers N parity (shared_runtime.rs:156-176): blocks 0..N
    quantize, the rest stay full precision, and both forward and step run
    through the segmented layer scan with byte-identical layer-1 weights."""
    from rwkv_tts_tpu.ops.quant import is_quantized

    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    q = quantize_rwkv_params(params, quant_layers=1)
    assert isinstance(q["blocks"], tuple) and len(q["blocks"]) == 2
    seg_q, seg_f = q["blocks"]
    assert is_quantized(seg_q["w_r"]) and is_quantized(seg_q["ffn_v"])
    assert not is_quantized(seg_f["w_r"])
    # the untouched segment is byte-identical to layer 1's original weights
    np.testing.assert_array_equal(np.asarray(seg_f["w_r"][0]),
                                  np.asarray(params["blocks"]["w_r"][1]))
    assert int(seg_q["ln1_w"].shape[0]) == 1
    assert int(seg_f["ln1_w"].shape[0]) == 1

    tokens = jnp.array([[5, 17, 300, 42, 7]])
    state = rwkv7.init_state(CFG, 1)
    logits_fp, st_fp = rwkv7.forward(params, tokens, state, CFG)
    logits_p, st_p = rwkv7.forward(q, tokens, state, CFG)
    assert bool(jnp.all(jnp.isfinite(logits_p)))
    assert st_p["wkv"].shape == st_fp["wkv"].shape
    corr = np.corrcoef(np.asarray(logits_fp[0]), np.asarray(logits_p[0]))[0, 1]
    assert corr > 0.99, corr
    # partial quant errs no more than full quant (fewer layers perturbed)
    full = quantize_rwkv_params(params)
    logits_full, _ = rwkv7.forward(full, tokens, state, CFG)
    err_p = float(jnp.mean(jnp.abs(logits_p - logits_fp)))
    err_full = float(jnp.mean(jnp.abs(logits_full - logits_fp)))
    assert err_p <= err_full * 1.05, (err_p, err_full)
    # step path through the segmented scan
    lq, st2 = rwkv7.step(q, jnp.array([3]), st_p, CFG)
    assert bool(jnp.all(jnp.isfinite(lq)))
    assert st2["wkv"].shape == st_fp["wkv"].shape


def test_quant_layers_partial_composes_with_fused_layout():
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    fused = rwkv7.fuse_params(params, CFG)
    q = quantize_rwkv_params(fused, quant_layers=1)
    assert isinstance(q["blocks"], tuple)
    state = rwkv7.init_state(CFG, 2)
    logits, st = rwkv7.step(q, jnp.array([3, 9]), state, CFG)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # fuse AFTER partial quantization is rejected loudly
    import pytest
    with pytest.raises(ValueError, match="BEFORE quantization"):
        rwkv7.fuse_params(q, CFG)


def test_quant_layers_partial_serves_through_engine():
    """Partial quantization must run the SERVING path end-to-end: the
    one-dispatch lm_program (fused prefill+global+semantic) over the
    segmented blocks, both modes."""
    from rwkv_tts_tpu.config import EngineConfig, TtsArgs
    from rwkv_tts_tpu.runtime.engine import TtsEngine

    import dataclasses
    cfg = dataclasses.replace(CFG, vocab_size=77923,
                              padded_vocab_size=78080)
    params = rwkv7.init_params(cfg, jax.random.PRNGKey(0))
    q = quantize_rwkv_params(params, quant_layers=1)
    eng = TtsEngine(q, cfg,
                    EngineConfig(prefill_buckets=(32, 64),
                                 max_semantic_tokens=8, batch_size=2),
                    use_pallas=False)
    r = eng.generate(TtsArgs(text="partial quant", seed=3, max_tokens=6))
    assert len(r.global_tokens) == 32
    assert all(0 <= t < 4096 for t in r.global_tokens)
    # zero-shot chain too (cached-speaker/cloning route)
    rz = eng.generate(TtsArgs(text="clone", seed=0, zero_shot=True,
                              ref_global_tokens=list(range(32)),
                              max_tokens=6))
    assert rz.global_tokens == list(range(32))


def test_quant_layers_ge_nlayer_is_full():
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    q = quantize_rwkv_params(params, quant_layers=CFG.n_layer + 3)
    assert isinstance(q["blocks"], dict)     # no segmentation
    from rwkv_tts_tpu.ops.quant import is_quantized
    assert is_quantized(q["blocks"]["w_r"])


def test_quant_memory_halved():
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    q = quantize_rwkv_params(params)
    def nbytes(t):
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(t))
    dense_fp = nbytes({k: params["blocks"][k]
                       for k in ("w_r", "w_k", "w_v", "w_o", "ffn_k", "ffn_v")})
    dense_q = nbytes({k: q["blocks"][k]
                      for k in ("w_r", "w_k", "w_v", "w_o", "ffn_k", "ffn_v")})
    assert dense_q < dense_fp * 0.3     # f32 → int8 + small scales


def test_nf4_roundtrip_error():
    from rwkv_tts_tpu.ops.quant import dequantize_tensor_nf4, quantize_tensor_nf4
    w = jax.random.normal(jax.random.PRNGKey(5), (2, 128, 64)) * 0.1
    q = quantize_tensor_nf4(w)
    assert q["q4"].dtype == jnp.uint8
    assert q["q4"].shape == (2, 64, 64)          # two codes per byte
    back = dequantize_tensor_nf4(q)
    err = float(jnp.sqrt(jnp.mean((back - w) ** 2)) / jnp.std(w))
    assert err < 0.12, err                        # ~4-bit relative error


def test_nf4_forward_close_to_fp():
    from rwkv_tts_tpu.ops.quant import quantize_rwkv_params
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    qparams = quantize_rwkv_params(params, kind="nf4")
    tokens = jnp.array([[5, 17, 300, 42, 7]])
    state = rwkv7.init_state(CFG, 1)
    lf, _ = rwkv7.forward(params, tokens, state, CFG)
    lq, _ = rwkv7.forward(qparams, tokens, state, CFG)
    corr = np.corrcoef(np.asarray(lf[0]), np.asarray(lq[0]))[0, 1]
    # random init is worst-case for NF4 (its codebook assumes the normal
    # distribution of trained weights); 0.9 still proves the math is right
    assert corr > 0.9, corr


def test_nf4_memory_quartered():
    from rwkv_tts_tpu.ops.quant import quantize_rwkv_params
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    q = quantize_rwkv_params(params, kind="nf4")
    def nbytes(t):
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(t))
    keys = ("w_r", "w_k", "w_v", "w_o", "ffn_k", "ffn_v")
    fp = nbytes({k: params["blocks"][k] for k in keys})
    nf = nbytes({k: q["blocks"][k] for k in keys})
    assert nf < fp * 0.16


def test_qmm_pallas_matches_dequant():
    """The Pallas decode GEMM (int8 HBM reads, VMEM upcast, bf16 MXU dot)
    must match the dequantized matmul to bf16-input tolerance, across the
    decode shapes (zrkv/w_o/ffn/head-slice tile geometries)."""
    from rwkv_tts_tpu.ops.quant import qmm_pallas

    interp = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    for M, K, N in [(8, 256, 384), (64, 512, 128), (16, 128, 1024)]:
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
        x = rng.normal(size=(M, K)).astype(np.float32)
        q = quantize_tensor(jnp.asarray(w))
        want = np.asarray(jnp.asarray(x) @ dequantize_tensor(q))
        got = np.asarray(qmm_pallas(jnp.asarray(x), q["q"], q["s"],
                                    interpret=interp))
        # x is cast to bf16 inside the kernel
        atol = np.abs(want).max() * 2e-2 + 1e-3
        np.testing.assert_allclose(got, want, atol=atol), (M, K, N)


# -- int4 (w4a16) ----------------------------------------------------------

def test_int4_roundtrip_error():
    from rwkv_tts_tpu.ops.quant import (dequantize_tensor_int4,
                                        quantize_tensor_int4)
    w = jax.random.normal(jax.random.PRNGKey(7), (2, 256, 64)) * 0.1
    q = quantize_tensor_int4(w)
    assert q["q4p"].dtype == jnp.uint8
    assert q["q4p"].shape == (2, 128, 64)          # two codes per byte
    assert q["s4"].shape == (2, 2, 64)             # group=128
    back = dequantize_tensor_int4(q)
    err = float(jnp.sqrt(jnp.mean((back - w) ** 2)) / jnp.std(w))
    # linear int4 with group-128 absmax scales: RMS ~ step/sqrt(12) with
    # step = absmax/7 ~ 3sigma/7 on gaussian weights => ~0.124 sigma
    assert err < 0.13, err


def test_int4_pack_layout_pairs_halves():
    """Byte row j must hold original rows (j | hi-nibble) and
    (j + I/2 | lo-nibble) — the layout the Pallas kernel depends on."""
    from rwkv_tts_tpu.ops.quant import dequantize_tensor_int4, quantize_tensor_int4
    w = np.zeros((8, 4), np.float32)
    w[1, 2] = 0.7        # row 1 → hi nibble of byte row 1
    w[5, 2] = -0.7       # row 5 = 1 + I/2 → lo nibble of byte row 1
    q = quantize_tensor_int4(jnp.asarray(w), group=4)
    packed = np.asarray(q["q4p"])
    assert packed[1, 2] != 0
    back = np.asarray(dequantize_tensor_int4(q))
    np.testing.assert_allclose(back, w, atol=0.06)


def test_int4_qmatmul_matches_dequant():
    from rwkv_tts_tpu.ops.quant import (dequantize_tensor_int4,
                                        quantize_tensor_int4)
    w = jax.random.normal(jax.random.PRNGKey(8), (256, 32)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(9), (8, 256))
    q = quantize_tensor_int4(w)
    y_q = qmatmul(x, q)
    y_ref = x @ dequantize_tensor_int4(q)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


def test_int4_forward_close_to_fp():
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    qparams = quantize_rwkv_params(params, kind="int4")
    tokens = jnp.array([[5, 17, 300, 42, 7]])
    state = rwkv7.init_state(CFG, 1)
    lf, _ = rwkv7.forward(params, tokens, state, CFG)
    lq, st_q = rwkv7.forward(qparams, tokens, state, CFG)
    corr = np.corrcoef(np.asarray(lf[0]), np.asarray(lq[0]))[0, 1]
    # random init is worst-case for 4-bit (same caveat as NF4 above)
    assert corr > 0.9, corr
    lq2, _ = rwkv7.step(qparams, jnp.array([3]), st_q, CFG)
    assert bool(jnp.all(jnp.isfinite(lq2)))


def test_int4_memory_quartered():
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    q = quantize_rwkv_params(params, kind="int4")
    def nbytes(t):
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(t))
    keys = ("w_r", "w_k", "w_v", "w_o", "ffn_k", "ffn_v")
    fp = nbytes({k: params["blocks"][k] for k in keys})
    i4 = nbytes({k: q["blocks"][k] for k in keys})
    assert i4 < fp * 0.16


def test_qmm4_pallas_matches_dequant():
    """The int4 Pallas dequant-GEMM must match the dequantized matmul to
    bf16-activation tolerance across decode tile geometries (incl. an
    odd-N head-slice-like shape)."""
    from rwkv_tts_tpu.ops.quant import (dequantize_tensor_int4, qmm4_pallas,
                                        quantize_tensor_int4)

    interp = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    for M, K, N in [(8, 512, 384), (64, 1024, 128), (16, 256, 640)]:
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
        x = rng.normal(size=(M, K)).astype(np.float32)
        q = quantize_tensor_int4(jnp.asarray(w))
        want = np.asarray(jnp.asarray(x) @ dequantize_tensor_int4(q))
        got = np.asarray(qmm4_pallas(jnp.asarray(x), q["q4p"], q["s4"],
                                     interpret=interp))
        atol = np.abs(want).max() * 2e-2 + 1e-3
        np.testing.assert_allclose(got, want, atol=atol), (M, K, N)
