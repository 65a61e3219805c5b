"""Parity: ops/conv1d.conv1d_mxu vs jax.lax.conv_general_dilated.

The MXU conv kernel is the vocoder fast path (models/bicodec._conv1d
dispatches to it under ``BiCodecConfig.conv_impl="mxu"``); its contract
is exact agreement with the XLA conv it replaces at f32 compute, and
bounded drift at the bf16 serving policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tts_tpu.ops.conv1d import conv1d_mxu


def _oracle(x, w, b, dilation, padding):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b[None, :, None]
    return out


CASES = [
    # (B, Ci, O, T, K, dilation)  — the wave-generator conv population
    (2, 96, 96, 640, 7, 1),
    (2, 96, 96, 640, 7, 9),
    (1, 192, 192, 4096, 7, 3),
    (2, 128, 256, 384, 7, 1),     # in-conv-like Ci != O
    (2, 96, 96, 500, 1, 1),       # k1, T not a lane multiple
    (1, 256, 192, 129, 7, 9),     # T_out smaller than one block
]


@pytest.mark.parametrize("B,Ci,O,T,K,dil", CASES)
def test_conv1d_mxu_matches_xla_f32(B, Ci, O, T, K, dil):
    key = jax.random.PRNGKey(hash((B, Ci, O, T, K, dil)) % (2 ** 31))
    kx, kw, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (B, Ci, T), jnp.float32)
    w = jax.random.normal(kw, (O, Ci, K), jnp.float32) / (Ci * K) ** 0.5
    b = jax.random.normal(kb, (O,), jnp.float32)
    pad = (K - 1) * dil // 2
    ref = _oracle(x, w, b, dil, pad)
    got = conv1d_mxu(x, w, b, dilation=dil, padding=pad,
                     compute_dtype=jnp.float32, out_dtype=jnp.float32,
                     interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv1d_mxu_bf16_policy_bounded():
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (1, 192, 2048), jnp.float32)
    w = jax.random.normal(kw, (192, 192, 7), jnp.float32) / (192 * 7) ** 0.5
    ref = np.asarray(_oracle(x, w, None, 1, 3))
    got = np.asarray(conv1d_mxu(x, w, None, dilation=1, padding=3,
                                compute_dtype=jnp.bfloat16,
                                out_dtype=jnp.float32, interpret=True))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) < 0.02 * scale


def test_conv1d_mxu_fused_snake_residual_matches_composition():
    """The fused snake prologue + residual epilogue must equal the
    unfused snake → conv → (+res) composition exactly at f32 compute —
    the contract models/bicodec._residual_unit_fused relies on."""
    from rwkv_tts_tpu.models.bicodec import _snake

    key = jax.random.PRNGKey(7)
    kx, kw1, kb1, ka1, kw2, kb2, ka2 = jax.random.split(key, 7)
    B, C, T, K, dil = 2, 96, 640, 7, 3
    x = jax.random.normal(kx, (B, C, T), jnp.float32)
    w1 = jax.random.normal(kw1, (C, C, K), jnp.float32) / (C * K) ** 0.5
    b1 = jax.random.normal(kb1, (C,), jnp.float32)
    a1 = jax.random.uniform(ka1, (C,), jnp.float32, 0.1, 2.0)
    w2 = jax.random.normal(kw2, (C, C, 1), jnp.float32) / C ** 0.5
    b2 = jax.random.normal(kb2, (C,), jnp.float32)
    a2 = jax.random.uniform(ka2, (C,), jnp.float32, 0.1, 2.0)
    pad = (K - 1) * dil // 2

    h_ref = _oracle(_snake(x, a1), w1, b1, dil, pad)
    ref = x + _oracle(_snake(h_ref, a2), w2, b2, 1, 0)

    h = conv1d_mxu(x, w1, b1, dilation=dil, padding=pad,
                   compute_dtype=jnp.float32, out_dtype=jnp.float32,
                   interpret=True, snake_alpha=a1)
    got = conv1d_mxu(h, w2, b2, compute_dtype=jnp.float32,
                     out_dtype=jnp.float32, interpret=True,
                     snake_alpha=a2, residual=x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv1d_mxu_no_bias_default_out_dtype():
    x = jnp.ones((1, 96, 256), jnp.bfloat16)
    w = jnp.ones((96, 96, 1), jnp.float32)
    y = conv1d_mxu(x, w, None, dilation=1, padding=0, interpret=True)
    assert y.dtype == jnp.bfloat16
    assert y.shape == (1, 96, 256)
    np.testing.assert_allclose(np.asarray(y, np.float32), 96.0, rtol=1e-2)
