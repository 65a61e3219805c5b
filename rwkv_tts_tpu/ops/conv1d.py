"""MXU-rate stride-1 dilated 1-D convolution (Pallas) for the BiCodec
vocoder.

Why this exists: the DAC wave generator (models/bicodec.wave_generator)
is conv-compute-bound — ~4.5 TFLOP per 8x512-token detokenize call, ~95%
of it in the stride-1 k7/k1 convs of the residual units. XLA's
``conv_general_dilated`` lowering runs those at roughly the *f32* MXU
rate regardless of operand dtype (the bf16 compute policy measured +-3%
of f32 — docs/PERF.md "BiCodec vocoder precision policy"), and the two
GEMM reformulations that chase the 4x bf16 rate from inside XLA both
lose to materialization traffic (im2col: patch tensor; tap-unrolled
dots: K partial-sum tensors — docs/PERF.md "measured and rejected").

The only formulation that gets the bf16 MXU rate without the traffic is
a kernel that holds the accumulator in VMEM: read x once, run K
accumulated [O_blk, Ci] @ [Ci, T_blk] bf16 dots with an f32 accumulator,
write y once.

Halo handling: Pallas BlockSpecs cannot express overlapping input
blocks, so the wrapper materializes overlapping T-windows host-graph
side ([B, nT, Ci, Tw], Tw = T_blk + halo rounded to the 128-lane
boundary) — a single fused XLA copy costing ~1.1x of x's bytes, vs the
K x (tap-unroll) or 2K x (im2col) the rejected formulations paid. For
halo == 0 (k1 convs) the kernel reads the padded input directly.

Parity contract: identical to ``jax.lax.conv_general_dilated`` with
``dimension_numbers=("NCH", "OIH", "NCH")``, stride 1, symmetric
padding, rhs dilation (models/bicodec._conv1d) up to the compute-dtype
rounding; the f32 compute path is tested to oracle tolerance, the bf16
path is accuracy-gated at the vocoder level (tests/test_codecs.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _conv1d_windows_kernel(x_ref, w_ref, b_ref, *rest, K, dil, t_blk,
                           out_dtype, cdt, snake, residual):
    """Blocks: x [1, 1, Ci, Tw] (windowed) or [1, Ci, Tw] (halo-free),
    w [K, O_blk, Ci], bias [O_blk, 1] f32, then optionally snake alpha
    [Ci, 1] f32 and a residual block [1, O_blk, T_blk]; output
    y [1, O_blk, T_blk].

    K accumulated MXU dots; the f32 accumulator lives in VMEM for the
    whole cell, so partial sums never touch HBM (the failure mode of the
    in-XLA tap-unroll). The optional snake prologue / residual-add
    epilogue exist because a standalone custom call breaks the
    elementwise fusion chains XLA builds around its own convs
    (docs/PERF.md "Pallas MXU conv kernel for the vocoder"): computing
    them IN the kernel removes those now-unfused passes over the
    full-size activations instead of adding them back."""
    rest = list(rest)
    a_ref = rest.pop(0) if snake else None
    r_ref = rest.pop(0) if residual else None
    y_ref = rest.pop(0)
    x = x_ref[0, 0] if x_ref.ndim == 4 else x_ref[0]      # [Ci, Tw]
    if snake:
        # snake in f32 (models/bicodec._snake: sin-argument precision
        # matters); snake(0) == 0, so zero padding commutes with it
        a = a_ref[...]                                    # [Ci, 1] f32
        xf = x.astype(jnp.float32)
        x = (xf + jnp.sin(a * xf) ** 2 / (a + 1e-9)).astype(cdt)
    # precision=HIGHEST for f32 operands: they otherwise lower to
    # single-pass bf16-precision MXU dots on real TPU (CLAUDE.md rule).
    # bf16 operands must use DEFAULT — Mosaic rejects an fp32
    # contract-precision matmul on bf16 vectors ("Bad lhs type", hit by
    # the fused-snake path whose bf16 x is computed in-kernel), and they
    # hit the native MXU rate at DEFAULT anyway.
    hi = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
          else jax.lax.Precision.DEFAULT)
    acc = jax.lax.dot_general(
        w_ref[0], x[:, :t_blk], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi) # [O_blk, T_blk]
    for k in range(1, K):
        acc += jax.lax.dot_general(
            w_ref[k], x[:, k * dil: k * dil + t_blk],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)
    acc = acc + b_ref[...]
    if residual:
        acc = acc + r_ref[0].astype(jnp.float32)
    y_ref[0] = acc.astype(out_dtype)


def _pick_blocks(O: int, Ci: int, K: int, t_out: int):
    """(O_blk, T_blk) under the ~16 MB VMEM budget: w block <= ~4 MB,
    x window + y block <= ~2 MB each (double-buffered by the pipeline)."""
    o_blk = O
    while o_blk > 256 and o_blk % 2 == 0 and K * o_blk * Ci * 2 > 4 << 20:
        o_blk //= 2
    # wider T blocks amortize grid overhead for the narrow late stages;
    # narrower ones keep the K unrolled tap slices (each materializes a
    # [Ci, T_blk] VMEM temporary) under the ~16 MB scoped-VMEM limit.
    t_blk = (256 if Ci >= 1024 else 512 if Ci >= 384 else
             1024 if Ci >= 192 else 2048)
    t_blk = min(t_blk, _round_up(t_out, 128))
    return o_blk, t_blk


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "padding", "compute_dtype", "out_dtype",
                     "interpret"))
def conv1d_mxu(x, w, b=None, dilation: int = 1, padding: int = 0,
               compute_dtype=jnp.bfloat16, out_dtype=None,
               interpret: bool = False, snake_alpha=None, residual=None):
    """Stride-1 grouped=1 conv1d on the MXU. x [B, Ci, T], w [O, Ci, K],
    symmetric ``padding``; returns [B, O, T_out] in ``out_dtype``
    (default: x.dtype). f32 accumulation regardless of compute dtype.

    ``snake_alpha`` [Ci] fuses the DAC snake activation
    (models/bicodec._snake, computed in f32) on the INPUT before the
    taps; ``residual`` [B, O, T_out] fuses ``+ residual`` into the
    epilogue. Together they make ``conv(snake(x)) (+ res)`` one kernel —
    the composition the vocoder's residual units are built from."""
    B, Ci, T = x.shape
    O, _, K = w.shape
    dil = int(dilation)
    t_out = T + 2 * padding - dil * (K - 1)
    out_dtype = jnp.dtype(out_dtype if out_dtype is not None else x.dtype)
    cdt = jnp.dtype(compute_dtype)
    snake = snake_alpha is not None
    # snake is computed in f32 inside the kernel. f32 windows (exact sin
    # arguments) double the window traffic AND the scoped-VMEM footprint
    # (forcing half-size T blocks); bf16 windows keep the full blocks and
    # round only the snake INPUT through bf16 — the same precision class
    # as the bf16 dots themselves, gated by the vocoder-level accuracy
    # tests. Gate on the compute dtype: f32 compute keeps f32 windows.
    x_dt = x.dtype if (snake and cdt == jnp.float32) else cdt

    o_blk, t_blk = _pick_blocks(O, Ci, K, t_out)
    if snake and t_blk > 128:
        # the snake prologue's f32 elementwise temporaries overflow the
        # scoped VMEM stack at the _pick_blocks budget (measured at
        # Ci=768 k7: 18.8 M with f32 windows, 16.9 M with bf16 windows,
        # vs the 16 M limit). Shrink the T block: halve for f32 windows,
        # 3/4 for bf16.
        num, den = (1, 2) if jnp.dtype(x_dt).itemsize > 2 else (3, 4)
        t_blk = max(128, _round_up(t_blk * num // den, 128))
    n_t = -(-t_out // t_blk)
    halo = dil * (K - 1)
    t_w = _round_up(t_blk + halo, 128)

    # windows need xp[:, :, i*t_blk : i*t_blk + t_w] for i < n_t
    need = (n_t - 1) * t_blk + t_w
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, need - T - padding))
                 ).astype(x_dt)
    wk = jnp.transpose(w, (2, 0, 1)).astype(cdt)          # [K, O, Ci]
    bias = (jnp.zeros((O,), jnp.float32) if b is None
            else b.astype(jnp.float32))[:, None]          # [O, 1]

    kern = functools.partial(_conv1d_windows_kernel, K=K, dil=dil,
                             t_blk=t_blk, out_dtype=out_dtype, cdt=cdt,
                             snake=snake, residual=residual is not None)
    grid = (B, O // o_blk, n_t)
    w_spec = pl.BlockSpec((K, o_blk, Ci), lambda bb, o, t: (0, o, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((o_blk, 1), lambda bb, o, t: (o, 0),
                          memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, o_blk, t_blk), lambda bb, o, t: (bb, o, t),
                          memory_space=pltpu.VMEM)

    if halo == 0:
        # k1 (and any halo-free) path: blocks slice the padded input
        # directly — no window tensor at all.
        x_in = xp
        x_spec = pl.BlockSpec((1, Ci, t_w), lambda bb, o, t: (bb, 0, t),
                              memory_space=pltpu.VMEM)
        # t_w == t_blk must hold for direct tiling
        assert t_w == t_blk, (t_w, t_blk)
    else:
        x_in = jnp.stack(
            [jax.lax.slice_in_dim(xp, i * t_blk, i * t_blk + t_w, axis=2)
             for i in range(n_t)], axis=1)                # [B, nT, Ci, Tw]
        x_spec = pl.BlockSpec((1, 1, Ci, t_w),
                              lambda bb, o, t: (bb, t, 0, 0),
                              memory_space=pltpu.VMEM)

    inputs = [x_in, wk, bias]
    in_specs = [x_spec, w_spec, b_spec]
    if snake:
        inputs.append(snake_alpha.astype(jnp.float32)[:, None])   # [Ci, 1]
        in_specs.append(pl.BlockSpec((Ci, 1), lambda bb, o, t: (0, 0),
                                     memory_space=pltpu.VMEM))
    if residual is not None:
        assert residual.shape == (B, O, t_out), (residual.shape, (B, O, t_out))
        res = jnp.pad(residual, ((0, 0), (0, 0), (0, n_t * t_blk - t_out)))
        inputs.append(res)
        in_specs.append(pl.BlockSpec((1, o_blk, t_blk),
                                     lambda bb, o, t: (bb, o, t),
                                     memory_space=pltpu.VMEM))

    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct((B, O, n_t * t_blk), out_dtype),
        interpret=interpret,
    )(*inputs)
    return y[:, :, :t_out]
