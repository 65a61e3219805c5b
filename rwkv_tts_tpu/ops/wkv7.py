"""WKV-7 linear recurrence (RWKV-7 "Goose" dynamic state evolution).

The recurrence, per head with state S ∈ R^{N×N} (value-major: S[i, j] pairs
value channel i with key channel j):

    S_t = S_{t-1} · diag(exp(-exp(w_t)))  +  (S_{t-1} a_t) b_tᵀ  +  v_t k_tᵀ
    y_t = S_t r_t

where, per RWKV-7 convention, ``a = -kk`` (removal direction, L2-normalized)
and ``b = kk * iclr`` (replacement gated by the in-context learning rate).
``w`` is the log-log decay (softplus-clamped to ≤ -0.5 upstream), so the
multiplicative decay exp(-exp(w)) ∈ (0, e^{-e^{-0.5}} ≈ 0.545..1).

The reference executes this as a WGSL shader inside the ``web-rwkv`` crate
(consumed at src/shared_runtime.rs:156-184); here it is a Pallas TPU kernel
gridded over (batch, head) with the state resident in VMEM for the whole
chunk, plus a ``lax.scan`` oracle used for CPU tests and as a numerical
ground truth.

All FLOP-heavy projection matmuls live *outside* this op (they batch over
[B·T] onto the MXU); the recurrence itself is bandwidth-light elementwise +
small matvec work, which is exactly what the VPU wants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    # public dispatches (what the model's forward/step actually use)
    "wkv7", "wkv7_prefill_tpu", "wkv7_single", "wkv7_single_bt_stack",
    # oracles / building blocks
    "wkv7_scan", "wkv7_chunked", "wkv7_chunk_wy",
]


def wkv7_scan(r, w, k, v, a, b, state):
    """Reference implementation via lax.scan.

    r, w, k, v, a, b: [B, T, H, N] float32 (w = log-log decay)
    state: [B, H, N, N] float32
    returns: (y [B, T, H, N], new_state [B, H, N, N])
    """
    decay = jnp.exp(-jnp.exp(w.astype(jnp.float32)))

    def step(s, xs):
        r_t, d_t, k_t, v_t, a_t, b_t = xs          # each [B, H, N]
        sa = jnp.einsum("bhij,bhj->bhi", s, a_t,
                        precision=jax.lax.Precision.HIGHEST)
        s = (
            s * d_t[:, :, None, :]
            + sa[..., None] * b_t[:, :, None, :]
            + v_t[..., None] * k_t[:, :, None, :]
        )
        y_t = jnp.einsum("bhij,bhj->bhi", s, r_t,
                         precision=jax.lax.Precision.HIGHEST)
        return s, y_t

    xs = tuple(
        jnp.moveaxis(x.astype(jnp.float32), 1, 0)
        for x in (r, decay, k, v, a, b)
    )
    state, ys = jax.lax.scan(step, state.astype(jnp.float32), xs)
    return jnp.moveaxis(ys, 0, 1), state


def _wkv7_kernel(r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, s0_ref,
                 y_ref, s_out_ref, s_scratch):
    """Pallas kernel body. Grid: (B·H,). Blocks: [1, T, N] per sequence
    tensor, [1, N, N] for state. The state stays in a VMEM scratch across
    the whole T-loop — zero HBM traffic inside the recurrence."""
    T = r_ref.shape[1]
    s_scratch[:] = s0_ref[0]

    def body(t, _):
        r_t = r_ref[0, t, :]
        d_t = jnp.exp(-jnp.exp(w_ref[0, t, :].astype(jnp.float32)))
        k_t = k_ref[0, t, :]
        v_t = v_ref[0, t, :]
        a_t = a_ref[0, t, :]
        b_t = b_ref[0, t, :]
        s = s_scratch[:]
        # sa_i = Σ_j S[i,j] a[j]
        sa = jnp.dot(s, a_t[:, None], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        s = s * d_t[None, :] + sa * b_t[None, :] + v_t[:, None] * k_t[None, :]
        s_scratch[:] = s
        y = jnp.dot(s, r_t[:, None], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        y_ref[0, t, :] = y[:, 0]
        return 0

    jax.lax.fori_loop(0, T, body, 0)
    s_out_ref[0] = s_scratch[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def wkv7_pallas(r, w, k, v, a, b, state, interpret=False):
    """Pallas WKV-7. Same signature/semantics as :func:`wkv7_scan`.

    Internally flattens to [B·H, T, N] (head-major) so the block's trailing
    two dims (T, N) meet the TPU (8, 128)-tiling rules; the transposes fuse
    into the surrounding projection matmuls under jit.
    """
    B, T, H, N = r.shape
    f32 = jnp.float32

    def flat(x):  # [B, T, H, N] -> [B*H, T, N]
        return jnp.moveaxis(x.astype(f32), 2, 1).reshape(B * H, T, N)

    seq_spec = pl.BlockSpec((1, T, N), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((1, N, N), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    y, s_out = pl.pallas_call(
        _wkv7_kernel,
        grid=(B * H,),
        in_specs=[seq_spec] * 6 + [state_spec],
        out_specs=[seq_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, T, N), f32),
            jax.ShapeDtypeStruct((B * H, N, N), f32),
        ],
        scratch_shapes=[pltpu.VMEM((N, N), f32)],
        interpret=interpret,
    )(
        flat(r), flat(w), flat(k), flat(v), flat(a), flat(b),
        state.astype(f32).reshape(B * H, N, N),
    )
    y = jnp.moveaxis(y.reshape(B, H, T, N), 1, 2)
    return y, s_out.reshape(B, H, N, N)


def wkv7(r, w, k, v, a, b, state, use_pallas: bool | None = None):
    """Public prefill entry point: the measured-best TPU dispatch
    (:func:`wkv7_prefill_tpu` — WY chunkwise below B=128, sequence-bt
    kernel above), the scan oracle elsewhere. The model's forward pass
    calls the dispatch directly; this wrapper exists for external
    callers."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return wkv7_prefill_tpu(r, w, k, v, a, b, state)
    return wkv7_scan(r, w, k, v, a, b, state)


def wkv7_single(r, w, k, v, a, b, state):
    """Single-token step (decode): inputs [B, H, N], state [B, H, N, N].

    Pure jnp: the portable path (CPU tests, goldens). On TPU the einsum /
    elementwise chain materializes several f32 [B, H, N, N] intermediates in
    HBM per layer — use :func:`wkv7_single_pallas` there (one read + one
    write of the state per layer, f32 math in VMEM).
    """
    decay = jnp.exp(-jnp.exp(w.astype(jnp.float32)))
    sa = jnp.einsum("bhij,bhj->bhi", state, a,
                    precision=jax.lax.Precision.HIGHEST)
    state = (
        state * decay[:, :, None, :]
        + sa[..., None] * b[:, :, None, :]
        + v[..., None] * k[:, :, None, :]
    )
    y = jnp.einsum("bhij,bhj->bhi", state, r,
                   precision=jax.lax.Precision.HIGHEST)
    return y, state


def _wkv7_single_kernel(r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, s_ref,
                        y_ref, s_out_ref):
    """One decode step for a G-element batch block. Blocks: seq [G, H, N],
    state [G, H, N, N]. Everything is elementwise + lane reductions over the
    key dim j — pure VPU work; the state makes exactly one HBM round trip.
    The per-g inner loop keeps live f32 temporaries at [H, N, N] size so the
    VMEM footprint stays flat as G grows (bigger blocks = fewer grid steps =
    less per-step DMA/semaphore overhead, which dominated the G=1 version)."""
    G = r_ref.shape[0]

    def body(g, _):
        s = s_ref[g].astype(jnp.float32)                    # [H, N, N]
        r_t = r_ref[g].astype(jnp.float32)                  # [H, N]
        d_t = jnp.exp(-jnp.exp(w_ref[g].astype(jnp.float32)))
        k_t = k_ref[g].astype(jnp.float32)
        v_t = v_ref[g].astype(jnp.float32)
        a_t = a_ref[g].astype(jnp.float32)
        b_t = b_ref[g].astype(jnp.float32)

        # sa[h, i] = Σ_j S[h, i, j] · a[h, j]
        sa = jnp.sum(s * a_t[:, None, :], axis=-1)          # [H, N]
        s = (s * d_t[:, None, :]
             + sa[..., None] * b_t[:, None, :]
             + v_t[..., None] * k_t[:, None, :])
        y_ref[g] = jnp.sum(s * r_t[:, None, :], axis=-1)
        s_out_ref[g] = s.astype(s_out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, G, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def wkv7_single_pallas(r, w, k, v, a, b, state, interpret=False):
    """Pallas decode-step WKV-7; semantics of :func:`wkv7_single`.

    The jnp path costs ~3 extra f32 materializations of the [B, H, N, N]
    state per layer (sa-einsum read, f32 update write, y-einsum read) plus
    TPU-hostile batched matvecs — measured 24.7 of a 29.6 ms decode step at
    the flagship shape/batch 128 (tools/profile_decode.py), ~10× over the
    state's HBM roofline. Here the state streams through VMEM once: read in
    its storage dtype, updated in f32, written back in the storage dtype.
    Returns (y f32 [B, H, N], new_state [B, H, N, N] in ``state.dtype``).
    """
    B, H, N = r.shape
    f32 = jnp.float32
    # largest block that divides B, bounded by a ~2 MB state block:
    # in+out state blocks are double-buffered (4 copies resident) and the
    # f32 loop temporaries add ~1 MB, so 2 MB/block keeps the scoped VMEM
    # footprint ≈9 MB < the 16 MB limit (G=16 at flagship bf16 shape OOMs
    # at 17.4 MB — measured). Sized in bytes so an f32 state halves G
    # instead of doubling the resident blocks.
    cap = max(1, (2 << 20) // (H * N * N * state.dtype.itemsize))
    G = 1
    for g in (16, 8, 4, 2):
        if g <= cap and B % g == 0:
            G = g
            break

    seq_spec = pl.BlockSpec((G, H, N), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((G, H, N, N), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)

    y, s_out = pl.pallas_call(
        _wkv7_single_kernel,
        grid=(B // G,),
        in_specs=[seq_spec] * 6 + [state_spec],
        out_specs=[seq_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, N), f32),
            jax.ShapeDtypeStruct((B, H, N, N), state.dtype),
        ],
        interpret=interpret,
    )(r.astype(f32), w.astype(f32), k.astype(f32), v.astype(f32),
      a.astype(f32), b.astype(f32), state)
    return y, s_out


# --------------------------------------------------------------------------
# Batch-in-lanes ("bt") decode-step kernel. The [B, H, N, N] layouts above
# put the N=64 key dim in lanes — half the 128-lane VPU idles and the j-
# reductions are cross-lane shuffles; measured ceiling ~175 GB/s of state
# traffic. Putting BATCH in lanes instead (state [H, N, N, B], seq
# [H, N, B]) makes every op a full-width elementwise broadcast and turns
# the j-reductions into strided adds over a non-lane axis: measured
# 545 GB/s (~4.1× the jnp chain) at the flagship decode shape. The engine
# carries the decode-loop state in this layout and transposes once per
# stage (runtime/engine.py), so the per-step transposes are only the six
# small [B, H, N] seq inputs.
# --------------------------------------------------------------------------

def wkv7_single_bt(r, w, k, v, a, b, state):
    """Single decode step in batch-in-lanes layout (jnp oracle).

    r, w, k, v, a, b: [H, N, B]; state: [H, N_i, N_j, B].
    Returns (y f32 [H, N, B], new_state [H, N, N, B] f32).
    Semantics identical to :func:`wkv7_single` transposed.
    """
    f32 = jnp.float32
    s = state.astype(f32)
    d = jnp.exp(-jnp.exp(w.astype(f32)))
    af, bf, kf, vf, rf = (x.astype(f32) for x in (a, b, k, v, r))
    sa = jnp.sum(s * af[:, None, :, :], axis=2)              # [H, N, B]
    s = (s * d[:, None, :, :] + sa[:, :, None, :] * bf[:, None, :, :]
         + vf[:, :, None, :] * kf[:, None, :, :])
    y = jnp.sum(s * rf[:, None, :, :], axis=2)
    return y, s


def _wkv7_single_bt_kernel(r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, s_ref,
                           y_ref, s_out_ref):
    """Blocks: seq [Hb, N, B], state [Hb, N, N, B]; lanes = B. The inner
    per-head loop keeps live f32 temporaries at [N, N, B] so VMEM stays flat
    as the head block grows."""
    Hb = s_ref.shape[0]

    def body(h, _):
        s = s_ref[h].astype(jnp.float32)                     # [N, N, B]
        d = jnp.exp(-jnp.exp(w_ref[h]))
        a = a_ref[h]; b = b_ref[h]; k = k_ref[h]
        v = v_ref[h]; r = r_ref[h]
        sa = jnp.sum(s * a[None, :, :], axis=1)              # [N, B]
        s = (s * d[None, :, :] + sa[:, None, :] * b[None, :, :]
             + v[:, None, :] * k[None, :, :])
        y_ref[h] = jnp.sum(s * r[None, :, :], axis=1)
        s_out_ref[h] = s.astype(s_out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, Hb, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def wkv7_single_bt_pallas(r, w, k, v, a, b, state, interpret=False):
    """Pallas batch-in-lanes decode step; semantics of
    :func:`wkv7_single_bt`. Returns (y f32 [H, N, B],
    new_state [H, N, N, B] in ``state.dtype``).

    At B=128 the state streams at ~545 GB/s (66% of v5e HBM roofline) vs
    ~175 GB/s for the best [B, H, N, N]-layout kernel and ~130 GB/s for the
    XLA-fused jnp chain — the layout puts batch in lanes so the VPU runs
    full-width (see module comment above).
    """
    H, N, B = r.shape
    f32 = jnp.float32
    # 2 MB state blocks: in+out double-buffered (4 resident) + one f32
    # [N, N, B] loop temporary keeps scoped VMEM ≈ 8 + 2 MB < 16 MB.
    # Lanes pad to 128, so B < 128 pays the 128-lane footprint.
    elem = jnp.dtype(state.dtype).itemsize
    cap = max(1, (1 << 21) // (N * N * (-(-B // 128) * 128) * elem))
    Hb = 1
    for h in (8, 4, 2):
        if h <= cap and H % h == 0:
            Hb = h
            break

    seq_spec = pl.BlockSpec((Hb, N, B), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((Hb, N, N, B), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)

    y, s_out = pl.pallas_call(
        _wkv7_single_bt_kernel,
        grid=(H // Hb,),
        in_specs=[seq_spec] * 6 + [state_spec],
        out_specs=[seq_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct((H, N, B), f32),
            jax.ShapeDtypeStruct((H, N, N, B), state.dtype),
        ],
        interpret=interpret,
    )(r.astype(f32), w.astype(f32), k.astype(f32), v.astype(f32),
      a.astype(f32), b.astype(f32), state)
    return y, s_out


def _wkv7_single_bt_stack_kernel(l_ref, r_ref, w_ref, k_ref, v_ref, a_ref,
                                 b_ref, s_ref, y_ref, s_out_ref):
    """Same math as :func:`_wkv7_single_bt_kernel`, but the state blocks
    address layer ``l_ref[0]`` of the FULL [L, H, N, N, B] stack (scalar-
    prefetched index), so blocks are [1, Hb, N, N, B]."""
    Hb = r_ref.shape[0]

    def body(h, _):
        s = s_ref[0, h].astype(jnp.float32)                  # [N, N, B]
        d = jnp.exp(-jnp.exp(w_ref[h]))
        a = a_ref[h]; b = b_ref[h]; k = k_ref[h]
        v = v_ref[h]; r = r_ref[h]
        sa = jnp.sum(s * a[None, :, :], axis=1)              # [N, B]
        s = (s * d[None, :, :] + sa[:, None, :] * b[None, :, :]
             + v[:, None, :] * k[None, :, :])
        y_ref[h] = jnp.sum(s * r[None, :, :], axis=1)
        s_out_ref[0, h] = s.astype(s_out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, Hb, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "hb", "cast"))
def wkv7_single_bt_stack(r, w, k, v, a, b, state_stack, layer,
                         interpret=False, hb=None, cast=True):
    """In-place decode WKV on the FULL layer stack.

    r..b: [H, N, B]; state_stack: [L, H, N, N, B] (any float dtype — cast
    to f32 in VMEM); layer: scalar int32. Returns (y [H, N, B] f32,
    new_stack) where ``new_stack`` is ALIASED to ``state_stack``'s buffer
    (``input_output_aliases``): only layer ``layer``'s slab is rewritten,
    the rest is preserved without being copied.

    Why this exists: calling the per-layer kernel inside the layer scan
    makes XLA materialize a dynamic-slice of the state before the custom
    call, dynamic-update-slice the result back, AND copy the full stack
    once per decode step to thread the scan carry — 3× extra round trips
    of the dominant decode traffic (measured: the bt step spent 9.4 ms in
    context vs 3.0 ms inside the kernel at B=128, the difference being
    exactly these copies — docs/PERF.md). Addressing the stack in-kernel
    via a scalar-prefetched layer index + output aliasing makes the state
    cross HBM exactly once each way per step.
    """
    H, N, B = r.shape
    f32 = jnp.float32
    elem = jnp.dtype(state_stack.dtype).itemsize
    if hb is not None:
        # profiling override (tools/profile_stack_kernel.py): caller takes
        # responsibility for the VMEM footprint at this block size
        Hb = hb
    else:
        cap = max(1, (1 << 21) // (N * N * (-(-B // 128) * 128) * elem))
        Hb = 1
        for h in (8, 4, 2):
            if h <= cap and H % h == 0:
                Hb = h
                break

    seq_spec = pl.BlockSpec((Hb, N, B), lambda i, l: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((1, Hb, N, N, B),
                              lambda i, l: (l[0], i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H // Hb,),
        in_specs=[seq_spec] * 6 + [state_spec],
        out_specs=[seq_spec, state_spec],
    )
    y, s_out = pl.pallas_call(
        _wkv7_single_bt_stack_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, N, B), f32),
            jax.ShapeDtypeStruct(state_stack.shape, state_stack.dtype),
        ],
        # inputs are [layer, r, w, k, v, a, b, state]; outputs [y, state]
        input_output_aliases={7: 1},
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(layer, jnp.int32), (1,)),
      *((r.astype(f32), w.astype(f32), k.astype(f32), v.astype(f32),
         a.astype(f32), b.astype(f32)) if cast else (r, w, k, v, a, b)),
      state_stack)
    return y, s_out


# --------------------------------------------------------------------------
# Batch-in-lanes SEQUENCE kernel (prefill). The packed-heads kernel below
# executes B·T sequential inner steps per layer (its grid is (B, T/t_block)
# and TPU grid cells run serially on the core) — at B=128, T=64 that is
# 8192 steps/layer, ~4.3 µs each ⇒ ~1.1 s of a 12 s serving run just for
# prefill WKV. This kernel instead processes ALL batch lanes per step
# (state slab [Hb, N, N, B], lanes = B like the decode bt kernel), so the
# step count drops to (H/Hb)·T per layer — 8× fewer at B=128 — and every
# op runs full-lane-width. Sequence is walked in t-blocks with the state
# carried in a VMEM scratch across blocks (same pattern as the packed
# kernel); per-head inner loop keeps live temporaries at [N, N, Bb]. The
# lane dim is blocked at 128, so any B (or B·n_c from the chunked
# wrapper) stays within the VMEM budget.
# --------------------------------------------------------------------------

def _wkv7_seq_bt_kernel(r_ref, d_ref, k_ref, v_ref, a_ref, b_ref, s0_ref,
                        y_ref, s_out_ref):
    """Blocks: seq [Tb, Hb, N, Bb] (d = decay, precomputed), state
    [Hb, N, N, Bb]. Grid (lanes/Bb, H/Hb, T/Tb): t minor, so the OUTPUT
    state block — which doubles as the running state, saving a scratch
    copy's VMEM — stays resident across the t-blocks of one (lane-block,
    head-block)."""
    Tb, Hb = r_ref.shape[0], r_ref.shape[1]
    tb = pl.program_id(2)

    @pl.when(tb == 0)
    def _():
        s_out_ref[:] = s0_ref[:].astype(jnp.float32)

    def tok(t, _):
        def head(h, _):
            s = s_out_ref[h]                          # [N, N, B] f32
            d = d_ref[t, h]                           # [N, B]
            a = a_ref[t, h]; b = b_ref[t, h]; k = k_ref[t, h]
            v = v_ref[t, h]; r = r_ref[t, h]
            sa = jnp.sum(s * a[None, :, :], axis=1)   # [N, B]
            s = (s * d[None, :, :] + sa[:, None, :] * b[None, :, :]
                 + v[:, None, :] * k[None, :, :])
            s_out_ref[h] = s
            y_ref[t, h] = jnp.sum(s * r[None, :, :], axis=1)
            return 0
        jax.lax.fori_loop(0, Hb, head, 0)
        return 0

    jax.lax.fori_loop(0, Tb, tok, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def wkv7_seq_bt_pallas(r, w, k, v, a, b, state, interpret=False):
    """Batch-in-lanes sequence WKV-7; semantics of :func:`wkv7_scan`.

    r..b: [B, T, H, N]; state [B, H, N, N]. Returns (y [B, T, H, N] f32,
    new_state [B, H, N, N] f32). The lane (batch) dim is blocked at 128,
    so ANY B is VMEM-safe; B < 128 pads lanes (cost of the full 128-lane
    block) — each lane's math is independent of the lane count.
    """
    B0, T, H, N = r.shape
    f32 = jnp.float32
    B = _pad_lane_axis(B0)
    if B != B0:
        pad = lambda x: jnp.pad(x, ((0, B - B0),) + ((0, 0),) * (x.ndim - 1))
        r, w, k, v, a, b, state = map(pad, (r, w, k, v, a, b, state))
    decay = jnp.exp(-jnp.exp(w.astype(f32)))

    def bt(x):  # [B, T, H, N] -> [T, H, N, B]
        return jnp.transpose(x.astype(f32), (1, 2, 3, 0))

    s_bt = jnp.transpose(state.astype(f32), (1, 2, 3, 0))   # [H, N, N, B]

    Bb, n_lb = _lane_blocks(B)
    lanes = -(-Bb // 128) * 128          # Mosaic pads lanes to 128 multiples
    Hb, Tb = _pick_hb_tb(
        lambda hb, tb_c: 4 * (4 * hb * N * N + 14 * tb_c * hb * N) * lanes,
        H, T)

    seq_spec = pl.BlockSpec((Tb, Hb, N, Bb), lambda l, h, t: (t, h, 0, l),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((Hb, N, N, Bb), lambda l, h, t: (h, 0, 0, l),
                              memory_space=pltpu.VMEM)

    y, s_out = pl.pallas_call(
        _wkv7_seq_bt_kernel,
        grid=(n_lb, H // Hb, T // Tb),
        in_specs=[seq_spec] * 6 + [state_spec],
        out_specs=[seq_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, H, N, B), f32),
            jax.ShapeDtypeStruct((H, N, N, B), f32),
        ],
        interpret=interpret,
    )(bt(r), bt(decay), bt(k), bt(v), bt(a), bt(b), s_bt)
    return (jnp.transpose(y, (3, 0, 1, 2))[:B0],
            jnp.transpose(s_out, (3, 0, 1, 2))[:B0])


def _lane_blocks(B: int):
    """Lane-dim blocking: the largest divisor of B that is ≤ 128.

    Keeps every slab at (at most) the 128-lane padded VMEM footprint for
    ANY B. The old fallback put all of B in ONE padded block when 128
    didn't divide it — at chunked-prefill lane counts (B·n_c, e.g.
    28 requests × 16 chunks = 448 lanes) that slab alone blew the 16 MB
    VMEM limit and Mosaic refused to compile. A small divisor (worst
    case 1 for prime B) just means more grid cells — correct, padded to
    128 lanes each.

    NOTE: when the result is more than one block, Mosaic additionally
    requires the lane block to be 128-divisible (a sub-128 block is only
    legal when it spans the WHOLE axis) — callers pad the lane axis with
    :func:`_pad_lane_axis` first, which makes the divisor branch here
    reachable only at B ≤ 128 (single whole-axis block)."""
    if B % 128 == 0:
        return 128, B // 128
    d = next(d for d in range(min(B, 128), 0, -1) if B % d == 0)
    return d, B // d


def _pad_lane_axis(B: int) -> int:
    """Lane counts above 128 must tile in 128-wide blocks (Mosaic rejects
    a sub-128 lane block that does not span the whole axis — hit at
    B·n_c = 448, where the 112-lane block crashed compilation on real
    TPU): round up to the next 128 multiple. B ≤ 128 stays (one
    whole-axis block is legal at any width)."""
    if B > 128 and B % 128:
        return -(-B // 128) * 128
    return B


def _pick_hb_tb(vmem_bytes, H: int, T: int):
    """Largest (Hb, Tb) under a 14 MB scoped-VMEM budget (16 MB limit
    minus slack). ``vmem_bytes(hb, tb)`` models the kernel's footprint at
    the caller's lane-block width padded to a 128 multiple (Mosaic pads
    the lane dim, so e.g. a single 192-lane block occupies 256 lanes);
    (1, 1) always fits by construction of the kernels' block shapes."""
    Hb, Tb = 1, 1
    for hb in (4, 2, 1):
        if H % hb:
            continue
        for tb_c in (16, 8, 4, 2, 1):
            if T % tb_c:
                continue
            if vmem_bytes(hb, tb_c) <= 14 * (1 << 20):
                if hb * tb_c > Hb * Tb:
                    Hb, Tb = hb, tb_c
                break
    return Hb, Tb


# --------------------------------------------------------------------------
# Chunkwise-parallel WKV-7 (prefill). The recurrence
#     S_t = S_{t-1} M_t + v_t k_tᵀ,   M_t = diag(exp(-exp(w_t))) + a_t b_tᵀ
# is linear in S, so a length-T sequence splits into T/L chunks whose
# internals are independent given the chunk-entry state:
#
#   phase A (parallel over B·n_c·H): from a ZERO state, the local run gives
#     y_loc (within-chunk write contributions) and S_loc = Σ v k ᵀ M…M (the
#     chunk's accumulated writes, propagated to its end). A second run with
#     zero writes from an IDENTITY state gives the chunk transition operator
#     P = M_1…M_L and, as its per-step "output", ρ_τ = (M_1…M_τ) r_τ — the
#     key observation is that the running product P_τ obeys the SAME
#     recurrence as the state with no writes, so the existing kernels serve
#     both runs unchanged.
#   phase B (sequential over n_c only): S_in[c+1] = S_in[c] · P[c] + S_loc[c]
#     — one batched [N,N]@[N,N] matmul per chunk on the MXU.
#   phase C (parallel): y_t = y_loc_t + S_in[c] ρ_τ — one batched matmul.
#
# Sequential depth drops from T steps to L (in-chunk) + T/L (chunk scan);
# every step processes B·n_c·H units instead of B·H, which is what the
# VPU/MXU want at small serving batch. Exact in real arithmetic; f32
# rounding differs from the token-sequential path (tested to tolerance).
# No decay-ratio/inverse tricks are needed — P is formed by forward
# products only, so there is none of the 1/cumprod(decay) blowup a
# UT-transform formulation would risk at L > 32.
# --------------------------------------------------------------------------

def wkv7_chunked(r, w, k, v, a, b, state, chunk: int = 16,
                 inner=None):
    """Chunkwise-parallel WKV-7; semantics of :func:`wkv7_scan`.

    r, w, k, v, a, b: [B, T, H, N] (w = log-log decay); state [B, H, N, N].
    ``chunk`` must divide T (callers pad to prefill buckets); ``inner``
    selects the phase-A primitive (defaults to :func:`wkv7_scan`;
    pass :func:`wkv7_pallas_packed` on TPU).
    Returns (y [B, T, H, N] f32, new_state [B, H, N, N] f32).
    """
    B, T, H, N = r.shape
    if inner is None:
        inner = wkv7_scan
    if T % chunk or T <= chunk:
        return inner(r, w, k, v, a, b, state)
    L = chunk
    n_c = T // L
    f32 = jnp.float32

    def resh(x):  # [B, T, H, N] -> [B·n_c, L, H, N]
        return x.astype(f32).reshape(B * n_c, L, H, N)

    zeros_s = jnp.zeros((B * n_c, H, N, N), f32)
    eye_s = jnp.broadcast_to(jnp.eye(N, dtype=f32), (B * n_c, H, N, N))
    zeros_seq = jnp.zeros((B * n_c, L, H, N), f32)

    r2, w2, a2, b2 = resh(r), resh(w), resh(a), resh(b)
    # local run: within-chunk writes only
    y_loc, s_loc = inner(r2, w2, resh(k), resh(v), a2, b2, zeros_s)
    # transition run: P_τ carried as a zero-write state from identity;
    # its "output" is ρ_τ = P_τ r_τ and its final state is P = M_1…M_L
    rho, P = inner(r2, w2, zeros_seq, zeros_seq, a2, b2, eye_s)
    return _chunk_combine(state, y_loc, rho, s_loc, P, B, T, L, H, N)


def _chunk_combine(state, y_loc, rho, s_loc, P, B, T, L, H, N):
    """Phases B and C of the chunkwise decomposition (shared by the
    generic two-run path and the fused pair-kernel path).

    y_loc/rho: [B·n_c, L, H, N]; s_loc/P: [B·n_c, H, N, N];
    state: [B, H, N, N] chunk-entry state of the whole sequence."""
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    n_c = T // L

    # phase B: chunk-level scan (the only sequential part)
    P_c = jnp.moveaxis(P.reshape(B, n_c, H, N, N), 1, 0)       # [n_c, B, …]
    s_loc_c = jnp.moveaxis(s_loc.reshape(B, n_c, H, N, N), 1, 0)

    def body(S, xs):
        P_i, sl_i = xs
        S_next = jnp.einsum("bhij,bhjk->bhik", S, P_i, precision=hp) + sl_i
        return S_next, S                     # emit the chunk-ENTRY state

    S_final, S_in = jax.lax.scan(body, state.astype(f32), (P_c, s_loc_c))

    # phase C: inter-chunk contribution for every position
    rho_c = rho.reshape(B, n_c, L, H, N)
    S_in = jnp.moveaxis(S_in, 0, 1)                            # [B, n_c, …]
    y_inter = jnp.einsum("bchij,bclhj->bclhi", S_in, rho_c, precision=hp)
    y = y_loc.reshape(B, n_c, L, H, N) + y_inter
    return y.reshape(B, T, H, N), S_final


# --------------------------------------------------------------------------
# Fused decode-step kernel: the bt WKV update PLUS the per-head elementwise
# soup around it. At batch 128 the decode step spends ~6.8 ms in ~30 small
# [B, C] passes per layer (docs/PERF.md); the slice of it that is per-head
# math — decay softplus/exp, iclr/v-gate sigmoids, key shaping l2-norm,
# v-residual blend, post-WKV group norm, rk bonus, output gating — moves
# in here, reading each operand from HBM once. Sub-head scalars ([B] per
# head: l2 norm, GN mean/rstd, rk bonus) broadcast back over N with the
# ones-matmul trick (Mosaic cannot relayout [1, B] → [N, B] directly).
# --------------------------------------------------------------------------

def _wkv7_step_fused_bt_kernel(nf_ref, r_ref, low_ref, loa_ref, lov_ref,
                               k_ref, v_ref, g_ref, vf_ref, s_ref, pp_ref,
                               out_ref, s_out_ref, *, gn_eps):
    """Per-head fused step. Blocks: seq [Hb, N, B] f32 ×8, state
    [Hb, N, N, B], params pack [8, Hb, N] f32 (k_k, k_a, w0, a0, v0, r_k,
    ln_x_w, ln_x_b), nf: [1] SMEM f32 (0.0 on the v_first-capture layer,
    else 1.0)."""
    Hb = s_ref.shape[0]
    N = r_ref.shape[1]
    f32 = jnp.float32
    notfirst = nf_ref[0]
    ones = jnp.ones((N, 1), f32)
    hp = jax.lax.Precision.HIGHEST
    # the params pack arrives UNBLOCKED ([8, H, N] — blocking its middle
    # dim by Hb < 8 violates the (8, 128) tile rule); index by absolute
    # head
    h0 = pl.program_id(0) * Hb

    def bc(row1b):                            # [1, B] -> [N, B]
        # ones-matmul broadcast: Mosaic cannot relayout a sublane-
        # replicated [1, B] row onto [N, B] directly
        return jax.lax.dot_general(
            ones, row1b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=hp)

    def head(h, _):
        col = lambda i: pp_ref[i, h0 + h][:, None]        # [N, 1]
        s = s_ref[h].astype(f32)                          # [N, N, B]
        r = r_ref[h]
        w = -jax.nn.softplus(-(col(2) + low_ref[h])) - 0.5
        d = jnp.exp(-jnp.exp(w))
        iclr = jax.nn.sigmoid(col(3) + loa_ref[h])
        gate = jax.nn.sigmoid(col(4) + lov_ref[h]) * notfirst
        v_eff = v_ref[h] + (vf_ref[h] - v_ref[h]) * gate
        kk0 = k_ref[h] * col(0)
        inv = jax.lax.rsqrt(
            jnp.sum(kk0 * kk0, axis=0, keepdims=True) + 1e-12)
        kk = kk0 * bc(inv)
        k_in = k_ref[h] * (1.0 + (iclr - 1.0) * col(1))
        b_in = kk * iclr

        sa = jnp.sum(s * (-kk)[None, :, :], axis=1)       # [N, B]
        s = (s * d[None, :, :] + sa[:, None, :] * b_in[None, :, :]
             + v_eff[:, None, :] * k_in[None, :, :])
        s_out_ref[h] = s.astype(s_out_ref.dtype)
        y = jnp.sum(s * r[None, :, :], axis=1)            # [N, B]

        # GN stats via MXU column-sum dots: a plain axis-0 reduction of y
        # (itself born from the axis-1 state reduction) hits a Mosaic
        # "invalid relayout" — the dot launders the layout and sums in one
        onr = jnp.ones((1, N), f32)

        def csum(t):                          # [N, B] -> [1, B]
            return jax.lax.dot_general(
                onr, t, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=hp)

        mu = csum(y) * (1.0 / N)
        yc = y - bc(mu)
        var = csum(yc * yc) * (1.0 / N)
        yn = yc * bc(jax.lax.rsqrt(var + gn_eps))
        yn = yn * col(6) + col(7)
        rk = jnp.sum(r * k_in * col(5), axis=0, keepdims=True)
        out_ref[h] = (yn + bc(rk) * v_eff) * g_ref[h]
        return 0

    jax.lax.fori_loop(0, Hb, head, 0)


@functools.partial(jax.jit, static_argnames=("gn_eps", "interpret"))
def wkv7_step_fused_bt_pallas(r, lo_w, lo_a, lo_v, k, v, g, v_first, state,
                              params8, notfirst, gn_eps: float = 64e-5,
                              interpret=False):
    """Fused decode step (see kernel above).

    r, lo_w, lo_a, lo_v, k, v, g, v_first: [H, N, B] f32 (bt layout; lo_*
    are the raw LoRA second-stage outputs, pre-bias/activation);
    state [H, N, N, B]; params8 [8, H, N] f32 stacked per-head vectors
    (k_k, k_a, w0, a0, v0, r_k, ln_x_w, ln_x_b); notfirst [1] f32.
    Returns (out [H, N, B] f32 — normalized, bonused, gated attention
    output ready for w_o — and new_state [H, N, N, B] in state.dtype).
    Semantics mirror models/rwkv7.step's unfused chain (tested)."""

    H, N, B = r.shape
    f32 = jnp.float32
    elem = jnp.dtype(state.dtype).itemsize
    # padded-lane footprint (see wkv7_seq_bt_pallas)
    cap = max(1, (1 << 21) // (N * N * (-(-B // 128) * 128) * elem))
    Hb = 1
    for h in (8, 4, 2):
        if h <= cap and H % h == 0:
            Hb = h
            break

    seq_spec = pl.BlockSpec((Hb, N, B), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((Hb, N, N, B), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    pp_spec = pl.BlockSpec((8, H, N), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    nf_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    out, s_out = pl.pallas_call(
        functools.partial(_wkv7_step_fused_bt_kernel, gn_eps=gn_eps),
        grid=(H // Hb,),
        in_specs=[nf_spec] + [seq_spec] * 8 + [state_spec, pp_spec],
        out_specs=[seq_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct((H, N, B), f32),
            jax.ShapeDtypeStruct((H, N, N, B), state.dtype),
        ],
        interpret=interpret,
    )(jnp.asarray(notfirst, f32).reshape(1),
      r.astype(f32), lo_w.astype(f32), lo_a.astype(f32), lo_v.astype(f32),
      k.astype(f32), v.astype(f32), g.astype(f32), v_first.astype(f32),
      state, params8.astype(f32))
    return out, s_out


def _wkv7_chunk_pair_bt_kernel(r_ref, d_ref, k_ref, v_ref, a_ref, b_ref,
                               y_ref, rho_ref, s_out_ref, p_out_ref):
    """Phase A of the chunkwise decomposition, both runs in ONE kernel:
    the S slab accumulates within-chunk writes from a ZERO state while the
    P slab carries the transition product from an IDENTITY state — they
    share the r/w/a/b DMA and the token loop (the two-run formulation
    paid those twice). Blocks: seq [Tb, Hb, N, B]; slabs [Hb, N, N, B],
    accumulated in the output refs (t minor in the grid). rho_t = P_t r_t
    rides along as a second per-token output. Grid (lanes/Bb, H/Hb, T/Tb),
    t minor."""
    Tb, Hb = r_ref.shape[0], r_ref.shape[1]
    N = r_ref.shape[2]
    tb = pl.program_id(2)
    f32 = jnp.float32

    @pl.when(tb == 0)
    def _():
        s_out_ref[:] = jnp.zeros_like(s_out_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, (Hb, N, N, 1), 1)
        colk = jax.lax.broadcasted_iota(jnp.int32, (Hb, N, N, 1), 2)
        p_out_ref[:] = jnp.broadcast_to(
            (row == colk).astype(f32), p_out_ref.shape)

    def tok(t, _):
        def head(h, _):
            d = d_ref[t, h]
            a = a_ref[t, h]; b = b_ref[t, h]; k = k_ref[t, h]
            v = v_ref[t, h]; r = r_ref[t, h]
            s = s_out_ref[h]
            sa = jnp.sum(s * a[None, :, :], axis=1)
            s = (s * d[None, :, :] + sa[:, None, :] * b[None, :, :]
                 + v[:, None, :] * k[None, :, :])
            s_out_ref[h] = s
            y_ref[t, h] = jnp.sum(s * r[None, :, :], axis=1)
            p = p_out_ref[h]
            pa = jnp.sum(p * a[None, :, :], axis=1)
            p = p * d[None, :, :] + pa[:, None, :] * b[None, :, :]
            p_out_ref[h] = p
            rho_ref[t, h] = jnp.sum(p * r[None, :, :], axis=1)
            return 0
        jax.lax.fori_loop(0, Hb, head, 0)
        return 0

    jax.lax.fori_loop(0, Tb, tok, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def wkv7_chunk_pair_bt_pallas(r, w, k, v, a, b, interpret=False):
    """Run phase A's local run (zero init) AND transition run (identity
    init, zero writes) in one kernel pass. Inputs [B, T, H, N]; returns
    (y_loc, rho [B, T, H, N] f32, s_loc, P [B, H, N, N] f32)."""
    B0, T, H, N = r.shape
    f32 = jnp.float32
    B = _pad_lane_axis(B0)
    if B != B0:
        pad = lambda x: jnp.pad(x, ((0, B - B0),) + ((0, 0),) * (x.ndim - 1))
        r, w, k, v, a, b = map(pad, (r, w, k, v, a, b))
    decay = jnp.exp(-jnp.exp(w.astype(f32)))

    def bt(x):
        return jnp.transpose(x.astype(f32), (1, 2, 3, 0))

    # VMEM: TWO accumulated slabs (each double-buffered) + 6 seq blocks +
    # 2 per-token outputs, at the (lane-blocked, 128-padded) lane footprint.
    Bb, n_lb = _lane_blocks(B)
    lanes = -(-Bb // 128) * 128          # Mosaic pads lanes to 128 multiples
    Hb, Tb = _pick_hb_tb(
        lambda hb, tb_c: 4 * (8 * hb * N * N + 16 * tb_c * hb * N) * lanes,
        H, T)

    seq_spec = pl.BlockSpec((Tb, Hb, N, Bb), lambda l, h, t: (t, h, 0, l),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((Hb, N, N, Bb), lambda l, h, t: (h, 0, 0, l),
                              memory_space=pltpu.VMEM)

    y, rho, s_out, p_out = pl.pallas_call(
        _wkv7_chunk_pair_bt_kernel,
        grid=(n_lb, H // Hb, T // Tb),
        in_specs=[seq_spec] * 6,
        out_specs=[seq_spec, seq_spec, state_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, H, N, B), f32),
            jax.ShapeDtypeStruct((T, H, N, B), f32),
            jax.ShapeDtypeStruct((H, N, N, B), f32),
            jax.ShapeDtypeStruct((H, N, N, B), f32),
        ],
        interpret=interpret,
    )(bt(r), bt(decay), bt(k), bt(v), bt(a), bt(b))
    tr = lambda x: jnp.transpose(x, (3, 0, 1, 2))[:B0]
    return tr(y), tr(rho), tr(s_out), tr(p_out)


def wkv7_chunked_fused(r, w, k, v, a, b, state, chunk: int,
                       interpret: bool = False):
    """Chunkwise-parallel WKV-7 with the paired phase-A kernel (see
    :func:`wkv7_chunked` for the math; this fuses its two inner runs)."""
    B, T, H, N = r.shape
    L = chunk
    n_c = T // L
    f32 = jnp.float32

    def resh(x):
        return x.astype(f32).reshape(B * n_c, L, H, N)

    y_loc, rho, s_loc, P = wkv7_chunk_pair_bt_pallas(
        resh(r), resh(w), resh(k), resh(v), resh(a), resh(b),
        interpret=interpret)
    return _chunk_combine(state, y_loc, rho, s_loc, P, B, T, L, H, N)


# --------------------------------------------------------------------------
# WY-transform (all-GEMM) phase A. The paired Pallas kernel above still
# walks the L in-chunk positions sequentially (and its grid serializes over
# heads), so at B=8/T=64 phase A costs ~20 ms and the whole WKV prefill
# ~64 ms — issue-overhead-bound, not bandwidth-bound (docs/PERF.md). The WY
# representation removes the sequential walk entirely:
#
#   With h_t := S_{t-1} a_t, unrolling S_t = S_{t-1}(D_t + a_t b_tᵀ) + v_t k_tᵀ
#   gives   S_t = S_0 D_{1:t} + Σ_{s≤t} (h_s b_sᵀ + v_s k_sᵀ) D_{s+1:t}
#   and     h_t = S_0 â_t + Σ_{s<t} G[t,s] h_s + Σ_{s<t} K[t,s] v_s
#
#   where D_{i:j} = Π diag(d) over the span,  â_t = D_{1:t-1} a_t,  and the
#   score matrices  G[t,s] = â_t · b*_s,  K[t,s] = â_t · k*_s  (s < t) use the
#   decay-weighted vectors  b*_s = b_s ⊙ D_{1:s}⁻¹,  k*_s = k_s ⊙ D_{1:s}⁻¹.
#   Every exposed quantity pairs the weights so the exponents telescope to
#   forward (≤ 1) decay ratios; the lone growing factor D_{1:s}⁻¹ ≤ e^{0.607·L}
#   (decay ≥ e^{-e^{-0.5}} by the upstream softplus clamp) stays finite in f32
#   for L ≤ 64.
#
#   H = (I − G)⁻¹ (Â S_0ᵀ + K V) — and (I − G) is UNIT LOWER TRIANGULAR with
#   strictly-triangular (nilpotent) G, so its inverse X = Σ_{i<L} Gⁱ comes
#   from log₂L GEMM doublings, no solves. Splitting H's S_0 term out, the
#   chunk collapses EXACTLY onto the (y_loc, rho, s_loc, P) contract of
#   :func:`_chunk_combine`:
#
#     rho   = r̂ + R1 (X Â)                         (ρ_t = M_{1:t} r_t)
#     y_loc = R1 H_loc + R2 V,   H_loc = X (K V)
#     P     = diag(e_L) + (X Â)ᵀ B̃                 (chunk transition operator)
#     s_loc = H_locᵀ B̃ + Vᵀ K̃
#
#   with r̂_t = r_t ⊙ D_{1:t}, R1/R2 the inclusive-triangular analogues of
#   G/K built from r̂, e_L = D_{1:L}, and B̃/K̃ = b*/k* ⊙ e_L. Sequential
#   depth per layer drops from L·H kernel iterations to the n_c-step phase-B
#   scan; everything here is batched [M·H, L, L]×[L, N] MXU work.
# --------------------------------------------------------------------------

def wy_doublings(L: int) -> int:
    """Nilpotent-doubling iteration count that covers every G-power < L:
    k iterations of ``G2 = G2²; X += G2·X`` starting from ``X = I + G``
    cover powers < 2^(k+1), so k = ceil(log2 L) − 1."""
    return max((L - 1).bit_length() - 1, 0)


def wkv7_chunk_wy(r, w, k, v, a, b):
    """WY phase A over independent chunks: inputs [M, L, H, N] (M = B·n_c
    lanes), returns ``(y_loc, rho [M, L, H, N] f32, s_loc, P [M, H, N, N]
    f32)`` — the same contract as :func:`wkv7_chunk_pair_bt_pallas`, with
    ``P`` including its diagonal (the pair kernel's does too)."""
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    M, L, H, N = r.shape

    def mh(x):  # [M, L, H, N] -> [M, H, L, N] f32
        return jnp.transpose(x.astype(f32), (0, 2, 1, 3))

    ld = -jnp.exp(mh(w))                       # log per-step decay (< 0)
    lw = jnp.cumsum(ld, axis=2)                # log D_{1:t}
    e = jnp.exp(lw)
    r_, k_, v_, a_, b_ = map(mh, (r, k, v, a, b))
    a_hat = a_ * jnp.exp(lw - ld)              # a_t ⊙ D_{1:t-1}
    b_star = b_ * jnp.exp(-lw)
    k_star = k_ * jnp.exp(-lw)
    r_hat = r_ * e
    e_l = e[:, :, -1]                          # [M, H, N] = D_{1:L}

    def scores(x, y):
        return jnp.einsum("mhtn,mhsn->mhts", x, y, precision=hp)

    def mm(x, y):
        return jnp.einsum("mhts,mhsu->mhtu", x, y, precision=hp)

    def app(s, x):
        return jnp.einsum("mhts,mhsn->mhtn", s, x, precision=hp)

    def outer(x, y):  # Σ_s x_s ⊗ y_s  -> [M, H, N, N]
        return jnp.einsum("mhsi,mhsj->mhij", x, y, precision=hp)

    tri_s = jnp.tril(jnp.ones((L, L), f32), -1)
    tri_i = jnp.tril(jnp.ones((L, L), f32))
    G = scores(a_hat, b_star) * tri_s
    K = scores(a_hat, k_star) * tri_s
    R1 = scores(r_hat, b_star) * tri_i
    R2 = scores(r_hat, k_star) * tri_i

    # X = (I - G)^{-1} = Σ_{i<L} G^i by nilpotent doubling:
    # X_k covers powers < 2^(k+1);  X_{k+1} = X_k + G^{2^(k+1)} X_k.
    # k iterations cover powers < 2^(k+1), so k = ceil(log2 L) - 1 =
    # (L-1).bit_length() - 1 — NOT bit_length(L)-2, which undercounts at
    # non-power-of-two L (e.g. L=6 dropped G⁴, G⁵).
    X = jnp.broadcast_to(jnp.eye(L, dtype=f32), G.shape) + G
    G2 = G
    for _ in range(wy_doublings(L)):
        G2 = mm(G2, G2)
        X = X + mm(G2, X)

    h_loc = app(X, app(K, v_))
    xa = app(X, a_hat)
    y_loc = app(R1, h_loc) + app(R2, v_)
    rho = r_hat + app(R1, xa)
    b_tld = b_star * e_l[:, :, None, :]
    k_tld = k_star * e_l[:, :, None, :]
    P = outer(xa, b_tld) + jnp.eye(N, dtype=f32) * e_l[:, :, None, :]
    s_loc = outer(h_loc, b_tld) + outer(v_, k_tld)

    def unmh(x):
        return jnp.transpose(x, (0, 2, 1, 3))

    return unmh(y_loc), unmh(rho), s_loc, P


def wkv7_chunked_wy(r, w, k, v, a, b, state, chunk: int):
    """Chunkwise-parallel WKV-7 with the WY (all-GEMM) phase A; semantics of
    :func:`wkv7_scan`, same chunking contract as :func:`wkv7_chunked_fused`
    (``chunk`` must divide T)."""
    B, T, H, N = r.shape
    L = chunk
    n_c = T // L
    f32 = jnp.float32

    def resh(x):
        return x.astype(f32).reshape(B * n_c, L, H, N)

    y_loc, rho, s_loc, P = wkv7_chunk_wy(
        resh(r), resh(w), resh(k), resh(v), resh(a), resh(b))
    return _chunk_combine(state, y_loc, rho, s_loc, P, B, T, L, H, N)


def _wkv7_chunk_wy_kernel(r_ref, w_ref, k_ref, v_ref, a_ref, b_ref,
                          y_ref, rho_ref, s_ref, p_ref, *, n_doub):
    """VMEM-resident WY phase A. Blocks: seq [1, L, Hb, N] f32 (w = the
    log-log decay, as everywhere), outputs y/rho the same, s/P
    [1, 1, Hb, N, N] f32; grid (B, n_c, H/Hb). Per (batch, chunk,
    head-block) cell the ENTIRE WY algebra — decay prefactors, the four
    [L, L] score matrices, the (I−G)⁻¹ nilpotent doublings, the chunk
    summaries — lives in VMEM; only the four phase-A results cross HBM.
    (The XLA einsum formulation of :func:`wkv7_chunk_wy` materializes
    every intermediate in HBM — a dozen ~67 MB tensors per layer at
    B=128/L=64 — which is exactly why it lost to the sequential kernel
    at large B·T.) Math is identical to :func:`wkv7_chunk_wy`, with the
    cumulative log-decay computed as a tri@ld MXU dot (Mosaic has no
    cumsum) and [1, N] rows broadcast by ones-dots (sublane-replication
    relayouts are unsupported — see :func:`_wkv7_step_fused_bt_kernel`).
    """
    L, Hb = r_ref.shape[1], r_ref.shape[2]
    N = r_ref.shape[3]
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST

    def dot(x, y, dims):
        return jax.lax.dot_general(x, y, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=f32, precision=hp)

    mm = lambda x, y: dot(x, y, (((1,), (0,))))   # x @ y
    nt = lambda x, y: dot(x, y, (((1,), (1,))))   # x @ yᵀ
    tn = lambda x, y: dot(x, y, (((0,), (0,))))   # xᵀ @ y

    ti = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    tj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri_i = (tj <= ti).astype(f32)                # incl. diagonal
    tri_s = (tj < ti).astype(f32)                 # strict
    eye_l = (tj == ti).astype(f32)
    ni = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    nj = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    eye_n = (nj == ni).astype(f32)
    ones_l = jnp.ones((L, 1), f32)
    ones_n = jnp.ones((N, 1), f32)

    def head(h, _):
        ld = -jnp.exp(w_ref[0, :, h, :])          # [L, N] per-step log decay
        lw = mm(tri_i, ld)                        # cumsum_t(ld) = log D_{1:t}
        e = jnp.exp(lw)
        a_hat = a_ref[0, :, h, :] * jnp.exp(lw - ld)
        b_star = b_ref[0, :, h, :] * jnp.exp(-lw)
        k_star = k_ref[0, :, h, :] * jnp.exp(-lw)
        r_hat = r_ref[0, :, h, :] * e
        v = v_ref[0, :, h, :]

        G = nt(a_hat, b_star) * tri_s
        Ks = nt(a_hat, k_star) * tri_s
        R1 = nt(r_hat, b_star) * tri_i
        R2 = nt(r_hat, k_star) * tri_i

        # X = (I - G)^{-1} by nilpotent doubling (see wkv7_chunk_wy)
        X = eye_l + G
        G2 = G
        for _ in range(n_doub):
            G2 = mm(G2, G2)
            X = X + mm(G2, X)

        h_loc = mm(X, mm(Ks, v))
        xa = mm(X, a_hat)
        y_ref[0, :, h, :] = mm(R1, h_loc) + mm(R2, v)
        rho_ref[0, :, h, :] = r_hat + mm(R1, xa)

        e_row = jnp.exp(lw[L - 1:L, :])           # [1, N] = D_{1:L}
        e_bl = mm(ones_l, e_row)                  # broadcast over rows
        b_tld = b_star * e_bl
        k_tld = k_star * e_bl
        p_ref[0, 0, h] = tn(xa, b_tld) + eye_n * mm(ones_n, e_row)
        s_ref[0, 0, h] = tn(h_loc, b_tld) + tn(v, k_tld)
        return 0

    jax.lax.fori_loop(0, Hb, head, 0)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def wkv7_chunked_wy_pallas(r, w, k, v, a, b, state, chunk: int,
                           interpret=False):
    """Chunkwise-parallel WKV-7, WY phase A as a VMEM-tiled Pallas kernel;
    semantics of :func:`wkv7_scan`, chunking contract of
    :func:`wkv7_chunked_wy` (``chunk`` must divide T)."""
    B, T, H, N = r.shape
    L = chunk
    n_c = T // L
    f32 = jnp.float32
    c32 = lambda x: x.astype(f32)
    Hb = next(hb for hb in (16, 8, 4, 2, 1) if H % hb == 0)

    seq_spec = pl.BlockSpec((1, L, Hb, N), lambda bb, c, g: (bb, c, g, 0),
                            memory_space=pltpu.VMEM)
    sum_spec = pl.BlockSpec((1, 1, Hb, N, N),
                            lambda bb, c, g: (bb, c, g, 0, 0),
                            memory_space=pltpu.VMEM)
    y, rho, s_loc, P = pl.pallas_call(
        functools.partial(_wkv7_chunk_wy_kernel, n_doub=wy_doublings(L)),
        grid=(B, n_c, H // Hb),
        in_specs=[seq_spec] * 6,
        out_specs=[seq_spec, seq_spec, sum_spec, sum_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H, N), f32),
            jax.ShapeDtypeStruct((B, T, H, N), f32),
            jax.ShapeDtypeStruct((B, n_c, H, N, N), f32),
            jax.ShapeDtypeStruct((B, n_c, H, N, N), f32),
        ],
        interpret=interpret,
    )(c32(r), c32(w), c32(k), c32(v), c32(a), c32(b))
    # [B, n_c·L, H, N] → [B·n_c, L, H, N] and [B, n_c, …] → [B·n_c, …]
    # are contiguity-preserving reshapes (free).
    return _chunk_combine(state, y.reshape(B * n_c, L, H, N),
                          rho.reshape(B * n_c, L, H, N),
                          s_loc.reshape(B * n_c, H, N, N),
                          P.reshape(B * n_c, H, N, N), B, T, L, H, N)


def prefill_chunk_for(T: int):
    """Chunk length for the chunkwise prefill: a pure function of T.

    Every lane's math in the chunked decomposition is independent of the
    lane count, so with L = f(T) the prefill numerics are identical for
    every request prefilled at the same T bucket, regardless of batch
    size or burst composition. The T bucket itself is chosen from the
    BATCH-MAX prompt length (engine.py:prefill), so on TPU a request's
    chunk boundaries — and hence f32 reduction order — can still shift
    with its batch-mates: near-tie samples may then differ between
    groupings (e.g. static vs continuous engines, which batch
    differently). That is the same accepted deviation class as occupancy
    buckets and the B≥128 kernel-dispatch boundary (see
    runtime/continuous.decode_block_bucketed and wkv7_prefill_tpu);
    CPU parity tests pin use_pallas=False, where the scan path is
    bit-identical across all groupings.

    Why not a constant L: the phase-B/C combine materializes per-chunk
    [N, N] states — O(B·n_c·H·N²) HBM — so n_c must stay bounded as T
    grows (measured: fixed L=4 at T≥512 exceeds HBM). L ≈ T/16 keeps
    n_c ≈ 16; the lane-blocked phase-A kernel then sees B·n_c ≤ ~2k
    lanes, each block at the fixed 128-lane VMEM footprint.
    """
    if T % 4 != 0 or T <= 4:
        return None
    L = 4
    while L * 2 <= T // 16 and T % (L * 2) == 0:
        L *= 2
    return L


def wy_chunk_for(T: int):
    """Chunk length for the WY (all-GEMM) prefill: the largest power-of-two
    divisor of T, capped at 64 — a pure function of T, so prefill numerics
    stay batch-invariant (same argument as :func:`prefill_chunk_for`).

    The 64 cap is both the f32 range bound (exp(-Σ log d) ≤ e^{0.607·64}
    ≈ 7e16 at the softplus decay floor — see :func:`wkv7_chunk_wy`) and
    near the measured optimum: per-chunk work grows as L² (scores) and L³
    (the (I−G)⁻¹ doublings) while the phase-B scan shrinks as T/L; L=64
    won at every measured (B, T). Returns None for 4 ∤ T (packed-kernel
    fallback)."""
    if T < 4 or T % 4:
        return None
    L = 4
    while L < 64 and T % (L * 2) == 0:
        L *= 2
    return L


def wkv7_prefill_tpu(r, w, k, v, a, b, state):
    """TPU prefill dispatch: pick the fastest exact formulation by shape.

    * B < 128 — the WY (all-GEMM) chunkwise formulation at the
      batch-invariant chunk length :func:`wy_chunk_for`. In-context
      full-forward A/B on the real chip (32L×2048E int8, docs/PERF.md):

        ==========  =====  ========  =======
        shape       B·T    old path  WY
        ==========  =====  ========  =======
        B=8  T=64     512   86.7 ms  37.8 ms
        B=16 T=64    1024  171.5     75.4
        B=8  T=128   1024  109.7     75.1
        B=32 T=64    2048  352.5     178.7
        B=8  T=256   2048  173.1     177.6
        B=64 T=64    4096  830.0     421.6
        ==========  =====  ========  =======

      (the superseded pair-kernel path also CRASHED at non-128-multiple
      lane counts > 128, e.g. B=28/T=256 — see :func:`_pad_lane_axis`);
    * B ≥ 128 — the sequence bt kernel: the XLA WY block materializes
      its [B·n_c, H, L, N] score/factor tensors in HBM, whose traffic
      overtakes the kernel's VMEM-resident walk at large B·T (measured
      B=128/T=64: seq-bt 439 ms vs XLA WY 983 ms in-context; the
      VMEM-tiled WY kernel was built and ALSO loses here — 16.8 vs 6.0
      ms isolated, see docs/PERF.md "Measured and rejected");
    * awkward T (4 ∤ T) — packed-heads fallback.

    Numerics: within one (branch, implementation) a request's rows are
    batch-invariant (chunk length is a pure function of T; per-lane math
    is lane-count independent), but the B=128 branch boundary AND the
    B·T = 2048 WY-implementation boundary below both change f32
    reduction order (the Pallas kernel computes the cumulative log-decay
    as a tri@ld dot, the XLA path as a cumsum), so on TPU a request's
    prefill rounding — and hence near-tie samples — can shift with its
    batch-mates. Same accepted deviation class as occupancy buckets
    (see :func:`prefill_chunk_for`); CPU parity tests pin
    use_pallas=False, where none of these branches are reachable.
    """
    B, T, H, N = r.shape
    L = wy_chunk_for(T)
    if B >= 128:
        return wkv7_seq_bt_pallas(r, w, k, v, a, b, state)
    if L is not None:
        # VMEM-tiled phase A vs the XLA einsum formulation, in-context
        # full-forward A/B (real chip, 32L×2048E): Pallas wins ~10-15%
        # from B·T = 2048 up (B=8/T=256 176.6 → 158.9 ms, B=32/T=64
        # 178.0 → 160.8, B=64/T=64 421.0 → 358.1) but loses slightly
        # below it (B=8/T=64 36.9 → 39.8, B·T=1024 74 → 78 — the XLA
        # path's intermediates are small enough to ride the caches and
        # its casts fuse into the first einsum). At B ≥ 128 the Pallas
        # cell's tiny 64³ dots are MXU-issue-bound (16.8 ms vs seq-bt
        # 6.0 isolated) — seq-bt keeps that branch. B·T is static at
        # trace time, so the pick compiles away.
        if B * T >= 2048:
            return wkv7_chunked_wy_pallas(r, w, k, v, a, b, state, chunk=L)
        return wkv7_chunked_wy(r, w, k, v, a, b, state, chunk=L)
    return wkv7_pallas_packed(r, w, k, v, a, b, state)


# --------------------------------------------------------------------------
# Packed-heads kernel: all H heads of one batch element share a single
# [N, H·N] state block, so the lane dimension is H·N (≥128 — full VPU/MXU
# width; the per-head kernel above only fills 64 of 128 lanes). The
# cross-head terms (S·a, sa·b, v·kᵀ, S·r) become small MXU matmuls against
# block-diagonal selectors built as elementwise products with a constant
# head-one-hot matrix. Grid: (B, T/block) with the state in a VMEM scratch
# carried across the sequential T-blocks.
# --------------------------------------------------------------------------

def _wkv7_packed_kernel(r_ref, d_ref, k_ref, v_ref, a_ref, b_ref, s0_ref,
                        hot_ref, y_ref, s_out_ref, s_scratch):
    T = r_ref.shape[1]
    tb = pl.program_id(1)
    n_tb = pl.num_programs(1)

    @pl.when(tb == 0)
    def _():
        s_scratch[:] = s0_ref[0]

    hot = hot_ref[:]                       # [H·N, H] head one-hot

    def body(t, _):
        r_t = r_ref[0, t, :]               # [H·N]
        d_t = d_ref[0, t, :]
        k_t = k_ref[0, t, :]
        a_t = a_ref[0, t, :]
        b_t = b_ref[0, t, :]
        s = s_scratch[:]                   # [N, H·N]

        # sa[:, h] = Σ_j S[:, h·N+j?] … via block-diagonal selector:
        # (a_t ⊙ hot) is [H·N, H] with head h's a in its own column
        sa = jnp.dot(s, a_t[:, None] * hot,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)      # [N, H]
        # expand back to lanes: sa_exp[i, h·N+j] = sa[i, h]
        sa_exp = jnp.dot(sa, hot.T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)  # [N, H·N]
        # v arrives pre-transposed as [N, H] (in-kernel reshapes across the
        # lane dim are unsupported by Mosaic); expand over lanes
        v_cols = v_ref[0, t, :, :]         # [N, H]
        v_exp = jnp.dot(v_cols, hot.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)   # [N, H·N]

        s = s * d_t[None, :] + sa_exp * b_t[None, :] + v_exp * k_t[None, :]
        s_scratch[:] = s

        y = jnp.dot(s, r_t[:, None] * hot,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)       # [N, H]
        y_ref[0, t, :, :] = y              # [N, H] layout; host transposes
        return 0

    jax.lax.fori_loop(0, T, body, 0)

    @pl.when(tb == n_tb - 1)
    def _():
        s_out_ref[0] = s_scratch[:]


@functools.partial(jax.jit, static_argnames=("t_block", "interpret"))
def wkv7_pallas_packed(r, w, k, v, a, b, state, t_block: int = 64,
                       interpret=False):
    """Packed-heads Pallas WKV-7; same semantics as :func:`wkv7_scan`.

    Layout: sequence tensors flatten to [B, T, H·N] (head-major lanes); the
    state flattens to [B, N, H·N] where column h·N+j is (head h, key j) and
    row i is the value channel. Requires T divisible by t_block (callers
    pad; prefill buckets already are)."""
    B, T, H, N = r.shape
    f32 = jnp.float32
    HN = H * N
    # VMEM budget: 6 input seq blocks + y are double-buffered across grid
    # steps; keep t_block·HN ≤ 64Ki f32 elements so the scoped allocation
    # stays well under the 16 MB limit at any model width (at C=2048 the
    # 64-token block overflowed: 18.09 MB > 16 MB)
    t_block = min(t_block, max(8, (1 << 16) // HN))
    if T % t_block:
        t_block = T                      # degenerate: single block
    n_tb = T // t_block

    decay = jnp.exp(-jnp.exp(w.astype(f32)))   # hoisted out of the kernel

    def flat_seq(x):  # [B, T, H, N] -> [B, T, H·N]
        return x.astype(f32).reshape(B, T, HN)

    v_nh = jnp.moveaxis(v.astype(f32), 2, 3)                   # [B, T, N, H]
    # state [B, H, N, N] (value-major rows) -> [B, N, H·N]
    s0 = jnp.moveaxis(state.astype(f32), 1, 2).reshape(B, N, HN)

    hot = (jnp.repeat(jnp.eye(H, dtype=f32), N, axis=0))       # [H·N, H]

    seq_spec = pl.BlockSpec((1, t_block, HN), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    nh_spec = pl.BlockSpec((1, t_block, N, H), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((1, N, HN), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    hot_spec = pl.BlockSpec((HN, H), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)

    y, s_out = pl.pallas_call(
        _wkv7_packed_kernel,
        grid=(B, n_tb),
        in_specs=[seq_spec, seq_spec, seq_spec, nh_spec, seq_spec, seq_spec,
                  state_spec, hot_spec],
        out_specs=[nh_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, N, H), f32),
            jax.ShapeDtypeStruct((B, N, HN), f32),
        ],
        scratch_shapes=[pltpu.VMEM((N, HN), f32)],
        interpret=interpret,
    )(
        flat_seq(r), flat_seq(decay), flat_seq(k), v_nh,
        flat_seq(a), flat_seq(b), s0, hot,
    )
    y = jnp.moveaxis(y, 2, 3)                                   # [B, T, H, N]
    s_out = jnp.moveaxis(s_out.reshape(B, N, H, N), 2, 1)
    return y, s_out
