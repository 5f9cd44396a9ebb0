"""Fused negacyclic NTT/iNTT as a single Pallas TPU kernel.

The pure-XLA path (ops/ntt.py) materializes each of the log2(N) butterfly
stages through HBM; this kernel keeps an entire row block resident in VMEM
across *all* stages, so each transform costs exactly one HBM read + one
HBM write of the data (~8·N bytes) instead of ~2·log2(N)·N.  The
key-switch inner loop — the dominant cost of relinearize/rotate, mirroring
SEAL's key-switch on CPU (/root/reference
src/engine/seal_context.cpp:349-458 rotations/Horner ride on it) — is NTT
bound, so this is the framework's speed-of-light kernel.

Algorithm is the four-step matrix layout of ops/ntt.py
(`NttPlan._fwd_mat`) with the same stage order and identical integer
sequences — outputs are bit-exact equal to the XLA path (asserted in
tests/test_pallas_ntt.py in interpreter mode and on chip by
scripts/chip_check.py).

Mosaic-facing layout decisions (v2 — the round-1 kernel lost to the XLA
path because its joins interleaved *rows of the (sublane, lane) tile*,
forcing a Mosaic relayout per stage):
* inside the kernel the block lives as ``[n1, TILE_B, n2]`` — the batch
  axis occupies the **sublanes** and n2 = 128 the lanes, so one vreg holds
  one matrix row of the four-step ``[n1, n2]`` view for all TILE_B rows.
  Every butterfly then pairs whole vregs (slicing/stacking along the
  leading array-of-vregs axis), at *every* stage including the fine
  distances 4/2/1 that previously crossed sublanes;
* twiddles are **lane-expanded host-side** into per-stage planes
  (plan.pk1_*/pk2_*, see ops/ntt.py) of shape ``[n1/2, n2]`` and splat
  across the sublane (batch) axis with one `broadcast_to` per stage —
  every butterfly is a plain same-shape vector multiply;
* the only data movement left is the four-step transpose (shared with the
  XLA path) plus one load/store shuffle between ``[TILE_B, N]`` and the
  sublane-batch layout;
* per-limb twiddle planes and scalars are selected by the BlockSpec index
  map / SMEM scalar reads off ``program_id(0)``.

Arithmetic follows ops/ntt.py exactly: Shoup constant multiplies, and —
when the plan's primes are all below 2**30 (`plan.lazy`) — Harvey lazy
reduction with butterfly values riding in [0, 4p) and a single full
reduction after the last forward stage.  Comparisons on values that may
exceed 2**31 use bias-corrected signed compares (`_uge`) since Mosaic
compares are signed.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)
_BIAS = np.uint32(0x80000000)


def _uge(a, b):
    """a >= b as *unsigned* uint32, safe even if Mosaic compares signed."""
    ab = (a ^ _BIAS).astype(jnp.int32)
    bb = (b ^ _BIAS).astype(jnp.int32)
    return ab >= bb


def _umulhi(a, b):
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    lo = a0 * b0
    t = a1 * b0 + (lo >> 16)
    w = a0 * b1 + (t & _MASK16)
    return a1 * b1 + (t >> 16) + (w >> 16)


def _mod_add(a, b, p):
    s = a + b  # < 2p, may exceed 2**31
    return s - _uge(s, p).astype(U32) * p


def _mod_sub(a, b, p):
    return a - b + (a < b).astype(U32) * p  # a, b < p < 2**31: signed-safe


def _shoup(x, w, ws, p):
    """x·w mod p for precomputed constant (w, ws) — see modops.shoup_mul."""
    q = _umulhi(x, ws)
    r = x * w - q * p  # true value < 2p, may exceed 2**31
    return r - _uge(r, p).astype(U32) * p


def _shoup_lazy(x, w, ws, p):
    """Shoup product without the final correction: in [0, 2p) for any
    uint32 x — see modops.shoup_mul_lazy."""
    q = _umulhi(x, ws)
    return x * w - q * p


def _reduce_2p(x, p2):
    """[0, 4p) -> [0, 2p); x may exceed 2**31."""
    return x - _uge(x, p2).astype(U32) * p2


def _reduce_4p_full(x, p, p2):
    """[0, 4p) -> [0, p); x may exceed 2**31."""
    x = x - _uge(x, p2).astype(U32) * p2
    return x - _uge(x, p).astype(U32) * p


def _bcast(w, tile_b):
    """Splat a [rows, lanes] twiddle plane across the sublane/batch axis."""
    return jnp.broadcast_to(w[:, None, :], (w.shape[0], tile_b, w.shape[1]))


def _ntt_kernel(
    x_ref, v1w_ref, v1s_ref, v2w_ref, v2s_ref, p_ref, nw_ref, ns_ref, o_ref,
    *, n: int, n1: int, n2: int, tile_b: int, lo: int, inverse: bool,
    lazy: bool,
):
    bits = n.bit_length() - 1
    s1 = n1.bit_length() - 1
    nh = n1 // 2
    n2h = n2 // 2
    li = pl.program_id(0) + lo
    p = p_ref[li, 0]
    p2 = p + p
    x = x_ref[:, :].reshape(tile_b, n1, n2)
    # sublane-batch layout: one vreg per [n1, n2]-matrix row.
    xo = jnp.transpose(x, (1, 0, 2))  # [n1, tile_b, n2]

    def bf_ct(u, v, w, ws, first):
        """Cooley-Tukey pair — mirrors ops/ntt.py:_bf_ct exactly."""
        if lazy:
            ur = u if first else _reduce_2p(u, p2)
            t = _shoup_lazy(v, w, ws, p)
            return ur + t, ur - t + p2
        t = _shoup(v, w, ws, p)
        return _mod_add(u, t, p), _mod_sub(u, t, p)

    def bf_gs(u, v, w, ws):
        """Gentleman-Sande pair — mirrors ops/ntt.py:_bf_gs exactly."""
        if lazy:
            return (
                _reduce_2p(u + v, p2),
                _shoup_lazy(u - v + p2, w, ws, p),
            )
        diff = _mod_sub(u, v, p)
        return _mod_add(u, v, p), _shoup(diff, w, ws, p)

    def stage1(xo, s, butterfly):
        """One stage paired along the n1 (leading, whole-vreg) axis."""
        m = 1 << s
        tr = n1 >> (s + 1)
        xv = xo.reshape(m, 2, tr, tile_b, n2)
        u = xv[:, 0].reshape(nh, tile_b, n2)
        v = xv[:, 1].reshape(nh, tile_b, n2)
        a, b = butterfly(u, v, s)
        return jnp.stack(
            [
                a.reshape(m, tr, tile_b, n2),
                b.reshape(m, tr, tile_b, n2),
            ],
            axis=1,
        ).reshape(n1, tile_b, n2)

    def stage2(xt, s, butterfly):
        """One stage paired along the n2 (leading) axis of the transposed
        [n2, tile_b, n1] view."""
        t = n >> (s + 1)
        m2 = n2 // (2 * t)
        xv = xt.reshape(m2, 2, t, tile_b, n1)
        u = xv[:, 0].reshape(n2h, tile_b, n1)
        v = xv[:, 1].reshape(n2h, tile_b, n1)
        a, b = butterfly(u, v, s)
        return jnp.stack(
            [
                a.reshape(m2, t, tile_b, n1),
                b.reshape(m2, t, tile_b, n1),
            ],
            axis=1,
        ).reshape(n2, tile_b, n1)

    if not inverse:
        def ct1(u, v, s):
            w = _bcast(v1w_ref[0, s], tile_b)
            ws = _bcast(v1s_ref[0, s], tile_b)
            return bf_ct(u, v, w, ws, s == 0)

        def ct2(u, v, s):
            w = _bcast(v2w_ref[0, s - s1], tile_b)
            ws = _bcast(v2s_ref[0, s - s1], tile_b)
            return bf_ct(u, v, w, ws, False)

        for s in range(s1):
            xo = stage1(xo, s, ct1)
        xt = jnp.transpose(xo, (2, 1, 0))  # four-step transpose
        for s in range(s1, bits):
            xt = stage2(xt, s, ct2)
        if lazy:
            xt = _reduce_4p_full(xt, p, p2)
        out = jnp.transpose(xt, (1, 2, 0))  # [tile_b, n1, n2]
    else:
        def gs2(u, v, s):
            w = _bcast(v2w_ref[0, s - s1], tile_b)
            ws = _bcast(v2s_ref[0, s - s1], tile_b)
            return bf_gs(u, v, w, ws)

        def gs1(u, v, s):
            w = _bcast(v1w_ref[0, s], tile_b)
            ws = _bcast(v1s_ref[0, s], tile_b)
            return bf_gs(u, v, w, ws)

        xt = jnp.transpose(xo, (2, 1, 0))  # [n2, tile_b, n1]
        for s in range(bits - 1, s1 - 1, -1):
            xt = stage2(xt, s, gs2)
        xo = jnp.transpose(xt, (2, 1, 0))  # [n1, tile_b, n2]
        for s in range(s1 - 1, -1, -1):
            xo = stage1(xo, s, gs1)
        # N^{-1} Shoup multiply: fully reducing for any uint32 input, so
        # the lazy path needs no extra epilogue (same as ops/ntt.py).
        out = _shoup(xo, nw_ref[li, 0], ns_ref[li, 0], p)
        out = jnp.transpose(out, (1, 0, 2))  # [tile_b, n1, n2]
    o_ref[:, :] = out.reshape(tile_b, n)


@functools.partial(
    jax.jit,
    static_argnames=("n", "n1", "n2", "tile_b", "lo", "inverse", "lazy"),
)
def _call(
    x, v1w, v1s, v2w, v2s, p, nw, ns,
    *, n, n1, n2, tile_b, lo, inverse, lazy,
):
    """x: [B, nl*N] uint32 (view of [B, nl, N]); returns same shape."""
    b = x.shape[0]
    nl = x.shape[1] // n
    s1 = n1.bit_length() - 1
    bits = n.bit_length() - 1
    # limb axis OUTER so the ~1 MB of per-limb twiddle planes is fetched
    # once per limb and reused across all row tiles.
    grid = (nl, b // tile_b)
    kernel = functools.partial(
        _ntt_kernel,
        n=n, n1=n1, n2=n2, tile_b=tile_b, lo=lo, inverse=inverse, lazy=lazy,
    )
    plane1 = pl.BlockSpec(
        (1, s1, n1 // 2, n2),
        lambda li, bi: (li + lo, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    plane2 = pl.BlockSpec(
        (1, bits - s1, n2 // 2, n1),
        lambda li, bi: (li + lo, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_b, n), lambda li, bi: (bi, li),
                memory_space=pltpu.VMEM,
            ),
            plane1,  # v1 twiddles
            plane1,  # v1 shoup
            plane2,  # v2 twiddles
            plane2,  # v2 shoup
            smem,    # p [Lfull, 1]
            smem,    # n_inv [Lfull, 1]
            smem,    # n_inv shoup [Lfull, 1]
        ],
        out_specs=pl.BlockSpec(
            (tile_b, n), lambda li, bi: (bi, li), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            # Grid cells are independent row/limb tiles: let Mosaic split
            # them across the megacore halves.
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * (n.bit_length() - 1) * x.size,
            bytes_accessed=2 * x.size * 4,
            transcendentals=0,
        ),
    )(x, v1w, v1s, v2w, v2s, p, nw, ns)


def transform(plan, x: jnp.ndarray, lo: int, inverse: bool) -> jnp.ndarray:
    """Fused NTT/iNTT of ``x`` [..., l, N] using plan limbs [lo, lo+l).

    Drop-in replacement for NttPlan.fwd/inv on TPU; bit-exact equal.
    """
    n = plan.n
    lead = x.shape[:-2]
    nl = x.shape[-2]
    b = 1
    for d in lead:
        b *= d
    xf = x.reshape(b, nl * n)
    # 16 measured best on a v5e chip (8: 3.24, 16: 2.38, 24: 2.32 us/row at
    # N=16384×7 limbs — 24 pads worse at small batches; >=32 exceeds the
    # 16 MB scoped-VMEM limit).
    tile_b = int(os.environ.get("RSB_TPU_PALLAS_TILE_B", "16"))
    pad = (-b) % tile_b
    if pad:
        xf = jnp.concatenate(
            [xf, jnp.zeros((pad, nl * n), jnp.uint32)], axis=0
        )
    v1 = plan.pk1_inv if inverse else plan.pk1_fwd
    v2 = plan.pk2_inv if inverse else plan.pk2_fwd
    out = _call(
        xf,
        v1[0],
        v1[1],
        v2[0],
        v2[1],
        plan.p,
        plan.n_inv[0],
        plan.n_inv[1],
        n=n,
        n1=plan.n1,
        n2=plan.n2,
        tile_b=tile_b,
        lo=lo,
        inverse=inverse,
        lazy=plan.lazy,
    )
    if pad:
        out = out[:b]
    return out.reshape(*lead, nl, n)
