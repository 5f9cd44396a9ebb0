"""Fused negacyclic NTT/iNTT as a single Pallas TPU kernel.

The pure-XLA path (ops/ntt.py) materializes each of the log2(N) butterfly
stages through HBM; this kernel keeps an entire ``[TILE_B, N]`` row block
resident in VMEM across *all* stages, so each transform costs exactly one
HBM read + one HBM write of the data (~8·N bytes) instead of ~2·log2(N)·N.
The key-switch inner loop — the dominant cost of relinearize/rotate,
mirroring SEAL's key-switch on CPU (/root/reference
src/engine/seal_context.cpp:349-458 rotations/Horner ride on it) — is NTT
bound, so this is the framework's speed-of-light kernel.

Algorithm is the four-step matrix layout of ops/ntt.py
(`NttPlan._fwd_mat`): early stages pair rows of an ``[n1, 128]`` view
(minor axis contiguous), one in-VMEM transpose, late stages pair rows of
the transposed ``[128, n1]`` view.  Outputs are bit-exact identical to the
XLA path (asserted in tests/test_pallas_ntt.py in interpreter mode and on
chip by scripts/chip_check.py).

Mosaic-facing layout decisions:
* data arrives as ``[B, L*N]`` (a free view of ``[B, L, N]``) so each grid
  block is ``(TILE_B, N)`` — (8, 128)-aligned as the TPU lowering requires;
* twiddles are **lane-expanded host-side** into per-stage planes
  (plan.pk1_*/pk2_*, see ops/ntt.py) so every butterfly is a plain
  same-shape vector multiply — no unit-dim reshapes or sublane broadcasts,
  which Mosaic does not lower;
* per-limb twiddle planes and scalars are selected by the BlockSpec index
  map / SMEM scalar reads off ``program_id(1)``.

All modular arithmetic is the uint32 Montgomery core (ops/modops.py)
rebuilt with bias-corrected signed comparisons (`_uge`) where
intermediates may exceed 2**31.
"""

from __future__ import annotations

import functools

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


def _mont_mul(a, b, p, pni):
    lo = a * b
    hi = _umulhi(a, b)
    m = lo * pni
    carry = (lo != 0).astype(U32)
    t = hi + _umulhi(m, p) + carry  # < 2p, may exceed 2**31
    return t - _uge(t, p).astype(U32) * p


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


def _ntt_kernel(
    x_ref, v1w_ref, v1s_ref, v2w_ref, v2s_ref, p_ref, nw_ref, ns_ref, o_ref,
    *, n: int, n1: int, n2: int, tile_b: int, lo: int, inverse: bool,
):
    bits = n.bit_length() - 1
    s1 = n1.bit_length() - 1
    nh = n1 // 2
    n2h = n2 // 2
    li = pl.program_id(0) + lo
    p = p_ref[li, 0]
    x = x_ref[:, :]  # (TILE_B, N)

    def split1(x, s):
        m = 1 << s
        tr = n1 >> (s + 1)
        xv = x.reshape(tile_b, m, 2, tr, n2)
        u = xv[:, :, 0].reshape(tile_b, nh, n2)
        v = xv[:, :, 1].reshape(tile_b, nh, n2)
        return m, tr, u, v

    def join1(yu, yv, s):
        m = 1 << s
        tr = n1 >> (s + 1)
        return jnp.stack(
            [
                yu.reshape(tile_b, m, tr, n2),
                yv.reshape(tile_b, m, tr, n2),
            ],
            axis=2,
        ).reshape(tile_b, n1, n2)

    def split2(xt, s):
        t = n >> (s + 1)
        m2 = n2 // (2 * t)
        xv = xt.reshape(tile_b, m2, 2, t, n1)
        u = xv[:, :, 0].reshape(tile_b, n2h, n1)
        v = xv[:, :, 1].reshape(tile_b, n2h, n1)
        return t, m2, u, v

    def join2(yu, yv, s):
        t = n >> (s + 1)
        m2 = n2 // (2 * t)
        return jnp.stack(
            [
                yu.reshape(tile_b, m2, t, n1),
                yv.reshape(tile_b, m2, t, n1),
            ],
            axis=2,
        ).reshape(tile_b, n2, n1)

    if not inverse:
        x = x.reshape(tile_b, n1, n2)
        for s in range(s1):
            _, _, u, v = split1(x, s)
            tv = _shoup(v, v1w_ref[0, s], v1s_ref[0, s], p)
            x = join1(_mod_add(u, tv, p), _mod_sub(u, tv, p), s)
        xt = jnp.swapaxes(x, 1, 2)
        for s in range(s1, bits):
            _, _, u, v = split2(xt, s)
            tv = _shoup(v, v2w_ref[0, s - s1], v2s_ref[0, s - s1], p)
            xt = join2(_mod_add(u, tv, p), _mod_sub(u, tv, p), s)
        out = jnp.swapaxes(xt, 1, 2).reshape(tile_b, n)
    else:
        xt = jnp.swapaxes(x.reshape(tile_b, n1, n2), 1, 2)
        for s in range(bits - 1, s1 - 1, -1):
            _, _, u, v = split2(xt, s)
            diff = _mod_sub(u, v, p)
            xt = join2(
                _mod_add(u, v, p),
                _shoup(diff, v2w_ref[0, s - s1], v2s_ref[0, s - s1], p),
                s,
            )
        x = jnp.swapaxes(xt, 1, 2)
        for s in range(s1 - 1, -1, -1):
            _, _, u, v = split1(x, s)
            diff = _mod_sub(u, v, p)
            x = join1(
                _mod_add(u, v, p),
                _shoup(diff, v1w_ref[0, s], v1s_ref[0, s], p),
                s,
            )
        out = _shoup(
            x.reshape(tile_b, n), nw_ref[li, 0], ns_ref[li, 0], p
        )
    o_ref[:, :] = out


@functools.partial(
    jax.jit, static_argnames=("n", "n1", "n2", "tile_b", "lo", "inverse")
)
def _call(
    x, v1w, v1s, v2w, v2s, p, nw, ns, *, n, n1, n2, tile_b, lo, inverse
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
        n=n, n1=n1, n2=n2, tile_b=tile_b, lo=lo, inverse=inverse,
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
    tile_b = 8
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
    )
    if pad:
        out = out[:b]
    return out.reshape(*lead, nl, n)
