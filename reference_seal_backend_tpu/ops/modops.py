"""uint32 modular arithmetic core for TPU (Montgomery form, R = 2**32).

TPUs have no 64-bit integer multiply, so every wide product is built from
16-bit half-word partial products in uint32 with wraparound semantics.  All
residues on device are kept in **Montgomery form** (``x̃ = x·R mod p`` with
``R = 2**32``): a modular multiply is then a single Montgomery product
(:func:`mont_mul`), additions/subtractions are unchanged, and conversions in
and out of the form happen only at host boundaries (encode/decrypt) or via
:func:`to_mont`/:func:`from_mont`.

Requirements: every modulus ``p`` is odd and ``p < 2**31`` (see
nums/primegen.py).  Under that bound all intermediates below fit uint32.

Replaces SEAL's 64-bit ``multiply_uint_mod`` / Barrett machinery used
throughout the reference's evaluator calls (e.g. /root/reference
src/benchmarks/ckks/seal_ckks_element_wise_benchmark.cpp:343 ultimately
bottoms out in SEAL dyadic modmuls); here the same role is played by a few
VPU uint32 ops that XLA fuses freely.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


def umulhi32(a, b):
    """High 32 bits of the 64-bit product of two uint32 arrays.

    Exact: built from four 16x16->32 partial products, none of which can
    overflow uint32.
    """
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    lo = a0 * b0                       # < 2**32, exact
    t = a1 * b0 + (lo >> 16)           # < 2**32
    w = a0 * b1 + (t & _MASK16)        # < 2**32
    return a1 * b1 + (t >> 16) + (w >> 16)


def mont_mul(a, b, p, p_neg_inv):
    """Montgomery product: ``a·b·R^{-1} mod p`` with R = 2**32.

    ``p_neg_inv = -p^{-1} mod 2**32`` precomputed host-side.
    If a, b are Montgomery forms of x, y this returns the Montgomery form of
    ``x·y``.  Requires p < 2**31; result is fully reduced in [0, p).
    """
    lo = a * b
    hi = umulhi32(a, b)
    m = lo * p_neg_inv
    carry = (lo != 0).astype(U32)
    t = hi + umulhi32(m, p) + carry    # < 2**31 + 2**30 + 1, fits
    return t - (t >= p).astype(U32) * p


def shoup_mul(x, w, ws, p):
    """x·w mod p for a *precomputed constant* w (< p), via Shoup's trick.

    ``ws = floor(w·2**32 / p)`` host-precomputed.  Exact for any uint32 x
    and p < 2**31 (error analysis: q = umulhi(x, ws) undershoots
    floor(x·w/p) by < 2, so r = x·w - q·p lands in [0, 2p)).  Costs one
    umulhi + two low multiplies — roughly half a Montgomery product; used
    for every twiddle/constant multiply on the NTT hot path (SEAL/HEXL use
    the same trick on CPU).  Montgomery-form-agnostic: multiplying a
    Montgomery-form operand by a plain constant keeps the form.
    """
    q = umulhi32(x, ws)
    r = x * w - q * p
    return r - (r >= p).astype(U32) * p


def shoup_mul_lazy(x, w, ws, p):
    """Shoup product WITHOUT the final conditional correction: result in
    [0, 2p) for ANY uint32 x (same error analysis as :func:`shoup_mul` —
    q = umulhi(x, ws) undershoots floor(x·w/p) by < 2).

    Used by the Harvey lazy-reduction NTT butterflies (ops/ntt.py): with
    p < 2**30 butterfly values stay in [0, 4p) ⊂ uint32 across stages, so
    each butterfly drops one compare+select from the twiddle multiply and
    replaces the modular add/sub with plain adds — ~12%% of the butterfly
    op count on an int-op-bound kernel (Harvey, "Faster arithmetic for
    number-theoretic transforms", J. Symb. Comput. 60, 2014; SEAL/HEXL
    use the same trick with 64-bit lanes).
    """
    q = umulhi32(x, ws)
    return x * w - q * p


def reduce_2p(x, p2):
    """Conditional subtract of 2p: [0, 4p) -> [0, 2p).  ``p2 = p + p``."""
    return x - (x >= p2).astype(U32) * p2


def reduce_4p_full(x, p):
    """Full reduction [0, 4p) -> [0, p): two conditional subtracts (the
    one-time epilogue of a lazy forward NTT)."""
    p2 = p + p
    x = x - (x >= p2).astype(U32) * p2
    return x - (x >= p).astype(U32) * p


def mod_add(a, b, p):
    """(a + b) mod p for a, b in [0, p), p < 2**31 — sum fits uint32."""
    s = a + b
    return s - (s >= p).astype(U32) * p


def mod_sub(a, b, p):
    """(a - b) mod p for a, b in [0, p)."""
    return a - b + (a < b).astype(U32) * p


def mod_neg(a, p):
    """(-a) mod p for a in [0, p)."""
    return (a != 0).astype(U32) * (p - a)


def barrett_reduce_u32(v, p, mu):
    """v mod p for any uint32 v; ``mu = floor(2**32 / p)`` precomputed.

    Used to lift a residue from one RNS limb onto another during key-switch
    decomposition and fast base conversion.
    """
    q = umulhi32(v, mu)
    r = v - q * p
    r = r - (r >= p).astype(U32) * p
    return r - (r >= p).astype(U32) * p


def barrett_reduce_u32_lazy(v, p, mu):
    """Barrett reduction to the LAZY range [0, 2p): ``q = umulhi(v, mu)``
    undershoots floor(v/p) by < 3, so ``r = v - q·p`` lies in [0, 3p) and
    a single conditional subtract of 2p lands it in [0, 2p).  One
    compare+select cheaper than :func:`barrett_reduce_u32`; use when the
    consumer is range-tolerant (shoup_mul — exact for any uint32 — or a
    Harvey lazy NTT, which accepts [0, 2p) inputs; see ops/ntt.py)."""
    q = umulhi32(v, mu)
    r = v - q * p
    p2 = p + p
    return r - (r >= p2).astype(U32) * p2


def to_mont(x, p, p_neg_inv, r2):
    """Enter Montgomery form: x -> x·R mod p (``r2 = R^2 mod p``)."""
    return mont_mul(x, r2, p, p_neg_inv)


def from_mont(x, p, p_neg_inv):
    """Leave Montgomery form: x·R mod p -> x."""
    return mont_mul(x, jnp.asarray(np.uint32(1)), p, p_neg_inv)


# ---------------------------------------------------------------------------
# Host-side precomputation helpers (exact Python bignum).
# ---------------------------------------------------------------------------

def mont_consts(p: int) -> dict:
    """All per-modulus constants the device kernels need, as numpy uint32."""
    if p >= 2**31 or p % 2 == 0:
        raise ValueError("modulus must be odd and < 2**31")
    r = 1 << 32
    p_inv = pow(p, -1, r)
    return {
        "p": np.uint32(p),
        "p_neg_inv": np.uint32((r - p_inv) % r),
        "mu": np.uint32(r // p),          # Barrett factor floor(2^32/p)
        "r2": np.uint32(r * r % p),       # R^2 mod p
        "r1": np.uint32(r % p),           # R mod p  (Montgomery form of 1)
    }


def host_to_mont(x: np.ndarray, p: int) -> np.ndarray:
    """Host conversion into Montgomery form (int64-safe, p < 2**31)."""
    return ((x.astype(np.uint64) << 32) % np.uint64(p)).astype(np.uint32)


def host_from_mont(x: np.ndarray, p: int) -> np.ndarray:
    rinv = pow(1 << 32, -1, p)
    return (x.astype(np.uint64) * np.uint64(rinv) % np.uint64(p)).astype(
        np.uint32
    )
