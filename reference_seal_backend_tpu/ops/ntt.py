"""Negacyclic NTT/iNTT over RNS limbs as vectorized JAX stage butterflies.

Layout: residue polynomials are ``uint32 [..., L, N]`` in Montgomery form,
limb-major (one row per RNS prime).  A forward stage with ``m`` groups views
the coefficient axis as ``(m, 2, t)`` and performs the whole butterfly level
as one broadcast Montgomery multiply + modular add/sub — XLA maps this onto
the VPU with no scalar loops.  All ``log2 N`` stages are unrolled at trace
time.  Twiddle tables are host-precomputed per (prime, N) in Montgomery
form, stacked across limbs so all limbs transform in one op.

Forward: Cooley-Tukey/DIT, natural coefficient order in, bit-reversed
evaluation order out (out[bitrev(k)] = x(psi^(2k+1))).  Inverse:
Gentleman-Sande, exactly undoing the forward stages, with the final N^{-1}
scale folded into one Montgomery multiply.  No explicit bit-reversal
permutation is ever materialized; dyadic (pointwise) ciphertext ops work
directly in the scrambled order, and Galois automorphisms become index
permutations in this order (see :meth:`NttPlan.galois_perm`).

This replaces SEAL's sequential CPU NTT, which dominates every evaluator
call the reference backend makes (e.g. /root/reference
src/engine/seal_context.cpp:417-458 polynomial evaluation; rotations at
src/benchmarks/ckks/seal_ckks_matmult_row_benchmark.cpp:509).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from reference_seal_backend_tpu.nums import primegen
from reference_seal_backend_tpu.nums.polyref import _bitrev
from reference_seal_backend_tpu.ops import modops


def _mont(x: int, p: int) -> int:
    return (x << 32) % p


@dataclass(frozen=True)
class NttPlan:
    """Precomputed NTT schedule for a fixed (N, primes) limb stack."""

    n: int
    primes: Tuple[int, ...]
    psis: Tuple[int, ...]
    p: jnp.ndarray          # [L, 1] uint32
    p_neg_inv: jnp.ndarray  # [L, 1]
    fwd_tw: Tuple[jnp.ndarray, ...]  # stage s: [L, 2^s, 1] Montgomery form
    inv_tw: Tuple[jnp.ndarray, ...]
    n_inv_mont: jnp.ndarray  # [L, 1] Montgomery form of N^{-1}
    _galois_cache: Dict[int, jnp.ndarray] = field(
        default_factory=dict, hash=False, compare=False
    )

    # -- transforms ---------------------------------------------------------

    def fwd(self, x: jnp.ndarray, lo: int = 0) -> jnp.ndarray:
        """Forward negacyclic NTT of [..., l, N] Montgomery-form residues.

        ``lo`` selects which rows of the plan's limb stack the data
        corresponds to: limbs [lo, lo + x.shape[-2]).  A ciphertext at a
        lower level passes its prefix of limbs with lo=0; the key-switch
        special-modulus row passes lo = L_full - 1.  Works on normal-form
        residues too (the butterfly is Montgomery-form-invariant).
        """
        n = self.n
        lead = x.shape[:-1]
        nl = x.shape[-2]
        p = self.p[lo : lo + nl, :, None]
        pni = self.p_neg_inv[lo : lo + nl, :, None]
        m, t = 1, n // 2
        for s in range(n.bit_length() - 1):
            xv = x.reshape(*lead, m, 2, t)
            u = xv[..., 0, :]
            v = xv[..., 1, :]
            w = self.fwd_tw[s][lo : lo + nl]  # [l, m, 1]
            tv = modops.mont_mul(v, w, p, pni)
            x = jnp.stack(
                [modops.mod_add(u, tv, p), modops.mod_sub(u, tv, p)],
                axis=-2,
            ).reshape(*lead, n)
            m, t = m * 2, t // 2
        return x

    def inv(self, x: jnp.ndarray, lo: int = 0) -> jnp.ndarray:
        """Inverse negacyclic NTT (exact inverse of :meth:`fwd`)."""
        n = self.n
        lead = x.shape[:-1]
        nl = x.shape[-2]
        p = self.p[lo : lo + nl, :, None]
        pni = self.p_neg_inv[lo : lo + nl, :, None]
        m, t = n // 2, 1
        for s in range(n.bit_length() - 2, -1, -1):
            xv = x.reshape(*lead, m, 2, t)
            u = xv[..., 0, :]
            v = xv[..., 1, :]
            w = self.inv_tw[s][lo : lo + nl]
            diff = modops.mod_sub(u, v, p)
            x = jnp.stack(
                [modops.mod_add(u, v, p), modops.mont_mul(diff, w, p, pni)],
                axis=-2,
            ).reshape(*lead, n)
            m, t = m // 2, t * 2
        return modops.mont_mul(
            x,
            self.n_inv_mont[lo : lo + nl],
            self.p[lo : lo + nl],
            self.p_neg_inv[lo : lo + nl],
        )

    # -- Galois automorphisms ----------------------------------------------

    def galois_perm(self, g: int) -> jnp.ndarray:
        """Permutation P with NTT(x(X^g))[i] = NTT(x)[P[i]].

        In evaluation order k (storage bitrev(k)), x(X^g) evaluated at
        psi^(2k+1) equals x evaluated at psi^(g(2k+1) mod 2N); the
        automorphism is thus a pure index permutation of NTT storage —
        verified against coefficient-domain automorphism in tests.
        """
        g = g % (2 * self.n)
        if g in self._galois_cache:
            return self._galois_cache[g]
        n = self.n
        bits = n.bit_length() - 1
        perm = np.zeros(n, dtype=np.int32)
        for k in range(n):
            k_src = ((g * (2 * k + 1)) % (2 * n) - 1) // 2
            perm[_bitrev(k, bits)] = _bitrev(k_src, bits)
        # Cached across jit traces — must be concrete even when first
        # requested from inside a trace.
        with jax.ensure_compile_time_eval():
            arr = jnp.asarray(perm)
        self._galois_cache[g] = arr
        return arr

    def apply_galois_eval(self, x: jnp.ndarray, g: int) -> jnp.ndarray:
        """Automorphism X -> X^g on NTT-domain data [..., N]."""
        return jnp.take(x, self.galois_perm(g), axis=-1)


@functools.lru_cache(maxsize=None)
def make_plan(n: int, primes: Tuple[int, ...]) -> NttPlan:
    """Build (and cache) the NTT plan for modulus stack ``primes`` at size n."""
    bits = n.bit_length() - 1
    assert 1 << bits == n, "N must be a power of two"
    psis = tuple(primegen.min_root_of_unity(2 * n, p) for p in primes)
    fwd_stages = []
    inv_stages = []
    roots_all = []
    for p, psi in zip(primes, psis):
        roots = [pow(psi, _bitrev(i, bits), p) for i in range(n)]
        roots_all.append(roots)
    for s in range(bits):
        m = 1 << s
        fwd = np.array(
            [
                [_mont(roots_all[li][m + i], p) for i in range(m)]
                for li, p in enumerate(primes)
            ],
            dtype=np.uint32,
        )[..., None]
        inv = np.array(
            [
                [
                    _mont(pow(roots_all[li][m + i], -1, p), p)
                    for i in range(m)
                ]
                for li, p in enumerate(primes)
            ],
            dtype=np.uint32,
        )[..., None]
        fwd_stages.append(jnp.asarray(fwd))
        inv_stages.append(jnp.asarray(inv))
    n_inv = np.array(
        [[_mont(pow(n, -1, p), p)] for p in primes], dtype=np.uint32
    )
    consts = [modops.mont_consts(p) for p in primes]
    return NttPlan(
        n=n,
        primes=primes,
        psis=psis,
        p=jnp.asarray(np.array([[c["p"]] for c in consts], dtype=np.uint32)),
        p_neg_inv=jnp.asarray(
            np.array([[c["p_neg_inv"]] for c in consts], dtype=np.uint32)
        ),
        fwd_tw=tuple(fwd_stages),
        inv_tw=tuple(inv_stages),
        n_inv_mont=jnp.asarray(n_inv),
    )
