"""Negacyclic NTT/iNTT over RNS limbs, vectorized for TPU.

Layout: residue polynomials are ``uint32 [..., L, N]``, limb-major (one row
per RNS prime); data may be in Montgomery or normal form (the transform is
form-agnostic).  Twiddle multiplies use **Shoup's precomputed-constant
trick** (modops.shoup_mul) — one umulhi + two low multiplies, about half a
Montgomery product — with per-stage (w, w_shoup) tables host-precomputed
per (prime, N) and stacked across limbs so all limbs transform in one op.

Forward: Cooley-Tukey/DIT, natural coefficient order in, bit-reversed
evaluation order out (out[bitrev(k)] = x(psi^(2k+1))).  Inverse:
Gentleman-Sande, exactly undoing the forward stages, with the final N^{-1}
scale folded into one Shoup multiply.  No explicit bit-reversal
permutation is ever materialized; dyadic (pointwise) ciphertext ops work
directly in the scrambled order, and Galois automorphisms become index
permutations in this order (see :meth:`NttPlan.galois_perm`).

Layout (four-step form): for N >= 256 the coefficient axis is viewed as an
``[n1, 128]`` matrix.  Early stages (butterfly distance t >= 128) pair
whole rows, so every vector op runs along the 128-wide contiguous minor
axis (exactly one VPU lane tile); then one ``[n1, 128]`` transpose; late
stages (t < 128) pair rows of the transposed matrix, again minor-axis
contiguous.  This keeps all log2(N) stages on (8,128)-aligned data instead
of degrading to stride-1 butterflies, which is the difference between VPU
speed-of-light and permute-bound on TPU.  Same stage order as the flat
loop — bit-exact identical outputs.  On TPU the whole multi-stage sweep
runs as one fused Pallas kernel (ops/pallas/ntt_kernel.py).

This replaces SEAL's sequential CPU NTT, which dominates every evaluator
call the reference backend makes (e.g. /root/reference
src/engine/seal_context.cpp:417-458 polynomial evaluation; rotations at
src/benchmarks/ckks/seal_ckks_matmult_row_benchmark.cpp:509).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from reference_seal_backend_tpu.nums import primegen
from reference_seal_backend_tpu.nums.polyref import _bitrev
from reference_seal_backend_tpu.ops import modops


def _bf_ct(u, v, w, ws, p, lazy: bool, first: bool):
    """Cooley-Tukey butterfly pair (u + w·v, u − w·v).

    ``lazy`` (Harvey 2014, requires every prime < 2**30): values ride in
    [0, 4p) across stages — the u input is conditionally reduced to
    [0, 2p) (skipped on the first stage, whose inputs are canonical), the
    twiddle product keeps its [0, 2p) lazy form, and the pair is formed
    with plain adds.  Saves one compare+select in the multiply and the
    corrections of the modular add/sub (~12% of butterfly ops).  The
    caller fully reduces once after the last stage
    (modops.reduce_4p_full)."""
    if lazy:
        p2 = p + p
        ur = u if first else modops.reduce_2p(u, p2)
        t = modops.shoup_mul_lazy(v, w, ws, p)
        return ur + t, ur - t + p2
    t = modops.shoup_mul(v, w, ws, p)
    return modops.mod_add(u, t, p), modops.mod_sub(u, t, p)


def _bf_gs(u, v, w, ws, p, lazy: bool):
    """Gentleman-Sande inverse butterfly pair (u + v, w·(u − v)).

    Lazy form maintains the [0, 2p) invariant stage to stage; the
    final N^{-1} multiply (a fully-reducing shoup_mul, exact for any
    uint32 input) restores canonical form for free."""
    if lazy:
        p2 = p + p
        return (
            modops.reduce_2p(u + v, p2),
            modops.shoup_mul_lazy(u - v + p2, w, ws, p),
        )
    diff = modops.mod_sub(u, v, p)
    return modops.mod_add(u, v, p), modops.shoup_mul(diff, w, ws, p)


def _pallas_enabled() -> bool:
    """Use the fused Pallas NTT kernel?  RSB_TPU_PALLAS=on|off (default
    off).  Measured on a v5e chip (2026-08-19) the XLA four-step path
    remains *faster*: 1.84-1.98 us/row vs the fused kernel's best 2.32-2.38
    (N=16384×7 limbs).  The round-2 kernel rework (sublane-batch layout
    with whole-vreg joins at every stage, in-kernel Harvey lazy reduction,
    tile sweep 8/16/24/32/64) recovered 3.31 -> 2.32 us/row and proved the
    stage-join relayouts were NOT the round-1 bottleneck — the kernel is
    VPU-issue-bound and Mosaic's elementwise codegen trails XLA's fused
    elementwise on this uint32-multiply-heavy mix, while the HBM traffic
    the fusion saves was never the limiter.  The kernel stays opt-in:
    bit-exact, tested (tests/test_pallas_ntt.py), re-measured by
    scripts/chip_check.py."""
    return os.environ.get("RSB_TPU_PALLAS", "off") == "on"


@dataclass(frozen=True)
class NttPlan:
    """Precomputed NTT schedule for a fixed (N, primes) limb stack.

    Twiddle tables come in (w, w_shoup) pairs for modops.shoup_mul.
    """

    n: int
    primes: Tuple[int, ...]
    psis: Tuple[int, ...]
    p: jnp.ndarray          # [L, 1] uint32
    p_neg_inv: jnp.ndarray  # [L, 1]
    fwd_tw: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]  # stage s: [L, 2^s, 1]
    inv_tw: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]
    n_inv: Tuple[jnp.ndarray, jnp.ndarray]  # [L, 1] plain N^{-1} (w, ws)
    # four-step matrix layout (n2=0 when n < 256): n = n1 * n2 with n2=128;
    # stage s >= s1 twiddles as [L, m2, 1, n1] tables over the transposed
    # [n2, n1] view (see module docstring).
    n2: int = 0
    fwd_tw2: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...] = ()
    inv_tw2: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...] = ()
    # Harvey lazy reduction (values in [0,4p) across stages): valid only
    # when every prime is below 2**30 — make_plan turns it on exactly
    # then, so plans over legacy 31-bit primes keep the fully-reduced
    # butterflies and stay correct.  Outputs are identical either way.
    lazy: bool = False
    # Lane-expanded twiddles for the fused Pallas kernel
    # (ops/pallas/ntt_kernel.py): phase-1 [L, s1, n1/2, n2] — stage s plane
    # (g*tr + jr, lane) = w_g; phase-2 [L, bits-s1, n2/2, n1] — stage plane
    # (j2*t + jt, r) = w_{r*m2+j2}.  Fully materialized so the kernel does
    # plain same-shape multiplies (Mosaic-friendly: no unit-dim reshapes).
    pk1_fwd: Tuple[jnp.ndarray, jnp.ndarray] = None
    pk1_inv: Tuple[jnp.ndarray, jnp.ndarray] = None
    pk2_fwd: Tuple[jnp.ndarray, jnp.ndarray] = None
    pk2_inv: Tuple[jnp.ndarray, jnp.ndarray] = None
    _galois_cache: Dict[int, jnp.ndarray] = field(
        default_factory=dict, hash=False, compare=False
    )

    @property
    def n1(self) -> int:
        return self.n // self.n2 if self.n2 else 0

    @property
    def s1(self) -> int:
        """Number of leading stages handled in row-major [n1, n2] layout."""
        return self.n1.bit_length() - 1 if self.n2 else 0

    # -- transforms ---------------------------------------------------------

    def fwd(
        self, x: jnp.ndarray, lo: int = 0, epilogue: bool = True
    ) -> jnp.ndarray:
        """Forward negacyclic NTT of [..., l, N] residues.

        ``lo`` selects which rows of the plan's limb stack the data
        corresponds to: limbs [lo, lo + x.shape[-2]).  A ciphertext at a
        lower level passes its prefix of limbs with lo=0; the key-switch
        special-modulus row passes lo = L_full - 1.  Montgomery/normal
        form is preserved (the butterfly is form-invariant).

        Range contract on the ``lazy`` (Harvey) path: inputs may be LAZY
        in [0, 2p) — the first-stage butterfly only needs u < 2p to keep
        the [0, 4p) invariant — and ``epilogue=False`` skips the final
        full reduction, returning values in [0, 4p) whose residues are
        exact.  Callers whose next op is range-tolerant (shoup_mul is
        exact for any uint32) use that to drop two compare+selects per
        element from the key-switch digit pipeline (evaluator/eval.py
        _hoisted_digits).  Non-lazy plans (a prime >= 2**30) and the
        opt-in Pallas kernel require canonical inputs and always return
        canonical outputs.
        """
        if self.n2:
            if _pallas_enabled():
                from reference_seal_backend_tpu.ops.pallas import ntt_kernel

                return ntt_kernel.transform(self, x, lo, inverse=False)
            return self._fwd_mat(x, lo, epilogue)
        n = self.n
        lead = x.shape[:-1]
        nl = x.shape[-2]
        p = self.p[lo : lo + nl, :, None]
        m, t = 1, n // 2
        for s in range(n.bit_length() - 1):
            xv = x.reshape(*lead, m, 2, t)
            u = xv[..., 0, :]
            v = xv[..., 1, :]
            w, ws = self.fwd_tw[s]
            a, b = _bf_ct(
                u, v, w[lo : lo + nl], ws[lo : lo + nl], p,
                self.lazy, s == 0,
            )
            x = jnp.stack([a, b], axis=-2).reshape(*lead, n)
            m, t = m * 2, t // 2
        if self.lazy and epilogue:
            x = modops.reduce_4p_full(x, self.p[lo : lo + nl])
        return x

    def _fwd_mat(
        self, x: jnp.ndarray, lo: int, epilogue: bool = True
    ) -> jnp.ndarray:
        """Four-step-layout forward NTT (same stages, TPU-friendly strides)."""
        n, n1, n2, s1 = self.n, self.n1, self.n2, self.s1
        bits = n.bit_length() - 1
        lead = x.shape[:-1]  # includes the limb axis
        nl = x.shape[-2]
        p = self.p[lo : lo + nl, :, None, None]
        x = x.reshape(*lead, n1, n2)
        for s in range(s1):
            m = 1 << s
            tr = n1 >> (s + 1)  # butterfly distance in rows
            xv = x.reshape(*lead, m, 2, tr, n2)
            u = xv[..., 0, :, :]
            v = xv[..., 1, :, :]
            w, ws = self.fwd_tw[s]
            a, b = _bf_ct(
                u, v,
                w[lo : lo + nl][..., None],
                ws[lo : lo + nl][..., None],
                p, self.lazy, s == 0,
            )
            x = jnp.stack([a, b], axis=-3).reshape(*lead, n1, n2)
        xt = jnp.swapaxes(x, -1, -2)  # [..., n2, n1]
        for s in range(s1, bits):
            t = n >> (s + 1)
            m2 = n2 // (2 * t)
            xv = xt.reshape(*lead, m2, 2, t, n1)
            u = xv[..., 0, :, :]
            v = xv[..., 1, :, :]
            w, ws = self.fwd_tw2[s - s1]
            a, b = _bf_ct(
                u, v, w[lo : lo + nl], ws[lo : lo + nl], p,
                self.lazy, False,
            )
            xt = jnp.stack([a, b], axis=-3).reshape(*lead, n2, n1)
        if self.lazy and epilogue:
            xt = modops.reduce_4p_full(xt, self.p[lo : lo + nl, :, None])
        return jnp.swapaxes(xt, -1, -2).reshape(*lead, n)

    def inv(self, x: jnp.ndarray, lo: int = 0) -> jnp.ndarray:
        """Inverse negacyclic NTT (exact inverse of :meth:`fwd`).

        On the lazy path inputs may be in [0, 2p) (the first GS stage
        forms u+v < 4p and u-v+2p < 4p, both inside the Harvey
        invariant); the final N^{-1} shoup_mul is exact for any uint32,
        so outputs are always canonical."""
        if self.n2:
            if _pallas_enabled():
                from reference_seal_backend_tpu.ops.pallas import ntt_kernel

                return ntt_kernel.transform(self, x, lo, inverse=True)
            return self._inv_mat(x, lo)
        n = self.n
        lead = x.shape[:-1]
        nl = x.shape[-2]
        p = self.p[lo : lo + nl, :, None]
        m, t = n // 2, 1
        for s in range(n.bit_length() - 2, -1, -1):
            xv = x.reshape(*lead, m, 2, t)
            u = xv[..., 0, :]
            v = xv[..., 1, :]
            w, ws = self.inv_tw[s]
            a, b = _bf_gs(
                u, v, w[lo : lo + nl], ws[lo : lo + nl], p, self.lazy
            )
            x = jnp.stack([a, b], axis=-2).reshape(*lead, n)
            m, t = m // 2, t * 2
        nw, nws = self.n_inv
        # fully-reducing shoup_mul (exact for any uint32 input) restores
        # canonical form, so the lazy path needs no extra epilogue here.
        return modops.shoup_mul(
            x,
            nw[lo : lo + nl],
            nws[lo : lo + nl],
            self.p[lo : lo + nl],
        )

    def _inv_mat(self, x: jnp.ndarray, lo: int) -> jnp.ndarray:
        """Four-step-layout inverse NTT (exact inverse of :meth:`_fwd_mat`)."""
        n, n1, n2, s1 = self.n, self.n1, self.n2, self.s1
        bits = n.bit_length() - 1
        lead = x.shape[:-1]
        nl = x.shape[-2]
        p = self.p[lo : lo + nl, :, None, None]
        xt = jnp.swapaxes(x.reshape(*lead, n1, n2), -1, -2)  # [..., n2, n1]
        for s in range(bits - 1, s1 - 1, -1):
            t = n >> (s + 1)
            m2 = n2 // (2 * t)
            xv = xt.reshape(*lead, m2, 2, t, n1)
            u = xv[..., 0, :, :]
            v = xv[..., 1, :, :]
            w, ws = self.inv_tw2[s - s1]
            a, b = _bf_gs(
                u, v, w[lo : lo + nl], ws[lo : lo + nl], p, self.lazy
            )
            xt = jnp.stack([a, b], axis=-3).reshape(*lead, n2, n1)
        x = jnp.swapaxes(xt, -1, -2)  # [..., n1, n2]
        for s in range(s1 - 1, -1, -1):
            m = 1 << s
            tr = n1 >> (s + 1)
            xv = x.reshape(*lead, m, 2, tr, n2)
            u = xv[..., 0, :, :]
            v = xv[..., 1, :, :]
            w, ws = self.inv_tw[s]
            a, b = _bf_gs(
                u, v,
                w[lo : lo + nl][..., None],
                ws[lo : lo + nl][..., None],
                p, self.lazy,
            )
            x = jnp.stack([a, b], axis=-3).reshape(*lead, n1, n2)
        nw, nws = self.n_inv
        return modops.shoup_mul(
            x.reshape(*lead, n),
            nw[lo : lo + nl],
            nws[lo : lo + nl],
            self.p[lo : lo + nl],
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


def _shoup_np(w: np.ndarray, primes, axes_per_limb: int) -> np.ndarray:
    """floor(w * 2**32 / p) elementwise; w indexed [L, ...]."""
    p = np.array(primes, dtype=np.uint64).reshape(
        (-1,) + (1,) * axes_per_limb
    )
    return ((w.astype(np.uint64) << 32) // p).astype(np.uint32)


@functools.lru_cache(maxsize=None)
def make_plan(n: int, primes: Tuple[int, ...]) -> NttPlan:
    """Build (and cache) the NTT plan for modulus stack ``primes`` at size n."""
    bits = n.bit_length() - 1
    assert 1 << bits == n, "N must be a power of two"
    psis = tuple(primegen.min_root_of_unity(2 * n, p) for p in primes)
    nl_ = len(primes)
    roots = np.zeros((nl_, n), dtype=np.uint32)
    iroots = np.zeros((nl_, n), dtype=np.uint32)
    for li, (p, psi) in enumerate(zip(primes, psis)):
        r = [pow(psi, _bitrev(i, bits), p) for i in range(n)]
        roots[li] = np.array(r, dtype=np.uint32)
        iroots[li] = np.array(
            [pow(x, -1, p) for x in r], dtype=np.uint32
        )

    def pair(w: np.ndarray, axes_per_limb: int):
        return (
            jnp.asarray(w),
            jnp.asarray(_shoup_np(w, primes, axes_per_limb)),
        )

    fwd_stages = []
    inv_stages = []
    for s in range(bits):
        m = 1 << s
        fwd_stages.append(pair(roots[:, m : 2 * m, None], 2))
        inv_stages.append(pair(iroots[:, m : 2 * m, None], 2))
    n_inv_np = np.array(
        [[pow(n, -1, p)] for p in primes], dtype=np.uint32
    )

    # Four-step matrix layout tables (n2 = 128 minor axis): stage s >= s1
    # twiddle for transposed-view group (j2, r) is roots[m + r*m2 + j2].
    n2 = 128 if n >= 256 else 0
    fwd2: list = []
    inv2: list = []
    pk1_fwd = pk1_inv = pk2_fwd = pk2_inv = None
    if n2:
        n1 = n // n2
        s1 = n1.bit_length() - 1
        for s in range(s1, bits):
            m = 1 << s
            t = n >> (s + 1)
            m2 = n2 // (2 * t)
            # idx[j2, r] = m + r*m2 + j2
            idx = (
                m
                + np.arange(n1)[None, :] * m2
                + np.arange(m2)[:, None]
            )
            fwd2.append(pair(roots[:, idx][:, :, None, :], 3))
            inv2.append(pair(iroots[:, idx][:, :, None, :], 3))
        # Lane-expanded per-stage twiddle planes for the fused Pallas kernel.
        pk1f = np.zeros((nl_, s1, n1 // 2, n2), dtype=np.uint32)
        pk1i = np.zeros_like(pk1f)
        for s in range(s1):
            m = 1 << s
            tr = n1 >> (s + 1)
            g = np.repeat(np.arange(m), tr)  # row j = g*tr + jr -> group g
            pk1f[:, s] = roots[:, m + g][:, :, None]
            pk1i[:, s] = iroots[:, m + g][:, :, None]
        s2n = bits - s1
        pk2f = np.zeros((nl_, s2n, n2 // 2, n1), dtype=np.uint32)
        pk2i = np.zeros_like(pk2f)
        for s in range(s1, bits):
            t = n >> (s + 1)
            m2 = n2 // (2 * t)
            m = 1 << s
            j2 = np.repeat(np.arange(m2), t)  # row j = j2*t + jt
            idx = m + np.arange(n1)[None, :] * m2 + j2[:, None]
            pk2f[:, s - s1] = roots[:, idx]
            pk2i[:, s - s1] = iroots[:, idx]
        pk1_fwd = pair(pk1f, 3)
        pk1_inv = pair(pk1i, 3)
        pk2_fwd = pair(pk2f, 3)
        pk2_inv = pair(pk2i, 3)
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
        n_inv=pair(n_inv_np, 1),
        n2=n2,
        fwd_tw2=tuple(fwd2),
        inv_tw2=tuple(inv2),
        lazy=all(p < 2**30 for p in primes),
        pk1_fwd=pk1_fwd,
        pk1_inv=pk1_inv,
        pk2_fwd=pk2_fwd,
        pk2_inv=pk2_inv,
    )
