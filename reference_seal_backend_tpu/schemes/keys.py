"""Key generation: secret, public, relinearization and Galois keys.

Same key surface as the reference's per-benchmark key setup
(``SEALContextWrapper::createKeysAndEncryptors``, /root/reference
src/engine/seal_context.cpp:46-70) rebuilt for the RNS/uint32/NTT-domain
representation with **hybrid key switching over a (possibly multi-prime)
special modulus P = Π special_primes**:

For a source secret ``s_src`` (s² for relin, σ_g(s) for Galois) the switch
key is, per digit i (a group of ``digit_group`` consecutive data limbs,
schemes/params.py Context docstring) over the full basis ``q ∪ P``::

    ksk_i = ( -(a_i·s + e_i) + P·δ_i·s_src ,  a_i )

where δ_i is 1 on every limb of digit i's group and 0 elsewhere (and ≡ 0
mod each special prime).  Key-switching an input d decomposes it into
per-group digits d_i = [d]_{Q_i}, lifts each digit across the basis (fast
base conversion for grouped digits), and accumulates Σ_i d_i·ksk_i; the
mod-down by P then removes the noise scaled into P (evaluator/eval.py).

Key polynomials are stored in Montgomery form together with host-computed
Shoup companions (floor(w·2**32/p)): the key-switch inner product against
*normal-form* lifted digits is then one Shoup multiply per term
(normal·(val·R) = Montgomery form of the product), about half the VPU ops
of the Montgomery product it replaces.

Sampling: secret and encryption randomness are uniform-ternary, errors are
rounded Gaussians (σ=3.2, ±6σ clamp), sampled host side from a seeded
**ChaCha20 CSPRNG** (schemes/csprng.py — rejection-sampled, unbiased;
the role-parity counterpart of SEAL's Blake2 stream behind
createKeysAndEncryptors, /root/reference src/engine/seal_context.cpp:46-70);
the public ``a`` polynomials are sampled directly uniform per limb in NTT
domain (a bijection of uniform over R_q).  Reproducibility is unchanged:
the same ``seed`` yields the same KeySet; numpy Generators remain only
for benchmark input generation (harness-side data).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from reference_seal_backend_tpu.ops import modops
from reference_seal_backend_tpu.schemes import core
from reference_seal_backend_tpu.schemes.csprng import ChaChaRng
from reference_seal_backend_tpu.schemes.params import Context

SIGMA = 3.2


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["b", "a"],
    meta_fields=[],
)
@dataclass(frozen=True)
class PublicKey:
    b: jnp.ndarray  # [L_data, N] NTT Montgomery
    a: jnp.ndarray


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["b", "a", "bs", "as_"],
    meta_fields=[],
)
@dataclass(frozen=True)
class SwitchKey:
    """Per-digit switch key over the full basis.

    b, a: ``[n_dig, n_full, N]`` where n_dig = ceil(L_data / digit_group)
    and n_full = L_data + n_special (special primes last), stored in
    **Montgomery form**, with Shoup companions bs, as_
    (``floor(w·2**32/p)``) so the key-switch inner product against
    normal-form lifted digits is one Shoup multiply per term
    (normal·Mont = Montgomery-form product; see modops.shoup_mul).
    """

    b: jnp.ndarray
    a: jnp.ndarray
    bs: jnp.ndarray
    as_: jnp.ndarray


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["secret_ntt", "public", "relin", "galois", "galois_p5"],
    meta_fields=[],
)
@dataclass(frozen=True)
class KeySet:
    """Registered as a pytree so mesh replication / jit argument passing
    see through to the key arrays (parallel/mesh.py replicate).

    ``galois_p5`` holds, per rotation element g = 5^s, the hoisted variant
    of its switch key: the inverse automorphism φ_{g^{-1}} pre-applied and
    the slot axis re-ordered into the power-of-5 orbit order
    (params.Context.p5_order) — what Evaluator.rotate_sum's shared-digit
    inner products consume.  Precomputed at keygen (host-side, concrete)
    so key arrays can flow through jit as ARGUMENTS: embedding them as
    closure constants breaks the remote-compile path for big-N workloads
    (the compile request carries every embedded constant; logreg at
    N=16384 has ~600 MB of switch keys)."""

    secret_ntt: jnp.ndarray  # [L_data + ns, N] NTT Montgomery, full basis
    public: PublicKey
    relin: SwitchKey | None
    galois: Dict[int, SwitchKey]  # by Galois element g
    galois_p5: Dict[int, SwitchKey]  # hoisted rotate_sum keys, by element


def sample_ternary(rng, n: int) -> np.ndarray:
    """Uniform ternary secret in {-1, 0, 1} (``rng`` is a ChaChaRng; the
    numpy.Generator signature is kept so host oracles can reuse it)."""
    return rng.integers(-1, 2, size=n).astype(np.int64)


def sample_error(rng, n: int) -> np.ndarray:
    """Rounded Gaussian error, σ=3.2, clamped ±6σ (SEAL's clipped normal)."""
    e = np.rint(rng.normal(0.0, SIGMA, size=n)).astype(np.int64)
    return np.clip(e, -19, 19)


def batched_enc_randomness(rng, ctx: Context, primes, lead):
    """Encryption randomness (u, e0, e1) for a ``lead``-shaped batch,
    RNS-lifted to Montgomery and stacked to ``lead + (len(primes), N)``.

    Draw order matches per-sample encryption exactly (u, e0, e1 per
    sample, batch order), so batched and looped encryption are
    bit-identical under one seed.  Shared by both schemes'
    ``encrypt_pt`` (ckks.py / bfv.py)."""

    def res(coeffs):
        return core.rns_to_mont(core.int_poly_to_rns(coeffs, primes), primes)

    B = int(np.prod(lead)) if lead else 1
    trips = [
        tuple(
            res(draw(rng, ctx.n))
            for draw in (sample_ternary, sample_error, sample_error)
        )
        for _ in range(B)
    ]

    def stacked(j):
        a = np.stack([t[j] for t in trips])
        return jnp.asarray(a.reshape(tuple(lead) + a.shape[1:]))

    return stacked(0), stacked(1), stacked(2)


@functools.lru_cache(maxsize=None)
def _fwd_jit(ctx: Context, lo: int):
    """Jitted forward NTT for the host->device conversion path: eagerly
    each transform is ~14 stages of separate dispatches, and over the
    tunneled chip every dispatch carries ~0.2-0.5 s latency — encode/
    encrypt setup was paying tens of seconds per benchmark step."""
    return jax.jit(lambda res: ctx.plan.fwd(res, lo=lo))


def _to_ntt_mont(ctx: Context, coeffs: np.ndarray, rows: slice) -> jnp.ndarray:
    """Signed int coefficients -> device NTT Montgomery rows of the stack."""
    primes = ctx.primes[rows]
    res = core.rns_to_mont(core.int_poly_to_rns(coeffs, primes), primes)
    lo = rows.start or 0
    return _fwd_jit(ctx, lo)(jnp.asarray(res))


def _uniform_ntt(
    ctx: Context, rng: np.random.Generator, n_rows: int
) -> jnp.ndarray:
    cols = [
        rng.integers(0, p, size=ctx.n, dtype=np.uint32)
        for p in ctx.primes[:n_rows]
    ]
    return jnp.asarray(np.stack(cols))


def _shoup_floor(w: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """floor(w·2**32 / p) for w in [0, p), p < 2**31 — exact 32-step
    restoring division (each step doubles the remainder and emits one
    quotient bit; 2r < 2**32 because p < 2**31, so everything stays
    uint32).  Computed ON DEVICE: the switch keys never round-trip to
    the host — over the tunneled chip a 2×110 MB download + re-upload
    per keygen was the dominant (and stall-prone) cost of every
    key-switch benchmark step."""

    def body(_, qr):
        q, r = qr
        r2 = r << jnp.uint32(1)
        ge = r2 >= p
        return (
            (q << jnp.uint32(1)) | ge.astype(jnp.uint32),
            r2 - jnp.where(ge, p, jnp.uint32(0)).astype(jnp.uint32),
        )

    q, _ = jax.lax.fori_loop(0, 32, body, (jnp.zeros_like(w), w))
    return q


@functools.lru_cache(maxsize=None)
def _keygen_fn(
    ctx: Context,
    elts: Tuple[int, ...],
    need_relin: bool,
    p5_pos: Tuple[int, ...] = (),
):
    """One jitted device function for the whole keygen (keys are rebuilt
    per benchmark instance like the reference's
    ``createKeysAndEncryptors``, src/engine/seal_context.cpp:46-70; run
    eagerly this is hundreds of tiny dispatches — prohibitive over a
    remote-chip tunnel).  Everything large stays on device: Shoup
    companions via :func:`_shoup_floor` and the hoisted-rotate_sum
    galois_p5 relayouts as device gathers (``p5_idx`` rows, one per
    entry of ``p5_pos`` = the switch-key slots that get a p5 variant)."""
    L = ctx.L
    nf = L + ctx.n_special
    p_full, pni_full = ctx.p, ctx.p_neg_inv
    P = 1
    for sp in ctx.special_primes:
        P *= sp
    p_mod_mont = jnp.asarray(
        np.array(
            [[(P % q) * (1 << 32) % q] for q in ctx.data_primes],
            dtype=np.uint32,
        )
    )
    n_sk = (1 if need_relin else 0) + len(elts)
    n_dig = ctx.dig_count(L)

    def impl(s_res, a_pk, e_pk_res, a_sk, e_sk_res, p5_idx):
        s_ntt = ctx.plan.fwd(s_res, lo=0)  # [nf, N]
        p_d, pni_d = p_full[:L], pni_full[:L]
        e_pk = ctx.plan.fwd(e_pk_res, lo=0)
        b_pk = modops.mod_neg(
            modops.mod_add(
                modops.mont_mul(a_pk, s_ntt[:L], p_d, pni_d), e_pk, p_d
            ),
            p_d,
        )
        if n_sk == 0:
            return s_ntt, b_pk, None
        # switch-key sources: s² for relin, σ_g(s) per Galois element
        srcs = []
        if need_relin:
            srcs.append(modops.mont_mul(s_ntt, s_ntt, p_full, pni_full))
        for g in elts:
            srcs.append(ctx.plan.apply_galois_eval(s_ntt, g))
        src = jnp.stack(srcs)  # [n_sk, nf, N]
        e_sk = ctx.plan.fwd(e_sk_res, lo=0)
        b = modops.mod_neg(
            modops.mod_add(
                modops.mont_mul(a_sk, s_ntt, p_full, pni_full),
                e_sk,
                p_full,
            ),
            p_full,
        )  # [n_sk, n_dig, nf, N]
        # digit i additionally encrypts P·s_src on each row q_j of its
        # limb group (j // digit_group == i); for digit_group == 1 this
        # is the diagonal of the ungrouped layout.
        terms = modops.mont_mul(
            src[:, :L], p_mod_mont, p_d, pni_d
        )  # [n_sk, L, N]
        row = jnp.arange(L)
        dig = row // ctx.digit_group
        b = b.at[:, dig, row].set(
            modops.mod_add(b[:, dig, row], terms, p_d)
        )
        bs = _shoup_floor(b, p_full)
        as_ = _shoup_floor(a_sk, p_full)
        # hoisted rotate_sum (galois_p5) variants: φ_{g^{-1}} then the
        # p5 re-order, composed into one slot gather per key (indices
        # precomputed host-side, gathered here so the key arrays never
        # leave the device)
        p5 = None
        if p5_pos:
            outs = []
            for m, pos in enumerate(p5_pos):
                quad_m = jnp.stack(
                    [b[pos], a_sk[pos], bs[pos], as_[pos]]
                )  # [4, n_dig, nf, N]
                outs.append(jnp.take(quad_m, p5_idx[m], axis=-1))
            p5 = jnp.stack(outs)  # [n_p5, 4, n_dig, nf, N]
        return s_ntt, b_pk, (b, a_sk, bs, as_, p5)

    return jax.jit(impl)


def keygen(
    ctx: Context,
    seed: int = 0,
    galois_elts: Sequence[int] = (),
    need_relin: bool = True,
) -> KeySet:
    rng = ChaChaRng(seed, stream=0xC0FFEE)
    L = ctx.L
    nf = L + ctx.n_special
    n_dig = ctx.dig_count(L)
    two_n = 2 * ctx.n
    elts = []
    for g in galois_elts:
        g = g % two_n
        if g not in elts:
            elts.append(g)
    n_sk = (1 if need_relin else 0) + len(elts)

    def res(coeffs, primes):
        return core.rns_to_mont(core.int_poly_to_rns(coeffs, primes), primes)

    # host-side sampling, batched into whole-key arrays
    s_res = res(sample_ternary(rng, ctx.n), ctx.primes)
    a_pk = np.stack(
        [
            rng.integers(0, p, size=ctx.n, dtype=np.uint32)
            for p in ctx.primes[:L]
        ]
    )
    e_pk_res = res(sample_error(rng, ctx.n), ctx.primes[:L])
    if n_sk:
        a_sk = np.stack(
            [
                np.stack(
                    [
                        rng.integers(0, p, size=ctx.n, dtype=np.uint32)
                        for p in ctx.primes
                    ]
                )
                for _ in range(n_sk * n_dig)
            ]
        ).reshape(n_sk, n_dig, nf, ctx.n)
        e_sk_res = np.stack(
            [
                res(sample_error(rng, ctx.n), ctx.primes)
                for _ in range(n_sk * n_dig)
            ]
        ).reshape(n_sk, n_dig, nf, ctx.n)
    else:
        a_sk = np.zeros((0, n_dig, nf, ctx.n), dtype=np.uint32)
        e_sk_res = np.zeros((0, n_dig, nf, ctx.n), dtype=np.uint32)

    # hoisted-rotate_sum (galois_p5) gather indices, host-precomputed:
    # one [N] row per rotation-group element, applied on device so the
    # key arrays never round-trip to the host (the old host np.take path
    # downloaded + re-uploaded every switch key — hundreds of MB over
    # the chip tunnel, with stall-prone transfers)
    off = 1 if need_relin else 0
    p5_pos = []
    p5_rows = []
    P_np = ctx.p5_order()[0] if elts else None
    for j, g in enumerate(elts):
        if g == two_n - 1:
            continue  # conjugation is not in the rotation group <5>
        g_inv = pow(g, -1, two_n)
        p5_pos.append(off + j)
        p5_rows.append(np.asarray(ctx.plan.galois_perm(g_inv))[P_np])
    p5_idx = (
        np.stack(p5_rows).astype(np.int32)
        if p5_rows
        else np.zeros((0, ctx.n), dtype=np.int32)
    )

    fn = _keygen_fn(ctx, tuple(elts), need_relin, tuple(p5_pos))
    s_ntt, b_pk, sk_out = fn(
        jnp.asarray(s_res),
        jnp.asarray(a_pk),
        jnp.asarray(e_pk_res),
        jnp.asarray(a_sk),
        jnp.asarray(e_sk_res),
        jnp.asarray(p5_idx),
    )

    relin = None
    galois: Dict[int, SwitchKey] = {}
    galois_p5: Dict[int, SwitchKey] = {}
    if n_sk:
        b_sk, a_sk_out, bs, as_, p5 = sk_out
        k = 0
        if need_relin:
            relin = SwitchKey(
                b=b_sk[0], a=a_sk_out[0], bs=bs[0], as_=as_[0]
            )
            k = 1
        for j, g in enumerate(elts):
            galois[g] = SwitchKey(
                b=b_sk[k + j], a=a_sk_out[k + j],
                bs=bs[k + j], as_=as_[k + j],
            )
        for m, pos in enumerate(p5_pos):
            g = elts[pos - off]
            galois_p5[g] = SwitchKey(
                b=p5[m, 0], a=p5[m, 1], bs=p5[m, 2], as_=p5[m, 3]
            )

    return KeySet(
        secret_ntt=s_ntt,
        public=PublicKey(b=b_pk, a=jnp.asarray(a_pk)),
        relin=relin,
        galois=galois,
        galois_p5=galois_p5,
    )
