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


def _to_ntt_mont(ctx: Context, coeffs: np.ndarray, rows: slice) -> jnp.ndarray:
    """Signed int coefficients -> device NTT Montgomery rows of the stack."""
    primes = ctx.primes[rows]
    res = core.rns_to_mont(core.int_poly_to_rns(coeffs, primes), primes)
    lo = rows.start or 0
    return ctx.plan.fwd(jnp.asarray(res), lo=lo)


def _uniform_ntt(
    ctx: Context, rng: np.random.Generator, n_rows: int
) -> jnp.ndarray:
    cols = [
        rng.integers(0, p, size=ctx.n, dtype=np.uint32)
        for p in ctx.primes[:n_rows]
    ]
    return jnp.asarray(np.stack(cols))


@functools.lru_cache(maxsize=None)
def _keygen_fn(ctx: Context, elts: Tuple[int, ...], need_relin: bool):
    """One jitted device function for the whole keygen (keys are rebuilt
    per benchmark instance like the reference's
    ``createKeysAndEncryptors``, src/engine/seal_context.cpp:46-70; run
    eagerly this is hundreds of tiny dispatches — prohibitive over a
    remote-chip tunnel)."""
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

    def impl(s_res, a_pk, e_pk_res, a_sk, e_sk_res):
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
            return s_ntt, b_pk, None, None
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
        return s_ntt, b_pk, b, a_sk

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

    fn = _keygen_fn(ctx, tuple(elts), need_relin)
    s_ntt, b_pk, b_sk, a_sk_out = fn(
        jnp.asarray(s_res),
        jnp.asarray(a_pk),
        jnp.asarray(e_pk_res),
        jnp.asarray(a_sk),
        jnp.asarray(e_sk_res),
    )

    # Host-side Shoup companions for the constant key polys (one-time).
    if n_sk:
        p64 = np.array(ctx.primes, dtype=np.uint64)[:, None]
        b_np = np.asarray(b_sk)
        a_np = np.asarray(a_sk_out)
        bs_np = ((b_np.astype(np.uint64) << 32) // p64).astype(np.uint32)
        as_np = ((a_np.astype(np.uint64) << 32) // p64).astype(np.uint32)
        bs = jnp.asarray(bs_np)
        as_ = jnp.asarray(as_np)

    relin = None
    k = 0
    if need_relin:
        relin = SwitchKey(b=b_sk[0], a=a_sk_out[0], bs=bs[0], as_=as_[0])
        k = 1
    galois: Dict[int, SwitchKey] = {}
    galois_p5: Dict[int, SwitchKey] = {}
    P_np = ctx.p5_order()[0] if elts else None
    for g in elts:
        key = SwitchKey(b=b_sk[k], a=a_sk_out[k], bs=bs[k], as_=as_[k])
        galois[g] = key
        k += 1
        if g == two_n - 1:
            continue  # conjugation is not in the rotation group <5>
        # hoisted rotate_sum variant: φ_{g^{-1}} then the p5 re-order,
        # composed into one host-side gather (b_np/a_np are already host
        # copies from the Shoup computation above).
        g_inv = pow(g, -1, two_n)
        idx = np.asarray(ctx.plan.galois_perm(g_inv))[P_np]
        j = k - 1
        take = lambda arr: jnp.asarray(np.take(arr, idx, axis=-1))
        galois_p5[g] = SwitchKey(
            b=take(b_np[j]),
            a=take(a_np[j]),
            bs=take(bs_np[j]),
            as_=take(as_np[j]),
        )

    return KeySet(
        secret_ntt=s_ntt,
        public=PublicKey(b=b_pk, a=jnp.asarray(a_pk)),
        relin=relin,
        galois=galois,
        galois_p5=galois_p5,
    )
