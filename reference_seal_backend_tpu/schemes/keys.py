"""Key generation: secret, public, relinearization and Galois keys.

Same key surface as the reference's per-benchmark key setup
(``SEALContextWrapper::createKeysAndEncryptors``, /root/reference
src/engine/seal_context.cpp:46-70) rebuilt for the RNS/uint32/NTT-domain
representation with **hybrid key switching over one special modulus**:

For a source secret ``s_src`` (s² for relin, σ_g(s) for Galois) the switch
key is, per data limb i and over the full basis ``q ∪ {P}``::

    ksk_i = ( -(a_i·s + e_i) + P·δ_i·s_src ,  a_i )

where δ_i is 1 on limb i and 0 elsewhere (P·δ_i = [P]_{q_i} on row i, and
≡ 0 mod P on the special row).  Key-switching an input d decomposes it into
per-limb digits d_i = [d]_{q_i}, lifts each digit across the basis, and
accumulates Σ_i d_i·ksk_i; the mod-down by P then removes the noise scaled
into P (evaluator/eval.py).

Key polynomials are stored with an extra factor R (i.e. value·R² pattern,
"double-Montgomery") so that the inner products against *normal-form*
lifted digits land directly back in Montgomery form with a single
Montgomery multiply per term.

Sampling: secret and encryption randomness are uniform-ternary, errors are
centered-binomial-like rounded Gaussians (σ=3.2, ±6σ clamp), sampled host
side with numpy Generators (keygen is one-time per context); the public
``a`` polynomials are sampled directly uniform per limb in NTT domain
(a bijection of uniform over R_q).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from reference_seal_backend_tpu.ops import modops
from reference_seal_backend_tpu.schemes import core
from reference_seal_backend_tpu.schemes.params import Context

SIGMA = 3.2


@dataclass(frozen=True)
class PublicKey:
    b: jnp.ndarray  # [L_data, N] NTT Montgomery
    a: jnp.ndarray


@dataclass(frozen=True)
class SwitchKey:
    """Per-source-limb switch key over the full basis.

    b, a: ``[n_src, n_full, N]`` where n_full = L_data + 1 (special last),
    stored in double-Montgomery form (see module docstring).
    """

    b: jnp.ndarray
    a: jnp.ndarray


@dataclass(frozen=True)
class KeySet:
    secret_ntt: jnp.ndarray  # [L_data + 1, N] NTT Montgomery, full basis
    public: PublicKey
    relin: SwitchKey | None
    galois: Dict[int, SwitchKey]  # by Galois element g


def sample_ternary(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.integers(-1, 2, size=n).astype(np.int64)


def sample_error(rng: np.random.Generator, n: int) -> np.ndarray:
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


def _double_mont(ctx: Context, x: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """Multiply Montgomery-form rows by R (store value·R²·R^{-1}·R...)."""
    return modops.to_mont(
        x, ctx.p[:n_rows], ctx.p_neg_inv[:n_rows], ctx.r2[:n_rows]
    )


def _make_switch_key(
    ctx: Context,
    rng: np.random.Generator,
    s_ntt_full: jnp.ndarray,
    s_src_ntt_full: jnp.ndarray,
) -> SwitchKey:
    """Build ksk encrypting P·s_src under s, per data limb."""
    L = ctx.L
    nf = L + 1
    p_full = ctx.p
    pni_full = ctx.p_neg_inv
    # Montgomery forms of [P mod q_i] per data row.
    P = ctx.special_prime
    p_mod_mont = np.array(
        [[(P % q) * (1 << 32) % q] for q in ctx.data_primes],
        dtype=np.uint32,
    )
    bs, as_ = [], []
    for i in range(L):
        a_i = _uniform_ntt(ctx, rng, nf)
        e_i = _to_ntt_mont(ctx, sample_error(rng, ctx.n), slice(0, nf))
        b_i = modops.mod_neg(
            modops.mod_add(
                modops.mont_mul(a_i, s_ntt_full, p_full, pni_full),
                e_i,
                p_full,
            ),
            p_full,
        )
        term = modops.mont_mul(
            s_src_ntt_full[i],
            jnp.asarray(p_mod_mont[i]),
            p_full[i],
            pni_full[i],
        )
        b_i = b_i.at[i].set(modops.mod_add(b_i[i], term, p_full[i]))
        bs.append(_double_mont(ctx, b_i, nf))
        as_.append(_double_mont(ctx, a_i, nf))
    return SwitchKey(b=jnp.stack(bs), a=jnp.stack(as_))


def keygen(
    ctx: Context,
    seed: int = 0,
    galois_elts: Sequence[int] = (),
    need_relin: bool = True,
) -> KeySet:
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0xC0FFEE]))
    L = ctx.L
    nf = L + 1

    s = sample_ternary(rng, ctx.n)
    s_ntt = _to_ntt_mont(ctx, s, slice(0, nf))  # full basis

    # Public key over data limbs only (fresh ciphertexts live there).
    a_pk = _uniform_ntt(ctx, rng, L)
    e_pk = _to_ntt_mont(ctx, sample_error(rng, ctx.n), slice(0, L))
    p_d, pni_d = ctx.p[:L], ctx.p_neg_inv[:L]
    b_pk = modops.mod_neg(
        modops.mod_add(
            modops.mont_mul(a_pk, s_ntt[:L], p_d, pni_d), e_pk, p_d
        ),
        p_d,
    )

    relin = None
    if need_relin:
        s2 = modops.mont_mul(s_ntt, s_ntt, ctx.p, ctx.p_neg_inv)
        relin = _make_switch_key(ctx, rng, s_ntt, s2)

    galois: Dict[int, SwitchKey] = {}
    for g in galois_elts:
        g = g % (2 * ctx.n)
        if g in galois:
            continue
        s_g = ctx.plan.apply_galois_eval(s_ntt, g)
        galois[g] = _make_switch_key(ctx, rng, s_ntt, s_g)

    return KeySet(
        secret_ntt=s_ntt,
        public=PublicKey(b=b_pk, a=a_pk),
        relin=relin,
        galois=galois,
    )
