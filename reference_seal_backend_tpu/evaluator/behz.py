"""BEHZ RNS BFV ct-ct multiplication (Bajard-Eynard-Hasan-Zucca 2016).

Integer-only RNS multiply with the t/q scaling BFV requires, with no
bignum arithmetic on device — every step is uint32 Montgomery ops and NTTs
over two prime bases:

  1. fast base conversion of inputs  q -> Bsk ∪ {m_tilde}, inputs
     pre-multiplied by m_tilde
  2. small Montgomery reduction mod m_tilde = 2**16 (kills the conversion's
     q-overflows; mod-2^16 arithmetic is free bit masking on the VPU)
  3. tensor product in both bases via NTT dyadic multiplies
  4. scale by t and floor-divide by q in Bsk (fast_floor)
  5. exact Shenoy-Kumaresan conversion Bsk -> q using m_sk

Base sizes: q has k ~31-bit primes; B has k+1 (so B ≫ q — the headroom the
S-K conversion needs when aux primes cannot exceed 31 bits); Bsk = B ∪
{m_sk}.  Form conventions: base-extension math runs on *normal-form*
residues; every constant is stored as a Shoup pair (w, floor(w·2^32/p)) so
each step is one shoup_mul (~half a Montgomery product).  shoup_mul is
exact for any uint32 left operand, so cross-base digits are used
unreduced; ciphertexts enter/leave in the at-rest NTT Montgomery form.

Role-equivalent to the SEAL BFV ``Evaluator::multiply`` the reference
calls in src/benchmarks/bfv/seal_bfv_element_wise_benchmark.cpp:289-348 —
rebuilt from the BEHZ construction with TPU-native [limb, N] layouts and
limb-axis contractions, not ported from SEAL.

Evaluated and REJECTED (VERDICT r3 item 8 / ROADMAP item 1): skipping the
m_tilde correction for the second operand.  Noise bound: a plain FBC for
operand b yields the Bsk representative b' = b + α·q with coefficients
α ∈ [0, k); the tensor product then carries q·α·a, and after the ×t/q
floor and the exact S-K conversion the decryption-relevant additive term
is t·α·(Δ m_a + e_a) ≡ −r_t·(α·m_a) + t·(α·e_a) (mod q), r_t = q mod t.
Ring-product norms give extra noise ≤ N·(k−1)·(r_t·t/2 + t·‖e_a‖∞) —
the partner operand's noise contribution scaled by ≈ k, i.e. ~log2(k)
≈ 2 bits of budget per multiply at the registered k=4 chain.  The ops it
would save (the m_tilde-specific xt/r/flag + two Shoup sweeps over
[2, kb, N] for one operand) total ≈ 1.6% of the multiply's ~144M VPU ops
(76% of which are the 4 stacked NTT sweeps).  2 bits/multiply of the
19-bit post-registered-chain budget for a 1.6% op cut loses.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from reference_seal_backend_tpu.ops import modops
from reference_seal_backend_tpu.ops import ntt as ntt_mod
from reference_seal_backend_tpu.schemes.core import Ciphertext
from reference_seal_backend_tpu.schemes.params import BfvContext

_MASK16 = np.uint32(0xFFFF)
_MTILDE = 1 << 16
_HALF_MTILDE = np.uint32(1 << 15)


def _pair(vals, primes):
    """Shoup pair columns [(w_i, floor(w_i·2^32/p_i))] as [k, 1] arrays."""
    vals = list(vals)
    primes = list(primes)
    w = np.array([[v % p] for v, p in zip(vals, primes)], dtype=np.uint32)
    s = np.array(
        [[((v % p) << 32) // p] for v, p in zip(vals, primes)],
        dtype=np.uint32,
    )
    return jnp.asarray(w), jnp.asarray(s)


def _pair2(rows, col_primes):
    """Shoup pairs for a [rows, cols, 1] table; modulus varies per column."""
    w = np.array(
        [[v % p for v, p in zip(r, col_primes)] for r in rows],
        dtype=np.uint32,
    )
    s = np.array(
        [
            [((v % p) << 32) // p for v, p in zip(r, col_primes)]
            for r in rows
        ],
        dtype=np.uint32,
    )
    return jnp.asarray(w)[..., None], jnp.asarray(s)[..., None]


class BehzTables:
    """Host-precomputed constant tables for one BFV context."""

    def __init__(self, ctx: BfvContext):
        self.ctx = ctx
        k = ctx.L
        q_primes = ctx.data_primes
        aux = ctx.aux_primes  # k+1 primes, base B
        bsk = ctx.bsk_primes  # aux + (m_sk,)
        # The lazy-range tricks below (raw Karatsuba sums into mont_mul,
        # [0, 2p) conversion trees) assume every prime < 2**30 — which
        # BfvContext's 30-bit chain guarantees; guard against other uses.
        if any(p >= 1 << 30 for p in q_primes + bsk):
            raise ValueError("BEHZ tables require all primes < 2**30")
        q = ctx.q
        t = ctx.t
        B = 1
        for b in aux:
            B *= b
        m_sk = ctx.m_sk

        qh = [q // qi for qi in q_primes]
        qh_inv = [pow(qh[i] % q_primes[i], -1, q_primes[i]) for i in range(k)]

        # step 1: y_i = x_i * (m_tilde * q̂_i^{-1}) mod q_i
        self.mtilde_qhinv = _pair(
            (_MTILDE * qh_inv[i] for i in range(k)), q_primes
        )
        # step-4 fusion: the ×t scaling of prod_q and the floor-divide
        # FBC's q̂_i^{-1} pre-multiply are consecutive constant Shoup
        # multiplies — folded into one constant (t·q̂_i^{-1} mod q_i),
        # saving a full [3, k, N] shoup_mul sweep per multiply.
        self.t_qhinv = _pair(
            (t * qh_inv[i] for i in range(k)), q_primes
        )
        # q̂_i mod p_j for p_j in Bsk: [k, kb, 1] Shoup pairs
        self.qh_mod_bsk = _pair2(
            [[qh[i] for _ in bsk] for i in range(k)], bsk
        )
        self.qh_mod_mtilde = jnp.asarray(
            np.array([[qh[i] % _MTILDE] for i in range(k)], dtype=np.uint32)
        )
        self.neg_qinv_mtilde = np.uint32(
            (-pow(q % _MTILDE, -1, _MTILDE)) % _MTILDE
        )
        # step 2 constants per Bsk prime
        self.mtilde_inv_bsk = _pair(
            (pow(_MTILDE, -1, pj) for pj in bsk), bsk
        )
        self.q_mtilde_inv_bsk = _pair(
            (q * pow(_MTILDE, -1, pj) % pj for pj in bsk), bsk
        )
        self.q_mod_bsk = jnp.asarray(
            np.array([[q % pj] for pj in bsk], dtype=np.uint32)
        )
        # step 4: ×t then floor-divide by q in Bsk (the q-side ×t is
        # fused into t_qhinv above)
        self.t_mod_bsk = _pair((t for _ in bsk), bsk)
        self.qinv_bsk = _pair((pow(q % pj, -1, pj) for pj in bsk), bsk)
        # step 5 (Shenoy-Kumaresan, base B -> q via m_sk)
        ka = len(aux)
        Bh = [B // bi for bi in aux]
        self.Bh_inv = _pair(
            (pow(Bh[i] % aux[i], -1, aux[i]) for i in range(ka)), aux
        )
        self.Bh_mod_msk = _pair(
            (Bh[i] for i in range(ka)), (m_sk,) * ka
        )
        self.Bh_mod_q = _pair2(
            [[Bh[i] for _ in q_primes] for i in range(ka)], q_primes
        )
        binv = pow(B % m_sk, -1, m_sk)
        self.Binv_msk = (
            np.uint32(binv),
            np.uint32((binv << 32) // m_sk),
        )
        self.B_mod_q = _pair((B for _ in q_primes), q_primes)
        self.msk_B_mod_q = jnp.asarray(
            np.array(
                [[(m_sk % qj) * (B % qj) % qj] for qj in q_primes],
                dtype=np.uint32,
            )
        )
        self.half_msk = np.uint32(m_sk // 2)

        self.q_p = ctx.p[:k]
        self.q_pni = ctx.p_neg_inv[:k]
        self.q_mu = ctx.mu[:k]
        # R mod p pairs: enter Montgomery form with one shoup_mul
        self.q_r1 = _pair(((1 << 32) for _ in q_primes), q_primes)
        self.bsk_p = ctx.bsk_plan.p
        self.bsk_pni = ctx.bsk_plan.p_neg_inv
        self.bsk_r1 = _pair(((1 << 32) for _ in bsk), bsk)
        # Fused tensor base q ∪ Bsk: one NTT plan over the stacked limb
        # axis so the tensor product's six per-base transform sweeps
        # (fwd a, fwd b, inv prod — per base) run as single stacked-limb
        # sweeps.  Per-limb twiddles/constants are identical to the
        # separate plans, so the fusion is bit-exact.
        self.mult_plan = ntt_mod.make_plan(ctx.n, q_primes + bsk)
        self.all_p = jnp.concatenate([self.q_p, self.bsk_p], axis=0)
        self.all_pni = jnp.concatenate([self.q_pni, self.bsk_pni], axis=0)
        self.all_r1 = (
            jnp.concatenate([self.q_r1[0], self.bsk_r1[0]], axis=0),
            jnp.concatenate([self.q_r1[1], self.bsk_r1[1]], axis=0),
        )


@functools.lru_cache(maxsize=None)
def tables_for(ctx: BfvContext) -> BehzTables:
    # Tables are cached across jit traces, so they must hold concrete
    # arrays even when first requested from inside a trace.
    with jax.ensure_compile_time_eval():
        return BehzTables(ctx)


def _mod_sum_axis(x: jnp.ndarray, p: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Pairwise modular sum-reduction along ``axis`` (keeps values < p)."""
    n = x.shape[axis]
    idx = lambda s: tuple(
        s if d == axis % x.ndim else slice(None) for d in range(x.ndim)
    )
    while n > 1:
        half = n // 2
        a = x[idx(slice(0, half))]
        b = x[idx(slice(half, 2 * half))]
        rest = x[idx(slice(2 * half, n))]
        x = jnp.concatenate([modops.mod_add(a, b, p), rest], axis=axis)
        n = half + (n - 2 * half)
    return jnp.squeeze(x, axis=axis)


def _mod_sum_axis_lazy(x: jnp.ndarray, p: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Reduction-tree sum of LAZY [0, 2p) terms along ``axis``; result in
    [0, 2p).  Valid because every BEHZ prime is < 2**30 (BfvContext's
    30-bit cap), so a raw pair-add stays < 4p < 2**32.  The conversion
    terms come from shoup_mul_lazy — 4 ops cheaper each on the
    [k, kb, N]-sized tensors that dominate the base conversions."""
    p2 = p + p
    n = x.shape[axis]
    idx = lambda s: tuple(
        s if d == axis % x.ndim else slice(None) for d in range(x.ndim)
    )
    while n > 1:
        half = n // 2
        a = x[idx(slice(0, half))]
        b = x[idx(slice(half, 2 * half))]
        rest = x[idx(slice(2 * half, n))]
        x = jnp.concatenate(
            [modops.reduce_2p(a + b, p2), rest], axis=axis
        )
        n = half + (n - 2 * half)
    return jnp.squeeze(x, axis=axis)


def _canon(x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """[0, 2p) -> [0, p): single conditional subtract."""
    return x - (x >= p).astype(jnp.uint32) * p


def _conv_to_bsk_mtilde(tb: BehzTables, x_q: jnp.ndarray) -> jnp.ndarray:
    """x (normal coeff, [..., k, N] over q) -> x in Bsk, exactly (the
    m_tilde Montgomery reduction cancels the conversion overflow)."""
    y = modops.shoup_mul(x_q, *tb.mtilde_qhinv, tb.q_p)
    # x*_j = Σ_i y_i · (q̂_i mod p_j), p_j ∈ Bsk — lazy terms/tree; xs
    # stays in [0, 2p): its only consumer below is an exact any-uint32
    # shoup_mul, so no canonical epilogue is needed.
    terms = modops.shoup_mul_lazy(
        y[..., :, None, :], *tb.qh_mod_bsk, tb.bsk_p
    )  # [..., k, kb, N]
    xs = _mod_sum_axis_lazy(terms, tb.bsk_p, axis=-3)
    # x*_mtilde = Σ_i y_i · (q̂_i mod 2^16)  (wraparound keeps low 16 bits)
    xt = jnp.sum((y & _MASK16) * tb.qh_mod_mtilde, axis=-2) & _MASK16
    r = (xt * tb.neg_qinv_mtilde) & _MASK16  # ≡ -α (mod m_tilde)
    flag = (r > _HALF_MTILDE).astype(jnp.uint32)[..., None, :]
    r = r[..., None, :]
    out = modops.mod_add(
        modops.shoup_mul(xs, *tb.mtilde_inv_bsk, tb.bsk_p),
        modops.shoup_mul(r, *tb.q_mtilde_inv_bsk, tb.bsk_p),
        tb.bsk_p,
    )
    return modops.mod_sub(out, flag * tb.q_mod_bsk, tb.bsk_p)


def _fbc_q_to_bsk(tb: BehzTables, x_q: jnp.ndarray, pair) -> jnp.ndarray:
    """Plain fast base conversion q -> Bsk (may carry +αq, α < k, absorbed
    as noise by the surrounding floor).  ``pair`` is the Shoup constant of
    the q̂^{-1} pre-multiply — fast_floor passes the fused t·q̂^{-1}
    (tb.t_qhinv) so the ×t scaling costs no extra sweep."""
    y = modops.shoup_mul(x_q, *pair, tb.q_p)
    terms = modops.shoup_mul_lazy(
        y[..., :, None, :], *tb.qh_mod_bsk, tb.bsk_p
    )
    # Canonicalize: the caller feeds this into mod_sub.
    return _canon(
        _mod_sum_axis_lazy(terms, tb.bsk_p, axis=-3), tb.bsk_p
    )


def _sk_to_q(tb: BehzTables, y_bsk: jnp.ndarray) -> jnp.ndarray:
    """Exact Shenoy-Kumaresan conversion of (possibly centered-negative)
    y [..., kb, N] over Bsk = B ∪ {m_sk} into base q: [..., k, N]."""
    ka = len(tb.ctx.aux_primes)
    y_B = y_bsk[..., :ka, :]
    y_msk = y_bsk[..., ka:, :]
    msk_p = tb.bsk_p[ka:]
    msk_pni = tb.bsk_pni[ka:]
    yp = modops.shoup_mul(y_B, *tb.Bh_inv, tb.bsk_p[:ka])
    # α = (Σ_i y'_i·B̂_i - y) / B  recovered mod m_sk, centered
    terms_msk = modops.shoup_mul(yp, *tb.Bh_mod_msk, msk_p)
    conv_msk = _mod_sum_axis(terms_msk[..., :, None, :], msk_p, axis=-3)
    alpha = modops.shoup_mul(
        modops.mod_sub(conv_msk, y_msk, msk_p),
        *tb.Binv_msk,
        msk_p,
    )  # [..., 1, N] in [0, m_sk)
    flag = (alpha > tb.half_msk).astype(jnp.uint32)
    terms_q = modops.shoup_mul_lazy(
        yp[..., :, None, :], *tb.Bh_mod_q, tb.q_p
    )  # [..., ka, k, N]
    # Canonicalize for the mod_sub below.
    s = _canon(_mod_sum_axis_lazy(terms_q, tb.q_p, axis=-3), tb.q_p)
    alpha_term = modops.shoup_mul(
        modops.barrett_reduce_u32(alpha, tb.q_p, tb.q_mu),
        *tb.B_mod_q,
        tb.q_p,
    )
    out = modops.mod_sub(s, alpha_term, tb.q_p)
    return modops.mod_add(out, flag * tb.msk_B_mod_q, tb.q_p)


def _tensor(x, y, p, pni):
    """(x0,x1)⊗(y0,y1) dyadic; x Montgomery, y normal -> products normal.

    Karatsuba form: 3 Montgomery products instead of 4 (see
    evaluator/eval.py multiply)."""
    x0, x1 = x[..., 0, :, :], x[..., 1, :, :]
    y0, y1 = y[..., 0, :, :], y[..., 1, :, :]
    c0 = modops.mont_mul(x0, y0, p, pni)
    c2 = modops.mont_mul(x1, y1, p, pni)
    # Raw Karatsuba sums (< 2p each): mont_mul stays exact with [0, p)
    # output for inputs < 2p since every prime is < 2**30 (see
    # evaluator/eval.py multiply).
    z = modops.mont_mul(x0 + x1, y0 + y1, p, pni)
    c1 = modops.mod_sub(modops.mod_sub(z, c0, p), c2, p)
    return jnp.stack([c0, c1, c2], axis=-3)


def bfv_multiply(ctx: BfvContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """BFV ct-ct multiply (no relinearization): 3-component result.

    Every transform sweep is fused across everything it can be: the two
    operands ride one stacked leading axis, and the q and Bsk bases ride
    one stacked limb axis (tb.mult_plan), so the whole multiply costs 4
    serial NTT sweeps (inv inputs, fwd tensor operands, inv products,
    fwd output) instead of 9 single-base ones.
    """
    tb = tables_for(ctx)
    k = ctx.L
    if a.size != 2 or b.size != 2:
        raise NotImplementedError("bfv multiply expects size-2 inputs")
    plan, mp = ctx.plan, tb.mult_plan

    shape = jnp.broadcast_shapes(a.data.shape, b.data.shape)
    ab = jnp.stack(
        [jnp.broadcast_to(a.data, shape), jnp.broadcast_to(b.data, shape)],
        axis=0,
    )  # [2ab, ..., 2, k, N] NTT Montgomery
    ab_q = modops.from_mont(
        plan.inv(ab, lo=0), tb.q_p, tb.q_pni
    )  # [2ab, ..., 2, k, N] normal coeff
    ab_bsk = _conv_to_bsk_mtilde(tb, ab_q)  # [2ab, ..., 2, kb, N]

    x_all = jnp.concatenate([ab_q, ab_bsk], axis=-2)  # [2ab, ..., 2, k+kb, N]
    # Operand a enters Montgomery form (×R) so the dyadic Montgomery
    # products land in normal form; operand b stays normal.
    x_all = jnp.concatenate(
        [
            modops.shoup_mul(x_all[:1], *tb.all_r1, tb.all_p),
            x_all[1:],
        ],
        axis=0,
    )
    ntt_all = mp.fwd(x_all, lo=0)
    prod = mp.inv(
        _tensor(ntt_all[0], ntt_all[1], tb.all_p, tb.all_pni), lo=0
    )  # [..., 3, k+kb, N] normal coeff
    prod_q = prod[..., :k, :]
    prod_bsk = prod[..., k:, :]

    # scale by t, floor-divide by q (in Bsk), convert exactly back to q;
    # the q-side ×t rides the FBC pre-multiply (tb.t_qhinv — one fused
    # constant sweep instead of two)
    tc_bsk = modops.shoup_mul(prod_bsk, *tb.t_mod_bsk, tb.bsk_p)
    y_bsk = modops.shoup_mul(
        modops.mod_sub(
            tc_bsk, _fbc_q_to_bsk(tb, prod_q, tb.t_qhinv), tb.bsk_p
        ),
        *tb.qinv_bsk,
        tb.bsk_p,
    )
    out_q = _sk_to_q(tb, y_bsk)
    out_ntt = plan.fwd(
        modops.shoup_mul(out_q, *tb.q_r1, tb.q_p), lo=0
    )
    return Ciphertext(data=out_ntt, level=k, scale=1.0, is_ntt=True)
