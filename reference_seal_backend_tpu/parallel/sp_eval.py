"""Slot-parallel (sp) execution path: evaluator ops with the coefficient
axis sharded across the mesh.

This is the end-to-end integration of the distributed four-step NTT
(parallel/sharded_ntt.py) into the evaluator's hot paths — dyadic
multiply, relinearization/Galois key switching (digit lift + mod-down),
and rescale — so a whole CKKS workload (eltwise multiply → relinearize →
rotate) runs with every polynomial sharded over ICI.  The reference
backend has no distributed layer at all (SURVEY.md §2.4); this module is
the framework's sequence-parallelism analogue: slot capacity and NTT
throughput scale with the ``sp`` mesh axis.

Layout.  sp ciphertexts hold NTT-domain data in the **transposed matrix
layout** ``[..., size, L, n2, n1]`` with the last axis (n1 = N/128)
sharded on the ``sp`` mesh axis — exactly the layout
``sharded_ntt.fwd`` produces and ``inv`` consumes, so round trips between
evaluator ops never pay extra all-to-alls.  Dyadic ops are elementwise in
any layout; only the NTT's mid-transform transpose moves data (ONE
``all_to_all`` per transform over ICI).  Conversion to/from the flat
``[..., size, L, N]`` single-device layout is a pure reshape+transpose
(:func:`to_sp_layout` / :func:`from_sp_layout`).

Every op here is bit-exact against the single-device Evaluator: the
arithmetic (Karatsuba multiply, Shoup inner products, reduction-tree
sums, divide-and-round) is performed in the identical order, and the
sharded NTT is stage-for-stage the four-step schedule of
``NttPlan._fwd_mat`` (tests/test_sp_eval.py asserts exact equality).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Dict, Optional, Sequence, Tuple

import functools
import re

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from reference_seal_backend_tpu.ops import modops
from reference_seal_backend_tpu.evaluator.eval import (
    _lazy_ok,
    _mod_sum,
    _mod_sum_lazy,
)
from reference_seal_backend_tpu.parallel import sharded_ntt
from reference_seal_backend_tpu.schemes.core import Ciphertext, Plaintext
from reference_seal_backend_tpu.schemes.keys import KeySet, SwitchKey
from reference_seal_backend_tpu.schemes.params import Context


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["level", "scale"],
)
@dataclass(frozen=True)
class SpCiphertext:
    """Ciphertext in sp layout: ``data[..., size, L, n2, n1]`` uint32,
    NTT-domain Montgomery, last axis sharded over the sp mesh axis."""

    data: jnp.ndarray
    level: int = 0
    scale: float = 1.0

    @property
    def size(self) -> int:
        return self.data.shape[-4]


def to_sp_layout(x: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """flat [..., N] -> transposed matrix layout [..., n2, n1]."""
    return jnp.swapaxes(x.reshape(*x.shape[:-1], n1, n2), -1, -2)


def from_sp_layout(t: jnp.ndarray) -> jnp.ndarray:
    """transposed layout [..., n2, n1] -> flat [..., N]."""
    n2, n1 = t.shape[-2], t.shape[-1]
    return jnp.swapaxes(t, -1, -2).reshape(*t.shape[:-2], n1 * n2)


def _c3(arr: jnp.ndarray) -> jnp.ndarray:
    """[L, 1]-shaped per-limb constants -> [L, 1, 1] for the two trailing
    (n2, n1) space axes of the sp layout."""
    return arr[..., None]


class SpEvaluator:
    """Evaluator ops over sp-sharded ciphertexts.

    Covers the op set the sharded workload path needs: add, ct-ct
    multiply (Karatsuba), relinearize, rotate/conjugate (hoist-free Galois
    key switch), and rescale — each the exact arithmetic of
    evaluator/eval.py with all NTT sweeps routed through the distributed
    four-step kernel (one all_to_all per transform).
    """

    def __init__(
        self, ctx: Context, keys: Optional[KeySet], mesh: Mesh,
        axis: str = "sp", batch_axes: Tuple[str, ...] = (),
    ):
        """``batch_axes`` names mesh axes carrying the ciphertexts' leading
        batch dims — a dp×sp combined mesh shards the Offline batch on
        ``dp`` while every polynomial's coefficient axis shards on ``sp``
        (the OpenMP-loop and sequence-parallel analogues composed)."""
        self.ctx = ctx
        self.keys = keys
        self.mesh = mesh
        self.axis = axis
        self.batch_axes = tuple(batch_axes)
        self.n1 = ctx.plan.n1
        self.n2 = ctx.plan.n2
        if not self.n2:
            raise ValueError("sp sharding needs the four-step layout (N >= 256)")
        if self.n1 % mesh.shape[axis]:
            raise ValueError("n1 must divide the sp mesh axis size")
        self._key_cache: Dict = {}
        self._perm_cache: Dict[int, jnp.ndarray] = {}

    # -- placement ---------------------------------------------------------

    def shard(self, ct: Ciphertext) -> SpCiphertext:
        """Flat single-device ciphertext -> sp layout, placed on the mesh
        (the 'load' step of the sharded pipeline)."""
        t = to_sp_layout(ct.data, self.n1, self.n2)
        nb = len(self.batch_axes)
        spec = P(*self.batch_axes, *([None] * (t.ndim - 1 - nb)), self.axis)
        t = jax.device_put(t, NamedSharding(self.mesh, spec))
        return SpCiphertext(data=t, level=ct.level, scale=ct.scale)

    def unshard(self, ct: SpCiphertext) -> Ciphertext:
        return Ciphertext(
            data=from_sp_layout(ct.data),
            level=ct.level,
            scale=ct.scale,
            is_ntt=True,
        )

    def shard_pt(self, pt: Plaintext) -> Plaintext:
        """Plaintext [..., L, N] -> sp layout [..., L, n2, n1] on the mesh."""
        t = to_sp_layout(pt.data, self.n1, self.n2)
        spec = P(*([None] * (t.ndim - 1)), self.axis)
        t = jax.device_put(t, NamedSharding(self.mesh, spec))
        return replace(pt, data=t)

    # -- dyadic ops ----------------------------------------------------------

    def add(self, a: SpCiphertext, b: SpCiphertext) -> SpCiphertext:
        p = _c3(self.ctx.p[: a.level])
        return replace(a, data=modops.mod_add(a.data, b.data, p))

    def _pt_sp(self, pt: Plaintext) -> jnp.ndarray:
        """Plaintext data in sp layout: accepts either the flat
        single-device form [..., l, N] (relayouted inline — a
        reshape+transpose XLA folds into the consuming elementwise op) or
        an already-sp [..., l, n2, n1].  Flat acceptance is what lets the
        composite primitives (collapse's one-hot mask, Horner's
        coefficient encodes) duck-type onto this evaluator unchanged."""
        d = pt.data
        if d.shape[-1] == self.n1 * self.n2:
            return to_sp_layout(d, self.n1, self.n2)
        return d

    def add_plain(self, a: SpCiphertext, pt: Plaintext) -> SpCiphertext:
        """evaluator/eval.py add_plain in sp layout (BFV plaintexts get
        the Δ scaling, as in the single-device path)."""
        if pt.level != a.level:
            raise ValueError("plaintext level mismatch")
        p = _c3(self.ctx.p[: a.level])
        pt_data = self._pt_sp(pt)
        if self.ctx.scheme == "bfv":
            pt_data = modops.shoup_mul(
                pt_data,
                _c3(self.ctx.delta_plain[: a.level]),
                _c3(self.ctx.delta_shoup[: a.level]),
                p,
            )
        c0 = modops.mod_add(a.data[..., 0, :, :, :], pt_data, p)
        data = jnp.concatenate(
            [c0[..., None, :, :, :], a.data[..., 1:, :, :, :]], axis=-4
        )
        return replace(a, data=data)

    def multiply_plain(self, a: SpCiphertext, pt: Plaintext) -> SpCiphertext:
        if pt.level != a.level:
            raise ValueError("plaintext level mismatch")
        l = a.level
        p = _c3(self.ctx.p[:l])
        pni = _c3(self.ctx.p_neg_inv[:l])
        data = modops.mont_mul(a.data, self._pt_sp(pt), p, pni)
        return replace(a, data=data, scale=a.scale * pt.scale)

    def sub(self, a: SpCiphertext, b: SpCiphertext) -> SpCiphertext:
        p = _c3(self.ctx.p[: a.level])
        return replace(a, data=modops.mod_sub(a.data, b.data, p))

    def negate(self, a: SpCiphertext) -> SpCiphertext:
        p = _c3(self.ctx.p[: a.level])
        return replace(a, data=modops.mod_neg(a.data, p))

    # -- level / scale -----------------------------------------------------

    def mod_switch_to(self, a: SpCiphertext, level: int) -> SpCiphertext:
        if level > a.level:
            raise ValueError("cannot mod-switch up")
        if level < 1:
            raise ValueError("cannot drop below one live prime")
        return replace(a, data=a.data[..., :level, :, :], level=level)

    def mod_switch_plain_to(self, pt: Plaintext, level: int) -> Plaintext:
        if level > pt.level:
            raise ValueError("cannot mod-switch plaintext up")
        if pt.data.shape[-1] == self.n1 * self.n2:  # flat layout
            return replace(pt, data=pt.data[..., :level, :], level=level)
        return replace(pt, data=pt.data[..., :level, :, :], level=level)

    def multiply(self, a: SpCiphertext, b: SpCiphertext) -> SpCiphertext:
        """Karatsuba ct-ct multiply, op-for-op evaluator/eval.py
        Evaluator.multiply (bit-exact).  BFV routes through the sharded
        BEHZ pipeline (:meth:`_bfv_multiply`)."""
        if self.ctx.scheme == "bfv":
            return self._bfv_multiply(a, b)
        l = a.level
        p = _c3(self.ctx.p[:l])
        pni = _c3(self.ctx.p_neg_inv[:l])
        a0, a1 = a.data[..., 0, :, :, :], a.data[..., 1, :, :, :]
        b0, b1 = b.data[..., 0, :, :, :], b.data[..., 1, :, :, :]
        c0 = modops.mont_mul(a0, b0, p, pni)
        c2 = modops.mont_mul(a1, b1, p, pni)
        z = modops.mont_mul(
            modops.mod_add(a0, a1, p), modops.mod_add(b0, b1, p), p, pni
        )
        cross = modops.mod_sub(modops.mod_sub(z, c0, p), c2, p)
        data = jnp.stack([c0, cross, c2], axis=-4)
        return replace(a, data=data, scale=a.scale * b.scale)

    def _bfv_multiply(self, a: SpCiphertext, b: SpCiphertext) -> SpCiphertext:
        """BEHZ BFV ct-ct multiply with every NTT sweep distributed —
        op-for-op evaluator/behz.py bfv_multiply (bit-exact): the q ∪ Bsk
        stacked plan (tb.mult_plan) threads through the plan-parametric
        sharded four-step kernel, and every base-conversion step is
        elementwise in the (n1, n2) space axes, so the whole multiply
        still costs 4 serial transform sweeps with ONE all_to_all each."""
        from reference_seal_backend_tpu.evaluator import behz

        ctx, mesh, ax, ba = self.ctx, self.mesh, self.axis, self.batch_axes
        tb = behz.tables_for(ctx)
        k = ctx.L
        if a.size != 2 or b.size != 2:
            raise NotImplementedError("bfv multiply expects size-2 inputs")
        # [k, 1] / scalar-pair constants -> sp broadcast [k, 1, 1]
        c2c = lambda pair: (_c3(pair[0]), _c3(pair[1]))
        # [k, kb, 1] cross-base tables -> [k, kb, 1, 1]
        c3p = lambda pair: (pair[0][..., None], pair[1][..., None])
        q_p = _c3(tb.q_p)
        bsk_p = _c3(tb.bsk_p)

        shape = jnp.broadcast_shapes(a.data.shape, b.data.shape)
        nlead = len(shape) - 4  # leading batch dims (dp×sp composes)
        abx = (slice(None),) * nlead
        ab = jnp.stack(
            [jnp.broadcast_to(a.data, shape), jnp.broadcast_to(b.data, shape)],
            axis=nlead,
        )  # [batch..., 2ab, 2, k, n2, n1] NTT Montgomery
        ab_mat = sharded_ntt.inv(ctx.plan, ab, mesh, ax, lo=0, batch_axes=ba)
        ab_q = modops.from_mont(ab_mat, q_p, _c3(tb.q_pni))
        # -- fast base conversion q -> Bsk ∪ {m_tilde} (behz
        #    _conv_to_bsk_mtilde with one extra space axis) ----------------
        y = modops.shoup_mul(ab_q, *c2c(tb.mtilde_qhinv), q_p)
        terms = modops.shoup_mul_lazy(
            y[..., :, None, :, :], *c3p(tb.qh_mod_bsk), bsk_p
        )  # [..., k, kb, n1, n2]
        xs = behz._mod_sum_axis_lazy(terms, bsk_p, axis=-4)
        xt = (
            jnp.sum((y & behz._MASK16) * _c3(tb.qh_mod_mtilde), axis=-3)
            & behz._MASK16
        )
        r = (xt * tb.neg_qinv_mtilde) & behz._MASK16
        flag = (r > behz._HALF_MTILDE).astype(jnp.uint32)[..., None, :, :]
        r = r[..., None, :, :]
        ab_bsk = modops.mod_sub(
            modops.mod_add(
                modops.shoup_mul(xs, *c2c(tb.mtilde_inv_bsk), bsk_p),
                modops.shoup_mul(r, *c2c(tb.q_mtilde_inv_bsk), bsk_p),
                bsk_p,
            ),
            flag * _c3(tb.q_mod_bsk),
            bsk_p,
        )
        # -- tensor product over the stacked q ∪ Bsk base -------------------
        x_all = jnp.concatenate([ab_q, ab_bsk], axis=-3)
        all_p = _c3(tb.all_p)
        x_a = modops.shoup_mul(
            x_all[abx + (slice(0, 1),)], *c2c(tb.all_r1), all_p
        )  # operand a enters Montgomery form
        x_all = jnp.concatenate(
            [x_a, x_all[abx + (slice(1, 2),)]], axis=nlead
        )
        ntt_all = sharded_ntt.fwd(
            tb.mult_plan, x_all, mesh, ax, lo=0, batch_axes=ba
        )  # [..., 2ab, 2, k+kb, n2, n1]
        xa = ntt_all[abx + (0,)]
        yb = ntt_all[abx + (1,)]
        all_pni = _c3(tb.all_pni)
        x0, x1 = xa[..., 0, :, :, :], xa[..., 1, :, :, :]
        y0, y1 = yb[..., 0, :, :, :], yb[..., 1, :, :, :]
        t0 = modops.mont_mul(x0, y0, all_p, all_pni)
        t2 = modops.mont_mul(x1, y1, all_p, all_pni)
        # raw Karatsuba sums: exact for primes < 2**30 (behz._tensor)
        z = modops.mont_mul(x0 + x1, y0 + y1, all_p, all_pni)
        t1 = modops.mod_sub(modops.mod_sub(z, t0, all_p), t2, all_p)
        prod_t = jnp.stack([t0, t1, t2], axis=-4)
        prod = sharded_ntt.inv(
            tb.mult_plan, prod_t, mesh, ax, lo=0, batch_axes=ba
        )  # [..., 3, k+kb, n1, n2] normal coeff
        prod_q = prod[..., :k, :, :]
        prod_bsk = prod[..., k:, :, :]
        # -- scale by t, floor-divide by q in Bsk (behz fast_floor; the
        #    q-side ×t is fused into tb.t_qhinv) --------------------------
        tc_bsk = modops.shoup_mul(prod_bsk, *c2c(tb.t_mod_bsk), bsk_p)
        y2 = modops.shoup_mul(prod_q, *c2c(tb.t_qhinv), q_p)
        fbc = behz._canon(
            behz._mod_sum_axis_lazy(
                modops.shoup_mul_lazy(
                    y2[..., :, None, :, :], *c3p(tb.qh_mod_bsk), bsk_p
                ),
                bsk_p,
                axis=-4,
            ),
            bsk_p,
        )
        y_bsk = modops.shoup_mul(
            modops.mod_sub(tc_bsk, fbc, bsk_p), *c2c(tb.qinv_bsk), bsk_p
        )
        # -- exact Shenoy-Kumaresan Bsk -> q (behz _sk_to_q) ----------------
        ka_ = len(tb.ctx.aux_primes)
        y_B = y_bsk[..., :ka_, :, :]
        y_msk = y_bsk[..., ka_:, :, :]
        msk_p = _c3(tb.bsk_p[ka_:])
        yp = modops.shoup_mul(y_B, *c2c(tb.Bh_inv), _c3(tb.bsk_p[:ka_]))
        conv_msk = behz._mod_sum_axis(
            modops.shoup_mul(yp, *c2c(tb.Bh_mod_msk), msk_p)[
                ..., :, None, :, :
            ],
            msk_p,
            axis=-4,
        )
        alpha = modops.shoup_mul(
            modops.mod_sub(conv_msk, y_msk, msk_p), *tb.Binv_msk, msk_p
        )
        aflag = (alpha > tb.half_msk).astype(jnp.uint32)
        s = behz._canon(
            behz._mod_sum_axis_lazy(
                modops.shoup_mul_lazy(
                    yp[..., :, None, :, :], *c3p(tb.Bh_mod_q), q_p
                ),
                q_p,
                axis=-4,
            ),
            q_p,
        )
        alpha_term = modops.shoup_mul(
            modops.barrett_reduce_u32(alpha, q_p, _c3(tb.q_mu)),
            *c2c(tb.B_mod_q),
            q_p,
        )
        out_q = modops.mod_add(
            modops.mod_sub(s, alpha_term, q_p),
            aflag * _c3(tb.msk_B_mod_q),
            q_p,
        )
        out_ntt = sharded_ntt.fwd(
            ctx.plan,
            modops.shoup_mul(out_q, *c2c(tb.q_r1), q_p),
            mesh,
            ax,
            lo=0,
            batch_axes=ba,
        )
        return SpCiphertext(data=out_ntt, level=k, scale=1.0)

    # -- key switching ---------------------------------------------------------

    def _targets3(self, l: int):
        ctx = self.ctx
        cat = lambda arr: jnp.concatenate([arr[:l], arr[ctx.sp_row :]], axis=0)
        return _c3(cat(ctx.p)), _c3(cat(ctx.mu))

    def _digits(self, d: jnp.ndarray, l: int) -> jnp.ndarray:
        """Key-switch digit decomposition + cross-limb lift + per-target
        forward NTT, all transforms distributed — grouped digits included
        (op-for-op evaluator/eval.py _hoisted_digits).  ``d``
        [..., l, n2, n1] NTT Montgomery -> [..., n_dig, l+ns, n1, n2]
        normal form."""
        ctx, mesh, ax = self.ctx, self.mesh, self.axis
        plan = ctx.plan
        G = ctx.digit_group
        lazy = _lazy_ok(ctx)
        d_mat = sharded_ntt.inv(plan, d, mesh, ax, lo=0, batch_axes=self.batch_axes)  # [..., l, n1, n2]
        p_t, mu_t = self._targets3(l)
        if G == 1:
            d_norm = modops.from_mont(
                d_mat, _c3(ctx.p[:l]), _c3(ctx.p_neg_inv[:l])
            )
            # Lazy path (evaluator/eval.py _hoisted_digits): the lift
            # stays in [0, 2p) — the Harvey NTT accepts it and the inner
            # products are exact for any uint32 representative.
            barrett = (
                modops.barrett_reduce_u32_lazy
                if lazy
                else modops.barrett_reduce_u32
            )
            lifted = barrett(
                d_norm[..., :, None, :, :], p_t, mu_t
            )  # [..., l_src, l+ns, n1, n2]
        else:
            ihat, W, Ws = ctx.digit_tables(l)
            v = modops.mont_mul(
                d_mat, _c3(ihat), _c3(ctx.p[:l]), _c3(ctx.p_neg_inv[:l])
            )  # [..., l, n1, n2] normal: d_k·(Q_g/q_k)^{-1}
            if lazy:
                contrib = modops.shoup_mul_lazy(
                    modops.barrett_reduce_u32_lazy(
                        v[..., :, None, :, :], p_t, mu_t
                    ),
                    _c3(W),
                    _c3(Ws),
                    p_t,
                )  # [..., l, l+ns, n1, n2] in [0, 2p)
            else:
                contrib = modops.shoup_mul(
                    modops.barrett_reduce_u32(
                        v[..., :, None, :, :], p_t, mu_t
                    ),
                    _c3(W),
                    _c3(Ws),
                    p_t,
                )  # [..., l, l+ns, n1, n2]
            nd = ctx.dig_count(l)
            pad = nd * G - l
            if pad:
                contrib = jnp.concatenate(
                    [contrib, jnp.zeros_like(contrib[..., :pad, :, :, :])],
                    axis=-4,
                )
            grp = contrib.reshape(
                *contrib.shape[:-4], nd, G, *contrib.shape[-3:]
            )
            lifted = grp[..., 0, :, :, :]
            p2_t = p_t + p_t
            for gi in range(1, G):
                if lazy:
                    lifted = modops.reduce_2p(
                        lifted + grp[..., gi, :, :, :], p2_t
                    )
                else:
                    lifted = modops.mod_add(
                        lifted, grp[..., gi, :, :, :], p_t
                    )
        # Lazy path: skip the canonical epilogue — the inner product's
        # shoup_mul is exact for digits in [0, 4p).
        data_part = sharded_ntt.fwd(
            plan, lifted[..., :l, :, :], mesh, ax, lo=0,
            batch_axes=self.batch_axes, epilogue=not lazy,
        )
        sp_part = sharded_ntt.fwd(
            plan, lifted[..., l:, :, :], mesh, ax, lo=ctx.sp_row,
            batch_axes=self.batch_axes, epilogue=not lazy,
        )
        return jnp.concatenate([data_part, sp_part], axis=-3)

    def _mod_down(self, x: jnp.ndarray, l: int) -> jnp.ndarray:
        """[..., l+ns, n2, n1] NTT Mont -> [..., l, n2, n1] Montgomery form
        of round(x / P) — evaluator/eval.py _mod_down_special (exact
        centered peel at ns=1; single-shot FBC at ns>1), NTTs
        distributed.  ``x`` may arrive LAZY in [0, 2p): the special-row
        iNTT is Harvey-tolerant and every live row passes through an
        exact any-uint32 shoup_mul (same analysis as the single-device
        path)."""
        ctx, mesh, ax = self.ctx, self.mesh, self.axis
        epi = not _lazy_ok(ctx)
        sp = ctx.sp_row
        ns = ctx.n_special
        plan = ctx.plan
        p = _c3(ctx.p[:l])
        if ns == 1:
            v_mat = sharded_ntt.inv(plan, x[..., l:, :, :], mesh, ax, lo=sp, batch_axes=self.batch_axes)
            v = modops.from_mont(
                v_mat, _c3(ctx.p[sp : sp + 1]), _c3(ctx.p_neg_inv[sp : sp + 1])
            )  # [..., 1, n1, n2] in [0, P)
            flag = (v > ctx.div_half[sp]).astype(jnp.uint32)
            w = modops.mod_sub(
                modops.barrett_reduce_u32(v, _c3(ctx.p[:l]), _c3(ctx.mu[:l])),
                flag * ctx.div_mod[sp, :l][:, None, None],
                _c3(ctx.p[:l]),
            )
            # w_ntt only feeds the fully-reducing shoup_mul below (exact
            # for any uint32) — skip the lazy NTT's canonical epilogue.
            w_ntt = sharded_ntt.fwd(
                plan, w, mesh, ax, lo=0, batch_axes=self.batch_axes,
                epilogue=epi,
            )
            sel = lambda t: t[sp, :l][:, None, None]
            return modops.mod_sub(
                modops.shoup_mul(
                    x[..., :l, :, :],
                    sel(ctx.div_inv),
                    sel(ctx.div_inv_shoup),
                    p,
                ),
                modops.shoup_mul(
                    w_ntt,
                    sel(ctx.div_inv_mont),
                    sel(ctx.div_inv_mont_shoup),
                    p,
                ),
                p,
            )
        ihat, W, Ws, invP, invPs, invPm, invPms = ctx.moddown_tables(l)
        v_mat = sharded_ntt.inv(plan, x[..., l:, :, :], mesh, ax, lo=sp, batch_axes=self.batch_axes)
        y = modops.mont_mul(
            v_mat, _c3(ihat), _c3(ctx.p[sp:]), _c3(ctx.p_neg_inv[sp:])
        )  # [..., ns, n1, n2] normal: v_s·(P/p_s)^{-1}
        contrib = modops.shoup_mul(
            modops.barrett_reduce_u32(
                y[..., :, None, :, :], _c3(ctx.p[:l]), _c3(ctx.mu[:l])
            ),
            _c3(W),
            _c3(Ws),
            p,
        )  # [..., ns, l, n1, n2]
        u = contrib[..., 0, :, :, :]
        for si in range(1, ns):
            u = modops.mod_add(u, contrib[..., si, :, :, :], p)
        # u_ntt only feeds the fully-reducing shoup_mul below (exact for
        # any uint32) — skip the lazy NTT's canonical epilogue.
        u_ntt = sharded_ntt.fwd(
            plan, u, mesh, ax, lo=0, batch_axes=self.batch_axes,
            epilogue=epi,
        )
        return modops.mod_sub(
            modops.shoup_mul(x[..., :l, :, :], _c3(invP), _c3(invPs), p),
            modops.shoup_mul(u_ntt, _c3(invPm), _c3(invPms), p),
            p,
        )

    def _key_t(self, key: SwitchKey, l: int):
        """Switch-key slices in sp layout (host-side one-time): the
        cat-key selection of evaluator/eval.py key_switch, reshaped/
        transposed to [n_dig, l+ns, n2, n1]."""
        ck = (id(key), l)
        if ck not in self._key_cache:
            ctx = self.ctx
            sp = ctx.sp_row
            nd = ctx.dig_count(l)
            ns = ctx.n_special
            n1, n2 = self.n1, self.n2

            def prep(arr):
                a = np.asarray(arr)
                a = np.concatenate([a[:nd, :l], a[:nd, sp:]], axis=1)
                a = a.reshape(nd, l + ns, n1, n2).swapaxes(-1, -2)
                return jnp.asarray(np.ascontiguousarray(a))

            self._key_cache[ck] = (
                prep(key.b), prep(key.a), prep(key.bs), prep(key.as_)
            )
        return self._key_cache[ck]

    def key_switch(
        self, d: jnp.ndarray, key: SwitchKey, level: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Switch sp-layout component ``d`` [..., l, n2, n1] to the base
        key; returns (kb, ka) each [..., l, n2, n1] NTT Montgomery."""
        l = level
        p_t, _ = self._targets3(l)
        dig = self._digits(d, l)  # [..., n_dig, l+ns, n2, n1]
        kb, ka, kbs, kas = self._key_t(key, l)
        if _lazy_ok(self.ctx):
            # evaluator/eval.py key_switch's lazy range analysis: terms in
            # [0, 2p) (shoup_mul_lazy exact for the [0, 4p) digits), sum
            # stays lazy, the mod-down consumes [0, 2p) directly.
            tb = modops.shoup_mul_lazy(dig, kb, kbs, p_t)
            ta = modops.shoup_mul_lazy(dig, ka, kas, p_t)
            acc_b = _mod_sum_lazy(tb, p_t, axis=-4)
            acc_a = _mod_sum_lazy(ta, p_t, axis=-4)
        else:
            tb = modops.shoup_mul(dig, kb, kbs, p_t)
            ta = modops.shoup_mul(dig, ka, kas, p_t)
            acc_b = _mod_sum(tb, p_t, axis=-4)
            acc_a = _mod_sum(ta, p_t, axis=-4)
        return self._mod_down(acc_b, l), self._mod_down(acc_a, l)

    def relinearize(self, a: SpCiphertext) -> SpCiphertext:
        if a.size == 2:
            return a
        if self.keys is None or self.keys.relin is None:
            raise ValueError("no relinearization key")
        l = a.level
        p = _c3(self.ctx.p[:l])
        kb, ka = self.key_switch(a.data[..., 2, :, :, :], self.keys.relin, l)
        c0 = modops.mod_add(a.data[..., 0, :, :, :], kb, p)
        c1 = modops.mod_add(a.data[..., 1, :, :, :], ka, p)
        return replace(a, data=jnp.stack([c0, c1], axis=-4))

    # -- Galois / rotations ----------------------------------------------------

    def _galois_perm_t(self, g: int) -> jnp.ndarray:
        """The NTT-storage Galois permutation recomposed for the sp
        layout's flattened (n2, n1) order: T ∘ perm ∘ T⁻¹ with T the
        matrix-transpose index map."""
        if g not in self._perm_cache:
            n1, n2 = self.n1, self.n2
            perm = np.asarray(self.ctx.plan.galois_perm(g))
            k = np.arange(n1 * n2)
            jof = (k % n1) * n2 + k // n1      # sp index -> flat index
            src_flat = perm[jof]               # source flat index
            perm_t = (src_flat % n2) * n1 + src_flat // n2
            with jax.ensure_compile_time_eval():
                self._perm_cache[g] = jnp.asarray(perm_t.astype(np.int32))
        return self._perm_cache[g]

    def apply_galois(self, a: SpCiphertext, g: int) -> SpCiphertext:
        if self.keys is None or (g % (2 * self.ctx.n)) not in self.keys.galois:
            raise ValueError(f"missing Galois key for element {g}")
        if a.size != 2:
            raise ValueError("relinearize before rotating")
        g = g % (2 * self.ctx.n)
        l = a.level
        p = _c3(self.ctx.p[:l])
        perm_t = self._galois_perm_t(g)
        lead = a.data.shape[:-2]
        flat = a.data.reshape(*lead, self.n1 * self.n2)
        permuted = jnp.take(flat, perm_t, axis=-1).reshape(a.data.shape)
        kb, ka = self.key_switch(
            permuted[..., 1, :, :, :], self.keys.galois[g], l
        )
        c0 = modops.mod_add(permuted[..., 0, :, :, :], kb, p)
        return replace(a, data=jnp.stack([c0, ka], axis=-4))

    def rotate(self, a: SpCiphertext, steps: int) -> SpCiphertext:
        n = self.ctx.n
        steps = steps % (n // 2)
        if steps == 0:
            return a
        return self.apply_galois(a, pow(5, steps, 2 * n))

    def conjugate(self, a: SpCiphertext) -> SpCiphertext:
        return self.apply_galois(a, 2 * self.ctx.n - 1)

    # -- hoisted rotations -----------------------------------------------------

    def _perm_flat(self, x: jnp.ndarray, perm_t: jnp.ndarray) -> jnp.ndarray:
        """Apply a flat slot permutation to sp-layout trailing (n2, n1)."""
        lead = x.shape[:-2]
        flat = x.reshape(*lead, self.n1 * self.n2)
        return jnp.take(flat, perm_t, axis=-1).reshape(x.shape)

    def _p5_sp(self):
        """Power-of-5 orbit-order gathers for the sp layout (cached):
        (P_sp, Q_sp) with  x_p5 = flat_sp(x)[..., P_sp]  in true p5 index
        order and  flat_sp(x) = x_p5[..., Q_sp]  back — the single-device
        p5-roll trick (evaluator/eval.py rotate_sum / params.Context
        .p5_order) composed with the sp layout's (n2, n1) transpose, so a
        sharded rotate_sum pays TWO cross-shard gathers total instead of
        one per rotation (each per-rotation φ_g is then a roll: slices,
        local or one collective-permute over ICI)."""
        if "p5sp" not in self._perm_cache:
            n1, n2 = self.n1, self.n2
            P_np = np.asarray(self.ctx.p5_order()[0])
            Q_np = np.empty_like(P_np)
            Q_np[P_np] = np.arange(P_np.size)
            # sp-flat index j holds storage index (j % n1)*n2 + j // n1
            # (to_sp_layout's transpose); invert that map around P/Q.
            P_sp = (P_np % n2) * n1 + P_np // n2
            k = np.arange(n1 * n2)
            Q_sp = Q_np[(k % n1) * n2 + k // n1]
            with jax.ensure_compile_time_eval():
                self._perm_cache["p5sp"] = (
                    jnp.asarray(P_sp.astype(np.int32)),
                    jnp.asarray(Q_sp.astype(np.int32)),
                )
        return self._perm_cache["p5sp"]

    def _hoist_key_p5(self, g: int, l: int):
        """Hoisted rotate_sum key stacks for element ``g`` in flat p5
        order: φ_{g^{-1}} pre-applied then the p5 re-order (prefers the
        keygen-precomputed ``keys.galois_p5``), cat-key selected to
        [2(b,a), n_dig, l+ns, N].

        The galois_p5 path does the cat-selection with jnp ops (like
        evaluator/eval.py _cat_key) so switch keys may flow through jit
        as ARGUMENTS — tracers cannot take the host-side np path, and
        keys-as-arguments is mandatory at N>=16384 (remote-compile 413
        limit; see models/base.py jit_with_keys).  Tracer results are
        never cached (a cached tracer would leak into later traces)."""
        ck = ("p5", g, l)
        if ck in self._key_cache:
            return self._key_cache[ck]
        ctx = self.ctx
        sp, nd = ctx.sp_row, ctx.dig_count(l)
        kp5 = getattr(self.keys, "galois_p5", None)
        if kp5 and g in kp5:
            key = kp5[g]
            tracer = any(
                isinstance(arr, jax.core.Tracer)
                for arr in (key.b, key.a, key.bs, key.as_)
            )
            cat = lambda arr: jnp.concatenate(
                [arr[:nd, :l], arr[:nd, sp:]], axis=1
            )
            if tracer:
                pair_w = jnp.stack([cat(key.b), cat(key.a)])
                pair_s = jnp.stack([cat(key.bs), cat(key.as_)])
                return pair_w, pair_s
            with jax.ensure_compile_time_eval():
                pair_w = jnp.stack([cat(key.b), cat(key.a)])
                pair_s = jnp.stack([cat(key.bs), cat(key.as_)])
            self._key_cache[ck] = (pair_w, pair_s)
            return pair_w, pair_s
        # Fallback for concrete KeySets without precomputed galois_p5:
        # host-side one-time permutation (cannot take tracers).
        key = self.keys.galois[g]
        g_inv = pow(g, -1, 2 * ctx.n)
        idx = np.asarray(ctx.plan.galois_perm(g_inv))[
            np.asarray(ctx.p5_order()[0])
        ]

        def prep(arr):
            a = np.take(np.asarray(arr), idx, axis=-1)
            return np.concatenate([a[:nd, :l], a[:nd, sp:]], axis=1)

        with jax.ensure_compile_time_eval():
            pair_w = jnp.asarray(np.stack([prep(key.b), prep(key.a)]))
            pair_s = jnp.asarray(np.stack([prep(key.bs), prep(key.as_)]))
        self._key_cache[ck] = (pair_w, pair_s)
        return pair_w, pair_s

    def rotate_sum(
        self, a: SpCiphertext, steps: Sequence[int]
    ) -> SpCiphertext:
        """Σ_s rotate(a, s) with ONE hoisted digit decomposition and ONE
        mod-down shared across all rotations — op-for-op the arithmetic of
        evaluator/eval.py Evaluator.rotate_sum (bit-exact), with every NTT
        sweep distributed.  Like the single-device path, the shared digits
        and c0 are gathered into p5 orbit order ONCE and each rotation's
        φ_g is a roll (two slices — no per-rotation cross-shard gather);
        see :meth:`_p5_sp`.  Together with accumulate()'s duck typing this
        runs the dot-product BSGS accumulate fully sp-sharded."""
        ctx = self.ctx
        if a.size != 2:
            raise ValueError("relinearize before rotating")
        n = ctx.n
        slots = n // 2
        norm = [s % slots for s in steps]
        nonzero = [s for s in norm if s != 0]
        n_id = len(norm) - len(nonzero)
        l = a.level
        p3 = _c3(ctx.p[:l])
        if not nonzero:
            out = a.data
            for _ in range(n_id - 1):
                out = modops.mod_add(out, a.data, p3)
            return replace(a, data=out)
        # flat targets: p5-ordered tensors carry a single flat slot axis.
        cat = lambda arr: jnp.concatenate(
            [arr[:l], arr[ctx.sp_row :]], axis=0
        )
        p_t = cat(ctx.p)                           # [l+ns, 1]
        lazy = _lazy_ok(ctx)
        p2_t = p_t + p_t
        P_sp, Q_sp = self._p5_sp()
        n1n2 = self.n1 * self.n2
        flat = lambda x: x.reshape(*x.shape[:-2], n1n2)
        unflat = lambda x: x.reshape(*x.shape[:-1], self.n2, self.n1)
        from reference_seal_backend_tpu.evaluator.eval import Evaluator

        dig = jnp.take(
            flat(self._digits(a.data[..., 1, :, :, :], l)), P_sp, axis=-1
        )  # [..., n_dig, l+ns, N] p5 order
        c0_p5 = jnp.take(flat(a.data[..., 0, :, :, :]), P_sp, axis=-1)
        acc = None           # [..., 2(b,a), l+ns, N] pre-mod-down, p5 order
        c0_parts = []        # rolled c0 components, [..., l, N] p5 order
        for s in nonzero:
            g = pow(5, s, 2 * n)
            if self.keys is None or g not in self.keys.galois:
                raise ValueError(f"missing Galois key for element {g}")
            pair_w, pair_s = self._hoist_key_p5(g, l)
            if lazy:
                # Inner product rides [0, 2p): lazy Shoup terms, lazy
                # tree, lazy cross-rotation accumulate — the mod-down
                # consumes [0, 2p) directly (key_switch's analysis).
                terms = modops.shoup_mul_lazy(
                    dig[..., None, :, :, :], pair_w, pair_s, p_t
                )  # [..., 2, n_dig, l+ns, N]
                acc_g = _mod_sum_lazy(terms, p_t, axis=-3)
                acc_g = Evaluator._roll_p5(acc_g, s)  # apply φ_g
                acc = (
                    acc_g
                    if acc is None
                    else modops.reduce_2p(acc + acc_g, p2_t)
                )
            else:
                terms = modops.shoup_mul(
                    dig[..., None, :, :, :], pair_w, pair_s, p_t
                )  # [..., 2, n_dig, l+ns, N]
                acc_g = _mod_sum(terms, p_t, axis=-3)  # [..., 2, l+ns, N]
                acc_g = Evaluator._roll_p5(acc_g, s)   # apply φ_g
                acc = (
                    acc_g
                    if acc is None
                    else modops.mod_add(acc, acc_g, p_t)
                )
            c0_parts.append(Evaluator._roll_p5(c0_p5, s))
        acc = unflat(jnp.take(acc, Q_sp, axis=-1))  # back to sp layout
        kba = self._mod_down(acc, l)               # [..., 2, l, n2, n1]
        c0_rot = unflat(
            jnp.take(_mod_sum(jnp.stack(c0_parts), ctx.p[:l], axis=0),
                     Q_sp, axis=-1)
        )
        c0 = modops.mod_add(c0_rot, kba[..., 0, :, :, :], p3)
        c1 = kba[..., 1, :, :, :]
        for _ in range(n_id):
            c0 = modops.mod_add(c0, a.data[..., 0, :, :, :], p3)
            c1 = modops.mod_add(c1, a.data[..., 1, :, :, :], p3)
        return replace(a, data=jnp.stack([c0, c1], axis=-4))

    # -- level / scale -----------------------------------------------------------

    def rescale_to_next(self, a: SpCiphertext) -> SpCiphertext:
        """Composite rescale (evaluator/eval.py rescale_to_next) with the
        drop-prime iNTT / re-NTT sweeps distributed."""
        ctx, mesh, ax = self.ctx, self.mesh, self.axis
        group = getattr(ctx, "rescale_group", 1)
        l = a.level
        if l - group < getattr(ctx, "min_level", 1):
            raise ValueError("no prime group left to rescale")
        data = a.data
        scale = a.scale
        for _ in range(group):
            drop = l - 1
            v_mat = sharded_ntt.inv(
                ctx.plan, data[..., drop:l, :, :], mesh, ax, lo=drop,
                batch_axes=self.batch_axes,
            )
            v = modops.from_mont(
                v_mat,
                _c3(ctx.p[drop : drop + 1]),
                _c3(ctx.p_neg_inv[drop : drop + 1]),
            )
            flag = (v > ctx.div_half[drop]).astype(jnp.uint32)
            w = modops.mod_sub(
                modops.barrett_reduce_u32(
                    v, _c3(ctx.p[:drop]), _c3(ctx.mu[:drop])
                ),
                flag * ctx.div_mod[drop, :drop][:, None, None],
                _c3(ctx.p[:drop]),
            )
            # w_ntt only feeds the fully-reducing shoup_mul below — skip
            # the lazy NTT's canonical epilogue (evaluator/eval.py
            # _drop_one_scaled).
            w_ntt = sharded_ntt.fwd(
                ctx.plan, w, mesh, ax, lo=0, batch_axes=self.batch_axes,
                epilogue=not _lazy_ok(ctx),
            )
            p = _c3(ctx.p[:drop])
            sel = lambda t: t[drop, :drop][:, None, None]
            data = modops.mod_sub(
                modops.shoup_mul(
                    data[..., :drop, :, :],
                    sel(ctx.div_inv),
                    sel(ctx.div_inv_shoup),
                    p,
                ),
                modops.shoup_mul(
                    w_ntt,
                    sel(ctx.div_inv_mont),
                    sel(ctx.div_inv_mont_shoup),
                    p,
                ),
                p,
            )
            l -= 1
            scale /= ctx.data_primes[l]
        return replace(a, data=data, level=l, scale=scale)


# -- observability -------------------------------------------------------------

_COLLECTIVES = ("all-to-all", "all-gather", "collective-permute", "all-reduce")


def collective_stats(jitted, *args) -> Dict[str, int]:
    """Compile a jitted function and count the collective ops XLA emitted —
    the measurable stand-in for cross-chip traffic when only virtual
    devices are available (VERDICT r1 item 4).  Returns op counts plus
    ``a2a_bytes``: total bytes crossing the all-to-alls (from their HLO
    result shapes)."""
    txt = jitted.lower(*args).compile().as_text()
    stats = {name: 0 for name in _COLLECTIVES}
    a2a_bytes = 0
    # HLO op lines look like
    #   %all-to-all.3 = (u32[7,16,2]{…}, u32[7,16,2]{…}, …) all-to-all(…)
    # count applications (not get-tuple-element references) and sum the
    # result-shape payload of the all-to-alls.
    for line in txt.splitlines():
        m = re.search(
            r"= (.*?)\b(all-to-all|all-gather|collective-permute|all-reduce)"
            r"(?:-start)?(?:\.\d+)?\(",
            line,
        )
        if not m:
            continue
        stats[m.group(2)] += 1
        if m.group(2) == "all-to-all":
            for s in re.findall(r"u32\[([\d,]+)\]", m.group(1)):
                a2a_bytes += 4 * int(
                    np.prod([int(d) for d in s.split(",")])
                )
    stats["a2a_bytes"] = a2a_bytes
    return stats
