"""Composite HE primitives shared by the workloads.

TPU-native counterparts of the reference's ``SEALContextWrapper`` toolkit:

* :func:`accumulate` — sum-across-slots by a log2 rotate-add tree
  (reference accumulateCKKS /root/reference src/engine/seal_context.cpp:321-347
  and accumulateBFV :289-319 including the rotate_columns fold when the
  count spills into the second batching row).
* :func:`collapse` — gather slot 0 of k ciphertexts into one ciphertext
  (reference collapseCKKS :349-415).  The reference rotates each ciphertext
  i by -i (k-1 distinct Galois keys, k-1 serial key-switches under OpenMP);
  here we mask slot 0 and run a **log2(k) doubling merge**: each round
  rotates half the survivors by a power-of-two step — one *batched*
  key-switch per round with a single Galois element, which is both
  asymptotically fewer key-switches and TPU-batch friendly.
* :func:`evaluate_polynomial` — Horner evaluation with plaintext
  coefficients (reference evaluatePolynomial :417-458).  Where the
  reference mutates pre-encoded coefficient plaintexts and force-matches
  scales (the "results will be wrong if scales are not close" comments),
  we encode each coefficient lazily at the ciphertext's *exact* current
  scale, so no forced-scale error is ever introduced.
"""

from __future__ import annotations

import math
from dataclasses import replace
from typing import List, Sequence

import numpy as np
import jax.numpy as jnp

from reference_seal_backend_tpu.evaluator.eval import Evaluator
from reference_seal_backend_tpu.schemes.core import Ciphertext
from reference_seal_backend_tpu.schemes import ckks as ckks_mod


# Below this count the linear hoisted form (count-1 rotations sharing ONE
# digit decomposition + ONE mod-down, Evaluator.rotate_sum) costs fewer
# VPU ops than ceil(log2(count)) full key-switches; above it the log tree
# wins.  Break-even from the measured cost model: a digit-lift ≈ 6.5×, a
# mod-down ≈ 1.3× one key-inner-product.
_HOIST_MAX_COUNT = 32
# Between _HOIST_MAX_COUNT and this bound a baby-step/giant-step split
# (window sum of ⌈√count⌉ slots, then ⌈count/√count⌉ window strides — TWO
# hoisted key-switches total, each with ≤ 32 inner products) beats the
# ceil(log2(count)) serial key-switches of the tree: with the cost model
# above, 2·(6.5 + √c + 1.3) < 8.8·log2(c) holds for 32 < c ≲ 1500.  Past
# that the linear inner-product term overtakes the tree.
_BSGS_MAX_COUNT = 1024


def _hoisted(count: int) -> bool:
    return 1 < count <= _HOIST_MAX_COUNT


def _bsgs_split(count: int) -> tuple:
    baby = math.isqrt(count - 1) + 1  # ceil(sqrt(count))
    giant = -(-count // baby)         # ceil(count / baby)
    return baby, giant


def rotations_for_accumulate(count: int, slots: int) -> List[int]:
    """Rotation steps accumulate() will use for ``count`` (drives which
    Galois keys a benchmark generates): linear 1..count-1 for small counts
    (one hoisted key-switch), baby-step/giant-step for medium counts (two
    hoisted key-switches), power-of-two tree otherwise."""
    count = min(count, slots)
    if count <= 1:
        return []
    if _hoisted(count):
        return list(range(1, count))
    if count <= _BSGS_MAX_COUNT:
        baby, giant = _bsgs_split(count)
        return list(range(1, baby)) + [baby * i for i in range(1, giant)]
    return [1 << i for i in range(math.ceil(math.log2(count)))]


def accumulate(ev: Evaluator, ct: Ciphertext, count: int) -> Ciphertext:
    """Sum slots 0..count-1 into slot 0.

    Small counts: one hoisted multi-rotation (slot j then holds the exact
    window sum Σ_{i<count} v[j+i]).  Large counts: log2 rotate-add tree
    (slots hold power-of-two-window partial sums).  Every caller — dot
    product, matmultval row·row, logreg W·x — reads slot 0 only, like the
    reference (accumulateCKKS/BFV results are read at slot 0, e.g.
    /root/reference src/benchmarks/ckks/seal_ckks_dot_product_benchmark.cpp:202-219).
    BFV: rotations act per batching row, plus one rotate_columns fold when
    count exceeds the row size.
    """
    ctx = ev.ctx
    row = ctx.n // 2 if ctx.scheme == "bfv" else ctx.slots
    row_count = min(count, row)
    if _hoisted(row_count):
        out = ev.rotate_sum(ct, list(range(row_count)))
    elif 1 < row_count <= _BSGS_MAX_COUNT:
        # Baby-step/giant-step: slot j of the baby pass holds the window
        # sum Σ_{i<baby} v[j+i]; striding those windows by `baby` covers
        # baby·giant ≥ count slots (the overshoot reads zero-padded slots,
        # exactly like the tree's power-of-two window).  Two hoisted
        # key-switches total instead of ceil(log2(count)) serial ones.
        baby, giant = _bsgs_split(row_count)
        out = ev.rotate_sum(ct, list(range(baby)))
        out = ev.rotate_sum(out, [baby * i for i in range(giant)])
    else:
        out = ct
        for step in rotations_for_accumulate(row_count, row):
            out = ev.add(out, ev.rotate(out, step))
    if ctx.scheme == "bfv" and count > row:
        out = ev.add(out, ev.conjugate(out))
    return out


def collapse(
    ev: Evaluator, cts: Ciphertext, count: int
) -> Ciphertext:
    """From a batched ciphertext [count, ...] whose samples hold their
    value in slot 0, build one ciphertext with sample i's value in slot i.

    CKKS only (like the reference).  Consumes one rescale level (the
    one-hot mask multiply), like the reference's collapseCKKS.
    Requires Galois keys for steps -2^s, s < ceil(log2(count)).
    """
    ctx = ev.ctx
    if cts.data.ndim < 4 or cts.data.shape[0] < count:
        raise ValueError("expected leading batch axis of >= count samples")
    enc = ckks_mod.encoder_for(ctx)
    # One-hot mask at slot 0.  Encoded at the *compensating* scale so the
    # post-rescale result lands at exactly ctx.scale: the reference instead
    # force-overrides scales before the bias add ("results will be wrong if
    # scales are not close", …logreg_horner.cpp:459-465), which with this
    # framework's ~26-bit composite primes would cost ~1e-4 absolute error.
    drop = 1.0
    for i in range(cts.level - ctx.rescale_group, cts.level):
        drop *= ctx.data_primes[i]
    mask = np.zeros(ctx.slots)
    mask[0] = 1.0
    pt = enc.encode(mask, scale=drop * ctx.scale / cts.scale)
    pt = ev.mod_switch_plain_to(pt, cts.level)
    masked = ev.rescale_to_next(ev.multiply_plain(cts, pt))
    # doubling merge: round s combines block pairs, rotating the odd
    # block right by 2^s so its slots land after the even block's.
    cur = masked
    k = cur.data.shape[0]
    s = 1
    while k > 1:
        pairs = k // 2
        even = replace(cur, data=cur.data[0 : 2 * pairs : 2])
        odd = replace(cur, data=cur.data[1 : 2 * pairs : 2])
        moved = ev.rotate(odd, -s)
        merged = ev.add(even, moved)
        if k % 2:
            merged = replace(
                merged,
                data=jnp.concatenate([merged.data, cur.data[-1:]], axis=0),
            )
        cur = merged
        k = pairs + (k % 2)
        s *= 2
    return replace(cur, data=cur.data[0])


def collapse_rotation_steps(count: int) -> List[int]:
    """Galois rotation steps collapse() needs for a given batch size."""
    if count <= 1:
        return []
    return [-(1 << s) for s in range(math.ceil(math.log2(count)))]


def evaluate_polynomial(
    ev: Evaluator,
    ct: Ciphertext,
    coeffs: Sequence[float],
) -> Ciphertext:
    """Horner evaluation of Σ coeffs[i]·x^i on a CKKS ciphertext.

    Counterpart of the reference's evaluatePolynomial (/root/reference
    src/engine/seal_context.cpp:417-458) with two deliberate differences:
    the running value starts as the *plaintext* top coefficient — the
    reference instead encrypts it (…logreg_horner.cpp:471-476), an
    unnecessary encryption of a public constant whose randomness would
    here be traced once into the jitted graph and silently replayed — so
    the first Horner step is a ct-pt multiply and no RNG ever runs under
    jit; and each coefficient is encoded at the running value's *exact*
    scale instead of force-overriding scales.  Needs len(coeffs)-1
    rescale levels below ct's current level.
    """
    ctx = ev.ctx
    enc = ckks_mod.encoder_for(ctx)
    if len(coeffs) == 0:
        raise ValueError("polynomial needs at least one coefficient")
    if len(coeffs) == 1:
        # Constant polynomial: a transparent (noiseless) ciphertext of
        # the public constant — nothing secret to protect.
        pt = enc.encode(np.full(ctx.slots, float(coeffs[0])), scale=ct.scale)
        pt = ev.mod_switch_plain_to(pt, ct.level)
        zero = jnp.zeros_like(pt.data)
        return replace(
            ct, data=jnp.stack([pt.data, zero], axis=-3), scale=pt.scale
        )
    rest = list(coeffs[:-1])[::-1]
    # First step: r = c_top·x + a via ct-pt multiply (no relin needed).
    top = enc.encode(np.full(ctx.slots, float(coeffs[-1])), scale=ct.scale)
    top = ev.mod_switch_plain_to(top, ct.level)
    r = ev.rescale_to_next(ev.multiply_plain(ct, top))
    pt = enc.encode(np.full(ctx.slots, float(rest[0])), scale=r.scale)
    r = ev.add_plain(r, ev.mod_switch_plain_to(pt, r.level))
    x = ct
    for a in rest[1:]:
        x = ev.mod_switch_to(x, r.level)
        r = ev.rescale_to_next(ev.relinearize(ev.multiply(r, x)))
        pt = enc.encode(np.full(ctx.slots, float(a)), scale=r.scale)
        pt = ev.mod_switch_plain_to(pt, r.level)
        r = ev.add_plain(r, pt)
    return r
