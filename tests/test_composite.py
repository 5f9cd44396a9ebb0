"""Composite primitives: accumulate, collapse, polynomial evaluation."""

import numpy as np
import pytest
from dataclasses import replace

import jax.numpy as jnp

from reference_seal_backend_tpu.schemes import bfv, ckks, keys as keys_mod
from reference_seal_backend_tpu.schemes.params import (
    make_bfv_context,
    make_ckks_context,
)
from reference_seal_backend_tpu.evaluator.eval import Evaluator
from reference_seal_backend_tpu.evaluator import composite

RNG = np.random.default_rng(5)
EPS = 5e-5


@pytest.fixture(scope="module")
def ckks_setup():
    ctx = make_ckks_context(poly_modulus_degree=2048, mult_depth=4, sec_level=0)
    # linear steps for hoisted small-count accumulate, baby/giant steps for
    # medium counts (accumulate's BSGS path at count=100), power-of-two
    # tree steps for large counts, negative steps for collapse
    steps = sorted(
        set(range(1, 16))
        | {16, 32, 64}
        | set(composite.rotations_for_accumulate(100, ctx.n // 2))
    ) + [-1, -2, -4]
    ks = keys_mod.keygen(
        ctx,
        seed=3,
        galois_elts=[pow(5, s % (ctx.slots), 2 * ctx.n) for s in steps],
    )
    enc = ckks.CkksEncoder(ctx)
    encryptor = ckks.CkksEncryptor(ctx, ks)
    dec = ckks.CkksDecryptor(ctx, ks)
    ev = Evaluator(ctx, ks)
    return ctx, enc, encryptor, dec, ev


def test_accumulate_ckks(ckks_setup):
    ctx, enc, encryptor, dec, ev = ckks_setup
    for count in (1, 7, 16, 100):
        v = RNG.uniform(-1, 1, ctx.slots)
        v[count:] = 0.0
        ct = encryptor.encrypt_pt(enc.encode(v))
        out = dec.decrypt(composite.accumulate(ev, ct, count)).real
        assert abs(out[0] - v[:count].sum()) < EPS * max(1, count)


def test_collapse_ckks(ckks_setup):
    ctx, enc, encryptor, dec, ev = ckks_setup
    for k in (2, 3, 8):
        vals = RNG.uniform(-1, 1, k)
        cts = []
        for i in range(k):
            v = np.zeros(ctx.slots)
            v[0] = vals[i]
            cts.append(encryptor.encrypt_pt(enc.encode(v)))
        batched = replace(cts[0], data=jnp.stack([c.data for c in cts]))
        out = dec.decrypt(composite.collapse(ev, batched, k)).real
        np.testing.assert_allclose(out[:k], vals, atol=EPS)


def test_evaluate_polynomial(ckks_setup):
    ctx, enc, encryptor, dec, ev = ckks_setup
    # The reference logreg sigmoid poly (degree 3):
    coeffs = [0.5, 0.15012, 0.0, -0.0015930078125]
    v = RNG.uniform(-4, 4, ctx.slots)
    ct = encryptor.encrypt_pt(enc.encode(v))
    out = dec.decrypt(
        composite.evaluate_polynomial(ev, ct, coeffs)
    ).real
    want = sum(c * v**i for i, c in enumerate(coeffs))
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_evaluate_polynomial_degree_one_and_constant(ckks_setup):
    ctx, enc, encryptor, dec, ev = ckks_setup
    v = RNG.uniform(-2, 2, ctx.slots)
    ct = encryptor.encrypt_pt(enc.encode(v))
    out = dec.decrypt(composite.evaluate_polynomial(ev, ct, [1.5, -0.25])).real
    np.testing.assert_allclose(out, 1.5 - 0.25 * v, atol=1e-4)
    out = dec.decrypt(composite.evaluate_polynomial(ev, ct, [0.75])).real
    np.testing.assert_allclose(out, np.full(ctx.slots, 0.75), atol=1e-4)


def test_accumulate_bfv_with_column_fold():
    ctx = make_bfv_context(poly_modulus_degree=2048, n_data_primes=3, sec_level=0)
    row = ctx.n // 2
    steps = set(composite.rotations_for_accumulate(row, row))
    steps |= set(composite.rotations_for_accumulate(5, row))
    ks = keys_mod.keygen(
        ctx,
        seed=13,
        galois_elts=[pow(5, s, 2 * ctx.n) for s in sorted(steps)]
        + [2 * ctx.n - 1],
    )
    enc = bfv.BfvBatchEncoder(ctx)
    encryptor = bfv.BfvEncryptor(ctx, ks)
    dec = bfv.BfvDecryptor(ctx, ks)
    ev = Evaluator(ctx, ks)
    for count in (5, row, ctx.n):
        v = RNG.integers(-50, 50, ctx.slots).astype(np.int64)
        v[count:] = 0
        ct = encryptor.encrypt_pt(enc.encode(v))
        out = dec.decrypt(composite.accumulate(ev, ct, count))
        assert out[0] == v[:count].sum()


def test_rotate_sum_hoisted_ckks(ckks_setup):
    """rotate_sum (one hoisted decomposition + one mod-down) must agree
    with serial rotate-then-add across distinct steps incl. identity."""
    ctx, enc, encryptor, dec, ev = ckks_setup
    v = RNG.uniform(-1, 1, ctx.slots)
    ct = encryptor.encrypt_pt(enc.encode(v))
    for steps in ([0, 1, 2, 4], [1, 16, 64], [0], [2]):
        want = np.zeros(ctx.slots)
        for s in steps:
            want += np.roll(v, -s)
        got = dec.decrypt(ev.rotate_sum(ct, steps)).real
        np.testing.assert_allclose(got, want, atol=EPS * len(steps))


def test_rotate_sum_hoisted_bfv_exact():
    """BFV rotate_sum must decode exactly (rotate_rows semantics)."""
    ctx = make_bfv_context(poly_modulus_degree=2048, n_data_primes=3, sec_level=0)
    row = ctx.n // 2
    ks = keys_mod.keygen(
        ctx,
        seed=17,
        galois_elts=[pow(5, s, 2 * ctx.n) for s in (1, 2)],
    )
    enc = bfv.BfvBatchEncoder(ctx)
    encryptor = bfv.BfvEncryptor(ctx, ks)
    dec = bfv.BfvDecryptor(ctx, ks)
    ev = Evaluator(ctx, ks)
    v = RNG.integers(-500, 500, ctx.slots).astype(np.int64)
    ct = encryptor.encrypt_pt(enc.encode(v))
    steps = [0, 1, 2]
    want = np.zeros_like(v)
    for s in steps:
        want += np.concatenate([np.roll(v[:row], -s), np.roll(v[row:], -s)])
    got = dec.decrypt(ev.rotate_sum(ct, steps))
    np.testing.assert_array_equal(got, want)
