"""End-to-end BFV: exact integer arithmetic through the full pipeline.

BFV results must be *exact* (the reference BFV decode does no epsilon
clamping, /root/reference src/benchmarks/bfv/seal_bfv_element_wise_benchmark.cpp:203-219).
"""

import numpy as np
import pytest

from reference_seal_backend_tpu.schemes import bfv, keys as keys_mod
from reference_seal_backend_tpu.schemes.params import make_bfv_context
from reference_seal_backend_tpu.evaluator.eval import Evaluator

RNG = np.random.default_rng(99)


@pytest.fixture(scope="module")
def setup():
    ctx = make_bfv_context(poly_modulus_degree=2048, n_data_primes=3, sec_level=0)
    ks = keys_mod.keygen(
        ctx,
        seed=11,
        galois_elts=[pow(5, s, 2 * ctx.n) for s in (1, 2)] + [2 * ctx.n - 1],
    )
    enc = bfv.BfvBatchEncoder(ctx)
    encryptor = bfv.BfvEncryptor(ctx, ks)
    dec = bfv.BfvDecryptor(ctx, ks)
    ev = Evaluator(ctx, ks)
    return ctx, ks, enc, encryptor, dec, ev


def _vals(ctx, lo=-1000, hi=1000):
    return RNG.integers(lo, hi, ctx.slots).astype(np.int64)


def _mod_t_centered(x, t):
    r = x % t
    return np.where(r > t // 2, r - t, r)


def test_encoder_roundtrip(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    v = _vals(ctx)
    pt = enc.encode(v)
    from reference_seal_backend_tpu.schemes import core
    from reference_seal_backend_tpu.ops import modops

    coeff = core.mont_to_rns(
        np.asarray(ctx.plan.inv(pt.data, lo=0)), ctx.primes[: ctx.L]
    )
    # plaintext was lifted from mod-t values: limb 0 residues equal m mod q0
    m = coeff[0]
    got = enc.decode_poly(m.astype(np.uint32))
    np.testing.assert_array_equal(got, _mod_t_centered(v, ctx.t))


def test_encrypt_decrypt_exact(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    v = _vals(ctx)
    ct = encryptor.encrypt_pt(enc.encode(v))
    got = dec.decrypt(ct)
    np.testing.assert_array_equal(got, _mod_t_centered(v, ctx.t))
    assert dec.noise_budget_bits(ct) > 20


def test_add_sub_exact(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    va, vb = _vals(ctx), _vals(ctx)
    ca = encryptor.encrypt_pt(enc.encode(va))
    cb = encryptor.encrypt_pt(enc.encode(vb))
    np.testing.assert_array_equal(
        dec.decrypt(ev.add(ca, cb)), _mod_t_centered(va + vb, ctx.t)
    )
    np.testing.assert_array_equal(
        dec.decrypt(ev.sub(ca, cb)), _mod_t_centered(va - vb, ctx.t)
    )


def test_plain_ops_exact(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    va, vb = _vals(ctx), _vals(ctx)
    ca = encryptor.encrypt_pt(enc.encode(va))
    pb = enc.encode(vb)
    np.testing.assert_array_equal(
        dec.decrypt(ev.add_plain(ca, pb)), _mod_t_centered(va + vb, ctx.t)
    )
    np.testing.assert_array_equal(
        dec.decrypt(ev.multiply_plain(ca, pb)),
        _mod_t_centered(va * vb, ctx.t),
    )


def test_multiply_exact(setup):
    """BEHZ ct-ct multiply, no relinearization (size-3 decrypt)."""
    ctx, ks, enc, encryptor, dec, ev = setup
    va, vb = _vals(ctx), _vals(ctx)
    ca = encryptor.encrypt_pt(enc.encode(va))
    cb = encryptor.encrypt_pt(enc.encode(vb))
    prod = ev.multiply(ca, cb)
    assert prod.size == 3
    budget = dec.noise_budget_bits(prod)
    assert budget > 0, "noise budget exhausted after multiply"
    np.testing.assert_array_equal(
        dec.decrypt(prod), _mod_t_centered(va * vb, ctx.t)
    )


def test_multiply_relinearize_exact(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    va, vb = _vals(ctx), _vals(ctx)
    ca = encryptor.encrypt_pt(enc.encode(va))
    cb = encryptor.encrypt_pt(enc.encode(vb))
    prod = ev.relinearize(ev.multiply(ca, cb))
    assert prod.size == 2
    np.testing.assert_array_equal(
        dec.decrypt(prod), _mod_t_centered(va * vb, ctx.t)
    )


def test_rotate_rows_and_columns(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    v = _vals(ctx)
    ct = encryptor.encrypt_pt(enc.encode(v))
    half = ctx.n // 2
    vc = _mod_t_centered(v, ctx.t)
    for s in (1, 2):
        got = dec.decrypt(ev.rotate(ct, s))
        want = np.concatenate(
            [np.roll(vc[:half], -s), np.roll(vc[half:], -s)]
        )
        np.testing.assert_array_equal(got, want)
    got = dec.decrypt(ev.conjugate(ct))
    np.testing.assert_array_equal(
        got, np.concatenate([vc[half:], vc[:half]])
    )
