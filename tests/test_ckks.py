"""End-to-end CKKS: encode/encrypt/ops/decrypt/decode vs cleartext truth.

Tolerances follow the reference's correctness convention: CKKS results are
compared with the 5e-5 epsilon the reference clamps at decode
(/root/reference src/benchmarks/ckks/seal_ckks_element_wise_benchmark.cpp:222-226).
"""

import numpy as np
import pytest

from reference_seal_backend_tpu.schemes import ckks, keys as keys_mod
from reference_seal_backend_tpu.schemes.params import make_ckks_context
from reference_seal_backend_tpu.evaluator.eval import Evaluator

RNG = np.random.default_rng(42)
EPS = 5e-5


@pytest.fixture(scope="module")
def setup():
    ctx = make_ckks_context(poly_modulus_degree=2048, mult_depth=2, sec_level=0)
    ks = keys_mod.keygen(
        ctx,
        seed=7,
        galois_elts=[
            pow(5, s, 2 * ctx.n) for s in (1, 2, 4, ctx.slots - 1)
        ]
        + [2 * ctx.n - 1],
    )
    enc = ckks.CkksEncoder(ctx)
    encryptor = ckks.CkksEncryptor(ctx, ks)
    dec = ckks.CkksDecryptor(ctx, ks)
    ev = Evaluator(ctx, ks)
    return ctx, ks, enc, encryptor, dec, ev


def _vals(ctx, lo=-1.0, hi=1.0):
    return RNG.uniform(lo, hi, ctx.slots)


def test_encoder_roundtrip(setup):
    ctx, *_ = setup
    enc = ckks.CkksEncoder(ctx)
    v = _vals(ctx)
    pt = enc.encode(v)
    from reference_seal_backend_tpu.schemes import core

    coeff = core.crt_compose_centered(
        core.mont_to_rns(
            np.asarray(ctx.plan.inv(pt.data, lo=0)), ctx.primes[: ctx.L]
        ),
        ctx.primes[: ctx.L],
    )
    got = enc.decode(coeff, pt.scale).real
    np.testing.assert_allclose(got, v, atol=1e-7)


def test_encrypt_decrypt(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    v = _vals(ctx)
    ct = encryptor.encrypt_pt(enc.encode(v))
    got = dec.decrypt(ct).real
    np.testing.assert_allclose(got, v, atol=EPS)


def test_add_sub_negate(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    va, vb = _vals(ctx), _vals(ctx)
    ca = encryptor.encrypt_pt(enc.encode(va))
    cb = encryptor.encrypt_pt(enc.encode(vb))
    np.testing.assert_allclose(
        dec.decrypt(ev.add(ca, cb)).real, va + vb, atol=EPS
    )
    np.testing.assert_allclose(
        dec.decrypt(ev.sub(ca, cb)).real, va - vb, atol=EPS
    )
    np.testing.assert_allclose(dec.decrypt(ev.negate(ca)).real, -va, atol=EPS)


def test_add_sub_mismatched_sizes(setup):
    """size-3 (pre-relin product) ± size-2 in both argument orders."""
    ctx, ks, enc, encryptor, dec, ev = setup
    va, vb = _vals(ctx), _vals(ctx)
    ca = encryptor.encrypt_pt(enc.encode(va))
    cb = encryptor.encrypt_pt(enc.encode(vb))
    p3 = ev.multiply(ca, cb)      # size 3, scale^2
    p2 = ev.relinearize(p3)       # size 2, same value/scale
    tol = 5e-4
    np.testing.assert_allclose(
        dec.decrypt(ev.sub(p3, p2)).real, np.zeros(ctx.slots), atol=tol
    )
    np.testing.assert_allclose(
        dec.decrypt(ev.sub(p2, p3)).real, np.zeros(ctx.slots), atol=tol
    )
    np.testing.assert_allclose(
        dec.decrypt(ev.add(p2, p3)).real, 2 * va * vb, atol=tol
    )


def test_encryptor_seed_reproducible(setup):
    """Seeded encryptors produce identical ciphertexts across instances
    (full-run reproducibility); unseeded ones draw fresh entropy."""
    ctx, ks, enc, encryptor, dec, ev = setup
    pt = enc.encode(_vals(ctx))
    e1 = ckks.CkksEncryptor(ctx, ks, seed=99)
    e2 = ckks.CkksEncryptor(ctx, ks, seed=99)
    np.testing.assert_array_equal(
        np.asarray(e1.encrypt_pt(pt).data), np.asarray(e2.encrypt_pt(pt).data)
    )
    e3 = ckks.CkksEncryptor(ctx, ks)
    assert not np.array_equal(
        np.asarray(e1.encrypt_pt(pt).data), np.asarray(e3.encrypt_pt(pt).data)
    )


def test_plain_ops(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    va, vb = _vals(ctx), _vals(ctx)
    ca = encryptor.encrypt_pt(enc.encode(va))
    pb = enc.encode(vb)
    np.testing.assert_allclose(
        dec.decrypt(ev.add_plain(ca, pb)).real, va + vb, atol=EPS
    )
    prod = ev.multiply_plain(ca, pb)
    assert prod.scale == pytest.approx(ctx.scale**2)
    np.testing.assert_allclose(dec.decrypt(prod).real, va * vb, atol=EPS)


def test_multiply_decrypt_size3(setup):
    """Bare multiply (no relin) decrypts correctly with 3 components —
    the reference eltwise-mult path never relinearizes."""
    ctx, ks, enc, encryptor, dec, ev = setup
    va, vb = _vals(ctx), _vals(ctx)
    ca = encryptor.encrypt_pt(enc.encode(va))
    cb = encryptor.encrypt_pt(enc.encode(vb))
    prod = ev.multiply(ca, cb)
    assert prod.size == 3
    np.testing.assert_allclose(dec.decrypt(prod).real, va * vb, atol=EPS)


def test_relinearize_and_rescale(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    va, vb = _vals(ctx), _vals(ctx)
    ca = encryptor.encrypt_pt(enc.encode(va))
    cb = encryptor.encrypt_pt(enc.encode(vb))
    prod = ev.relinearize(ev.multiply(ca, cb))
    assert prod.size == 2
    np.testing.assert_allclose(dec.decrypt(prod).real, va * vb, atol=EPS)
    rs = ev.rescale_to_next(prod)
    assert rs.level == ctx.L - ctx.rescale_group
    np.testing.assert_allclose(dec.decrypt(rs).real, va * vb, atol=EPS)


def test_depth2_chain(setup):
    """((a*b) rescaled) * c, exercising two levels of the modulus chain."""
    ctx, ks, enc, encryptor, dec, ev = setup
    va, vb, vc = _vals(ctx), _vals(ctx), _vals(ctx)
    ca = encryptor.encrypt_pt(enc.encode(va))
    cb = encryptor.encrypt_pt(enc.encode(vb))
    ab = ev.rescale_to_next(ev.relinearize(ev.multiply(ca, cb)))
    pc = enc.encode(vc, scale=ab.scale)
    pc = ev.mod_switch_plain_to(pc, ab.level)
    abc = ev.rescale_to_next(ev.multiply_plain(ab, pc))
    np.testing.assert_allclose(
        dec.decrypt(abc).real, va * vb * vc, atol=EPS
    )


def test_mod_switch_drop(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    v = _vals(ctx)
    ct = encryptor.encrypt_pt(enc.encode(v))
    dropped = ev.mod_switch_to(ct, ctx.L - ctx.rescale_group)
    np.testing.assert_allclose(dec.decrypt(dropped).real, v, atol=EPS)


def test_rotate(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    v = _vals(ctx)
    ct = encryptor.encrypt_pt(enc.encode(v))
    for s in (1, 2, 4):
        got = dec.decrypt(ev.rotate(ct, s)).real
        np.testing.assert_allclose(got, np.roll(v, -s), atol=EPS)
    # rotate right by 1 == rotate left by slots-1
    got = dec.decrypt(ev.rotate(ct, ctx.slots - 1)).real
    np.testing.assert_allclose(got, np.roll(v, 1), atol=EPS)


def test_conjugate(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    v = _vals(ctx) + 1j * _vals(ctx)
    ct = encryptor.encrypt_pt(enc.encode(v))
    got = dec.decrypt(ev.conjugate(ct))
    np.testing.assert_allclose(got, np.conj(v), atol=EPS)


def test_batched_ops(setup):
    """Leading batch axes flow through every op (the Offline category)."""
    import jax.numpy as jnp
    from dataclasses import replace

    ctx, ks, enc, encryptor, dec, ev = setup
    vs = [
        _vals(ctx) for _ in range(3)
    ]
    cts = [encryptor.encrypt_pt(enc.encode(v)) for v in vs]
    batched = replace(
        cts[0], data=jnp.stack([c.data for c in cts])
    )  # [3, 2, L, N]
    prod = ev.relinearize(ev.multiply(batched, batched))
    rot = ev.rotate(prod, 1)
    for i in range(3):
        single = replace(rot, data=rot.data[i])
        np.testing.assert_allclose(
            dec.decrypt(single).real,
            np.roll(vs[i] * vs[i], -1),
            atol=EPS,
        )


def test_sub_plain_and_square(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    va = _vals(ctx)
    vb = _vals(ctx)
    ca = encryptor.encrypt_pt(enc.encode(va))
    pb = enc.encode(vb)
    np.testing.assert_allclose(
        dec.decrypt(ev.sub_plain(ca, pb)).real, va - vb, atol=EPS
    )
    sq = ev.rescale_to_next(ev.relinearize(ev.square(ca)))
    np.testing.assert_allclose(dec.decrypt(sq).real, va * va, atol=1e-4)
