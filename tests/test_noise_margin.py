"""Noise-margin regression tests (VERDICT r3 item 9): pin today's BFV
noise-budget floors and CKKS end-to-end precision margins so a parameter
or noise regression fails HERE, fast and attributably, instead of
surfacing as a flaky e2e ground-truth comparison.

Measured margins (2026-08-20, CSPRNG sampling):
  BFV  N=2048 depth-2 plain-20:  fresh 79.0 -> 49.0 -> 20.0 bits, exact
  BFV  N=4096 depth-2 plain-20:  fresh 80.0 -> 49.0 -> 19.0 bits, exact
  CKKS N=2048 scale-52 mult+relin+rescale: max err 5.9e-12
  CKKS N=8192 scale-45 (the REGISTERED eltwise config, 128-bit):
                                 max err 2.9e-09  (clamp is 5e-5)
The pins below leave 1-2 orders of magnitude of headroom for sampling
variation while still catching any real regression (a lost bit of budget
per level, a broken rescale rounding, a mis-sized prime)."""

import numpy as np

from reference_seal_backend_tpu.evaluator.eval import Evaluator
from reference_seal_backend_tpu.schemes import bfv, ckks, keys as keys_mod
from reference_seal_backend_tpu.schemes.params import (
    make_bfv_context,
    make_ckks_context,
)


def _bfv_chain(npoly: int):
    ctx = make_bfv_context(
        poly_modulus_degree=npoly, mult_depth=2, plain_modulus_bits=20,
        sec_level=0,
    )
    ks = keys_mod.keygen(ctx, seed=1, need_relin=True)
    enc = bfv.BfvBatchEncoder(ctx)
    er = bfv.BfvEncryptor(ctx, ks, seed=1)
    dec = bfv.BfvDecryptor(ctx, ks)
    ev = Evaluator(ctx, ks)
    rng = np.random.default_rng(0)
    ia = rng.integers(-100, 100, ctx.slots)
    ib = rng.integers(-100, 100, ctx.slots)
    ca = er.encrypt_pt(enc.encode(ia))
    cb = er.encrypt_pt(enc.encode(ib))
    ones = er.encrypt_pt(enc.encode(np.ones(ctx.slots, dtype=np.int64)))
    fresh = dec.noise_budget_bits(ca)
    m1 = ev.relinearize(ev.multiply(ca, cb))
    b1 = dec.noise_budget_bits(m1)
    m2 = ev.relinearize(ev.multiply(m1, ones))
    b2 = dec.noise_budget_bits(m2)
    assert np.array_equal(dec.decrypt(m2), ia * ib)
    return fresh, b1, b2


def test_bfv_noise_budget_floors_registered_depth2():
    """The registered eltwise/dot depth-2 chain shape: fresh budget and
    the budget after each of the two multiplies must not sink below
    today's floors minus headroom."""
    fresh, b1, b2 = _bfv_chain(2048)
    assert fresh >= 70.0, f"fresh noise budget regressed: {fresh}"
    assert b1 >= 40.0, f"budget after multiply 1 regressed: {b1}"
    assert b2 >= 10.0, f"budget after registered-depth chain regressed: {b2}"


def test_bfv_noise_budget_scales_with_n():
    fresh, b1, b2 = _bfv_chain(4096)
    assert fresh >= 70.0 and b1 >= 40.0 and b2 >= 10.0


def test_ckks_precision_margin_small_n():
    ctx = make_ckks_context(
        poly_modulus_degree=2048, mult_depth=2, scale_bits=52, sec_level=0
    )
    ks = keys_mod.keygen(ctx, seed=1, need_relin=True)
    enc = ckks.CkksEncoder(ctx)
    er = ckks.CkksEncryptor(ctx, ks, seed=1)
    dec = ckks.CkksDecryptor(ctx, ks)
    ev = Evaluator(ctx, ks)
    rng = np.random.default_rng(0)
    va = rng.uniform(-1, 1, ctx.slots)
    vb = rng.uniform(-1, 1, ctx.slots)
    out = ev.rescale_to_next(
        ev.relinearize(
            ev.multiply(er.encrypt_pt(enc.encode(va)),
                        er.encrypt_pt(enc.encode(vb)))
        )
    )
    err = float(np.max(np.abs(np.real(dec.decrypt(out)) - va * vb)))
    # measured 5.9e-12; pin 170x headroom, still 50,000x inside the clamp
    assert err <= 1e-9, f"CKKS small-N precision regressed: {err}"


def test_ckks_precision_margin_registered_config():
    """The REGISTERED CKKS eltwise config (N=8192, depth 2, scale 45,
    real 128-bit chain): observed error must stay orders of magnitude
    inside the reference's 5e-5 decode clamp (VERDICT r3 item 9 asks
    <= 0.2x the clamp; today's margin is ~1.7e4x inside — pin 500x)."""
    ctx = make_ckks_context(
        poly_modulus_degree=8192, mult_depth=2, scale_bits=45, sec_level=128
    )
    ks = keys_mod.keygen(ctx, seed=1, need_relin=True)
    enc = ckks.CkksEncoder(ctx)
    er = ckks.CkksEncryptor(ctx, ks, seed=1)
    dec = ckks.CkksDecryptor(ctx, ks)
    ev = Evaluator(ctx, ks)
    rng = np.random.default_rng(0)
    va = rng.uniform(-1, 1, ctx.slots)
    vb = rng.uniform(-1, 1, ctx.slots)
    out = ev.rescale_to_next(
        ev.relinearize(
            ev.multiply(er.encrypt_pt(enc.encode(va)),
                        er.encrypt_pt(enc.encode(vb)))
        )
    )
    err = float(np.max(np.abs(np.real(dec.decrypt(out)) - va * vb)))
    assert err <= 1e-7, f"CKKS registered-config precision regressed: {err}"
