"""sp-sharded evaluator: a CKKS workload (eltwise multiply → relinearize →
rotate → rescale) executed with the coefficient axis sharded over an
8-device mesh must be BIT-EXACT against the single-device Evaluator.

This is the end-to-end integration of the distributed NTT into the
key-switch path (VERDICT r1 item 4): the digit lift, the key inner
product, the mod-down and the rescale all run their transforms through
parallel/sharded_ntt.py under shard_map."""

import numpy as np
import pytest
import jax

from reference_seal_backend_tpu.evaluator.eval import Evaluator
from reference_seal_backend_tpu.parallel import mesh as mesh_mod
from reference_seal_backend_tpu.parallel import sp_eval
from reference_seal_backend_tpu.schemes import ckks, keys as keys_mod
from reference_seal_backend_tpu.schemes.params import make_ckks_context

N = 2048
STEP = 3


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    ctx = make_ckks_context(poly_modulus_degree=N, mult_depth=2, sec_level=0)
    ks = keys_mod.keygen(
        ctx, seed=11, galois_elts=[pow(5, STEP, 2 * ctx.n)], need_relin=True
    )
    enc = ckks.CkksEncoder(ctx)
    encryptor = ckks.CkksEncryptor(ctx, ks, seed=21)
    rng = np.random.default_rng(3)
    a = encryptor.encrypt_pt(enc.encode(rng.uniform(-1, 1, ctx.slots)))
    b = encryptor.encrypt_pt(enc.encode(rng.uniform(-1, 1, ctx.slots)))
    ev = Evaluator(ctx, ks)
    mesh = mesh_mod.make_mesh(8, ("sp",), shape=(8,))
    spe = sp_eval.SpEvaluator(ctx, ks, mesh)
    return ctx, ks, ev, spe, a, b


def test_layout_roundtrip(setup):
    ctx, ks, ev, spe, a, b = setup
    sp = spe.shard(a)
    back = spe.unshard(sp)
    np.testing.assert_array_equal(np.asarray(back.data), np.asarray(a.data))


def test_sp_multiply_bit_exact(setup):
    ctx, ks, ev, spe, a, b = setup
    want = ev.multiply(a, b)
    got = spe.unshard(jax.jit(spe.multiply)(spe.shard(a), spe.shard(b)))
    np.testing.assert_array_equal(np.asarray(got.data), np.asarray(want.data))
    assert got.scale == want.scale and got.level == want.level


def test_sp_workload_mult_relin_rotate_rescale_bit_exact(setup):
    """The full sharded workload: multiply → relinearize (key switch) →
    rotate (Galois key switch) → rescale, bit-exact vs single-device."""
    ctx, ks, ev, spe, a, b = setup
    want = ev.rescale_to_next(
        ev.rotate(ev.relinearize(ev.multiply(a, b)), STEP)
    )

    def pipeline(x, y):
        return spe.rescale_to_next(
            spe.rotate(spe.relinearize(spe.multiply(x, y)), STEP)
        )

    got = spe.unshard(jax.jit(pipeline)(spe.shard(a), spe.shard(b)))
    np.testing.assert_array_equal(np.asarray(got.data), np.asarray(want.data))
    assert got.level == want.level
    assert abs(got.scale - want.scale) < 1e-6 * want.scale


def test_sp_plain_ops_bit_exact(setup):
    ctx, ks, ev, spe, a, b = setup
    enc = ckks.CkksEncoder(ctx)
    rng = np.random.default_rng(9)
    pt = enc.encode(rng.uniform(-1, 1, ctx.slots))
    want_m = ev.multiply_plain(a, pt)
    want_a = ev.add_plain(a, pt)
    pt_sp = spe.shard_pt(pt)
    got_m = spe.unshard(jax.jit(spe.multiply_plain)(spe.shard(a), pt_sp))
    got_a = spe.unshard(jax.jit(spe.add_plain)(spe.shard(a), pt_sp))
    np.testing.assert_array_equal(np.asarray(got_m.data), np.asarray(want_m.data))
    assert got_m.scale == want_m.scale
    np.testing.assert_array_equal(np.asarray(got_a.data), np.asarray(want_a.data))


@pytest.fixture(scope="module")
def dot_setup():
    """Keys for the dot-product n=100 BSGS accumulate (VERDICT r2 item 3):
    baby steps 1..9 plus giant strides 10..90."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from reference_seal_backend_tpu.evaluator import composite

    ctx = make_ckks_context(poly_modulus_degree=N, mult_depth=2, sec_level=0)
    steps = composite.rotations_for_accumulate(100, ctx.slots)
    assert len(steps) == 18  # BSGS split of 100: 9 baby + 9 giant
    ks = keys_mod.keygen(
        ctx,
        seed=13,
        galois_elts=[pow(5, s, 2 * ctx.n) for s in steps],
        need_relin=True,
    )
    enc = ckks.CkksEncoder(ctx)
    encryptor = ckks.CkksEncryptor(ctx, ks, seed=23)
    rng = np.random.default_rng(31)
    va = np.zeros(ctx.slots)
    vb = np.zeros(ctx.slots)
    va[:100] = rng.uniform(-1, 1, 100)
    vb[:100] = rng.uniform(-1, 1, 100)
    a = encryptor.encrypt_pt(enc.encode(va))
    b = encryptor.encrypt_pt(enc.encode(vb))
    ev = Evaluator(ctx, ks)
    mesh = mesh_mod.make_mesh(8, ("sp",), shape=(8,))
    spe = sp_eval.SpEvaluator(ctx, ks, mesh)
    return ctx, ev, spe, a, b, va, vb


def test_sp_dot_product_workload_bit_exact(dot_setup):
    """The ENTIRE dot-product operate pipeline (multiply → relinearize →
    rescale → BSGS accumulate, models/dot_product.py _operate_impl)
    sp-sharded over 8 devices, bit-exact vs single-device — including the
    hoisted rotate_sum (one shared digit lift + one mod-down per BSGS
    pass) under shard_map."""
    from reference_seal_backend_tpu.evaluator import composite

    ctx, ev, spe, a, b, va, vb = dot_setup
    want = composite.accumulate(
        ev, ev.rescale_to_next(ev.relinearize(ev.multiply(a, b))), 100
    )

    def pipeline(x, y):
        prod = spe.rescale_to_next(spe.relinearize(spe.multiply(x, y)))
        return composite.accumulate(spe, prod, 100)

    got = spe.unshard(jax.jit(pipeline)(spe.shard(a), spe.shard(b)))
    np.testing.assert_array_equal(np.asarray(got.data), np.asarray(want.data))
    assert got.level == want.level


def test_sp_dot_product_collectives(dot_setup):
    """The sharded dot pipeline must route its NTT sweeps over the mesh:
    count the all-to-alls of the compiled HLO."""
    from reference_seal_backend_tpu.evaluator import composite

    ctx, ev, spe, a, b, va, vb = dot_setup

    def pipeline(x, y):
        prod = spe.rescale_to_next(spe.relinearize(spe.multiply(x, y)))
        return composite.accumulate(spe, prod, 100)

    stats = sp_eval.collective_stats(
        jax.jit(pipeline), spe.shard(a), spe.shard(b)
    )
    # relin (3+) + rescale (2 groups × 2) + two hoisted rotate_sum passes
    # (digit lift inv+fwd×2 + mod-down each)
    assert stats["all-to-all"] >= 10
    assert stats["a2a_bytes"] > 0


def test_sp_grouped_digits_bit_exact():
    """Production contexts auto-select digit_group=2: the sp key-switch
    (grouped lift + FBC mod-down + hoisted rotate_sum) must stay
    bit-exact vs the single-device evaluator on a G=2 context."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    ctx = make_ckks_context(
        poly_modulus_degree=N, mult_depth=2, sec_level=0, digit_group=2
    )
    ks = keys_mod.keygen(
        ctx,
        seed=17,
        galois_elts=[pow(5, s, 2 * ctx.n) for s in (1, 2)],
        need_relin=True,
    )
    enc = ckks.CkksEncoder(ctx)
    encryptor = ckks.CkksEncryptor(ctx, ks, seed=27)
    rng = np.random.default_rng(5)
    a = encryptor.encrypt_pt(enc.encode(rng.uniform(-1, 1, ctx.slots)))
    b = encryptor.encrypt_pt(enc.encode(rng.uniform(-1, 1, ctx.slots)))
    ev = Evaluator(ctx, ks)
    mesh = mesh_mod.make_mesh(8, ("sp",), shape=(8,))
    spe = sp_eval.SpEvaluator(ctx, ks, mesh)

    want = ev.rotate_sum(
        ev.rescale_to_next(ev.relinearize(ev.multiply(a, b))), [0, 1, 2]
    )

    def pipeline(x, y):
        return spe.rotate_sum(
            spe.rescale_to_next(spe.relinearize(spe.multiply(x, y))),
            [0, 1, 2],
        )

    got = spe.unshard(jax.jit(pipeline)(spe.shard(a), spe.shard(b)))
    np.testing.assert_array_equal(np.asarray(got.data), np.asarray(want.data))
    assert got.level == want.level


def test_sp_bfv_behz_multiply_bit_exact():
    """BEHZ BFV multiply with the stacked q ∪ Bsk plan sharded over 8
    devices (SpEvaluator._bfv_multiply): bit-exact vs the single-device
    evaluator/behz.py pipeline, and the relinearized product decrypts
    exactly — closing the 'no BFV under sp' gap (VERDICT r2 weak #4)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from reference_seal_backend_tpu.schemes import bfv
    from reference_seal_backend_tpu.schemes.params import make_bfv_context

    ctx = make_bfv_context(poly_modulus_degree=N, sec_level=0)
    ks = keys_mod.keygen(ctx, seed=29, need_relin=True)
    enc = bfv.BfvBatchEncoder(ctx)
    er = bfv.BfvEncryptor(ctx, ks, seed=29)
    de = bfv.BfvDecryptor(ctx, ks)
    rng = np.random.default_rng(41)
    ia = rng.integers(-100, 100, ctx.slots)
    ib = rng.integers(-100, 100, ctx.slots)
    a = er.encrypt_pt(enc.encode(ia))
    b = er.encrypt_pt(enc.encode(ib))
    ev = Evaluator(ctx, ks)
    mesh = mesh_mod.make_mesh(8, ("sp",), shape=(8,))
    spe = sp_eval.SpEvaluator(ctx, ks, mesh)

    want = ev.relinearize(ev.multiply(a, b))

    def pipeline(x, y):
        return spe.relinearize(spe.multiply(x, y))

    got = spe.unshard(jax.jit(pipeline)(spe.shard(a), spe.shard(b)))
    np.testing.assert_array_equal(np.asarray(got.data), np.asarray(want.data))
    assert np.array_equal(de.decrypt(got), ia * ib)

    stats = sp_eval.collective_stats(
        jax.jit(pipeline), spe.shard(a), spe.shard(b)
    )
    # 4 BEHZ transform sweeps + relin key-switch sweeps, one a2a each
    assert stats["all-to-all"] >= 7
    assert stats["a2a_bytes"] > 0


def test_sp_collectives_counted(setup):
    """The compiled sharded pipeline must actually communicate: at least
    one all-to-all per NTT phase transition, with measured payload bytes
    (the virtual-mesh stand-in for real scaling traffic)."""
    ctx, ks, ev, spe, a, b = setup

    def pipeline(x, y):
        return spe.relinearize(spe.multiply(x, y))

    stats = sp_eval.collective_stats(
        jax.jit(pipeline), spe.shard(a), spe.shard(b)
    )
    assert stats["all-to-all"] >= 3  # digit-lift inv + 2 fwd + mod-down
    assert stats["a2a_bytes"] > 0
