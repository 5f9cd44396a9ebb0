"""Sharded execution tests on the 8-virtual-device CPU mesh.

Verifies that the evaluator's pure functions run unmodified under GSPMD
with batch (dp) and limb sharding, producing results identical to the
unsharded path — the TPU replacement for the reference's OpenMP layer
(SURVEY.md §2.3-2.4).
"""

import numpy as np
import jax
import pytest

from reference_seal_backend_tpu.evaluator import composite
from reference_seal_backend_tpu.evaluator.eval import Evaluator
from reference_seal_backend_tpu.parallel import mesh as mesh_mod
from reference_seal_backend_tpu.schemes import ckks, keys as keys_mod
from reference_seal_backend_tpu.schemes.params import make_ckks_context

N = 2048
RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def setup():
    ctx = make_ckks_context(poly_modulus_degree=N, mult_depth=2, sec_level=0)
    # Keys for the power-of-two rotations the tests use directly PLUS the
    # steps accumulate(count=8) actually requests (the hoisted small-count
    # path rotates by every step 1..count-1, composite.py).
    steps = sorted(
        {1 << s for s in range(4)}
        | set(composite.rotations_for_accumulate(8, N // 2))
    )
    ks = keys_mod.keygen(
        ctx, seed=5, galois_elts=[pow(5, s, 2 * N) for s in steps]
    )
    enc = ckks.CkksEncoder(ctx)
    encryptor = ckks.CkksEncryptor(ctx, ks)
    dec = ckks.CkksDecryptor(ctx, ks)
    ev = Evaluator(ctx, ks)
    return ctx, ks, enc, encryptor, dec, ev


def _encrypt_batch(ctx, enc, encryptor, vals):
    from dataclasses import replace
    import jax.numpy as jnp

    cts = [encryptor.encrypt_pt(enc.encode(v)) for v in vals]
    return replace(cts[0], data=jnp.stack([c.data for c in cts]))


def test_dp_and_limb_sharded_eltwise(setup):
    ctx, ks, enc, encryptor, dec, ev = setup
    m = mesh_mod.make_mesh(8, ("dp", "limb"))
    assert m.shape == {"dp": 4, "limb": 2}
    vals = RNG.uniform(-1, 1, (4, ctx.slots))
    ct = _encrypt_batch(ctx, enc, encryptor, vals)
    ct_sh = mesh_mod.shard_ct(
        ct, m, n_batch_axes=1, batch_axes=("dp",), limb_axis="limb"
    )

    mult = jax.jit(lambda a: ev.multiply(a, a))
    out_ref = mult(ct)
    out_sh = mult(ct_sh)
    np.testing.assert_array_equal(
        np.asarray(out_ref.data), np.asarray(out_sh.data)
    )
    got = dec.decrypt(
        type(out_sh)(
            data=out_sh.data[1], level=out_sh.level, scale=out_sh.scale
        )
    ).real
    np.testing.assert_allclose(got, vals[1] ** 2, atol=5e-5)


def test_dp_sharded_rotation_keyswitch(setup):
    """Batched rotations (Galois key-switch) under dp sharding: the whole
    batch shares each key-switch as one sharded NTT sweep."""
    ctx, ks, enc, encryptor, dec, ev = setup
    m = mesh_mod.make_mesh(8, ("dp",))
    vals = RNG.uniform(-1, 1, (8, ctx.slots))
    ct = _encrypt_batch(ctx, enc, encryptor, vals)
    ct_sh = mesh_mod.shard_ct(ct, m, n_batch_axes=1)
    keys_repl = mesh_mod.replicate(ks, m)
    ev_sh = Evaluator(ctx, keys_repl)

    rot = jax.jit(lambda a: ev_sh.rotate(a, 2))
    out = rot(ct_sh)
    for i in (0, 5):
        got = dec.decrypt(
            type(out)(data=out.data[i], level=out.level, scale=out.scale)
        ).real
        np.testing.assert_allclose(got, np.roll(vals[i], -2), atol=5e-5)


def test_limb_sharded_keyswitch_compiles(setup):
    """Limb sharding across a key-switch: the digit lift couples limbs,
    forcing GSPMD to insert collectives — must still be exact."""
    ctx, ks, enc, encryptor, dec, ev = setup
    m = mesh_mod.make_mesh(8, ("dp", "limb"))
    vals = RNG.uniform(-1, 1, (2, ctx.slots))
    ct = _encrypt_batch(ctx, enc, encryptor, vals)
    ct_sh = mesh_mod.shard_ct(
        ct, m, n_batch_axes=1, batch_axes=(None,), limb_axis="limb"
    )
    fn = jax.jit(
        lambda a: composite.accumulate(
            ev, ev.rescale_to_next(ev.relinearize(ev.multiply(a, a))), 8
        )
    )
    out_ref = fn(ct)
    out_sh = fn(ct_sh)
    np.testing.assert_array_equal(
        np.asarray(out_ref.data), np.asarray(out_sh.data)
    )
    got = dec.decrypt(
        type(out_sh)(
            data=out_sh.data[0], level=out_sh.level, scale=out_sh.scale
        )
    ).real
    want = np.empty_like(vals[0])
    sq = vals[0] ** 2
    for i in range(ctx.slots):
        want[i] = sq[(i + np.arange(8)) % ctx.slots].sum()
    np.testing.assert_allclose(got[:64], want[:64], rtol=1e-5, atol=5e-4)


# -- process-aware (multi-host) mesh construction --------------------------- #


def test_process_grouped_order_single_host():
    # one process: identity-compatible ordering, any dividing group size
    order = mesh_mod.process_grouped_order([0] * 8, 4)
    assert sorted(order.tolist()) == list(range(8))


def test_process_grouped_order_multi_host():
    """Mocked 4-host × 4-device pod slice: sp groups must pack host-local
    (ICI); the dp axis alone crosses hosts (DCN).  SURVEY.md §2.4."""
    procs = [0, 0, 1, 1, 2, 2, 3, 3, 0, 0, 1, 1, 2, 2, 3, 3]
    order = mesh_mod.process_grouped_order(procs, 4)
    grouped = np.asarray(procs)[order].reshape(4, 4)
    # every sp group lies within exactly one process
    assert (grouped == grouped[:, :1]).all()
    # all processes appear (dp spans hosts)
    assert sorted(np.unique(grouped).tolist()) == [0, 1, 2, 3]


def test_process_grouped_order_rejects_cross_host_sp():
    # 2 hosts x 2 devices, sp=4 would have to span both hosts -> refuse
    with pytest.raises(ValueError, match="DCN"):
        mesh_mod.process_grouped_order([0, 0, 1, 1], 4)
    # non-dividing group size
    with pytest.raises(ValueError):
        mesh_mod.process_grouped_order([0] * 6, 4)


def test_process_grouped_order_uneven_hosts_rejected():
    # per-host counts 3 and 1: groups of 2 cannot pack host-local
    with pytest.raises(ValueError, match="DCN"):
        mesh_mod.process_grouped_order([0, 0, 0, 1], 2)


def test_make_process_mesh_runs_sharded_pipeline(setup):
    """make_process_mesh on the real (single-process) backend: dp x sp
    mesh executes the multiply pipeline bit-exact (the pod-slice
    construction degenerates to make_mesh here, same validation path)."""
    from dataclasses import replace
    import jax.numpy as jnp

    from reference_seal_backend_tpu.parallel import sp_eval

    ctx, ks, enc, _, _, ev = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = mesh_mod.make_process_mesh(sp=4)
    assert dict(mesh.shape) == {"dp": 2, "sp": 4}
    er = ckks.CkksEncryptor(ctx, ks, seed=3)
    rng = np.random.default_rng(3)
    cts = [
        er.encrypt_pt(enc.encode(rng.uniform(-1, 1, ctx.slots)))
        for _ in range(4)
    ]
    a = replace(cts[0], data=jnp.stack([c.data for c in cts[:2]]))
    b = replace(cts[0], data=jnp.stack([c.data for c in cts[2:]]))
    spe = sp_eval.SpEvaluator(ctx, ks, mesh, batch_axes=("dp",))
    want = ev.multiply(a, b)
    got = spe.unshard(jax.jit(spe.multiply)(spe.shard(a), spe.shard(b)))
    np.testing.assert_array_equal(np.asarray(got.data), np.asarray(want.data))
