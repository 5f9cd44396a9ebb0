"""Distributed (slot-sharded) NTT over the 8-virtual-device CPU mesh:
bit-exact vs the single-device four-step path, including the mid-transform
all_to_all and per-device twiddle plane slicing."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from reference_seal_backend_tpu.nums import primegen
from reference_seal_backend_tpu.ops import ntt
from reference_seal_backend_tpu.parallel import sharded_ntt

RNG = np.random.default_rng(11)


def _mesh(n=8, axis="sp"):
    return Mesh(np.array(jax.devices()[:n]), (axis,))


def _plan(n, n_limbs=2):
    primes = tuple(primegen.gen_ntt_primes(n_limbs, 29, 2 * n))
    return ntt.make_plan(n, primes)


def test_fwd_matches_single_device():
    n = 2048
    plan = _plan(n)
    mesh = _mesh()
    x = np.stack(
        [RNG.integers(0, p, (3, n)).astype(np.uint32) for p in plan.primes],
        axis=1,
    )  # [B=3, L, N]
    want = np.asarray(plan._fwd_mat(jnp.asarray(x), 0)).reshape(
        3, len(plan.primes), plan.n1, plan.n2
    )
    # _fwd_mat returns flat row-major; sharded fwd returns transposed layout
    want_t = np.swapaxes(want, -1, -2)
    xm = sharded_ntt.shard_matrix_view(plan, jnp.asarray(x), mesh)
    got = jax.jit(
        lambda v: sharded_ntt.fwd(plan, v, mesh)
    )(xm)
    np.testing.assert_array_equal(np.asarray(got), want_t)


def test_roundtrip_and_inverse_matches():
    n = 2048
    plan = _plan(n)
    mesh = _mesh()
    x = np.stack(
        [RNG.integers(0, p, (2, n)).astype(np.uint32) for p in plan.primes],
        axis=1,
    )
    xm = sharded_ntt.shard_matrix_view(plan, jnp.asarray(x), mesh)
    f = sharded_ntt.fwd(plan, xm, mesh)
    back = jax.jit(lambda v: sharded_ntt.inv(plan, v, mesh))(f)
    np.testing.assert_array_equal(
        np.asarray(back).reshape(2, len(plan.primes), n), x
    )


def test_dyadic_multiply_in_sharded_domain():
    """Pointwise ops compose with the transposed sharded layout."""
    from reference_seal_backend_tpu.ops import modops

    n = 2048
    plan = _plan(n, n_limbs=1)
    mesh = _mesh()
    p_int = plan.primes[0]
    a = RNG.integers(0, p_int, (1, n)).astype(np.uint32)
    b = RNG.integers(0, p_int, (1, n)).astype(np.uint32)
    am = sharded_ntt.shard_matrix_view(plan, jnp.asarray(a), mesh)
    bm = sharded_ntt.shard_matrix_view(plan, jnp.asarray(b), mesh)
    fa = sharded_ntt.fwd(plan, am, mesh)
    fb = sharded_ntt.fwd(plan, bm, mesh)
    prod = modops.mont_mul(fa, fb, plan.p, plan.p_neg_inv)
    got = np.asarray(sharded_ntt.inv(plan, prod, mesh)).reshape(1, n)
    # reference: same computation single-device
    fa1 = plan._fwd_mat(jnp.asarray(a), 0)
    fb1 = plan._fwd_mat(jnp.asarray(b), 0)
    want = np.asarray(
        plan._inv_mat(modops.mont_mul(fa1, fb1, plan.p, plan.p_neg_inv), 0)
    )
    np.testing.assert_array_equal(got, want)
