"""Device NTT vs exact host oracles: bit-exact roundtrip, convolution,
Galois permutation equivalence."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reference_seal_backend_tpu.nums import primegen, polyref
from reference_seal_backend_tpu.ops import modops, ntt

RNG = np.random.default_rng(7)


def _plan(n, n_limbs=2, bits=29):
    primes = tuple(primegen.gen_ntt_primes(n_limbs, bits, 2 * n))
    return ntt.make_plan(n, primes)


def _rand_poly(plan):
    return np.stack(
        [RNG.integers(0, p, plan.n).astype(np.uint32) for p in plan.primes]
    )


def _to_mont(x, plan):
    return np.stack(
        [modops.host_to_mont(x[i], p) for i, p in enumerate(plan.primes)]
    )


def _from_mont(x, plan):
    return np.stack(
        [modops.host_from_mont(x[i], p) for i, p in enumerate(plan.primes)]
    )


@pytest.mark.parametrize("n", [16, 256, 8192])
def test_fwd_matches_host_and_roundtrips(n):
    plan = _plan(n)
    x = _rand_poly(plan)
    xm = jnp.asarray(_to_mont(x, plan))
    f = np.asarray(jax.jit(plan.fwd)(xm))
    for li, (p, psi) in enumerate(zip(plan.primes, plan.psis)):
        want = polyref.host_ntt(x[li], psi, p)
        got = modops.host_from_mont(f[li], p)
        np.testing.assert_array_equal(got, want)
    back = np.asarray(jax.jit(plan.inv)(jnp.asarray(f)))
    np.testing.assert_array_equal(_from_mont(back, plan), x)


@pytest.mark.parametrize("n", [16, 1024])
def test_pointwise_mult_is_negacyclic_convolution(n):
    plan = _plan(n)
    a = _rand_poly(plan)
    b = _rand_poly(plan)
    am = jnp.asarray(_to_mont(a, plan))
    bm = jnp.asarray(_to_mont(b, plan))
    fa = plan.fwd(am)
    fb = plan.fwd(bm)
    prod = modops.mont_mul(fa, fb, plan.p, plan.p_neg_inv)
    conv = _from_mont(np.asarray(plan.inv(prod)), plan)
    for li, p in enumerate(plan.primes):
        want = polyref.negacyclic_convolve(a[li], b[li], p)
        np.testing.assert_array_equal(conv[li], want)


@pytest.mark.parametrize("g_exp", [1, 3, 7])
@pytest.mark.parametrize("n", [16, 512])
def test_galois_eval_domain_matches_coeff_domain(n, g_exp):
    plan = _plan(n, n_limbs=1)
    g = pow(5, g_exp, 2 * n)
    x = _rand_poly(plan)
    xm = jnp.asarray(_to_mont(x, plan))
    f = plan.fwd(xm)
    got = np.asarray(plan.inv(plan.apply_galois_eval(f, g)))
    got = _from_mont(got, plan)
    want = polyref.coeff_automorphism_ref(x[0], g, plan.primes[0])
    np.testing.assert_array_equal(got[0], want)


def test_galois_conjugation_element(_n=64):
    # g = 2N-1 is the conjugation automorphism used by rotate_columns/conj.
    plan = _plan(_n, n_limbs=1)
    g = 2 * _n - 1
    x = _rand_poly(plan)
    xm = jnp.asarray(_to_mont(x, plan))
    got = _from_mont(
        np.asarray(plan.inv(plan.apply_galois_eval(plan.fwd(xm), g))), plan
    )
    want = polyref.coeff_automorphism_ref(x[0], g, plan.primes[0])
    np.testing.assert_array_equal(got[0], want)


def test_batched_leading_axes():
    plan = _plan(64, n_limbs=3)
    xs = np.stack([_rand_poly(plan) for _ in range(4)])  # [4, L, N]
    xm = jnp.asarray(
        np.stack([_to_mont(x, plan) for x in xs])
    )
    f = plan.fwd(xm)
    for i in range(4):
        single = plan.fwd(xm[i])
        np.testing.assert_array_equal(np.asarray(f[i]), np.asarray(single))
    back = plan.inv(f)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(xm))
