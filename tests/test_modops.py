"""Property tests for the uint32 Montgomery core against Python bignum."""

import numpy as np
import pytest

import jax.numpy as jnp

from reference_seal_backend_tpu.nums import primegen
from reference_seal_backend_tpu.ops import modops

RNG = np.random.default_rng(1234)

PRIMES = [
    (1 << 31) - 1 - 2**20 + 484,  # any odd modulus < 2^31; primes below
    primegen.gen_ntt_primes(1, 30, 2 * 8192)[0],
    primegen.gen_ntt_primes(1, 28, 2 * 8192)[0],
    primegen.gen_ntt_primes(1, 31, 2 * 16384)[0],
    (1 << 16) + 1,
    3,
]


def _rand(p, n=4096):
    return RNG.integers(0, p, size=n, dtype=np.uint32)


@pytest.mark.parametrize("p", PRIMES)
def test_umulhi32(p):
    a = _rand(2**32 - 1)
    b = _rand(2**32 - 1)
    got = np.asarray(modops.umulhi32(jnp.asarray(a), jnp.asarray(b)))
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(
        np.uint32
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", PRIMES)
def test_mont_mul_matches_bignum(p):
    if p % 2 == 0 or p >= 2**31:
        pytest.skip("modulus out of contract")
    c = modops.mont_consts(p)
    a = _rand(p)
    b = _rand(p)
    am = modops.host_to_mont(a, p)
    bm = modops.host_to_mont(b, p)
    got_m = np.asarray(
        modops.mont_mul(
            jnp.asarray(am), jnp.asarray(bm), c["p"], c["p_neg_inv"]
        )
    )
    got = modops.host_from_mont(got_m, p)
    want = (a.astype(object) * b.astype(object) % p).astype(np.uint32)
    np.testing.assert_array_equal(got, want)
    assert got_m.max() < p


@pytest.mark.parametrize("p", PRIMES)
def test_mont_mul_edge_values(p):
    c = modops.mont_consts(p)
    edge = np.array([0, 1, 2, p - 1, p - 2, p // 2], dtype=np.uint32) % p
    a, b = np.meshgrid(edge, edge)
    a, b = a.ravel(), b.ravel()
    am = modops.host_to_mont(a, p)
    bm = modops.host_to_mont(b, p)
    got = modops.host_from_mont(
        np.asarray(
            modops.mont_mul(
                jnp.asarray(am), jnp.asarray(bm), c["p"], c["p_neg_inv"]
            )
        ),
        p,
    )
    want = (a.astype(object) * b.astype(object) % p).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", PRIMES)
def test_add_sub_neg(p):
    a = _rand(p)
    b = _rand(p)
    pj = np.uint32(p)
    np.testing.assert_array_equal(
        np.asarray(modops.mod_add(jnp.asarray(a), jnp.asarray(b), pj)),
        ((a.astype(np.uint64) + b) % p).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(modops.mod_sub(jnp.asarray(a), jnp.asarray(b), pj)),
        ((a.astype(np.int64) - b) % p).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(modops.mod_neg(jnp.asarray(a), pj)),
        ((-a.astype(np.int64)) % p).astype(np.uint32),
    )


@pytest.mark.parametrize("p", PRIMES)
def test_barrett_reduce_full_u32_range(p):
    c = modops.mont_consts(p)
    v = _rand(2**32 - 1)
    v = np.concatenate([v, np.array([0, 1, 2**32 - 1, p, p - 1, 2 * p],
                                    dtype=np.uint64).astype(np.uint32)])
    got = np.asarray(
        modops.barrett_reduce_u32(jnp.asarray(v), c["p"], c["mu"])
    )
    want = (v.astype(np.uint64) % p).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", PRIMES)
def test_to_from_mont_roundtrip(p):
    c = modops.mont_consts(p)
    a = _rand(p)
    m = modops.to_mont(jnp.asarray(a), c["p"], c["p_neg_inv"], c["r2"])
    back = np.asarray(modops.from_mont(m, c["p"], c["p_neg_inv"]))
    np.testing.assert_array_equal(back, a)
    np.testing.assert_array_equal(np.asarray(m), modops.host_to_mont(a, p))


def test_primegen_properties():
    two_n = 2 * 8192
    primes = primegen.gen_ntt_primes(4, 30, two_n)
    assert len(set(primes)) == 4
    for p in primes:
        assert p < 2**31 and p % two_n == 1 and primegen.is_prime(p)
        w = primegen.root_of_unity(two_n, p)
        assert pow(w, two_n, p) == 1
        assert pow(w, two_n // 2, p) == p - 1


@pytest.mark.parametrize("p", PRIMES)
def test_shoup_mul_exact_full_uint32_range(p):
    """shoup_mul must be exact for ANY uint32 x (not just x < p) — the
    key-switch and BEHZ paths feed it unreduced cross-base digits."""
    # adversarial x: full range, extremes, and multiples near wrap
    x = np.concatenate(
        [
            _rand(2**32 - 1, 2048),
            np.array(
                [0, 1, p - 1, p, 2 * p - 1, 2**31, 2**32 - 1],
                dtype=np.uint32,
            ),
        ]
    )
    for w in [0, 1, p - 1, int(_rand(p, 1)[0]), int(_rand(p, 1)[0])]:
        ws = np.uint32((w << 32) // p)
        got = np.asarray(
            modops.shoup_mul(
                jnp.asarray(x),
                jnp.uint32(w),
                jnp.asarray(ws),
                jnp.uint32(p),
            )
        )
        want = (x.astype(object) * w % p).astype(np.uint32)
        np.testing.assert_array_equal(got, want)
