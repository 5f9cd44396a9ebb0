"""Fused Pallas NTT kernel vs the pure-XLA plan path: bit-exact equality.

Runs the kernel in Mosaic interpreter mode on CPU (tests never touch the
single-client TPU chip); on-chip equality is additionally asserted by
bench.py's startup self-check.
"""

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from reference_seal_backend_tpu.nums import primegen
from reference_seal_backend_tpu.ops import ntt
from reference_seal_backend_tpu.ops.pallas import ntt_kernel

RNG = np.random.default_rng(42)


def _plan(n, n_limbs=3, bits=29):
    primes = tuple(primegen.gen_ntt_primes(n_limbs, bits, 2 * n))
    return ntt.make_plan(n, primes)


@pytest.mark.parametrize("n", [256, 2048])
@pytest.mark.parametrize("inverse", [False, True])
def test_fused_kernel_bit_exact(n, inverse):
    plan = _plan(n)
    x = jnp.asarray(
        np.stack(
            [RNG.integers(0, p, (2, n)).astype(np.uint32) for p in plan.primes],
            axis=1,
        )
    )  # [B=2, L=3, N]
    want = plan._inv_mat(x, 0) if inverse else plan._fwd_mat(x, 0)
    with pltpu.force_tpu_interpret_mode():
        got = ntt_kernel.transform(plan, x, lo=0, inverse=inverse)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_kernel_limb_offset():
    """lo > 0 (special-modulus row) must pick the right twiddle rows."""
    n = 256
    plan = _plan(n)
    lo = 2
    p = plan.primes[lo]
    x = jnp.asarray(RNG.integers(0, p, (1, 1, n)).astype(np.uint32))
    want = plan._fwd_mat(x, lo)
    with pltpu.force_tpu_interpret_mode():
        got = ntt_kernel.transform(plan, x, lo=lo, inverse=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_row_padding_roundtrip():
    """Row counts not divisible by the tile size pad+slice correctly."""
    n = 256
    plan = _plan(n)
    x = jnp.asarray(
        np.stack(
            [RNG.integers(0, p, (3, n)).astype(np.uint32) for p in plan.primes],
            axis=1,
        )
    )  # B=3 (pads to tile)
    with pltpu.force_tpu_interpret_mode():
        f = ntt_kernel.transform(plan, x, lo=0, inverse=False)
        back = ntt_kernel.transform(plan, f, lo=0, inverse=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
