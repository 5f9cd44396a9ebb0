"""On-chip self-check + microbench for the NTT paths (run on real TPU).

Asserts the fused Pallas kernel is bit-exact against the XLA four-step
path on the actual chip (interpreter-mode equality is covered by
tests/test_pallas_ntt.py; Mosaic lowering differences only show up here),
then reports per-row transform timings for both paths.

Usage:  python scripts/chip_check.py [N] [LIMBS] [ROWS]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from reference_seal_backend_tpu.utils import jaxcfg  # noqa: E402

jaxcfg.setup()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_seal_backend_tpu.nums import primegen  # noqa: E402
from reference_seal_backend_tpu.ops import ntt  # noqa: E402
from reference_seal_backend_tpu.ops.pallas import ntt_kernel  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    nl = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    print("backend:", jax.default_backend())
    primes = tuple(primegen.gen_ntt_primes(nl, 29, 2 * n))
    plan = ntt.make_plan(n, primes)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.stack(
            [rng.integers(0, p, (8, n)).astype(np.uint32) for p in primes],
            axis=1,
        )
    )
    want = jax.jit(lambda v: plan._fwd_mat(v, 0))(x)
    got = jax.jit(lambda v: ntt_kernel.transform(plan, v, 0, False))(x)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    print("fwd bit-exact on chip")
    want_i = jax.jit(lambda v: plan._inv_mat(v, 0))(want)
    got_i = jax.jit(lambda v: ntt_kernel.transform(plan, v, 0, True))(want)
    np.testing.assert_array_equal(np.asarray(want_i), np.asarray(got_i))
    print("inv bit-exact on chip")

    xb = jnp.asarray(
        np.stack(
            [
                rng.integers(0, p, (rows, n)).astype(np.uint32)
                for p in primes
            ],
            axis=1,
        )
    )
    paths = [
        ("xla", jax.jit(lambda v: plan._fwd_mat(v, 0))),
        ("pallas", jax.jit(lambda v: ntt_kernel.transform(plan, v, 0, False))),
    ]
    for name, f in paths:
        f(xb).block_until_ready()
        iters = 100
        t0 = time.perf_counter()
        y = xb
        for _ in range(iters):
            y = f(y)
        y.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        total = rows * nl
        print(
            f"{name}: {dt * 1e6:.1f} us per {total}-row batch, "
            f"{dt * 1e6 / total:.2f} us/row"
        )


if __name__ == "__main__":
    main()
