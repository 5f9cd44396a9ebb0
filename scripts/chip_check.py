"""On-chip self-check + microbench for the NTT paths (run on real TPU).

Asserts the fused Pallas kernel is bit-exact against the XLA four-step
path on the actual chip (interpreter-mode equality is covered by
tests/test_pallas_ntt.py; Mosaic lowering differences only show up here),
then reports per-row transform timings for both paths.

Usage:  python scripts/chip_check.py [N] [LIMBS] [ROWS]
        python scripts/chip_check.py ops [N]   # evaluator-op microbench
                                               # (BFV multiply, rotate vs
                                               # hoisted rotate_sum)
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


def _time(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def ops_bench(n: int) -> None:
    """Time the evaluator ops the round's optimizations target."""
    from dataclasses import replace as _rep

    from reference_seal_backend_tpu.evaluator.eval import Evaluator
    from reference_seal_backend_tpu.schemes import bfv, ckks, keys as keys_mod
    from reference_seal_backend_tpu.schemes.params import (
        make_bfv_context,
        make_ckks_context,
    )

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    # BFV ct-ct multiply (fused q ∪ Bsk tensor-base sweeps)
    bctx = make_bfv_context(poly_modulus_degree=n, n_data_primes=4)
    bks = keys_mod.keygen(bctx, seed=1, need_relin=False)
    benc = bfv.BfvBatchEncoder(bctx)
    bencr = bfv.BfvEncryptor(bctx, bks)
    ca = bencr.encrypt_pt(benc.encode(rng.integers(-99, 99, bctx.slots)))
    cb = bencr.encrypt_pt(benc.encode(rng.integers(-99, 99, bctx.slots)))
    bev = Evaluator(bctx, bks)
    mult = jax.jit(bev.multiply)
    dt = _time(mult, ca, cb)
    print(f"bfv multiply N={n} L={bctx.L}: {dt * 1e6:.0f} us/op")

    # CKKS rotate (full key-switch) vs hoisted rotate_sum over 9 steps
    cctx = make_ckks_context(poly_modulus_degree=n, mult_depth=3)
    steps = list(range(1, 9))
    cks = keys_mod.keygen(
        cctx,
        seed=2,
        galois_elts=[pow(5, s, 2 * cctx.n) for s in steps],
        need_relin=False,
    )
    cenc = ckks.CkksEncoder(cctx)
    cencr = ckks.CkksEncryptor(cctx, cks)
    ct = cencr.encrypt_pt(cenc.encode(rng.uniform(-1, 1, cctx.slots)))
    cev = Evaluator(cctx, cks)
    rot1 = jax.jit(lambda c: cev.rotate(c, 1))
    dt1 = _time(rot1, ct)
    print(f"ckks rotate N={n} L={cctx.L}: {dt1 * 1e6:.0f} us/op")

    def serial(c):
        out = c
        for s in steps:
            out = cev.add(out, cev.rotate(c, s))
        return out

    dt_serial = _time(jax.jit(serial), ct)
    rsum = jax.jit(lambda c: cev.rotate_sum(c, [0] + steps))
    dt_hoist = _time(rsum, ct)
    print(
        f"ckks 9-rotation sum N={n} L={cctx.L}: serial "
        f"{dt_serial * 1e6:.0f} us, hoisted {dt_hoist * 1e6:.0f} us "
        f"({dt_serial / dt_hoist:.2f}x)"
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "ops":
        ops_bench(int(sys.argv[2]) if len(sys.argv) > 2 else 8192)
        return
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
