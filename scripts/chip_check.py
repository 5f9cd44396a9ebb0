"""On-chip self-check + microbench for the NTT paths (run on real TPU).

Asserts the fused Pallas kernel is bit-exact against the XLA four-step
path on the actual chip (interpreter-mode equality is covered by
tests/test_pallas_ntt.py; Mosaic lowering differences only show up here),
then reports per-row transform timings for both paths.

Usage:  python scripts/chip_check.py [N] [LIMBS] [ROWS]
        python scripts/chip_check.py ops [N]   # evaluator-op microbench
                                               # (BFV multiply, rotate vs
                                               # hoisted rotate_sum)
        python scripts/chip_check.py roofline [N]  # measured single-chip
                                               # int-op ceiling vs what the
                                               # NTT achieves (BASELINE.md
                                               # roofline note source)
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


def roofline(n: int) -> None:
    """Measured speed-of-light check for the NTT (BASELINE.md roofline
    note): compare the butterfly rate the four-step NTT achieves against
    the chip's raw issue rate for the same primitive, measured as a
    data-dependent chain of Harvey lazy butterflies on resident VMEM-sized
    tiles (pure compute probe — the chained values leave the lazy range,
    which changes results, not op count or timing)."""
    import json

    from reference_seal_backend_tpu.ops import modops

    print("backend:", jax.default_backend())
    nl = 8  # the N=16384 depth-2 production stack: 6 data + 2 special
    primes = tuple(primegen.gen_ntt_primes(nl, 30, 2 * n))
    plan = ntt.make_plan(n, primes)
    rng = np.random.default_rng(0)
    rows = 64
    xb = jnp.asarray(
        np.stack(
            [rng.integers(0, p, (rows, n)).astype(np.uint32) for p in primes],
            axis=1,
        )
    )
    fwd = jax.jit(lambda v: plan._fwd_mat(v, 0))
    dt_row = _time(fwd, xb, iters=50) / (rows * nl)
    butterflies_row = (n // 2) * int(np.log2(n))
    ntt_bps = butterflies_row / dt_row

    # raw chained-butterfly probe: x <- reduce_2p(x + lazy(x·w)), the same
    # shoup-lazy multiply + add/select mix as one NTT butterfly leg, with a
    # serial dependence so XLA cannot batch the chain away.
    p = jnp.asarray(
        np.array([[modops.mont_consts(q)["p"]] for q in primes], np.uint32)
    )
    w = (p // np.uint32(3)) | np.uint32(1)
    ws = jnp.asarray(
        np.array(
            [[((int(wi) << 32) // int(pi))] for wi, pi in
             zip(np.asarray(w).ravel(), primes)],
            np.uint32,
        )
    )
    p2 = p + p
    chain = 64

    def probe(x):
        for _ in range(chain):
            t = modops.shoup_mul_lazy(x, w, ws, p)
            x = modops.reduce_2p(x + t, p2)
        return x

    probe_j = jax.jit(probe)
    raw_bps = 0.0
    for r in (4, 8, 16, 32, 64):
        dt = _time(probe_j, xb[:r], iters=20)
        raw_bps = max(raw_bps, r * nl * n * chain / dt)
    out = {
        "n": n,
        "stack_limbs": nl,
        "ntt_us_per_row": round(dt_row * 1e6, 3),
        "butterflies_per_row": butterflies_row,
        "ntt_butterflies_per_sec": float(f"{ntt_bps:.4g}"),
        "raw_chained_butterflies_per_sec": float(f"{raw_bps:.4g}"),
        "ntt_fraction_of_raw_issue_rate": round(ntt_bps / raw_bps, 3),
    }
    print(json.dumps(out))


def groupcmp(
    n: int, depth: int = 2, sec: int = 128, batch: int = 8,
    gs=(1, 2),
) -> None:
    """Digit grouping G comparison on the key-switch-bound ops (round 3):
    same workload semantics, measured on the real chip with correctness
    gates (decrypt-compare) before timing."""
    from dataclasses import replace as _rep

    from reference_seal_backend_tpu.evaluator.eval import Evaluator
    from reference_seal_backend_tpu.schemes import ckks, keys as keys_mod
    from reference_seal_backend_tpu.schemes.params import make_ckks_context

    print(f"backend: {jax.default_backend()} N={n} depth={depth}")
    rng = np.random.default_rng(0)
    for G in gs:
        ctx = make_ckks_context(
            poly_modulus_degree=n, mult_depth=depth, digit_group=G,
            sec_level=sec,
        )
        ks = keys_mod.keygen(
            ctx,
            seed=2,
            galois_elts=[pow(5, s, 2 * ctx.n) for s in range(1, 8)],
            need_relin=True,
        )
        enc = ckks.CkksEncoder(ctx)
        encr = ckks.CkksEncryptor(ctx, ks, seed=2)
        decr = ckks.CkksDecryptor(ctx, ks)
        va = rng.uniform(-1, 1, ctx.slots)
        ct = encr.encrypt_pt(enc.encode(va))
        ctb = _rep(ct, data=jnp.broadcast_to(ct.data, (batch,) + ct.data.shape))

        # Keys flow as jit ARGUMENTS (embedded key constants overflow the
        # remote-compile request at big N·l — models/base.py jit_with_keys).
        rot_k = jax.jit(lambda keys, c: Evaluator(ctx, keys).rotate(c, 1))
        rot = lambda c: rot_k(ks, c)
        out = rot(ctb)
        err = np.max(np.abs(np.real(
            decr.decrypt(_rep(out, data=out.data[0]))) - np.roll(va, -1)))
        assert err < 5e-4, err
        dt_rot = _time(rot, ctb) / batch

        mrr_k = jax.jit(lambda keys, x: (lambda e: e.rescale_to_next(
            e.relinearize(e.multiply(x, x))))(Evaluator(ctx, keys)))
        mrr = lambda x: mrr_k(ks, x)
        dt_mrr = _time(mrr, ctb) / batch
        rsum_k = jax.jit(
            lambda keys, c: Evaluator(ctx, keys).rotate_sum(
                c, list(range(8))
            )
        )
        rsum = lambda c: rsum_k(ks, c)
        dt_rs = _time(rsum, ctb) / batch
        print(
            f"G={G} (ns={ctx.n_special}, dig={ctx.dig_count(ctx.L)}): "
            f"rotate {dt_rot*1e6:.0f} us, mult+relin+rescale "
            f"{dt_mrr*1e6:.0f} us, rotate_sum8 {dt_rs*1e6:.0f} us"
        )


def groupparts(n: int) -> None:
    """Stage-level timing of the key-switch for G=1 vs G=2 (diagnose the
    groupcmp regression): digit lift alone, full key_switch, mod-down."""
    from dataclasses import replace as _rep

    from reference_seal_backend_tpu.evaluator.eval import Evaluator
    from reference_seal_backend_tpu.schemes import ckks, keys as keys_mod
    from reference_seal_backend_tpu.schemes.params import make_ckks_context

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    batch = 8
    for G in (1, 2):
        ctx = make_ckks_context(
            poly_modulus_degree=n, mult_depth=2, digit_group=G
        )
        ks = keys_mod.keygen(ctx, seed=2, need_relin=True)
        enc = ckks.CkksEncoder(ctx)
        encr = ckks.CkksEncryptor(ctx, ks, seed=2)
        ev = Evaluator(ctx, ks)
        ct = encr.encrypt_pt(enc.encode(rng.uniform(-1, 1, ctx.slots)))
        d = jnp.broadcast_to(
            ct.data[1], (batch,) + ct.data[1].shape
        )  # [B, L, N]
        l = ctx.L
        lift = jax.jit(lambda x: ev._hoisted_digits(x, l))
        dt_lift = _time(lift, d) / batch
        ksw = jax.jit(lambda x: ev.key_switch(x, ks.relin, l))
        dt_ks = _time(ksw, d) / batch
        dig = lift(d)
        p_t, _, _ = ev._switch_targets(l)
        inner = jax.jit(
            lambda dg: ev._mod_down_special(
                _mod_sum_local(
                    modops_shoup(dg, ev._cat_key(ks.relin.b, l),
                                 ev._cat_key(ks.relin.bs, l), p_t),
                    p_t,
                ),
                l,
            )
        )
        dt_inner = _time(inner, dig) / batch
        print(
            f"G={G}: lift {dt_lift*1e6:.0f} us, inner+moddown "
            f"{dt_inner*1e6:.0f} us, full key_switch {dt_ks*1e6:.0f} us "
            f"(dig shape {tuple(dig.shape)})"
        )


def modops_shoup(dig, kb, kbs, p_t):
    from reference_seal_backend_tpu.ops import modops as _m

    return _m.shoup_mul(dig, kb, kbs, p_t)


def _mod_sum_local(x, p_t):
    from reference_seal_backend_tpu.evaluator.eval import _mod_sum

    return _mod_sum(x, p_t, axis=-3)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "ops":
        ops_bench(int(sys.argv[2]) if len(sys.argv) > 2 else 8192)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "roofline":
        roofline(int(sys.argv[2]) if len(sys.argv) > 2 else 16384)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "groupcmp":
        groupcmp(
            int(sys.argv[2]) if len(sys.argv) > 2 else 16384,
            depth=int(sys.argv[3]) if len(sys.argv) > 3 else 2,
            sec=int(sys.argv[4]) if len(sys.argv) > 4 else 128,
            batch=int(sys.argv[5]) if len(sys.argv) > 5 else 8,
            gs=tuple(
                int(g) for g in sys.argv[6].split(",")
            ) if len(sys.argv) > 6 else (1, 2),
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "groupparts":
        groupparts(int(sys.argv[2]) if len(sys.argv) > 2 else 16384)
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
