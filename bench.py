"""Chip benchmark suite: key-switch-inclusive metrics with correctness gates.

Driver contract: prints the result as ONE complete JSON line
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extras": ...}
and re-prints an updated complete line after each suite step, so whichever
line the driver parses (first or last) always carries the headline — round 2
timed out with NOTHING recorded because the old structure ran the whole
suite before printing anything (VERDICT r2, weak #1).

Structure (VERDICT r2 item 1, hardened per VERDICT r3 items 1/2/5 and
restructured per VERDICT r4 item 1 — the r04 420 s driver run captured
only 2 of 10 metrics because the key-switch metrics paid a SECOND
N=16384 context+keygen and sat behind a step that stalled for 193 s):
  1. Measure + gate the headline (bare CKKS ct-ct multiply at N=16384,
     the reference's eltwise-mult hot op — /root/reference
     src/benchmarks/ckks/seal_ckks_element_wise_benchmark.cpp:343) on a
     context whose keygen ALREADY carries relin + the 7 rotation keys
     (device-resident keygen makes the marginal cost seconds), emit
     immediately.
  2. Run the three key-switch metrics FIRST among the extras: they reuse
     the headline's context/keyset/operands, so each costs one
     executable load + a bounded-chunk measurement, not a fresh keygen.  The
     stall-prone dot-product step (193.6 s in the r04 driver run) runs
     after them.  Every step sits behind its own correctness gate AND a
     wall-clock budget check (``RSB_TPU_BENCH_BUDGET_S``, default
     420 s).  Per-step cost estimates are WARM persistent-cache figures
     scaled by a COLD FACTOR calibrated from the measured headline
     duration vs its known warm duration — a cold-cache run skips
     expensive steps instead of overrunning the driver's timeout (the
     round-3 failure: warm estimates, cold run, 969 s elapsed on a 420 s
     budget).
  3. Per-step wall times are recorded in ``timings`` so any skip decision
     is auditable from the BENCH artifact alone; skipped steps are
     collected and emitted ONCE after the loop (the r04 artifact tail
     was 8 near-identical lines, one per skip).

``bench_suite.json`` is only overwritten by a record at least as complete
as the one already on disk (same-or-superset extras keys): a partial
budget-limited run can never clobber a full committed record (VERDICT r3
item 2).  Every run also writes ``bench_suite.latest.json`` (gitignored)
with its own freshest state.  scripts/gen_perf_table.py regenerates
README.md's performance table from bench_suite.json — numbers are
generated, never hand-typed.

``vs_baseline`` compares the headline against SEAL's single-core ct-ct
multiply throughput at N=16384 ≈ 150 ops/s (vanilla SEAL, the reference
backend's default build — no HEXL option in its CMake).  No number is
published by the reference repo and SEAL cannot be built here (zero
egress); BASELINE.md §"SEAL baseline measurement attempt" documents the
estimate's provenance.  The BASELINE.json target is 100x.
"""

from __future__ import annotations

import json
import os
import sys
import time
from dataclasses import replace

import numpy as np

from reference_seal_backend_tpu.utils import jaxcfg

jaxcfg.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_seal_backend_tpu.evaluator.eval import Evaluator  # noqa: E402
from reference_seal_backend_tpu.schemes import bfv, ckks, keys as keys_mod  # noqa: E402
from reference_seal_backend_tpu.schemes.params import (  # noqa: E402
    make_bfv_context,
    make_ckks_context,
)

SEAL_SINGLE_CORE_MULTS_PER_SEC = 150.0  # documented estimate, BASELINE.md

N = 16384
BATCH = 64      # dyadic-op batch
BATCH_KS = 8    # key-switch-op batch (digit tensors are l²-sized)
EPS = 5e-5      # the reference's CKKS decode epsilon

BUDGET_S = float(os.environ.get("RSB_TPU_BENCH_BUDGET_S", "420"))
RESERVE_S = 5.0  # tail reserve for emits/teardown
# Measured warm-persistent-cache headline duration (context + full
# keygen incl. relin + 7 rotation keys + jitted encrypt + cache-hit
# executable load + jitted-decrypt gate + chunked ~8 s measurement; the
# instrumented headline_detail in every record carries the split.  The
# bounded-chunk _throughput cut the measure phase from 35 s of queue
# drain to ~12 s).
# Setup, not measurement, is the cost: the tunneled chip's per-step wall
# time is dominated by fixed overheads and minute-scale RANDOM I/O
# stalls (BASELINE.md §"Bench wall-clock anatomy") — the cold factor
# calibrated from the headline scales every later estimate so a stalled
# or cold-cache run skips steps instead of overrunning the driver.
WARM_HEADLINE_S = 45.0
_T0 = time.monotonic()

RESULT: dict = {
    "metric": "ckks_ctct_mults_per_sec_n16384",
    "value": None,
    "unit": "ops/s",
    "vs_baseline": None,
    "extras": {},
    "skipped": [],
    "timings": {},
    "cold_factor": None,
    "budget_s": BUDGET_S,
    "date": time.strftime("%Y-%m-%d", time.gmtime()),
}


def _elapsed() -> float:
    return time.monotonic() - _T0


def _calibrate(ratios) -> float:
    """Cold factor = MINIMUM observed actual/warm-estimate ratio, floored
    at 1 (never discount below the warm estimates) and capped at 25.

    The minimum — not the mean, not the latest — because per-step walls
    carry minute-scale random tunnel stalls: one step landing at its warm
    estimate proves the persistent cache is hot, so remaining inflation
    on other steps was stall noise, not cold compiles."""
    return max(1.0, min(min(ratios), 25.0))


def _more_complete(new: dict, old: dict) -> bool:
    """True iff ``new`` may overwrite ``old``: a real headline and extras
    at least as complete — a partial budget-limited run never clobbers a
    fuller committed record.

    Completeness compares only against the metric keys THIS bench version
    can still produce (``CURRENT_METRIC_KEYS``): a renamed or retired
    metric in the committed record would otherwise block promotion
    forever (ADVICE r4).  ``RSB_TPU_BENCH_FORCE_PROMOTE=1`` overrides."""
    if new.get("value") is None:
        return False
    if os.environ.get("RSB_TPU_BENCH_FORCE_PROMOTE") == "1":
        return True
    if not isinstance(old, dict) or old.get("value") is None:
        return True
    old_keys = set(old.get("extras", {}))
    stale = old_keys - CURRENT_METRIC_KEYS
    if stale:
        print(
            f"bench: committed record carries retired metric keys {sorted(stale)}; "
            "comparing completeness on current keys only",
            file=sys.stderr,
        )
    return set(new.get("extras", {})) >= (old_keys & CURRENT_METRIC_KEYS)


def _emit() -> None:
    """Print the full result as one JSON line and persist it.

    Called after every completed step: the LAST complete line on stdout is
    always the most complete result, and the FIRST emitted line already
    carries the headline.  bench_suite.json is promoted only when the new
    record is at least as complete as what is already there; the freshest
    state of THIS run always lands in bench_suite.latest.json."""
    RESULT["elapsed_s"] = round(_elapsed(), 1)
    line = json.dumps(RESULT)
    with open("bench_suite.latest.json", "w") as f:
        f.write(line + "\n")
    try:
        with open("bench_suite.json") as f:
            old = json.load(f)
    except Exception:
        old = {}
    if _more_complete(RESULT, old):
        with open("bench_suite.json", "w") as f:
            f.write(line + "\n")
    print(line, flush=True)


def _throughput(fn, out_of, *args, min_s: float = 4.0, chunk0: int = 64,
                max_iters: int = 200_000):
    """calls/sec of fn(*args) via bounded adaptive chunks.

    The old loop enqueued unblocked dispatches for 2 s of HOST wall and
    then drained the async queue once: over the tunneled chip the host
    enqueues dispatches 20-30x faster than the device retires them, so
    the drain ran tens of seconds to minutes per metric (~90% of the
    rotate_sum8 step's 145 s warm wall was queue drain; the headline's
    measure phase was 35 s for 2 s of enqueue).  Chunked: each round
    enqueues a BOUNDED batch and blocks once; the next chunk size is
    rescaled from the measured rate to land ~``min_s`` of device time,
    so the whole measurement costs ~2-3 round trips + ``min_s`` instead
    of an unbounded drain.  The reported rate is the best chunk rate
    with >= 1 s of wall: each block pays one tunnel round trip
    (~0.2-0.5 s), so sub-second chunks are round-trip-dominated, and a
    random tunnel stall in the final chunk falls back to the cleanest
    earlier chunk instead of polluting the metric.  The remaining bias
    is one round trip over >= min_s of device time (a few % low —
    conservative, never overclaiming)."""
    out = fn(*args)
    jax.block_until_ready(out_of(out))  # compile/load + warmup
    k, best, qual, had_long = chunk0, 0.0, 0, False
    while True:
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        jax.block_until_ready(out_of(out))
        wall = time.perf_counter() - t0
        if wall >= 1.0:
            best = max(best, k / wall)
            qual += 1
        if wall >= min_s or k >= max_iters:
            had_long = True
        # Terminate only once TWO chunks qualified: a random tunnel
        # stall inside the single long chunk would otherwise both end
        # the loop and BE the reported rate, with nothing cleaner to
        # fall back to.  The second qualifier is usually a ramp chunk
        # that already ran; when it is not, one short (~1.5 s)
        # confirmation chunk supplies it.
        if had_long and (qual >= 2 or k >= max_iters):
            return best if best > 0.0 else k / wall
        if had_long:
            # confirmation sizing from the best rate seen; double on a
            # sub-second result (a stalled long chunk underestimates the
            # rate, making the first confirmation guess too small)
            k = min(max_iters, max(k * 2 if wall < 1.0 else 1,
                                   int(max(best, k / wall) * 1.5)))
            continue
        # aim the next chunk ~35% past min_s of device time: the
        # overshoot absorbs the round-trip share of the measured wall
        # and avoids a near-miss chunk (observed: a 7.6 s chunk against
        # min_s=8 forced one extra full-size round)
        k = min(max_iters, max(k + 1, int(k * min_s * 1.35 / max(wall, 1e-3))))


def _latency_ms(fn, out_of, *args, reps: int = 10):
    """median per-call latency of fn(*args), ms."""
    jax.block_until_ready(out_of(fn(*args)))  # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(out_of(fn(*args)))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def _gate(name: str, got, want, tol: float):
    err = float(np.max(np.abs(np.asarray(got) - np.asarray(want))))
    if not err <= tol:
        raise SystemExit(f"bench correctness gate failed [{name}]: max err {err}")


def _broadcast(ct, batch):
    return replace(ct, data=jnp.broadcast_to(ct.data, (batch,) + ct.data.shape))


class _State:
    """Context/keys/operands shared by the headline AND the three
    key-switch metrics: ONE device-resident keygen (relin + the 7
    rotation keys 5^1..5^7) paid inside the headline step, so each
    key-switch metric's marginal cost is one executable load + a bounded
    measurement loop — the r04 structure paid a second N=16384
    context+keygen for them and the 420 s driver budget starved
    (VERDICT r4 item 1)."""

    def __init__(self):
        ctx = make_ckks_context(poly_modulus_degree=N, mult_depth=2)
        self.ctx = ctx
        ks = keys_mod.keygen(
            ctx,
            seed=1234,
            galois_elts=tuple(pow(5, s, 2 * ctx.n) for s in range(1, 8)),
            need_relin=True,
        )
        self.keys = ks
        enc = ckks.CkksEncoder(ctx)
        encryptor = ckks.CkksEncryptor(ctx, ks, seed=1234)
        self.decryptor = ckks.CkksDecryptor(ctx, ks)
        self.ev = Evaluator(ctx, ks)
        rng = np.random.default_rng(1234)
        self.va = rng.uniform(-1, 1, ctx.slots)
        self.vb = rng.uniform(-1, 1, ctx.slots)
        ca = encryptor.encrypt_pt(enc.encode(self.va))
        cb = encryptor.encrypt_pt(enc.encode(self.vb))
        self.a64, self.b64 = _broadcast(ca, BATCH), _broadcast(cb, BATCH)
        self.a8, self.b8 = _broadcast(ca, BATCH_KS), _broadcast(cb, BATCH_KS)


def headline() -> "_State":
    """Bare ct-ct multiply throughput; returns the shared state the
    key-switch metrics reuse.  Phase walls land in
    ``timings["headline_detail"]`` so a stalled run shows WHERE the time
    went (setup vs executable load vs gate vs measurement)."""
    detail = {}
    t = time.monotonic()
    st = _State()
    detail["setup"] = round(time.monotonic() - t, 1)
    t = time.monotonic()
    mult = jax.jit(st.ev.multiply)
    out = mult(st.a64, st.b64)
    jax.block_until_ready(out.data)
    detail["compile_load"] = round(time.monotonic() - t, 1)
    t = time.monotonic()
    _gate(
        "ctct_mult",
        np.real(st.decryptor.decrypt(replace(out, data=out.data[0]))),
        st.va * st.vb,
        EPS,
    )
    detail["gate"] = round(time.monotonic() - t, 1)
    t = time.monotonic()
    # min_s=8 on the headline: the one-round-trip bias shrinks with
    # chunk length, and the headline is the number vs_baseline quotes
    ops = BATCH * _throughput(mult, lambda o: o.data, st.a64, st.b64, min_s=8.0)
    detail["measure"] = round(time.monotonic() - t, 1)
    RESULT["timings"]["headline_detail"] = detail
    RESULT["value"] = round(ops, 1)
    RESULT["vs_baseline"] = round(ops / SEAL_SINGLE_CORE_MULTS_PER_SEC, 2)
    return st


def ks_mult_relin_rescale(st: _State, extras):
    """multiply + relinearize + rescale (the workload multiply path).

    Keys flow as jit ARGUMENTS (models/base.py jit_with_keys rationale):
    embedding them as closure constants bloats the executable with tens
    of MB of key data, defeating the persistent cache's cheap hit path
    over the remote-compile tunnel."""
    mrr = jax.jit(
        lambda keys, x, y: (lambda ev: ev.rescale_to_next(
            ev.relinearize(ev.multiply(x, y))
        ))(Evaluator(st.ctx, keys))
    )
    out = mrr(st.keys, st.a8, st.b8)
    _gate(
        "mult_relin_rescale",
        np.real(st.decryptor.decrypt(replace(out, data=out.data[0]))),
        st.va * st.vb,
        5e-4,
    )
    extras["ckks_mult_relin_rescale_per_sec_n16384"] = round(
        BATCH_KS * _throughput(mrr, lambda o: o.data, st.keys, st.a8, st.b8),
        1,
    )


def ks_rotate(st: _State, extras):
    """rotate by 1 (Galois key switch)."""
    rot = jax.jit(
        lambda keys, x: Evaluator(st.ctx, keys).rotate(x, 1)
    )
    out = rot(st.keys, st.a8)
    _gate(
        "rotate",
        np.real(st.decryptor.decrypt(replace(out, data=out.data[0]))),
        np.roll(st.va, -1),
        5e-4,
    )
    extras["ckks_rotate_per_sec_n16384"] = round(
        BATCH_KS * _throughput(rot, lambda o: o.data, st.keys, st.a8), 1
    )


def ks_rotate_sum(st: _State, extras):
    """hoisted 8-rotation sum (MatMultRow / small-count accumulate path)."""
    steps = list(range(8))
    rsum = jax.jit(
        lambda keys, x: Evaluator(st.ctx, keys).rotate_sum(x, steps)
    )
    out = rsum(st.keys, st.a8)
    want = np.zeros(st.va.shape[0])
    for s in steps:
        want += np.roll(st.va, -s)
    _gate(
        "rotate_sum8",
        np.real(st.decryptor.decrypt(replace(out, data=out.data[0]))),
        want,
        5e-4 * len(steps),
    )
    extras["ckks_rotate_sum8_per_sec_n16384"] = round(
        BATCH_KS * _throughput(rsum, lambda o: o.data, st.keys, st.a8), 1
    )


def bfv_suite(extras):
    ctx = make_bfv_context(poly_modulus_degree=8192)
    ks = keys_mod.keygen(ctx, seed=1234, need_relin=False)
    enc = bfv.BfvBatchEncoder(ctx)
    encryptor = bfv.BfvEncryptor(ctx, ks, seed=1234)
    decryptor = bfv.BfvDecryptor(ctx, ks)
    ev = Evaluator(ctx, ks)
    rng = np.random.default_rng(1234)
    ia = rng.integers(-50, 50, ctx.slots)
    ib = rng.integers(-50, 50, ctx.slots)
    ca = encryptor.encrypt_pt(enc.encode(ia))
    cb = encryptor.encrypt_pt(enc.encode(ib))
    a, b = _broadcast(ca, BATCH_KS), _broadcast(cb, BATCH_KS)
    mult = jax.jit(ev.multiply)
    out = mult(a, b)
    _gate(
        "bfv_behz_mult",
        decryptor.decrypt(replace(out, data=out.data[0])),
        ia * ib,
        0,
    )
    extras["bfv_behz_mult_per_sec_n8192"] = round(
        BATCH_KS * _throughput(mult, lambda o: o.data, a, b), 1
    )


def _engine_bench(workload_name: str, category_name: str, scheme_name: str,
                  params: dict):
    from reference_seal_backend_tpu.engine.descriptor import (
        Category,
        Scheme,
        Workload,
    )
    from reference_seal_backend_tpu.engine.registry import Engine

    engine = Engine()
    desc = next(
        d
        for d in engine.descriptors
        if d.workload is Workload[workload_name]
        and d.category is Category[category_name]
        and d.scheme is Scheme[scheme_name]
    )
    return engine.create_benchmark(desc, params)


def dot_latency(extras):
    """CKKS dot product n=100 at the descriptor default N=8192 — the
    workload whose accumulate takes the baby-step/giant-step path
    (two hoisted key-switches instead of 7 serial tree switches)."""
    bench = _engine_bench("DOT_PRODUCT", "LATENCY", "CKKS", {})
    n = bench.params["n"]
    rng = np.random.default_rng(1234)
    va = rng.uniform(-1, 1, (1, n))
    vb = rng.uniform(-1, 1, (1, n))
    h = bench.load(bench.encrypt(bench.encode([va, vb])))
    (got,) = bench.decode(bench.decrypt(bench.store(bench.operate(h))))
    _gate("ckks_dot_n100", got[0], va[0] @ vb[0], 5e-4)
    extras["ckks_dot_n100_latency_ms_n8192"] = round(
        _latency_ms(
            lambda: bench.block(bench.operate(h)), lambda o: 0, reps=10
        ),
        2,
    )


def eltwise_mult_offline(extras):
    """CKKS eltwise-multiply Offline samples/s at the registered default
    (N=8192, n=1000) over a 16x16 sample cross product — the reference's
    second timing dimension (Offline category, OpenMP collapse(2) over
    batch0 x batch1, /root/reference
    src/benchmarks/ckks/seal_ckks_element_wise_benchmark.cpp:306-366;
    registration src/engine/seal_engine.cpp:108-124).  One result sample =
    one ct-ct multiply of the 16x16 cross product."""
    b0 = b1 = 16
    bench = _engine_bench("ELTWISE_MULT", "OFFLINE", "CKKS", {})
    n = bench.params["n"]
    rng = np.random.default_rng(1234)
    va = rng.uniform(-1, 1, (b0, n))
    vb = rng.uniform(-1, 1, (b1, n))
    h = bench.load(bench.encrypt(bench.encode([va, vb])))
    got = bench.decode(bench.decrypt(bench.store(bench.operate(h))))
    want = (va[:, None, :] * vb[None, :, :]).reshape(b0 * b1, n)
    _gate("eltwise_mult_offline", np.stack(got), want, EPS)
    sec_per_batch = (
        _latency_ms(lambda: bench.block(bench.operate(h)), lambda o: 0, reps=5)
        / 1e3
    )
    extras["ckks_eltwise_mult_offline_samples_per_sec_n8192"] = round(
        b0 * b1 / sec_per_batch, 1
    )


def _record_describe(bench, key):
    """Chain-shape evidence for the record (e.g. the N=32768 run's
    key_switch_digit_group=3 — VERDICT r4 item 6 asks the describe() to
    back the G=3 claim in the artifact itself)."""
    d = bench.describe()
    RESULT.setdefault("describe", {})[key] = {
        k: d[k]
        for k in (
            "poly_modulus_degree",
            "coeff_modulus_chain_bits",
            "special_modulus_bits",
            "key_switch_digit_group",
            "security",
        )
    }


def logreg_latency(extras, poly: int, key: str):
    bench = _engine_bench("LOGREG_POLY_D3", "LATENCY", "CKKS",
                          {"poly_modulus_degree": poly})
    n = bench.params["n"]
    rng = np.random.default_rng(1234)
    w = rng.uniform(-1, 1, n)
    b = float(rng.uniform(-1, 1))
    x = rng.uniform(-1, 1, (1, n))
    h = bench.load(bench.encrypt(bench.encode([w, b, x])))
    (got,) = bench.decode(bench.decrypt(bench.store(bench.operate(h))))
    z = x @ w + b
    _gate(key, got, 0.5 + 0.15012 * z - 0.0015930078125 * z**3, 5e-4)
    _record_describe(bench, key)
    extras[key] = round(
        _latency_ms(
            lambda: bench.block(bench.operate(h)), lambda o: 0, reps=5
        ),
        2,
    )


def logreg_offline(extras, poly: int, key: str):
    """CKKS logreg Offline samples/s with the reference's default batch
    of 100 (the constant behind the flexible registration,
    include/benchmarks/ckks/seal_ckks_logreg_horner.h:24; offline
    data_count {1,1,batch} src/benchmarks/ckks/seal_ckks_logreg_horner.cpp:38-45).
    At poly=32768 the depth-6 chain's 881-bit HE-standard budget admits a
    3-prime special modulus and the auto ladder selects G=3 grouped
    digits (params._resolve_digit_group); the dots-stage HBM chunking
    (models/logreg.py) keeps batch-100 feasible."""
    batch = 100
    bench = _engine_bench("LOGREG_POLY_D3", "OFFLINE", "CKKS",
                          {"poly_modulus_degree": poly, "batch_size": batch})
    n = bench.params["n"]
    rng = np.random.default_rng(1234)
    w = rng.uniform(-1, 1, n)
    b = float(rng.uniform(-1, 1))
    x = rng.uniform(-1, 1, (batch, n))
    h = bench.load(bench.encrypt(bench.encode([w, b, x])))
    (got,) = bench.decode(bench.decrypt(bench.store(bench.operate(h))))
    z = x @ w + b
    _gate(key, got, 0.5 + 0.15012 * z - 0.0015930078125 * z**3, 5e-4)
    _record_describe(bench, key)
    sec_per_batch = (
        _latency_ms(lambda: bench.block(bench.operate(h)), lambda o: 0, reps=5)
        / 1e3
    )
    extras[key] = round(batch / sec_per_batch, 1)


# Every metric key this bench version can produce (completeness basis
# for record promotion — see _more_complete).
CURRENT_METRIC_KEYS = frozenset(
    {
        "ckks_rotate_per_sec_n16384",
        "ckks_mult_relin_rescale_per_sec_n16384",
        "ckks_rotate_sum8_per_sec_n16384",
        "bfv_behz_mult_per_sec_n8192",
        "ckks_dot_n100_latency_ms_n8192",
        "ckks_eltwise_mult_offline_samples_per_sec_n8192",
        "ckks_logreg_n16384_latency_ms",
        "ckks_logreg_offline_b100_samples_per_sec_n16384",
        "ckks_logreg_n32768_latency_ms",
        "ckks_logreg_offline_b100_samples_per_sec_n32768",
    }
)


def main() -> None:
    extras = RESULT["extras"]
    t_step = time.monotonic()
    st = headline()
    headline_s = time.monotonic() - t_step
    RESULT["timings"]["headline"] = round(headline_s, 1)
    # Cold-factor calibration: every per-step estimate below is a measured
    # WARM figure; a cold persistent cache inflates compiles roughly
    # uniformly, and the headline (measured either way) exposes the ratio.
    # The factor is RE-calibrated after every completed step as the
    # MINIMUM observed actual/warm ratio: per-step walls carry
    # minute-scale random tunnel stalls (BASELINE.md), so a single step
    # landing at its warm estimate proves the cache is hot and the
    # initial ratio was stall noise, not cold compiles — without this, a
    # stalled headline (observed: 133 s vs the 88 s warm figure) inflates
    # every later estimate 1.5x and over-skips a warm run.
    ratios = [headline_s / WARM_HEADLINE_S]
    factor = _calibrate(ratios)
    RESULT["cold_factor"] = round(factor, 2)
    _emit()  # headline recorded — everything past this point is bonus

    # (metric name, fn, estimated WARM cost in seconds — set at or above
    # the per-step MINIMA across the 2026-08-21 bounded-chunk chip runs
    # (full-budget run + 420 s rehearsal; bench_suite.json `timings`),
    # which bound the warm wall from below; individual walls above the
    # estimate are stall/first-compile noise, which the budget check
    # absorbs by re-checking after every step).  Order is CHEAPEST-FIRST by
    # estimated warm wall so a squeezed budget keeps the most metrics;
    # the key-switch steps reuse the headline's context/keys at pure
    # marginal cost.  The budget check scales each estimate by the
    # calibrated cold factor and keeps checking later steps after a
    # skip; `timings` carries what each step actually took.
    steps = [
        ("ckks_rotate_sum8", lambda: ks_rotate_sum(st, extras), 15.0),
        ("ckks_rotate", lambda: ks_rotate(st, extras), 20.0),
        ("ckks_mult_relin_rescale",
         lambda: ks_mult_relin_rescale(st, extras), 25.0),
        ("ckks_eltwise_mult_offline",
         lambda: eltwise_mult_offline(extras), 30.0),
        ("bfv_behz_mult", lambda: bfv_suite(extras), 35.0),
        ("ckks_dot_n100", lambda: dot_latency(extras), 40.0),
        (
            "ckks_logreg_n16384",
            lambda: logreg_latency(extras, 16384, "ckks_logreg_n16384_latency_ms"),
            95.0,
        ),
        (
            "ckks_logreg_n32768",
            lambda: logreg_latency(extras, 32768, "ckks_logreg_n32768_latency_ms"),
            # warm minimum 105.9 s; the 156 s 2026-08-21 wall included
            # the batched-encrypt graph's first remote compile
            130.0,
        ),
        (
            "ckks_logreg_offline_b100",
            lambda: logreg_offline(
                extras, 16384, "ckks_logreg_offline_b100_samples_per_sec_n16384"
            ),
            # warm minimum 111.8 s (186.9 s run included first compiles)
            140.0,
        ),
        (
            "ckks_logreg_offline_b100_n32768",
            lambda: logreg_offline(
                extras, 32768, "ckks_logreg_offline_b100_samples_per_sec_n32768"
            ),
            205.0,
        ),
    ]
    for name, fn, warm_est in steps:
        if _elapsed() + warm_est * factor > BUDGET_S - RESERVE_S:
            RESULT["skipped"].append(name)
            continue  # no per-skip emit: one final emit carries them all
        t_step = time.monotonic()
        try:
            fn()
        except SystemExit:
            raise
        except Exception as e:  # record, keep the headline alive
            RESULT["skipped"].append(f"{name}: {type(e).__name__}: {e}")
        step_s = time.monotonic() - t_step
        RESULT["timings"][name] = round(step_s, 1)
        ratios.append(step_s / warm_est)
        factor = _calibrate(ratios)
        RESULT["cold_factor"] = round(factor, 2)
        _emit()
    if RESULT["skipped"]:
        _emit()


if __name__ == "__main__":
    main()
