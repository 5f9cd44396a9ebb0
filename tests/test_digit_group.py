"""Digit-grouped hybrid key switching (schemes/params.py Context
docstring): grouped digits must decrypt correctly under every key-switch
consumer, the auto-resolution must respect the HE-standard budget, and
the descriptor timing attributes must round-trip through the YAML tier.

Role-equivalent of the decomposition-count knob in SEAL's key-switching
keys that the reference leans on for every relinearize/rotate
(/root/reference src/engine/seal_context.cpp:46-70).
"""

import numpy as np
import pytest

from reference_seal_backend_tpu.evaluator.eval import Evaluator
from reference_seal_backend_tpu.schemes import bfv, ckks, keys as keys_mod
from reference_seal_backend_tpu.schemes.params import (
    make_bfv_context,
    make_ckks_context,
)

N = 2048
EPS = 5e-5


@pytest.fixture(scope="module")
def g2():
    """CKKS context with explicit digit_group=2 plus full keys."""
    ctx = make_ckks_context(
        poly_modulus_degree=N, mult_depth=2, sec_level=0, digit_group=2
    )
    ks = keys_mod.keygen(
        ctx,
        seed=11,
        galois_elts=(pow(5, 1, 2 * ctx.n), pow(5, 2, 2 * ctx.n)),
        need_relin=True,
    )
    enc = ckks.CkksEncoder(ctx)
    er = ckks.CkksEncryptor(ctx, ks, seed=11)
    de = ckks.CkksDecryptor(ctx, ks)
    rng = np.random.default_rng(7)
    va = rng.uniform(-1, 1, ctx.slots)
    vb = rng.uniform(-1, 1, ctx.slots)
    ca = er.encrypt_pt(enc.encode(va))
    cb = er.encrypt_pt(enc.encode(vb))
    return ctx, ks, de, va, vb, ca, cb


def test_grouped_layout(g2):
    ctx, ks, *_ = g2
    assert ctx.digit_group == 2
    assert ctx.n_special == 2
    n_dig = ctx.dig_count(ctx.L)
    assert n_dig == -(-ctx.L // 2)
    # keys carry one row block per digit over the full basis
    nf = ctx.L + ctx.n_special
    assert ks.relin.b.shape == (n_dig, nf, ctx.n)
    assert ks.relin.a.shape == (n_dig, nf, ctx.n)


def test_grouped_relinearize(g2):
    ctx, ks, de, va, vb, ca, cb = g2
    ev = Evaluator(ctx, ks)
    out = ev.rescale_to_next(ev.relinearize(ev.multiply(ca, cb)))
    got = np.real(de.decrypt(out))
    assert np.max(np.abs(got - va * vb)) < EPS


def test_grouped_rotate(g2):
    ctx, ks, de, va, vb, ca, cb = g2
    ev = Evaluator(ctx, ks)
    got = np.real(de.decrypt(ev.rotate(ca, 1)))
    assert np.max(np.abs(got - np.roll(va, -1))) < EPS


def test_grouped_rotate_sum_hoisted(g2):
    ctx, ks, de, va, vb, ca, cb = g2
    ev = Evaluator(ctx, ks)
    got = np.real(de.decrypt(ev.rotate_sum(ca, [0, 1, 2])))
    want = va + np.roll(va, -1) + np.roll(va, -2)
    assert np.max(np.abs(got - want)) < 3 * EPS


def test_grouped_at_low_level(g2):
    """Key switch after rescale: odd live-limb count exercises the
    partial top digit group (per-level lift tables)."""
    ctx, ks, de, va, vb, ca, cb = g2
    ev = Evaluator(ctx, ks)
    low = ev.rescale_to_next(ev.relinearize(ev.multiply(ca, cb)))
    assert low.level < ctx.L  # rescale dropped a group
    got = np.real(de.decrypt(ev.rotate(low, 1)))
    assert np.max(np.abs(got - np.roll(va * vb, -1))) < EPS


def test_grouped_under_jit_no_tracer_leak(g2):
    """digit_tables is first populated INSIDE a jit trace here: the cached
    lift constants must be concrete (a leaked tracer would blow up the
    second, differently-shaped trace) — regression for the chip-only
    UnexpectedTracerError the eager CPU tests missed."""
    import jax

    ctx, ks, de, va, vb, ca, cb = g2
    ctx._digit_tables.clear()
    ev = Evaluator(ctx, ks)
    out = jax.jit(lambda x, y: ev.relinearize(ev.multiply(x, y)))(ca, cb)
    got = np.real(de.decrypt(out))
    assert np.max(np.abs(got - va * vb)) < EPS
    out2 = jax.jit(lambda x: ev.rotate_sum(x, [0, 1]))(ca)
    got2 = np.real(de.decrypt(out2))
    assert np.max(np.abs(got2 - (va + np.roll(va, -1)))) < 2 * EPS


def test_grouped_bfv_exact():
    ctx = make_bfv_context(poly_modulus_degree=N, sec_level=0, digit_group=2)
    assert ctx.digit_group == 2 and ctx.n_special == 2
    ks = keys_mod.keygen(
        ctx, seed=3, galois_elts=(pow(5, 1, 2 * ctx.n),), need_relin=True
    )
    enc = bfv.BfvBatchEncoder(ctx)
    er = bfv.BfvEncryptor(ctx, ks, seed=3)
    de = bfv.BfvDecryptor(ctx, ks)
    ev = Evaluator(ctx, ks)
    rng = np.random.default_rng(5)
    ia = rng.integers(-50, 50, ctx.slots)
    ib = rng.integers(-50, 50, ctx.slots)
    ca = er.encrypt_pt(enc.encode(ia))
    cb = er.encrypt_pt(enc.encode(ib))
    got = de.decrypt(ev.relinearize(ev.multiply(ca, cb)))
    assert np.array_equal(got, ia * ib)
    half = ctx.slots // 2
    got_r = de.decrypt(ev.rotate(ca, 1))
    want_r = np.concatenate(
        [np.roll(ia[:half], -1), np.roll(ia[half:], -1)]
    )
    assert np.array_equal(got_r, want_r)


def test_grouped_g3_ckks():
    """G=3 over a 3-prime special modulus: exercises the multi-prime
    single-shot FBC mod-down at ns=3 and a partial top group (L=6 splits
    3+3; after one rescale l=4 splits 3+1)."""
    ctx = make_ckks_context(
        poly_modulus_degree=N, mult_depth=2, sec_level=0, digit_group=3
    )
    assert ctx.digit_group == 3 and ctx.n_special == 3
    assert ctx.dig_count(ctx.L) == -(-ctx.L // 3)
    ks = keys_mod.keygen(
        ctx, seed=13, galois_elts=(pow(5, 1, 2 * ctx.n),), need_relin=True
    )
    enc = ckks.CkksEncoder(ctx)
    er = ckks.CkksEncryptor(ctx, ks, seed=13)
    de = ckks.CkksDecryptor(ctx, ks)
    ev = Evaluator(ctx, ks)
    rng = np.random.default_rng(17)
    va = rng.uniform(-1, 1, ctx.slots)
    vb = rng.uniform(-1, 1, ctx.slots)
    ca = er.encrypt_pt(enc.encode(va))
    cb = er.encrypt_pt(enc.encode(vb))
    out = ev.rescale_to_next(ev.relinearize(ev.multiply(ca, cb)))
    assert np.max(np.abs(np.real(de.decrypt(out)) - va * vb)) < EPS
    got = np.real(de.decrypt(ev.rotate(out, 1)))
    assert np.max(np.abs(got - np.roll(va * vb, -1))) < EPS
    got2 = np.real(de.decrypt(ev.rotate_sum(ca, [0, 1])))
    assert np.max(np.abs(got2 - (va + np.roll(va, -1)))) < 2 * EPS


def test_grouped_g3_bfv_exact():
    """BFV G=3 with L=4 data limbs: nd=2 with a zero-padded top group
    (pad=2) — the padded-digit path must stay exact."""
    ctx = make_bfv_context(poly_modulus_degree=N, sec_level=0, digit_group=3)
    assert ctx.digit_group == 3 and ctx.n_special == 3
    ks = keys_mod.keygen(ctx, seed=19, need_relin=True)
    enc = bfv.BfvBatchEncoder(ctx)
    er = bfv.BfvEncryptor(ctx, ks, seed=19)
    de = bfv.BfvDecryptor(ctx, ks)
    ev = Evaluator(ctx, ks)
    rng = np.random.default_rng(23)
    ia = rng.integers(-50, 50, ctx.slots)
    ib = rng.integers(-50, 50, ctx.slots)
    ca = er.encrypt_pt(enc.encode(ia))
    cb = er.encrypt_pt(enc.encode(ib))
    got = de.decrypt(ev.relinearize(ev.multiply(ca, cb)))
    assert np.array_equal(got, ia * ib)


def test_p5_order_identity():
    """The power-of-5 orbit order (Context.p5_order): P/Q are inverse
    permutations and φ_{5^s} in p5 coordinates is exactly a roll by s
    within each orbit — the identity Evaluator.rotate_sum's roll path
    rests on (host-only, no jit)."""
    ctx = make_ckks_context(poly_modulus_degree=N, mult_depth=2, sec_level=0)
    P, _, _ = ctx.p5_order()
    n = ctx.n
    half = n // 2
    Q = np.empty(n, dtype=np.int64)
    Q[P] = np.arange(n)
    assert np.array_equal(np.sort(P), np.arange(n))  # a permutation
    for s in (1, 3, half - 1):
        perm = np.asarray(ctx.plan.galois_perm(pow(5, s, 2 * n)))
        x = np.arange(n)
        want = x[perm]                     # (φ x)[i] = x[perm[i]]
        x_p5 = x[P].reshape(2, half)
        rolled = np.roll(x_p5, -s, axis=-1).reshape(n)
        got = rolled[Q]
        assert np.array_equal(got, want), f"s={s}"


def test_auto_resolution_respects_he_standard_budget():
    """Auto digit grouping upgrades only when the extra special prime
    fits the HE-standard 128-bit bound (host-only, no jit)."""
    # N=8192 CKKS depth-2: 164 data bits + 60 special bits > 218 -> G=1
    c8k = make_ckks_context(poly_modulus_degree=8192, mult_depth=2)
    assert c8k.digit_group == 1 and c8k.n_special == 1
    # N=16384: plenty of budget -> G=2
    c16k = make_ckks_context(poly_modulus_degree=16384, mult_depth=2)
    assert c16k.digit_group == 2 and c16k.n_special == 2
    assert c16k.secure_128
    # BFV N=8192: 120 data bits + 60 special bits <= 218 -> G=2
    b8k = make_bfv_context(poly_modulus_degree=8192)
    assert b8k.digit_group == 2 and b8k.n_special == 2
    assert b8k.secure_128
    # sec_level=0 test chains stay ungrouped unless explicitly requested
    tiny = make_ckks_context(poly_modulus_degree=N, mult_depth=2, sec_level=0)
    assert tiny.digit_group == 1 and tiny.n_special == 1
    # N=32768 depth-6 (the staged logreg chain, l=14): the auto ladder
    # climbs to G=3 — the chip-measured best compromise (params.py
    # _resolve_digit_group docstring); G=4's single-rotate regression
    # keeps it out.
    c32k = make_ckks_context(
        poly_modulus_degree=32768, mult_depth=6, scale_bits=50
    )
    assert c32k.digit_group == 3 and c32k.n_special == 3
    assert c32k.secure_128


def test_descriptor_timing_attributes_roundtrip(tmp_path):
    """Per-descriptor warmup/min-test-time/data_count exist, mirror the
    reference's cat_params registration, and round-trip through the YAML
    config tier (dump -> load)."""
    from reference_seal_backend_tpu.engine.descriptor import Category
    from reference_seal_backend_tpu.engine.registry import Engine
    from reference_seal_backend_tpu.engine.runner import (
        dump_config,
        load_config,
    )

    engine = Engine()
    for d in engine.descriptors:
        assert d.warmup_iterations == 1
        if d.category is Category.OFFLINE:
            assert d.min_test_time_ms > 0  # multi-iteration throughput
            assert len(d.default_data_count) >= 2
        else:
            assert d.min_test_time_ms == 0
    lr = next(
        d for d in engine.descriptors
        if d.workload.value.startswith("logistic")
        and d.category is Category.OFFLINE
    )
    assert lr.default_data_count == (1, 1, 0)  # W, b single; X flexible

    cfg = tmp_path / "cfg.yaml"
    dump_config(str(cfg))
    names, per_benchmark, seed, min_ms = load_config(str(cfg))
    assert len(names) == 20 and seed == 1234 and min_ms is None
    for d in engine.descriptors:
        entry = per_benchmark[d.name]
        assert entry["min_test_time_ms"] == float(d.min_test_time_ms)
        assert entry["warmup_iterations"] == d.warmup_iterations
