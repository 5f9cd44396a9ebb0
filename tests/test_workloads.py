"""End-to-end 7-step pipeline tests for all 11 workload benchmarks.

The reference has no unit tests: its oracle is the external Test Harness
comparing decrypted output against cleartext ground truth computed from
seeded random inputs (SURVEY.md §4).  These tests reproduce that contract
in-process for every workload, at reduced N for speed.
"""

import numpy as np
import pytest

from reference_seal_backend_tpu.engine.descriptor import (
    MATMULT_CIPHERBATCHAXIS,
    MATMULT_ROW,
    MATMULT_VAL,
    BenchmarkDescriptor,
    Category,
    Scheme,
    Workload,
)
from reference_seal_backend_tpu.engine.registry import Engine

RNG = np.random.default_rng(1234)
N_TEST = 2048


@pytest.fixture(scope="module")
def engine():
    return Engine()


def run_pipeline(bench, inputs):
    h = bench.encode(inputs)
    h = bench.encrypt(h)
    h = bench.load(h)
    h = bench.operate(h)
    h = bench.store(h)
    h = bench.decrypt(h)
    return bench.decode(h)


def _make(engine, workload, scheme, category, other=0, **params):
    desc = next(
        d
        for d in engine.descriptors
        if d.workload is workload
        and d.scheme is scheme
        and d.category is category
        and d.other == other
    )
    # Tiny test N needs the explicit insecure-parameters opt-out (the
    # production default refuses it like SEALContext under tc128).
    params.setdefault("sec_level", 0)
    return engine.create_benchmark(desc, params)


# -- eltwise -------------------------------------------------------------- #


@pytest.mark.parametrize("op", [Workload.ELTWISE_ADD, Workload.ELTWISE_MULT])
def test_eltwise_ckks_latency(engine, op):
    n = 100
    bench = _make(
        engine, op, Scheme.CKKS, Category.LATENCY,
        n=n, poly_modulus_degree=N_TEST,
    )
    a = RNG.uniform(-1, 1, (1, n))
    b = RNG.uniform(-1, 1, (1, n))
    (out,) = run_pipeline(bench, [a, b])
    want = (a[0] + b[0]) if op is Workload.ELTWISE_ADD else a[0] * b[0]
    np.testing.assert_allclose(out, want, atol=5e-5)


@pytest.mark.parametrize("op", [Workload.ELTWISE_ADD, Workload.ELTWISE_MULT])
def test_eltwise_bfv_offline(engine, op):
    n = 64
    bench = _make(
        engine, op, Scheme.BFV, Category.OFFLINE,
        n=n, poly_modulus_degree=N_TEST,
    )
    a = RNG.integers(-100, 100, (2, n))
    b = RNG.integers(-100, 100, (3, n))
    outs = run_pipeline(bench, [a, b])
    assert len(outs) == 6  # batch0 x batch1 cross product
    k = 0
    for i in range(2):
        for j in range(3):
            want = a[i] + b[j] if op is Workload.ELTWISE_ADD else a[i] * b[j]
            np.testing.assert_array_equal(outs[k], want)
            k += 1


def test_eltwise_ckks_offline_pairs(engine):
    n = 32
    bench = _make(
        engine, Workload.ELTWISE_MULT, Scheme.CKKS, Category.OFFLINE,
        n=n, poly_modulus_degree=N_TEST,
    )
    a = RNG.uniform(-1, 1, (2, n))
    b = RNG.uniform(-1, 1, (2, n))
    outs = run_pipeline(bench, [a, b])
    np.testing.assert_allclose(outs[1], a[0] * b[1], atol=5e-5)
    np.testing.assert_allclose(outs[2], a[1] * b[0], atol=5e-5)


# -- dot product ---------------------------------------------------------- #


def test_dot_ckks(engine):
    n = 100
    bench = _make(
        engine, Workload.DOT_PRODUCT, Scheme.CKKS, Category.LATENCY,
        n=n, poly_modulus_degree=N_TEST,
    )
    a = RNG.uniform(-1, 1, (1, n))
    b = RNG.uniform(-1, 1, (1, n))
    (out,) = run_pipeline(bench, [a, b])
    np.testing.assert_allclose(out[0], a[0] @ b[0], rtol=1e-6, atol=5e-5)


def test_dot_bfv_column_fold(engine):
    # n > N/2 exercises the rotate_columns fold of accumulateBFV
    n = N_TEST // 2 + 10
    bench = _make(
        engine, Workload.DOT_PRODUCT, Scheme.BFV, Category.LATENCY,
        n=n, poly_modulus_degree=N_TEST,
    )
    a = RNG.integers(-20, 20, (1, n))
    b = RNG.integers(-20, 20, (1, n))
    (out,) = run_pipeline(bench, [a, b])
    assert out[0] == a[0] @ b[0]


def test_dot_bfv_offline(engine):
    n = 50
    bench = _make(
        engine, Workload.DOT_PRODUCT, Scheme.BFV, Category.OFFLINE,
        n=n, poly_modulus_degree=N_TEST,
    )
    a = RNG.integers(-20, 20, (2, n))
    b = RNG.integers(-20, 20, (2, n))
    outs = run_pipeline(bench, [a, b])
    assert len(outs) == 4
    assert outs[3][0] == a[1] @ b[1]


# -- matrix multiply ------------------------------------------------------ #

MM_DIMS = dict(rows_m0=4, cols_m0=3, cols_m1=5)


@pytest.mark.parametrize(
    "variant", [MATMULT_VAL, MATMULT_CIPHERBATCHAXIS, MATMULT_ROW]
)
@pytest.mark.parametrize("scheme", [Scheme.CKKS, Scheme.BFV])
def test_matmult(engine, variant, scheme):
    bench = _make(
        engine, Workload.MATRIX_MULTIPLY, scheme, Category.LATENCY,
        other=variant, poly_modulus_degree=N_TEST, **MM_DIMS,
    )
    if scheme is Scheme.CKKS:
        m0 = RNG.uniform(-1, 1, (4, 3))
        m1 = RNG.uniform(-1, 1, (3, 5))
    else:
        m0 = RNG.integers(-30, 30, (4, 3))
        m1 = RNG.integers(-30, 30, (3, 5))
    (out,) = run_pipeline(bench, [m0, m1])
    want = m0 @ m1
    if scheme is Scheme.CKKS:
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=5e-5)
    else:
        np.testing.assert_array_equal(out, want)


def test_matmult_row_odd_rows_bfv(engine):
    # odd row count exercises the half-filled final BFV row pair
    bench = _make(
        engine, Workload.MATRIX_MULTIPLY, Scheme.BFV, Category.LATENCY,
        other=MATMULT_ROW, poly_modulus_degree=N_TEST,
        rows_m0=3, cols_m0=4, cols_m1=2,
    )
    m0 = RNG.integers(-30, 30, (3, 4))
    m1 = RNG.integers(-30, 30, (4, 2))
    (out,) = run_pipeline(bench, [m0, m1])
    np.testing.assert_array_equal(out, m0 @ m1)


# -- logistic regression -------------------------------------------------- #


def _sigmoid_d3(z):
    return 0.5 + 0.15012 * z - 0.0015930078125 * z**3


def test_logreg_latency(engine):
    n = 16
    bench = _make(
        engine, Workload.LOGREG_POLY_D3, Scheme.CKKS, Category.LATENCY,
        n=n, poly_modulus_degree=N_TEST,
    )
    w = RNG.uniform(-1, 1, n)
    b = 0.3
    x = RNG.uniform(-1, 1, (1, n))
    (out,) = run_pipeline(bench, [w, b, x])
    want = _sigmoid_d3(x @ w + b)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=5e-5)


def test_logreg_offline_batch(engine):
    n = 16
    batch = 4
    bench = _make(
        engine, Workload.LOGREG_POLY_D3, Scheme.CKKS, Category.OFFLINE,
        n=n, poly_modulus_degree=N_TEST, batch_size=batch,
    )
    w = RNG.uniform(-1, 1, n)
    b = -0.2
    x = RNG.uniform(-1, 1, (batch, n))
    (out,) = run_pipeline(bench, [w, b, x])
    want = _sigmoid_d3(x @ w + b)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=5e-5)


def test_logreg_offline_dots_chunking_bit_identical():
    """Offline dots-stage chunking (models/logreg.py operate): the
    batch-100 digit-lift OOMs a 16 GB v5e at N=16384, so big batches run
    the dots stage in equal padded chunks — decode must be bit-identical
    to the unchunked pipeline (chunk boundary + zero-pad rows exercised:
    batch 10, chunk 3 -> 4 chunks of 3 with 2 pad rows)."""
    from reference_seal_backend_tpu.engine.descriptor import (
        Category,
        Workload,
    )
    from reference_seal_backend_tpu.engine.registry import Engine

    engine = Engine()
    desc = next(
        d
        for d in engine.descriptors
        if d.workload is Workload.LOGREG_POLY_D3
        and d.category is Category.OFFLINE
    )
    params = {
        "poly_modulus_degree": 2048,
        "sec_level": 0,
        "n": 16,
        "batch_size": 10,
    }
    rng = np.random.default_rng(7)
    w = rng.uniform(-1, 1, 16)
    b = float(rng.uniform(-1, 1))
    x = rng.uniform(-1, 1, (10, 16))

    def run(bench):
        h = bench.load(bench.encrypt(bench.encode([w, b, x])))
        return bench.decode(bench.decrypt(bench.store(bench.operate(h))))

    (want,) = run(engine.create_benchmark(desc, dict(params, dots_chunk=0)))
    (got,) = run(engine.create_benchmark(desc, dict(params, dots_chunk=3)))
    np.testing.assert_array_equal(got, want)
    z = x @ w + b
    assert np.max(np.abs(got - (0.5 + 0.15012 * z - 0.0015930078125 * z**3))) < 5e-4
