"""Typed handle validation at pipeline entries (models/base.py
check_handle): the counterpart of the reference's tag-checked
``retrieveFromHandle`` + indexer validation (/root/reference
src/benchmarks/ckks/seal_ckks_matmultval_benchmark.cpp:437-461,
…/seal_ckks_logreg_horner.cpp:401-402) — a wrong handle fed to a step
must die with the typed invalid-argument error, not an arbitrary
AttributeError downstream.  Also covers the NumThreads flexible-param
parity (parsed, resolved like the reference, informational here)."""

import json

import numpy as np
import pytest

from reference_seal_backend_tpu.engine import capi
from reference_seal_backend_tpu.engine.registry import Engine
from reference_seal_backend_tpu.models.base import Handle, InvalidHandleError

TINY = {"poly_modulus_degree": 2048, "n": 64, "sec_level": 0}


@pytest.fixture(scope="module")
def engine():
    return Engine()


@pytest.fixture(scope="module")
def eltwise(engine):
    return engine.create_benchmark(
        engine.find("ckks_eltwise_add_latency"), dict(TINY)
    )


def _encoded(bench):
    rng = np.random.default_rng(0)
    return bench.encode([rng.uniform(-1, 1, (1, 64)) for _ in range(2)])


def test_wrong_stage_rejected(eltwise):
    h = _encoded(eltwise)  # an "eltwise_pt" handle
    with pytest.raises(InvalidHandleError, match="eltwise_ct"):
        eltwise.operate(h)
    with pytest.raises(InvalidHandleError, match="eltwise_result"):
        eltwise.store(h)
    with pytest.raises(InvalidHandleError, match="eltwise_result"):
        eltwise.decrypt(h)
    with pytest.raises(InvalidHandleError, match="eltwise_clear"):
        eltwise.decode(h)


def test_wrong_family_rejected(engine, eltwise):
    dot = engine.create_benchmark(
        engine.find("ckks_dot_product_latency"), dict(TINY, n=16)
    )
    h = dot.encrypt(_encoded_dot(dot))
    with pytest.raises(InvalidHandleError, match="expected a 'eltwise_ct'"):
        eltwise.load(h)


def _encoded_dot(dot):
    rng = np.random.default_rng(1)
    return dot.encode([rng.uniform(-1, 1, (1, 16)) for _ in range(2)])


def test_non_handle_rejected(eltwise):
    with pytest.raises(InvalidHandleError, match="expected a pipeline Handle"):
        eltwise.encrypt({"not": "a handle"})


def test_wrong_arity_rejected(eltwise):
    pt = _encoded(eltwise)
    bad = Handle(tag=pt.tag, payload=(pt.payload[0],))
    with pytest.raises(InvalidHandleError, match="1 operands, expected 2"):
        eltwise.encrypt(bad)


def test_happy_path_passes_validation(eltwise):
    h = eltwise.load(eltwise.encrypt(_encoded(eltwise)))
    out = eltwise.decode(eltwise.decrypt(eltwise.store(eltwise.operate(h))))
    assert len(out) == 1


def test_capi_surfaces_typed_error():
    """Feeding a pt handle to operate through the C-ABI id surface returns
    the sentinel with the typed error readable via last_error — not a
    crash, matching the bridge's HEBENCH_ECODE_INVALID_ARGS contract."""
    eid = capi.engine_create()
    bid = capi.benchmark_create(
        eid, "ckks_eltwise_add_latency", json.dumps(TINY)
    )
    assert bid > 0, capi.last_error()
    rng = np.random.default_rng(3)
    h = capi.benchmark_encode(
        bid,
        json.dumps([[rng.uniform(-1, 1, 64).tolist()],
                    [rng.uniform(-1, 1, 64).tolist()]]),
    )
    assert h > 0
    assert capi.benchmark_operate(bid, h) < 0
    assert "InvalidHandleError" in capi.last_error()
    capi.benchmark_destroy(bid)
    capi.engine_destroy(eid)


def test_capi_engine_init_data():
    """createEngine(p_buffer, size) parity: opaque init bytes accepted and
    recorded (the reference ignores them, seal_engine.cpp:38-40); non-byte
    data is a typed sentinel error."""
    eid = capi.engine_create(b"\x01\x02\x03")
    assert eid > 0
    assert capi._engines[eid].init_data == b"\x01\x02\x03"
    capi.engine_destroy(eid)
    assert capi.engine_create(12345) < 0
    assert "bytes" in capi.last_error()


def test_num_threads_resolution(engine):
    """NumThreads is parsed and resolved like the reference (0 -> machine
    default with a Latency override to 1,
    …seal_ckks_element_wise_benchmark.cpp:134-141), then reported in the
    description; it never gates execution (batching is a jitted axis)."""
    lat = engine.create_benchmark(
        engine.find("ckks_eltwise_add_latency"), dict(TINY, num_threads=8)
    )
    assert lat.num_threads == 1  # Latency forces one thread
    off = engine.create_benchmark(
        engine.find("ckks_eltwise_add_offline"), dict(TINY, num_threads=4)
    )
    assert off.num_threads == 4
    off0 = engine.create_benchmark(
        engine.find("ckks_eltwise_add_offline"), dict(TINY)
    )
    assert off0.num_threads >= 1  # 0/absent -> machine default
    assert lat.describe()["num_threads"] == "1"
