"""C-ABI bridge surface: flat functions the native shim calls.

The reference backend is consumed as a shared library through the HEBench
API Bridge C ABI (engine create/destroy + benchmark lifecycle +
encode/encrypt/load/operate/store/decrypt/decode, /root/reference
src/engine/seal_engine.cpp:36-83 and SURVEY.md §1 L1).  The TPU framework
keeps that runtime shape: ``native/`` builds ``librsb_tpu_backend.so`` —
a C++ shim embedding CPython — whose exported C functions land here.

Design notes:
* All objects cross the ABI as opaque int64 ids (the analogue of the
  bridge's ``Handle`` laundering, minus the raw pointers).
* Cleartext crosses as JSON (encode inputs, decode outputs).  Only the
  *untimed* pipeline ends carry data — ``operate`` moves ids only — so
  JSON costs nothing where timing matters.
* Errors never propagate as Python exceptions across the ABI: every entry
  point returns a sentinel (<0 / empty) and stores the message for
  ``last_error`` (the analogue of HEBenchError codes + engine error
  registry, src/engine/seal_engine.cpp:97).
"""

from __future__ import annotations

import itertools
import json
import traceback
from typing import Any, Dict

import numpy as np

_ids = itertools.count(1)
_engines: Dict[int, Any] = {}
_benchmarks: Dict[int, Any] = {}
_handles: Dict[int, Any] = {}
_last_error: str = ""


def last_error() -> str:
    return _last_error


def _fail(exc: BaseException) -> int:
    global _last_error
    _last_error = "".join(
        traceback.format_exception_only(type(exc), exc)
    ).strip()
    return -1


def engine_create(init_data: bytes = b"") -> int:
    """``init_data`` mirrors the API Bridge's ``createEngine(p_buffer,
    size)`` opaque init bytes — accepted and recorded but not interpreted,
    exactly like the reference (/root/reference
    src/engine/seal_engine.cpp:38-40 ignores them)."""
    try:
        if not isinstance(init_data, (bytes, bytearray, memoryview)):
            raise TypeError(
                f"engine init data must be bytes, got {type(init_data).__name__}"
            )
        from reference_seal_backend_tpu.utils import jaxcfg

        jaxcfg.setup()
        from reference_seal_backend_tpu.engine.registry import Engine

        eid = next(_ids)
        engine = Engine()
        engine.init_data = bytes(init_data)
        _engines[eid] = engine
        return eid
    except BaseException as e:  # noqa: BLE001 — must not cross the ABI
        return _fail(e)


def engine_destroy(eid: int) -> int:
    _engines.pop(eid, None)
    return 0


def engine_benchmark_count(eid: int) -> int:
    try:
        return len(_engines[eid].descriptors)
    except BaseException as e:  # noqa: BLE001
        return _fail(e)


def engine_benchmark_name(eid: int, i: int) -> str:
    try:
        return _engines[eid].descriptors[i].name
    except BaseException:  # noqa: BLE001
        return ""


def engine_benchmark_descriptor(eid: int, i: int) -> str:
    """Full descriptor as JSON — the analogue of the reference's
    ``hebench::APIBridge::BenchmarkDescriptor`` POD the harness reads
    through the C ABI (workload/category/scheme/security/other plus the
    registered ``cat_params``: warmup_iterations_count, min_test_time_ms,
    offline data_count — e.g. /root/reference
    src/benchmarks/ckks/seal_ckks_element_wise_benchmark.cpp:31-45)."""
    try:
        d = _engines[eid].descriptors[i]
        return json.dumps(
            {
                "name": d.name,
                "workload": d.workload.value,
                "scheme": d.scheme.value,
                "category": d.category.value,
                "other": d.other,
                "data_type": d.data_type,
                "security": d.security,
                "default_params": dict(d.default_params),
                "cat_params": {
                    "warmup_iterations_count": d.warmup_iterations,
                    "min_test_time_ms": d.min_test_time_ms,
                    "data_count": list(d.default_data_count),
                },
            }
        )
    except BaseException:  # noqa: BLE001
        return ""


def benchmark_create(eid: int, name: str, params_json: str) -> int:
    try:
        engine = _engines[eid]
        params = json.loads(params_json) if params_json else None
        bench = engine.create_benchmark(engine.find(name), params)
        bid = next(_ids)
        _benchmarks[bid] = bench
        return bid
    except BaseException as e:  # noqa: BLE001
        return _fail(e)


def benchmark_destroy(bid: int) -> int:
    _benchmarks.pop(bid, None)
    return 0


def handle_destroy(hid: int) -> int:
    _handles.pop(hid, None)
    return 0


def _store_handle(h) -> int:
    hid = next(_ids)
    _handles[hid] = h
    return hid


def _step(bid: int, hid: int, step: str) -> int:
    try:
        bench = _benchmarks[bid]
        out = getattr(bench, step)(_handles[hid])
        if step == "operate":
            bench.block(out)
        return _store_handle(out)
    except BaseException as e:  # noqa: BLE001
        return _fail(e)


def benchmark_encode(bid: int, inputs_json: str) -> int:
    try:
        bench = _benchmarks[bid]
        inputs = [np.asarray(x) for x in json.loads(inputs_json)]
        return _store_handle(bench.encode(inputs))
    except BaseException as e:  # noqa: BLE001
        return _fail(e)


def benchmark_encrypt(bid: int, hid: int) -> int:
    return _step(bid, hid, "encrypt")


def benchmark_load(bid: int, hid: int) -> int:
    return _step(bid, hid, "load")


def benchmark_operate(bid: int, hid: int) -> int:
    return _step(bid, hid, "operate")


def benchmark_store(bid: int, hid: int) -> int:
    return _step(bid, hid, "store")


def benchmark_decrypt(bid: int, hid: int) -> int:
    return _step(bid, hid, "decrypt")


def benchmark_decode(bid: int, hid: int) -> str:
    try:
        bench = _benchmarks[bid]
        outs = bench.decode(_handles[hid])
        return json.dumps(
            [np.asarray(np.real(o), dtype=np.float64).tolist() for o in outs]
        )
    except BaseException as e:  # noqa: BLE001
        _fail(e)
        return ""
