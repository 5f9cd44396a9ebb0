"""Native C-ABI shim tests.

Exercises the same runtime seam the reference exposes as its plugin
shared library (SURVEY.md §1 L1-L2): engine factory, benchmark registry,
and the 7-step pipeline crossing a C ABI backed by embedded CPython.

The pipeline is driven through the standalone ``rsb_native_harness``
binary in a subprocess — the realistic embedding path (and isolated from
the test runner: an embedding bug cannot take pytest down with it).
In-process ctypes coverage is limited to the registry surface, which
stays off the JAX compile path (XLA compilation inside a ctypes call
deadlocks under pytest's runner).
"""

import ctypes
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")
BUILD = os.path.join(NATIVE, "build")
LIB = os.path.join(BUILD, "librsb_tpu_backend.so")
HARNESS = os.path.join(BUILD, "rsb_native_harness")

def _env():
    import numpy

    site = os.path.dirname(os.path.dirname(numpy.__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{site}"
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.fixture(scope="module")
def built():
    if shutil.which("cmake") is None:
        pytest.skip("cmake not available")
    if not (os.path.exists(LIB) and os.path.exists(HARNESS)):
        gen = ["-G", "Ninja"] if shutil.which("ninja") else []
        subprocess.run(
            ["cmake", "-S", NATIVE, "-B", BUILD, "-DCMAKE_BUILD_TYPE=Release"]
            + gen,
            check=True,
            capture_output=True,
        )
        subprocess.run(
            ["cmake", "--build", BUILD], check=True, capture_output=True
        )
    return BUILD


def test_harness_end_to_end(built):
    """Full 7-step pipeline through the C ABI: seeded inputs, C++-side
    ground truth, 'Failed: 0' contract."""
    r = subprocess.run(
        [HARNESS, "--poly", "2048", "--n", "64"],
        env=_env(),
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert "[ Info    ] Failed: 0" in r.stdout, (r.stdout, r.stderr[-2000:])
    assert r.returncode == 0


def test_harness_full_registry(built):
    """Every one of the 20 registered benchmarks crosses the C ABI —
    BFV exact-integer compares, matmult packings and logreg included —
    like the reference harness driving every registered descriptor
    (/root/reference README.md:103-105)."""
    r = subprocess.run(
        [HARNESS, "--all", "--poly", "2048"],
        env=_env(),
        capture_output=True,
        text=True,
        timeout=2700,
    )
    assert "[ Info    ] Total: 20" in r.stdout, (r.stdout, r.stderr[-2000:])
    assert "[ Info    ] Failed: 0" in r.stdout, (r.stdout, r.stderr[-2000:])
    assert r.returncode == 0


def test_harness_error_surface(built):
    r = subprocess.run(
        [HARNESS, "--poly", "2048", "no_such_benchmark"],
        env=_env(),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 1
    assert "Failed: 1" in r.stdout
    assert "no_such_benchmark" in r.stderr


def test_registry_in_process(built):
    lib = ctypes.CDLL(LIB)
    lib.rsbtpu_initialize.restype = ctypes.c_int
    lib.rsbtpu_engine_create.restype = ctypes.c_int64
    lib.rsbtpu_benchmark_count.restype = ctypes.c_int64
    lib.rsbtpu_benchmark_name.restype = ctypes.c_int64
    lib.rsbtpu_benchmark_name.argtypes = [
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_char_p,
        ctypes.c_int64,
    ]
    assert lib.rsbtpu_initialize() == 0
    eng = lib.rsbtpu_engine_create()
    assert eng > 0
    assert lib.rsbtpu_benchmark_count(eng) == 20
    names = set()
    for i in range(20):
        buf = ctypes.create_string_buffer(128)
        assert lib.rsbtpu_benchmark_name(eng, i, buf, 128) > 0
        names.add(buf.value.decode())
    assert "ckks_logistic_regression_poly_d3_latency" in names
    assert len(names) == 20

    # Full descriptor POD through the ABI (reference BenchmarkDescriptor
    # incl. cat_params, seal_ckks_element_wise_benchmark.cpp:31-45)
    import json as _json

    lib.rsbtpu_benchmark_descriptor.restype = ctypes.c_int64
    lib.rsbtpu_benchmark_descriptor.argtypes = [
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_char_p,
        ctypes.c_int64,
    ]
    buf = ctypes.create_string_buffer(4096)
    assert lib.rsbtpu_benchmark_descriptor(eng, 0, buf, 4096) > 0
    d = _json.loads(buf.value.decode())
    assert d["workload"] and d["scheme"] in ("ckks", "bfv")
    assert d["security"] == "128 bits"
    cp = d["cat_params"]
    assert cp["warmup_iterations_count"] == 1
    assert "min_test_time_ms" in cp and "data_count" in cp
    assert d["default_params"]["poly_modulus_degree"] in (8192, 16384)


def test_api_version_check(built):
    """Version gate semantics: major/minor exact, revision >= required
    (the reference createEngine rule, src/engine/seal_engine.cpp:41-54)."""
    lib = ctypes.CDLL(LIB)
    lib.rsbtpu_api_version_check.restype = ctypes.c_int
    lib.rsbtpu_api_version_check.argtypes = [ctypes.c_int] * 3
    assert lib.rsbtpu_api_version_check(1, 0, 0) == 0
    assert lib.rsbtpu_api_version_check(2, 0, 0) < 0   # major mismatch
    assert lib.rsbtpu_api_version_check(1, 1, 0) < 0   # minor mismatch
    assert lib.rsbtpu_api_version_check(1, 0, 99) < 0  # need newer revision
