"""In-process coverage of the C-ABI bridge functions (engine/capi.py):
the full 7-step pipeline over JSON/ids, plus the error sentinel surface —
the same calls the native shim makes, without the embedding layer
(tests/test_native.py covers that end)."""

import json

import numpy as np

from reference_seal_backend_tpu.engine import capi


def test_capi_seven_step_pipeline():
    eid = capi.engine_create()
    assert eid > 0
    assert capi.engine_benchmark_count(eid) == 20
    bid = capi.benchmark_create(
        eid,
        "ckks_eltwise_add_latency",
        json.dumps({"poly_modulus_degree": 2048, "n": 64, "sec_level": 0}),
    )
    assert bid > 0, capi.last_error()
    rng = np.random.default_rng(5)
    a = rng.uniform(-1, 1, 64)
    b = rng.uniform(-1, 1, 64)
    h = capi.benchmark_encode(bid, json.dumps([[a.tolist()], [b.tolist()]]))
    assert h > 0, capi.last_error()
    for step in ("encrypt", "load", "operate", "store", "decrypt"):
        h = getattr(capi, f"benchmark_{step}")(bid, h)
        assert h > 0, (step, capi.last_error())
    outs = json.loads(capi.benchmark_decode(bid, h))
    got = np.asarray(outs[0]).reshape(-1)[:64]
    np.testing.assert_allclose(got, a + b, atol=5e-4)
    capi.benchmark_destroy(bid)
    capi.engine_destroy(eid)


def test_capi_error_sentinels():
    eid = capi.engine_create()
    bad = capi.benchmark_create(eid, "no_such_benchmark", "")
    assert bad < 0
    assert "no_such_benchmark" in capi.last_error()
    assert capi.engine_benchmark_name(eid, 999) == ""
    capi.engine_destroy(eid)
