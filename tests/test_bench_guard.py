"""bench.py record-preservation logic and the jit_with_keys reentrancy
guard (VERDICT r3 items 2 and 10) — both pure-CPU, no chip."""

import json
import os

import numpy as np
import pytest


def _load_bench():
    import importlib
    import bench

    return bench


class TestMoreComplete:
    def test_no_headline_never_overwrites(self):
        bench = _load_bench()
        assert not bench._more_complete({"value": None, "extras": {}}, {})

    def test_first_record_wins_over_nothing(self):
        bench = _load_bench()
        assert bench._more_complete({"value": 1.0, "extras": {}}, {})
        assert bench._more_complete({"value": 1.0, "extras": {}}, {"bad": 1})

    def test_partial_cannot_clobber_full(self):
        bench = _load_bench()
        k = sorted(bench.CURRENT_METRIC_KEYS)
        full = {"value": 1.0, "extras": {k[0]: 1, k[1]: 2, k[2]: 3}}
        partial = {"value": 2.0, "extras": {k[0]: 9}}
        assert not bench._more_complete(partial, full)
        assert bench._more_complete(full, partial)

    def test_superset_promotes(self):
        bench = _load_bench()
        k = sorted(bench.CURRENT_METRIC_KEYS)
        old = {"value": 1.0, "extras": {k[0]: 1, k[1]: 2}}
        new = {"value": 2.0, "extras": {k[0]: 5, k[1]: 6, k[2]: 7}}
        assert bench._more_complete(new, old)
        assert bench._more_complete(new, new)

    def test_retired_keys_do_not_block_promotion(self):
        """A committed record carrying a renamed/retired metric key must
        not block every future promotion (ADVICE r4): completeness is
        judged on the keys the CURRENT bench version can produce."""
        bench = _load_bench()
        k = sorted(bench.CURRENT_METRIC_KEYS)
        old = {"value": 1.0, "extras": {k[0]: 1, "retired_metric_v0": 2}}
        new = {"value": 2.0, "extras": {k[0]: 5}}
        assert bench._more_complete(new, old)
        # but missing a still-current committed key keeps blocking
        old2 = {"value": 1.0, "extras": {k[0]: 1, k[1]: 2}}
        assert not bench._more_complete(new, old2)

    def test_force_promote_env(self, monkeypatch):
        bench = _load_bench()
        k = sorted(bench.CURRENT_METRIC_KEYS)
        full = {"value": 1.0, "extras": {k[0]: 1, k[1]: 2}}
        partial = {"value": 2.0, "extras": {}}
        assert not bench._more_complete(partial, full)
        monkeypatch.setenv("RSB_TPU_BENCH_FORCE_PROMOTE", "1")
        assert bench._more_complete(partial, full)

    def test_emit_preserves_full_record_on_disk(self, tmp_path, monkeypatch):
        bench = _load_bench()
        k = sorted(bench.CURRENT_METRIC_KEYS)
        monkeypatch.chdir(tmp_path)
        full = {
            "metric": "m",
            "value": 100.0,
            "extras": {k[0]: 1, k[1]: 2},
        }
        with open("bench_suite.json", "w") as f:
            json.dump(full, f)
        saved = dict(bench.RESULT)
        try:
            bench.RESULT.update(
                {"value": 50.0, "extras": {k[0]: 9}, "skipped": [k[1]]}
            )
            bench._emit()
        finally:
            bench.RESULT.clear()
            bench.RESULT.update(saved)
        with open("bench_suite.json") as f:
            on_disk = json.load(f)
        assert on_disk == full  # partial run left the full record intact
        with open("bench_suite.latest.json") as f:
            latest = json.load(f)
        assert latest["value"] == 50.0  # the run's own state still recorded


def test_cold_factor_calibration():
    """The skip-budget factor takes the MINIMUM observed ratio (one step
    at its warm estimate proves the cache is hot), floored at 1, capped
    at 25 — a stalled headline must not inflate later estimates once a
    cheap step lands warm."""
    bench = _load_bench()
    assert bench._calibrate([1.5]) == 1.5          # stalled headline alone
    assert bench._calibrate([1.5, 1.07]) == 1.07   # one near-warm step
    assert bench._calibrate([1.5, 0.8]) == 1.0     # floor at warm
    assert bench._calibrate([80.0]) == 25.0        # cold-cache cap
    assert bench._calibrate([3.0, 2.5, 2.8]) == 2.5  # genuinely cold


def test_jit_with_keys_reentrancy_guard():
    """A second concurrent trace of the same benchmark raises cleanly
    instead of corrupting the keys/ev swap (models/base.py
    jit_with_keys single-trace assumption)."""
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
        if d.workload is Workload.ELTWISE_ADD
        and d.category is Category.LATENCY
        and d.scheme is Scheme.CKKS
    )
    bench = engine.create_benchmark(
        desc, {"poly_modulus_degree": 1024, "sec_level": 0, "n": 16}
    )
    rng = np.random.default_rng(0)
    h = bench.load(
        bench.encrypt(
            bench.encode([rng.uniform(-1, 1, (1, 16)) for _ in range(2)])
        )
    )
    # simulate an in-flight trace of this same benchmark object
    bench._in_key_trace = True
    with pytest.raises(Exception, match="concurrent jit_with_keys"):
        bench.operate(h)
    bench._in_key_trace = False
    out = bench.decode(bench.decrypt(bench.store(bench.operate(h))))
    assert len(out) == 1
