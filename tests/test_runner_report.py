"""Runner report artifacts: report.csv / summary.csv / descriptions.csv
(the reference harness's quickstart artifacts + the backend's
getBenchmarkDescription / printContextInfo fragments)."""

import csv
import os

from reference_seal_backend_tpu.engine.runner import run_all


def test_report_files_and_descriptions(tmp_path):
    results = run_all(
        ["ckks_eltwise_add_latency"],
        seed=1234,
        report_dir=str(tmp_path),
        params={"poly_modulus_degree": 2048, "sec_level": 0},
        verbose=False,
    )
    assert len(results) == 1 and results[0].passed
    d = results[0].description
    assert d["poly_modulus_degree"] == "2048"
    assert d["scheme"] == "CKKS"
    # security is computed, never asserted: the tiny test modulus exceeds
    # the HE-standard 128-bit bound for N=2048 and must say so.
    assert d["security"].startswith("none")
    assert "|" in d["coeff_modulus_chain_bits"]

    for name in ("report.csv", "summary.csv", "descriptions.csv"):
        assert os.path.exists(os.path.join(tmp_path, name)), name
    with open(os.path.join(tmp_path, "summary.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["total", "failed"]
    assert rows[1] == ["1", "0"]
    with open(os.path.join(tmp_path, "descriptions.csv")) as f:
        rows = list(csv.reader(f))
    assert "poly_modulus_degree" in rows[0]
    assert rows[1][0] == "ckks_eltwise_add_latency"
