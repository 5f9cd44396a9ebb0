"""YAML configuration tier: the reference CI's dump → sed → re-run recipe
(/root/reference .github/workflows/cmake.yml:45-48) reproduced against the
runner: ``--config_file cfg.yaml --dump`` writes the 20-descriptor default
config, a text edit shrinks the offline sample size, and the subsequent
run executes the edited configuration."""

import yaml

from reference_seal_backend_tpu.engine import runner


def test_dump_writes_all_20_defaults(tmp_path):
    cfg_path = tmp_path / "config.yaml"
    assert runner.main(["--config_file", str(cfg_path), "--dump"]) == 0
    cfg = yaml.safe_load(cfg_path.read_text())
    assert cfg["default_sample_size"] == 0
    assert cfg["random_seed"] == 1234
    names = [e["name"] for e in cfg["benchmark"]]
    assert len(names) == 20 and len(set(names)) == 20
    lr = next(
        e for e in cfg["benchmark"]
        if e["name"] == "ckks_logistic_regression_poly_d3_latency"
    )
    assert lr["params"]["poly_modulus_degree"] == 16384
    assert lr["params"]["mult_depth"] == 6


def test_ci_recipe_dump_sed_rerun(tmp_path):
    """dump → sed default_sample_size 0→3 → run, with per-benchmark param
    overrides applied from the config (the reference CI contract)."""
    cfg_path = tmp_path / "config.yaml"
    runner.main(["--config_file", str(cfg_path), "--dump"])

    # the CI's sed -i 's/default_sample_size: 0/default_sample_size: 3/g'
    text = cfg_path.read_text().replace(
        "default_sample_size: 0", "default_sample_size: 3"
    )
    cfg = yaml.safe_load(text)
    # shrink to a CI-speed subset at tiny N (insecure test params need the
    # explicit opt-out, threaded through the config's params tier)
    keep = {"ckks_eltwise_add_offline", "bfv_eltwise_mult_latency"}
    cfg["benchmark"] = [e for e in cfg["benchmark"] if e["name"] in keep]
    for e in cfg["benchmark"]:
        e["params"].update(
            {"poly_modulus_degree": 2048, "n": 64, "sec_level": 0}
        )
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))

    rc = runner.main(
        ["--config_file", str(cfg_path),
         "--report_root_path", str(tmp_path / "r")]
    )
    assert rc == 0
    summary = (tmp_path / "r" / "summary.csv").read_text()
    assert summary.splitlines()[1] == "2,0"


def test_config_sample_size_honored(tmp_path):
    """default_sample_size from the config drives the offline batch."""
    cfg_path = tmp_path / "config.yaml"
    cfg = {
        "default_sample_size": 2,
        "random_seed": 77,
        "benchmark": [
            {
                "name": "ckks_eltwise_add_offline",
                "params": {
                    "poly_modulus_degree": 2048,
                    "n": 32,
                    "mult_depth": 2,
                    "sec_level": 0,
                },
            }
        ],
    }
    cfg_path.write_text(yaml.safe_dump(cfg))
    names, per_benchmark, seed, min_ms = runner.load_config(str(cfg_path))
    # absent/zero default_min_test_time -> None (defer to each
    # descriptor's registered min_test_time_ms)
    assert seed == 77 and min_ms is None
    assert per_benchmark["ckks_eltwise_add_offline"]["sample_size"] == 2
    results = runner.run_all(
        names, seed=seed, per_benchmark=per_benchmark, verbose=False
    )
    assert results[0].passed
    # offline cross product: 2 x 2 samples -> 4 results validated
    assert results[0].iterations >= 1
