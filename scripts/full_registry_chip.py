"""Full-registry run at the registered defaults — the reference CI recipe
on the real chip.

Reproduces /root/reference .github/workflows/cmake.yml:43-48 verbatim:
  1. dump the default 20-descriptor configuration (`--dump`),
  2. set ``default_sample_size: 3`` (the CI's sed),
  3. re-run the harness from that config,
and validates the exact CI grep contract (`[ Info    ] Failed: 0`,
validate_testharness_output.sh:7-13) — at every benchmark's REGISTERED
parameters (N=8192/16384, real 128-bit security), which the CPU test tier
cannot afford (VERDICT r2 missing #1).

Writes report.csv / summary.csv / descriptions.csv plus the executed
config under --out (default artifacts/full_registry/), intended to be
committed as the reproducible evidence artifact.

Chip use is sanctioned for this entry point (CLAUDE.md); everything runs
through the persistent compile cache, so re-runs are minutes, not hours.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from reference_seal_backend_tpu.utils import jaxcfg  # noqa: E402

jaxcfg.setup()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="artifacts/full_registry")
    ap.add_argument("--sample_size", type=int, default=3,
                    help="the CI's default_sample_size sed value")
    args = ap.parse_args()

    from reference_seal_backend_tpu.engine import runner

    os.makedirs(args.out, exist_ok=True)
    cfg_path = os.path.join(args.out, "config.yaml")

    # 1) dump the default configuration (the harness --dump step)
    runner.dump_config(cfg_path)
    # 2) the CI's `sed -i 's/default_sample_size: 0/…: 3/'`
    with open(cfg_path) as f:
        cfg_text = f.read()
    cfg_text = re.sub(
        r"^default_sample_size: 0$",
        f"default_sample_size: {args.sample_size}",
        cfg_text,
        flags=re.M,
    )
    with open(cfg_path, "w") as f:
        f.write(cfg_text)

    # 3) re-run from the edited config, all 20 descriptors at their
    #    registered defaults, reports to --out
    names, per_benchmark, seed, min_ms = runner.load_config(cfg_path)
    t0 = time.time()
    results = runner.run_all(
        names,
        seed=seed,
        report_dir=args.out,
        min_test_time_ms=min_ms,
        per_benchmark=per_benchmark,
    )
    wall = time.time() - t0
    failed = sum(1 for r in results if not r.passed)
    with open(os.path.join(args.out, "RUN.md"), "w") as f:
        f.write(
            "# Full-registry run at registered defaults\n\n"
            f"- date: {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}\n"
            f"- backend: real TPU chip (axon)\n"
            f"- recipe: dump -> default_sample_size={args.sample_size} -> "
            "re-run (reference CI, cmake.yml:43-48)\n"
            f"- total: {len(results)}, failed: {failed}, "
            f"wall: {wall:.0f}s\n"
        )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
