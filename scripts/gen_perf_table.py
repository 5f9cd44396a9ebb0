"""Regenerate README.md's performance table from bench_suite.json.

bench.py writes bench_suite.json (every number behind a correctness
gate); this script rewrites the README between the BENCH_TABLE markers so
the published table is generated, never hand-asserted (VERDICT r1 item 1).

Usage: python scripts/gen_perf_table.py [bench_suite.json] [README.md]
"""

from __future__ import annotations

import json
import sys

ROWS = [
    ("ckks_ctct_mults_per_sec_n16384", "CKKS ct-ct multiply, N=16384",
     "ops/s", "headline (bare evaluator->multiply, the reference eltwise op)"),
    ("ckks_mult_relin_rescale_per_sec_n16384",
     "CKKS multiply+relinearize+rescale, N=16384", "ops/s",
     "the workload multiply path (key-switch-inclusive)"),
    ("ckks_rotate_per_sec_n16384", "CKKS rotate (Galois key switch), N=16384",
     "ops/s", "single rotation, full digit decomposition"),
    ("ckks_rotate_sum8_per_sec_n16384",
     "CKKS hoisted 8-rotation sum, N=16384", "ops/s",
     "one digit-lift + one mod-down shared across 8 rotations"),
    ("bfv_behz_mult_per_sec_n8192", "BFV (BEHZ) ct-ct multiply, N=8192",
     "ops/s", "stacked q∪Bsk base plan"),
    ("ckks_dot_n100_latency_ms_n8192", "CKKS dot product n=100, N=8192",
     "ms", "BSGS accumulate: two hoisted key-switches"),
    ("ckks_eltwise_mult_offline_samples_per_sec_n8192",
     "CKKS eltwise multiply Offline 16x16, N=8192", "samples/s",
     "the reference's Offline category: one jitted graph over the "
     "batch0 x batch1 cross product"),
    ("ckks_logreg_n16384_latency_ms", "CKKS logreg PolyD3 operate, N=16384",
     "ms", "full pipeline: dots -> collapse -> bias -> Horner (depth 6)"),
    ("ckks_logreg_offline_b100_samples_per_sec_n16384",
     "CKKS logreg PolyD3 Offline batch=100, N=16384", "samples/s",
     "reference default batch constant behind the flexible registration"),
    ("ckks_logreg_n32768_latency_ms", "CKKS logreg PolyD3 operate, N=32768",
     "ms", "staged config 5 (BASELINE.md)"),
    ("ckks_logreg_offline_b100_samples_per_sec_n32768",
     "CKKS logreg PolyD3 Offline batch=100, N=32768", "samples/s",
     "G=3 grouped-digit chain (90-bit special modulus), HBM-chunked dots "
     "stage; describe() recorded in bench_suite.json"),
]

START = "<!-- BENCH_TABLE_START -->"
END = "<!-- BENCH_TABLE_END -->"


def build_table(result: dict) -> str:
    flat = {result["metric"]: result["value"], **result.get("extras", {})}
    lines = []
    if result.get("date"):
        lines.append(f"*Run date: {result['date']} (single real chip).*\n")
    lines += ["| metric | value | notes |", "|---|---|---|"]
    head_note = (
        f"{result['vs_baseline']}x the SEAL single-core estimate "
        f"(target: 100x)"
    )
    for key, label, unit, note in ROWS:
        if key not in flat:
            continue
        val = flat[key]
        shown = f"{val:,.1f} {unit}" if unit == "ops/s" else f"{val} {unit}"
        if key == result["metric"]:
            note = f"{head_note}; {note}"
        lines.append(f"| {label} | {shown} | {note} |")
    return "\n".join(lines)


def main() -> None:
    suite = sys.argv[1] if len(sys.argv) > 1 else "bench_suite.json"
    readme = sys.argv[2] if len(sys.argv) > 2 else "README.md"
    with open(suite) as f:
        result = json.load(f)
    with open(readme) as f:
        text = f.read()
    pre, rest = text.split(START, 1)
    _, post = rest.split(END, 1)
    table = build_table(result)
    with open(readme, "w") as f:
        f.write(f"{pre}{START}\n{table}\n{END}{post}")
    print(f"README table regenerated from {suite}")


if __name__ == "__main__":
    main()
