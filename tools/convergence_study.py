"""Convergence-rate study mirroring the reference's methodology
(``GetConvergenceTestSet``, ``testset.cpp:119-187``; published analysis in
``documentation.tex:584-644``): repeats x size ladder x 9 (rotation,
translation) combos per method, self-registration with a known injected
transform.

"Converged" is judged against the exact oracle: ground-truth MSE of the
recovered transform below 5% of spread^2 (the reference judged from final
error in a spreadsheet).  Reduced repeats/sizes vs the reference's 5x full
ladder to bound tunnel-compile time; the combo grid is complete.

Reference anchors (documentation.tex): ICP convergence low overall and
falling with size/translation; NICP ~1.0 at 250k-1.25M; CPD (hybrid)
> 0.9 at 4k-20k on GPU.  Writes ``bench_results/convergence.jsonl`` and
prints per-combo rates.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)

import numpy as np

from tpuslam.algorithms.registry import run_with_configuration
from tpuslam.config.configuration import (
    ApproximationType,
    ComputationMethod,
    Configuration,
    ExecutionPolicy,
)
from tpuslam.data.synthesis import get_clouds_from_config
from tpuslam.harness.testsets import get_object_with_min_size

COMBOS = [(r, t) for t in (10.0, 20.0, 30.0) for r in (0.2, 0.4, 0.6)]
# the reference's full ladders (testset.cpp:119-187): 5 sizes per method
SIZES = {
    ComputationMethod.Icp: [20000, 40000, 60000, 80000, 100000],
    ComputationMethod.Cpd: [4000, 8000, 12000, 16000, 20000],
    ComputationMethod.NoniterativeIcp: [
        250000, 500000, 750000, 1000000, 1250000,
    ],
}
REPEATS = 5  # reference: 5 repeats per cell
SPREAD_SQ = 100.0  # cloud-spread 10


def run_one(method, size, rot, trans, seed, prealign=False):
    config = Configuration(
        computation_method=method,
        before_path=get_object_with_min_size(size),
        after_path=get_object_with_min_size(size),
        max_iterations=100,
        cloud_spread=10.0,
        max_distance_squared=10000.0,
        transformation_parameters=(rot, trans),
        cloud_before_resize=size,
        cloud_after_resize=size,
        execution_policy=ExecutionPolicy.Parallel,
        approximation_type=(
            ApproximationType.Hybrid
            if method == ComputationMethod.Cpd
            else ApproximationType.NONE
        ),
        nicp_subcloud_size=5000,
        nicp_batch_size=1,
        nicp_iterations=16,
        cpd_weight=0.1,
        cpd_tolerance=1e-4,
        # reference struct default (configuration.h:34) — its convergence
        # generator bypasses the parser, so const scale was in effect for
        # the published study; free scale collapses at translation 30
        cpd_const_scale=True,
        random_seed=seed,
        icp_prealign=prealign,
    )
    before, after, (gt_r, gt_t) = get_clouds_from_config(config)
    t0 = time.perf_counter()
    rotation, translation, iterations, error = run_with_configuration(
        before, after, config
    )
    wall = time.perf_counter() - t0
    target = before @ gt_r.T + gt_t
    mse = float(
        np.mean(
            np.sum((before @ rotation.T + translation - target) ** 2, -1)
        )
    )
    return {
        "method": method.value,
        "size": size,
        "rotation": rot,
        "translation": trans,
        "seed": seed,
        "iterations": int(iterations),
        "error": float(error),
        "gt_mse": mse,
        "converged": mse < 0.05 * SPREAD_SQ,
        "wall_s": round(wall, 2),
    }


def main():
    # TPUSLAM_CONV_PREALIGN=1: re-run the ICP grid with the icp-prealign
    # extension ON (NICP seed), writing to *_prealign artifacts — measures
    # how much of ICP's published convergence weakness the seed recovers.
    prealign = os.environ.get("TPUSLAM_CONV_PREALIGN") == "1"
    sizes_by_method = (
        {ComputationMethod.Icp: SIZES[ComputationMethod.Icp]}
        if prealign else SIZES
    )
    # TPUSLAM_CONV_METHODS=icp,cpd: re-run a subset of the grid
    methods_env = os.environ.get("TPUSLAM_CONV_METHODS")
    if methods_env:
        wanted = {m.strip() for m in methods_env.split(",")}
        sizes_by_method = {
            m: s for m, s in sizes_by_method.items() if m.value in wanted
        }
    suffix = "_prealign" if prealign else ""
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", f"convergence{suffix}.jsonl",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    # a subset re-run keeps the other methods' recorded rows
    kept = []
    if methods_env and os.path.exists(out_path):
        rerun = {m.value for m in sizes_by_method}
        with open(out_path) as fh:
            rows_prev = [json.loads(line) for line in fh]
        kept = [r for r in rows_prev if r.get("method") not in rerun]
    rows = []
    with open(out_path, "w") as fh:
        for row in kept:
            fh.write(json.dumps(row) + "\n")
        for method, sizes in sizes_by_method.items():
            for size in sizes:
                for rot, trans in COMBOS:
                    for rep in range(REPEATS):
                        row = run_one(
                            method, size, rot, trans, 1000 + rep,
                            prealign=prealign,
                        )
                        rows.append(row)
                        fh.write(json.dumps(row) + "\n")
                        fh.flush()
                        print(
                            f"{row['method']} n={size} rot={rot} "
                            f"tr={trans} rep={rep}: conv={row['converged']}"
                            f" mse={row['gt_mse']:.3f} {row['wall_s']}s",
                            flush=True,
                        )

    all_rows = kept + rows
    lines = ["=== convergence rates ==="]
    for method_name in dict.fromkeys(r["method"] for r in all_rows):
        mrows = [r for r in all_rows if r["method"] == method_name]
        total = sum(r["converged"] for r in mrows) / len(mrows)
        lines.append(f"{method_name}: overall {total:.2f}")
        for rot, trans in COMBOS:
            sub = [
                r for r in mrows
                if r["rotation"] == rot and r["translation"] == trans
            ]
            rate = sum(r["converged"] for r in sub) / len(sub)
            lines.append(f"  rot={rot} trans={trans}: {rate:.2f}")
        for size in dict.fromkeys(r["size"] for r in mrows):
            sub = [r for r in mrows if r["size"] == size]
            rate = sum(r["converged"] for r in sub) / len(sub)
            lines.append(f"  size={size}: {rate:.2f}")
    summary = "\n".join(lines) + "\n"
    print("\n" + summary)
    with open(
        os.path.join(
            os.path.dirname(out_path),
            f"convergence_summary{suffix}.txt",
        ),
        "w",
    ) as fh:
        fh.write(summary)


if __name__ == "__main__":
    main()
