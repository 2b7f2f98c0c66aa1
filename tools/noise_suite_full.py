"""Full-size noise-suite runner (TPU): the reference's 39-config manual
robustness study (``doc/noise/configs``, outcomes hand-recorded in a
spreadsheet that is a missing blob) run end-to-end at the configs' real
sizes, producing the per-config pass/fail table the reference only had
on paper (cf. ``documentation.tex:476-574``).

Thin wrapper over ``tpuslam.harness.noise`` (the ``--test-set noise``
machinery): runs all 39 configs in table order at full size, writes
``bench_results/noise_suite_full.jsonl`` (one graded row per config,
including the per-tier reference-behavior note) and prints a summary.
Run with no size cap: ``python tools/noise_suite_full.py``.
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


def main():
    from tpuslam.algorithms.registry import run_with_configuration
    from tpuslam.data.synthesis import get_clouds_from_config
    from tpuslam.harness.noise import build_configuration, grade, load_entries

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "noise_suite_full.jsonl",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    rows = []
    with open(out_path, "w") as fh:
        for e in load_entries():
            config = build_configuration(e)  # full size: no cap
            before, after, _ = get_clouds_from_config(config)
            t0 = time.perf_counter()
            rot, tr, iters, err = run_with_configuration(
                before, after, config
            )
            wall = time.perf_counter() - t0
            row = grade(e, config, np.asarray(before), np.asarray(rot),
                        np.asarray(tr))
            row["n_after"] = int(len(after))
            row["iterations"] = int(iters)
            row["wall_s"] = round(wall, 2)
            rows.append(row)
            fh.write(json.dumps(row) + "\n")
            fh.flush()
            print(
                f"config{e['id']:2d} [{row['tier']:11s}] "
                f"{'PASS' if row['ok'] else 'FAIL'}  "
                f"mse={row['gt_mse']:9.4f} id={row['identity_mse']:8.2f} "
                f"n={len(before)} {wall:6.1f}s",
                flush=True,
            )
    n_ok = sum(r["ok"] for r in rows)
    print(f"\n{n_ok}/{len(rows)} configs pass")


if __name__ == "__main__":
    main()
