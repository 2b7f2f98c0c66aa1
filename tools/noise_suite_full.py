"""Full-size noise-suite runner (TPU): the reference's 39-config manual
robustness study (``doc/noise/configs``, outcomes hand-recorded in a
spreadsheet that is a missing blob) run end-to-end at the configs' real
sizes, producing the per-config pass/fail table the reference only had
on paper (cf. ``documentation.tex:476-574``).

Writes ``bench_results/noise_suite_full.jsonl`` (one row per config) and
prints a summary table.  The pass tiers mirror ``tests/test_noise_suite``:
self pairs at angle <= 60 deg must recover the injected transform
(gt-MSE <= 0.5% of the identity gt-MSE); cross-model pairs must reach
<= 50%; large-rotation configs pass on never-worse (flipped-optimum
regime).  Run with no TPUSLAM_NOISE cap: ``python tools/noise_suite_full.py``.
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
os.environ["TPUSLAM_NOISE_FULL"] = "1"

import numpy as np


def main():
    import tests.test_noise_suite as ns
    from tpuslam.algorithms.registry import run_with_configuration
    from tpuslam.data.synthesis import get_clouds_from_config

    assert ns.NOISE_SUITE_SIZE_CAP is None, "cap must be off for full runs"
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "noise_suite_full.jsonl",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    rows = []
    with open(out_path, "w") as fh:
        for e in ns.ENTRIES:
            config = ns._build_configuration(e)
            before, after, (gt_r, gt_t) = get_clouds_from_config(config)
            t0 = time.perf_counter()
            rot, tr, iters, err = run_with_configuration(
                before, after, config
            )
            wall = time.perf_counter() - t0
            target = before @ gt_r.T + gt_t
            mse = float(np.mean(
                np.sum((before @ rot.T + tr - target) ** 2, -1)
            ))
            mse_id = float(np.mean(np.sum((before - target) ** 2, -1)))
            angle = ns._angle_deg(e)
            is_self = ns._is_self_pair(e, config)
            if is_self and angle <= 60.0:
                tier, ok = "recover", mse <= mse_id * ns.recover_bar(e)
            elif not is_self and angle <= 60.0:
                tier, ok = "align", mse <= mse_id * 0.5
            else:
                tier, ok = "never-worse", mse <= mse_id * 1.05
            row = {
                "id": e["id"], "method": e["method"],
                "angle_deg": round(angle, 1), "self": is_self,
                "n_before": int(len(before)), "n_after": int(len(after)),
                "gt_mse": mse, "identity_mse": mse_id,
                "iterations": int(iters), "tier": tier, "ok": bool(ok),
                "wall_s": round(wall, 2),
            }
            rows.append(row)
            fh.write(json.dumps(row) + "\n")
            fh.flush()
            print(
                f"config{e['id']:2d} [{tier:11s}] "
                f"{'PASS' if ok else 'FAIL'}  mse={mse:9.4f} "
                f"id={mse_id:8.2f} n={len(before)} {wall:6.1f}s",
                flush=True,
            )
    n_ok = sum(r["ok"] for r in rows)
    print(f"\n{n_ok}/{len(rows)} configs pass")


if __name__ == "__main__":
    main()
