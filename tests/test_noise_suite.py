"""The reference's 39-config manual robustness suite
(``doc/noise/configs/config{1..39}.json``, SURVEY §4.4), ported as an
automated suite driven by the extracted parameter table
``tests/data/noise_suite.jsonl``.

Oracle strategy (SURVEY §4): every config registers a cloud against a
transformed copy of itself (possibly noised/outliered/part-removed), so
the injected (R, t) is exactly known.  The reference recorded outcomes by
hand in a spreadsheet (missing blob); here every config must *run* and
produce a finite, proper result, and the outcome oracle is tiered:
self-registrations at moderate angle (including every noised/outliered
one — robustness is the point of the suite) must RECOVER the injected
transform; cross-model part-removed pairs must substantially align; only
large-rotation configs (flipped-local-optimum regime, as in the
reference's CPD) fall back to never-worse-than-identity.
``tools/noise_suite_full.py`` runs the same table at full size on TPU
and writes the per-config pass/fail table.

Adaptations, all visible in the table/code:
* models that are missing blobs in this checkout (rose/airbus/mustang*/
  plane-*) substitute ``synthetic://`` clouds;
* clouds are capped at ``NOISE_SUITE_SIZE_CAP`` points for CPU test
  runtime (set ``TPUSLAM_NOISE_FULL=1`` for full-size runs on TPU) —
  the recovery oracle is size-independent.
"""

import json
import os

import numpy as np
import pytest

from tpuslam.algorithms.registry import run_with_configuration
from tpuslam.config.configuration import (
    ApproximationType,
    ComputationMethod,
    Configuration,
)
from tpuslam.data.loader import resolve_path
from tpuslam.data.synthesis import get_clouds_from_config

TABLE = os.path.join(os.path.dirname(__file__), "data", "noise_suite.jsonl")
FULL = os.environ.get("TPUSLAM_NOISE_FULL", "") == "1"
NOISE_SUITE_SIZE_CAP = None if FULL else 2000


def _entries():
    out = []
    with open(TABLE) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            out.append(json.loads(line))
    return out


ENTRIES = _entries()
assert len(ENTRIES) == 39


def _subst(path: str, size_hint: int) -> str:
    """Missing-blob model -> synthetic:// (documented adaptation)."""
    if os.path.exists(resolve_path(path)):
        return path
    return f"synthetic://{max(size_hint, 2000)}"


def _build_configuration(e: dict) -> Configuration:
    size_hint = e.get("resize_before") or 20000
    before = _subst(e["before"], size_hint)
    after = _subst(e["after"], size_hint)
    if before.startswith("synthetic://") or after.startswith("synthetic://"):
        # part-removed pairs lose their meaning when both sides are the
        # same synthetic cloud; keep them as plain self-registration
        after = before
    resize_b = e.get("resize_before")
    resize_a = e.get("resize_after")
    if NOISE_SUITE_SIZE_CAP is not None:
        resize_b = min(resize_b or 10**9, NOISE_SUITE_SIZE_CAP)
        resize_a = min(resize_a or 10**9, NOISE_SUITE_SIZE_CAP)
    rotation = np.asarray(e["rotation"], dtype=np.float32).reshape(3, 3)
    rotation = float(e.get("scale") or 1.0) * rotation
    return Configuration(
        computation_method=ComputationMethod(e["method"]),
        before_path=before,
        after_path=after,
        approximation_type=ApproximationType(e["approximation"]),
        max_iterations=e.get("max_iterations"),
        transformation=(rotation, np.asarray(e["translation"], np.float32)),
        cloud_before_resize=resize_b,
        cloud_after_resize=resize_a,
        cloud_spread=e.get("spread"),
        random_seed=e.get("seed"),
        max_distance_squared=e.get("max_d2") or 1000.0,
        nicp_batch_size=e.get("nicp_batch") or 16,
        nicp_iterations=e.get("nicp_iters") or 32,
        nicp_subcloud_size=e.get("nicp_subcloud") or 1000,
        cpd_weight=e.get("cpd_weight", 0.3),
        cpd_const_scale=bool(e.get("cpd_const_scale")),
        cpd_tolerance=e.get("cpd_tolerance") or 1e-3,
        convergence_epsilon=e.get("eps") or 1e-3,
        noise_affected_points_before=e.get("noise_share_before"),
        noise_affected_points_after=e.get("noise_share_after"),
        noise_intensity_before=e.get("noise_int_before") or 0.1,
        noise_intensity_after=e.get("noise_int_after") or 0.1,
        additional_outliers_before=e.get("outliers_before") or 0,
        additional_outliers_after=e.get("outliers_after") or 0,
    )


def recover_bar(e: dict) -> float:
    """Recovery threshold as a fraction of the identity gt-MSE.

    Baseline 0.5%: measured headroom at the capped size is 2e-3 worst
    case (config 39), threshold 2.5x above it.  Heavy noise (share >=
    0.8 of the target cloud) relaxes to 1%: CPD's likelihood there
    legitimately plateaus under the config's own EM tolerance before the
    transform fully settles (measured at full size on config 37: ntol
    crosses its 1e-4 tolerance at iteration 16 with sigma^2 still ~5.5,
    leaving gt-MSE at 0.75% of identity — the stopping rule is the
    reference's, ``coherentpointdrift.cpp``; 1% still demands 99%
    registration under 80% noise)."""
    share = max(
        e.get("noise_share_before") or 0.0,
        e.get("noise_share_after") or 0.0,
    )
    return 0.01 if share >= 0.8 else 0.005


def _is_self_pair(e: dict, config: Configuration) -> bool:
    """True when both sides are the same cloud (including the documented
    synthetic substitution, which collapses a missing-blob pair to
    self-registration) — the injected transform is then exactly
    recoverable even under noise/outliers, because the ground-truth MSE
    metric compares the recovered vs injected transform on the same
    points (the noise cancels)."""
    return (
        e["before"] == e["after"]
        or config.before_path == config.after_path
    )


def _angle_deg(e: dict) -> float:
    r = np.asarray(e["rotation"], np.float32).reshape(3, 3)
    s = scale_of(r)
    return float(np.degrees(
        np.arccos(np.clip((np.trace(r / s) - 1) / 2, -1, 1))
    ))


@pytest.mark.slow
@pytest.mark.parametrize("entry", ENTRIES, ids=lambda e: f"config{e['id']}")
def test_noise_config(entry):
    config = _build_configuration(entry)
    before, after, (gt_r, gt_t) = get_clouds_from_config(config)
    assert len(before) > 0 and len(after) > 0

    rotation, translation, iterations, error = run_with_configuration(
        before, after, config
    )

    # pipeline integrity: finite outputs, proper (scaled) rotation
    assert np.all(np.isfinite(rotation))
    assert np.all(np.isfinite(translation))
    assert np.isfinite(error)
    scale = float(np.cbrt(abs(np.linalg.det(rotation))))
    # CPD with weight 0 and ~180-degree rotations can collapse the scale
    # toward 0 (degenerate EM optimum) — the reference's free-scale M-step
    # has the same failure mode; integrity only demands finite, nonzero
    assert 1e-4 < scale < 1e4
    pure = rotation / scale
    np.testing.assert_allclose(pure @ pure.T, np.eye(3), atol=5e-2)

    # ground-truth transform error (noise cancels in this metric: both
    # sides map the same `before` points, so the comparison measures the
    # recovered-vs-injected transform, not the noise floor)
    target = before @ gt_r.T + gt_t
    mse_result = float(
        np.mean(np.sum((before @ rotation.T + translation - target) ** 2, -1))
    )
    mse_identity = float(np.mean(np.sum((before - target) ** 2, -1)))
    angle = _angle_deg(entry)

    if _is_self_pair(entry, config) and angle <= 60.0:
        # robustness oracle: every noised/outliered self-registration at
        # moderate angle must RECOVER the injected transform, not merely
        # not regress
        assert mse_result <= mse_identity * recover_bar(entry), (
            f"config {entry['id']}: transform not recovered "
            f"(mse {mse_result:.4f} vs identity {mse_identity:.4f})"
        )
    elif not _is_self_pair(entry, config) and angle <= 60.0:
        # cross-model / part-removed pairs (duck variants vs bird): exact
        # recovery is ill-defined — different shapes — but registration
        # must still substantially align them (observed 0.1-0.37x)
        assert mse_result <= mse_identity * 0.5, (
            f"config {entry['id']}: pair alignment did not improve "
            f"enough (mse {mse_result:.4f} vs identity {mse_identity:.4f})"
        )
    else:
        # large rotations (up to 195 deg): CPD may settle in a flipped
        # local optimum exactly as the reference's does — never-worse is
        # the honest bound there
        assert mse_result <= mse_identity * 1.05


def scale_of(r: np.ndarray) -> float:
    return float(np.cbrt(abs(np.linalg.det(r)))) or 1.0
