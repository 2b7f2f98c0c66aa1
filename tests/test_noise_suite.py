"""The reference's 39-config manual robustness suite
(``doc/noise/configs/config{1..39}.json``, SURVEY §4.4), ported as an
automated suite driven by the package's extracted parameter table
(``tpuslam/harness/data/noise_suite.jsonl``; builder/tier logic in
``tpuslam.harness.noise`` — also the ``--test-set noise`` runner).

Oracle strategy (SURVEY §4): every config registers a cloud against a
transformed copy of itself (possibly noised/outliered/part-removed), so
the injected (R, t) is exactly known.  The reference recorded outcomes by
hand in a spreadsheet (missing blob); here every config must *run* and
produce a finite, proper result, and the outcome oracle is tiered (see
``tpuslam.harness.noise.tier_of``): recover / align / never-worse, with
the reference's own documented failures cited per lenient tier.

Adaptations, all visible in the table/code:
* models that are missing blobs in this checkout (rose/airbus/mustang*/
  plane-*) substitute ``synthetic://`` clouds;
* clouds are capped at ``NOISE_SUITE_SIZE_CAP`` points for CPU test
  runtime (set ``TPUSLAM_NOISE_FULL=1`` for full-size runs on TPU) —
  the recovery oracle is size-independent except where a measured
  per-config floor says otherwise (``noise.SIZE_CAP_FLOOR``).
"""

import os

import numpy as np
import pytest

from tpuslam.algorithms.registry import run_with_configuration
from tpuslam.data.synthesis import get_clouds_from_config
from tpuslam.harness.noise import (
    angle_deg as _angle_deg,
    build_configuration,
    is_self_pair,
    load_entries,
    recover_bar,
    tier_of,
)

FULL = os.environ.get("TPUSLAM_NOISE_FULL", "") == "1"
NOISE_SUITE_SIZE_CAP = None if FULL else 2000

ENTRIES = load_entries()


def _build_configuration(e):
    return build_configuration(e, size_cap=NOISE_SUITE_SIZE_CAP)


def _is_self_pair(e, config):
    return is_self_pair(e, config)


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

    # shared tier semantics (tpuslam.harness.noise.tier_of — the same
    # bars the --test-set noise runner grades with):
    #   recover     — self pairs at moderate angle must RECOVER the
    #                 injected transform, noise/outliers included
    #   align       — cross-model part-removed pairs must substantially
    #                 align (exact recovery ill-defined across shapes)
    #   never-worse — out-of-basin large rotations; the reference's own
    #                 documented failures on this regime are cited in
    #                 noise.REFERENCE_NOTES
    tier, bar = tier_of(entry, config)
    assert mse_result <= mse_identity * bar, (
        f"config {entry['id']} [{tier}]: mse {mse_result:.4f} vs "
        f"identity {mse_identity:.4f} exceeds bar {bar}"
    )
    # the heavy-noise relaxation stays visible: recover bar is 0.5%
    # baseline, 1% under >= 80% noise share
    if tier == "recover":
        assert bar == recover_bar(entry)

