"""Config contract tests vs the reference parser semantics
(``configparser.cpp``)."""

import json

import numpy as np
import pytest

from tpuslam.config.configuration import (
    ApproximationType,
    ComputationMethod,
    Configuration,
    ExecutionPolicy,
)
from tpuslam.config.parser import ConfigParser


def parse(tmp_path, payload: dict) -> ConfigParser:
    p = tmp_path / "config.json"
    p.write_text(json.dumps(payload))
    return ConfigParser([str(p)])


BASE = {
    "method": "icp",
    "before-path": "data/bunny.obj",
    "after-path": "data/bunny.obj",
    "translation": [1.0, 2.0, 3.0],
    "rotation": [1, 0, 0, 0, 1, 0, 0, 0, 1],
}


def test_defaults_match_parser_truth(tmp_path):
    cp = parse(tmp_path, BASE)
    assert cp.is_correct()
    c = cp.get_configuration()
    assert c.computation_method == ComputationMethod.Icp
    assert c.max_distance_squared == 1000.0
    assert c.approximation_type == ApproximationType.Hybrid
    assert c.nicp_batch_size == 16
    assert c.nicp_iterations == 32
    assert c.nicp_subcloud_size == 1000
    assert c.cpd_weight == pytest.approx(0.3)
    # quirk: struct default true, parser default false — parser wins
    assert c.cpd_const_scale is False
    assert c.cpd_tolerance == pytest.approx(1e-3)
    assert c.convergence_epsilon == pytest.approx(1e-3)
    assert c.noise_intensity_before == pytest.approx(0.1)
    assert c.additional_outliers_after == 0
    assert c.ratio_of_far_field == pytest.approx(10.0)
    assert c.order_of_truncation == 8
    assert c.max_iterations is None
    assert c.execution_policy is None


def test_rotation_is_row_major_and_scale_multiplies(tmp_path):
    payload = dict(BASE)
    payload["rotation"] = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    payload["scale"] = 2.0
    c = parse(tmp_path, payload).get_configuration()
    rot, trans = c.transformation
    # element (row 0, col 1) must be 2 (row-major) scaled by 2
    assert rot[0, 1] == pytest.approx(4.0)
    assert rot[1, 0] == pytest.approx(8.0)
    np.testing.assert_allclose(trans, [1.0, 2.0, 3.0])


def test_rotation_range_key_not_angle_range(tmp_path):
    payload = {
        "method": "cpd",
        "before-path": "a",
        "after-path": "b",
        "rotation-range": 0.4,
        "translation-range": 20.0,
    }
    cp = parse(tmp_path, payload)
    assert cp.is_correct()
    # stored as (rotation, translation) — configparser.cpp:182
    assert cp.get_configuration().transformation_parameters == (0.4, 20.0)

    bad = dict(payload)
    bad["angle-range"] = bad.pop("rotation-range")
    cp2 = parse(tmp_path, bad)
    assert not cp2.is_correct()  # validation: no transformation provided


def test_missing_transformation_is_error(tmp_path):
    payload = {"method": "icp", "before-path": "a", "after-path": "b"}
    assert not parse(tmp_path, payload).is_correct()


def test_unknown_method_is_error_unknown_approx_is_hybrid(tmp_path):
    payload = dict(BASE)
    payload["method"] = "supericp"
    assert not parse(tmp_path, payload).is_correct()

    payload = dict(BASE)
    payload["approximation-type"] = "bogus"
    cp = parse(tmp_path, payload)
    assert cp.is_correct()
    assert cp.get_configuration().approximation_type == ApproximationType.Hybrid


def test_unknown_policy_is_error(tmp_path):
    payload = dict(BASE)
    payload["policy"] = "warp"
    assert not parse(tmp_path, payload).is_correct()

    payload["policy"] = "sequential"
    cp = parse(tmp_path, payload)
    assert cp.is_correct()
    assert cp.get_configuration().execution_policy == ExecutionPolicy.Sequential


def test_cli_contract_missing_file_falls_back_to_default(tmp_path, monkeypatch):
    monkeypatch.chdir("/root/repo")
    cp = ConfigParser(["/nonexistent/path.json"])
    assert cp.is_correct()
    assert cp.get_configuration().before_path == "data/bunny.obj"


def test_default_config_parses(monkeypatch):
    monkeypatch.chdir("/root/repo")
    cp = ConfigParser([])
    assert cp.is_correct()
    c = cp.get_configuration()
    assert c.max_distance_squared == 400.0
    assert c.max_iterations == 50
    assert c.cloud_spread == 10.0


def test_print_roundtrip(tmp_path, capsys):
    c = parse(tmp_path, BASE).get_configuration()
    text = c.print()
    assert "method: icp" in text
    assert "max-distance-squared: 1000.0" in text


def test_cpd_use_fgt_extension_key(tmp_path):
    """Extension key: cpd-use-fgt flows parser -> Configuration ->
    registry -> FGT-backed E-step (tpuslam.algorithms.cpd)."""
    import json

    import numpy as np

    from tpuslam.algorithms.registry import run_with_configuration
    from tpuslam.config.parser import ConfigParser

    cfg = {
        "method": "cpd",
        "before-path": "data/bunny.obj",
        "after-path": "data/bunny.obj",
        "cloud-before-resize": 256,
        "cloud-after-resize": 256,
        "cloud-spread": 10.0,
        "random-seed": 5,
        "max-iterations": 40,
        "approximation-type": "hybrid",
        "cpd-weight": 0.1,
        "cpd-use-fgt": True,
        "rotation-range": 0.15,
        "translation-range": 0.5,
    }
    p = tmp_path / "fgt.json"
    p.write_text(json.dumps(cfg))
    parser = ConfigParser([str(p)])
    assert parser.is_correct()
    config = parser.get_configuration()
    assert config.cpd_use_fgt is True

    from tpuslam.data.synthesis import get_clouds_from_config

    before, after, (gt_r, gt_t) = get_clouds_from_config(config)
    rot, trans, iters, err = run_with_configuration(before, after, config)
    assert np.all(np.isfinite(rot)) and iters > 0


def test_cpd_use_fgt_tristate(tmp_path):
    """cpd-use-fgt is tri-state: absent -> None (auto, the measured
    size crossover), true/false -> forced arm; the echo prints auto."""
    import json

    from tpuslam.config.parser import ConfigParser

    base = {
        "method": "cpd",
        "before-path": "data/bunny.obj",
        "after-path": "data/bunny.obj",
    }
    for extra, want in (
        ({}, None),
        ({"cpd-use-fgt": False}, False),
        ({"cpd-use-fgt": True}, True),
    ):
        p = tmp_path / f"tri{len(extra)}{want}.json"
        p.write_text(json.dumps({**base, **extra}))
        config = ConfigParser([str(p)]).get_configuration()
        assert config.cpd_use_fgt is want
        echoed = config.print()
        label = "auto" if want is None else str(want).lower()
        assert f"cpd-use-fgt: {label}" in echoed


def test_resolve_use_fgt_crossover():
    """Auto dispatch: exact below the measured crossover, FGT at/above
    it, never for exact (NONE) mode, explicit overrides win."""
    from tpuslam.algorithms.cpd import CPD_FGT_CROSSOVER, resolve_use_fgt
    from tpuslam.config.configuration import ApproximationType

    big = CPD_FGT_CROSSOVER
    small = CPD_FGT_CROSSOVER - 1
    assert resolve_use_fgt(None, ApproximationType.Hybrid, big, big)
    assert resolve_use_fgt(None, ApproximationType.Full, small, big)
    assert not resolve_use_fgt(None, ApproximationType.Hybrid, small, small)
    assert not resolve_use_fgt(None, ApproximationType.NONE, big, big)
    assert not resolve_use_fgt(False, ApproximationType.Hybrid, big, big)
    assert resolve_use_fgt(True, ApproximationType.Hybrid, small, small)


def test_cpd_centroid_init_extension_key(tmp_path):
    """Extension key: cpd-centroid-init flows parser -> Configuration;
    defaults false (reference parity: EM always starts from identity)."""
    c = parse(tmp_path, BASE).get_configuration()
    assert c.cpd_centroid_init is False
    c = parse(tmp_path, {**BASE, "cpd-centroid-init": True}).get_configuration()
    assert c.cpd_centroid_init is True


def test_icp_prealign_extension_key(tmp_path):
    """Extension key: icp-prealign flows parser -> Configuration;
    defaults false (reference parity: ICP always starts from identity)."""
    c = parse(tmp_path, BASE).get_configuration()
    assert c.icp_prealign is False
    c = parse(tmp_path, {**BASE, "icp-prealign": True}).get_configuration()
    assert c.icp_prealign is True
