"""Fast Gauss Transform vs the exact O(N M) Gauss transform oracle
(SURVEY §4: "FGT-vs-exact if implemented"), plus the multi-index table
against a combinatorial oracle and the FGT-backed CPD E-step/register."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from tpuslam.core.types import pad_cloud
from tpuslam.ops.fgt import (
    _alpha_table,
    _c_coefficients,
    compute_fgt_model,
    fgt_predict,
    k_center,
    pd_size,
)


def exact_gauss_transform(sources, weights, targets, sigma):
    """Brute force: v_m = sum_n w_n exp(-|y_m - x_n|^2 / sigma^2)."""
    d2 = ((targets[:, None, :] - sources[None, :, :]) ** 2).sum(-1)
    return (np.exp(-d2 / sigma**2) * weights[None, :]).sum(1)


def test_alpha_table_is_graded_lex_complete():
    for p in (3, 5, 8):
        table = _alpha_table(p)
        assert len(table) == pd_size(p)
        # every multi-index of total degree < p appears exactly once
        seen = {tuple(a) for a in table}
        expected = {
            (i, j, k)
            for i in range(p) for j in range(p) for k in range(p)
            if i + j + k < p
        }
        assert seen == expected
        # graded: degrees are non-decreasing along the table
        degs = table.sum(1)
        assert np.all(np.diff(degs) >= 0)


def test_c_coefficients_closed_form():
    table = _alpha_table(4)
    c = _c_coefficients(4)
    for alpha, val in zip(table, c):
        want = 2.0 ** alpha.sum() / (
            math.factorial(alpha[0])
            * math.factorial(alpha[1])
            * math.factorial(alpha[2])
        )
        assert val == pytest.approx(want, rel=1e-6)


def test_k_center_covers(rng):
    pts = rng.random((500, 3)).astype(np.float32) * 4.0
    mask = np.ones(500, np.float32)
    centers, indx = k_center(jnp.asarray(pts), jnp.asarray(mask), 16)
    centers = np.asarray(centers)
    indx = np.asarray(indx)
    assert set(np.unique(indx)) <= set(range(16))
    # every point is within the max cluster radius of its center
    r = np.linalg.norm(pts - centers[indx], axis=1)
    assert r.max() < 2.0  # 16 centers over a 4-unit cube


def test_fgt_matches_exact(rng):
    n, m = 700, 500
    sources = (rng.random((n, 3)) * 4.0).astype(np.float32)
    targets = (rng.random((m, 3)) * 4.0).astype(np.float32)
    weights = rng.random(n).astype(np.float32)
    sigma = 2.0

    model = compute_fgt_model(
        jnp.asarray(sources), jnp.asarray(weights), jnp.float32(sigma),
        k=32, p=8,
    )
    got = np.asarray(
        fgt_predict(jnp.asarray(targets), model, jnp.float32(sigma),
                    e_param=10.0, p=8)
    )
    want = exact_gauss_transform(sources, weights, targets, sigma)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_fgt_far_field_cutoff_drops_contributions(rng):
    # two well-separated blobs; a tiny e_param zeroes the cross terms
    a = rng.random((100, 3)).astype(np.float32)
    b = a + 100.0
    model = compute_fgt_model(
        jnp.asarray(a), jnp.ones(100, jnp.float32), jnp.float32(1.0),
        k=4, p=4,
    )
    v = np.asarray(
        fgt_predict(jnp.asarray(b), model, jnp.float32(1.0),
                    e_param=1.0, p=4)
    )
    assert np.all(v == 0.0)


def test_fgt_padded_rows_contribute_nothing(rng):
    sources = (rng.random((300, 3)) * 3.0).astype(np.float32)
    targets = (rng.random((200, 3)) * 3.0).astype(np.float32)
    cloud = pad_cloud(sources, multiple=512)
    weights = np.zeros(512, np.float32)
    weights[:300] = 1.0
    model = compute_fgt_model(
        cloud.points, jnp.asarray(weights), jnp.float32(1.5), k=24, p=8
    )
    got = np.asarray(
        fgt_predict(jnp.asarray(targets), model, jnp.float32(1.5),
                    e_param=10.0, p=8)
    )
    want = exact_gauss_transform(
        sources, np.ones(300, np.float32), targets, 1.5
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_cpd_estep_fgt_close_to_exact(rng):
    from tpuslam.algorithms.cpd import (
        cpd_estep, cpd_estep_fgt, sigma_squared_init, uniform_constant,
    )

    before = (rng.random((256, 3)) * 4.0).astype(np.float32)
    after = (before + 0.3).astype(np.float32)
    cb, ca = pad_cloud(before), pad_cloud(after)
    s2 = sigma_squared_init(cb.points, cb.mask(), ca.points, ca.mask())
    m = jnp.sum(cb.mask())
    n = jnp.sum(ca.mask())
    w = jnp.float32(0.1)
    c = uniform_constant(s2, w, m, n)

    exact = cpd_estep(cb.points, cb.mask(), ca.points, ca.mask(), s2, c,
                      jnp.asarray(False))
    approx = cpd_estep_fgt(cb.points, cb.mask(), ca.points, ca.mask(), s2,
                           w, m, n, 48, 8, 10.0)
    np.testing.assert_allclose(
        np.asarray(approx.p1), np.asarray(exact.p1), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(approx.pt1), np.asarray(exact.pt1), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(approx.px), np.asarray(exact.px), atol=3e-2
    )
    assert float(approx.error) == pytest.approx(
        float(exact.error), rel=1e-2
    )


def test_cpd_register_with_fgt_recovers(rng):
    from tests.conftest import random_rigid
    from tpuslam.algorithms.cpd import cpd_register
    from tpuslam.config.configuration import ApproximationType

    before = (rng.random((300, 3)) * 6.0 - 3.0).astype(np.float32)
    r, t = random_rigid(rng, angle=0.2, trans=0.4)
    after = (before @ r.T + t)[rng.permutation(300)].astype(np.float32)
    result = cpd_register(
        pad_cloud(before), pad_cloud(after),
        weight=0.1, max_iterations=150, tolerance=1e-6,
        approximation_type=ApproximationType.Hybrid,
        use_fgt=True, fgt_k=64,
    )
    rot = np.asarray(result.transform.rotation)
    trans = np.asarray(result.transform.translation)
    scale = float(result.transform.scale)
    mse = np.mean(
        np.sum(
            (scale * (before @ rot.T) + trans - (before @ r.T + t)) ** 2, -1
        )
    )
    assert mse < 1e-2


def test_cpd_register_use_fgt_actually_runs_fgt(rng, monkeypatch):
    """The use_fgt flag must route through cpd_estep_fgt (guards against
    the flag silently becoming a no-op)."""
    import tpuslam.algorithms.cpd as cpd_mod
    from tpuslam.config.configuration import ApproximationType

    calls = []
    original = cpd_mod.cpd_estep_fgt

    def spy(*args, **kwargs):
        calls.append(1)
        return original(*args, **kwargs)

    monkeypatch.setattr(cpd_mod, "cpd_estep_fgt", spy)
    before = (rng.random((200, 3)) * 4.0).astype(np.float32)
    after = (before + 0.2).astype(np.float32)
    # unusual static fgt_k forces a fresh trace so the spy is seen
    cpd_mod.cpd_register(
        pad_cloud(before), pad_cloud(after),
        weight=0.1, max_iterations=3,
        approximation_type=ApproximationType.Full,
        use_fgt=True, fgt_k=47,
    )
    assert calls, "cpd_estep_fgt was never traced"


def test_cpd_register_hybrid_split_runs_both_phases(rng):
    """Hybrid + use_fgt runs as two specialized while_loops (no in-loop
    lax.cond; see cpd_register).  The recorded sigma^2 trajectory must
    cross the 0.015*sigma0^2 switch — i.e. BOTH the FGT fast loop and
    the truncated-exact slow loop executed — and still recover the
    transform."""
    from tests.conftest import random_rigid
    from tpuslam.algorithms.cpd import cpd_register, sigma_squared_init
    from tpuslam.config.configuration import ApproximationType

    before = (rng.random((300, 3)) * 6.0 - 3.0).astype(np.float32)
    r, t = random_rigid(rng, angle=0.15, trans=0.3)
    after = (before @ r.T + t)[rng.permutation(300)].astype(np.float32)
    cb, ca = pad_cloud(before), pad_cloud(after)
    s0 = float(
        sigma_squared_init(cb.points, cb.mask(), ca.points, ca.mask())
    )
    result = cpd_register(
        cb, ca, weight=0.1, max_iterations=150, tolerance=1e-6,
        approximation_type=ApproximationType.Hybrid,
        use_fgt=True, fgt_k=64, record_history=True,
    )
    iters = int(result.iterations)
    hist = np.asarray(result.history)[:iters, 0]  # sigma^2 per iteration
    switch = 0.015 * s0
    assert hist[0] > switch, "run never saw the fast phase"
    assert hist[-1] <= switch, "run never reached the slow phase"
    rot = np.asarray(result.transform.rotation)
    trans = np.asarray(result.transform.translation)
    scale = float(result.transform.scale)
    mse = np.mean(
        np.sum(
            (scale * (before @ rot.T) + trans - (before @ r.T + t)) ** 2,
            -1,
        )
    )
    assert mse < 1e-2
