"""Non-iterative closest point (Oomori-style one-shot SVD registration).

Capability equivalent of the reference's NICP (CPU ``noniterative.cpp``,
GPU ``nicpcuda.cu``), redesigned for TPU:

The reference computes, per repetition, SVDs of the two *randomly permuted*
centered 3xN cloud matrices and forms ``R = U_after @ U_before.T``
(``noniterative.cpp:25-55``).  The permutations never change the singular
subspaces — they only jitter which of the sign-ambiguous left singular bases
the numerical SVD happens to return, so K repetitions are a randomized walk
over (at most) the 4 proper-rotation sign combinations of
``R = U_after @ diag(s) @ U_before.T`` (``s in {+-1}^3``, ``det(R) = +1``).

Here we enumerate that candidate set *deterministically and exhaustively*:
two 3x3 eigendecompositions of the masked scatter matrices (the N-point work
is a single MXU matmul each), then all sign candidates scored in one vmap.
This supersedes the reference's K-repetition jitter (``nicp-iterations`` /
``nicp-batch-size`` become no-ops, documented divergence): it evaluates the
complete candidate set the reference samples from, in one shot, with no
batched tall SVDs (``parallelsvdhelper.cu:5-123``) and no stream/thread
machinery.

Approximation-ladder semantics preserved (``noniterative.cpp:57-284``):

* ``None``   — every candidate is scored *exactly*: a fixed random subcloud
  of ``before`` (``GetSubcloud``, ``common.cpp:25-37``) is transformed, NN-
  matched against ``after`` (max distance 1e6, ``noniterative.cpp:73``) and
  the correspondence MSE is the score.
* ``Full``   — candidates ranked by the crude approximated error (MSE of the
  centered clouds in index order under R alone, ``noniterative.cpp:53`` via
  the deprecated overload ``common.cpp:233``); best 1 exactly rescored.
* ``Hybrid`` — best 5 by approximated error exactly rescored, best wins.
  With 4 candidates total this rescoring covers the full set.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpuslam.algorithms.icp import RegistrationResult
from tpuslam.config.configuration import ApproximationType
from tpuslam.core.types import LANE, Cloud, RigidTransform, round_up
from tpuslam.ops.nn import nearest_neighbors

BIG = jnp.float32(3.4e38)
# the reference's fixed NN acceptance radius for exact rescoring
# (noniterative.cpp:73)
MAX_DISTANCE_FOR_COMPARISON = 1e6

# all 8 sign matrices diag(s), s in {+1,-1}^3
_SIGNS = jnp.array(
    [[sx, sy, sz] for sx in (1.0, -1.0) for sy in (1.0, -1.0)
     for sz in (1.0, -1.0)],
    dtype=jnp.float32,
)  # f32[8, 3]


def masked_centroid(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    total = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(points * mask[:, None], axis=0) / total


def principal_axes(
    points: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Left singular basis of the centered 3xN cloud matrix, descending.

    Computed as eigh of the 3x3 scatter ``C = X_c^T X_c`` — one MXU matmul
    over N instead of a tall-matrix SVD (the reference's cloud-size gesvd,
    ``parallelsvdhelper.cu:60-79``).  Returns (U f32[3,3] columns = axes,
    eigenvalues f32[3] descending).
    """
    mu = masked_centroid(points, mask)
    xc = (points - mu) * mask[:, None]
    c = jnp.einsum("nr,nc->rc", xc, xc, precision=jax.lax.Precision.HIGHEST)
    evals, evecs = jnp.linalg.eigh(c)  # ascending
    return evecs[:, ::-1], evals[::-1]


class _Candidates(NamedTuple):
    rotations: jnp.ndarray  # f32[8, 3, 3]
    translations: jnp.ndarray  # f32[8, 3]
    proper: jnp.ndarray  # bool[8] — det(R) == +1


def _enumerate_candidates(
    u_before: jnp.ndarray,
    u_after: jnp.ndarray,
    mu_before: jnp.ndarray,
    mu_after: jnp.ndarray,
) -> _Candidates:
    # R_s = U_a diag(s) U_b^T ; det(R_s) = prod(s) det(U_a) det(U_b)
    rots = jnp.einsum("rk,sk,ck->src", u_after, _SIGNS, u_before)
    det_pair = jnp.linalg.det(u_after) * jnp.linalg.det(u_before)
    dets = jnp.prod(_SIGNS, axis=1) * det_pair
    trans = mu_after[None, :] - jnp.einsum("src,c->sr", rots, mu_before)
    return _Candidates(rotations=rots, translations=trans, proper=dets > 0)


def _approximated_errors(
    cands: _Candidates,
    centered_before: jnp.ndarray,
    centered_after: jnp.ndarray,
    pair_mask: jnp.ndarray,
) -> jnp.ndarray:
    """The reference's crude per-candidate score (``noniterative.cpp:53``):
    MSE of rotated centered-before vs centered-after in index order, over the
    first min(N, M) rows.  Only meaningful relative to other candidates."""
    n_pairs = jnp.maximum(jnp.sum(pair_mask), 1.0)

    def one(r):
        diff = (centered_before @ r.T - centered_after) * pair_mask[:, None]
        return jnp.sum(diff * diff) / n_pairs

    return jax.vmap(one)(cands.rotations)


def _exact_errors(
    cands: _Candidates,
    subcloud: jnp.ndarray,
    sub_mask: jnp.ndarray,
    after: Cloud,
    use_pallas=None,
) -> jnp.ndarray:
    """Exact rescore (``noniterative.cpp:91-96``): transform the subcloud,
    NN-match against the full after cloud, correspondence MSE.

    All candidates' transformed subclouds are flattened into ONE NN call —
    one kernel launch, and no vmap-of-pallas lowering (the subcloud row
    count is lane-aligned by the caller)."""
    c = cands.rotations.shape[0]
    k = subcloud.shape[0]
    transformed = (
        jnp.einsum("crk,nk->cnr", cands.rotations, subcloud)
        + cands.translations[:, None, :]
    )  # [C, k, 3]
    _, dist = nearest_neighbors(
        transformed.reshape(c * k, 3), after.points, after.count,
        use_pallas=use_pallas,
    )
    dist = dist.reshape(c, k)
    w = jnp.logical_and(
        dist < MAX_DISTANCE_FOR_COMPARISON, sub_mask[None, :] > 0
    ).astype(jnp.float32)
    return jnp.sum(dist * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)


@partial(
    jax.jit,
    static_argnames=("approximation_type", "subcloud_size", "use_pallas"),
)
def nicp_register(
    before: Cloud,
    after: Cloud,
    eps: float = 1e-3,
    approximation_type: ApproximationType = ApproximationType.NONE,
    subcloud_size: int = 1000,
    seed: int = 0,
    use_pallas=None,
) -> RegistrationResult:
    """One-shot registration of ``before`` onto ``after``.

    Returns the best candidate transform, the number of candidates scored
    (the analog of the reference's ``repetitions`` out-param) and its exact
    or approximated error per the mode semantics above.
    """
    mask_b = before.mask()
    mask_a = after.mask()
    mu_b = masked_centroid(before.points, mask_b)
    mu_a = masked_centroid(after.points, mask_a)
    u_b, _ = principal_axes(before.points, mask_b)
    u_a, _ = principal_axes(after.points, mask_a)
    cands = _enumerate_candidates(u_b, u_a, mu_b, mu_a)

    # subcloud of before for exact scoring (common.cpp:25-37): random valid
    # rows; if the cloud is smaller than subcloud_size the whole cloud is
    # used and the shortfall is weight-masked out.  The row count is
    # rounded up to the TPU lane width for the Pallas NN kernel; rows
    # beyond the requested size carry zero weight, preserving the exact
    # subcloud-size semantics.
    k_req = min(subcloud_size, before.padded_size)
    k = min(round_up(k_req, LANE), before.padded_size)
    key = jax.random.PRNGKey(seed)
    scores = jax.random.uniform(key, (before.padded_size,))
    scores = jnp.where(mask_b > 0, scores, -1.0)  # invalid rows lose
    # top_k beats a full argsort (O(N log k) vs O(N log^2 N) bitonic) —
    # at 1M points the argsort dominated the whole NICP run
    _, order = jax.lax.top_k(scores, k)
    subcloud = before.points[order]
    sub_mask = mask_b[order] * (
        jnp.arange(k, dtype=jnp.int32) < k_req
    ).astype(jnp.float32)

    improper_penalty = jnp.where(cands.proper, 0.0, BIG)

    if approximation_type == ApproximationType.Full:
        # the crude index-order score is only consumed by Full's ranking
        # (None/Hybrid exact-rescore every candidate below)
        centered_b = (before.points - mu_b) * mask_b[:, None]
        centered_a = (after.points - mu_a) * mask_a[:, None]
        n_pair = jnp.minimum(before.count, after.count)
        pair_mask = (
            jnp.arange(before.padded_size, dtype=jnp.int32) < n_pair
        ).astype(jnp.float32)
        # truncate/pad the after side to the before size for index pairing
        m = before.padded_size
        ca = (
            centered_a[:m]
            if centered_a.shape[0] >= m
            else jnp.pad(centered_a, ((0, m - centered_a.shape[0]), (0, 0)))
        )
        approx_err = _approximated_errors(cands, centered_b, ca, pair_mask)
        approx_err = approx_err + improper_penalty

        # rank by crude score, exactly rescore only the winner
        best_by_approx = jnp.argmin(approx_err)
        one = _Candidates(
            rotations=cands.rotations[best_by_approx][None],
            translations=cands.translations[best_by_approx][None],
            proper=cands.proper[best_by_approx][None],
        )
        exact = _exact_errors(one, subcloud, sub_mask, after, use_pallas)
        best = jnp.int32(0)
        rotation = one.rotations[0]
        translation = one.translations[0]
        error = exact[0]
    else:
        # None: exact-score every candidate (noniterative.cpp:224-236);
        # Hybrid: top-5 by approx rescored — with 4 proper candidates the
        # rescored set is the full set, so both modes score all candidates.
        exact = _exact_errors(cands, subcloud, sub_mask, after, use_pallas)
        exact = exact + improper_penalty
        best = jnp.argmin(exact)
        rotation = cands.rotations[best]
        translation = cands.translations[best]
        error = exact[best]

    n_scored = jnp.sum(cands.proper.astype(jnp.int32))
    return RegistrationResult(
        transform=RigidTransform(
            rotation=rotation,
            translation=translation,
            scale=jnp.float32(1.0),
        ),
        iterations=n_scored,
        error=error,
    )
