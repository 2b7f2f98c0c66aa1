"""Disk checkpoint/resume for long chunked registrations (SURVEY §5.4).

The reference has no checkpointing (its runs are seconds–minutes,
``documentation.tex``); at production scale a million-point ICP run is
minutes of device time dispatched in warm-started chunks
(``icp_register_chunked``), and each chunk boundary is already the
exact loop state (``ICPResume``).  This module makes that boundary
durable: ``save_icp_checkpoint`` after a chunk, ``load_icp_checkpoint``
to continue in a new process — same trajectory, same iteration count.

Format: one ``.npz`` with the resume leaves plus a JSON metadata blob
(cloud shapes/counts and the loop parameters) that loading validates,
so a checkpoint cannot silently resume a different registration.
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import numpy as np

from tpuslam.algorithms.icp import ICPResume
from tpuslam.ops.nn_hier import HierState

_VERSION = 1


def save_icp_checkpoint(
    path: str, resume: ICPResume, meta: Optional[dict] = None
) -> None:
    """Write ``resume`` (transform, guard state, optional hier-NN warm
    state, iterations done) and ``meta`` to ``path`` as ``.npz``."""
    arrays = {
        "rotation": np.asarray(resume.rotation, np.float32),
        "translation": np.asarray(resume.translation, np.float32),
        "error": np.asarray(resume.error, np.float32),
        "done_before": np.asarray(resume.done_before, np.int32),
    }
    if resume.prev_error is not None:
        arrays["prev_error"] = np.asarray(resume.prev_error, np.float32)
    if resume.nn is not None:
        arrays["nn_prev_dist"] = np.asarray(resume.nn.prev_dist, np.float32)
        arrays["nn_prev_pos"] = np.asarray(resume.nn.prev_pos, np.float32)
        arrays["nn_warm"] = np.asarray(resume.nn.warm, bool)
        arrays["nn_sparse"] = np.asarray(resume.nn.sparse, bool)
    header = json.dumps(
        {"version": _VERSION, "kind": "icp", "meta": meta or {}}
    )
    arrays["header"] = np.frombuffer(header.encode(), dtype=np.uint8)
    with open(path, "wb") as fh:
        np.savez(fh, **arrays)


def load_icp_checkpoint(
    path: str, expect_meta: Optional[dict] = None
) -> Tuple[ICPResume, dict]:
    """Load a checkpoint; if ``expect_meta`` is given, every key in it
    must match the stored metadata exactly (shape/parameter guard)."""
    with np.load(path) as z:
        header = json.loads(bytes(z["header"]).decode())
        if header.get("version") != _VERSION:
            raise ValueError(
                f"checkpoint version {header.get('version')} != {_VERSION}"
            )
        if header.get("kind") != "icp":
            raise ValueError(
                f"checkpoint mismatch on kind: stored "
                f"{header.get('kind')!r}, expected 'icp'"
            )
        meta = header.get("meta", {})
        if expect_meta:
            for key, want in expect_meta.items():
                got = meta.get(key)
                if got != want:
                    raise ValueError(
                        f"checkpoint mismatch on {key!r}: stored {got!r}, "
                        f"expected {want!r}"
                    )
        nn = None
        if "nn_prev_dist" in z:
            nn = HierState(
                prev_dist=z["nn_prev_dist"],
                prev_pos=z["nn_prev_pos"],
                warm=z["nn_warm"],
                sparse=z["nn_sparse"],
            )
        resume = ICPResume(
            rotation=z["rotation"],
            translation=z["translation"],
            error=z["error"],
            nn=nn,
            done_before=int(z["done_before"]),
            prev_error=z["prev_error"] if "prev_error" in z else None,
        )
    return resume, meta


def save_cpd_checkpoint(
    path: str, resume, meta: Optional[dict] = None
) -> None:
    """Write a ``CPDResume`` (full EM loop state at a chunk boundary) to
    ``path`` as ``.npz`` (see ``cpd_register_chunked``)."""
    arrays = {
        "rotation": np.asarray(resume.rotation, np.float32),
        "translation": np.asarray(resume.translation, np.float32),
        "scale": np.asarray(resume.scale, np.float32),
        "sigma2": np.asarray(resume.sigma2, np.float32),
        "log_likelihood": np.asarray(resume.log_likelihood, np.float32),
        "ntol": np.asarray(resume.ntol, np.float32),
        "done_before": np.asarray(resume.done_before, np.int32),
    }
    header = json.dumps(
        {"version": _VERSION, "kind": "cpd", "meta": meta or {}}
    )
    arrays["header"] = np.frombuffer(header.encode(), dtype=np.uint8)
    with open(path, "wb") as fh:
        np.savez(fh, **arrays)


def load_cpd_checkpoint(path: str, expect_meta: Optional[dict] = None):
    """Load a CPD checkpoint written by :func:`save_cpd_checkpoint`;
    metadata keys in ``expect_meta`` must match exactly."""
    from tpuslam.algorithms.cpd import CPDResume

    with np.load(path) as z:
        header = json.loads(bytes(z["header"]).decode())
        if header.get("version") != _VERSION:
            raise ValueError(
                f"checkpoint version {header.get('version')} != {_VERSION}"
            )
        if header.get("kind") != "cpd":
            raise ValueError(
                f"checkpoint mismatch on kind: stored "
                f"{header.get('kind')!r}, expected 'cpd'"
            )
        meta = header.get("meta", {})
        if expect_meta:
            for key, want in expect_meta.items():
                got = meta.get(key)
                if got != want:
                    raise ValueError(
                        f"checkpoint mismatch on {key!r}: stored {got!r}, "
                        f"expected {want!r}"
                    )
        resume = CPDResume(
            rotation=z["rotation"],
            translation=z["translation"],
            scale=z["scale"],
            sigma2=z["sigma2"],
            log_likelihood=z["log_likelihood"],
            ntol=z["ntol"],
            done_before=int(z["done_before"]),
        )
    return resume, meta
