"""Cloud loaders reproducing the reference's Assimp merge semantics.

The reference loads models with Assimp (``loader.cpp:30-66``) and merges all
mesh vertex buffers into one cloud (``loader.cpp:21-28``).  Two observable
semantics matter and are reproduced here:

* **OBJ**: Assimp's OBJ importer emits one vertex per face-corner reference
  (no deduplication without ``aiProcess_JoinIdenticalVertices``), so
  ``bunny.obj`` with 2503 unique ``v`` lines and 4968 triangular faces yields
  4968*3 = 14904 merged points (``testset.cpp:22`` size table confirms).
  The merged order is faces in file order, corners in face order.
* **OFF**: Assimp's OFF importer keeps the vertex list as-is, so
  ``noise_00_bunny.off`` (header ``11146 22174 66522``) yields 11146 points.

A missing/unparsable file returns an empty cloud like the reference
(``common.cpp:16-23``).

If the native C++ loader extension (``tpuslam/native``) is built, it is used
for the OBJ hot path; the pure-Python implementation is the fallback and the
behavioral oracle.
"""

from __future__ import annotations

import os

import numpy as np


def _load_obj_python(path: str) -> np.ndarray:
    """Parse OBJ: positions from ``v`` lines, then expand per face corner."""
    vertices: list[tuple[float, float, float]] = []
    faces: list[list[int]] = []
    with open(path, "r", errors="replace") as fh:
        for line in fh:
            if line.startswith("v "):
                parts = line.split()
                vertices.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    # "f v", "f v/vt", "f v/vt/vn", "f v//vn"; negative = relative
                    s = tok.split("/")[0]
                    if not s:
                        continue
                    i = int(s)
                    idx.append(i - 1 if i > 0 else len(vertices) + i)
                if len(idx) >= 3:
                    faces.append(idx)
    if not vertices:
        return np.zeros((0, 3), dtype=np.float32)
    verts = np.asarray(vertices, dtype=np.float32)
    if not faces:
        # point-cloud OBJ without faces: the vertex list itself
        return verts
    flat = np.concatenate([np.asarray(f, dtype=np.int64) for f in faces])
    return verts[flat]


def _load_off(path: str) -> np.ndarray:
    """Parse OFF: the raw vertex list (Assimp does not duplicate here)."""
    with open(path, "r", errors="replace") as fh:
        header = fh.readline().strip()
        if not header.startswith("OFF"):
            return np.zeros((0, 3), dtype=np.float32)
        # header may carry counts on the same line ("OFF 8 6 12")
        rest = header[3:].split()
        counts: list[int] = [int(t) for t in rest] if rest else []
        while len(counts) < 3:
            line = fh.readline()
            if not line:
                return np.zeros((0, 3), dtype=np.float32)
            line = line.split("#")[0].strip()
            if not line:
                continue
            counts.extend(int(t) for t in line.split())
        nv = counts[0]
        # preallocate, but bounded by what the file could possibly hold
        # (a vertex row consumes at least one input byte): a corrupt
        # header like "OFF 99999999999 0 0" over a short body must yield
        # the partial prefix actually present, not an allocation failure
        # — the native parser (tpuslam/native/loader.cpp) bounds its
        # reserve() the same way
        # a vertex row is at least 6 bytes ("0 0 0\n"; +16 covers a
        # final unterminated row), so rows present <= st_size/6 + 1
        cap = min(nv, os.fstat(fh.fileno()).st_size // 6 + 16)
        out = np.empty((cap, 3), dtype=np.float32)
        filled = 0
        while filled < nv:
            line = fh.readline()
            if not line:
                break
            line = line.split("#")[0].strip()
            if not line:
                continue
            parts = line.split()
            out[filled, 0] = float(parts[0])
            out[filled, 1] = float(parts[1])
            out[filled, 2] = float(parts[2])
            filled += 1
        return out[:filled].copy()


# Relative cloud paths (the reference's configs use e.g. "data/bunny.obj")
# resolve against the CWD first, then these roots.  The reference checkout's
# bundled data is mounted read-only at /root/reference.
SEARCH_ROOTS = [
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "/root/reference",
]


def resolve_path(path: str) -> str:
    if os.path.isabs(path) or os.path.exists(path):
        return path
    for root in SEARCH_ROOTS:
        candidate = os.path.join(root, path)
        if os.path.exists(candidate):
            return candidate
    return path


def synthetic_cloud(n: int) -> np.ndarray:
    """Deterministic synthetic cloud of >= n points: the bundled bunny tiled
    on a grid with per-tile jitter.  Stands in for the reference's large
    models (rose/mustang/airbus, 300k-1.4M points) that are missing blobs in
    this checkout (SURVEY §2.8, BASELINE.md) — benchmark rows built on it
    are labeled by the ``synthetic://`` path."""
    base = load_cloud("data/bunny.obj")
    if len(base) == 0:  # reference data unavailable: uniform fallback
        rng = np.random.Generator(np.random.PCG64(n))
        return (rng.random((n, 3), dtype=np.float64) * 10.0).astype(
            np.float32
        )
    reps = -(-n // len(base))  # ceil
    side = int(np.ceil(reps ** (1.0 / 3.0)))
    spread = base.max(axis=0) - base.min(axis=0)
    rng = np.random.Generator(np.random.PCG64(n))
    tiles = []
    for i in range(reps):
        ix, iy, iz = i % side, (i // side) % side, i // (side * side)
        offset = np.array([ix, iy, iz], dtype=np.float32) * spread * 1.1
        jitter = (rng.random(3, dtype=np.float64) * 0.05 * spread).astype(
            np.float32
        )
        tiles.append(base + offset + jitter)
    return np.concatenate(tiles, axis=0)[: max(n, 1)]


def load_cloud(path: str) -> np.ndarray:
    """Load a cloud as ``f32[N, 3]``; empty array on failure
    (mirrors ``LoadCloud``, ``common.cpp:16-23``)."""
    if path.startswith("synthetic://"):
        try:
            n = int(path[len("synthetic://"):])
            if n <= 0:
                return np.zeros((0, 3), dtype=np.float32)
            return synthetic_cloud(n)
        except (ValueError, MemoryError):
            # same contract as a malformed file: empty cloud, no raise
            return np.zeros((0, 3), dtype=np.float32)
    path = resolve_path(path)
    if not os.path.exists(path):
        return np.zeros((0, 3), dtype=np.float32)
    ext = os.path.splitext(path)[1].lower()
    try:
        if ext == ".obj":
            try:
                from tpuslam.native import bindings as _native

                if _native.available():
                    return _native.load_obj(path)
            except ImportError:
                pass
            return _load_obj_python(path)
        if ext == ".off":
            try:
                from tpuslam.native import bindings as _native

                if _native.available():
                    return _native.load_off(path)
            except ImportError:
                pass
            return _load_off(path)
    except Exception:  # noqa: BLE001 — unparsable => empty, like Assimp failure
        return np.zeros((0, 3), dtype=np.float32)
    return np.zeros((0, 3), dtype=np.float32)
