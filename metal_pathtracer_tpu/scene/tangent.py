"""Tangent basis generation.

Implements the reference's fallback UV-derivative accumulation
(reference: src/assets/TangentGen.mm:24-110): per-face tangents from UV
deltas accumulated per vertex, Gram-Schmidt orthogonalized against the
normal, with handedness from the bitangent triple product. (The reference
prefers MikkTSpace when available; vendoring mikktspace.c into native/ is
tracked for a later round — this fallback is what it uses for meshes
MikkTSpace rejects.)
"""

from __future__ import annotations

import numpy as np


def generate_tangents(positions: np.ndarray, normals: np.ndarray,
                      uvs: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """-> (V,4) float32 tangent xyz + handedness w."""
    v = len(positions)
    tan = np.zeros((v, 3), np.float64)
    bitan = np.zeros((v, 3), np.float64)

    i0, i1, i2 = faces[:, 0], faces[:, 1], faces[:, 2]
    e1 = positions[i1] - positions[i0]
    e2 = positions[i2] - positions[i0]
    duv1 = uvs[i1] - uvs[i0]
    duv2 = uvs[i2] - uvs[i0]
    det = duv1[:, 0] * duv2[:, 1] - duv2[:, 0] * duv1[:, 1]
    r = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
    t = (e1 * duv2[:, 1:2] - e2 * duv1[:, 1:2]) * r[:, None]
    b = (e2 * duv1[:, 0:1] - e1 * duv2[:, 0:1]) * r[:, None]

    for c in (i0, i1, i2):
        np.add.at(tan, c, t)
        np.add.at(bitan, c, b)

    n = normals.astype(np.float64)
    # Gram-Schmidt: t' = normalize(t - n * (n . t))
    t_ortho = tan - n * (n * tan).sum(-1, keepdims=True)
    ln = np.linalg.norm(t_ortho, axis=-1, keepdims=True)
    fallback = np.zeros_like(t_ortho)
    fallback[:, 0] = 1.0
    t_ortho = np.where(ln > 1e-9, t_ortho / np.maximum(ln, 1e-20), fallback)

    handed = np.where((np.cross(n, t_ortho) * bitan).sum(-1) < 0.0, -1.0, 1.0)
    out = np.zeros((v, 4), np.float32)
    out[:, :3] = t_ortho
    out[:, 3] = handed
    return out
