"""NumPy/OpenCV/SciPy oracles re-implementing the reference semantics.

These are independent CPU implementations of the behaviors documented in
SURVEY.md (reference backend/app.py:124-269) used as ground truth for the
TPU kernels. cv2 and scipy come from the test environment only — the
framework itself never imports them.
"""

from __future__ import annotations

import numpy as np


def normalize_depth_np(depth: np.ndarray, invert: bool = True) -> np.ndarray:
    """Oracle for ops.depthnorm (reference backend/app.py:190-206)."""
    d = depth.astype(np.float32)
    finite = np.isfinite(d)
    if not np.all(finite):
        med = np.nanmedian(np.where(finite, d, np.nan))
        d = np.where(finite, d, med).astype(np.float32)
    p2, p98 = np.percentile(d, [2, 98])
    if p98 <= p2:
        p2, p98 = float(d.min()), float(d.max())
    if p98 > p2:
        d = np.clip(d, p2, p98)
        d = (d - p2) / (p98 - p2 + 1e-6)
    else:
        d = np.zeros_like(d)
    if invert:
        d = 1.0 - d
    return d


def unproject_np(
    image_bgr: np.ndarray,
    depth_norm: np.ndarray,
    step: int,
    depth_scale: float,
    fov_deg: float | None = None,
):
    """Oracle for ops.unproject: the literal per-pixel loop semantics
    (reference backend/app.py:216-246), given an already-normalized depth.
    """
    h, w = image_bgr.shape[:2]
    cx, cy = w / 2.0, h / 2.0
    if fov_deg and fov_deg > 0:
        f = (w / 2.0) / np.tan(np.deg2rad(fov_deg) / 2.0)
    else:
        f = max(h, w) * 1.2
    pts, cols = [], []
    for v in range(0, h, step):
        for u in range(0, w, step):
            z = float(depth_norm[v, u]) * float(depth_scale)
            zz = z if z != 0.0 else 1e-6
            pts.append([(u - cx) * zz / f, (v - cy) * zz / f, z])
            b, g, r = image_bgr[v, u][:3]
            cols.append([int(r), int(g), int(b)])
    return np.array(pts, dtype=np.float32), np.array(cols, dtype=np.float32)


def statistical_outlier_mask_np(
    points: np.ndarray, nb_neighbors: int = 20, std_ratio: float = 2.0
) -> np.ndarray:
    """Oracle for ops.outlier: Open3D remove_statistical_outlier semantics
    (the algorithm behind reference backend/app.py:262), via scipy cKDTree.
    """
    from scipy.spatial import cKDTree

    pts = points.astype(np.float64)
    n = len(pts)
    tree = cKDTree(pts)
    dists, _ = tree.query(pts, k=nb_neighbors)  # includes self at d=0
    means = dists.mean(axis=1)
    pos = means > 0
    # Open3D's denominators are valid_distances = count_if(mean > 0),
    # NOT the cloud size (PointCloud.cpp RemoveStatisticalOutliers).
    nv = max(int(pos.sum()), 1)
    cloud_mean = means[pos].sum() / nv
    sq_sum = ((means[pos] - cloud_mean) ** 2).sum()
    std = np.sqrt(sq_sum / max(nv - 1, 1))
    threshold = cloud_mean + std_ratio * std
    return pos & (means < threshold)
