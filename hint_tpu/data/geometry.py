"""Pure-numpy 2-D computational geometry.

The reference leans on shapely for shape generation and metrics
(/root/reference/data.py:85-100,205-208; /root/reference/best_shape_fit.py:133-139,
265-271). shapely is not available in this image, and the operations needed
are narrow, so they are implemented here from first principles:

* ``circle_polygon``     — shapely's ``Point.buffer`` (circle discretization);
* ``convex_intersection``— Sutherland–Hodgman clip (circles are convex, so the
                           lens = circle ∩ circle is exact on the polygons);
* ``rect_union_outline`` — boundary walk of the union of two axis-aligned
                           rectangles (the plus shape before rotation);
* ``polygon_area``       — shoelace;
* ``points_in_polygon``  — vectorized even-odd (matches the fixing behavior
                           of shapely's ``Polygon(...).buffer(0)`` on mildly
                           self-intersecting curve polygons);
* ``iou_and_dice``       — rasterized even-odd area overlap (resolution-
                           controlled; default grid keeps the error well below
                           the metric's meaningful precision);
* ``hausdorff``          — max/avg two-sided nearest distances
                           (best_shape_fit.py:143-149).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def circle_polygon(cx: float, cy: float, r: float, resolution: int = 16) -> np.ndarray:
    """Points on a circle, CCW, no closing duplicate. ``4*resolution`` points
    (shapely ``buffer`` convention: resolution = segments per quarter)."""
    n = 4 * resolution
    theta = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    return np.stack([cx + r * np.cos(theta), cy + r * np.sin(theta)], axis=1)


def polygon_area(poly: np.ndarray) -> float:
    """Signed shoelace area (positive for CCW)."""
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def ensure_ccw(poly: np.ndarray) -> np.ndarray:
    return poly if polygon_area(poly) >= 0 else poly[::-1]


def convex_intersection(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip ``subject`` by convex ``clip`` (both CCW,
    no closing duplicate). Returns the intersection ring (possibly empty).

    The inner pass is vectorized over the subject vertices (one numpy sweep
    per clip edge) — the naive per-vertex Python loop made toy-data
    generation the end-to-end bottleneck on 1-core hosts.
    """
    clip = ensure_ccw(clip)
    pts = ensure_ccw(np.asarray(subject, dtype=np.float64))
    n = len(clip)
    for i in range(n):
        if len(pts) == 0:
            break
        a, b = clip[i], clip[(i + 1) % n]
        ex, ey = b[0] - a[0], b[1] - a[1]
        # signed side of every vertex w.r.t. the clip line (>= 0 is inside)
        side = ex * (pts[:, 1] - a[1]) - ey * (pts[:, 0] - a[0])
        inside = side >= 0
        if inside.all():  # edge cuts nothing — the common case for arcs
            continue
        if not inside.any():
            pts = pts[:0]
            break
        prev = np.concatenate([pts[-1:], pts[:-1]], axis=0)
        prev_in = np.concatenate([inside[-1:], inside[:-1]])
        crossing = inside != prev_in
        # intersection of each crossing segment prev->cur with the clip line
        d = pts - prev
        denom = ex * d[:, 1] - ey * d[:, 0]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (ex * (a[1] - prev[:, 1]) - ey * (a[0] - prev[:, 0])) / denom
        inter = prev + t[:, None] * d
        # each slot i emits: intersection (order 2i) then vertex (order 2i+1)
        order = np.concatenate([2 * np.arange(len(pts))[crossing],
                                2 * np.arange(len(pts))[inside] + 1])
        cand = np.concatenate([inter[crossing], pts[inside]], axis=0)
        pts = cand[np.argsort(order, kind="stable")]
    return np.asarray(pts) if len(pts) else np.zeros((0, 2))


def _seg_intersections_param(p0, p1, q0, q1):
    """Parameter t on segment p0->p1 of its proper intersection with q0->q1,
    or None."""
    d = p1 - p0
    e = q1 - q0
    denom = d[0] * e[1] - d[1] * e[0]
    if abs(denom) < 1e-12:
        return None
    w = q0 - p0
    t = (w[0] * e[1] - w[1] * e[0]) / denom
    u = (w[0] * d[1] - w[1] * d[0]) / denom
    if -1e-12 < t < 1 + 1e-12 and -1e-12 < u < 1 + 1e-12:
        return min(max(t, 0.0), 1.0)
    return None


def _point_strictly_in_rect(p, rect) -> bool:
    (x0, y0), (x1, y1) = rect
    return (x0 + 1e-12) < p[0] < (x1 - 1e-12) and (y0 + 1e-12) < p[1] < (y1 - 1e-12)


def _rect_corners(rect) -> np.ndarray:
    (x0, y0), (x1, y1) = rect
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])  # CCW


def rect_union_outline(rect_a, rect_b) -> np.ndarray:
    """Outline of the union of two overlapping axis-aligned rectangles.

    rect = ((xmin, ymin), (xmax, ymax)). Returns the boundary ring CCW
    without closing duplicate. Assumes the union is simply connected (true
    for the plus-shape generator: both rectangles contain the origin —
    data.py:188-207 guarantees overlap).
    """
    segments = []  # directed (start, end) pieces on the union boundary
    for rect, other in ((rect_a, rect_b), (rect_b, rect_a)):
        corners = _rect_corners(rect)
        ocorners = _rect_corners(other)
        for i in range(4):
            s, e = corners[i], corners[(i + 1) % 4]
            # split at intersections with the other rect's edges
            ts = [0.0, 1.0]
            for j in range(4):
                t = _seg_intersections_param(s, e, ocorners[j], ocorners[(j + 1) % 4])
                if t is not None:
                    ts.append(t)
            ts = sorted(set(ts))
            for t0, t1 in zip(ts[:-1], ts[1:]):
                if t1 - t0 < 1e-12:
                    continue
                mid = s + 0.5 * (t0 + t1) * (e - s)
                if not _point_strictly_in_rect(mid, other):
                    segments.append((s + t0 * (e - s), s + t1 * (e - s)))
    if not segments:
        return _rect_corners(rect_a)
    # chain segments into a loop
    pts = [segments[0][0], segments[0][1]]
    used = {0}
    for _ in range(len(segments) - 1):
        cur = pts[-1]
        best, best_d = None, 1e-9
        for k, (s, e) in enumerate(segments):
            if k in used:
                continue
            d = abs(s[0] - cur[0]) + abs(s[1] - cur[1])
            if d < best_d:
                best, best_d = k, d
        if best is None:
            break
        used.add(best)
        pts.append(segments[best][1])
    ring = np.array(pts)
    # drop closing duplicate and collinear repeats
    if np.allclose(ring[0], ring[-1]):
        ring = ring[:-1]
    keep = [0]
    for i in range(1, len(ring)):
        if not np.allclose(ring[i], ring[keep[-1]]):
            keep.append(i)
    return ensure_ccw(ring[keep])


def points_in_polygon(points: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Vectorized even-odd (crossing number) test.

    points: (N, 2); poly: (M, 2) ring without closing duplicate. Returns (N,)
    bool.
    """
    x, y = points[:, 0][:, None], points[:, 1][:, None]
    x0, y0 = poly[:, 0][None, :], poly[:, 1][None, :]
    x1, y1 = np.roll(poly[:, 0], -1)[None, :], np.roll(poly[:, 1], -1)[None, :]
    cond = (y0 <= y) != (y1 <= y)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
    crossings = cond & (x < x_int)
    return (np.sum(crossings, axis=1) % 2).astype(bool)


def iou_and_dice(poly_a: np.ndarray, poly_b: np.ndarray, resolution: int = 512) -> Tuple[float, float]:
    """Rasterized IoU and DICE between two (possibly self-intersecting)
    polygons using even-odd filling (shapely ``buffer(0)``-like semantics used
    by the reference at best_shape_fit.py:133-139,265-271)."""
    lo = np.minimum(poly_a.min(axis=0), poly_b.min(axis=0)) - 1e-6
    hi = np.maximum(poly_a.max(axis=0), poly_b.max(axis=0)) + 1e-6
    xs = np.linspace(lo[0], hi[0], resolution)
    ys = np.linspace(lo[1], hi[1], resolution)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    in_a = points_in_polygon(pts, poly_a)
    in_b = points_in_polygon(pts, poly_b)
    inter = float(np.sum(in_a & in_b))
    union = float(np.sum(in_a | in_b))
    a_area = float(np.sum(in_a))
    b_area = float(np.sum(in_b))
    if union == 0:
        return 0.0, 0.0
    return inter / union, 2.0 * inter / max(a_area + b_area, 1.0)


def hausdorff(path_a: np.ndarray, path_b: np.ndarray) -> Tuple[float, float]:
    """(max, avg) of two-sided nearest-point distances
    (best_shape_fit.py:143-149)."""
    diffs = path_a[None, :, :] - path_b[:, None, :]
    dists = np.sqrt(np.sum(diffs * diffs, axis=-1))
    minima = np.append(np.amin(dists, axis=0), np.amin(dists, axis=1))
    return float(np.amax(minima)), float(np.mean(minima))
