"""Fourier-curve toy inverse problems.

Re-implementation of the reference data models
(/root/reference/data.py:20-276) with the shapely geometry replaced by
hint_tpu.data.geometry (shapely is unavailable; SURVEY.md §2). The math is
identical:

* curves are 2-D closed polylines encoded as complex Fourier coefficients
  (DFT of the polyline, data.py:42-49); flattened as [real | imag]
  (data.py:30-40);
* ``LensShapeModel``: intersection of two random circles → 5 complex 2-D
  coefficients, x ∈ R^20; forward process y ∈ R^2 = vector between the two
  most distant curve points + N(0, 0.05²) noise (data.py:76-139);
* ``PlusShapeModel``: union of two random rectangles, densified, rotated,
  shifted → 25 complex 2-D coefficients, x ∈ R^100; forward process
  y ∈ R^4 = (center_x, center_y, angle, width ratio) (data.py:167-252),
  including target-conditioned generation for the ABC baseline
  (data.py:188-227).

Generation is host-side numpy (it feeds the device pipeline; the flows never
see this code under jit).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np
from numpy.random import rand, randn

from hint_tpu.data import geometry as geo


class FourierCurveModel(ABC):
    n_parameters = 4  # must be an uneven number times four
    n_observations = 1
    name = ""
    # True when forward_process maps x to the model's actual observation
    # space; the plus shape's forward map is only defined at generation time
    # (labels from generate_plus_shape(forward=True), data.py:224-225)
    has_forward_process = True

    def flatten_coeffs(self, coeffs: np.ndarray) -> np.ndarray:
        batch_size = coeffs.shape[0]
        coeffs = coeffs.reshape(batch_size, -1)
        return np.concatenate([coeffs.real, coeffs.imag], axis=1)

    def unflatten_coeffs(self, coeffs: np.ndarray) -> np.ndarray:
        batch_size = coeffs.shape[0]
        real, imag = np.split(coeffs, 2, axis=1)
        out = real.astype(np.complex64)
        out.imag = imag
        return out.reshape(batch_size, 2, -1)

    def fourier_coeffs(self, points: np.ndarray, n_coeffs: int) -> np.ndarray:
        """DFT of the (N, 2) polyline: 2M+1 coefficients, m = -M..M
        (data.py:42-49)."""
        n = len(points)
        m = min(n // 2, n_coeffs // 2)
        ms = np.arange(-m, m + 1)
        return (
            np.sum(
                points[:, :, None]
                * np.exp(-2 * np.pi * 1j * ms[None, None, :] * np.arange(n)[:, None, None] / n),
                axis=0,
            )
            / n
        )

    def trace_fourier_curves(self, coeffs: np.ndarray, n_points: int = 100) -> np.ndarray:
        """Sample points along the curves; coeffs (B, 2, 2M+1) → (B, n, 2)
        (data.py:51-57). Same sum; evaluated as one complex matmul over the
        coefficient axis instead of a (B, n, 2, 2M+1) broadcast temp (which
        allocated ~650 MB per 4000-curve call and dominated eval wall-clock)."""
        t = np.linspace(0, 1, n_points)
        ms = np.arange(-(coeffs.shape[-1] // 2), coeffs.shape[-1] // 2 + 1)
        basis = np.exp(2 * np.pi * 1j * t[:, None] * ms[None, :])  # (n, 2M+1)
        return np.swapaxes(coeffs @ basis.T, 1, 2).real

    @abstractmethod
    def sample_prior(self, n_samples: int, flat: bool = True) -> np.ndarray: ...

    @abstractmethod
    def sample_joint(self, n_samples: int, flat: bool = True): ...

    @abstractmethod
    def forward_process(self, x: np.ndarray, noise: float = 0.05) -> np.ndarray: ...


class LensShapeModel(FourierCurveModel):
    n_parameters = 4 * 5  # 5 complex 2d Fourier coefficients
    n_observations = 2
    name = "lens-shape"

    def __init__(self):
        self.name = "lens-shape1"  # cache-name quirk kept for parity (data.py:83)

    def generate_lens_shape(self) -> np.ndarray:
        """Intersection of two random circles, centered with noise
        (data.py:85-100)."""
        x0, y0, r0 = 0.0, 0.0, 1 + rand()
        c0 = geo.circle_polygon(x0, y0, r0)
        r1 = 2 * r0
        theta = 2 * np.pi * rand()
        d = 0.8 * (r0 + r1)
        x1, y1 = x0 + d * np.sin(theta), y0 + d * np.cos(theta)
        c1 = geo.circle_polygon(x1, y1, r1)
        ring = geo.convex_intersection(c0, c1)
        # close the ring like shapely's exterior.coords (data.py:98)
        coords = np.concatenate([ring, ring[:1]], axis=0)
        coords -= coords.mean(axis=0) + 0.5 * randn(1, 2)
        return coords

    def sample_prior(self, n_samples: int, flat: bool = True) -> np.ndarray:
        samples = [
            self.fourier_coeffs(self.generate_lens_shape(), n_coeffs=self.n_parameters // 4)
            for _ in range(n_samples)
        ]
        out = np.stack(samples)
        return self.flatten_coeffs(out) if flat else out

    def sample_joint(self, n_samples: int, flat: bool = True):
        samples, labels = [], []
        for _ in range(n_samples):
            coords = self.generate_lens_shape()
            sample = self.fourier_coeffs(coords, n_coeffs=self.n_parameters // 4)
            samples.append(sample[None, ...])
            labels.append(self.forward_process(self.flatten_coeffs(samples[-1])))
        samples = np.concatenate(samples)
        labels = np.concatenate(labels)
        return (self.flatten_coeffs(samples) if flat else samples), labels

    def forward_process(self, x: np.ndarray, noise: float = 0.05) -> np.ndarray:
        """y = vector between the two most distant curve points + noise
        (data.py:127-139). Batched: squared pairwise distances per chunk
        replace the per-curve ``squareform(pdist)`` loop (argmax of d² picks
        the reference's index — row-major first-max, monotone map); the noise
        draw is the same single ``randn(B, 2)`` call."""
        coeffs = self.unflatten_coeffs(x)
        points = self.trace_fourier_curves(coeffs)  # (B, n, 2)
        n = points.shape[1]
        features = np.empty((len(points), 2), points.dtype)
        chunk = max(1, 2**21 // (n * n))  # ~200 curves/chunk: L2-sized temps
        for s in range(0, len(points), chunk):
            # Two passes. Screen: f32 squared distances (cheap). A curve is
            # "safe" when its top-two squared distances are separated by more
            # than f32 error — then the f32 argmax equals the reference's.
            # Ambiguous curves (≈ the ~4% whose diameter touches the
            # duplicated endpoint of the closed curve, which ties EXACTLY)
            # are re-done in f64 + sqrt, bit-matching scipy.pdist's value and
            # row-major first-max tie-break — a tie broken the other way
            # flips the feature's sign, so exactness matters there.
            p32 = points[s : s + chunk]
            dx = p32[:, :, None, 0] - p32[:, None, :, 0]
            dy = p32[:, :, None, 1] - p32[:, None, :, 1]
            d2 = dx * dx + dy * dy
            # the matrix is symmetric: every max ties its mirror exactly.
            # The reference's row-major first-max always lands on the upper
            # triangle (i < j), so mask the rest before screening.
            d2[:, ~np.triu(np.ones((n, n), bool), 1)] = -np.inf
            flat = d2.reshape(len(p32), -1)
            flat_idx = flat.argmax(axis=1)
            rows = np.arange(len(p32))
            top = flat[rows, flat_idx]
            flat[rows, flat_idx] = -np.inf
            second = flat.max(axis=1)
            ambiguous = (top - second) <= 1e-4 * top
            i0, i1 = np.unravel_index(flat_idx, (n, n))
            for r in np.nonzero(ambiguous)[0]:
                q = points[s + r].astype(np.float64)
                dq = np.sqrt(
                    (q[:, None, 0] - q[None, :, 0]) ** 2
                    + (q[:, None, 1] - q[None, :, 1]) ** 2
                )
                i0[r], i1[r] = np.unravel_index(dq.argmax(), (n, n))
            delta = p32[rows, i1].astype(np.float64) - p32[rows, i0].astype(np.float64)
            features[s : s + chunk, 0] = delta[:, 1]
            features[s : s + chunk, 1] = delta[:, 0]
        return features + noise * randn(*features.shape)


class PlusShapeModel(FourierCurveModel):
    n_parameters = 4 * 25  # 25 complex 2d Fourier coefficients
    n_observations = 4
    has_forward_process = False  # forward_process estimates centers only
    name = "plus-shape"

    def densify_polyline(self, coords: np.ndarray, max_dist: float = 0.2) -> np.ndarray:
        """Insert points between consecutive vertices that are too far apart
        (data.py:176-186)."""
        pieces = []
        for i in range(len(coords)):
            start = coords[(i + 1) % len(coords), :]
            end = coords[i, :]
            n = max(1, int(round(np.max(np.abs(end - start)) / max_dist)))
            ts = np.linspace(0, 1, n)
            pieces.append(ts[:, None] * start[None, :] + (1 - ts)[:, None] * end[None, :])
        return np.concatenate(pieces)

    def generate_plus_shape(self, forward: bool = False, target=None):
        """Union of two random bars; optionally conditioned on a target
        (center, angle, width ratio) for ABC (data.py:188-227)."""
        xlength = 3 + 2 * rand()
        ylength = 3 + 2 * rand()
        if target is None:
            xwidth = 0.5 + 1.5 * rand()
            ywidth = 0.5 + 1.5 * rand()
        else:
            if target[3] >= 1:
                xwidth = target[3] * 0.5 + (2 - target[3] * 0.5) * rand()
            else:
                xwidth = 0.5 + (2 * target[3] - 0.5) * rand()
            ywidth = xwidth / target[3]
        xshift = -1.5 + 3 * rand()
        yshift = -1.5 + 3 * rand()
        center = np.array([0.0, 0.0])
        xbar = ((xshift - xlength / 2, -xwidth / 2), (xshift + xlength / 2, xwidth / 2))
        ybar = ((-ywidth / 2, yshift - ylength / 2), (ywidth / 2, yshift + ylength / 2))
        coords = geo.rect_union_outline(xbar, ybar)
        coords = self.densify_polyline(coords)
        center -= coords.mean(axis=0)
        coords -= coords.mean(axis=0)
        angle = 0.5 * np.pi * rand() if target is None else target[2]
        rotation = np.array(
            [[np.cos(angle), np.sin(angle)], [-np.sin(angle), np.cos(angle)]]
        )
        coords = np.dot(coords, rotation)
        center = np.dot(center, rotation)
        offset = 0.5 * randn(1, 2)
        coords += offset
        center += offset[0, :]
        if forward:
            return coords, np.array([center[0], center[1], angle, xwidth / ywidth])
        return coords

    def sample_prior(self, n_samples: int, flat: bool = True) -> np.ndarray:
        samples = [
            self.fourier_coeffs(self.generate_plus_shape(), n_coeffs=self.n_parameters // 4)
            for _ in range(n_samples)
        ]
        out = np.stack(samples)
        return self.flatten_coeffs(out) if flat else out

    def sample_joint(self, n_samples: int, flat: bool = True):
        samples, labels = [], []
        for _ in range(n_samples):
            coords, label = self.generate_plus_shape(forward=True)
            samples.append(self.fourier_coeffs(coords, n_coeffs=self.n_parameters // 4))
            labels.append(label)
        samples = np.stack(samples)
        labels = np.stack(labels)
        return (self.flatten_coeffs(samples) if flat else samples), labels

    def forward_process(self, x: np.ndarray, noise: float = 0.0) -> np.ndarray:
        """Recover (center, angle, ratio) is not derivable from coefficients
        alone in closed form; the reference only defines the forward process
        at generation time for the plus shape (labels from
        ``generate_plus_shape(forward=True)``, data.py:224-225). This method
        exists for interface completeness and estimates the center (mean of
        the traced curve); it is not used by training."""
        coeffs = self.unflatten_coeffs(x)
        points = self.trace_fourier_curves(coeffs)
        centers = points.mean(axis=1)
        return centers
