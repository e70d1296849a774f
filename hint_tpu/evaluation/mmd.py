"""Multi-kernel MMD (inverse-multiquadric kernels).

Parity with the reference metric (/root/reference/rejection_sampling.py:56-73):
``k(d²) = Σ_i C_i^{a_i} ((C_i + d²)/a_i)^{-a_i}`` over squared pairwise
distances, with the reference's default width/exponent pairs. Jittable and
TPU-resident (the reference runs it on CUDA tensors).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_WIDTHS_EXPONENTS: Tuple[Tuple[float, float], ...] = (
    (0.5, 1.0),
    (0.2, 1.0),
    (0.2, 0.5),
)  # rejection_sampling.py:56


def _sq_dists(x, y):
    # precision=HIGHEST: measurement code. At default precision the TPU MXU
    # runs these f32 Grams as single bf16 passes (~1e-3 relative), which
    # lands directly in the published MMD values — the same failure mode the
    # round-5 on-chip tie-break audit caught in the lens trace. HIGHEST
    # restores ~f32 accuracy (the reference metric runs f32 CUDA Grams).
    P = jax.lax.Precision.HIGHEST
    xx = jnp.matmul(x, x.T, precision=P)
    yy = jnp.matmul(y, y.T, precision=P)
    xy = jnp.matmul(x, y.T, precision=P)
    rx = jnp.diag(xx)[None, :]
    ry = jnp.diag(yy)[None, :]
    dxx = jnp.clip(rx.T + rx - 2.0 * xx, 0.0, jnp.inf)
    dyy = jnp.clip(ry.T + ry - 2.0 * yy, 0.0, jnp.inf)
    dxy = jnp.clip(rx.T + ry - 2.0 * xy, 0.0, jnp.inf)
    return dxx, dyy, dxy


def multi_mmd(
    x: jax.Array,
    y: jax.Array,
    widths_exponents: Sequence[Tuple[float, float]] = DEFAULT_WIDTHS_EXPONENTS,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> jax.Array:
    """Biased multi-kernel MMD estimate between samples x and y.

    With ``mesh``, rows of both sides are sharded over the mesh's data axis
    and the pairwise kernel matrices are computed distributed (GSPMD
    partitions the Gram matmuls; the scalar reduction all-reduces over ICI).
    Row counts that don't divide the mesh are evaluated unsharded.
    """
    if mesh is not None:
        n_dev = mesh.shape["data"]
        if x.shape[0] % n_dev == 0 and y.shape[0] % n_dev == 0:
            from hint_tpu.parallel import shard_batch

            xs = shard_batch(jnp.asarray(x), mesh)
            ys = shard_batch(jnp.asarray(y), mesh)
            return _mmd_jit(tuple(widths_exponents))(xs, ys)
    # single jit call (not eager): the eager path dispatches ~20 ops, each
    # paying a tunnel round-trip — 0.5 s/call vs ~ms jitted. Hot loop:
    # 8 models x 1000 targets x 3 runs in the conditional comparison.
    return _mmd_jit(tuple(widths_exponents))(jnp.asarray(x), jnp.asarray(y))


def _mmd_impl(x, y, widths_exponents):
    dxx, dyy, dxy = _sq_dists(x, y)
    xx = jnp.zeros_like(dxx)
    yy = jnp.zeros_like(dyy)
    xy = jnp.zeros_like(dxy)
    for c, a in widths_exponents:
        xx = xx + c**a * ((c + dxx) / a) ** -a
        yy = yy + c**a * ((c + dyy) / a) ** -a
        xy = xy + c**a * ((c + dxy) / a) ** -a
    return jnp.mean(xx + yy - 2.0 * xy)


@functools.lru_cache(maxsize=None)
def _mmd_jit(widths_exponents):
    return jax.jit(functools.partial(_mmd_impl, widths_exponents=widths_exponents))
