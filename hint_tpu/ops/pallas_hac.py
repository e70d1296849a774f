"""Pallas TPU kernel for the HAC level-stacked subnet stage.

The levelwise HAC engine (hint_tpu.ops.hac) evaluates, per tree level, a
stack of ``2n`` 3-layer ReLU MLPs as three batched einsums. XLA fuses the
bias/ReLU epilogues but materializes both hidden activations — two
``(2n, B, h)`` HBM round-trips per level, which dominates the memory
traffic: the weights are tiny (≤512²) while B is 10⁴.

This kernel fuses the whole stack — x·W0→ReLU→·W1→ReLU→·W2 (+biases,
output mask) — into one ``pallas_call`` over a (subnet, batch-tile) grid.
Hidden activations live in VMEM only; HBM traffic per level drops to
x-tile reads + s/t-tile writes + one pass over the weights.

Training uses ``fused_level_mlp`` via ``jax.custom_vjp``: forward is the
kernel, backward rematerializes the two (cheap) hidden layers with plain
XLA einsums — exact same math as the reference path, so gradients are
bit-comparable to the XLA engine's.

Kernel design notes (per /opt/skills/guides/pallas_guide.md):
* grid = (2n, ceil(B / TB)); each instance owns one subnet and one batch
  tile — independent, no cross-instance state;
* all operands blocked into VMEM; weights use index_map (k, 0, 0) so each
  subnet's W goes to VMEM once per batch sweep (Mosaic keeps it resident
  across the inner batch-tile dimension of the grid);
* matmuls give ``preferred_element_type=float32`` to pin MXU accumulation;
* batch tiles padded by Pallas automatically on the ragged last tile (B is
  not required to be a multiple of TB: loads pad, stores mask).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_TILE_B = 512


def _mlp_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, mask_ref, out_ref):
    # precision=HIGHEST: the default MXU path multiplies in bf16; full-f32
    # passes keep the engine bit-comparable with the XLA einsum path
    def dot(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    x = x_ref[0]  # (TB, in)
    h = jnp.maximum(dot(x, w0_ref[0]) + b0_ref[0], 0.0)
    h = jnp.maximum(dot(h, w1_ref[0]) + b1_ref[0], 0.0)
    out_ref[0] = (dot(h, w2_ref[0]) + b2_ref[0]) * mask_ref[0]


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def _fused_level_mlp_fwd_impl(xs, w0, b0, w1, b1, w2, b2, mask, tile_b: int, interpret: bool):
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
    except Exception:  # pragma: no cover - CPU-only builds
        vmem = None

    n2, B, d_in = xs.shape
    h0 = w0.shape[2]
    h1 = w1.shape[2]
    d_out = w2.shape[2]
    tb = min(tile_b, B)
    grid = (n2, pl.cdiv(B, tb))

    def bspec(block, index_map):
        if vmem is None:
            return pl.BlockSpec(block, index_map)
        return pl.BlockSpec(block, index_map, memory_space=vmem)

    # biases as (n2, 1, h): TPU blocks need the last two dims divisible by
    # the (8, 128) tile or equal to the array dims; a singleton sublane
    # row satisfies the latter.
    return pl.pallas_call(
        _mlp_kernel,
        grid=grid,
        in_specs=[
            bspec((1, tb, d_in), lambda k, b: (k, b, 0)),
            bspec((1, d_in, h0), lambda k, b: (k, 0, 0)),
            bspec((1, 1, h0), lambda k, b: (k, 0, 0)),
            bspec((1, h0, h1), lambda k, b: (k, 0, 0)),
            bspec((1, 1, h1), lambda k, b: (k, 0, 0)),
            bspec((1, h1, d_out), lambda k, b: (k, 0, 0)),
            bspec((1, 1, d_out), lambda k, b: (k, 0, 0)),
            bspec((1, 1, d_out), lambda k, b: (k, 0, 0)),
        ],
        out_specs=bspec((1, tb, d_out), lambda k, b: (k, b, 0)),
        out_shape=jax.ShapeDtypeStruct((n2, B, d_out), jnp.float32),
        interpret=interpret,
    )(xs, w0, b0[:, None, :], w1, b1[:, None, :], w2, b2[:, None, :], mask)


def _xla_reference(xs, w0, b0, w1, b1, w2, b2, mask):
    """The einsum path (identical math; used for backward remat and as the
    non-TPU fallback)."""
    prec = jax.lax.Precision.HIGHEST

    def mm(a, w):
        return jnp.einsum("nbi,nio->nbo", a, w, preferred_element_type=jnp.float32,
                          precision=prec)

    h = jax.nn.relu(mm(xs, w0) + b0[:, None, :])
    h = jax.nn.relu(mm(h, w1) + b1[:, None, :])
    return (mm(h, w2) + b2[:, None, :]) * mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_level_mlp(xs, w0, b0, w1, b1, w2, b2, mask, tile_b: int = DEFAULT_TILE_B,
                    interpret: bool = False):
    """(2n, B, in) → (2n, B, out): masked 3-layer stacked MLP, fused in VMEM.

    Differentiable: backward rematerializes via XLA einsums (the hiddens are
    cheap to recompute and the kernel never stores them).
    """
    return _fused_level_mlp_fwd_impl(xs, w0, b0, w1, b1, w2, b2, mask, tile_b, interpret)


def _fwd(xs, w0, b0, w1, b1, w2, b2, mask, tile_b, interpret):
    out = _fused_level_mlp_fwd_impl(xs, w0, b0, w1, b1, w2, b2, mask, tile_b, interpret)
    return out, (xs, w0, b0, w1, b1, w2, b2, mask)


def _bwd(tile_b, interpret, res, g):
    xs, w0, b0, w1, b1, w2, b2, mask = res
    _, vjp = jax.vjp(lambda *a: _xla_reference(*a), xs, w0, b0, w1, b1, w2, b2, mask)
    dxs, dw0, db0, dw1, db1, dw2, db2, dmask = vjp(g)
    return dxs, dw0, db0, dw1, db1, dw2, db2, dmask


fused_level_mlp.defvjp(_fwd, _bwd)


def st_from_fused(out: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split the (2n, B, out) stack into (s, t) halves along axis 0."""
    n = out.shape[0] // 2
    return out[:n], out[n:]
