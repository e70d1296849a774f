"""Whole-block fused HAC Pallas kernel.

One ``pallas_call`` executes an ENTIRE hierarchical-affine-coupling block —
every tree level's subnets, couplings and the log-det — on one batch tile:

* all level-stacked weights (≤ a few MB for every stock config) are marked
  VMEM-resident with constant index maps, so Mosaic DMAs them to VMEM once
  and keeps them there across the whole batch sweep;
* the feature vector and every hidden activation live in registers/VMEM;
  HBM traffic per block is one read of the x tile + one write of the output
  tile + one pass over the weights — nothing else;
* matmuls run on the MXU with float32 accumulation
  (``preferred_element_type``), matching the levelwise XLA engine's math.

Why whole-block: the round-1 per-*level* kernel was measured 1.7-2.4x
SLOWER than the XLA levelwise path, with ~6.7x its HBM traffic
(artifacts/profile_cost.json) — the (2n, B, in) stacked inputs it consumed
were materialized in HBM outside the kernel, so it fused the cheap part and
paid double for the expensive part. The profile shows the forward is
HBM-bound on exactly that inter-level traffic (1.3% MXU, and the step 61%
HBM), so the only fusion that can win is the one that never writes an
activation to HBM: the whole block.

Training still works through ``impl="fused"``: a ``jax.custom_vjp`` routes
the backward through the levelwise XLA engine's VJP (rematerialization —
gradients are bit-identical to the levelwise engine's because the math is
the same level order and accumulation dtype).

Reference semantics carried from /root/reference/hint.py:62-101 via
hint_tpu.ops.hac (forward recurses-then-couples ⇒ couplings run bottom-up;
inverse couples-then-recurses ⇒ top-down; soft clamp e(s)=exp(c·(2/π)·atan s)).

Limitations (fall back to the levelwise engine): per-node ``reshuffle``
permutations (no stock config trains them inside HAC blocks).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hint_tpu.ops.clamp import ATAN_SCALE  # 0.636, truncated as in hint.py:57

DEFAULT_TILE_B = 256

_TAN_PI_8 = 0.4142135623730950
_TAN_3PI_8 = 2.414213562373095
_PI_2 = 1.5707963267948966
_PI_4 = 0.7853981633974483


def _atan(x):
    """arctan from supported VPU primitives (Mosaic has no atan lowering).

    Cephes ``atanf`` scheme: reduce to |z| ≤ tan(π/8) via the tan(3π/8) and
    tan(π/8) identities, then a degree-4 minimax polynomial in z² — ~1-ulp
    f32 accuracy, well inside the 1e-5 parity budget against the XLA
    engine's exact arctan.
    """
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = ax > _TAN_PI_8
    zr = jnp.where(big, -1.0 / ax, jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    t = zr * zr
    p = ((8.05374449538e-2 * t - 1.38776856032e-1) * t + 1.99777106478e-1) * t
    p = p - 3.33329491539e-1
    y = zr + zr * t * p
    y = y + jnp.where(big, _PI_2, jnp.where(mid, _PI_4, 0.0))
    return jnp.sign(x) * y


def _round_tile(b: int, want: int) -> int:
    """Largest tile ≤ want that divides b if possible (avoids masked ragged
    tiles), else want."""
    t = min(want, b)
    for cand in range(t, 0, -1):
        if b % cand == 0 and cand % 8 == 0:
            return cand
    return t


def _kernel_factory(hac, B: int, tile_b: int, rev: bool, has_cond: bool, cond_dim: int):
    """Build the kernel body for this block's static tree. All loops unroll
    at trace time (static tree structure — SURVEY.md §7 'ragged tree')."""
    levels = hac.levels
    clamp = float(hac.clamp)
    cdt = jnp.dtype(hac.compute_dtype)

    def mlp(xin, c, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, idx, nd, lv):
        """One subnet (3-layer ReLU MLP) for node ``nd``, stack row ``idx``."""
        out_i = nd.dim - nd.split

        # HIGHEST pins full-f32 MXU passes for f32 compute — without it the
        # MXU multiplies in bf16 and the error compounds through the
        # exp-coupling chain (measured 0.33 abs on the flagship forward)
        prec = (
            jax.lax.Precision.HIGHEST
            if cdt == jnp.float32
            else jax.lax.Precision.DEFAULT
        )

        def dot(a, w):
            return jnp.dot(
                a.astype(cdt), w.astype(cdt),
                preferred_element_type=jnp.float32, precision=prec,
            )

        def wload(ref):
            # static-slice load + squeeze: int-indexing a 3D ref lowers to a
            # 3D gather, which Mosaic does not implement
            return jnp.squeeze(ref[idx : idx + 1, :, :], 0)

        w0 = wload(w0_ref)
        h = dot(xin, w0[: nd.split, :])
        if has_cond:
            h = h + dot(c, w0[lv.in_max : lv.in_max + cond_dim, :])
        h = jnp.maximum(h + b0_ref[idx : idx + 1, :], 0.0)
        h = jnp.maximum(dot(h, wload(w1_ref)) + b1_ref[idx : idx + 1, :], 0.0)
        return dot(h, wload(w2_ref)[:, :out_i]) + b2_ref[idx : idx + 1, :out_i]

    def body(x, c, refs):
        ld = jnp.zeros((x.shape[0], 1), jnp.float32)
        order = list(reversed(levels)) if not rev else list(levels)
        for lv in order:
            li = lv.nodes[0].level
            w0, b0, w1, b1, w2, b2 = refs[li]
            n = len(lv.nodes)
            for i, nd in enumerate(lv.nodes):
                out_i = nd.dim - nd.split
                lo = nd.offset + nd.split
                xu = jax.lax.slice_in_dim(x, nd.offset, nd.offset + nd.split, axis=1)
                s = mlp(xu, c, w0, b0, w1, b1, w2, b2, i, nd, lv)
                t = mlp(xu, c, w0, b0, w1, b1, w2, b2, n + i, nd, lv)
                log_e = clamp * ATAN_SCALE * _atan(s)
                lower = jax.lax.slice_in_dim(x, lo, lo + out_i, axis=1)
                if not rev:
                    new = jnp.exp(log_e) * lower + t
                    ld = ld + jnp.sum(log_e, axis=1, keepdims=True)
                else:
                    new = (lower - t) * jnp.exp(-log_e)
                    ld = ld - jnp.sum(log_e, axis=1, keepdims=True)
                # static-slice concat (Mosaic lowers lax.slice + concatenate;
                # dynamic_update_slice on values is unimplemented)
                pieces = []
                if lo > 0:
                    pieces.append(jax.lax.slice_in_dim(x, 0, lo, axis=1))
                pieces.append(new.astype(x.dtype))
                if lo + out_i < x.shape[1]:
                    pieces.append(jax.lax.slice_in_dim(x, lo + out_i, x.shape[1], axis=1))
                x = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
        return x, ld

    if has_cond:

        def kernel(x_ref, c_ref, *refs_out):
            param_refs = refs_out[:-2]
            out_ref, ld_ref = refs_out[-2:]
            refs = [param_refs[6 * li : 6 * li + 6] for li in range(len(levels))]
            y, ld = body(x_ref[...], c_ref[...], refs)
            out_ref[...] = y
            ld_ref[...] = ld

    else:

        def kernel(x_ref, *refs_out):
            param_refs = refs_out[:-2]
            out_ref, ld_ref = refs_out[-2:]
            refs = [param_refs[6 * li : 6 * li + 6] for li in range(len(levels))]
            y, ld = body(x_ref[...], None, refs)
            out_ref[...] = y
            ld_ref[...] = ld

    return kernel


@functools.lru_cache(maxsize=None)
def _fused_call(hac, B: int, d: int, rev: bool, cond_dim: int, tile_b: int, interpret: bool):
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
    except Exception:  # pragma: no cover — CPU-only builds
        vmem = None

    def bspec(block=None, index_map=None):
        kw = {"memory_space": vmem} if vmem is not None else {}
        if block is None:
            return pl.BlockSpec(**kw)
        return pl.BlockSpec(block, index_map, **kw)

    has_cond = cond_dim > 0
    tb = _round_tile(B, tile_b)
    grid = (pl.cdiv(B, tb),)
    kernel = _kernel_factory(hac, B, tb, rev, has_cond, cond_dim)

    in_specs = [bspec((tb, d), lambda b: (b, 0))]
    if has_cond:
        in_specs.append(bspec((tb, cond_dim), lambda b: (b, 0)))
    # per-level weight stacks: full arrays, constant index map → DMA'd to
    # VMEM once, resident across the batch sweep
    for lv in hac.levels:
        n2 = 2 * len(lv.nodes)
        h = lv.hidden
        in_c = lv.in_max + cond_dim
        out_m = lv.out_max
        for shape in ((n2, in_c, h), (n2, h), (n2, h, h), (n2, h), (n2, h, out_m), (n2, out_m)):
            nargs = len(shape)
            in_specs.append(
                bspec(shape, (lambda b, _n=nargs: (0,) * _n))
            )

    flops = 0
    for lv in hac.levels:
        for nd in lv.nodes:
            h = nd.hidden
            out_i = nd.dim - nd.split
            flops += 2 * 2 * B * ((nd.split + cond_dim) * h + h * h + h * out_i)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            bspec((tb, d), lambda b: (b, 0)),
            bspec((tb, 1), lambda b: (b, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, d), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * (2 * B * d + B), transcendentals=2 * B * d
        ),
        interpret=interpret,
    )
    return call


def _flatten_params(hac, params):
    flat = []
    for li in range(len(hac.levels)):
        p = params[f"L{li}"]
        flat += [p["w0"], p["b0"], p["w1"], p["b1"], p["w2"], p["b2"]]
    return flat


def _run_fused(hac, params, x, cond, rev: bool, tile_b: int = DEFAULT_TILE_B):
    interpret = jax.default_backend() != "tpu"
    cond_dim = hac.cond_dim if cond is not None else 0
    call = _fused_call(hac, x.shape[0], x.shape[1], rev, cond_dim, tile_b, interpret)
    args = [x] if cond is None else [x, cond]
    y, ld = call(*args, *_flatten_params(hac, params))
    return y.astype(x.dtype), ld[:, 0].astype(x.dtype)


def _levelwise(hac, params, x, cond, rev: bool):
    return (
        hac._inverse_levelwise(params, x, cond)
        if rev
        else hac._forward_levelwise(params, x, cond)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4))
def fused_block(hac, params, x, cond, rev: bool):
    """(y, logdet) for one whole HAC block via the fused kernel; gradients
    rematerialize through the levelwise XLA engine (identical math)."""
    if hac.reshuffle:  # per-node perms not fused; correctness first
        return _levelwise(hac, params, x, cond, rev)
    return _run_fused(hac, params, x, cond, rev)


def _fwd(hac, params, x, cond, rev):
    out = fused_block(hac, params, x, cond, rev)
    return out, (params, x, cond)


def _bwd(hac, rev, res, g):
    params, x, cond = res
    diff_cond = cond is not None
    if diff_cond:
        _, vjp = jax.vjp(lambda p, xx, cc: _levelwise(hac, p, xx, cc, rev), params, x, cond)
        return vjp(g)
    _, vjp = jax.vjp(lambda p, xx: _levelwise(hac, p, xx, None, rev), params, x)
    dp, dx = vjp(g)
    return dp, dx, None


fused_block.defvjp(_fwd, _bwd)
