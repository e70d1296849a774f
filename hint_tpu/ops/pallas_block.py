"""Whole-block fused HAC Pallas kernel — dense level-map formulation.

One ``pallas_call`` executes an ENTIRE hierarchical-affine-coupling block —
every tree level's subnets, couplings and the log-det — on one batch tile,
with all weights VMEM-resident and no activation ever touching HBM.

The tree is reformulated so the kernel body is nothing but uniform 2D
matmuls (Mosaic lowers only plain 2D dots — batched ``dot_general``, 3D
contractions and 3D transposes all fail to lower; probed on-chip):

* **Layer 1 (dense scatter-in).** All of a level's s/t subnet first layers
  become one dense ``(d [+cond], K)`` matrix, ``K = 2n·h``: node ``i``'s
  input rows ``[offset, offset+split)`` are scattered into its column block
  ``[i·h, (i+1)·h)``; every other entry is exactly 0. One ``(tb,d)×(d,K)``
  dot replaces n per-node gathers + 2n small dots.
* **Layer 2 (chunked block-diagonal).** The per-node ``(h,h)`` middle
  layers form a block-diagonal ``(K,K)`` map; it is applied in chunks of
  whole nodes (chunk width ≈ 256) so the dense zero-padding costs bounded
  VMEM while staying strictly 2D.
* **Layer 3 (dense scatter-out).** The s/t output layers become one
  ``(K, 2d)`` matrix scattering node ``i``'s ``(h, out_i)`` block into the
  lower-segment columns ``[lo, lo+out_i)`` (s half) / ``[d+lo, d+lo+out_i)``
  (t half). The result is a full-width ``S`` and ``T`` whose entries are
  **exactly zero** outside the level's lower segments — products against
  zero weights are exact ±0 — so the coupling is fully elementwise:
  ``x' = exp(log_e)·x + T`` is the identity wherever ``S = T = 0`` (since
  ``atan 0 = 0`` ⇒ ``log_e = 0`` ⇒ factor 1), and the padded columns
  contribute exactly 0 to the log-det sum. No masks, no slicing, no
  concatenation in the hot path.

Per level that is 2 + n_chunks dots + one elementwise coupling; the whole
block is ~25-40 dots instead of the previous ~79 unrolled per-node bodies
(which Mosaic could not buffer-reuse: 36.6 MB VMEM at tile 1024, and
compile times beyond the measurement window — docs/perf.md round 2).
Activations live in two reused VMEM scratch buffers; dense weights are
built OUTSIDE the kernel from the canonical level-stacked params (a few MB
of scatter per call — negligible against the ~1.1 GB/block the levelwise
engine moves through HBM).

Training still works through ``impl="fused"``: a ``jax.custom_vjp`` routes
the backward through the levelwise XLA engine's VJP (rematerialization —
same level order and accumulation dtype).

Reference semantics carried from /root/reference/hint.py:62-101 via
hint_tpu.ops.hac (forward recurses-then-couples ⇒ couplings run bottom-up;
inverse couples-then-recurses ⇒ top-down; soft clamp
``e(s)=exp(clamp·0.636·atan s)``, truncated constant as hint.py:57).

Limitations (fall back to the levelwise engine): per-node ``reshuffle``
permutations (no stock config trains them inside HAC blocks).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp

from hint_tpu.ops.clamp import ATAN_SCALE  # 0.636, truncated as in hint.py:57

import os

# batch-tile rows and layer-2 chunk width, overridable for tuning sweeps.
# v5e has 128 MiB of VMEM (the 16 MB figure is Mosaic's default *scoped*
# limit, raised via CompilerParams below), so large tiles are affordable
# and buy MXU efficiency on every dot.
DEFAULT_TILE_B = int(os.environ.get("HINT_TPU_FUSED_TILE", 1024))
_CHUNK_TARGET = int(os.environ.get("HINT_TPU_FUSED_CHUNK", 512))

_TAN_PI_8 = 0.4142135623730950
_TAN_3PI_8 = 2.414213562373095
_PI_2 = 1.5707963267948966
_PI_4 = 0.7853981633974483


def _atan(x):
    """arctan from supported VPU primitives (Mosaic has no atan lowering).

    Cephes ``atanf`` scheme: reduce to |z| ≤ tan(π/8) via the tan(3π/8) and
    tan(π/8) identities, then a degree-4 minimax polynomial in z² — ~1-ulp
    f32 accuracy, well inside the 1e-5 parity budget against the XLA
    engine's exact arctan. Maps 0 → exactly 0 (the identity-coupling
    guarantee for scattered-zero S columns).
    """
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = ax > _TAN_PI_8
    zr = jnp.where(big, -1.0 / jnp.where(big, ax, 1.0), jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
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


# -- static level geometry -------------------------------------------------------------


class _LevelPlan:
    """Static shapes of one level's dense maps."""

    __slots__ = ("level", "n", "h", "K", "chunks", "cw_max")

    def __init__(self, lv, chunk_target: int):
        self.level = lv.nodes[0].level
        self.n = len(lv.nodes)
        self.h = lv.hidden
        self.K = 2 * self.n * self.h
        # layer-2 chunks: whole s/t subnet units (2n of them), ~chunk_target wide
        g = max(1, chunk_target // self.h)
        units = 2 * self.n
        starts = list(range(0, units, g))
        self.chunks = [(s * self.h, min(g, units - s) * self.h) for s in starts]
        self.cw_max = max(w for _, w in self.chunks)


def _plans(hac, chunk_target: int = None) -> List[_LevelPlan]:
    ct = _CHUNK_TARGET if chunk_target is None else chunk_target
    return [_LevelPlan(lv, ct) for lv in hac.levels]


# -- dense map construction (outside the kernel, traced jnp) ---------------------------


def _dense_level_maps(hac, params, cond_dim: int, chunk_target: int = None):
    """Scatter the canonical level-stacked params into the dense per-level
    maps the kernel consumes. Zero entries are exact, which the kernel's
    identity-coupling argument relies on."""
    d = hac.dim
    maps = []
    for lv, plan in zip(hac.levels, _plans(hac, chunk_target)):
        p = params[f"L{plan.level}"]
        n, h, K = plan.n, plan.h, plan.K
        in_max = lv.in_max
        w0, b0, w1, b1, w2, b2 = p["w0"], p["b0"], p["w1"], p["b1"], p["w2"], p["b2"]

        W1 = jnp.zeros((d + cond_dim, K), w0.dtype)
        B1 = jnp.reshape(b0, (1, K))  # unit-major layout matches column blocks
        W2 = jnp.zeros((K, plan.cw_max), w1.dtype)
        B2 = jnp.reshape(b1, (1, K))
        W3 = jnp.zeros((K, 2 * d), w2.dtype)
        B3 = jnp.zeros((1, 2 * d), b2.dtype)

        # chunk-local column offset of each unit
        unit_local = {}
        for c0, cwidth in plan.chunks:
            for u in range(c0 // h, (c0 + cwidth) // h):
                unit_local[u] = (u * h - c0)

        for which in range(2):  # 0: s-subnets, 1: t-subnets
            for i, nd in enumerate(lv.nodes):
                u = which * n + i  # unit index in the stacked params
                col = u * h
                out_i = nd.dim - nd.split
                lo = nd.offset + nd.split
                W1 = W1.at[nd.offset : nd.offset + nd.split, col : col + h].set(
                    w0[u][: nd.split]
                )
                if cond_dim:
                    W1 = W1.at[d : d + cond_dim, col : col + h].set(
                        w0[u][in_max : in_max + cond_dim]
                    )
                W2 = W2.at[col : col + h, unit_local[u] : unit_local[u] + h].set(w1[u])
                tgt = lo if which == 0 else d + lo
                W3 = W3.at[col : col + h, tgt : tgt + out_i].set(w2[u][:, :out_i])
                B3 = B3.at[0, tgt : tgt + out_i].set(b2[u][:out_i])
        level_maps = (W1, B1, W2, B2, W3, B3)
        cdt = jnp.dtype(hac.compute_dtype)
        if cdt != jnp.float32:
            # pre-cast: halves the VMEM + DMA cost of the resident weights;
            # zeros stay exactly zero under the cast
            level_maps = tuple(m.astype(cdt) for m in level_maps)
        maps.append(level_maps)
    return maps


# -- kernel ----------------------------------------------------------------------------


def _kernel_factory(hac, plans, rev: bool, cond_dim: int, d: int):
    clamp = float(hac.clamp)
    cdt = jnp.dtype(hac.compute_dtype)
    prec = jax.lax.Precision.HIGHEST if cdt == jnp.float32 else jax.lax.Precision.DEFAULT

    def dot(a, w):
        return jnp.dot(
            a.astype(cdt), w.astype(cdt),
            preferred_element_type=jnp.float32, precision=prec,
        )

    order = list(reversed(range(len(plans)))) if not rev else list(range(len(plans)))

    def kernel(*refs):
        nc = 1 if cond_dim else 0
        x_ref = refs[0]
        c_ref = refs[1] if cond_dim else None
        param_refs = refs[1 + nc : 1 + nc + 6 * len(plans)]
        out_ref, ld_ref = refs[1 + nc + 6 * len(plans) : 1 + nc + 6 * len(plans) + 2]

        x = x_ref[...].astype(jnp.float32)
        c = c_ref[...] if cond_dim else None
        ld = jnp.zeros((x.shape[0], 1), jnp.float32)

        for li in order:
            plan = plans[li]
            w1r, b1r, w2r, b2r, w3r, b3r = param_refs[6 * li : 6 * li + 6]
            # layer 1: dense scatter-in
            a = dot(x, w1r[: d, :])
            if cond_dim:
                a = a + dot(c, w1r[d : d + cond_dim, :])
            a = jnp.maximum(a + b1r[...], 0.0)
            # layer 2: chunked block-diagonal
            hs = []
            for c0, cwidth in plan.chunks:
                hs.append(dot(a[:, c0 : c0 + cwidth], w2r[c0 : c0 + cwidth, :cwidth]))
            hmid = hs[0] if len(hs) == 1 else jnp.concatenate(hs, axis=1)
            hmid = jnp.maximum(hmid + b2r[...], 0.0)
            # layer 3: dense scatter-out → full-width S, T (exact zeros
            # outside this level's lower segments)
            y = dot(hmid, w3r[...]) + b3r[...]
            S, T = y[:, :d], y[:, d:]
            log_e = clamp * ATAN_SCALE * _atan(S)
            if not rev:
                x = jnp.exp(log_e) * x + T
                ld = ld + jnp.sum(log_e, axis=1, keepdims=True)
            else:
                x = (x - T) * jnp.exp(-log_e)
                ld = ld - jnp.sum(log_e, axis=1, keepdims=True)

        out_ref[...] = x
        ld_ref[...] = ld

    return kernel


@functools.lru_cache(maxsize=None)
def _fused_call(
    hac, B: int, d: int, rev: bool, cond_dim: int, tile_b: int, interpret: bool,
    chunk_target: int = None,
):
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except Exception:  # pragma: no cover — CPU-only builds
        vmem = None
        compiler_params = None

    def bspec(block=None, index_map=None):
        kw = {"memory_space": vmem} if vmem is not None else {}
        if block is None:
            return pl.BlockSpec(**kw)
        return pl.BlockSpec(block, index_map, **kw)

    plans = _plans(hac, chunk_target)
    has_cond = cond_dim > 0

    # VMEM budget: weights + a few activation buffers at K_max + x/S/T;
    # shrink the batch tile until the estimate fits comfortably inside the
    # raised compiler limit (v5e VMEM is 128 MiB)
    itemsize = 2 if jnp.dtype(hac.compute_dtype) == jnp.bfloat16 else 4
    w_bytes = sum(
        ((d + cond_dim) * p.K + p.K + p.K * p.cw_max + p.K + p.K * 2 * d + 2 * d) * itemsize
        for p in plans
    )
    k_max = max(p.K for p in plans)
    tb = _round_tile(B, tile_b)
    while tb > 8:
        act_bytes = tb * (4 * k_max + 8 * d) * 4
        if w_bytes + act_bytes < 80 * 1024 * 1024:
            break
        tb = _round_tile(B, tb // 2)
    grid = (pl.cdiv(B, tb),)
    kernel = _kernel_factory(hac, plans, rev, cond_dim, d)

    in_specs = [bspec((tb, d), lambda b: (b, 0))]
    if has_cond:
        in_specs.append(bspec((tb, cond_dim), lambda b: (b, 0)))
    # per-level dense maps: full arrays, constant index maps → DMA'd to VMEM
    # once, resident across the batch sweep
    for p in plans:
        for shape in (
            (d + cond_dim, p.K), (1, p.K), (p.K, p.cw_max), (1, p.K), (p.K, 2 * d), (1, 2 * d),
        ):
            nargs = len(shape)
            in_specs.append(bspec(shape, (lambda *b, _n=nargs: (0,) * _n)))

    flops = 0
    for p in plans:
        flops += 2 * B * ((d + cond_dim) * p.K + sum(w * w for _, w in p.chunks) + p.K * 2 * d)

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
            flops=flops,
            bytes_accessed=4 * (2 * B * d + B) + w_bytes,
            transcendentals=2 * B * d,
        ),
        interpret=interpret,
        **({"compiler_params": compiler_params} if compiler_params is not None else {}),
    )
    return call


def _run_fused(
    hac, params, x, cond, rev: bool, tile_b: int = None, chunk_target: int = None
):
    interpret = jax.default_backend() != "tpu"
    cond_dim = hac.cond_dim if cond is not None else 0
    # resolve knobs to concrete ints so the lru_cache key is unambiguous
    tile_b = DEFAULT_TILE_B if tile_b is None else tile_b
    chunk_target = _CHUNK_TARGET if chunk_target is None else chunk_target
    call = _fused_call(
        hac, x.shape[0], x.shape[1], rev, cond_dim, tile_b, interpret, chunk_target,
    )
    maps = _dense_level_maps(hac, params, cond_dim, chunk_target)
    flat = [w for level_maps in maps for w in level_maps]
    args = [x] if cond is None else [x, cond]
    y, ld = call(*args, *flat)
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
