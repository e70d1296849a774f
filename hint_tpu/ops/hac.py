"""Hierarchical affine coupling (HAC) — the HINT core op.

Semantics match the reference tree exactly (/root/reference/hint.py:21-133):

* recursive binary split at ``dim // 2`` (hint.py:41,68);
* per-node ``s``/``t`` 3-layer ReLU subnets taking ``x_upper (⊕ cond)``
  (hint.py:44-45,76-77);
* soft-clamped affine coupling of the lower half (hint.py:79-83);
* per-level subnet widths ``c_internal`` with last-width repetition
  (hint.py:31-34);
* recursion stops when ``dim < 2 * min_split_size`` or ``max_splits == 0``
  (hint.py:47);
* forward recurses into children *before* coupling, inverse couples *before*
  recursing (hint.py:70-88);
* hierarchical log-det accumulates over all tree nodes (hint.py:96-99);
* optional per-node fixed Householder reshuffle (hint.py:36-39,63-65,92-94).

Execution and storage are TPU-first. The reference evaluates the tree's
2^depth tiny MLPs sequentially with per-node weight tensors; here:

* **Level-stacked parameters**: all sibling subnets at a tree depth live in
  one ``(2n, in, h)`` stack (s-subnets then t-subnets along the leading
  axis), zero-padded to the level's max width. Sibling widths differ by at
  most one (floor/ceil splits), so padding costs ≤1 lane.
* **Level-synchronous execution**: one batched einsum per layer per level on
  the MXU — the sequential chain is O(tree depth), not O(#nodes), and no
  per-step weight gathering/stacking appears in the compiled graph.
* A constant validity mask zeroes the padded s/t output columns, so padded
  lanes contribute exactly 0 to the coupling and the log-det regardless of
  what the padded weights hold (they are swept by init overwriting and
  weight decay, never by data).

The ``reference`` engine is a direct transcription of the mathematical
recursion (reading the same level-stacked params) and serves as the
correctness oracle for the levelwise engine.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hint_tpu.ops.base import Array, Bijector, Params
from hint_tpu.ops.clamp import soft_clamp_exp, soft_clamp_log
from hint_tpu.ops.householder import householder_matrix_product
from hint_tpu.ops.subnets import MLPSpec


class _TreeNode:
    """Static structure of one HAC tree node (derived, not user-facing)."""

    __slots__ = ("dim", "split", "hidden", "leaf", "upper", "lower", "offset", "level", "index")

    def __init__(self, dim, split, hidden, leaf, upper, lower, offset, level):
        self.dim = dim
        self.split = split
        self.hidden = hidden
        self.leaf = leaf
        self.upper = upper
        self.lower = lower
        self.offset = offset  # position of this node's segment in the flat feature axis
        self.level = level
        self.index = -1  # position within its level (set after level sort)


class _Level:
    """Static metadata of one tree depth."""

    __slots__ = ("nodes", "in_max", "out_max", "dim_max", "hidden", "out_mask")

    def __init__(self, nodes: List[_TreeNode], cond_dim: int):
        self.nodes = nodes
        self.in_max = max(nd.split for nd in nodes)
        self.out_max = max(nd.dim - nd.split for nd in nodes)
        self.dim_max = max(nd.dim for nd in nodes)
        self.hidden = nodes[0].hidden
        mask = np.zeros((len(nodes), 1, self.out_max), np.float32)
        for i, nd in enumerate(nodes):
            mask[i, 0, : nd.dim - nd.split] = 1.0
        self.out_mask = mask  # becomes a compile-time constant


def _normalize_c_internal(c_internal: Tuple[int, ...], dim: int) -> Tuple[int, ...]:
    """Width-list defaulting, mirroring hint.py:31-34."""
    ci = tuple(c_internal)
    if len(ci) == 0:
        ci = (dim,)
    if len(ci) == 1:
        ci = ci + ci
    return ci


def _build_tree(dim, c_internal, max_splits, min_split_size, offset, level) -> _TreeNode:
    ci = _normalize_c_internal(c_internal, dim)
    split = dim // 2
    is_leaf = not (dim >= 2 * min_split_size and max_splits != 0)
    upper = lower = None
    if not is_leaf:
        upper = _build_tree(split, ci[1:], max_splits - 1, min_split_size, offset, level + 1)
        lower = _build_tree(
            dim - split, ci[1:], max_splits - 1, min_split_size, offset + split, level + 1
        )
    return _TreeNode(dim, split, ci[0], is_leaf, upper, lower, offset, level)


@dataclasses.dataclass(frozen=True)
class HierarchicalAffineCoupling(Bijector):
    """HAC block (the FrEIA-adapter defaults live at hint.py:108)."""

    c_internal: Tuple[int, ...] = ()
    clamp: float = 4.0
    max_splits: int = -1
    min_split_size: int = 2
    reshuffle: bool = False
    compute_dtype: str = "float32"
    # "levelwise": level-synchronous batched einsums (XLA fast path);
    # "reference": direct transcription of the recursion (correctness oracle);
    # "fused": whole-block Pallas kernel — the entire tree's weights stay
    #   VMEM-resident and every level's activations never touch HBM
    #   (hint_tpu.ops.pallas_block). The earlier per-*level* kernel was
    #   retired after profiling showed it did ~6.7x the XLA forward's HBM
    #   traffic (artifacts/profile_cost.json) — fusing less than the whole
    #   block cannot win when the bottleneck is inter-level traffic.
    impl: str = "levelwise"

    # -- static structure ---------------------------------------------------

    @functools.cached_property
    def tree(self) -> _TreeNode:
        return _build_tree(self.dim, self.c_internal, self.max_splits, self.min_split_size, 0, 0)

    @functools.cached_property
    def levels(self) -> List[_Level]:
        by_depth: List[List[_TreeNode]] = []

        def visit(node):
            while len(by_depth) <= node.level:
                by_depth.append([])
            by_depth[node.level].append(node)
            if not node.leaf:
                visit(node.upper)
                visit(node.lower)

        visit(self.tree)
        levels = []
        for lvl in by_depth:
            lvl.sort(key=lambda n: n.offset)
            for i, nd in enumerate(lvl):
                nd.index = i
            levels.append(_Level(lvl, self.cond_dim))
        return levels

    def _subnet_spec(self, node: _TreeNode) -> MLPSpec:
        return MLPSpec(
            node.split + self.cond_dim, node.hidden, node.dim - node.split, self.compute_dtype
        )

    @property
    def n_params(self) -> int:
        """Logical (unpadded) parameter count, matching the reference's
        per-node subnets."""
        return sum(2 * self._subnet_spec(nd).n_params for lv in self.levels for nd in lv.nodes)

    # -- params (level-stacked canonical layout) ------------------------------

    def init(self, key: Array) -> Params:
        params: Params = {}
        keys = jax.random.split(key, len(self.levels) + 1)
        for li, lv in enumerate(self.levels):
            n = len(lv.nodes)
            node_keys = jax.random.split(keys[li], 2 * n)
            stacks = {k: [] for k in ("w0", "b0", "w1", "b1", "w2", "b2")}
            for which in range(2):  # 0: s-subnets, 1: t-subnets
                for i, nd in enumerate(lv.nodes):
                    p = self._subnet_spec(nd).init(node_keys[which * n + i])
                    w0x, w0c = p["w0"][: nd.split], p["w0"][nd.split :]
                    stacks["w0"].append(
                        jnp.concatenate(
                            [jnp.pad(w0x, ((0, lv.in_max - nd.split), (0, 0))), w0c], axis=0
                        )
                    )
                    stacks["b0"].append(p["b0"])
                    stacks["w1"].append(p["w1"])
                    stacks["b1"].append(p["b1"])
                    out_i = nd.dim - nd.split
                    stacks["w2"].append(jnp.pad(p["w2"], ((0, 0), (0, lv.out_max - out_i))))
                    stacks["b2"].append(jnp.pad(p["b2"], (0, lv.out_max - out_i)))
            params[f"L{li}"] = {k: jnp.stack(v) for k, v in stacks.items()}
            if self.reshuffle:
                qs = []
                qkeys = jax.random.split(keys[-1], len(self.levels) * len(lv.nodes) + li + 1)
                for i, nd in enumerate(lv.nodes):
                    vs = jax.random.normal(qkeys[li * len(lv.nodes) + i], (nd.dim, nd.dim))
                    q = householder_matrix_product(vs)
                    pad = lv.dim_max - nd.dim
                    q = jnp.block(
                        [
                            [q, jnp.zeros((nd.dim, pad))],
                            [jnp.zeros((pad, nd.dim)), jnp.eye(pad)],
                        ]
                    ) if pad else q
                    qs.append(q)
                params[f"Q{li}"] = jnp.stack(qs)
        return params

    def trainable_mask(self, params: Params) -> Params:
        return {
            k: (jax.tree.map(lambda _: True, v) if k.startswith("L") else False)
            for k, v in params.items()
        }

    # -- public API -------------------------------------------------------------

    _IMPLS = ("levelwise", "reference", "fused")

    def _check_impl(self):
        # explicit validation: a typo'd/retired impl string (e.g. the old
        # "pallas") must fail loudly, not silently measure levelwise
        if self.impl not in self._IMPLS:
            raise ValueError(
                f"unknown HAC impl {self.impl!r}; expected one of {self._IMPLS}"
            )

    def forward(self, params: Params, x: Array, cond: Optional[Array] = None):
        self._check_impl()
        if self.impl == "reference":
            return self._forward_recursive(params, self.tree, x, cond, rev=False)
        if self.impl == "fused":
            from hint_tpu.ops.pallas_block import fused_block

            return fused_block(self, params, x, cond, False)
        return self._forward_levelwise(params, x, cond)

    def inverse(self, params: Params, y: Array, cond: Optional[Array] = None):
        self._check_impl()
        if self.impl == "reference":
            return self._forward_recursive(params, self.tree, y, cond, rev=True)
        if self.impl == "fused":
            from hint_tpu.ops.pallas_block import fused_block

            return fused_block(self, params, y, cond, True)
        return self._inverse_levelwise(params, y, cond)

    # -- levelwise engine (TPU fast path) ------------------------------------------

    def _level_st(self, params: Params, lv: _Level, x: Array, cond: Optional[Array]):
        """Batched s, t for all nodes of one level: each (n, B, out_max),
        with padded output columns exactly zero."""
        n = len(lv.nodes)
        p = params[f"L{lv.nodes[0].level}"]
        xs = jnp.stack(
            [
                jnp.pad(x[:, nd.offset : nd.offset + nd.split], ((0, 0), (0, lv.in_max - nd.split)))
                for nd in lv.nodes
            ]
        )
        if self.cond_dim > 0:
            xs = jnp.concatenate([xs, jnp.broadcast_to(cond[None], (n,) + cond.shape)], axis=-1)
        # s- and t-subnets share the input stack: contract xs once against
        # the (2, n, in, h) view of the weight stack instead of materializing
        # a doubled (2n, B, in) input buffer in HBM (the step is HBM-bound —
        # docs/perf.md)
        mask = jnp.asarray(lv.out_mask)
        cdt = jnp.dtype(self.compute_dtype)
        prec = jax.lax.Precision.HIGHEST if cdt == jnp.float32 else jax.lax.Precision.DEFAULT

        def two(w):
            return w.reshape((2, n) + w.shape[1:])

        def mm(a, w, spec):
            return jnp.einsum(
                spec, a.astype(cdt), w.astype(cdt),
                preferred_element_type=jnp.float32, precision=prec,
            )

        h = jax.nn.relu(mm(xs, two(p["w0"]), "nbi,snio->snbo") + two(p["b0"])[:, :, None, :])
        h = jax.nn.relu(mm(h, two(p["w1"]), "snbi,snio->snbo") + two(p["b1"])[:, :, None, :])
        h = mm(h, two(p["w2"]), "snbi,snio->snbo") + two(p["b2"])[:, :, None, :]
        return h[0] * mask, h[1] * mask

    def _couple_level(self, params: Params, lv: _Level, x: Array, cond, rev: bool):
        """Apply (or invert) all couplings of one level; returns (x', logdet)."""
        s, t = self._level_st(params, lv, x, cond)
        log_e = soft_clamp_log(s, self.clamp)  # padded cols are exactly 0
        logdet = jnp.sum(log_e, axis=(0, 2))
        pieces, prev_end = [], 0
        for i, nd in enumerate(lv.nodes):
            out_i = nd.dim - nd.split
            lo = nd.offset + nd.split
            if lo > prev_end:
                pieces.append(x[:, prev_end:lo])
            lower = x[:, lo : lo + out_i]
            e_s = jnp.exp(log_e[i, :, :out_i])
            pieces.append(
                e_s * lower + t[i, :, :out_i] if not rev else (lower - t[i, :, :out_i]) / e_s
            )
            prev_end = lo + out_i
        if prev_end < x.shape[1]:
            pieces.append(x[:, prev_end:])
        return jnp.concatenate(pieces, axis=-1), (logdet if not rev else -logdet)

    def _perm_level(self, params: Params, lv: _Level, x: Array, rev: bool) -> Array:
        """Apply all (identity-padded, block-diagonal) node perms of a level
        as one batched einsum."""
        li = lv.nodes[0].level
        q = params[f"Q{li}"]
        if rev:
            q = jnp.swapaxes(q, 1, 2)
        segs = jnp.stack(
            [
                jnp.pad(x[:, nd.offset : nd.offset + nd.dim], ((0, 0), (0, lv.dim_max - nd.dim)))
                for nd in lv.nodes
            ]
        )
        out = jnp.einsum(
            "nbi,nij->nbj", segs, q, precision=jax.lax.Precision.HIGHEST
        )
        pieces, prev_end = [], 0
        for i, nd in enumerate(lv.nodes):
            if nd.offset > prev_end:
                pieces.append(x[:, prev_end : nd.offset])
            pieces.append(out[i, :, : nd.dim])
            prev_end = nd.offset + nd.dim
        if prev_end < x.shape[1]:
            pieces.append(x[:, prev_end:])
        return jnp.concatenate(pieces, axis=-1)

    def _forward_levelwise(self, params: Params, x: Array, cond):
        # perms top-down, then couplings bottom-up (order per hint.py:62-99)
        if self.reshuffle:
            for lv in self.levels:
                x = self._perm_level(params, lv, x, rev=False)
        logdet = jnp.zeros(x.shape[:1], dtype=x.dtype)
        for lv in reversed(self.levels):
            x, j = self._couple_level(params, lv, x, cond, rev=False)
            logdet = logdet + j
        return x, logdet

    def _inverse_levelwise(self, params: Params, y: Array, cond):
        # couplings top-down, then un-perms bottom-up (order flip, hint.py:85-94)
        logdet = jnp.zeros(y.shape[:1], dtype=y.dtype)
        for lv in self.levels:
            y, j = self._couple_level(params, lv, y, cond, rev=True)
            logdet = logdet + j
        if self.reshuffle:
            for lv in reversed(self.levels):
                y = self._perm_level(params, lv, y, rev=True)
        return y, logdet

    # -- reference-order engine (correctness oracle) -----------------------------

    def _node_subnet(self, params: Params, node: _TreeNode, which: int):
        """Slice one node's (unpadded) subnet weights out of the level stack.

        which: 0 = s-subnet, 1 = t-subnet.
        """
        lv = self.levels[node.level]
        p = params[f"L{node.level}"]
        i = which * len(lv.nodes) + node.index
        out_i = node.dim - node.split
        w0 = jnp.concatenate(
            [p["w0"][i][: node.split], p["w0"][i][lv.in_max : lv.in_max + self.cond_dim]], axis=0
        )
        return {
            "w0": w0,
            "b0": p["b0"][i],
            "w1": p["w1"][i],
            "b1": p["b1"][i],
            "w2": p["w2"][i][:, :out_i],
            "b2": p["b2"][i][:out_i],
        }

    def _st(self, params: Params, node: _TreeNode, x_upper: Array, cond: Optional[Array]):
        spec = self._subnet_spec(node)
        h = x_upper if self.cond_dim == 0 else jnp.concatenate([x_upper, cond], axis=-1)
        s = spec.apply(self._node_subnet(params, node, 0), h)
        t = spec.apply(self._node_subnet(params, node, 1), h)
        return s, t

    def _node_q(self, params: Params, node: _TreeNode) -> Array:
        return params[f"Q{node.level}"][node.index][: node.dim, : node.dim]

    def _forward_recursive(self, params: Params, node: _TreeNode, x: Array, cond, rev: bool):
        if not rev and self.reshuffle:
            x = jnp.dot(x, self._node_q(params, node), precision=jax.lax.Precision.HIGHEST)

        x_upper, x_lower = x[:, : node.split], x[:, node.split :]

        j_upper = j_lower = 0.0
        if (not node.leaf) and (not rev):
            x_upper, j_upper = self._forward_recursive(params, node.upper, x_upper, cond, rev)
            x_lower, j_lower = self._forward_recursive(params, node.lower, x_lower, cond, rev)

        s, t = self._st(params, node, x_upper, cond)
        if not rev:
            x_lower = soft_clamp_exp(s, self.clamp) * x_lower + t
            j = jnp.sum(soft_clamp_log(s, self.clamp), axis=-1)
        else:
            x_lower = (x_lower - t) / soft_clamp_exp(s, self.clamp)
            j = -jnp.sum(soft_clamp_log(s, self.clamp), axis=-1)

        if (not node.leaf) and rev:
            x_upper, j_upper = self._forward_recursive(params, node.upper, x_upper, cond, rev)
            x_lower, j_lower = self._forward_recursive(params, node.lower, x_lower, cond, rev)

        x = jnp.concatenate([x_upper, x_lower], axis=-1)
        if rev and self.reshuffle:
            x = jnp.dot(x, self._node_q(params, node).T, precision=jax.lax.Precision.HIGHEST)

        return x, j + j_upper + j_lower
