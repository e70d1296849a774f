"""Builders for the five model families of the reference config zoo.

Each builder mirrors one graph-construction pattern (citations give the
canonical reference config):

* ``inn``            — [perm, affine-coupling] × n
                       (configs/plus_shape/unconditional_inn_4.py:58-71)
* ``hint``           — [perm (between blocks only), HAC] × n
                       (configs/plus_shape/unconditional_hint_4_full.py:58-72)
* ``cinn``           — [perm, conditional affine-coupling] × n, one condition
                       (configs/plus_shape/conditional_cinn_4.py:58-73)
* ``recursive_cinn`` — [perm, condition-fed HAC] × n
                       (configs/plus_shape/conditional_recursive_cinn_4.py:58-70)
* ``conditional_hint`` — two-lane graph: per block [perm_y, perm_x (between
                       blocks only), hac_x, external y→x coupling, y-lane
                       coupling] (configs/plus_shape/conditional_hint_8_full.py:58-96)
"""

from __future__ import annotations

from typing import Sequence, Tuple

from hint_tpu.models.flow import LANE_X, LANE_Y, LANE_YX, Flow, ScannedRepeat, TwoLaneFlow
from hint_tpu.ops.coupling import AffineCoupling, ExternalAffineCoupling
from hint_tpu.ops.hac import HierarchicalAffineCoupling
from hint_tpu.ops.householder import HouseholderPerm

DEFAULT_CLAMP = 4.0  # HAC-block default in the reference (hint.py:108)


def inn(
    dim: int,
    n_blocks: int,
    hidden: int,
    perm_fixed: bool = True,
    clamp: float = DEFAULT_CLAMP,
    compute_dtype: str = "float32",
    scan_blocks: bool = False,
) -> Flow:
    perm = HouseholderPerm(dim=dim, n_reflections=dim, fixed=perm_fixed)
    coup = AffineCoupling(dim=dim, hidden=hidden, clamp=clamp, compute_dtype=compute_dtype)
    if scan_blocks and n_blocks > 1:
        return Flow(
            bijectors=(ScannedRepeat(unit=(perm, coup), n=n_blocks, dim=dim),), dim=dim
        )
    ops = []
    for _ in range(n_blocks):
        ops.append(perm)
        ops.append(coup)
    return Flow(bijectors=tuple(ops), dim=dim)


def hint(
    dim: int,
    n_blocks: int,
    c_internal: Sequence[int],
    perm_fixed: bool = True,
    max_splits: int = -1,
    min_split_size: int = 2,
    reshuffle: bool = False,
    clamp: float = DEFAULT_CLAMP,
    compute_dtype: str = "float32",
    impl: str = "levelwise",
    scan_blocks: bool = False,
) -> Flow:
    hac = HierarchicalAffineCoupling(
        dim=dim,
        c_internal=tuple(c_internal),
        clamp=clamp,
        max_splits=max_splits,
        min_split_size=min_split_size,
        reshuffle=reshuffle,
        compute_dtype=compute_dtype,
        impl=impl,
    )
    perm = HouseholderPerm(dim=dim, n_reflections=dim, fixed=perm_fixed)
    if scan_blocks and n_blocks > 2:
        # block 0 alone, then (perm, hac) x (n-1) under one lax.scan
        return Flow(
            bijectors=(hac, ScannedRepeat(unit=(perm, hac), n=n_blocks - 1, dim=dim)),
            dim=dim,
        )
    ops = []
    for i in range(n_blocks):
        if i > 0:  # perm between blocks only (unconditional_hint_4_full.py:60-65)
            ops.append(perm)
        ops.append(hac)
    return Flow(bijectors=tuple(ops), dim=dim)


def cinn(
    dim: int,
    cond_dim: int,
    n_blocks: int,
    hidden: int,
    perm_fixed: bool = False,
    clamp: float = DEFAULT_CLAMP,
    compute_dtype: str = "float32",
) -> Flow:
    ops = []
    for _ in range(n_blocks):
        ops.append(HouseholderPerm(dim=dim, n_reflections=dim, fixed=perm_fixed))
        ops.append(
            AffineCoupling(
                dim=dim, cond_dim=cond_dim, hidden=hidden, clamp=clamp, compute_dtype=compute_dtype
            )
        )
    return Flow(bijectors=tuple(ops), dim=dim, cond_dim=cond_dim)


def recursive_cinn(
    dim: int,
    cond_dim: int,
    n_blocks: int,
    c_internal: Sequence[int],
    perm_fixed: bool = True,
    max_splits: int = -1,
    clamp: float = DEFAULT_CLAMP,
    compute_dtype: str = "float32",
    impl: str = "levelwise",
) -> Flow:
    ops = []
    for _ in range(n_blocks):
        ops.append(HouseholderPerm(dim=dim, n_reflections=dim, fixed=perm_fixed))
        ops.append(
            HierarchicalAffineCoupling(
                dim=dim,
                cond_dim=cond_dim,
                c_internal=tuple(c_internal),
                clamp=clamp,
                max_splits=max_splits,
                compute_dtype=compute_dtype,
                impl=impl,
            )
        )
    return Flow(bijectors=tuple(ops), dim=dim, cond_dim=cond_dim)


def conditional_hint(
    dim_x: int,
    dim_y: int,
    n_blocks: int,
    c_internal: Sequence[int],
    hidden_external: int,
    hidden_y: int,
    perm_fixed: bool = True,
    max_splits: int = -1,
    clamp: float = DEFAULT_CLAMP,
    compute_dtype: str = "float32",
    impl: str = "levelwise",
) -> TwoLaneFlow:
    steps: list = []
    for i in range(n_blocks):
        if i > 0:  # perms between blocks only (conditional_hint_8_full.py:62-70)
            steps.append((LANE_Y, HouseholderPerm(dim=dim_y, n_reflections=dim_y, fixed=perm_fixed)))
            steps.append((LANE_X, HouseholderPerm(dim=dim_x, n_reflections=dim_x, fixed=perm_fixed)))
        steps.append(
            (
                LANE_X,
                HierarchicalAffineCoupling(
                    dim=dim_x,
                    c_internal=tuple(c_internal),
                    clamp=clamp,
                    max_splits=max_splits,
                    compute_dtype=compute_dtype,
                    impl=impl,
                ),
            )
        )
        steps.append(
            (
                LANE_YX,
                ExternalAffineCoupling(
                    dim=dim_x, cond_dim=dim_y, hidden=hidden_external, clamp=clamp,
                    compute_dtype=compute_dtype,
                ),
            )
        )
        steps.append(
            (
                LANE_Y,
                AffineCoupling(dim=dim_y, hidden=hidden_y, clamp=clamp, compute_dtype=compute_dtype),
            )
        )
    return TwoLaneFlow(steps=tuple(steps), dim_y=dim_y, dim_x=dim_x)
