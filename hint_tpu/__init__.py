"""hint_tpu — a TPU-native normalizing-flow framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of vislearn/HINT
(Kruse et al., "HINT: Hierarchical Invertible Neural Transport", arXiv:1905.10687).

Design stance (see SURVEY.md §7):

* Bijectors are pure functions over parameter pytrees:
  ``forward(params, x, cond) -> (y, logdet)`` with an exact ``inverse``.
* Model graphs (INN / HINT / cINN / recursive-cINN / two-lane conditional HINT)
  are static compositions that unroll at trace time and compile to one XLA
  program — no dynamic Python control flow under ``jit``.
* The hierarchical affine coupling tree executes *level-synchronously*: all
  sibling subnets at a tree depth run as one batched matmul on the MXU instead
  of the reference's O(2^depth) sequential tiny MLPs
  (reference: /root/reference/hint.py:62-101).
* Distribution is data-parallel ``jit`` over a ``jax.sharding.Mesh`` with
  gradient all-reduce over ICI (the reference is single-GPU; SURVEY.md §2.4).
"""

__version__ = "0.1.0"

from hint_tpu.ops.subnets import MLPSpec
from hint_tpu.ops.clamp import soft_clamp_exp, soft_clamp_log
from hint_tpu.ops.householder import HouseholderPerm
from hint_tpu.ops.coupling import AffineCoupling, ExternalAffineCoupling
from hint_tpu.ops.hac import HierarchicalAffineCoupling
from hint_tpu.models.flow import (
    Flow,
    ScannedRepeat,
    TwoLaneFlow,
    to_stacked_tree,
    to_unrolled_tree,
    unrolled_view,
)
from hint_tpu.models import builders

__all__ = [
    "MLPSpec",
    "soft_clamp_exp",
    "soft_clamp_log",
    "HouseholderPerm",
    "AffineCoupling",
    "ExternalAffineCoupling",
    "HierarchicalAffineCoupling",
    "Flow",
    "ScannedRepeat",
    "to_stacked_tree",
    "to_unrolled_tree",
    "unrolled_view",
    "TwoLaneFlow",
    "builders",
]
