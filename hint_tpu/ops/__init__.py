"""Core invertible ops (bijectors) for hint_tpu.

Every bijector is a frozen dataclass describing *static* structure. Parameters
live in plain pytrees (nested dicts of jnp arrays). The protocol is:

    params          = bij.init(key)
    y, logdet       = bij.forward(params, x, cond)
    x, logdet_inv   = bij.inverse(params, y, cond)
    mask            = bij.trainable_mask(params)   # pytree of bools

``logdet`` has shape ``(batch,)`` and satisfies ``logdet_inv == -logdet``.
"""

from hint_tpu.ops.base import Bijector
from hint_tpu.ops.subnets import MLPSpec
from hint_tpu.ops.householder import HouseholderPerm
from hint_tpu.ops.coupling import AffineCoupling, ExternalAffineCoupling
from hint_tpu.ops.hac import HierarchicalAffineCoupling

__all__ = [
    "Bijector",
    "MLPSpec",
    "HouseholderPerm",
    "AffineCoupling",
    "ExternalAffineCoupling",
    "HierarchicalAffineCoupling",
]
