"""Bijector protocol.

The reference builds its invertible nets on FrEIA's stateful nn.Module graph
(``ReversibleGraphNet``; usage at /root/reference/train_unconditional.py:124-125).
Here a bijector is static structure + pure functions over parameter pytrees,
so entire models trace once and compile to a single XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

Params = Any  # nested dict pytree of jnp arrays
Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Bijector:
    """Base class. Subclasses are frozen dataclasses (hashable, static)."""

    #: width of the (flat, feature-axis) input this bijector transforms
    dim: int = 0
    #: width of the conditioning vector concatenated to subnet inputs (0 = none)
    cond_dim: int = 0

    def init(self, key: Array) -> Params:
        raise NotImplementedError

    def forward(self, params: Params, x: Array, cond: Optional[Array] = None):
        raise NotImplementedError

    def inverse(self, params: Params, y: Array, cond: Optional[Array] = None):
        raise NotImplementedError

    def trainable_mask(self, params: Params) -> Params:
        """Pytree of bools matching ``params``: True where trainable.

        Default: everything trainable. Bijectors with frozen buffers (e.g.
        fixed Householder reflections) override this. The trainer uses the
        mask for init-scale overwriting, weight decay and update masking —
        mirroring the reference's ``params_trainable`` filtering
        (/root/reference/configs/plus_shape/unconditional_hint_4_full.py:76).
        """
        return jax.tree.map(lambda _: True, params)

    # -- helpers -----------------------------------------------------------

    @staticmethod
    def _zeros_logdet(x: Array) -> Array:
        return jnp.zeros(x.shape[:1], dtype=x.dtype)
