"""Affine coupling bijectors.

Capability parity with the FrEIA modules the reference composes
(SURVEY.md §2.2):

* ``AffineCoupling`` — two-sided (GLOW/RealNVP-style) affine coupling with an
  optional concatenated condition, as used by the ``inn`` and ``cinn``
  families (/root/reference/configs/plus_shape/unconditional_inn_4.py:65-69,
  /root/reference/configs/plus_shape/conditional_cinn_4.py:66-71).
* ``ExternalAffineCoupling`` — scale/translation of the *entire* input driven
  purely by an external condition lane; the y→x cross-lane coupling in
  two-lane conditional HINT
  (/root/reference/configs/plus_shape/conditional_hint_8_full.py:78-83). It
  contributes to the x-lane log-det (``x_jac`` includes ``ac_y_to_x*`` nodes,
  /root/reference/train_conditional.py:50-55).

Both use the framework-wide soft clamp ``e(s) = exp(clamp·0.636·atan(s))``
(see hint_tpu.ops.clamp; reference formula at /root/reference/hint.py:56-60).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hint_tpu.ops.base import Array, Bijector, Params
from hint_tpu.ops.clamp import soft_clamp_exp, soft_clamp_log
from hint_tpu.ops.subnets import MLPSpec


@dataclasses.dataclass(frozen=True)
class AffineCoupling(Bijector):
    """Two-sided affine coupling.

    Split ``x`` into ``(x1, x2)`` at ``dim // 2``. One subnet maps
    ``x1 (⊕ cond)`` to ``(s2, t2)`` transforming ``x2``; a second subnet maps
    the *transformed* ``y2 (⊕ cond)`` to ``(s1, t1)`` transforming ``x1``.
    Exactly invertible; log-det is the sum of both clamped log-scales.
    """

    hidden: int = 64
    clamp: float = 4.0
    compute_dtype: str = "float32"

    @property
    def _split1(self) -> int:
        return self.dim // 2

    @property
    def _split2(self) -> int:
        return self.dim - self.dim // 2

    def _subnets(self):
        f1 = MLPSpec(self._split1 + self.cond_dim, self.hidden, 2 * self._split2, self.compute_dtype)
        f2 = MLPSpec(self._split2 + self.cond_dim, self.hidden, 2 * self._split1, self.compute_dtype)
        return f1, f2

    def init(self, key: Array) -> Params:
        k1, k2 = jax.random.split(key)
        f1, f2 = self._subnets()
        return {"f1": f1.init(k1), "f2": f2.init(k2)}

    def _st(self, spec: MLPSpec, params: Params, h: Array, cond: Optional[Array], out_dim: int):
        if self.cond_dim > 0:
            h = jnp.concatenate([h, cond], axis=-1)
        a = spec.apply(params, h)
        return a[:, :out_dim], a[:, out_dim:]

    def forward(self, params: Params, x: Array, cond: Optional[Array] = None):
        f1, f2 = self._subnets()
        x1, x2 = x[:, : self._split1], x[:, self._split1 :]
        s2, t2 = self._st(f1, params["f1"], x1, cond, self._split2)
        y2 = soft_clamp_exp(s2, self.clamp) * x2 + t2
        s1, t1 = self._st(f2, params["f2"], y2, cond, self._split1)
        y1 = soft_clamp_exp(s1, self.clamp) * x1 + t1
        logdet = jnp.sum(soft_clamp_log(s2, self.clamp), axis=-1) + jnp.sum(
            soft_clamp_log(s1, self.clamp), axis=-1
        )
        return jnp.concatenate([y1, y2], axis=-1), logdet

    def inverse(self, params: Params, y: Array, cond: Optional[Array] = None):
        f1, f2 = self._subnets()
        y1, y2 = y[:, : self._split1], y[:, self._split1 :]
        s1, t1 = self._st(f2, params["f2"], y2, cond, self._split1)
        x1 = (y1 - t1) / soft_clamp_exp(s1, self.clamp)
        s2, t2 = self._st(f1, params["f1"], x1, cond, self._split2)
        x2 = (y2 - t2) / soft_clamp_exp(s2, self.clamp)
        logdet = -(
            jnp.sum(soft_clamp_log(s2, self.clamp), axis=-1)
            + jnp.sum(soft_clamp_log(s1, self.clamp), axis=-1)
        )
        return jnp.concatenate([x1, x2], axis=-1), logdet


@dataclasses.dataclass(frozen=True)
class ExternalAffineCoupling(Bijector):
    """Affine transform of the whole input, driven by the condition only.

    ``(s, t) = F(cond)``; ``y = e(s) ⊙ x + t``. Requires ``cond_dim > 0``.
    """

    hidden: int = 64
    clamp: float = 4.0
    compute_dtype: str = "float32"

    def __post_init__(self):
        if self.cond_dim <= 0:
            raise ValueError("ExternalAffineCoupling requires cond_dim > 0")

    def _subnet(self) -> MLPSpec:
        return MLPSpec(self.cond_dim, self.hidden, 2 * self.dim, self.compute_dtype)

    def init(self, key: Array) -> Params:
        return {"f": self._subnet().init(key)}

    def _st(self, params: Params, cond: Array):
        a = self._subnet().apply(params["f"], cond)
        return a[:, : self.dim], a[:, self.dim :]

    def forward(self, params: Params, x: Array, cond: Optional[Array] = None):
        s, t = self._st(params, cond)
        y = soft_clamp_exp(s, self.clamp) * x + t
        return y, jnp.sum(soft_clamp_log(s, self.clamp), axis=-1)

    def inverse(self, params: Params, y: Array, cond: Optional[Array] = None):
        s, t = self._st(params, cond)
        x = (y - t) / soft_clamp_exp(s, self.clamp)
        return x, -jnp.sum(soft_clamp_log(s, self.clamp), axis=-1)
