"""Coupling subnet: 3-layer ReLU MLP.

Mirrors the capability of the reference's ``linear_subnet_constructor``
(/root/reference/hint.py:10-13) and FrEIA's ``F_fully_connected`` (usage at
/root/reference/configs/plus_shape/unconditional_inn_4.py:67-68): a
``in -> hidden -> hidden -> out`` MLP with ReLU nonlinearities.

Params are a flat dict ``{w0,b0,w1,b1,w2,b2}``. Matmul compute dtype is
configurable (``bfloat16`` keeps the MXU at full rate; accumulation is always
float32 via ``preferred_element_type``). Parameters are stored float32.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hint_tpu.ops.base import Array, Params


@dataclasses.dataclass(frozen=True)
class MLPSpec:
    in_dim: int
    hidden: int
    out_dim: int
    compute_dtype: str = "float32"

    def init(self, key: Array) -> Params:
        """Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) init (torch.nn.Linear-like).

        Note: training overwrites every trainable with ``init_scale * N(0,1)``
        anyway (reference: /root/reference/train_unconditional.py:165-167).
        """
        keys = jax.random.split(key, 6)
        dims = [(self.in_dim, self.hidden), (self.hidden, self.hidden), (self.hidden, self.out_dim)]
        params = {}
        for i, (fan_in, fan_out) in enumerate(dims):
            bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1)).astype(jnp.float32)
            params[f"w{i}"] = jax.random.uniform(
                keys[2 * i], (fan_in, fan_out), jnp.float32, -bound, bound
            )
            params[f"b{i}"] = jax.random.uniform(
                keys[2 * i + 1], (fan_out,), jnp.float32, -bound, bound
            )
        return params

    def apply(self, params: Params, x: Array) -> Array:
        cdt = jnp.dtype(self.compute_dtype)
        # float32 params on TPU default to bf16 matmul passes; request true
        # f32 precision so round-trip/log-det meet the 1e-5 parity target.
        prec = jax.lax.Precision.HIGHEST if cdt == jnp.float32 else jax.lax.Precision.DEFAULT
        h = x
        for i in range(3):
            w = params[f"w{i}"]
            h = jnp.dot(
                h.astype(cdt), w.astype(cdt),
                preferred_element_type=jnp.float32, precision=prec,
            )
            h = h + params[f"b{i}"]
            if i < 2:
                h = jax.nn.relu(h)
        return h

    @property
    def n_params(self) -> int:
        return (
            self.in_dim * self.hidden
            + self.hidden * self.hidden
            + self.hidden * self.out_dim
            + 2 * self.hidden
            + self.out_dim
        )
