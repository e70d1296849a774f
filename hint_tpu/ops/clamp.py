"""Soft clamp for coupling scales.

The reference clamps the multiplicative coupling factor through
``e(s) = exp(clamp * 0.636 * atan(s))`` (/root/reference/hint.py:56-60), which
bounds ``log e(s)`` to ``(-clamp, clamp)`` since ``0.636 * atan`` saturates at
±1 (0.636 ≈ 2/π). We use the same family for *every* coupling in the
framework so all bijectors share one numerically-consistent scale semantics.
"""

import jax.numpy as jnp

#: 2/pi, truncated exactly as in the reference (hint.py:57) for parity.
ATAN_SCALE = 0.636


def soft_clamp_log(s, clamp: float):
    """log of the clamped scale: ``clamp * 0.636 * atan(s)``."""
    return clamp * ATAN_SCALE * jnp.arctan(s)


def soft_clamp_exp(s, clamp: float):
    """Clamped multiplicative scale: ``exp(clamp * 0.636 * atan(s))``."""
    return jnp.exp(soft_clamp_log(s, clamp))
