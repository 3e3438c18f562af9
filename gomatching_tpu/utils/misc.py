"""Small numeric helpers shared across the stack.

Parity notes reference: third_party/adet/utils/misc.py:115-131 (inverse_sigmoid and the
sigmoid-offset family).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


def sigmoid_offset(x, offset: bool = True):
    if offset:
        return jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)
    return jax.nn.sigmoid(x)


def inverse_sigmoid_offset(x, eps: float = 1e-5, offset: bool = True):
    if offset:
        return jnp.clip(x, 0.0, 1.0) * 2.0 - 1.0
    return inverse_sigmoid(x, eps)
