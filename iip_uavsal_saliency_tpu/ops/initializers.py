"""Weight initializer registry.

TPU-native re-statement of the reference's name->init-fn map
(reference: model.py:35-60, model_convlstm.py:4-29). All initializers operate
on HWIO conv kernels (the JAX/flax layout); fan computations reproduce the
PyTorch `_calculate_fan_in_and_fan_out` semantics on the equivalent OIHW
tensor so that from-scratch training matches the reference's statistics:

    fan_in  = (I/groups) * kh * kw      (HWIO: shape[2] * kh * kw)
    fan_out = O * kh * kw               (HWIO: shape[3] * kh * kw)

Note the PyTorch quirk: fan_out ignores `groups` (it is computed from the
weight tensor alone), so a depthwise kernel stored HWIO as (kh, kw, 1, C)
has fan_out = C*kh*kw. We store depthwise kernels exactly that way, so the
formulas line up without special cases.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp


def _conv_fans(shape) -> tuple[float, float]:
    """(fan_in, fan_out) for an HWIO kernel; linear kernels are (I, O)."""
    if len(shape) == 2:  # dense: (in, out)
        return float(shape[0]), float(shape[1])
    receptive = 1
    for d in shape[:-2]:
        receptive *= d
    return float(shape[-2] * receptive), float(shape[-1] * receptive)


def _leaky_relu_gain(a: float = 0.0) -> float:
    return math.sqrt(2.0 / (1.0 + a * a))


def kaiming_normal(key, shape, dtype=jnp.float32, mode: str = "fan_in", a: float = 0.0):
    fan_in, fan_out = _conv_fans(shape)
    fan = fan_out if mode == "fan_out" else fan_in
    std = _leaky_relu_gain(a) / math.sqrt(fan)
    return std * jax.random.normal(key, shape, dtype)


def kaiming_uniform(key, shape, dtype=jnp.float32, mode: str = "fan_in", a: float = 0.0):
    fan_in, fan_out = _conv_fans(shape)
    fan = fan_out if mode == "fan_out" else fan_in
    bound = _leaky_relu_gain(a) * math.sqrt(3.0 / fan)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform(key, shape, dtype=jnp.float32, gain: float = 1.0):
    fan_in, fan_out = _conv_fans(shape)
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_normal(key, shape, dtype=jnp.float32, gain: float = 1.0):
    fan_in, fan_out = _conv_fans(shape)
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def normal(key, shape, dtype=jnp.float32, mean: float = 0.0, std: float = 1.0):
    return mean + std * jax.random.normal(key, shape, dtype)


def uniform(key, shape, dtype=jnp.float32, low: float = 0.0, high: float = 1.0):
    return jax.random.uniform(key, shape, dtype, low, high)


def orthogonal(key, shape, dtype=jnp.float32, gain: float = 1.0):
    m = int(math.prod(shape[:-1])) if len(shape) > 1 else 1
    n = shape[-1]
    # QR needs the tall orientation: for 'wide' kernels (m < n, e.g. a 1x1
    # expand conv) orthogonalize the transpose and flip back — reduced QR of
    # an (m, n) m<n matrix returns q of shape (m, m), which cannot fill the
    # kernel (torch.nn.init.orthogonal_ does the same transpose dance)
    a = jax.random.normal(key, (max(m, n), min(m, n)), dtype)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    if m < n:
        q = q.T
    return gain * q.reshape(shape)


def ones(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def constant(key, shape, dtype=jnp.float32, value: float = 0.0):
    del key
    return jnp.full(shape, value, dtype)


INIT_REGISTRY: dict[str, Callable[..., Any]] = {
    "uniform": uniform,
    "normal": normal,
    "constant": constant,
    "xavier_uniform": xavier_uniform,
    "xavier_normal": xavier_normal,
    "kaiming_uniform": kaiming_uniform,
    "kaiming_normal": kaiming_normal,
    "orthogonal": orthogonal,
    "ones": ones,
    "zeros": zeros,
}


def make_conv_init(funcname: str = "kaiming_normal", **kwargs):
    """Returns a flax-compatible initializer `f(key, shape, dtype)`."""
    fn = INIT_REGISTRY[funcname]

    def init(key, shape, dtype=jnp.float32):
        return fn(key, shape, dtype, **kwargs)

    return init
