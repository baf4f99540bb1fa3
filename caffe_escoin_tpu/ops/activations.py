"""Activation ops — the reference's activation layer catalog as pure fns.

Reference: `src/caffe/layers/{relu,prelu,elu,sigmoid,tanh,bnll,power,exp,log,
absval,threshold,dropout}_layer.cpp`. Semantics match Caffe (e.g. ReLU's
negative_slope, BNLL's overflow guard, Power's (shift + scale*x)^power).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relu(x, negative_slope: float = 0.0):
    if negative_slope:
        return jnp.where(x > 0, x, negative_slope * x)
    return jnp.maximum(x, 0.0)


def prelu(x, alpha):
    """alpha: per-channel [C] (broadcast on last axis) or scalar."""
    return jnp.where(x > 0, x, alpha * x)


def elu(x, alpha: float = 1.0):
    return jnp.where(x > 0, x, alpha * (jnp.exp(jnp.minimum(x, 0.0)) - 1.0))


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def bnll(x):
    """log(1 + exp(x)), overflow-safe (bnll_layer.cpp threshold trick)."""
    return jnp.where(x > 0, x + jnp.log1p(jnp.exp(-jnp.abs(x))),
                     jnp.log1p(jnp.exp(jnp.minimum(x, 0.0))))


def power(x, power: float = 1.0, scale: float = 1.0, shift: float = 0.0):
    return jnp.power(shift + scale * x, power)


def exp(x, base: float = -1.0, scale: float = 1.0, shift: float = 0.0):
    """base<0 means e (exp_layer.cpp)."""
    y = scale * x + shift
    if base > 0:
        return jnp.power(base, y)
    return jnp.exp(y)


def log(x, base: float = -1.0, scale: float = 1.0, shift: float = 0.0):
    y = scale * x + shift
    out = jnp.log(y)
    if base > 0:
        out = out / jnp.log(base)
    return out


def absval(x):
    return jnp.abs(x)


def threshold(x, thresh: float = 0.0):
    return (x > thresh).astype(x.dtype)


def dropout(x, rate: float, *, rng=None, train: bool = False):
    """Inverted dropout (dropout_layer.cpp scales by 1/(1-rate) at train)."""
    if not train or rate <= 0.0:
        return x
    if rng is None:
        raise ValueError("dropout(train=True) requires an rng key")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def softmax(x, axis: int = -1):
    return jax.nn.softmax(x, axis=axis)
