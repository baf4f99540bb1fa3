"""Weight fillers (reference `include/caffe/filler.hpp`): constant, gaussian,
uniform, xavier, msra. Fan computation follows Caffe (fan_in = size/num_out)
so model-zoo initializations reproduce."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fill(rng, shape, spec, fan_in=None, fan_out=None, dtype=jnp.float32):
    """spec: {"type": "...", ...} like Caffe's FillerParameter."""
    kind = spec.get("type", "xavier")
    if kind == "constant":
        return jnp.full(shape, spec.get("value", 0.0), dtype)
    if kind == "gaussian":
        return spec.get("std", 0.01) * jax.random.normal(rng, shape, dtype) + spec.get(
            "mean", 0.0
        )
    if kind == "uniform":
        lo, hi = spec.get("min", 0.0), spec.get("max", 1.0)
        return jax.random.uniform(rng, shape, dtype, lo, hi)
    size = int(np.prod(shape))
    if fan_in is None:
        fan_in = size // shape[-1]
    if fan_out is None:
        fan_out = size // max(1, fan_in) if fan_in else shape[-1]
    if kind == "xavier":
        n = fan_in  # Caffe default variance_norm = FAN_IN
        scale = float(np.sqrt(3.0 / n))
        return jax.random.uniform(rng, shape, dtype, -scale, scale)
    if kind == "msra":
        n = fan_in
        std = float(np.sqrt(2.0 / n))
        return std * jax.random.normal(rng, shape, dtype)
    raise ValueError(f"unknown filler {kind!r}")
