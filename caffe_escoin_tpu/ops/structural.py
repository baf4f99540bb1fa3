"""Structural ops: concat/slice/split/flatten/reshape/eltwise/crop/tile/
reduction/argmax — the reference's "plumbing" layer set
(`src/caffe/layers/{concat,slice,split,flatten,reshape,eltwise,crop,tile,
reduction,argmax,filter,batch_reindex}_layer.cpp`) as trivial jnp wrappers.
They exist so Net graph specs can name them; all are trace-time shape ops XLA
fuses away.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def concat(xs: Sequence, axis: int = -1):
    return jnp.concatenate(list(xs), axis=axis)


def slice_points(x, points: Sequence[int], axis: int = -1):
    """Split x at the given indices along axis (slice_layer.cpp)."""
    return jnp.split(x, list(points), axis=axis)


def split(x, n: int = 2):
    """Caffe Split = fan-out the same blob (identity copies)."""
    return tuple(x for _ in range(n))


def flatten(x, start_axis: int = 1):
    lead = x.shape[:start_axis]
    return x.reshape(*lead, -1)


def reshape(x, shape):
    return x.reshape(shape)


def eltwise(xs: Sequence, op: str = "sum", coeffs=None):
    xs = list(xs)
    if op == "sum":
        if coeffs is None:
            out = xs[0]
            for x in xs[1:]:
                out = out + x
            return out
        out = coeffs[0] * xs[0]
        for c, x in zip(coeffs[1:], xs[1:]):
            out = out + c * x
        return out
    if op == "prod":
        out = xs[0]
        for x in xs[1:]:
            out = out * x
        return out
    if op == "max":
        out = xs[0]
        for x in xs[1:]:
            out = jnp.maximum(out, x)
        return out
    raise ValueError(f"unknown eltwise op {op!r}")


def crop(x, ref_shape, offsets=(0, 0), axes=(1, 2)):
    """Crop x to ref_shape along axes with offsets (crop_layer.cpp)."""
    idx = [slice(None)] * x.ndim
    for ax, off in zip(axes, offsets):
        idx[ax] = slice(off, off + ref_shape[ax])
    return x[tuple(idx)]


def tile(x, reps: int, axis: int = -1):
    r = [1] * x.ndim
    r[axis] = reps
    return jnp.tile(x, r)


def reduction(x, op: str = "sum", axis=None, coeff: float = 1.0):
    fn = {"sum": jnp.sum, "mean": jnp.mean, "asum": lambda a, axis: jnp.sum(jnp.abs(a), axis),
          "sumsq": lambda a, axis: jnp.sum(a * a, axis)}[op]
    return coeff * fn(x, axis=axis)


def argmax(x, axis: int = -1):
    return jnp.argmax(x, axis=axis)
