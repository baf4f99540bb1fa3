"""Loss and metric ops.

Reference: `src/caffe/layers/{softmax_loss,sigmoid_cross_entropy_loss,
euclidean_loss,hinge_loss,accuracy}_layer.cpp`. Semantics match Caffe:
softmax loss averages over valid (non-ignored) examples, hinge is L1 by
default, euclidean is 1/(2N) * ||a-b||^2.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits, labels, *, ignore_label: Optional[int] = None):
    """logits [N, C], integer labels [N] -> scalar mean loss."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if ignore_label is not None:
        valid = (labels != ignore_label).astype(logits.dtype)
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.mean(nll)


def sigmoid_cross_entropy(logits, targets):
    """Elementwise sigmoid CE, summed over features, averaged over batch
    (sigmoid_cross_entropy_loss_layer.cpp normalizes by batch size)."""
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.sum(per) / logits.shape[0]


def euclidean_loss(a, b):
    d = (a - b).reshape(a.shape[0], -1)
    return 0.5 * jnp.mean(jnp.sum(d * d, axis=-1))


def hinge_loss(logits, labels, *, norm: str = "L1"):
    n, c = logits.shape
    one_hot = jax.nn.one_hot(labels, c, dtype=logits.dtype)
    margins = jnp.maximum(0.0, 1.0 + logits - jnp.sum(logits * one_hot, -1, keepdims=True))
    margins = margins * (1.0 - one_hot)  # exclude the true class
    if norm == "L2":
        return jnp.sum(margins * margins) / n
    return jnp.sum(margins) / n


def accuracy(logits, labels, *, top_k: int = 1, ignore_label: Optional[int] = None):
    """Top-k accuracy (accuracy_layer.cpp)."""
    if top_k == 1:
        correct = (jnp.argmax(logits, axis=-1) == labels)
    else:
        topk = jax.lax.top_k(logits, top_k)[1]
        correct = jnp.any(topk == labels[:, None], axis=-1)
    correct = correct.astype(jnp.float32)
    if ignore_label is not None:
        valid = (labels != ignore_label).astype(jnp.float32)
        return jnp.sum(correct * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.mean(correct)
