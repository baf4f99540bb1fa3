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


def multinomial_logistic_loss(probs, labels, *, eps=1e-20):
    """-log(p[label]) over already-normalized probabilities
    (multinomial_logistic_loss_layer.cpp; use softmax_cross_entropy for
    logits)."""
    p = jnp.take_along_axis(probs, labels[:, None].astype(jnp.int32), axis=-1)
    return -jnp.mean(jnp.log(jnp.maximum(p[:, 0], eps)))


def infogain_loss(probs, labels, infogain, *, eps=1e-20):
    """-sum_j H[label, j] * log(p_j), averaged over batch
    (infogain_loss_layer.cpp). infogain H: [C, C]; H = I reduces to
    multinomial logistic loss."""
    h_rows = jnp.take(infogain, labels.astype(jnp.int32), axis=0)  # [N, C]
    return -jnp.mean(
        jnp.sum(h_rows * jnp.log(jnp.maximum(probs, eps)), axis=-1)
    )


def contrastive_loss(a, b, similar, *, margin=1.0, legacy_version=False):
    """Hadsell-Chopra-LeCun contrastive loss (contrastive_loss_layer.cpp):
    L = 1/2N * sum[ y*d^2 + (1-y)*max(margin - d, 0)^2 ]  (d = ||a-b||).
    legacy_version uses max(margin - d^2, 0) (the layer's legacy flag)."""
    diff = a - b
    d2 = jnp.sum(diff * diff, axis=-1)
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    y = similar.astype(a.dtype)
    if legacy_version:
        dissim = jnp.maximum(margin - d2, 0.0)
    else:
        dissim = jnp.maximum(margin - d, 0.0) ** 2
    return 0.5 * jnp.mean(y * d2 + (1.0 - y) * dissim)


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
