"""Finite-difference gradient checks (utils/gradient_check.py), the analogue
of the reference's GradientChecker applied throughout
`src/caffe/test/test_*_layer.cpp` (util at
`include/caffe/test/test_gradient_check_util.hpp:18-60` incl. kink handling).

jax.grad's correctness is assumed for primitives; these tests target the
*compositions* this framework hand-rolls: non-smooth activations, margin
losses, masking contracts (Filter), eltwise max straight-through, loss_weight
accumulation through Net.loss."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from caffe_escoin_tpu.ops import activations as act  # noqa: E402
from caffe_escoin_tpu.ops import losses  # noqa: E402
from caffe_escoin_tpu.ops import structural  # noqa: E402
from caffe_escoin_tpu.utils.gradient_check import (  # noqa: E402
    check_gradient,
    fd_gradients,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_fd_estimator_on_smooth_fn(rng):
    x = jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32))
    est = fd_gradients(lambda x: jnp.sum(jnp.sin(x) ** 2), (x,), eps=1e-3)
    # f32 forward evals bound the FD estimate's own precision to ~1e-3
    np.testing.assert_allclose(est, 2 * np.sin(x) * np.cos(x), atol=2e-3)


def test_checker_catches_wrong_gradient(rng):
    x = jnp.asarray(rng.standard_normal((5,)).astype(np.float32)) + 3.0

    @jax.custom_vjp
    def broken(x):
        return jnp.sum(x * x)

    broken.defvjp(lambda x: (jnp.sum(x * x), x),
                  lambda res, g: (g * res,))  # missing the factor 2
    with pytest.raises(AssertionError):
        check_gradient(broken, (x,))


@pytest.mark.parametrize("slope", [0.0, 0.25])
def test_relu_gradient_with_kink(rng, slope):
    x = jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32))
    check_gradient(
        lambda x: jnp.sum(act.relu(x, slope) * 1.7),
        (x,),
        kink=np.abs(np.asarray(x)),
        kink_range=1e-2,
    )


def test_prelu_gradient_both_args(rng):
    x = jnp.asarray(rng.standard_normal((4, 3, 3, 5)).astype(np.float32))
    alpha = jnp.asarray(rng.uniform(0.1, 0.4, 5).astype(np.float32))
    kink = np.abs(np.asarray(x))
    check_gradient(lambda x, a: jnp.sum(act.prelu(x, a) ** 2), (x, alpha),
                   wrt=0, kink=kink, kink_range=1e-2)
    check_gradient(lambda x, a: jnp.sum(act.prelu(x, a) ** 2), (x, alpha),
                   wrt=1)


@pytest.mark.parametrize("norm", ["L1", "L2"])
def test_hinge_loss_gradient(rng, norm):
    logits = jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32) * 2)
    labels = jnp.asarray(rng.integers(0, 4, 6))
    # kink where a margin 1 + s_j - s_y crosses 0: distance per logit element
    lg = np.asarray(logits)
    true = lg[np.arange(6), np.asarray(labels)]
    kink = np.abs(1.0 + lg - true[:, None])
    check_gradient(
        lambda l: losses.hinge_loss(l, labels, norm=norm), (logits,),
        kink=kink, kink_range=2e-2,
    )


@pytest.mark.parametrize("legacy", [False, True])
def test_contrastive_loss_gradient(rng, legacy):
    a = jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 2, 8))
    # kink where margin - d (or margin - d^2) crosses 0 for dissimilar pairs
    d = np.linalg.norm(np.asarray(a - b), axis=-1)
    dist = np.abs(1.0 - (d ** 2 if legacy else d))
    dist = np.where(np.asarray(y) == 1, np.inf, dist)
    kink = np.broadcast_to(dist[:, None], a.shape)
    for wrt in (0, 1):
        check_gradient(
            lambda a, b: losses.contrastive_loss(a, b, y,
                                                 legacy_version=legacy),
            (a, b), wrt=wrt, kink=kink, kink_range=5e-2,
        )


@pytest.mark.parametrize("op", ["sum", "prod", "max"])
def test_eltwise_gradient(rng, op):
    x = jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32))
    kink = np.abs(np.asarray(x) - np.asarray(y)) if op == "max" else None
    coeffs = [0.7, -1.3] if op == "sum" else None
    for wrt in (0, 1):
        check_gradient(
            lambda a, b: jnp.sum(
                structural.eltwise([a, b], op=op, coeffs=coeffs) ** 2),
            (x, y), wrt=wrt, kink=kink, kink_range=1e-2,
        )


def test_filter_layer_masking_gradient(rng):
    """Filter's straight-through masking contract: gradients flow only to
    selected items (filter_layer.cpp backward zero-fills non-selected)."""
    from caffe_escoin_tpu.nn import LayerSpec
    from caffe_escoin_tpu.nn.net import LAYER_REGISTRY
    from caffe_escoin_tpu.engine.context import ExecutionPolicy

    spec = LayerSpec(name="f", type="Filter", bottoms=["x", "sel"],
                     tops=["y"], params={})
    layer = LAYER_REGISTRY["Filter"](spec, ExecutionPolicy())
    x = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
    sel = jnp.asarray(np.array([1.0, 0.0, 1.0, 1.0, 0.0], np.float32))

    def f(x):
        out, _mask = layer.apply({}, [x, sel], train=False, rng=None)
        return jnp.sum(out ** 2)

    check_gradient(f, (x,))
    g = np.asarray(jax.grad(f)(x))
    assert (g[np.asarray(sel) == 0] == 0).all()


def test_lenet_net_loss_gradient(rng):
    """Whole-net FD check of Net.loss (loss_weight accumulation + conv/pool/
    relu composition) on a miniature LeNet — the reference's
    test_gradient_based_solver.cpp-style integration check."""
    from caffe_escoin_tpu.models import ZOO
    from caffe_escoin_tpu.nn import Net

    builder, _ = ZOO["lenet"]
    net = Net(builder(num_classes=4, include_loss=True))
    shapes = {"data": (2, 20, 20, 1), "label": (2,)}
    params = net.init(jax.random.PRNGKey(0), shapes)
    data = jnp.asarray(rng.standard_normal(shapes["data"]).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 4, 2))

    # check wrt the first conv's weights and the final fc's bias
    flat, tree = jax.tree_util.tree_flatten(params)

    def loss_wrt(i):
        def f(leaf):
            leaves = list(flat)
            leaves[i] = leaf
            p = jax.tree_util.tree_unflatten(tree, leaves)
            return net.loss(p, {"data": data, "label": label}, train=False)
        return f

    small = [i for i, l in enumerate(flat) if l.size <= 80]
    assert small, "expected at least one small leaf to FD-check"
    for i in small[:3]:
        check_gradient(loss_wrt(i), (flat[i],), eps=5e-3, threshold=2e-2)
