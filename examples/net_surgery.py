"""Net surgery: casting a classifier into a fully-convolutional net —
the reference's flagship pycaffe demo (`examples/net_surgery.ipynb` /
`examples/net_surgery/bvlc_caffenet_full_conv.prototxt`): fc6/fc7/fc8
become 6x6 / 1x1 / 1x1 convolutions carrying the SAME weights, so the net
slides over larger images and emits a dense score MAP instead of a single
vector.

Surgery here is plain pytree editing — params are dicts of arrays, so the
reference's `net.params['fc6'][0].data[...] = ...` becomes a reshape into
the conv weight layout (HWIO). The framework invariant checked at the end:
on a classification-sized input, the full-conv net's 1x1 score map equals
the original classifier's logits.

Usage:
    python examples/net_surgery.py            # CPU
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.train_eval_sparse import log  # noqa: E402


def fullconv_specs(num_classes=1000):
    """CaffeNet trunk with fc6/fc7/fc8 as convolutions (the reference's
    bvlc_caffenet_full_conv.prototxt)."""
    from caffe_escoin_tpu.models.caffenet import _trunk
    from caffe_escoin_tpu.nn import LayerSpec

    specs = [s for s in _trunk(fuse_relu=False)
             if not s.name.startswith(("fc", "relu6", "relu7",
                                       "drop6", "drop7"))]
    specs += [
        LayerSpec("fc6-conv", "Convolution", ("pool5",),
                  params=dict(num_output=4096, kernel=6)),
        LayerSpec("relu6", "ReLU", ("fc6-conv",), tops=("fc6r",)),
        LayerSpec("fc7-conv", "Convolution", ("fc6r",),
                  params=dict(num_output=4096, kernel=1)),
        LayerSpec("relu7", "ReLU", ("fc7-conv",), tops=("fc7r",)),
        LayerSpec("fc8-conv", "Convolution", ("fc7r",),
                  params=dict(num_output=num_classes, kernel=1)),
        LayerSpec("prob", "Softmax", ("fc8-conv",)),
    ]
    return specs


def transplant_fc_to_conv(fc_w, fc_b, kernel, cin):
    """Caffe stores fc rows over the flattened (h, w, c) bottom (this
    framework's NHWC flatten order); a conv expects HWIO. The fc weight is
    [k*k*cin, cout] -> reshape to [k, k, cin, cout] — coefficients are
    IDENTICAL, only the view changes (net_surgery.ipynb 'the weights are
    the same, up to reshape')."""
    cout = fc_w.shape[1]
    return fc_w.reshape(kernel, kernel, cin, cout), fc_b


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from caffe_escoin_tpu.models.caffenet import caffenet
    from caffe_escoin_tpu.nn import Net

    num_classes = 100  # keep the offline demo light; same math as 1000
    rng = np.random.default_rng(0)

    # the trained classifier (random weights stand in for the zoo download)
    cls_net = Net(caffenet(num_classes=num_classes), phase="test")
    params = cls_net.init(jax.random.PRNGKey(0), {"data": (1, 227, 227, 3)})

    # ---- surgery: transplant fc weights into conv layers
    fc_net = Net(fullconv_specs(num_classes=num_classes), phase="test")
    fparams = fc_net.init(jax.random.PRNGKey(1), {"data": (1, 227, 227, 3)})
    fparams = dict(fparams)
    for src, dst, k, cin in [("fc6", "fc6-conv", 6, 256),
                             ("fc7", "fc7-conv", 1, 4096),
                             ("fc8", "fc8-conv", 1, 4096)]:
        w, b = np.asarray(params[src]["w"]), np.asarray(params[src]["b"])
        cw, cb = transplant_fc_to_conv(w, b, k, cin)
        assert fparams[dst]["w"].shape == cw.shape, (src, cw.shape)
        fparams[dst] = dict(fparams[dst], w=jnp.asarray(cw),
                            b=jnp.asarray(cb))
        log(f"transplanted {src} {w.shape} -> {dst} {cw.shape}")
    for name in ("conv1", "conv2", "conv3", "conv4", "conv5"):
        fparams[name] = params[name]

    # ---- invariant: on the classifier-sized input the 1x1 score map
    # equals the original logits
    x = jnp.asarray(rng.standard_normal((1, 227, 227, 3)).astype(np.float32)
                    * 0.1)
    logits = np.asarray(cls_net.apply(params, {"data": x})["prob"])
    fmap = np.asarray(fc_net.apply(fparams, {"data": x})["prob"])
    assert fmap.shape[1:3] == (1, 1), fmap.shape
    err = np.abs(fmap[:, 0, 0, :] - logits).max()
    log(f"227x227 parity: score-map (1x1) vs classifier, max err {err:.2e}")
    assert err < 1e-5

    # ---- the payoff: a larger image yields a dense score map in ONE pass
    big = jnp.asarray(
        rng.standard_normal((1, 451, 451, 3)).astype(np.float32) * 0.1)
    fmap = np.asarray(fc_net.apply(fparams, {"data": big})["prob"])
    log(f"451x451 input -> score map {fmap.shape} "
        f"({fmap.shape[1]}x{fmap.shape[2]} positions x "
        f"{fmap.shape[3]} classes)")
    assert fmap.shape[1] > 1 and fmap.shape[2] > 1
    print(f"net_surgery: parity_err {err:.2e} "
          f"map {fmap.shape[1]}x{fmap.shape[2]}x{fmap.shape[3]}")


if __name__ == "__main__":
    main()
