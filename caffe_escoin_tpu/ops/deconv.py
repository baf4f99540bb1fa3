"""Transposed convolution (Caffe Deconvolution layer).

Reference: `src/caffe/layers/deconv_layer.cpp` — conv with forward/backward
swapped: out_size = (in - 1) * stride + kernel - 2 * pad.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def deconv2d(x, w_hwio, bias=None, *, stride=(1, 1), padding=(0, 0),
             dilation=(1, 1), relu=False):
    """x: [N,H,W,Cin], w: [KH,KW,Cout,Cin] stored HWOI? We keep HWIO with
    I=Cin, O=Cout and use conv_general_dilated in transpose formulation
    (lhs_dilation = stride), matching Caffe's output sizing."""
    kh, kw = w_hwio.shape[:2]
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    # transposed conv = conv with lhs dilation and flipped kernel
    w_flipped = w_hwio[::-1, ::-1]
    # swap I/O: w is [KH,KW,Cin,Cout] for the forward view; conv over dilated
    # input contracts Cin
    out = lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1, 1),
        padding=[
            (dh * (kh - 1) - ph, dh * (kh - 1) - ph),
            (dw * (kw - 1) - pw, dw * (kw - 1) - pw),
        ],
        lhs_dilation=(sh, sw),
        rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias
    if relu:
        out = jnp.maximum(out, 0.0)
    return out
