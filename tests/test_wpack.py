"""W-pair packed layout reparametrizations (ops/wpack.py): exactness vs
the ordinary conv on unpacked tensors, across kernel sizes, pads, pack
factors and strides."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from caffe_escoin_tpu.ops import wpack  # noqa: E402


def ref_conv(x, w, stride=(1, 1), padding=((0, 0), (0, 0))):
    return lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), stride, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("kw,pad_w,r", [
    (3, 1, 2), (3, 1, 4), (1, 0, 2), (5, 2, 2), (3, 0, 2), (2, 1, 2)])
def test_packed_weight_exact(kw, pad_w, r):
    rng = np.random.default_rng(0)
    n, h, w, c = 2, 5, 8, 4
    kh, ph = 3, 1
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    wt = rng.standard_normal((kh, kw, c, 3)).astype(np.float32)
    want = ref_conv(x, wt, padding=((ph, ph), (pad_w, pad_w)))
    wo = w + 2 * pad_w - kw + 1
    if wo % r:
        pytest.skip("output width not divisible by pack factor")
    wp, (pl, _) = wpack.packed_weight(wt, r, pad_w)
    pr = wpack.packed_pad_right(w, kw, pad_w, r)
    xp = wpack.pack_nhwc(x, r)
    got_p = ref_conv(xp, wp, padding=((ph, ph), (pl, pr)))
    got = wpack.unpack_nhwc(np.asarray(got_p), r)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kw,pad_w,sw,r", [
    (1, 0, 1, 2), (1, 0, 1, 4), (3, 1, 1, 2), (1, 0, 2, 2), (3, 1, 2, 2)])
def test_entry_weight_exact(kw, pad_w, sw, r):
    rng = np.random.default_rng(1)
    n, h, w, c = 2, 4, 16, 4
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    wt = rng.standard_normal((1, kw, c, 3)).astype(np.float32)
    want = ref_conv(x, wt, stride=(1, sw), padding=((0, 0), (pad_w, pad_w)))
    wo = (w + 2 * pad_w - kw) // sw + 1
    if wo % r:
        pytest.skip("output width not divisible by pack factor")
    wp, (pl, _), swp = wpack.entry_weight(wt, r, sw, pad_w)
    pr = wpack.entry_pad_right(w, kw, sw, pad_w, r)
    got_p = ref_conv(x, wp, stride=(1, swp), padding=((0, 0), (pl, pr)))
    got = wpack.unpack_nhwc(np.asarray(got_p), r)
    np.testing.assert_allclose(
        got, np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kw,pad_w,r", [
    (1, 0, 2), (3, 1, 2), (1, 0, 4), (5, 2, 2)])
def test_exit_weight_exact(kw, pad_w, r):
    rng = np.random.default_rng(2)
    n, h, w, c = 2, 4, 16, 4
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    wt = rng.standard_normal((1, kw, c, 3)).astype(np.float32)
    want = ref_conv(x, wt, padding=((0, 0), (pad_w, pad_w)))
    xp = jnp.asarray(wpack.pack_nhwc(x, r))
    K, (pl, _), dil = wpack.exit_weight(wt, r, pad_w)
    pr = wpack.exit_pad_right(w // r, kw, pad_w, r)
    got = lax.conv_general_dilated(
        xp, jnp.asarray(K), (1, 1), ((0, 0), (pl, pr)),
        lhs_dilation=(1, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("r_in,r_out,sw,kw,pad_w", [
    (2, 2, 1, 3, 1), (2, 2, 1, 1, 0), (4, 4, 1, 3, 1),
    (1, 2, 1, 1, 0), (1, 2, 2, 7, 3), (1, 4, 1, 3, 1),
    (2, 1, 2, 1, 0), (2, 1, 2, 3, 1), (4, 2, 2, 1, 0),
    (2, 4, 1, 1, 0), (2, 2, 1, 5, 2),
])
def test_repack_weight_general(r_in, r_out, sw, kw, pad_w):
    rng = np.random.default_rng(7)
    n, h, w, c, co = 2, 4, 16, 4, 3
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    wt = rng.standard_normal((1, kw, c, co)).astype(np.float32)
    wo = (w + 2 * pad_w - kw) // sw + 1
    if wo % r_out or w % r_in:
        pytest.skip("width not divisible")
    want = ref_conv(x, wt, stride=(1, sw), padding=((0, 0), (pad_w, pad_w)))
    wp, (pl, pr), s_p = wpack.repack_weight(wt, r_in, r_out, sw, pad_w, w)
    assert pl == pr  # symmetrized
    xp = jnp.asarray(wpack.pack_nhwc(x, r_in))
    got_p = ref_conv(xp, wp, stride=(1, s_p), padding=((0, 0), (pl, pr)))
    got = wpack.unpack_nhwc(np.asarray(got_p), r_out)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_repack_rejects_fractional_stride():
    wt = np.zeros((1, 1, 4, 3), np.float32)
    with pytest.raises(AssertionError):
        wpack.repack_weight(wt, 2, 1, 1, 0, 16)


def test_pack_factor():
    assert wpack.pack_factor(64, 56) == 2
    assert wpack.pack_factor(32, 56) == 4
    assert wpack.pack_factor(32, 28) == 4
    assert wpack.pack_factor(16, 28) == 4   # 8 would need W % 8 == 0
    assert wpack.pack_factor(128, 56) == 1
    assert wpack.pack_factor(96, 28) == 1
    assert wpack.pack_factor(64, 55) == 1   # odd width: no packing


def test_pack_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 8, 4)).astype(np.float32)
    np.testing.assert_array_equal(
        wpack.unpack_nhwc(wpack.pack_nhwc(x, 2), 2), x)
