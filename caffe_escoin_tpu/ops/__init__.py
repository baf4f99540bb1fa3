from caffe_escoin_tpu.ops import activations, conv, linear, losses, norm, pool, structural  # noqa: F401
from caffe_escoin_tpu.ops.conv import conv2d, conv2d_dense, im2col  # noqa: F401
