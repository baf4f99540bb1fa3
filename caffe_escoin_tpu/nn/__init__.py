from caffe_escoin_tpu.nn.net import Layer, LayerSpec, Net, register_layer  # noqa: F401
from caffe_escoin_tpu.nn import layers as _layers  # noqa: F401  (registry population)
from caffe_escoin_tpu.nn import data_layers as _data_layers  # noqa: F401  (registry population)
from caffe_escoin_tpu.nn.fuse import fuse_inference  # noqa: F401
