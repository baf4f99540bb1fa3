from caffe_escoin_tpu.models import cifar, lenet  # noqa: F401
