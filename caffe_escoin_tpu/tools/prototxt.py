"""NetParameter / SolverParameter prototxt ingestion.

The reference's entire config language is protobuf TEXT format
(`src/caffe/proto/caffe.proto`; loaded by
`ReadNetParamsFromTextFileOrDie` + the legacy migrations of
`src/caffe/util/upgrade_proto.cpp`). This module parses that text format
with a hand-rolled tokenizer (no protobuf runtime, same policy as
tools/caffemodel.py) and converts it into this framework's LayerSpecs /
SolverConfig — so a reference user can load the exact prototxts shipped in
`/root/reference/models/` (ResNet-50 `test_sconv.prototxt`, the
AlexNet/GoogLeNet deploys, the VGG train_vals, ...).

Layout and convention conversions applied:

* NCHW shape declarations -> NHWC (input dims, Reshape shapes).
* channel-axis params (Concat/Softmax/Slice axis 1) -> -1 (trailing
  channel).
* in-place tops (Caffe's `bottom: "conv1" top: "conv1"` chains) are
  SSA-renamed — this framework's Net is functional and the fusion pass
  (nn/fuse.py) needs unique blob names for its producer/consumer analysis.
* `type: "EscConvolution"` (the reference's pinned-algo dense baseline,
  `esc_conv_layer.cu:27`) maps to the registered EscConvolutionLayer,
  which pins LOWERED_GEMM here — the same per-layer swap semantics as
  `models/resnet/test_sconv.prototxt:53`.
* Data/ImageData/WindowData layers (LMDB-backed, unavailable offline) are
  synthesized into Input declarations from batch_size + crop_size
  (``synthesize_data=True``); pass False to keep them as framework data
  layers.
* V1 `layers {}` blocks with enum types (upgrade_proto.cpp's
  UpgradeV1Net) are accepted via the enum-name table.

`param { lr_mult decay_mult name }` entries are preserved on
``spec.params["param_specs"]`` (consumed by the solver's per-param
multipliers) and same-name param sharing maps to LayerSpec.share_params.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

from caffe_escoin_tpu.nn.net import LayerSpec

# ------------------------------------------------------------------
# protobuf text-format parser
# ------------------------------------------------------------------

_TOKEN = re.compile(r"""
    \s+ | \#[^\n]* |                      # whitespace / comments
    (?P<str>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*') |
    (?P<num>[-+]?(?:\.\d+|\d+\.?\d*)(?:[eE][-+]?\d+)?) |
    (?P<ident>[A-Za-z_][A-Za-z0-9_]*) |
    (?P<punct>[{}:;,])
""", re.VERBOSE)


def _tokenize(text: str):
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN.match(text, pos)
        if m is None:
            raise ValueError(f"prototxt: bad token at {text[pos:pos+30]!r}")
        pos = m.end()
        for kind in ("str", "num", "ident", "punct"):
            v = m.group(kind)
            if v is not None:
                yield kind, v
                break


class _Parser:
    def __init__(self, text: str):
        self.toks = list(_tokenize(text))
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def message(self, *, top=False) -> Dict[str, List[Any]]:
        """Parse fields until '}' (or EOF at top level). Repeated fields
        accumulate in lists."""
        out: Dict[str, List[Any]] = {}
        while True:
            kind, v = self.peek()
            if kind is None:
                if not top:
                    raise ValueError("prototxt: unexpected EOF")
                return out
            if kind == "punct" and v == "}":
                self.next()
                return out
            if kind != "ident":
                raise ValueError(f"prototxt: expected field name, got {v!r}")
            self.next()
            key = v
            kind, v = self.peek()
            if kind == "punct" and v == ":":
                self.next()
                kind, v = self.peek()
                if kind == "punct" and v == "{":  # `key: { ... }`
                    self.next()
                    val = self.message()
                else:
                    val = self._scalar()
            elif kind == "punct" and v == "{":
                self.next()
                val = self.message()
            else:
                raise ValueError(f"prototxt: expected ':' or '{{' after "
                                 f"{key!r}, got {v!r}")
            out.setdefault(key, []).append(val)
            kind, v = self.peek()
            if kind == "punct" and v in (";", ","):
                self.next()

    def _scalar(self):
        kind, v = self.next()
        if kind == "str":
            body = v[1:-1]
            return body.encode().decode("unicode_escape")
        if kind == "num":
            f = float(v)
            if f.is_integer() and ("." not in v and "e" not in v.lower()):
                return int(v)
            return f
        if kind == "ident":
            if v == "true":
                return True
            if v == "false":
                return False
            return v  # enum identifier
        raise ValueError(f"prototxt: bad scalar {v!r}")


def parse_text(text: str) -> Dict[str, List[Any]]:
    """Generic protobuf text-format -> nested dict of repeated fields."""
    return _Parser(text).message(top=True)


# ------------------------------------------------------------------
# NetParameter -> LayerSpec conversion
# ------------------------------------------------------------------

def _one(msg, key, default=None):
    v = msg.get(key)
    return v[0] if v else default


def _spatial(msg, key, h_key, w_key, default):
    """Caffe repeated spatial field (+_h/_w variants) -> int or (h, w)."""
    if h_key in msg or w_key in msg:
        return (_one(msg, h_key, default), _one(msg, w_key, default))
    vals = msg.get(key)
    if not vals:
        return default
    if len(vals) == 1:
        return vals[0]
    return tuple(vals)


def _filler(msg, key):
    f = _one(msg, key)
    if f is None:
        return None
    out = {"type": _one(f, "type", "constant")}
    for k in ("value", "std", "mean", "min", "max"):
        if k in f:
            out[k] = _one(f, k)
    return out


def _phase_of(msg) -> Optional[str]:
    for inc in msg.get("include", []):
        ph = _one(inc, "phase")
        if ph:
            return str(ph).lower()
    for exc in msg.get("exclude", []):
        ph = _one(exc, "phase")
        if ph:
            return "test" if str(ph).lower() == "train" else "train"
    return None


# V1LayerParameter.LayerType enum NAMES (text format spells enums by name;
# numeric table lives in tools/caffemodel.py for the wire format)
V1_TYPE_NAMES = {
    "ACCURACY": "Accuracy", "BNLL": "BNLL", "CONCAT": "Concat",
    "CONVOLUTION": "Convolution", "DATA": "Data", "DROPOUT": "Dropout",
    "EUCLIDEAN_LOSS": "EuclideanLoss", "FLATTEN": "Flatten",
    "HDF5_DATA": "HDF5Data", "HDF5_OUTPUT": "HDF5Output",
    "IM2COL": "Im2col", "IMAGE_DATA": "ImageData",
    "INFOGAIN_LOSS": "InfogainLoss", "INNER_PRODUCT": "InnerProduct",
    "LRN": "LRN", "MULTINOMIAL_LOGISTIC_LOSS": "MultinomialLogisticLoss",
    "POOLING": "Pooling", "RELU": "ReLU", "SIGMOID": "Sigmoid",
    "SOFTMAX": "Softmax", "SOFTMAX_LOSS": "SoftmaxWithLoss",
    "SPLIT": "Split", "TANH": "TanH", "WINDOW_DATA": "WindowData",
    "ELTWISE": "Eltwise", "POWER": "Power",
    "SIGMOID_CROSS_ENTROPY_LOSS": "SigmoidCrossEntropyLoss",
    "HINGE_LOSS": "HingeLoss", "MEMORY_DATA": "MemoryData",
    "ARGMAX": "ArgMax", "THRESHOLD": "Threshold",
    "DUMMY_DATA": "DummyData", "SLICE": "Slice", "MVN": "MVN",
    "ABSVAL": "AbsVal", "SILENCE": "Silence",
    "CONTRASTIVE_LOSS": "ContrastiveLoss", "EXP": "Exp",
    "DECONVOLUTION": "Deconvolution",
}

_DATA_TYPES = ("Data", "ImageData", "WindowData")


def _channel_axis(ax: int, default_ok=True) -> int:
    """Caffe canonical (N,C,...) axis -> this framework's trailing channel."""
    if ax == 1:
        return -1
    if ax == 0:
        return 0
    raise ValueError(f"prototxt: cannot map Caffe axis {ax} to NHWC")


def _layer_params(type_: str, msg) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    if type_ in ("Convolution", "ConvolutionReLU", "EscConvolution",
                 "Deconvolution"):
        cp = _one(msg, "convolution_param", {})
        p["num_output"] = _one(cp, "num_output")
        p["kernel"] = _spatial(cp, "kernel_size", "kernel_h", "kernel_w", 3)
        p["stride"] = _spatial(cp, "stride", "stride_h", "stride_w", 1)
        p["pad"] = _spatial(cp, "pad", "pad_h", "pad_w", 0)
        dil = _spatial(cp, "dilation", None, None, 1)
        if dil != 1:
            p["dilation"] = dil
        g = _one(cp, "group", 1)
        if g != 1:
            p["group"] = g
        p["bias_term"] = _one(cp, "bias_term", True)
        for fk, pk in (("weight_filler", "weight_filler"),
                       ("bias_filler", "bias_filler")):
            f = _filler(cp, fk)
            if f:
                p[pk] = f
    elif type_ == "InnerProduct":
        ip = _one(msg, "inner_product_param", {})
        p["num_output"] = _one(ip, "num_output")
        p["bias_term"] = _one(ip, "bias_term", True)
        f = _filler(ip, "weight_filler")
        if f:
            p["weight_filler"] = f
        f = _filler(ip, "bias_filler")
        if f:
            p["bias_filler"] = f
    elif type_ == "Pooling":
        pp = _one(msg, "pooling_param", {})
        pool = str(_one(pp, "pool", "MAX")).upper()
        p["mode"] = {"MAX": "max", "AVE": "avg",
                     "STOCHASTIC": "stochastic"}[pool]
        if _one(pp, "global_pooling", False):
            p["global_pooling"] = True
        else:
            p["kernel"] = _spatial(pp, "kernel_size", "kernel_h",
                                   "kernel_w", 2)
            p["stride"] = _spatial(pp, "stride", "stride_h", "stride_w", 1)
            pad = _spatial(pp, "pad", "pad_h", "pad_w", 0)
            if pad != 0:
                p["pad"] = pad
    elif type_ == "ReLU":
        rp = _one(msg, "relu_param", {})
        ns = _one(rp, "negative_slope", 0.0)
        if ns:
            p["negative_slope"] = ns
    elif type_ == "LRN":
        lp = _one(msg, "lrn_param", {})
        p["local_size"] = _one(lp, "local_size", 5)
        p["alpha"] = _one(lp, "alpha", 1e-4)
        p["beta"] = _one(lp, "beta", 0.75)
        if "k" in lp:
            p["k"] = _one(lp, "k")
    elif type_ == "Dropout":
        dp = _one(msg, "dropout_param", {})
        p["ratio"] = _one(dp, "dropout_ratio", 0.5)
    elif type_ == "Softmax":
        sp = _one(msg, "softmax_param", {})
        p["axis"] = _channel_axis(_one(sp, "axis", 1))
    elif type_ == "Accuracy":
        ap = _one(msg, "accuracy_param", {})
        tk = _one(ap, "top_k", 1)
        if tk != 1:
            p["top_k"] = tk
    elif type_ == "Concat":
        cp = _one(msg, "concat_param", {})
        ax = _one(cp, "axis", _one(cp, "concat_dim", 1))
        p["axis"] = _channel_axis(ax)
    elif type_ == "Slice":
        sp = _one(msg, "slice_param", {})
        p["axis"] = _channel_axis(_one(sp, "axis", 1))
        p["slice_points"] = tuple(sp.get("slice_point", []))
    elif type_ == "Eltwise":
        ep = _one(msg, "eltwise_param", {})
        p["operation"] = str(_one(ep, "operation", "SUM")).lower()
        if "coeff" in ep:
            p["coeffs"] = tuple(ep["coeff"])
    elif type_ == "BatchNorm":
        bp = _one(msg, "batch_norm_param", {})
        if "use_global_stats" in bp:
            p["use_global_stats"] = _one(bp, "use_global_stats")
        if "eps" in bp:
            p["eps"] = _one(bp, "eps")
        if "moving_average_fraction" in bp:
            p["moving_average_fraction"] = _one(bp,
                                                "moving_average_fraction")
    elif type_ == "Scale":
        sp = _one(msg, "scale_param", {})
        # ScaleParameter.bias_term defaults to FALSE in caffe.proto (the
        # framework ScaleLayer defaults True) — always set explicitly
        p["bias_term"] = _one(sp, "bias_term", False)
    elif type_ == "Power":
        pp = _one(msg, "power_param", {})
        p["power"] = _one(pp, "power", 1.0)
        p["scale"] = _one(pp, "scale", 1.0)
        p["shift"] = _one(pp, "shift", 0.0)
    elif type_ == "Flatten":
        fp = _one(msg, "flatten_param", {})
        p["axis"] = _one(fp, "axis", 1)
    elif type_ == "Python":
        # PythonParameter (`caffe.proto` python_param): the user's layer
        # class, resolved at Net build time by nn.layers.PythonLayer
        pp = _one(msg, "python_param", {})
        p["module"] = str(_one(pp, "module", ""))
        p["layer"] = str(_one(pp, "layer", ""))
        ps = _one(pp, "param_str", "")
        if ps:
            p["param_str"] = str(ps)
    elif type_ == "Reshape":
        rp = _one(msg, "reshape_param", {})
        shape = _one(rp, "shape", {})
        dims = list(shape.get("dim", []))
        if len(dims) == 4:  # NCHW -> NHWC
            dims = [dims[0], dims[2], dims[3], dims[1]]
        p["shape"] = tuple(dims)
    return p


def net_from_prototxt(
    text: str,
    *,
    phase: str = "test",
    batch: Optional[int] = None,
    synthesize_data: bool = True,
    default_image_channels: int = 3,
) -> Tuple[List[LayerSpec], Dict[str, Tuple[int, ...]], str]:
    """Parse a NetParameter prototxt.

    Returns (specs, input_shapes, net_name): the LayerSpecs for the
    requested phase (de-aliased, NHWC), the declared/synthesized input
    blob shapes, and the net's name. ``batch`` overrides the declared
    batch size.
    """
    net = parse_text(text)
    name = _one(net, "name", "net")
    input_shapes: Dict[str, Tuple[int, ...]] = {}

    def nchw_to_nhwc(dims):
        dims = [int(d) for d in dims]
        if len(dims) == 4:
            dims = [dims[0], dims[2], dims[3], dims[1]]
        if batch is not None and dims:
            dims[0] = batch
        return tuple(dims)

    # top-level legacy input declarations (deploy.prototxt V1 style)
    tl_inputs = [str(v) for v in net.get("input", [])]
    if tl_inputs:
        if "input_shape" in net:
            for blob, shp in zip(tl_inputs, net["input_shape"]):
                input_shapes[blob] = nchw_to_nhwc(shp.get("dim", []))
        elif "input_dim" in net:
            dims = net["input_dim"]
            for i, blob in enumerate(tl_inputs):
                input_shapes[blob] = nchw_to_nhwc(dims[i * 4:(i + 1) * 4])

    raw_layers = []
    for msg in net.get("layer", []):
        raw_layers.append((str(_one(msg, "type", "?")), msg))
    for msg in net.get("layers", []):  # V1 (upgrade_proto.cpp role)
        t = _one(msg, "type", "?")
        raw_layers.append((V1_TYPE_NAMES.get(str(t), str(t)), msg))

    # phase filter first (TRAIN/TEST twins share blob names)
    kept = [(t, m) for t, m in raw_layers
            if _phase_of(m) in (None, phase)]

    specs: List[LayerSpec] = []
    alias: Dict[str, str] = {}  # blob name -> current SSA name
    param_owner: Dict[str, str] = {}  # shared param name -> owner layer
    for type_, msg in kept:
        lname = str(_one(msg, "name", f"layer{len(specs)}"))
        bottoms = [alias.get(str(b), str(b)) for b in msg.get("bottom", [])]
        tops_raw = [str(t) for t in msg.get("top", [])] or [lname]

        if type_ == "Input":
            ip = _one(msg, "input_param", {})
            for blob, shp in zip(tops_raw, ip.get("shape", [])):
                input_shapes[blob] = nchw_to_nhwc(shp.get("dim", []))
            for t in tops_raw:
                alias[t] = t
            continue
        if synthesize_data and type_ in _DATA_TYPES:
            dp = (_one(msg, "data_param", {}) or
                  _one(msg, "image_data_param", {}))
            tp = _one(msg, "transform_param", {})
            bsz = batch or _one(dp, "batch_size", 1)
            crop = _one(tp, "crop_size", 224)
            shapes = [(bsz, crop, crop, default_image_channels), (bsz,)]
            for blob, shp in zip(tops_raw, shapes):
                input_shapes[blob] = shp
                alias[blob] = blob
            continue

        tops = []
        for t in tops_raw:
            if t in alias or t in bottoms:  # in-place / rewrite: SSA-rename
                new = f"{t}__{lname}"
                alias[t] = new
                tops.append(new)
            else:
                alias[t] = t
                tops.append(t)

        p = _layer_params(type_, msg)
        # ParamSpec entries: lr_mult/decay_mult multipliers + name sharing
        share = None
        pspecs = []
        for pr in msg.get("param", []):
            if isinstance(pr, str):  # V1 `param: "name"` sharing
                pr = {"name": [pr]}
            entry = {}
            for k in ("lr_mult", "decay_mult", "name"):
                if k in pr:
                    entry[k] = _one(pr, k)
            pspecs.append(entry)
            pn = entry.get("name")
            if pn:
                if pn in param_owner:
                    share = param_owner[pn]
                else:
                    param_owner[pn] = lname
        if pspecs:
            p["param_specs"] = pspecs

        specs.append(LayerSpec(
            lname, type_, tuple(bottoms), tops=tuple(tops), params=p,
            phase=_phase_of(msg),
            loss_weight=float(_one(msg, "loss_weight", 0.0)),
            share_params=share,
        ))
    return specs, input_shapes, name


def load_net(path: str, **kw):
    with open(path) as fh:
        return net_from_prototxt(fh.read(), **kw)


# ------------------------------------------------------------------
# SolverParameter -> SolverConfig (+ run settings)
# ------------------------------------------------------------------

# SolverParameter.SolverType enum / `type` string -> framework solver_type
_SOLVER_TYPES = {
    "SGD": "sgd", "NESTEROV": "nesterov", "ADAGRAD": "adagrad",
    "RMSPROP": "rmsprop", "ADADELTA": "adadelta", "ADAM": "adam",
}


def solver_from_prototxt(text: str):
    """Parse a solver prototxt -> (SolverConfig, run dict).

    The run dict carries the fields outside SolverConfig's scope:
    net path, test_iter/test_interval, display, snapshot prefix/cadence
    (consumed by engine.solver.Solver / tools.cli train)."""
    from caffe_escoin_tpu.engine.solvers import SolverConfig

    msg = parse_text(text)
    t = str(_one(msg, "type", _one(msg, "solver_type", "SGD")))
    cfg = SolverConfig(
        solver_type=_SOLVER_TYPES.get(t.upper(), t.lower()),
        base_lr=_one(msg, "base_lr", 0.01),
        momentum=_one(msg, "momentum", 0.9),
        weight_decay=_one(msg, "weight_decay", 0.0),
        regularization_type=str(_one(msg, "regularization_type", "L2")),
        delta=_one(msg, "delta", 1e-8),
        rms_decay=_one(msg, "rms_decay", 0.99),
        adam_beta1=_one(msg, "momentum", 0.9),
        adam_beta2=_one(msg, "momentum2", 0.999),
        clip_gradients=_one(msg, "clip_gradients", -1.0),
        iter_size=_one(msg, "iter_size", 1),
        lr_policy=str(_one(msg, "lr_policy", "fixed")),
        gamma=_one(msg, "gamma", 0.1),
        step_size=_one(msg, "stepsize", 100000),
        stepvalues=tuple(msg.get("stepvalue", [])),
        power=_one(msg, "power", 1.0),
        max_iter=_one(msg, "max_iter", 100000),
    )
    run = {
        "net": _one(msg, "net"),
        "train_net": _one(msg, "train_net"),
        "test_net": _one(msg, "test_net"),
        "test_iter": _one(msg, "test_iter", 0),
        "test_interval": _one(msg, "test_interval", 0),
        "display": _one(msg, "display", 0),
        "snapshot": _one(msg, "snapshot", 0),
        "snapshot_prefix": _one(msg, "snapshot_prefix", ""),
        "random_seed": _one(msg, "random_seed"),
    }
    return cfg, run


def load_solver(path: str):
    with open(path) as fh:
        return solver_from_prototxt(fh.read())
