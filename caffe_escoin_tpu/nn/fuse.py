"""Inference-time graph fusion: fold BN/Scale/ReLU/residual into convs.

The round-2 whole-net measurement showed the per-layer sparse-conv win
(2.3x) evaporating end-to-end (1.0x): Caffe-style nets run Conv ->
BatchNorm -> Scale -> ReLU as FOUR layers (the reference executes them as
four kernel launches too, `models/resnet/test_sconv.prototxt`), so the conv
epilogue never fuses, every activation makes three extra HBM round trips,
and the "other" bucket dwarfs conv. The reference's conv bucket dominated
its e2e because cuDNN-era BN was cheap relative to its convs; on TPU the
convs are fast enough that the elementwise passes dominate instead.

This pass rewrites the graph for inference (the analogue of the
weight-folding every production deployment of a Caffe model performs, and
of what `Net::CopyTrainedLayersFrom` + WeightAlign would be extended to do):

* **Affine fold**: Conv -> [BatchNorm] -> [Scale] -> [ReLU] chains collapse
  into one conv whose weights/bias absorb the affine (w' = w * a,
  b' = b * a + c with a = gamma/sqrt(var+eps), c = beta - mean*a) and whose
  epilogue applies the ReLU (`fuse_relu`, the reference's
  ConvolutionReLULayer / `sconv_relu_*` kernels). Zero weights stay zero, so
  the sparsity pattern — and the aligned BSC structure — is unchanged.
* **Residual fold**: Eltwise(sum)(shortcut, conv_out) -> ReLU collapses into
  the producing conv (`fuse_add`): the conv takes the shortcut as a second
  bottom and adds it inside the sparse epilogue (per block-column, in f32,
  before the bf16 cast), removing a separate whole-feature-map read+write
  pass per bottleneck block.
* **FC ReLU fold**: InnerProduct -> ReLU sets `fuse_relu` on the fc (the
  XBSP SpMM epilogue applies it per block-column).

Folding uses the net's BatchNorm moving statistics (the state collection;
`batchnorm_state` from tools/caffemodel.py for imported models), so it is
an inference-only transform — phase "test" / use_global_stats BN only.

Run BEFORE weight_align: the fold needs dense `w` arrays. Typical flow::

    net = Net(specs, policy=pol, phase="test")
    params = net.init(rng, shapes)            # or imported weights
    fnet, fparams = fuse_inference(net, params, state=net.state0)
    fwd = fnet.inference_fn(fnet.weight_align(fparams))
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from caffe_escoin_tpu.nn.net import LayerSpec, Net

CONV_TYPES = ("Convolution", "ConvolutionReLU", "EscConvolution")
FOLDABLE_TYPES = CONV_TYPES + ("InnerProduct",)


def _moving_stats(st: Optional[Dict[str, Any]], cout: int,
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Decayed-sum blobs -> (mean, var), matching BatchNormLayer._moving
    (count==0 -> (0, 1), the reference's scale_factor=0 case)."""
    if st is None:
        return np.zeros(cout, np.float32), np.ones(cout, np.float32)
    mean_acc = np.asarray(jax.device_get(st["mean_acc"]), np.float32)
    var_acc = np.asarray(jax.device_get(st["var_acc"]), np.float32)
    count = float(jax.device_get(st["count"]))
    if count > 0:
        return mean_acc / count, var_acc / count
    return np.zeros_like(mean_acc), np.ones_like(var_acc)


def _final_tops(specs) -> set:
    consumed = {b for s in specs for b in s.bottoms}
    return {t for s in specs for t in s.tops if t not in consumed}


def fuse_inference(net: Net, params: Dict[str, Any],
                   state: Optional[Dict[str, Any]] = None,
                   *, fuse_residual: bool = True,
                   ) -> Tuple[Net, Dict[str, Any]]:
    """Returns (fused_net, fused_params). ``state`` supplies BN moving
    stats (defaults to ``net.state0`` when the net was init()-ed)."""
    if state is None:
        state = getattr(net, "state0", {})
    specs = list(net.specs)
    new_params: Dict[str, Any] = dict(params)
    finals = _final_tops(specs)

    # ---------------- pass A: affine/ReLU folding ----------------------
    consumers: Dict[str, list] = {}
    for i, s in enumerate(specs):
        for b in s.bottoms:
            consumers.setdefault(b, []).append(i)
    removed: set = set()
    replaced: Dict[int, LayerSpec] = {}

    for i, s in enumerate(specs):
        if s.type not in FOLDABLE_TYPES or i in removed:
            continue
        p = new_params.get(s.name)
        if not isinstance(p, dict) or "w" not in p:
            continue  # already aligned / shared params: leave alone
        if s.share_params is not None:
            continue  # folding would desync the shared owner
        w = np.asarray(jax.device_get(p["w"]))
        cout = w.shape[-1]
        a = np.ones(cout, np.float32)
        c = np.zeros(cout, np.float32)
        affine = False
        fuse_relu = bool(s.type == "ConvolutionReLU"
                         or s.params.get("fuse_relu"))
        top = s.tops[0]
        chain = []
        while True:
            cons = consumers.get(top, [])
            if len(cons) != 1 or top in finals:
                break
            j = cons[0]
            nxt = specs[j]
            if j in removed or fuse_relu:
                break
            if nxt.type == "BatchNorm":
                use_global = nxt.params.get("use_global_stats")
                if use_global is None:
                    use_global = net.phase == "test"
                if not use_global:
                    break
                eps = nxt.params.get("eps", 1e-5)
                mean, var = _moving_stats(state.get(nxt.name), cout)
                inv = 1.0 / np.sqrt(var + eps)
                a = a * inv
                c = (c - mean) * inv
                affine = True
            elif nxt.type == "Scale":
                sp = new_params.get(nxt.name, {})
                gamma = np.asarray(jax.device_get(sp["gamma"]), np.float32) \
                    if "gamma" in sp else np.ones(cout, np.float32)
                a = a * gamma
                c = c * gamma
                if "beta" in sp:
                    c = c + np.asarray(jax.device_get(sp["beta"]), np.float32)
                affine = True
                new_params.pop(nxt.name, None)
            elif (nxt.type == "ReLU"
                  and nxt.params.get("negative_slope", 0.0) == 0.0):
                fuse_relu = True
            else:
                break
            chain.append(j)
            top = nxt.tops[0]
            if fuse_relu:
                break
        if not chain:
            continue
        q = dict(p)
        if affine:
            q["w"] = np.asarray(jax.device_get(p["w"]), np.float32) * a
            b0 = (np.asarray(jax.device_get(p["b"]), np.float32)
                  if "b" in p else 0.0)
            q["b"] = b0 * a + c
        new_params[s.name] = q
        sp_params = dict(s.params)
        if affine:
            sp_params["bias_term"] = True
        if fuse_relu:
            sp_params["fuse_relu"] = True
        replaced[i] = dataclasses.replace(s, tops=(top,), params=sp_params)
        removed.update(chain)

    specs = [replaced.get(i, s) for i, s in enumerate(specs)
             if i not in removed]

    # ---------------- pass B: residual (Eltwise-sum + ReLU) folding ----
    if fuse_residual:
        producer: Dict[str, int] = {}
        consumers = {}
        for i, s in enumerate(specs):
            for b in s.bottoms:
                consumers.setdefault(b, []).append(i)
            for t in s.tops:
                producer[t] = i
        removed = set()
        replaced = {}
        for i, s in enumerate(specs):
            if (s.type != "Eltwise" or i in removed
                    or s.params.get("operation", "sum") != "sum"
                    or len(s.bottoms) != 2):
                continue
            coeffs = s.params.get("coeffs")
            if coeffs is not None and any(cf != 1.0 for cf in coeffs):
                continue
            # pick the LATER conv producer among the two bottoms (the
            # residual branch tail, e.g. branch2c) whose top feeds only
            # this Eltwise; the other bottom becomes the fused add input
            best = None
            for pos, b in enumerate(s.bottoms):
                ci = producer.get(b)
                if ci is None or ci in removed or ci in replaced:
                    continue
                pc = specs[ci]
                if (pc.type not in CONV_TYPES or len(pc.bottoms) != 1
                        or pc.params.get("fuse_relu")
                        or pc.params.get("fuse_add")):
                    continue
                if consumers.get(b, []) != [i] or b in finals:
                    continue
                other = s.bottoms[1 - pos]
                oi = producer.get(other, -1)
                if oi >= ci:
                    continue  # shortcut must exist before the conv runs
                if best is None or ci > best[0]:
                    best = (ci, other)
            if best is None:
                continue
            ci, other = best
            pc = specs[ci]
            # optional trailing ReLU
            top = s.tops[0]
            relu = False
            cons = consumers.get(top, [])
            if len(cons) == 1 and top not in finals:
                nxt = specs[cons[0]]
                if (nxt.type == "ReLU"
                        and nxt.params.get("negative_slope", 0.0) == 0.0):
                    relu = True
                    removed.add(cons[0])
                    top = nxt.tops[0]
            sp_params = dict(pc.params)
            sp_params["fuse_add"] = True
            if relu:
                sp_params["fuse_relu"] = True
            replaced[ci] = dataclasses.replace(
                pc, bottoms=(pc.bottoms[0], other), tops=(top,),
                params=sp_params)
            removed.add(i)
        specs = [replaced.get(i, s) for i, s in enumerate(specs)
                 if i not in removed]

    fused = Net(specs, policy=net.policy, phase=net.phase)
    # carry surviving layers' state through (BN layers that didn't fold)
    fused.state0 = {k: v for k, v in state.items()
                    if any(l.spec.name == k for l in fused.layers)}
    if hasattr(net, "blob_shapes"):
        fused.blob_shapes = dict(net.blob_shapes)
    return fused, new_params
