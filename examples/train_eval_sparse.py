"""End-to-end real-data experiment: train → prune → fine-tune → sparse
inference accuracy parity (BASELINE configs 1-2; the analogue of the
reference's `run.sh:3-20`, which scored pruned SkimCaffe models against
their dense runs).

Dataset: scikit-learn's bundled handwritten-digits set (1,797 real 8x8
images, 10 classes) — the only real image dataset available offline in this
environment (no network egress; the reference's get_mnist.sh/get_cifar10.sh
download). Images are nearest-neighbor upscaled to the model's input size.
The pipeline is the framework's own end to end: `.cerec` database →
prefetching Data source → jitted Solver (BatchNorm state channel for the bn
model) → magnitude pruning (block AND unstructured) → masked fine-tuning →
`weight_align` → sparse `inference_fn` scoring.

Usage:
    python examples/train_eval_sparse.py --model lenet --iters 600
    python examples/train_eval_sparse.py --model cifar10_bn --iters 800

Writes a markdown results table to --report (default stdout) and a JSON
blob next to it.
"""

import argparse
import json
import os
import sys

import numpy as np

# runnable from anywhere: the package lives at the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def load_digits_upscaled(size, channels):
    from sklearn.datasets import load_digits

    d = load_digits()
    imgs = d.images.astype(np.float32) / 16.0  # [1797, 8, 8] in [0,1]
    reps = size // 8
    imgs = np.kron(imgs, np.ones((1, reps, reps), np.float32))
    pad = size - imgs.shape[1]
    if pad:
        imgs = np.pad(imgs, ((0, 0), (pad // 2, pad - pad // 2),
                             (pad // 2, pad - pad // 2)))
    imgs = imgs[..., None]
    if channels > 1:
        imgs = np.repeat(imgs, channels, axis=-1)
    labels = d.target.astype(np.int32)
    rng = np.random.default_rng(0)
    order = rng.permutation(len(imgs))
    imgs, labels = imgs[order], labels[order]
    n_test = 256
    return (imgs[n_test:], labels[n_test:]), (imgs[:n_test], labels[:n_test])


def evaluate(net, params, net_state, data, labels, batch=64):
    """Test-phase accuracy via the jitted inference path (weights may be
    aligned sparse — the scoring the reference's `caffe test` did)."""
    import jax
    import jax.numpy as jnp

    fwd = jax.jit(lambda p, ns, b: net.apply(p, b, state=ns, train=False,
                                             return_blobs=True))
    head = next((l.spec.bottoms[0] for l in net.layers
                 if l.spec.type in ("SoftmaxWithLoss", "Softmax",
                                    "Accuracy")), "ip1")
    correct = total = 0
    for i in range(0, len(data) - batch + 1, batch):
        blobs = fwd(params, net_state,
                    {"data": jnp.asarray(data[i:i + batch]),
                     "label": jnp.asarray(labels[i:i + batch])})
        logits = np.asarray(blobs[head])
        correct += (logits.argmax(-1) == labels[i:i + batch]).sum()
        total += batch
    return correct / max(1, total)


def prune_params(net, params, sparsity, block):
    """Magnitude-prune conv + fc weights (block=None → unstructured).
    Returns (params, pruned_layer_names)."""
    import jax.numpy as jnp

    from caffe_escoin_tpu.utils.pruning import (prune_blocks,
                                                prune_conv_weight,
                                                prune_magnitude)

    out = dict(params)
    pruned_names = []
    for layer in net.layers:
        n = layer.spec.name
        if n not in out or not isinstance(out[n], dict) or "w" not in out[n]:
            continue
        w = np.asarray(out[n]["w"])
        t = layer.spec.type
        q = dict(out[n])
        if t in ("Convolution", "ConvolutionReLU") and w.ndim == 4:
            if w.shape[2] < 16:
                continue  # input conv (1/3-channel): dense in the
                # reference's pruned models too (its conv1 stayed dense)
            q["w"] = jnp.asarray(prune_conv_weight(w, sparsity, block))
        elif t == "InnerProduct":
            if w.shape[1] < 32:
                continue  # classifier head: never pruned (standard practice;
                # the reference's pruned models kept fc8/classifier dense)
            q["w"] = jnp.asarray(
                prune_magnitude(w, sparsity) if block is None
                else prune_blocks(w, sparsity, block))
        else:
            continue
        out[n] = q
        pruned_names.append(n)
    return out, pruned_names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="lenet",
                    choices=["lenet", "cifar10_quick", "cifar10_bn",
                             "alexnet"])
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--finetune_iters", type=int, default=300)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--base_lr", type=float, default=0.05)
    ap.add_argument("--sparsities", default="0.7,0.9")
    ap.add_argument("--block", default="8,8",
                    help="block shape for structured pruning (bm,bk)")
    ap.add_argument("--filler", default="",
                    help="override every weight_filler type (e.g. xavier):"
                         " AlexNet's 1989 gaussian-0.01 recipe plateaus at"
                         " chance on small datasets; the experiment's"
                         " subject is the pruning pipeline, not the init")
    ap.add_argument("--modes", default="oneshot,deploy,gradual",
                    help="comma set of experiment legs: oneshot (prune + "
                         "masked fine-tune), deploy (unstructured-"
                         "checkpoint pipeline), gradual (AGP in-training "
                         "block pruning — the r5 route to ACCURATE block-"
                         "sparse models; one-shot block pruning collapses "
                         "at AlexNet scale, docs/EXPERIMENTS_alexnet.md)")
    ap.add_argument("--gradual_iters", type=int, default=0,
                    help="AGP ramp window (0 = same as --iters); the ramp "
                         "is followed by --finetune_iters frozen-mask "
                         "iterations")
    ap.add_argument("--report", default="")
    ap.add_argument("--workdir", default="/tmp/cescoin_experiment")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform (default cpu: training these small "
                         "models is host-friendly and leaves the TPU free "
                         "for benches; pass tpu to use the chip)")
    args = ap.parse_args()

    import jax
    if args.platform:
        from caffe_escoin_tpu.utils.benchmark import force_platform

        force_platform(args.platform)
    import jax.numpy as jnp

    from caffe_escoin_tpu.data.datasets import cerec_source, write_cerec
    from caffe_escoin_tpu.engine.context import ConvMode, ExecutionPolicy
    from caffe_escoin_tpu.engine.solver import Solver
    from caffe_escoin_tpu.engine.solvers import SolverConfig
    from caffe_escoin_tpu.models import ZOO
    from caffe_escoin_tpu.nn import Net
    from caffe_escoin_tpu.utils.pruning import masks_of, sparsity_of

    os.makedirs(args.workdir, exist_ok=True)
    builder_raw, input_shapes = ZOO[args.model]

    def builder(**kw):
        try:
            specs = builder_raw(num_classes=10, **kw)
        except TypeError:
            specs = builder_raw(**kw)
        if args.filler:
            import dataclasses

            out = []
            for sp in specs:
                if "weight_filler" in sp.params:
                    q = dict(sp.params)
                    q["weight_filler"] = {"type": args.filler}
                    sp = dataclasses.replace(sp, params=q)
                out.append(sp)
            specs = out
        return specs
    size = input_shapes["data"][1]
    channels = input_shapes["data"][3]
    (trd, trl), (ted, tel) = load_digits_upscaled(size, channels)
    log(f"digits: train {len(trd)}, test {len(ted)}, input "
        f"{size}x{size}x{channels}")

    # exercise the .cerec database + cursor path for the training stream
    train_db = os.path.join(args.workdir, "train.cerec")
    write_cerec(train_db, trd, trl.astype(np.float32))
    src = cerec_source(train_db, args.batch)

    def train_iter():
        while True:
            b = src()
            yield {"data": jnp.asarray(b["data"]),
                   "label": jnp.asarray(b["label"])}

    block = tuple(int(v) for v in args.block.split(","))
    sparsities = [float(s) for s in args.sparsities.split(",")]

    net = Net(builder(include_loss=True), phase="train")
    test_net = Net(builder(include_loss=True), phase="test")
    cfg = SolverConfig(base_lr=args.base_lr, momentum=0.9,
                       weight_decay=5e-4, lr_policy="inv", gamma=1e-4,
                       power=0.75)
    solver = Solver(net, cfg, test_net=test_net,
                    snapshot_prefix=os.path.join(args.workdir, "snap"))
    solver.init({"data": (args.batch, size, size, channels),
                 "label": (args.batch,)})
    solver.step(train_iter(), args.iters, log=log)

    dense_acc = evaluate(test_net, solver.params, solver.net_state, ted, tel)
    log(f"dense test accuracy after {args.iters} iters: {dense_acc:.4f}")

    results = {"model": args.model, "dense_acc": round(float(dense_acc), 4),
               "train_iters": args.iters, "rows": []}

    base_params = solver.params
    base_state = solver.net_state
    base_solver_state = solver.state
    sp_policy = ExecutionPolicy(conv_mode=ConvMode.SCONV_PAR,
                                block_shape=block, sparse_threshold=0.4,
                                sconv_threshold=0.4)
    sparse_net = Net(builder(include_loss=True), policy=sp_policy,
                     phase="test")

    modes = set(args.modes.split(","))
    oneshot_grans = ((("unstructured", None), ("block", block))
                     if "oneshot" in modes else ())
    for gran, blk in oneshot_grans:
        for sp in sparsities:
            pruned, pruned_names = prune_params(net, base_params, sp, blk)
            acc_pruned = evaluate(test_net, pruned, base_state, ted, tel)
            # masked fine-tune
            solver.params = pruned
            solver.net_state = base_state
            solver.state = jax.tree_util.tree_map(
                jnp.zeros_like, base_solver_state)
            solver.set_param_masks(masks_of(pruned))
            solver.step(train_iter(), args.finetune_iters, log=lambda m: None)
            acc_ft = evaluate(test_net, solver.params, solver.net_state,
                              ted, tel)
            # sparse execution parity: weight_align + sparse path scoring
            aligned = sparse_net.weight_align(solver.params)
            acc_sparse = evaluate(sparse_net, aligned, solver.net_state,
                                  ted, tel)
            # sparsity over the layers actually targeted (nnz-weighted)
            tw = [np.asarray(solver.params[n]["w"]) for n in pruned_names]
            achieved = (sum(float((w == 0).sum()) for w in tw)
                        / max(1, sum(w.size for w in tw)))
            row = dict(granularity=gran, target_sparsity=sp,
                       achieved_sparsity=round(float(achieved), 4),
                       acc_pruned=round(float(acc_pruned), 4),
                       acc_finetuned=round(float(acc_ft), 4),
                       acc_sparse_exec=round(float(acc_sparse), 4),
                       sparse_exec_delta=round(
                           float(acc_sparse - acc_ft), 4))
            results["rows"].append(row)
            log(f"{gran} @ {sp:.0%}: pruned {acc_pruned:.4f} -> "
                f"finetuned {acc_ft:.4f} -> sparse-exec {acc_sparse:.4f}")

    # ---- GRADUAL (AGP) block pruning: sparsity ramped DURING training
    # from the dense checkpoint, masks recomputed from live weights every
    # schedule step, then frozen-mask fine-tuning. This is the leg the r4
    # experiment showed missing: one-shot block-90% collapses AlexNet to
    # chance (0.098) and masked fine-tuning cannot repair it; the cubic
    # ramp (utils/pruning.agp_sparsity) lets surviving blocks absorb the
    # pruned capacity step by step. Reference analogue: its in-training
    # L1 pruning pressure (`sgd_solver.cpp:144-206`) — consumed models
    # were pruned gradually by GESL/SkimCaffe externally.
    if "gradual" in modes:
        from caffe_escoin_tpu.utils.pruning import PruningSchedule

        def _sel(name, key, leaf):
            # the same layers prune_params targets: conv with cin >= 16
            # and fc weights
            if key != "w":
                return False
            shp = np.shape(leaf)
            if len(shp) == 4:
                return shp[2] >= 16
            return len(shp) == 2

        ramp = args.gradual_iters or args.iters
        stab = args.finetune_iters
        for sp in sparsities:
            solver.params = base_params
            solver.net_state = base_state
            solver.state = jax.tree_util.tree_map(
                jnp.zeros_like, base_solver_state)
            solver.set_param_masks(None)
            sched = PruningSchedule(
                final_sparsity=sp, start_iter=solver.iter,
                end_iter=solver.iter + ramp,
                freq=max(10, ramp // 25), granularity="block",
                block_shape=block)
            solver.set_pruning_schedule(sched, select=_sel)
            solver.step(train_iter(), ramp + stab, log=log)
            solver.set_pruning_schedule(None)
            acc_ft = evaluate(test_net, solver.params, solver.net_state,
                              ted, tel)
            aligned = sparse_net.weight_align(solver.params)
            acc_sparse = evaluate(sparse_net, aligned, solver.net_state,
                                  ted, tel)
            pruned_names = [l.spec.name for l in net.layers
                            if l.spec.name in solver.params
                            and isinstance(solver.params[l.spec.name], dict)
                            and "w" in solver.params[l.spec.name]
                            and _sel(l.spec.name, "w",
                                     solver.params[l.spec.name]["w"])]
            tw = [np.asarray(solver.params[n]["w"]) for n in pruned_names]
            achieved = (sum(float((w == 0).sum()) for w in tw)
                        / max(1, sum(w.size for w in tw)))
            row = dict(granularity="block_gradual", target_sparsity=sp,
                       achieved_sparsity=round(float(achieved), 4),
                       acc_pruned=None,
                       acc_finetuned=round(float(acc_ft), 4),
                       acc_sparse_exec=round(float(acc_sparse), 4),
                       sparse_exec_delta=round(
                           float(acc_sparse - acc_ft), 4),
                       ramp_iters=ramp, stabilize_iters=stab)
            results["rows"].append(row)
            log(f"block_gradual @ {sp:.0%} (ramp {ramp}+{stab}): "
                f"finetuned {acc_ft:.4f} -> sparse-exec {acc_sparse:.4f} "
                f"(achieved {achieved:.1%})")

    # ---- unstructured-checkpoint DEPLOYMENT pipeline (any model):
    # greedy channel permutations (producer cout propagated free into the
    # consumer's cin) concentrate each unstructured pattern into fewer
    # live blocks, densify zeroes the sub-threshold blocks, masked
    # fine-tuning recovers the loss, and the block-sparse executors score
    # the result. The accuracy delta + achieved live-block reduction IS
    # the cost of converting the reference's unstructured workload into
    # MXU-executable structure (docs/PERFORMANCE.md "Unstructured sparsity
    # on TPU").
    if "deploy" in modes:
        from caffe_escoin_tpu.sparse.permute import deploy_unstructured

        sp = max(sparsities)
        pruned, pruned_names = prune_params(net, base_params, sp, None)
        solver.params = pruned
        solver.net_state = base_state
        solver.state = jax.tree_util.tree_map(
            jnp.zeros_like, base_solver_state)
        solver.set_param_masks(masks_of(pruned))
        solver.step(train_iter(), args.finetune_iters, log=lambda m: None)
        # deployment block shape: the experiment's block for small nets,
        # the MXU-native 128x128 when the layers are big enough
        dep_block = block
        p, dep = deploy_unstructured(
            net, solver.params, block_shape=dep_block, min_density=0.05,
            layers=pruned_names, log=log)
        solver.params = p
        solver.set_param_masks(masks_of(p))
        solver.step(train_iter(), args.finetune_iters, log=lambda m: None)
        aligned = sparse_net.weight_align(solver.params)
        acc_dep = evaluate(sparse_net, aligned, solver.net_state, ted, tel)
        blocks_before = sum(r["blocks_before"] for r in dep["permuted"])
        blocks_after = sum(r["blocks_after"] for r in dep["permuted"])
        extra_zeroed = (float(np.mean([r["extra_zeroed_frac"]
                                       for r in dep["densified"]]))
                        if dep["densified"] else 0.0)
        bd = (float(np.mean([r["block_density"] for r in dep["densified"]]))
              if dep["densified"] else 1.0)
        results["unstructured_deployment"] = dict(
            sparsity=sp,
            blocks_before=blocks_before,
            blocks_after_permute=blocks_after,
            block_density_after_densify=round(bd, 4),
            extra_zeroed_frac=round(extra_zeroed, 4),
            acc_after_pipeline=round(float(acc_dep), 4),
            per_layer=dep)
        log(f"unstructured deployment @ {sp:.0%}: live blocks "
            f"{blocks_before} -> permute {blocks_after} -> densify bd="
            f"{bd:.2f} (+{extra_zeroed:.1%} zeroed), acc {acc_dep:.4f}")

    md = [f"## {args.model} on digits (dense acc {dense_acc:.4f}, "
          f"{args.iters} iters)",
          "",
          "| granularity | target sparsity | acc pruned | acc fine-tuned | "
          "acc sparse-exec | sparse-exec delta |",
          "|---|---|---|---|---|---|"]
    for r in results["rows"]:
        ap_ = ("n/a (in-training)" if r.get("acc_pruned") is None
               else f"{r['acc_pruned']:.4f}")
        md.append(f"| {r['granularity']} | {r['target_sparsity']:.0%} "
                  f"(got {r['achieved_sparsity']:.1%}) | "
                  f"{ap_} | {r['acc_finetuned']:.4f} | "
                  f"{r['acc_sparse_exec']:.4f} | "
                  f"{r['sparse_exec_delta']:+.4f} |")
    if "unstructured_deployment" in results:
        d = results["unstructured_deployment"]
        md += ["",
               f"Unstructured-checkpoint deployment @ "
               f"{d['sparsity']:.0%} (permute → densify → masked "
               f"fine-tune → block exec): ip1 live blocks "
               f"{d['blocks_before']} → {d['blocks_after_permute']}, "
               f"densified block density "
               f"{d['block_density_after_densify']:.2f} "
               f"(+{d['extra_zeroed_frac']:.1%} weights zeroed), final "
               f"accuracy {d['acc_after_pipeline']:.4f}."]
    report = "\n".join(md)
    if args.report:
        with open(args.report, "a") as f:
            f.write(report + "\n\n")
        with open(args.report + ".json", "a") as f:
            f.write(json.dumps(results, default=float) + "\n")
    print(report)


if __name__ == "__main__":
    main()
