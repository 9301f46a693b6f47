#!/usr/bin/env python
"""Accuracy-parity experiment: ndtpu vs. the torch reference (north star).

BASELINE.md's target is classification-accuracy parity with the PyTorch
reference at n_desired_nds=1000. This image ships none of the reference's
datasets (CARLA / ModelNet40), so this is the controlled version of the
experiment: both frameworks' models train on the SAME synthetic dataset,
consuming IDENTICAL ndtpu-preprocessed (points, covs) tensors, with the
same optimizer (Adam: same lr/betas/eps), the same batch schedule (shared
seeded permutations), and matched initial weights (the torch init is
transplanted into flax via ndtpu.interop before either side trains) — the
only varying factor is the framework.

Loss on the torch side defaults to the reference's documented intent
(standard CE over the class dim). Its literal segmentation loss
(`F.cross_entropy(pred_logprobs, gt)` over the wrong dim,
/root/reference/tools/train.py:72 — SURVEY.md §2.4) is selectable with
--torch_loss literal for completeness.

Reference loop semantics: /root/reference/tools/train.py:16-92; models
/root/reference/ndnet/models/ndtnet.py:166-243.
"""
import argparse
import json
import time

import numpy as np

import _common  # noqa: F401  (sys.path + NDTPU_PLATFORM pinning)


def build_dataset(task, n_samples, train_size, test_size, n_classes, seed):
    from ndtpu.data.synthetic import SyntheticCls, SyntheticSeg

    if task == "classification":
        n_classes = SyntheticCls.NUM_CLASSES
        train = SyntheticCls(n_samples, length=train_size, seed=seed)
        test = SyntheticCls(n_samples, length=test_size, seed=seed + 7919)

        def stack(ds):
            pts, labels = zip(*[ds[i] for i in range(len(ds))])
            return np.stack(pts), np.asarray(labels, np.int64), None

        return stack(train), stack(test), n_classes
    train = SyntheticSeg(n_classes, n_samples, length=train_size, seed=seed)
    test = SyntheticSeg(n_classes, n_samples, length=test_size,
                        seed=seed + 7919)

    def stack(ds):
        pts, gts = zip(*[ds[i] for i in range(len(ds))])
        return np.stack(pts), None, np.stack(gts)

    return stack(train), stack(test), n_classes


def preprocess(points, gt_onehot, n_desired, n_classes, chunk=8):
    """One ndtpu NDT preprocessing of the whole split — the identical
    tensors both frameworks consume. Chunked so a split of any size
    reuses one compiled shape (last chunk padded)."""
    import jax.numpy as jnp

    from ndtpu.preprocessing.batch import ndt_preprocessing_with_state

    s = points.shape[0]
    outs = []
    for i in range(0, s, chunk):
        p = points[i:i + chunk]
        g = gt_onehot[i:i + chunk] if gt_onehot is not None else None
        pad = chunk - p.shape[0]
        if pad:
            p = np.concatenate([p, np.repeat(p[-1:], pad, axis=0)])
            if g is not None:
                g = np.concatenate([g, np.repeat(g[-1:], pad, axis=0)])
        pcl, covs, onehot, mask, _ = ndt_preprocessing_with_state(
            int(n_desired), jnp.asarray(p),
            jnp.asarray(g) if g is not None else None, int(n_classes),
        )
        outs.append((np.asarray(pcl), np.asarray(covs), np.asarray(onehot),
                     np.asarray(mask)))
    cat = [np.concatenate(x)[:s] for x in zip(*outs)]
    return {"pcl": cat[0], "covs": cat[1], "gt": cat[2], "mask": cat[3]}


def make_torch_models(task, n_classes, feature_dim, seed):
    """Reference model (torch) + its init transplanted into flax params."""
    import torch

    from ndtpu.interop import (
        map_ndtnet_classification,
        map_ndtnet_segmentation,
    )
    from ndtpu.interop.reference_loader import load_reference_module

    ref = load_reference_module("ndtnet")
    torch.manual_seed(seed)
    if task == "classification":
        t_model = ref.NDTNetClassification(3, n_classes, feature_dim)
        variables = map_ndtnet_classification(t_model)
    else:
        t_model = ref.NDTNetSegmentation(3, n_classes, feature_dim)
        variables = map_ndtnet_segmentation(t_model)
    return t_model, variables


def train_torch(t_model, task, train_d, test_d, labels_tr, labels_te, perms,
                batch, lr, loss_mode, eval_every=0, wide_d=None,
                labels_wide=None, bn_frozen=False, f64=False):
    """Train the reference model on the preprocessed tensors; returns the
    per-epoch accuracy/loss curves + final test accuracy (train.py:84-87
    metric). eval_every=K also records test accuracy every K epochs
    (eval has no side effects — training math is unchanged). wide_d is an
    optional larger test split evaluated once at the end (batched so the
    narrow-metric math is untouched)."""
    import torch
    import torch.nn.functional as F

    if f64:
        t_model.double()
    opt = torch.optim.Adam(t_model.parameters(), lr=lr)
    dt = torch.float64 if f64 else torch.float32

    def tensors(d, idx):
        return (torch.tensor(d["pcl"][idx], dtype=dt),
                torch.tensor(d["covs"][idx], dtype=dt),
                torch.tensor(d["gt"][idx], dtype=dt),
                torch.tensor(d["mask"][idx], dtype=dt))

    def loss_and_acc(out, gt, mask, labels):
        if task == "classification":
            probs = out[:, :, 0]
            onehot = F.one_hot(labels, probs.shape[1]).to(dt)
            loss = -(onehot * torch.log(probs + 1e-9)).sum(1).mean()
            acc = (probs.argmax(1) == labels).float().mean()
        else:
            if loss_mode == "literal":
                # the reference's verbatim call (train.py:72): pred is
                # already log-probs and the class dim is wrong
                loss = F.cross_entropy(out, gt)
            else:
                ce = -(gt * out).sum(-1)
                loss = (ce * mask).sum() / mask.sum().clamp(min=1)
            hit = (out.argmax(-1) == gt.argmax(-1)).float()
            acc = (hit * mask).sum() / mask.sum().clamp(min=1)
        return loss, acc

    def eval_test(d=None, labels=None):
        d = test_d if d is None else d
        labels = labels_te if labels is None else labels
        t_model.eval()
        with torch.no_grad():
            idx = np.arange(d["pcl"].shape[0])
            pcl, covs, gt, mask = tensors(d, idx)
            lab = torch.tensor(labels) if labels is not None else None
            out = t_model(pcl, covs)
            _, test_acc = loss_and_acc(out, gt, mask, lab)
        return float(test_acc)

    def set_train_mode():
        t_model.train()
        if bn_frozen:
            # BN-frozen control: weights train, but normalization uses the
            # (initial) running stats and the stats never update — isolates
            # BN train-mode dynamics as a bifurcation source
            for mod in t_model.modules():
                if isinstance(mod, torch.nn.modules.batchnorm._BatchNorm):
                    mod.eval()

    curve, loss_curve, test_curve = [], [], []
    for ep, perm in enumerate(perms):
        set_train_mode()
        ep_acc, ep_loss = [], []
        for i in range(0, len(perm) - batch + 1, batch):
            idx = perm[i:i + batch]
            pcl, covs, gt, mask = tensors(train_d, idx)
            lab = (torch.tensor(labels_tr[idx])
                   if labels_tr is not None else None)
            out = t_model(pcl, covs)
            loss, acc = loss_and_acc(out, gt, mask, lab)
            opt.zero_grad()
            loss.backward()
            opt.step()
            ep_acc.append(float(acc))
            ep_loss.append(float(loss))
        curve.append(float(np.mean(ep_acc)))
        loss_curve.append(float(np.mean(ep_loss)))
        if eval_every and (ep + 1) % eval_every == 0:
            test_curve.append(eval_test())

    test_acc = eval_test()
    wide_acc = (eval_test(wide_d, labels_wide)
                if wide_d is not None else None)
    return curve, test_acc, loss_curve, test_curve, wide_acc


def train_ndtpu(variables, task, train_d, test_d, labels_tr, labels_te,
                perms, batch, lr, n_classes, feature_dim, eval_every=0,
                wide_d=None, labels_wide=None, bn_frozen=False, f64=False,
                loss_form="exact"):
    """Train the flax twin from the SAME transplanted init, same schedule."""
    import jax
    import jax.numpy as jnp
    import optax

    from ndtpu.models import NDTNetClassification, NDTNetSegmentation
    from ndtpu.train import TrainState
    from ndtpu.train.loop import accuracy, cross_entropy_loss

    dt = jnp.float64 if f64 else jnp.float32
    kw = dict(num_classes=n_classes, feature_dim=feature_dim,
              dtype=dt, param_dtype=dt)
    if task == "classification":
        model = NDTNetClassification(**kw)
    else:
        model = NDTNetSegmentation(**kw)
    if f64:
        variables = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float64), variables
        )
    tx = optax.adam(lr)  # torch Adam defaults: b1 .9, b2 .999, eps 1e-8
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )

    @jax.jit
    def step(state, pcl, covs, target, mask):
        def loss_fn(params):
            if bn_frozen:
                # BN-frozen control (see train_torch): normalize with the
                # fixed transplanted running stats, never update them
                logits = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    pcl, covs, train=False, return_logits=True,
                )
                new_bs = state.batch_stats
            else:
                logits, mutated = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    pcl, covs, train=True, return_logits=True,
                    mutable=["batch_stats"],
                )
                new_bs = mutated["batch_stats"]
            m = mask if task == "segmentation" else None
            if loss_form == "reference" and task == "classification":
                # the torch side's literal form (train.py:72 + the softmax
                # classification head): CE on probabilities with a 1e-9
                # floor, instead of fused log-softmax — identical to ~1e-7
                # for the first steps, but a distinct rounding stream (the
                # r4-flagged loss-asymmetry control)
                probs = jax.nn.softmax(logits, axis=-1)
                loss = -jnp.sum(target * jnp.log(probs + 1e-9),
                                axis=-1).mean()
            else:
                loss = cross_entropy_loss(logits, target, m)
            return loss, (logits, new_bs)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        m = mask if task == "segmentation" else None
        acc = accuracy(logits, target, m)
        return state.apply_gradients(grads, new_batch_stats=new_bs), loss, acc

    @jax.jit
    def evaluate(state, pcl, covs, target, mask):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            pcl, covs, train=False, return_logits=True,
        )
        m = mask if task == "segmentation" else None
        return accuracy(logits, target, m)

    def target_of(d, labels, idx):
        if task == "classification":
            return jax.nn.one_hot(labels[idx], n_classes)
        return jnp.asarray(d["gt"][idx])

    def eval_test(state, d=None, labels=None):
        d = test_d if d is None else d
        labels = labels_te if labels is None else labels
        idx = np.arange(d["pcl"].shape[0])
        return float(evaluate(
            state, jnp.asarray(d["pcl"]), jnp.asarray(d["covs"]),
            target_of(d, labels, idx), jnp.asarray(d["mask"]),
        ))

    curve, loss_curve, test_curve = [], [], []
    for ep, perm in enumerate(perms):
        ep_acc, ep_loss = [], []
        for i in range(0, len(perm) - batch + 1, batch):
            idx = perm[i:i + batch]
            state, loss, acc = step(
                state, jnp.asarray(train_d["pcl"][idx]),
                jnp.asarray(train_d["covs"][idx]),
                target_of(train_d, labels_tr, idx),
                jnp.asarray(train_d["mask"][idx]),
            )
            ep_acc.append(float(acc))
            ep_loss.append(float(loss))
        curve.append(float(np.mean(ep_acc)))
        loss_curve.append(float(np.mean(ep_loss)))
        if eval_every and (ep + 1) % eval_every == 0:
            test_curve.append(eval_test(state))

    wide_acc = (eval_test(state, wide_d, labels_wide)
                if wide_d is not None else None)
    finals = {"params": jax.device_get(state.params),
              "batch_stats": jax.device_get(state.batch_stats)}
    return curve, eval_test(state), loss_curve, test_curve, wide_acc, finals


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--task", default="classification",
                    choices=["classification", "segmentation"])
    ap.add_argument("--n_desired_nds", type=int, default=1000)
    ap.add_argument("--n_samples", type=int, default=4096)
    ap.add_argument("--n_classes", type=int, default=8)
    ap.add_argument("--feature_dim", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--train_size", type=int, default=64)
    ap.add_argument("--test_size", type=int, default=16)
    ap.add_argument("--wide_test_size", type=int, default=0,
                    help="also evaluate the FINAL model of both frameworks "
                         "on this many test clouds (>= test_size; the first "
                         "test_size clouds are bit-identical to the narrow "
                         "split — SyntheticCls/Seg derive each cloud from "
                         "(seed, index) — so the legacy metric reproduces "
                         "exactly while the wide one shrinks eval noise)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--torch_loss", default="intent",
                    choices=["intent", "literal"])
    ap.add_argument("--ndtpu_loss", default="exact",
                    choices=["exact", "reference"],
                    help="classification loss form on the ndtpu side: "
                         "'exact' = fused log-softmax CE (the harness "
                         "protocol since r2), 'reference' = the torch "
                         "side's verbatim -(onehot*log(softmax+1e-9)) form "
                         "— the A/B control for the r4-flagged loss "
                         "asymmetry (identical math, distinct f32 rounding "
                         "stream)")
    ap.add_argument("--save_finals", default="",
                    help="path prefix: save both frameworks' FINAL weights "
                         "({prefix}_ndtpu.npz / {prefix}_torch.pt) so wide "
                         "evals never require retraining again (the r4 "
                         "residual existed because finals were discarded)")
    ap.add_argument("--eval_every", type=int, default=0,
                    help="also record test accuracy every K epochs (eval is "
                         "side-effect-free; training math is unchanged)")
    ap.add_argument("--perturb_init", type=float, default=0.0,
                    help="add N(0, scale) noise to one side's copy of the "
                         "transplanted init (basin-sensitivity control: a "
                         "microscopic perturbation changing the outcome "
                         "proves chaotic basin selection, not framework "
                         "bias)")
    ap.add_argument("--perturb_side", default="ndtpu",
                    choices=["ndtpu", "torch"],
                    help="which framework's weights receive the "
                         "--perturb_init noise (perturbing torch is the "
                         "reverse control: does the reference also leave "
                         "its basin under a microscopic nudge?)")
    ap.add_argument("--bn_frozen", action="store_true",
                    help="seed-0 diagnosis control: train weights with "
                         "BatchNorm normalization frozen at the "
                         "transplanted running stats on BOTH sides — "
                         "isolates BN train-mode dynamics as the "
                         "bifurcation source")
    ap.add_argument("--precision", default="f32", choices=["f32", "f64"],
                    help="seed-0 diagnosis control: run BOTH frameworks in "
                         "float64 — if the f32 bifurcation disappears, the "
                         "divergence is rounding-triggered chaos, not a "
                         "framework difference")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    t0 = time.time()
    full_test = max(args.test_size, args.wide_test_size)
    (tr_pts, tr_lab, tr_gt), (te_pts, te_lab, te_gt), n_classes = (
        build_dataset(args.task, args.n_samples, args.train_size,
                      full_test, args.n_classes, args.seed)
    )
    print(f"[parity] dataset built ({time.time() - t0:.1f}s); "
          f"preprocessing {args.train_size}+{full_test} clouds "
          f"of {args.n_samples} pts -> {args.n_desired_nds} NDs ...",
          flush=True)
    train_d = preprocess(tr_pts, tr_gt, args.n_desired_nds, n_classes,
                         chunk=args.batch_size)
    wide_full = preprocess(te_pts, te_gt, args.n_desired_nds, n_classes,
                           chunk=args.batch_size)
    # the narrow split is a prefix VIEW of the wide one: preprocessing is
    # chunked at batch_size (64 % 8 == 0), so the first test_size rows are
    # bit-identical to a narrow-only run and the legacy metric reproduces
    test_d = {k: v[:args.test_size] for k, v in wide_full.items()}
    wide_d = wide_full if args.wide_test_size > args.test_size else None
    te_lab_wide = te_lab
    if te_lab is not None:
        te_lab, te_lab_wide = te_lab[:args.test_size], te_lab
    print(f"[parity] preprocessing done ({time.time() - t0:.1f}s); "
          f"mask valid fraction train="
          f"{train_d['mask'].mean():.4f} test={test_d['mask'].mean():.4f}",
          flush=True)

    t_model, variables = make_torch_models(
        args.task, n_classes, args.feature_dim, args.seed
    )
    if args.perturb_init and args.perturb_side == "ndtpu":
        import jax

        leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
        keys = jax.random.split(jax.random.PRNGKey(999), len(leaves))
        leaves = [
            l + args.perturb_init * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)
        ]
        variables = dict(variables,
                         params=jax.tree_util.tree_unflatten(treedef, leaves))
    elif args.perturb_init and args.perturb_side == "torch":
        import torch

        torch.manual_seed(999)
        with torch.no_grad():
            for p in t_model.parameters():
                p.add_(args.perturb_init * torch.randn_like(p))
    rng = np.random.default_rng(args.seed + 13)
    perms = [rng.permutation(args.train_size) for _ in range(args.epochs)]

    if args.precision == "f64":
        # enable AFTER the (int32-keyed) NDT preprocessing ran: x64 mode
        # promotes the pipeline's int arithmetic and breaks its compiled
        # carries; only the TRAINING math needs f64 for this control
        import jax

        jax.config.update("jax_enable_x64", True)

    j_curve, j_test, j_loss, j_testc, j_wide, j_finals = train_ndtpu(
        variables, args.task, train_d, test_d, tr_lab, te_lab, perms,
        args.batch_size, args.lr, n_classes, args.feature_dim,
        args.eval_every, wide_d, te_lab_wide,
        args.bn_frozen, args.precision == "f64", args.ndtpu_loss,
    )
    print(f"[parity] ndtpu trained ({time.time() - t0:.1f}s): "
          f"final train acc {j_curve[-1]:.4f}, test acc {j_test:.4f}"
          + (f", wide acc {j_wide:.4f}" if j_wide is not None else ""),
          flush=True)
    t_curve, t_test, t_loss, t_testc, t_wide = train_torch(
        t_model, args.task, train_d, test_d, tr_lab, te_lab, perms,
        args.batch_size, args.lr, args.torch_loss, args.eval_every,
        wide_d, te_lab_wide,
        args.bn_frozen, args.precision == "f64",
    )
    print(f"[parity] torch reference trained ({time.time() - t0:.1f}s): "
          f"final train acc {t_curve[-1]:.4f}, test acc {t_test:.4f}"
          + (f", wide acc {t_wide:.4f}" if t_wide is not None else ""),
          flush=True)

    result = {
        "task": args.task,
        "n_desired_nds": args.n_desired_nds,
        "n_samples": args.n_samples,
        "n_classes": n_classes,
        "feature_dim": args.feature_dim,
        "epochs": args.epochs,
        "batch_size": args.batch_size,
        "lr": args.lr,
        "torch_loss": args.torch_loss,
        "ndtpu": {"train_curve": j_curve, "test_accuracy": j_test,
                  "train_loss_curve": j_loss, "test_curve": j_testc,
                  "test_accuracy_wide": j_wide},
        "torch_reference": {"train_curve": t_curve, "test_accuracy": t_test,
                            "train_loss_curve": t_loss, "test_curve": t_testc,
                            "test_accuracy_wide": t_wide},
        "wide_test_size": args.wide_test_size,
        "bn_frozen": args.bn_frozen,
        "precision": args.precision,
        "ndtpu_loss": args.ndtpu_loss,
        "parity": j_test >= t_test - 0.02,
        "wall_s": round(time.time() - t0, 1),
    }
    if args.save_finals:
        import torch

        from jax.tree_util import tree_flatten_with_path, keystr

        leaves, _ = tree_flatten_with_path(j_finals)
        np.savez(args.save_finals + "_ndtpu.npz",
                 **{keystr(path): np.asarray(leaf)
                    for path, leaf in leaves})
        torch.save(t_model.state_dict(), args.save_finals + "_torch.pt")
        result["finals"] = args.save_finals
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
