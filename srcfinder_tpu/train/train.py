"""Training harness: SAM GoogLeNet on tiled methane data.

Reference (cnn/training/experiment_script_all.py): per-epoch train loop
with SAM two-pass steps, validation pass, weights saved every 5 epochs,
loss CSVs + curve PNG, and a post-training PR-curve -> best-F1 threshold
with classification reports (:434-510).
"""

from __future__ import annotations

import csv
import os
import time
from datetime import datetime

import numpy as np
import jax
import jax.numpy as jnp

from ..models.googlenet import googlenet
from .sam import (TrainState, make_sam_train_step, make_sgd_train_step,
                  make_inner_optimizer, step_lr, weighted_cross_entropy)
from .data import (TiledDataset, TRAIN_CAMPAIGN_NORM, load_labels_csv,
                   loss_weights_for)

__all__ = ["TrainConfig", "train_experiment", "evaluate_threshold",
           "save_checkpoint", "load_checkpoint"]


class TrainConfig:
    def __init__(self, dataroot, campaign, lr=1e-4, augment="default",
                 crop=256, epochs=100, outroot="cnn_output", use_sam=True,
                 batch_size=16, train_all=False, seed=0, aux_weight=0.0,
                 resume=None, start_epoch=0, devices=None):
        """``resume``: a weights .npz from a previous run — params and
        batch_stats are restored before training (the reference resumes
        by loading the every-5-epochs torch.save,
        experiment_script_all.py:406-408). ``start_epoch`` continues the
        StepLR schedule from that epoch.

        ``devices``: run data-parallel over the first N devices of a
        ``jax.sharding.Mesh`` — batches shard on their leading axis,
        state replicates, and the SAME jitted step runs: GSPMD inserts
        the gradient/BatchNorm cross-device reductions, so the math is
        the global-batch math (cross-replica BN included), not N
        independent replicas (the multichip replacement for the
        reference's single-GPU ``.to(device)`` training,
        experiment_script_all.py:300-330). Batches not divisible by N
        (the final short batch) run replicated on the same step.
        Runs are deterministic for a fixed N, but N=1 vs N>1 final
        params differ ~1% in Frobenius norm: sharded conv reductions
        reassociate sums, and ULP-level forward deltas reroute
        gradients at ReLU/maxpool boundaries (torch DataParallel has
        the same property vs single-GPU)."""
        self.__dict__.update(locals())
        del self.__dict__["self"]


def save_checkpoint(path, state: TrainState):
    """Flattened npz checkpoint (role of torch.save(state_dict),
    experiment_script_all.py:406-408)."""
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, prefix + [k])
            else:
                flat["/".join(prefix + [k])] = np.asarray(v)

    walk({"params": state.params, "batch_stats": state.batch_stats}, [])
    np.savez(path, **flat)


def load_checkpoint(path):
    flat = np.load(path)
    tree: dict = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


def save_checkpoint_orbax(path, state: TrainState):
    """Orbax checkpoint (full TrainState incl. optimizer momentum — the
    resume-capable format; the npz path mirrors the reference's
    weights-only torch.save)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path),
               {"params": state.params, "batch_stats": state.batch_stats})
    ckptr.wait_until_finished()
    return path


def load_checkpoint_orbax(path, state: TrainState = None):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    target = None
    if state is not None:
        target = {"params": state.params, "batch_stats": state.batch_stats}
    return ckptr.restore(os.path.abspath(path), target)


def _predict_probs(model, variables, dataset, batch_size=16):
    probs, labels = [], []
    for images, labs in dataset.batches(batch_size, shuffle=False):
        logits = model.apply(variables, jnp.asarray(images), train=False)
        probs.append(np.asarray(jax.nn.softmax(logits, -1))[:, 1])
        labels.append(labs)
    return np.concatenate(probs), np.concatenate(labels)


def evaluate_threshold(probs, labels):
    """PR curve -> best-F1 threshold + report (reference:
    experiment_script_all.py:434-510)."""
    from sklearn.metrics import (precision_recall_curve, classification_report)
    precision, recall, thresholds = precision_recall_curve(labels, probs)
    with np.errstate(divide="ignore", invalid="ignore"):
        f1 = 2 * precision * recall / (precision + recall)
    f1 = np.nan_to_num(f1[:-1])
    best = int(np.argmax(f1))
    thr = float(thresholds[best])
    report = classification_report(labels, probs >= thr, output_dict=True,
                                   zero_division=0)
    return dict(threshold=thr, f1=float(f1[best]),
                precision=float(precision[best]), recall=float(recall[best]),
                report=report)


def train_experiment(cfg: TrainConfig, progress=print):
    """Run a full training experiment; returns (state, expdir, metrics)."""
    expname = (f"{datetime.now().strftime('%Y%m%d_%H%M%S_%f')}_"
               f"{cfg.campaign}_{cfg.augment}_"
               f"{'all' if cfg.train_all else 'train'}_{cfg.crop}")
    outdir = os.path.join(cfg.outroot, expname)
    weightdir = os.path.join(outdir, "weights")
    os.makedirs(weightdir, exist_ok=True)

    mean, std = TRAIN_CAMPAIGN_NORM[cfg.campaign]
    mode_csv = "data_labels.csv" if cfg.train_all else "train.csv"
    train_rows = load_labels_csv(os.path.join(cfg.dataroot, cfg.campaign,
                                              mode_csv))
    val_rows = load_labels_csv(os.path.join(cfg.dataroot, cfg.campaign,
                                            "test.csv"))
    weights = loss_weights_for(train_rows)
    progress(f"Using class weights {weights}")

    train_ds = TiledDataset(os.path.join(cfg.dataroot, cfg.campaign),
                            train_rows, mean, std, cfg.crop, cfg.augment,
                            seed=cfg.seed)
    val_ds = TiledDataset(os.path.join(cfg.dataroot, cfg.campaign),
                          val_rows, mean, std, cfg.crop, "augA")

    model = googlenet(num_classes=2)
    key = jax.random.PRNGKey(cfg.seed)
    key, kinit, kdrop = jax.random.split(key, 3)
    # init in train mode so the aux-head params exist (they are traced
    # only when train=True, mirroring torch's training-only aux forward)
    variables = model.init({"params": kinit, "dropout": kdrop},
                           jnp.zeros((1, cfg.crop, cfg.crop, 1)), train=True)
    if cfg.resume:
        progress(f"Resuming weights from {cfg.resume}")
        tree = load_checkpoint(cfg.resume)
        variables = {"params": tree["params"],
                     "batch_stats": tree["batch_stats"]}
    optimizer = make_inner_optimizer()
    opt_state = optimizer.init(variables["params"])
    state = TrainState(variables["params"], variables["batch_stats"],
                       opt_state)

    make_step = make_sam_train_step if cfg.use_sam else make_sgd_train_step
    step = make_step(model, optimizer, jnp.asarray(weights),
                     aux_weight=cfg.aux_weight)

    if cfg.devices:
        from ..parallel.mesh import (make_mesh, batch_sharding,
                                     replicated_sharding)
        mesh = make_mesh(cfg.devices)
        bsh = batch_sharding(mesh)
        state = jax.device_put(state, replicated_sharding(mesh))
        progress(f"Data-parallel over {cfg.devices} devices "
                 f"({jax.devices()[0].platform})")

        def place(images, labels):
            images, labels = jnp.asarray(images), jnp.asarray(labels)
            if images.shape[0] % cfg.devices == 0:
                images = jax.device_put(images, bsh)
                labels = jax.device_put(labels, bsh)
            return images, labels
    else:
        def place(images, labels):
            return jnp.asarray(images), jnp.asarray(labels)

    batch_losses = [["epoch", "batch", "loss"]]
    train_epoch_losses = [["epoch", "mean train loss"]]
    val_epoch_losses = [["epoch", "mean val loss"]]
    wce = jnp.asarray(weights)

    for epoch in range(cfg.start_epoch, cfg.epochs):
        t0 = time.time()
        lr = step_lr(cfg.lr, cfg.epochs, epoch)
        epoch_loss, nb = 0.0, 0
        for it, (images, labels) in enumerate(
                train_ds.batches(cfg.batch_size, shuffle=True)):
            key, sub = jax.random.split(key)
            images, labels = place(images, labels)
            state, loss = step(state, images, labels, lr, sub)
            lossf = float(loss)
            epoch_loss += lossf
            nb += 1
            batch_losses.append([epoch, it, lossf])
        train_epoch_losses.append([epoch, epoch_loss / max(nb, 1)])
        progress(f"Epoch {epoch} took {time.time() - t0:.1f}s "
                 f"loss {epoch_loss / max(nb, 1):.4f}")

        # validation (reference: experiment_script_all.py:390-403)
        vloss, vb = 0.0, 0
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        for images, labels in val_ds.batches(cfg.batch_size, shuffle=False):
            logits = model.apply(variables, jnp.asarray(images), train=False)
            vloss += float(weighted_cross_entropy(
                logits, jnp.asarray(labels), wce))
            vb += 1
        val_epoch_losses.append([epoch, vloss / max(vb, 1)])

        if (epoch + 1) % 5 == 0:
            save_checkpoint(os.path.join(
                weightdir, f"{epoch}_{expname}_weights.npz"), state)

    for name, rows in [("batch_losses.csv", batch_losses),
                       ("epoch_losses.csv", train_epoch_losses),
                       ("val_losses.csv", val_epoch_losses)]:
        with open(os.path.join(outdir, name), "w", newline="") as f:
            csv.writer(f).writerows(rows)

    # post-training threshold selection on train, report on train/val
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    tr_probs, tr_labels = _predict_probs(model, variables, train_ds,
                                         cfg.batch_size)
    metrics = evaluate_threshold(tr_probs, tr_labels)
    va_probs, va_labels = _predict_probs(model, variables, val_ds,
                                         cfg.batch_size)
    metrics["val_report"] = evaluate_threshold(va_probs, va_labels)["report"]
    import json
    with open(os.path.join(outdir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    save_checkpoint(os.path.join(weightdir, f"final_{expname}_weights.npz"),
                    state)
    return state, outdir, metrics
