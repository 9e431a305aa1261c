"""Sharpness-Aware Minimization (SAM) training step in JAX/optax.

Reference usage (cnn/training/experiment_script_all.py:325-367): SAM
wrapping SGD(momentum=0.9, weight_decay=5e-4) with rho=2.0, adaptive=True,
two forward/backward passes per step with BatchNorm running-stat updates
only on the first pass (enable/disable_running_stats). The SAM update rule
follows Foret et al. 2021 + the ASAM elementwise scaling:

    eps  = rho * (|w|^2 * g if adaptive else g) / ||(|w| * g if adaptive else g)||_2
    step = inner_opt(grad at (w + eps))

In JAX both passes live in ONE jitted function — XLA shares the forward
graph, and the whole two-pass step is a single device program (the torch
version pays two python-side optimizer round-trips per step).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "make_sam_train_step", "make_sgd_train_step",
           "weighted_cross_entropy", "sam_perturbation", "step_lr"]


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


def weighted_cross_entropy(logits, labels, weights):
    """torch CrossEntropyLoss(weight=w) semantics: mean weighted by the
    per-sample class weight (sum w_yi * ce_i / sum w_yi)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = weights[labels]
    return jnp.sum(w * ce) / jnp.sum(w)


def sam_perturbation(params, grads, rho: float, adaptive: bool):
    """Compute the SAM ascent step eps (davda54/sam first_step semantics:
    grad_norm over ALL params of (|w| if adaptive else 1)*g; eps =
    rho/(norm+1e-12) * (w^2 if adaptive else 1) * g)."""
    if adaptive:
        scaled = jax.tree.map(lambda p, g: jnp.abs(p) * g, params, grads)
    else:
        scaled = grads
    grad_norm = optax.global_norm(scaled)
    scale = rho / (grad_norm + 1e-12)
    if adaptive:
        return jax.tree.map(lambda p, g: (p ** 2) * g * scale, params, grads)
    return jax.tree.map(lambda g: g * scale, grads)


def make_inner_optimizer(momentum: float = 0.9, weight_decay: float = 5e-4):
    """SGD(momentum, weight_decay) matching torch semantics (decay added to
    the gradient before the momentum buffer). The learning rate is
    injected per step via inject_hyperparams so the reference's epoch
    schedule (scheduler(epoch) per batch) maps onto one optimizer."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate, momentum=momentum, nesterov=False),
        ))(learning_rate=1e-4)


def step_lr(base_lr: float, total_epochs: int, epoch):
    """The SAM reference implementation's StepLR schedule used by the
    training script (experiment_script_all.py:340, scheduler(epoch)):
    base until 30% of epochs, then x0.2 at 30%/60%/80%."""
    e = jnp.asarray(epoch, jnp.float32)
    t = float(total_epochs)
    lr = jnp.where(e < 0.3 * t, base_lr,
                   jnp.where(e < 0.6 * t, base_lr * 0.2,
                             jnp.where(e < 0.8 * t, base_lr * 0.2 ** 2,
                                       base_lr * 0.2 ** 3)))
    return lr


def _loss_fn(model, params, batch_stats, images, labels, weights, rng,
             update_stats: bool, aux_weight: float = 0.0):
    variables = {"params": params, "batch_stats": batch_stats}
    out, mut = model.apply(variables, images, train=True,
                           rngs={"dropout": rng},
                           mutable=["batch_stats"])
    logits, aux2, aux1 = out
    loss = weighted_cross_entropy(logits, labels, weights)
    if aux_weight > 0.0:
        loss = loss + aux_weight * (
            weighted_cross_entropy(aux2, labels, weights)
            + weighted_cross_entropy(aux1, labels, weights))
    new_stats = mut["batch_stats"] if update_stats else batch_stats
    return loss, new_stats


def make_sam_train_step(model, optimizer, weights, rho: float = 2.0,
                        adaptive: bool = True, aux_weight: float = 0.0):
    """Jitted SAM two-pass step. ``weights``: (num_classes,) CE class
    weights. Returns step(state, images NHWC, labels, lr, rng) ->
    (state, loss). The first pass updates BN running stats, the second
    does not (reference: experiment_script_all.py:356-367)."""
    weights = jnp.asarray(weights)

    @jax.jit
    def step(state: TrainState, images, labels, lr, rng):
        r1, r2 = jax.random.split(rng)
        (loss, new_stats), grads = jax.value_and_grad(
            lambda p: _loss_fn(model, p, state.batch_stats, images, labels,
                               weights, r1, True, aux_weight),
            has_aux=True)(state.params)

        eps = sam_perturbation(state.params, grads, rho, adaptive)
        params_adv = jax.tree.map(jnp.add, state.params, eps)

        (_, _), grads2 = jax.value_and_grad(
            lambda p: _loss_fn(model, p, new_stats, images, labels,
                               weights, r2, False, aux_weight),
            has_aux=True)(params_adv)

        opt_state = state.opt_state._replace(
            hyperparams={**state.opt_state.hyperparams,
                         "learning_rate": lr})
        updates, opt_state = optimizer.update(grads2, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state), loss

    return step


def make_sgd_train_step(model, optimizer, weights, aux_weight: float = 0.0):
    """Plain SGD step (reference --no-sam path,
    experiment_script_all.py:368-374)."""
    weights = jnp.asarray(weights)

    @jax.jit
    def step(state: TrainState, images, labels, lr, rng):
        (loss, new_stats), grads = jax.value_and_grad(
            lambda p: _loss_fn(model, p, state.batch_stats, images, labels,
                               weights, rng, True, aux_weight),
            has_aux=True)(state.params)
        opt_state = state.opt_state._replace(
            hyperparams={**state.opt_state.hyperparams,
                         "learning_rate": lr})
        updates, opt_state = optimizer.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state), loss

    return step
