"""Optimizer construction: Adam + L2 weight decay + MultiStep LR + β₁ ramp.

Matches the reference's optimization recipe:
  * torch Adam(lr=1e-3, weight_decay=1e-5, betas=...) where weight decay is
    L2 added to the gradient (train_shape_reconstruction.py:40,
    train_unet_segmentation.py:32),
  * ``MultiStepLR`` epoch-milestone decay (gamma 0.1) stepped at epoch
    start (Learner.py:156-158),
  * the CAE learners' β₁ warm-ramp over the first 4 epochs
    (CaeReconstructionLearner.py:28-40).

Hyperparameters are injected (``optax.inject_hyperparams``) so the host
epoch loop can set lr / β₁ without retracing the jitted train step.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import optax


def make_optimizer(learning_rate: float = 1e-3,
                   betas: Tuple[float, float] = (0.9, 0.999),
                   weight_decay: float = 1e-5,
                   eps: float = 1e-8,
                   trainable_mask=None) -> optax.GradientTransformation:
    """``trainable_mask``: optional bool pytree (matching params); frozen
    leaves get zero updates — the functional equivalent of the reference's
    ``requires_grad``-filtered param lists + ``freeze()``
    (e.g. train_interpolationstep_after_reconstruction.py:22-34, where
    only the step head of a grafted Enc3DStep trains)."""

    @optax.inject_hyperparams
    def tx(learning_rate, b1):
        inner = optax.chain(
            optax.add_decayed_weights(weight_decay),   # torch-style L2
            optax.scale_by_adam(b1=b1, b2=betas[1], eps=eps),
            optax.scale_by_learning_rate(learning_rate),
        )
        if trainable_mask is None:
            return inner
        import jax
        frozen_mask = jax.tree_util.tree_map(lambda m: not m, trainable_mask)
        return optax.chain(
            optax.masked(inner, trainable_mask),
            optax.masked(optax.set_to_zero(), frozen_mask),
        )

    return tx(learning_rate=learning_rate, b1=betas[0])


def trainable_mask_by_path(params, wanted_substrings):
    """Bool pytree: True where any path component contains one of the
    given substrings (e.g. ('reduce1', 'reduce2', 'step_head'))."""
    import jax

    def mark(path, _leaf):
        names = [str(getattr(p, "key", getattr(p, "name", p)))
                 for p in path]
        return any(s in n for n in names for s in wanted_substrings)

    return jax.tree_util.tree_map_with_path(mark, params)


def multistep_lr(base_lr: float, milestones: Sequence[int],
                 gamma: float = 0.1):
    """torch ``MultiStepLR`` equivalent: lr(epoch) = base * gamma^#{m <= epoch}."""
    ms = sorted(milestones)

    def schedule(epoch: int) -> float:
        return base_lr * gamma ** sum(1 for m in ms if m <= epoch)

    return schedule


def beta1_ramp(base_b1: float, epoch: int, n_ramp_epochs: int = 4) -> float:
    """β₁ warm-ramp: b1 - 0.1*(n - epoch) for the first n epochs
    (reference: CaeReconstructionLearner.py:28-40)."""
    if epoch < n_ramp_epochs:
        return base_b1 - 0.1 * (n_ramp_epochs - epoch)
    return base_b1


def set_hyperparams(opt_state, **kw):
    """Set injected hyperparameters (host-side, between epochs)."""
    import jax.numpy as jnp
    for k, v in kw.items():
        opt_state.hyperparams[k] = jnp.asarray(
            v, dtype=opt_state.hyperparams[k].dtype)
    return opt_state
