"""Fused flat-vector Adam/AMSGrad (TPU-idiomatic optimizer fusion).

optax's per-leaf transforms emit ~10-15 tiny HLO ops per parameter leaf;
for this model's ~300 leaves that is thousands of sub-microsecond kernels
per step. Elementwise optimizers are invariant to flattening, so these
transforms run the EXACT optax math (transform.py::scale_by_amsgrad /
scale_by_adam + scale_by_learning_rate, formulas replicated 1:1 —
parity-tested in tests/test_train.py) on ONE concatenated fp32 vector:

  * m/v/v_max moments live as single flat arrays (same bytes, 3 buffers
    instead of ~900);
  * the whole update is ~15 large vector ops — on TPU they fuse into a
    couple of HBM-bandwidth-bound kernels, on the multi-device CPU gate
    they execute in milliseconds where the per-leaf form livelocks the
    one-core thunk scheduler for minutes;
  * per-module learning rates (reference train.py:308-319: warpnet 1e-5,
    colorvidnet 2e-4) become a per-element base-LR vector, constant-folded
    at compile time, times a shared schedule factor.

The reference's optimizer setup this mirrors: Adam(b1=0.5, b2=0.999,
eps=1e-5, amsgrad=True) for the generator, Adam(2e-4) for the critic,
StepLR(gamma=0.1) schedules (train.py:308-319, 477-479).

Checkpoint note: the optimizer state pytree differs from the per-leaf
optax form (flat arrays + count). CheckpointManager.restore detects the
structure mismatch when resuming a checkpoint written before this change
and falls back to restoring params/sn/step with FRESH optimizer moments
(with a printed notice); to resume a legacy run's moments exactly, build
the optimizers with make_optimizers(fused=False).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


class FlatAdamState(NamedTuple):
    count: jax.Array   # shared by the moment bias-correction (count+1, as
    #                    scale_by_amsgrad's count_inc) and the LR schedule
    #                    (evaluated at the PRE-increment count, as
    #                    scale_by_schedule does)
    mu: jax.Array      # first moment, flat
    nu: jax.Array      # second moment, flat
    nu_max: Any        # running max of bias-corrected nu (amsgrad), or None


def _lr_vector(lr, grads):
    """Per-element base-LR vector in ravel_pytree leaf order.

    lr may be a scalar, or a dict keyed by the top-level module names of
    `grads` (optax.multi_transform's per-module labels, flattened). Built
    from jnp.full over static shapes — XLA constant-folds it.
    """
    if isinstance(lr, dict):
        lr_tree = {
            k: jax.tree.map(
                lambda x, v=lr[k]: jnp.full(x.shape, v, jnp.float32), grads[k]
            )
            for k in grads
        }
    else:
        lr_tree = jax.tree.map(
            lambda x: jnp.full(x.shape, lr, jnp.float32), grads
        )
    vec, _ = ravel_pytree(lr_tree)
    return vec


def flat_adam(
    lr,
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    eps_root: float = 0.0,
    amsgrad: bool = False,
    schedule_factor=None,
) -> optax.GradientTransformation:
    """optax.adam / optax.amsgrad semantics on a single flat vector.

    lr: scalar base LR or {top_module: lr} dict (see _lr_vector).
    schedule_factor: optional count -> multiplier (e.g. StepLR's
    gamma**floor(count/step)); the effective LR is lr * factor(count),
    evaluated at the pre-increment count exactly like
    optax.scale_by_schedule.
    """

    def init(params):
        flat, _ = ravel_pytree(params)
        # distinct buffers per moment: sharing one zeros array across
        # mu/nu/nu_max makes a donating jit see the same buffer twice
        # ("Attempt to donate the same buffer twice in Execute()")
        return FlatAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jnp.zeros_like(flat),
            nu=jnp.zeros_like(flat),
            nu_max=jnp.zeros_like(flat) if amsgrad else None,
        )

    def update(grads, state, params=None):
        del params
        g, unravel = ravel_pytree(grads)
        count_inc = optax.safe_increment(state.count)
        mu = (1.0 - b1) * g + b1 * state.mu
        nu = (1.0 - b2) * (g * g) + b2 * state.nu
        # optax's own (jitted) bias_correction: its fused `decay**count`
        # rounds differently (~2e-5 rel) than the same expression evaluated
        # eagerly — calling it keeps the flat path bit-identical to the
        # per-leaf optax oracle
        mu_hat = optax.tree.bias_correction(mu, b1, count_inc)
        nu_hat = optax.tree.bias_correction(nu, b2, count_inc)
        if amsgrad:
            nu_max = jnp.maximum(state.nu_max, nu_hat)
            denom = nu_max
        else:
            nu_max = None
            denom = nu_hat
        upd = mu_hat / (jnp.sqrt(denom + eps_root) + eps)
        step_size = _lr_vector(lr, grads)
        if schedule_factor is not None:
            step_size = step_size * schedule_factor(state.count)
        upd = -step_size * upd
        # materialize the flat update BEFORE unravel: without this barrier
        # XLA fuses the whole elementwise chain above into EACH of the ~300
        # per-leaf slice consumers, recomputing the full-vector update once
        # per leaf (measured: turns a 2 s step into minutes on CPU; the
        # same duplication hits TPU fusions)
        upd = jax.lax.optimization_barrier(upd)
        return unravel(upd), FlatAdamState(
            count=count_inc, mu=mu, nu=nu, nu_max=nu_max
        )

    return optax.GradientTransformation(init, update)
