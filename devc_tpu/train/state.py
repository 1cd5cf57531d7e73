"""Train state: params + optimizers + schedules as one pytree.

Mirrors the reference optimization setup (train.py:308-319, 477-479):
  generator  — Adam(betas=(0.5, 0.999), eps=1e-5, amsgrad) with per-module
               learning rates: warpnet 1e-5, colorvidnet 2e-4
  critic     — Adam(lr=2e-4, betas=(0.5, 0.999))
  schedulers — StepLR(step_size, gamma=0.1), stepped per iteration like the
               reference does (train.py:735-736)

The whole thing is a single pytree (orbax-checkpointable, pjit-shardable).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jax.Array
    params_g: Any          # {"warpnet": ..., "colorvid": ...}
    params_d: Any
    sn_state: Any          # spectral-norm u/v vectors
    opt_state_g: Any
    opt_state_d: Any


def make_lr_schedule(base_lr: float, step_size: int = 100, gamma: float = 0.1):
    """StepLR: lr * gamma^(floor(step / step_size))."""
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=step_size,
        decay_rate=gamma,
        staircase=True,
    )


def make_optimizers(
    lr_warpnet: float = 1e-5,
    lr_colorvid: float = 2e-4,
    lr_d: float = 2e-4,
    lr_step: int = 100,
    lr_gamma: float = 0.1,
    use_schedule: bool = True,
    fused: bool = True,
):
    """The reference's two Adam optimizers (train.py:308-319, 477-479).

    fused=True (default): the flat-vector implementation
    (train/flat_opt.py) — identical math, ~15 large vector ops per step
    instead of thousands of per-leaf kernels. fused=False keeps the
    per-leaf optax composition as the parity oracle
    (tests/test_train.py::test_flat_optimizer_matches_optax).
    """
    if fused:
        from devc_tpu.train.flat_opt import flat_adam

        # unit-base StepLR factor: identical f32 rounding to the per-module
        # exponential_decay schedules the optax oracle path uses
        factor = make_lr_schedule(1.0, lr_step, lr_gamma) if use_schedule else None
        tx_g = flat_adam(
            {"warpnet": lr_warpnet, "colorvid": lr_colorvid},
            b1=0.5, b2=0.999, eps=1e-5, amsgrad=True,
            schedule_factor=factor,
        )
        tx_d = flat_adam(lr_d, b1=0.5, b2=0.999, schedule_factor=factor)
        return tx_g, tx_d

    def sched(lr):
        return make_lr_schedule(lr, lr_step, lr_gamma) if use_schedule else lr

    def adam_g(lr):
        return optax.amsgrad(sched(lr), b1=0.5, b2=0.999, eps=1e-5)

    tx_g = optax.multi_transform(
        {"warpnet": adam_g(lr_warpnet), "colorvid": adam_g(lr_colorvid)},
        param_labels=lambda params: {
            "warpnet": jax.tree.map(lambda _: "warpnet", params["warpnet"]),
            "colorvid": jax.tree.map(lambda _: "colorvid", params["colorvid"]),
        },
    )
    tx_d = optax.adam(sched(lr_d), b1=0.5, b2=0.999)
    return tx_g, tx_d


def create_train_state(
    key,
    warpnet_params=None,
    colorvid_params=None,
    in_ch: int = 7,
    **opt_kwargs,
) -> tuple[TrainState, Any, Any]:
    """Build a fresh TrainState (+ the two optax transforms).

    warpnet/colorvid params may be given (warm start, reference
    train.py:467-471) or are freshly initialized.
    """
    from devc_tpu.models import (
        colorvidnet_init,
        discriminator_init,
        warpnet_init,
    )

    k1, k2, k3 = jax.random.split(key, 3)
    params_g = {
        "warpnet": warpnet_params if warpnet_params is not None else warpnet_init(k1),
        "colorvid": (
            colorvid_params if colorvid_params is not None else colorvidnet_init(k2, in_ch)
        ),
    }
    params_d, sn_state = discriminator_init(k3)

    tx_g, tx_d = make_optimizers(**opt_kwargs)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        sn_state=sn_state,
        opt_state_g=tx_g.init(params_g),
        opt_state_d=tx_d.init(params_d),
    )
    return state, tx_g, tx_d
