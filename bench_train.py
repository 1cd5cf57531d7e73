"""Training-step benchmark on the real chip (VERDICT r1 weak #3).

Reproduces the BASELINE.md training numbers with one command: the full
jitted GAN train step (D step + G step, all 8 reference losses, two-frame
unroll with rematerialization) at the reference config — batch 16,
216x384 (train.py:42-47) — on ONE chip. Batches vary per step so the axon
relay's execution memoization cannot fire; steps chain through the train
state, so timing is an async carry chain with one block at the end.

Usage: python bench_train.py [--platform cpu] [--batch 16] [--steps 4]
Prints ONE JSON line (not the driver bench — that is bench.py).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def _make_batch(rng, b, h, w):
    import jax.numpy as jnp

    return {
        "last_lab": jnp.asarray(rng.uniform(-50, 50, (b, h, w, 3)).astype(np.float32)),
        "current_lab": jnp.asarray(rng.uniform(-50, 50, (b, h, w, 3)).astype(np.float32)),
        "ref_lab": jnp.asarray(rng.uniform(-50, 50, (b, h, w, 3)).astype(np.float32)),
        "flow_forward": jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32) * 2),
        "flow_backward": jnp.zeros((b, h, w, 2), jnp.float32),
        "mask": jnp.ones((b, h, w, 1), jnp.float32),
        "placeholder_lab": jnp.zeros((b, h, w, 3), jnp.float32),
        "self_ref_flag": jnp.ones((b, 1), jnp.float32),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--image-size", type=int, nargs=2, default=(216, 384))
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from devc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from __graft_entry__ import _make_params
    from devc_tpu.train.loop import TrainConfig, train_step
    from devc_tpu.train.state import create_train_state

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        args.batch = min(args.batch, 2)
        args.image_size = (64, 64)
        args.steps = min(args.steps, 2)
    b = args.batch
    h, w = args.image_size

    state, tx_g, tx_d = create_train_state(jax.random.PRNGKey(0),
                                           use_schedule=True)
    vgg_params = _make_params(jax.random.PRNGKey(1))["vgg"]
    cfg = TrainConfig(use_pallas=on_tpu and not args.no_pallas)
    fn = jax.jit(
        functools.partial(train_step, tx_g=tx_g, tx_d=tx_d,
                          vgg_params=vgg_params, cfg=cfg)
    )

    rng = np.random.RandomState(0)
    batches = [_make_batch(rng, b, h, w) for _ in range(args.steps)]
    keys = jax.random.split(jax.random.PRNGKey(2), args.steps + 1)

    # compile + warm
    state, metrics = fn(state, batches[0], keys[-1])
    jax.block_until_ready(state.params_g)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = fn(state, batches[i], keys[i])
    jax.block_until_ready(state.params_g)
    dt = (time.perf_counter() - t0) / args.steps

    print(
        json.dumps(
            {
                "metric": f"train_step_ms_batch{b}_{h}x{w}_1chip",
                "value": round(dt * 1e3, 1),
                "unit": "ms/step",
                "samples_per_sec": round(b / dt, 2),
                "config": {
                    "losses": "all (L1/GAN/perceptual/contextual/smoothness/consistency)",
                    "pallas_vjp": cfg.use_pallas,
                    "remat": cfg.remat,
                },
            }
        )
    )


if __name__ == "__main__":
    import sys

    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(main, metric="train_step_ms_batch16_216x384_1chip", unit="ms/step"))
