"""Training-step benchmark on the real chip (VERDICT r1 weak #3).

Reproduces the BASELINE.md training numbers with one command: the full
jitted GAN train step (D step + G step, all 8 reference losses, two-frame
unroll with rematerialization) at the reference config — batch 16,
216x384 (train.py:42-47) — on ONE chip. Batches vary per step so the axon
relay's execution memoization cannot fire; steps chain through the train
state. Relay-proof timing (round 4, utils/measure.py): the relay acks
dispatches before executing and block_until_ready does not wait, so each
timed region ends in a forced 4-byte checksum fetch and the step time is
the delta between a 1-step and an n-step chain (constant fetch/dispatch
overheads cancel).

Usage: python bench_train.py [--platform cpu] [--batch 16] [--steps 4]
Prints ONE JSON line (not the driver bench — that is bench.py).
"""

from __future__ import annotations

import argparse
import functools
import json

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
    # donate the state: without it, a chain of n undispatched steps (the
    # relay defers execution until a fetch) holds n full TrainStates of
    # HBM at once and batch 16 RESOURCE_EXHAUSTs. Each run() starts from
    # a jitted COPY of the warm state so state0 itself is never donated;
    # the copy is one dispatch, constant per run, and cancels in the delta.
    # KNOWN ISSUE (2026-08-19): batch 16 still RESOURCE_EXHAUSTs through
    # the relay even with donation and a 2-step chain — the relay appears
    # to defer buffer frees/donation like it defers execution, so each
    # chained step leaks a TrainState until a sync. Use --batch 8, or
    # re-measure fetch-per-step with the fetch cost subtracted.
    fn = jax.jit(
        functools.partial(train_step, tx_g=tx_g, tx_d=tx_d,
                          vgg_params=vgg_params, cfg=cfg),
        donate_argnums=(0,),
    )
    copy_state = jax.jit(lambda s: jax.tree.map(lambda x: x.copy(), s))

    from devc_tpu.utils.measure import Forcer, delta_time

    rng = np.random.RandomState(0)
    batches = [_make_batch(rng, b, h, w) for _ in range(args.steps)]
    # every run() call consumes FRESH keys so no (executable, inputs)
    # pair ever repeats — the relay memoizes repeated executions
    key_pool = jax.random.split(jax.random.PRNGKey(2),
                                (args.steps + 1) * 16)
    key_ctr = [0]

    def next_key():
        key_ctr[0] += 1
        return key_pool[key_ctr[0] - 1]

    forcer = Forcer()

    # compile + warm (force — the relay executes nothing until a fetch).
    # fn donates arg 0, so feed it a copy and keep state0 pristine.
    state0 = state
    s1, metrics = fn(copy_state(state0), batches[0], next_key())
    forcer.force((s1.params_g["colorvid"]["conv10_ab"], metrics))
    del s1

    def run(n):
        # fresh chain from a copy of the warm state; forcing the final
        # (params leaf, metrics) forces the whole chain. Donation reuses
        # each step's state buffers, keeping the chain O(1) in HBM.
        s = copy_state(state0)
        m = metrics
        for i in range(n):
            s, m = fn(s, batches[i], next_key())
        return (s.params_g["colorvid"]["conv10_ab"], m)

    dt = delta_time(run, 1, args.steps, forcer)

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
