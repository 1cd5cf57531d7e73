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

Memory: the compiled step's temp allocation is 14.2 GB at batch 16
(probes/train_mem_probe.py), so the reference config fits 16 GB HBM only
because this harness keeps exactly ONE live TrainState (donated in place)
and a 2-deep batch pool. The r4 harness's pristine chain-head copy
(+735 MB) was what pushed batch 16 over; the relay-defers-frees theory
was refuted by probes/relay_free_probe.py.
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
    ap.add_argument("--optax", action="store_true",
                    help="per-leaf optax optimizers instead of the fused "
                         "flat Adam (isolates the r3 optimizer delta)")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--image-size", type=int, nargs=2, default=(216, 384))
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--sync-every-step", action="store_true",
                    help="fetch-per-step protocol: force a 4-byte fetch "
                         "after EVERY step so the relay executes (and "
                         "frees donated buffers) immediately — the only "
                         "protocol that fits batch 16 if the relay defers "
                         "frees along undispatched chains. The fetch+"
                         "dispatch round-trip is cancelled by subtracting "
                         "a noop-chain baseline measured the same way.")
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
                                           use_schedule=True,
                                           fused=not args.optax)
    vgg_params = _make_params(jax.random.PRNGKey(1))["vgg"]
    cfg = TrainConfig(use_pallas=on_tpu and not args.no_pallas)
    # Memory budget (probes/train_mem_probe.py, 2026-08-19, one v5e): the
    # compiled step's TEMP allocation alone is 14.2 GB at batch 16 (10.3 GB
    # at batch 8) + ~0.6 GB generated code, independent of the optimizer
    # choice (per-leaf optax: 14.0 GB — the r3 flat-Adam restructure is
    # NOT the hog). relay_free_probe.py separately refuted the r4 theory
    # that the relay defers donated-buffer frees. Batch 16 therefore only
    # fits if the harness holds NOTHING beyond the one donated TrainState:
    # no pristine chain-head copy (r4's harness kept one, +735 MB, and
    # OOM'd), and a 2-deep batch pool (+180 MB, not 4). run() threads the
    # single live state through every call — step time is state-independent
    # (same shapes), and with the state evolving plus fresh keys no
    # (executable, inputs) pair ever repeats for the relay to memoize.
    fn = jax.jit(
        functools.partial(train_step, tx_g=tx_g, tx_d=tx_d,
                          vgg_params=vgg_params, cfg=cfg),
        donate_argnums=(0,),
    )

    from devc_tpu.utils.measure import Forcer, delta_time

    rng = np.random.RandomState(0)
    batches = [_make_batch(rng, b, h, w) for _ in range(min(args.steps, 2))]
    # every run() call consumes FRESH keys so no (executable, inputs)
    # pair ever repeats — the relay memoizes repeated executions
    key_pool = jax.random.split(jax.random.PRNGKey(2),
                                (args.steps + 1) * 64)
    key_ctr = [0]

    def next_key():
        key_ctr[0] += 1
        return key_pool[key_ctr[0] - 1]

    forcer = Forcer()

    # compile + warm (force — the relay executes nothing until a fetch).
    # `state` is donated here and never referenced again: the live state
    # in s_holder is the ONLY TrainState in HBM for the rest of the run.
    s1, metrics = fn(state, batches[0], next_key())
    forcer.force((s1.params_g["colorvid"]["conv10_ab"], metrics))
    s_holder = [s1]
    del state, s1

    if args.sync_every_step:
        # fetch-per-step: every step is forced (executed + freed) before
        # the next dispatch, so live HBM is one TrainState regardless of
        # n — works at batch 16 even if the relay defers frees along
        # undispatched chains (probes/relay_free_probe.py). The per-step
        # fetch+dispatch round-trip (20-180 ms relay-dependent) is
        # cancelled by subtracting a noop-chain measured identically:
        #   T_steps(n) - T_noops(n) = n * step_time.
        import time

        import jax.numpy as jnp

        noop = jax.jit(lambda x: x + 1.0)
        x0 = jnp.zeros((8, 8), jnp.float32)
        forcer.force(noop(x0))

        def timed(fn_once, n):
            t0 = time.perf_counter()
            for i in range(n):
                forcer.force(fn_once(i))
            return time.perf_counter() - t0

        # the one live donated state threads through every forced step, so
        # the per-iteration work matches the noop chain exactly: 1 dispatch
        # + 1 forced fetch
        def one_step(i):
            s, m = fn(s_holder[0], batches[i % len(batches)], next_key())
            s_holder[0] = s
            return (s.params_g["colorvid"]["conv10_ab"], m)

        def one_noop(i):
            return noop(x0 + np.float32(i))

        n = args.steps
        reps = []
        for _ in range(3):
            t_steps = timed(one_step, n)
            t_noops = timed(one_noop, n)
            reps.append((t_steps - t_noops) / n)
        reps.sort()
        dt = reps[len(reps) // 2]
        all_deltas = reps
    else:
        def run(n):
            # advance the single live state n steps; forcing the final
            # (params leaf, metrics) forces the whole chain. Donation
            # reuses the state buffers in place, so the chain is O(1) in
            # HBM (frees along undispatched chains verified prompt by
            # relay_free_probe).
            s = s_holder[0]
            m = metrics
            for i in range(n):
                s, m = fn(s, batches[i % len(batches)], next_key())
            s_holder[0] = s
            return (s.params_g["colorvid"]["conv10_ab"], m)

        dt, all_deltas = delta_time(run, 1, args.steps, forcer,
                                    return_all=True)

    print(
        json.dumps(
            {
                "metric": f"train_step_ms_batch{b}_{h}x{w}_1chip",
                "value": round(dt * 1e3, 1),
                "unit": "ms/step",
                "samples_per_sec": round(b / dt, 2),
                "round_deltas_ms": [round(d * 1e3, 1) for d in all_deltas],
                "config": {
                    "losses": "all (L1/GAN/perceptual/contextual/smoothness/consistency)",
                    "pallas_vjp": cfg.use_pallas,
                    "remat": cfg.remat,
                    "optimizer": "optax per-leaf" if args.optax else "flat fused Adam",
                    "protocol": ("fetch-per-step minus noop-chain"
                                 if args.sync_every_step
                                 else "chained-steps delta"),
                },
            }
        )
    )


if __name__ == "__main__":
    import sys

    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(main, metric="train_step_ms_1chip", unit="ms/step"))
