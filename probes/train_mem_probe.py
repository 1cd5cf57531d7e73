"""Where does the batch-16 train step's HBM go? (round-5, VERDICT r4 #2)

`probes/relay_free_probe.py` REFUTED the round-4 hypothesis that the relay
defers donated-buffer frees — a 16 x 2 GiB donated chain ran with no
intermediate fetch. So the batch-16 RESOURCE_EXHAUST in bench_train.py is
the step's own compiled footprint: r2 measured 1195 ms/step at batch 16
with the OLD step structure (two separate unroll forwards, per-leaf optax
AMSGrad); r3 restructured to ONE vjp-captured forward + flat fused Adam
and nobody re-checked peak memory on hardware.

This probe LOWERS + COMPILES (never executes) the full train step at a
grid of (batch, optimizer, remat) configs and prints each executable's
`memory_analysis()` — argument/output/temp/alias bytes as XLA's allocator
sees them — plus the generated-code size. Compile-only keeps it cheap
through the relay and measures exactly the quantity that RESOURCE_EXHAUSTs
(XLA rejects the program at load/alloc time when temp+args exceed HBM).

Usage: python probes/train_mem_probe.py [--platform cpu] [--configs ...]
Prints one JSON line; exit 0 (the numbers are the record).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(batch_size, h, w, fused, remat, state_cache):
    import jax

    from __graft_entry__ import _make_params
    from bench_train import _make_batch
    from devc_tpu.train.loop import TrainConfig, train_step
    from devc_tpu.train.state import create_train_state

    import numpy as np

    if fused not in state_cache:
        state_cache[fused] = create_train_state(
            jax.random.PRNGKey(0), use_schedule=True, fused=fused
        )
    state, tx_g, tx_d = state_cache[fused]
    if "vgg" not in state_cache:
        state_cache["vgg"] = _make_params(jax.random.PRNGKey(1))["vgg"]
    vgg_params = state_cache["vgg"]

    cfg = TrainConfig(use_pallas=jax.default_backend() == "tpu", remat=remat)
    fn = jax.jit(
        functools.partial(train_step, tx_g=tx_g, tx_d=tx_d,
                          vgg_params=vgg_params, cfg=cfg),
        donate_argnums=(0,),
    )
    batch = _make_batch(np.random.RandomState(0), batch_size, h, w)
    key = jax.random.PRNGKey(7)

    t0 = time.time()
    lowered = fn.lower(state, batch, key)
    compiled = lowered.compile()
    dt = time.time() - t0

    rec = {"batch": batch_size, "fused_adam": fused, "remat": remat,
           "compile_s": round(dt, 1)}
    try:
        ma = compiled.memory_analysis()
        for field in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "alias_size_in_bytes",
                      "generated_code_size_in_bytes"):
            v = getattr(ma, field, None)
            if v is not None:
                rec[field.replace("_in_bytes", "_mb")] = round(v / (1 << 20), 1)
        args_mb = rec.get("argument_size_mb", 0.0)
        temp_mb = rec.get("temp_size_mb", 0.0)
        alias_mb = rec.get("alias_size_mb", 0.0)
        # live HBM the allocator needs: non-donated args + outputs share
        # aliased storage with donated args, so peak ~= args + temp - alias
        # + outputs-not-aliased; report the dominant args+temp for ranking
        rec["approx_peak_mb"] = round(args_mb + temp_mb - alias_mb, 1)
    except Exception as e:  # noqa: BLE001 — relay plugins may not implement it
        rec["memory_analysis_error"] = f"{type(e).__name__}: {e}"[:200]
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--image-size", type=int, nargs=2, default=(216, 384))
    ap.add_argument(
        "--configs", nargs="+",
        default=["16:flat:remat", "16:optax:remat", "8:flat:remat"],
        help="batch:{flat|optax}:{remat|noremat} triples",
    )
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from devc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    h, w = args.image_size
    if jax.default_backend() != "tpu":
        h, w = 64, 64

    state_cache = {}
    rows = []
    for spec in args.configs:
        b, opt, rm = spec.split(":")
        row = analyze(int(b), h, w, fused=(opt == "flat"),
                      remat=(rm == "remat"), state_cache=state_cache)
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "metric": "train_step_memory_analysis",
        "backend": jax.default_backend(),
        "image_size": [h, w],
        "rows": rows,
    }), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
