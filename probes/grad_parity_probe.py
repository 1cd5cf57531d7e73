"""On-chip gradient parity: Pallas flash-VJP vs einsum autodiff.

VERDICT r4 weak #5: the Pallas correspondence kernel's custom VJP
(ops/pallas_corr.py, flash-attention-style backward) was only ever
numerically checked in interpret mode on CPU (tests/test_pallas_grad.py),
which does not exercise the real Mosaic lowering — yet cli.train enables
it for every TPU run. This probe closes that gap on the real chip at
training temperature and shapes:

  A. Op-level: gradients of a generic scalar functional
     L = <w_out, out> + <w_sim, sim> of correspondence_warp(theta, phi,
     values) wrt all three inputs, Pallas custom-VJP vs einsum autodiff,
     at the training config (T=0.01, N=5184 = 54x96 from 216x384 frames,
     C=256 embeddings, V=3 Lab payload). Reports max abs and rel
     deviations (fetched as scalars — nothing bulk crosses the relay).

  B. Step-level: one full train_step (all 8 losses, two-frame unroll,
     remat) from identical state/batch/key with cfg.use_pallas True vs
     False; reports per-loss metric deviations and the max abs deviation
     across every updated generator parameter. This is the integration
     statement: the kernel's backward feeding the real optimizer produces
     the same step as the einsum oracle.

Reference for semantics: models/NonlocalNet.py:477-500 (correspondence),
:288-327 (WTA backward — unused at the default wta=1.0 training config).

Usage: python probes/grad_parity_probe.py [--platform cpu] [--skip-step]
Prints one JSON line. Exit 1 if deviations exceed loose sanity bounds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _maxdev(a, b):
    import jax.numpy as jnp

    d = jnp.max(jnp.abs(a - b))
    scale = jnp.max(jnp.abs(b)) + 1e-12
    return d, d / scale


def op_level(b, nq, c, v, temperature, interpret=False):
    import jax
    import jax.numpy as jnp

    from devc_tpu.ops.correspondence import correspondence_warp_einsum
    from devc_tpu.ops.pallas_corr import correspondence_warp_pallas

    rng = np.random.RandomState(0)

    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    theta = jnp.asarray(unit(rng.randn(b, nq, c)).astype(np.float32))
    phi = jnp.asarray(unit(rng.randn(b, nq, c)).astype(np.float32))
    values = jnp.asarray(rng.uniform(-50, 50, (b, nq, v)).astype(np.float32))
    w_out = jnp.asarray(rng.randn(b, nq, v).astype(np.float32))
    w_sim = jnp.asarray(rng.randn(b, nq, 1).astype(np.float32))

    def loss(th, ph, va, use_pallas):
        if use_pallas:
            out, sim = correspondence_warp_pallas(
                th, ph, va, temperature=temperature,
                differentiable=True, interpret=interpret,
            )
        else:
            out, sim = correspondence_warp_einsum(
                th, ph, va, temperature=temperature,
            )
        return jnp.vdot(w_out, out) + jnp.vdot(w_sim, sim)

    g_pallas = jax.jit(jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2)))
    g_einsum = jax.jit(jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2)))

    gp = g_pallas(theta, phi, values)
    ge = g_einsum(theta, phi, values)
    report = {}
    for name, p, e in zip(("dtheta", "dphi", "dvalues"), gp, ge):
        absdev, reldev = _maxdev(p, e)
        report[name] = {"max_abs": float(absdev), "max_rel": float(reldev),
                        "ref_max": float(np.abs(np.asarray(e)).max())}
    return report


def step_level(batch_size, h, w):
    import jax

    from __graft_entry__ import _make_params
    from bench_train import _make_batch
    from devc_tpu.train.loop import TrainConfig, train_step
    from devc_tpu.train.state import create_train_state

    import functools

    state, tx_g, tx_d = create_train_state(jax.random.PRNGKey(0),
                                           use_schedule=True)
    vgg_params = _make_params(jax.random.PRNGKey(1))["vgg"]
    rng = np.random.RandomState(1)
    batch = _make_batch(rng, batch_size, h, w)
    key = jax.random.PRNGKey(7)

    outs = {}
    for tag, use_pallas in (("pallas", True), ("einsum", False)):
        cfg = TrainConfig(use_pallas=use_pallas)
        fn = jax.jit(functools.partial(train_step, tx_g=tx_g, tx_d=tx_d,
                                       vgg_params=vgg_params, cfg=cfg))
        new_state, metrics = fn(state, batch, key)
        # fetch only scalars + a checksum basis: per-leaf max|delta| of the
        # G params is reduced on device, one scalar crosses the relay
        delta = jax.jit(
            lambda ns, s: jax.tree.reduce(
                jax.numpy.maximum,
                jax.tree.map(
                    lambda a, b: jax.numpy.max(jax.numpy.abs(a - b)),
                    ns.params_g, s.params_g,
                ),
            )
        )(new_state, state)
        outs[tag] = {
            "metrics": {k: float(v) for k, v in metrics.items()},
            "update_mag": float(delta),
            "params": new_state.params_g,
        }
        del new_state

    import jax.numpy as jnp

    pdev = jax.jit(
        lambda a, b: jax.tree.reduce(
            jnp.maximum,
            jax.tree.map(lambda x, y: jnp.max(jnp.abs(x - y)), a, b),
        )
    )(outs["pallas"]["params"], outs["einsum"]["params"])
    metric_devs = {
        k: abs(outs["pallas"]["metrics"][k] - outs["einsum"]["metrics"][k])
        for k in outs["pallas"]["metrics"]
    }
    return {
        "max_param_dev": float(pdev),
        "update_mag_pallas": outs["pallas"]["update_mag"],
        "update_mag_einsum": outs["einsum"]["update_mag"],
        "metrics_pallas": outs["pallas"]["metrics"],
        "metric_abs_devs": metric_devs,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--image-size", type=int, nargs=2, default=(216, 384))
    ap.add_argument("--skip-step", action="store_true")
    ap.add_argument("--skip-op", action="store_true")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from devc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    on_tpu = jax.default_backend() == "tpu"
    h, w = args.image_size
    if not on_tpu:
        h, w = 64, 64
        args.batch = min(args.batch, 2)

    rec = {"metric": "pallas_vjp_grad_parity", "backend": jax.default_backend(),
           "temperature": 0.01}
    ok = True
    if not args.skip_op:
        nq = (h // 4) * (w // 4)
        rec["op"] = op_level(args.batch, nq, 256, 3, temperature=0.01,
                             interpret=not on_tpu)
        # sanity bounds: cosine scores are O(1), grads O(|values| * w); rel
        # deviation past 1e-2 would mean a broken backward, not fp reorder
        ok &= all(v["max_rel"] < 1e-2 for v in rec["op"].values())
    if not args.skip_step:
        if on_tpu:
            rec["step"] = step_level(args.batch, h, w)
            ok &= all(np.isfinite(v) for v in
                      rec["step"]["metric_abs_devs"].values())
        else:
            rec["step"] = "skipped (pallas train step needs the chip; the "
            rec["step"] += "interpret-mode op check above ran instead)"
    rec["ok"] = bool(ok)
    print(json.dumps(rec), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    import sys

    sys.exit(main())
