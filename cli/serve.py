"""Colorization service: params loaded once, programs kept warm, jobs
submitted as JSON lines.

  python -m cli.serve --random_init --image_size 432 768 [--platform cpu]

Protocol (stdin -> stdout, one JSON object per line):

  {"clip_path": "...", "ref_path": "...", "output_path": "...",
   "frame_propagate": false, "wls": true,
   "mode": "stream"|"scan", "chunk": 64,
   "device_resize": false,
   "split_embed": null}                            # a job (split_embed:
                                                   # null/absent = auto —
                                                   # on for TPU scan mode)
  {"cmd": "batch", "slots": 4, "device_resize": false,
   "jobs": [{"clip_path": ..., "ref_path": ..., "output_path": ...}, ...]}
                                                   # many clips, batched on
                                                   # device (ClipBatchScheduler);
                                                   # clip_path may be a frame
                                                   # folder or a video file,
                                                   # mixed resolutions OK
  {"cmd": "ping"}                                  # liveness probe
  {"cmd": "shutdown"}                              # drain and exit

Responses:
  {"ok": true, "frames": N, "seconds": S, "fps": F, "outputs": [...]}
  {"ok": true, "results": [...]}                   # batch
  {"ok": false, "error": "..."}

The startup warmup compiles the frame program for the configured size so
the first real job runs at steady-state speed. A long-lived process is the
intended deployment shape on TPU: compiles are minutes, steps are
milliseconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_size", type=int, nargs=2, default=[432, 768],
                   metavar=("H", "W"))
    p.add_argument("--temperature", type=float, default=1e-10)
    p.add_argument("--vgg_ckpt", type=str, default="data/vgg19_conv.pth")
    p.add_argument("--warpnet_ckpt", type=str,
                   default="checkpoints/video_moredata_l1/nonlocal_net_iter_76000.pth")
    p.add_argument("--colornet_ckpt", type=str,
                   default="checkpoints/video_moredata_l1/colornet_iter_76000.pth")
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--train_ckpt", type=str, default=None,
                   help="serve a cli.train checkpoint directory (orbax)")
    p.add_argument("--train_ckpt_step", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_warmup", action="store_true")
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu", "axon"])
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from devc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cli.colorize import build_params
    from devc_tpu.pipeline.video import (
        _device_frame_step,
        _device_ref_features,
        colorize_video,
    )

    args.bf16 = False
    params = build_params(args)
    h, w = args.image_size

    if not args.no_warmup:
        t0 = time.time()
        dummy = jnp.zeros((h, w, 3), jnp.uint8)
        ref_lab_small, ref_state = _device_ref_features(params, dummy)
        last = jnp.zeros((1, h // 2, w // 2, 3), jnp.float32)
        out, _ = _device_frame_step(
            params, dummy, last, ref_lab_small, ref_state,
            temperature=args.temperature, wls=True,
        )
        jax.block_until_ready(out)
        print(json.dumps({"ready": True,
                          "warmup_seconds": round(time.time() - t0, 1)}),
              flush=True)
    else:
        print(json.dumps({"ready": True, "warmup_seconds": 0.0}), flush=True)

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            job = json.loads(line)
        except json.JSONDecodeError as e:
            print(json.dumps({"ok": False, "error": f"bad json: {e}"}),
                  flush=True)
            continue
        if job.get("cmd") == "shutdown":
            print(json.dumps({"ok": True, "bye": True}), flush=True)
            return
        if job.get("cmd") == "ping":
            print(json.dumps({"ok": True, "pong": True}), flush=True)
            continue
        if job.get("cmd") == "batch":
            try:
                from devc_tpu.pipeline.scheduler import ClipBatchScheduler

                t0 = time.time()
                sched = ClipBatchScheduler(
                    params,
                    image_size=(h, w),
                    slots=int(job.get("slots", 4)),
                    temperature=args.temperature,
                    wls=bool(job.get("wls", True)),
                    device_resize=bool(job.get("device_resize", False)),
                )
                for j in job["jobs"]:
                    sched.submit(j["clip_path"], j["ref_path"],
                                 j["output_path"])
                results = sched.run()
                for r in results:
                    if r and "outputs" in r:
                        r["outputs"] = (r["outputs"][:3]
                                        + (["..."] if len(r["outputs"]) > 3
                                           else []))
                print(json.dumps({
                    "ok": True,
                    "seconds": round(time.time() - t0, 2),
                    "results": results,
                }), flush=True)
            except Exception as e:
                print(json.dumps({"ok": False, "error": str(e)}), flush=True)
            continue
        try:
            t0 = time.time()
            written = colorize_video(
                params,
                job["clip_path"],
                job["ref_path"],
                job["output_path"],
                image_size=(h, w),
                temperature=args.temperature,
                wls=bool(job.get("wls", True)),
                frame_propagate=bool(job.get("frame_propagate", False)),
                write_video=bool(job.get("write_video", False)),
                mode=job.get("mode", "stream"),
                chunk=int(job.get("chunk", 64)),
                device_resize=bool(job.get("device_resize", False)),
                split_embed=job.get("split_embed"),  # None -> auto
            )
            dt = time.time() - t0
            print(
                json.dumps({
                    "ok": True,
                    "frames": len(written),
                    "seconds": round(dt, 2),
                    "fps": round(len(written) / dt, 2),
                    "outputs": written[:3] + (["..."] if len(written) > 3 else []),
                }),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"ok": False, "error": str(e)}), flush=True)


if __name__ == "__main__":
    main()
