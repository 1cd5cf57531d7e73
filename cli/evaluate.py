"""Evaluate colorization outputs: PSNR / SSIM vs a reference directory,
plus a temporal-stability score.

The reference repo ships golden output frames (sample_videos/output/) but
no way to score against them (SURVEY.md §6: no quantitative evaluation
anywhere). This CLI closes that: point it at two frame directories (ours
vs the reference driver's, or ours vs the shipped goldens once the
pretrained checkpoints are available) and it reports per-frame and mean
PSNR/SSIM; with --flow_dir (the <frame>_forward.flo files of the training
layout) it additionally reports flow-warped temporal RMSE of each
directory on its own.

  python -m cli.evaluate --dir_a out/v32_01 --dir_b sample_videos/output/v32_01
  python -m cli.evaluate --dir_a out/v32_01 --temporal-only

Exits nonzero if --min_psnr / --min_ssim thresholds are given and unmet
(CI-able parity gate).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image


def _load_dir(d, limit=None):
    # numpy-only import: pipeline.video would initialize the pinned
    # single-process TPU backend just to list files (ADVICE r2)
    from devc_tpu.data.transforms import list_clip_frames

    names = list_clip_frames(d)
    if limit:
        names = names[:limit]
    return names, [
        np.asarray(Image.open(os.path.join(d, n)).convert("RGB"))
        for n in names
    ]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dir_a", required=True, help="frames to evaluate")
    ap.add_argument("--dir_b", default=None, help="reference frames")
    ap.add_argument("--flow_dir", default=None,
                    help="dir of <stem>_forward.flo files for warp error")
    ap.add_argument("--limit", type=int, default=None, help="first N frames")
    ap.add_argument("--per_frame", action="store_true")
    ap.add_argument("--temporal-only", action="store_true")
    ap.add_argument("--min_psnr", type=float, default=None)
    ap.add_argument("--min_ssim", type=float, default=None)
    ap.add_argument("--json", action="store_true", help="one JSON line")
    args = ap.parse_args(argv)

    from devc_tpu.utils.metrics import psnr, ssim, temporal_warp_error

    names_a, frames_a = _load_dir(args.dir_a, args.limit)
    if not frames_a:
        raise SystemExit(f"no frames in {args.dir_a}")

    report = {"dir_a": args.dir_a, "frames": len(frames_a)}

    if args.dir_b and not args.temporal_only:
        names_b, frames_b = _load_dir(args.dir_b, args.limit)
        n = min(len(frames_a), len(frames_b))
        if n == 0:
            raise SystemExit(f"no frames in {args.dir_b}")
        ps, ss = [], []
        for i in range(n):
            if frames_a[i].shape != frames_b[i].shape:
                raise SystemExit(
                    f"shape mismatch at {names_a[i]}: "
                    f"{frames_a[i].shape} vs {frames_b[i].shape}"
                )
            ps.append(psnr(frames_a[i], frames_b[i]))
            ss.append(ssim(frames_a[i], frames_b[i]))
            if args.per_frame and not args.json:
                print(f"  {names_a[i]}: psnr {ps[-1]:6.2f} dB  ssim {ss[-1]:.4f}")
        # identical frames give inf PSNR; keep JSON strict-parseable
        fin = lambda v: round(float(v), 3) if np.isfinite(v) else None
        finite = [p for p in ps if np.isfinite(p)]
        report.update(
            dir_b=args.dir_b,
            compared=n,
            psnr_mean=fin(np.mean(finite)) if finite else None,
            psnr_min=fin(np.min(ps)),
            ssim_mean=round(float(np.mean(ss)), 4),
            ssim_min=round(float(np.min(ss)), 4),
            identical_frames=len(ps) - len(finite),
        )

    if len(frames_a) >= 2:
        flows = None
        if args.flow_dir:
            from devc_tpu.data.flow import read_flo

            flows = []
            for n_ in names_a[:-1]:
                stem = os.path.splitext(n_)[0]
                flows.append(
                    read_flo(os.path.join(args.flow_dir, stem + "_forward.flo"))
                )
        report["temporal_rmse"] = round(
            temporal_warp_error(frames_a, flows), 3
        )

    if args.json:
        print(json.dumps(report))
    else:
        for k, v in report.items():
            print(f"{k}: {v}")

    if args.min_psnr is not None:
        pm = report.get("psnr_mean")  # None = every frame identical (inf)
        if "compared" not in report or (pm is not None and pm < args.min_psnr):
            print(f"FAIL: psnr_mean < {args.min_psnr}")
            return 1
    if args.min_ssim is not None:
        if report.get("ssim_mean", -1.0) < args.min_ssim:
            print(f"FAIL: ssim_mean < {args.min_ssim}")
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
