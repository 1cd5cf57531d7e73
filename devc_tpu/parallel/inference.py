"""Data-parallel batched inference: B independent clips per step.

The reference processes one clip at a time on one GPU (test.py:68-120).
On a TPU slice the natural scale-out for inference is clip-level data
parallelism: each step advances B clips by one frame, with the batch axis
sharded over the mesh's "data" axis (BASELINE.json config 5). All model
ops are batch-aware, so this is the single-frame device program of
pipeline/video.py::_frame_body generalized to a leading clip axis; XLA
partitions it over the mesh from the input shardings alone (no collectives
are needed — clips are independent).

Optionally composes with the model-parallel correspondence
(parallel/sharded_corr.py) through frame_colorization's corr_sharding for
resolutions where one chip's HBM or FLOPs can't hold the N x N
correspondence of its clip shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from devc_tpu import colorspace as cs
from devc_tpu.ops.fgs import fast_global_smoother
from devc_tpu.ops.resize import resize_bilinear
from devc_tpu.pipeline.frame import frame_colorization, prepare_reference


def prepare_references_batched(params, refs_rgb_u8):
    """Exemplar prep for B clips: [B, H, W, 3] uint8 -> (lab_small, state)."""
    rgb = refs_rgb_u8.astype(jnp.float32) / 255.0
    lab_large = cs.center_lab(cs.rgb_to_lab(rgb))
    h, w = refs_rgb_u8.shape[1], refs_rgb_u8.shape[2]
    lab_small = resize_bilinear(lab_large, (h // 2, w // 2))
    return lab_small, prepare_reference(params, lab_small)


def batched_frame_step(
    params,
    frames_u8,  # [B, H, W, 3] uint8 — one frame from each of B clips
    last_lab,   # [B, h, w, 3]
    ref_state,  # batched over B (prepare_references_batched)
    temperature: float = 1e-10,
    wls: bool = True,
    lambda_value: float = 500.0,
    sigma_color: float = 4.0,
    use_pallas: bool | None = None,
    corr_sharding=None,
    resize_plans=None,
):
    """Advance B clips one frame. Returns (rgb_u8 [B,H,W,3], new_last).

    Shard `frames_u8` / `last_lab` / `ref_state` over a mesh's "data" axis
    (jax.device_put with NamedSharding) and jit — XLA runs each clip shard
    on its own chips.

    resize_plans: optional (A_h [B, th, maxH], A_w [B, tw, maxW]) per-slot
    CenterPad plans (ops/device_resize.py::centerpad_plan_padded) — then
    frames_u8 is RAW [B, maxH, maxW, 3] (each slot's source zero-padded to
    the common max) and the anti-aliased resize runs on device, one batched
    MXU matmul pair, so mixed-resolution jobs share one compiled program.
    """
    if resize_plans is not None:
        from devc_tpu.ops.device_resize import device_centerpad_batched

        frames_u8 = device_centerpad_batched(frames_u8, *resize_plans)
    rgb = frames_u8.astype(jnp.float32) / 255.0
    lab_large = cs.center_lab(cs.rgb_to_lab(rgb))
    h, w = frames_u8.shape[1], frames_u8.shape[2]
    lab_small = resize_bilinear(lab_large, (h // 2, w // 2))

    pred_ab, _warped, _sim, _ = frame_colorization(
        params,
        lab_small,
        None,
        last_lab,
        ref_state["features"],
        temperature=temperature,
        joint_training=False,
        use_pallas=use_pallas,
        ref_embedding=(ref_state["phi"], ref_state["values"]),
        corr_sharding=corr_sharding,
    )
    new_last = jnp.concatenate([lab_small[..., 0:1], pred_ab], axis=-1)

    ab_up = resize_bilinear(pred_ab, (h, w)) * 1.25
    l_large = lab_large[..., 0:1]
    if wls:
        guides = jnp.clip(
            jnp.floor(cs.uncenter_l(l_large[..., 0]) * 255.0 / 100.0),
            0.0, 255.0,
        )
        ab_up = jax.vmap(
            lambda x, g: fast_global_smoother(
                x, g, lam=lambda_value, sigma_color=sigma_color
            )
        )(ab_up, guides)
    out_lab = jnp.concatenate([l_large, ab_up], axis=-1)
    rgb_out = cs.lab_centered_to_rgb(out_lab)
    return (
        jnp.floor(jnp.clip(rgb_out, 0.0, 1.0) * 255.0).astype(jnp.uint8),
        new_last,
    )
