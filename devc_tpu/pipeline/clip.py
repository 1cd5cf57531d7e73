"""Clip-level colorization: temporal recurrence as a compiled lax.scan.

The reference loops over frames in Python with a recurrent host round-trip
per frame (test.py:68-120). Here the whole clip is one XLA program:
exemplar features are computed once and carried as constants, frames are a
scanned axis, and the previous frame's prediction is the scan carry — so a
T-frame clip compiles once per (T, H, W) and runs without host sync.

A per-frame jitted step is also provided for streaming (unbounded T /
overlapped host IO).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from devc_tpu.pipeline.frame import frame_colorization, prepare_reference


def colorize_clip(
    params,
    frames_lab,
    ref_lab,
    ref_state=None,
    temperature: float = 1e-10,
    use_pallas: bool | None = None,
):
    """Colorize a whole clip with one scan.

    Args:
      params: {"vgg", "warpnet", "colorvid"} pytree.
      frames_lab: [T, H, W, 3] network-Lab frames (only L is consumed).
      ref_lab: [H, W, 3] exemplar network-Lab.
      ref_state: optional precomputed prepare_reference(params, ref_lab[None])
        (computed here when omitted).
      temperature: correspondence temperature (1e-10 = hard warp, the
        inference default, reference test.py:94).

    Returns:
      pred_ab: [T, H, W, 2] predicted ab per frame.
      similarity: [T, H, W, 1] correspondence confidence per frame.
    """
    ref_lab_b = ref_lab[None]
    if ref_state is None:
        ref_state = prepare_reference(params, ref_lab_b)

    t, h, w, _ = frames_lab.shape
    init_last = jnp.zeros((1, h, w, 3), frames_lab.dtype)

    def step(last_lab, frame_lab):
        pred_ab, _warped, similarity, _ = frame_colorization(
            params,
            frame_lab[None],
            ref_lab_b,
            last_lab,
            ref_state["features"],
            temperature=temperature,
            joint_training=False,
            use_pallas=use_pallas,
            ref_embedding=(ref_state["phi"], ref_state["values"]),
        )
        new_last = jnp.concatenate([frame_lab[None, ..., 0:1], pred_ab], axis=-1)
        return new_last, (pred_ab[0], similarity[0])

    _, (pred_ab, similarity) = jax.lax.scan(step, init_last, frames_lab)
    return pred_ab, similarity


def make_clip_fn(temperature: float = 1e-10, use_pallas: bool | None = None):
    """jit-wrapped colorize_clip with static temperature."""
    return jax.jit(
        functools.partial(
            colorize_clip, temperature=temperature, use_pallas=use_pallas
        )
    )


def make_frame_step(params, temperature: float = 1e-10, use_pallas: bool | None = None):
    """Streaming API: returns (init_fn, step_fn), both jitted.

    init_fn(ref_lab[H,W,3]) -> ref_state (device-resident, reused per frame)
    step_fn(frame_lab[H,W,3], last_lab[1,H,W,3], ref_lab, ref_state)
        -> (pred_ab[1,H,W,2], similarity[1,H,W,1], new_last[1,H,W,3])
    """

    @jax.jit
    def init_fn(ref_lab):
        return prepare_reference(params, ref_lab[None])

    @jax.jit
    def step_fn(frame_lab, last_lab, ref_lab, ref_state):
        pred_ab, _warped, similarity, _ = frame_colorization(
            params,
            frame_lab[None],
            ref_lab[None],
            last_lab,
            ref_state["features"],
            temperature=temperature,
            joint_training=False,
            use_pallas=use_pallas,
            ref_embedding=(ref_state["phi"], ref_state["values"]),
        )
        new_last = jnp.concatenate([frame_lab[None, ..., 0:1], pred_ab], axis=-1)
        return pred_ab, similarity, new_last

    return init_fn, step_fn
