"""Frozen golden regression: the full frame pipeline (hard-argmax warp +
generator) on fixed inputs/weights must keep producing the same output.

Catches accidental semantic changes to any primitive in the path. The
artifact was generated with host_pipeline_params(seed=0) on CPU; tolerance
is loose enough for compiler/version drift but far tighter than any real
behavior change.
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden_frame.npz")


def test_frame_pipeline_matches_golden():
    from devc_tpu.pipeline.frame import frame_colorization, prepare_reference
    from devc_tpu.utils.init import host_pipeline_params

    data = np.load(_GOLDEN)
    params = jax.tree.map(jnp.asarray, host_pipeline_params(0))
    a_lab = jnp.asarray(data["a_lab"])
    b_lab = jnp.asarray(data["b_lab"])
    last = jnp.zeros_like(a_lab)

    ref_state = jax.jit(prepare_reference)(params, b_lab)
    fn = jax.jit(functools.partial(
        frame_colorization, temperature=1e-10, joint_training=False,
        ref_embedding=(ref_state["phi"], ref_state["values"]),
    ))
    pred_ab, warped, sim, _ = fn(params, a_lab, b_lab, last,
                                 ref_state["features"])

    np.testing.assert_allclose(np.asarray(sim), data["sim"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(warped), data["warped"], atol=5e-2)
    np.testing.assert_allclose(np.asarray(pred_ab), data["pred_ab"], atol=5e-2)
