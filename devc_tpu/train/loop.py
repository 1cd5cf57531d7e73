"""The jitted training step + host loop (reference train.py:535-736).

One step:
  1. exemplar VGG features (frozen extractor)
  2. two-frame unroll: colorize frame1 with the placeholder as the previous
     prediction, then frame2 conditioned on frame1's prediction
     (reference video_colorization, train.py:400-428)
  3. critic update (RaLSGAN on [current Lab, last Lab] 6-channel pairs,
     real batch rolled by one to decorrelate, reference :578-601)
  4. generator update: weighted L1 + GAN + perceptual + contextual +
     smoothness + temporal-consistency (reference :603-730)

The whole step is one XLA program; under a mesh the batch axis is sharded
over "data" and XLA inserts the gradient psums (the reference's
DataParallel scatter/gather, done properly).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from devc_tpu import colorspace as cs
from devc_tpu.models.discriminator import discriminator_apply
from devc_tpu.models.vgg19 import vgg19_extract
from devc_tpu.pipeline.frame import FEATURE_TAPS, frame_colorization
from devc_tpu.train import losses as L
from devc_tpu.train.state import TrainState


class TrainConfig(NamedTuple):
    weight_l1: float = 2.0
    weight_gan: float = 0.2
    weight_perceptual: float = 0.001
    weight_contextual: float = 0.2
    weight_smoothness: float = 5.0
    weight_nonlocal_smoothness: float = 0.0
    weight_consistent: float = 0.02
    weight_nonlocal_consistent: float = 0.0
    luminance_noise: float = 2.0
    temperature: float = 0.01
    permute_data: bool = True
    domain_invariant: bool = False
    contextual_direction: str = "forward"
    use_pallas: bool = False
    remat: bool = True  # recompute forwards in backward (fits batch 16/chip)
    scan_unroll: bool = False  # two-frame unroll as lax.scan (see below)


def _vgg_feats(vgg_params, lab):
    rgb = cs.lab_centered_to_rgb(lab)
    return tuple(
        jax.lax.stop_gradient(f)
        for f in vgg19_extract(vgg_params, rgb, FEATURE_TAPS)
    )


def _two_frame_unroll(params, batch, features_b, key, cfg: TrainConfig):
    """reference train.py:400-428.

    cfg.scan_unroll chooses how the two-frame recurrence is traced:

    * False (default): both frames inlined, like the reference's Python
      unroll. Bigger program (the whole per-frame pipeline appears twice,
      forward and backward), but XLA:CPU executes it at full speed —
      required for the test suite and the virtual-device gate.
    * True: a length-2 lax.scan with carry = the previous frame's
      predicted Lab. The pipeline is traced ONCE, cutting XLA *compile*
      time of the full train step ~20x (measured on the 1-core CPU gate
      host: 1443 s -> 72 s) — useful against the TPU relay's minutes-long
      remote compiles. Metrics are bitwise-identical to the unrolled form
      (verified), but do NOT use it on the CPU backend: XLA:CPU executes
      the scan-body convs ~100x slower (measured: one 32x32 batch-8 step
      1384 s vs seconds unrolled).
    """
    keys = jax.random.split(key)  # [2] keys: frame 1, frame 2

    def fc(params, a_lab, last_lab, noise_key):
        pred_ab, warped, _sim, _feats = frame_colorization(
            params,
            a_lab,
            batch["ref_lab"],
            last_lab,
            features_b,
            temperature=cfg.temperature,
            luminance_noise=cfg.luminance_noise,
            noise_key=noise_key,
            joint_training=True,
            use_pallas=cfg.use_pallas,
        )
        return pred_ab, warped

    if cfg.remat:
        # recompute each frame's forward during the backward pass instead of
        # keeping VGG/WarpNet/ColorVidNet activations for two full frames
        fc = jax.checkpoint(fc)

    if cfg.scan_unroll:
        def step(prev_lab, frame):
            a_lab, noise_key = frame
            pred_ab, warped = fc(params, a_lab, prev_lab, noise_key)
            next_lab = jnp.concatenate([a_lab[..., 0:1], pred_ab], axis=-1)
            return next_lab, (pred_ab, warped)

        frames = jnp.stack([batch["last_lab"], batch["current_lab"]])
        _, (pred_abs, nonlocals) = jax.lax.scan(
            step, batch["placeholder_lab"], (frames, keys)
        )
        return pred_abs[1], pred_abs[0], nonlocals[1], nonlocals[0]

    last_ab, last_nonlocal = fc(
        params, batch["last_lab"], batch["placeholder_lab"], keys[0]
    )
    last_lab_pred = jnp.concatenate(
        [batch["last_lab"][..., 0:1], last_ab], axis=-1
    )
    cur_ab, cur_nonlocal = fc(
        params, batch["current_lab"], last_lab_pred, keys[1]
    )
    return cur_ab, last_ab, cur_nonlocal, last_nonlocal


def _global_roll1(x, axis_name):
    """jnp.roll(x, 1, axis=0) over the GLOBAL batch when the batch axis is
    sharded inside shard_map: roll locally after receiving the previous
    device's last element via ppermute (one ICI hop, exactly the
    reference's whole-batch roll semantics)."""
    n = jax.lax.axis_size(axis_name)
    prev_last = jax.lax.ppermute(
        x[-1:], axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    return jnp.concatenate([prev_last, x[:-1]], axis=0)


def _gan_pairs(batch, cur_ab, last_ab, permute: bool, axis_name=None):
    """6-channel (current, last) Lab pairs with uncentered L
    (reference train.py:582-589)."""
    cur_l = cs.uncenter_l(batch["current_lab"][..., 0:1])
    last_l = cs.uncenter_l(batch["last_lab"][..., 0:1])
    fake = jnp.concatenate([cur_l, cur_ab, last_l, last_ab], axis=-1)
    real = jnp.concatenate(
        [cur_l, batch["current_lab"][..., 1:3], last_l, batch["last_lab"][..., 1:3]],
        axis=-1,
    )
    if permute:
        if axis_name is not None:
            real = _global_roll1(real, axis_name)
        else:
            real = jnp.roll(real, shift=1, axis=0)
    return fake, real


def _pmean_bucketed(tree, axis_name):
    """ONE all-reduce for a whole pytree: flatten every leaf into a single
    fp32 vector, pmean it, unflatten.

    GSPMD emits one all-reduce per gradient tensor (~340 for this model);
    on real ICI those small latency-bound collectives waste the link, and
    on the virtual-device CPU gate each one costs a full 8-thread
    rendezvous on one core (minutes in aggregate). Bucketing is the
    standard DDP/TPU answer: a single bandwidth-bound collective.
    """
    leaves, treedef = jax.tree.flatten(tree)
    flat = jnp.concatenate([l.reshape(-1).astype(jnp.float32) for l in leaves])
    flat = jax.lax.pmean(flat, axis_name)
    out, off = [], 0
    for l in leaves:
        out.append(flat[off:off + l.size].reshape(l.shape).astype(l.dtype))
        off += l.size
    return jax.tree.unflatten(treedef, out)


def train_step(
    state: TrainState,
    batch,
    key,
    tx_g,
    tx_d,
    vgg_params,
    cfg: TrainConfig = TrainConfig(),
    axis_name: str | None = None,
):
    """One optimization step. batch is a dict of NHWC arrays:
    last_lab, current_lab, ref_lab [B,H,W,3]; flow_forward [B,H,W,2];
    mask [B,H,W,1]; placeholder_lab [B,H,W,3]; self_ref_flag [B,1].
    Returns (new_state, metrics dict).

    axis_name=None (default): single-program semantics; under jit with a
    sharded batch, GSPMD inserts the cross-device reductions.
    axis_name="data": explicit-SPMD semantics for running INSIDE shard_map
    (see make_train_step_spmd) — batch-coupled reductions (the real-pair
    roll, the self-ref flag normalization, the relativistic-average inner
    means) become explicit collectives, and the D/G gradient trees are
    each synchronized with ONE bucketed pmean.
    """
    params_full = lambda pg: {"vgg": vgg_params, **pg}

    features_b = _vgg_feats(vgg_params, batch["ref_lab"])

    key, k_unroll = jax.random.split(key)
    if axis_name is not None:
        # per-shard noise independence (GSPMD generates one global noise
        # tensor; inside shard_map each device must fold in its coordinate)
        k_unroll = jax.random.fold_in(k_unroll, jax.lax.axis_index(axis_name))

    # ONE forward through the two-frame unroll, VJP captured: the primals
    # feed the critic step (detached) and the generator loss; the G backward
    # pulls the loss cotangents back through this same forward instead of
    # re-running it (reference train.py:560-636 shares one forward between
    # the D and G updates the same way). With cfg.remat the per-frame
    # forwards are still recomputed inside the backward, so peak memory is
    # unchanged; total compute drops by one full unroll forward.
    def unroll_fn(params_g):
        return _two_frame_unroll(
            params_full(params_g), batch, features_b, k_unroll, cfg
        )

    unroll_outs, unroll_vjp = jax.vjp(unroll_fn, state.params_g)
    cur_ab, last_ab, _cur_nl, _last_nl = unroll_outs
    fake, real = _gan_pairs(batch, cur_ab, last_ab, cfg.permute_data, axis_name)

    # ---- critic update (fake detached, reference :591-601) ----
    def d_loss_fn(params_d, sn):
        fl, _, sn1 = discriminator_apply(params_d, sn, jax.lax.stop_gradient(fake))
        rl, _, sn2 = discriminator_apply(params_d, sn1, real)
        return L.ralsgan_d_loss(rl, fl, axis_name), sn2

    if cfg.weight_gan > 0:
        (d_loss, sn_after), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.params_d, state.sn_state
        )
        if axis_name is not None:
            d_grads = _pmean_bucketed(d_grads, axis_name)
        d_updates, opt_state_d = tx_d.update(d_grads, state.opt_state_d,
                                             state.params_d)
        params_d = jax.tree.map(lambda p, u: p + u, state.params_d, d_updates)
    else:
        d_loss = jnp.zeros(())
        sn_after = state.sn_state
        opt_state_d = state.opt_state_d
        params_d = state.params_d

    # ---- generator update (loss over the unroll OUTPUTS; grads chain back
    # through unroll_vjp) ----
    def g_loss_fn(outs, sn):
        cur_ab, last_ab, cur_nl, last_nl = outs
        cur_lab_pred = jnp.concatenate(
            [batch["current_lab"][..., 0:1], cur_ab], axis=-1
        )

        # the prediction/GT VGG towers only exist for the perceptual and
        # contextual terms; skip them entirely when both weights are 0
        # (XLA cannot fold `x * 0.0` away under strict-NaN semantics, so a
        # python-level gate is what actually removes the compute)
        need_vgg = cfg.weight_perceptual > 0 or cfg.weight_contextual > 0
        if need_vgg:
            grad_vgg = (
                jax.checkpoint(_grad_vgg_feats) if cfg.remat else _grad_vgg_feats
            )
            pred_feats = grad_vgg(vgg_params, cur_lab_pred)
        if cfg.weight_perceptual > 0:
            gt_feats = _vgg_feats(vgg_params, batch["current_lab"])

        metrics = {}
        total = jnp.zeros(())

        # weighted L1 (self-reference samples only, reference :621-623);
        # the normalizer is the GLOBAL batch's self-ref count
        flag = batch["self_ref_flag"]  # [B, 1], 1.0 = self-reference
        flag_sum = jnp.sum(flag[:, 0])
        if axis_name is not None:
            flag_sum = jax.lax.psum(flag_sum, axis_name)
        w = flag[:, :, None, None] / (flag_sum + 1e-5)
        l1_loss = L.weighted_l1(cur_ab, batch["current_lab"][..., 1:3], w)
        l1_loss = l1_loss * cfg.weight_l1
        total += l1_loss
        metrics["l1_loss"] = l1_loss

        # GAN generator term against the *updated* critic (reference order)
        if cfg.weight_gan > 0:
            fake2, real2 = _gan_pairs(batch, cur_ab, last_ab,
                                      cfg.permute_data, axis_name)
            fl, _, sn1 = discriminator_apply(params_d, sn, fake2)
            rl, _, _sn2 = discriminator_apply(params_d, sn1, real2)
            g_gan = L.ralsgan_g_loss(rl, fl, axis_name) * cfg.weight_gan
        else:
            g_gan = jnp.zeros(())
        total += g_gan
        metrics["generator_loss"] = g_gan

        # perceptual on the deepest tap (reference :638-647)
        if cfg.weight_perceptual > 0:
            feat = L.perceptual_loss(pred_feats[4], gt_feats[4],
                                     cfg.domain_invariant)
            feat = feat * cfg.weight_perceptual * (
                1e5 * 0.2 if cfg.domain_invariant else 1.0
            )
        else:
            feat = jnp.zeros(())
        total += feat
        metrics["feat_loss"] = feat

        # contextual vs exemplar features (reference :649-668)
        if cfg.weight_contextual > 0:
            ctx = L.contextual_loss_multiscale(
                (pred_feats[2], pred_feats[3], pred_feats[4]),
                (features_b[2], features_b[3], features_b[4]),
                direction=cfg.contextual_direction,
            ) * cfg.weight_contextual
        else:
            ctx = jnp.zeros(())
        total += ctx
        metrics["contextual_loss_total"] = ctx

        # smoothness (reference :670-680)
        if cfg.weight_smoothness > 0:
            smooth = (
                L.smoothness_loss(batch["current_lab"], cur_ab, alpha=10.0)
                * cfg.weight_smoothness
            )
        else:
            smooth = jnp.zeros(())
        total += smooth
        metrics["smoothness_loss"] = smooth

        if cfg.weight_nonlocal_smoothness > 0:
            nl_smooth = (
                L.nonlocal_smoothness_loss(cur_lab_pred, pred_feats[1])
                * cfg.weight_nonlocal_smoothness
            )
        else:
            nl_smooth = jnp.zeros(())
        total += nl_smooth
        metrics["nonlocal_smoothness_loss"] = nl_smooth

        # temporal consistency (reference :702-707)
        if cfg.weight_consistent > 0:
            cons = (
                L.consistency_loss(
                    cur_lab_pred, last_ab, batch["flow_forward"], batch["mask"]
                )
                * cfg.weight_consistent
            )
        else:
            cons = jnp.zeros(())
        total += cons
        metrics["consistent_loss"] = cons

        if cfg.weight_nonlocal_consistent > 0:
            nl_cons = (
                L.consistency_loss(
                    cur_nl, last_nl[..., 1:3], batch["flow_forward"], batch["mask"]
                )
                * cfg.weight_nonlocal_consistent
            )
        else:
            nl_cons = jnp.zeros(())
        total += nl_cons
        metrics["nonlocal_consistent_loss"] = nl_cons

        metrics["total_loss"] = total
        return total, metrics

    (g_total, metrics), out_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
        unroll_outs, sn_after
    )
    (g_grads,) = unroll_vjp(out_grads)
    if axis_name is not None:
        g_grads = _pmean_bucketed(g_grads, axis_name)
    g_updates, opt_state_g = tx_g.update(g_grads, state.opt_state_g,
                                         state.params_g)
    params_g = jax.tree.map(lambda p, u: p + u, state.params_g, g_updates)

    metrics["discriminator_loss"] = d_loss
    if axis_name is not None:
        # report GLOBAL metrics (mean-type losses: mean of shard means ==
        # global mean for equal shard sizes) — one bucketed collective
        metrics = _pmean_bucketed(metrics, axis_name)
    new_state = TrainState(
        step=state.step + 1,
        params_g=params_g,
        params_d=params_d,
        sn_state=sn_after,
        opt_state_g=opt_state_g,
        opt_state_d=opt_state_d,
    )
    return new_state, metrics


def preprocess_batch_u8(batch_u8):
    """uint8 loader batch -> the float batch train_step consumes, on device.

    The host float path converts three images per sample to Lab in float64
    (skimage math, ~16 ms each on a 1-core host) and ships ~5.6 MB/sample
    of float32; with device_preprocess the loader ships uint8 RGB + fp16
    flows (~1.5 MB/sample) and this function — fused into the train step's
    XLA program — does Lab conversion (devc_tpu.colorspace, parity-tested
    vs the host path), the reference's single-offset brightness jitter
    (videoloader_imagenet.py:226) and the placeholder select.
    """
    def lab(u8):
        return cs.center_lab(cs.rgb_to_lab(u8.astype(jnp.float32) / 255.0))

    last = lab(batch_u8["last_rgb"])
    cur = lab(batch_u8["current_rgb"])
    jit_l = batch_u8["jitter"][:, :, None, None]  # [B,1] -> [B,1,1,1]
    cur = jnp.concatenate([cur[..., 0:1] + jit_l, cur[..., 1:3]], axis=-1)
    ph = batch_u8["placeholder_flag"][:, :, None, None]
    return dict(
        last_lab=last,
        current_lab=cur,
        ref_lab=lab(batch_u8["ref_rgb"]),
        flow_forward=batch_u8["flow_forward"].astype(jnp.float32),
        flow_backward=batch_u8["flow_backward"].astype(jnp.float32),
        mask=batch_u8["mask"].astype(jnp.float32),
        placeholder_lab=jnp.where(ph > 0, cur, 0.0),
        self_ref_flag=batch_u8["self_ref_flag"],
    )


def train_step_u8(state, batch_u8, key, tx_g, tx_d, vgg_params,
                  cfg: TrainConfig = TrainConfig(),
                  axis_name: str | None = None):
    """train_step with the uint8 loader contract: one XLA program doing
    preprocess_batch_u8 + the full GAN step."""
    return train_step(state, preprocess_batch_u8(batch_u8), key,
                      tx_g, tx_d, vgg_params, cfg, axis_name=axis_name)


def _grad_vgg_feats(vgg_params, lab):
    """VGG features of the prediction — gradients DO flow (frozen weights,
    live input), unlike _vgg_feats."""
    rgb = cs.lab_centered_to_rgb(lab)
    return tuple(vgg19_extract(vgg_params, rgb, FEATURE_TAPS))


def make_train_step(tx_g, tx_d, vgg_params, cfg: TrainConfig = TrainConfig(),
                    donate: bool = True, device_preprocess: bool = False):
    """jit-compiled train step closure (uint8-batch contract when
    device_preprocess)."""
    step = train_step_u8 if device_preprocess else train_step
    fn = functools.partial(step, tx_g=tx_g, tx_d=tx_d,
                           vgg_params=vgg_params, cfg=cfg)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_train_step_spmd(mesh, tx_g, tx_d, vgg_params,
                         cfg: TrainConfig = TrainConfig(),
                         axis: str = "data", donate: bool = True,
                         device_preprocess: bool = False):
    """Explicit-SPMD data-parallel train step over `mesh` via shard_map.

    Same step semantics as make_train_step with a mesh-sharded batch, but
    the cross-device reductions are explicit and BUCKETED: one pmean for
    the whole G gradient tree, one for D, one for the metrics, a ppermute
    for the real-pair roll, plus the three small in-graph collectives the
    batch-coupled losses need (self-ref flag count, RaLSGAN inner means).
    GSPMD instead emits one all-reduce per gradient tensor (~340): on real
    ICI those are latency-bound; bucketing them is the standard
    data-parallel answer (DDP gradient bucketing) and makes the
    virtual-device gate executable in seconds instead of minutes.

    state and key must be replicated; every batch leaf is sharded on its
    leading axis over `axis`. Returns a jitted (state, batch, key) ->
    (state, metrics) callable.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    base = train_step_u8 if device_preprocess else train_step

    def step(state, batch, key):
        return base(state, batch, key, tx_g=tx_g, tx_d=tx_d,
                    vgg_params=vgg_params, cfg=cfg, axis_name=axis)

    smapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(0,) if donate else ())
