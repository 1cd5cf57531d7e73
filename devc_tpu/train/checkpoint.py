"""Checkpoint / resume via orbax (reference train.py:174-226, 322-333).

The reference snapshots per-net state_dicts for deployment plus a
monolithic learning_checkpoint.pth (iter, epoch, nets, optimizers,
schedulers). Here the whole TrainState is one pytree, saved atomically by
orbax with retention; schedules are pure functions of `step` so they need
no extra state. Deployment params are the params_g subtree of any step.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from devc_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 2000):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, step: int, state: TrainState, force: bool = False) -> bool:
        saved = self._mgr.save(
            step,
            args=ocp.args.StandardSave(state._asdict()),
            force=force,
        )
        return bool(saved)

    def restore(self, state_like: TrainState, step: int | None = None) -> TrainState:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(state_like._asdict())
            )
        except (ValueError, KeyError, TypeError):
            # Legacy checkpoint whose optimizer-state pytree layout differs
            # from the current template (e.g. per-leaf optax moments written
            # before the flat fused Adam became the default). Fall back to
            # restoring params/sn/step only, keeping state_like's FRESH
            # optimizer state — the behavior flat_opt.py documents.
            raw = self._mgr.restore(step)
            restored = state_like._asdict()
            import jax

            for k in ("step", "params_g", "params_d", "sn_state"):
                if (jax.tree.structure(raw[k])
                        != jax.tree.structure(restored[k])):
                    raise  # not an optimizer-layout skew; don't mask it
                restored[k] = raw[k]
            print(
                f"checkpoint step {step}: optimizer-state layout differs "
                f"from the current optimizer (legacy per-leaf vs flat "
                f"fused Adam); restored params/step with FRESH optimizer "
                f"moments. Pass make_optimizers(fused=False) to resume "
                f"moments of a legacy run exactly."
            )
        return TrainState(**restored)

    def latest_step(self):
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def load_train_state_dict(directory: str, step: int | None = None):
    """Raw restored state dict + resolved step from a cli.train checkpoint
    directory, without a template (host numpy leaves). Shared by the
    deployment loaders below and cli.export."""
    directory = os.path.abspath(directory)
    mgr = ocp.CheckpointManager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    restored = mgr.restore(step)
    mgr.close()
    return restored, step


def load_train_params_g(directory: str, step: int | None = None) -> Any:
    """Generator params ({"warpnet", "colorvid"}) from a cli.train
    checkpoint directory — the deployment artifact (reference per-net
    state_dict snapshots, train.py:174-195). No template or optimizer
    state needed; use for inference from a trained checkpoint
    (cli.colorize --train_ckpt)."""
    restored, _ = load_train_state_dict(directory, step)
    return restored["params_g"]


def save_run_metadata(directory: str, meta: dict) -> None:
    """Side-band run metadata (e.g. which VGG weights the run used) next to
    the orbax steps. Inference reads this to refuse silently mismatched
    feature extractors (ADVICE r2: a trained ckpt + the random-VGG fallback
    produces wrong colorizations with no hard failure)."""
    import json

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "run_metadata.json"), "w") as f:
        json.dump(meta, f, indent=1)


def load_run_metadata(directory: str) -> dict | None:
    import json

    path = os.path.join(os.path.abspath(directory), "run_metadata.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def save_params(path: str, params: Any) -> None:
    """One-shot param snapshot (deployment artifact)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_params(path: str, params_like: Any = None) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if params_like is not None:
        return ckptr.restore(path, params_like)
    return ckptr.restore(path)
