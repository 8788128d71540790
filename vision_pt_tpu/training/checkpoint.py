"""Full train-state checkpoint/restore via orbax.

A deliberate improvement over the reference, which only ever saves weights —
optimizer state, step count and RNG are never persisted (SURVEY §5), so
preempted multi-chip runs can't resume. Here the complete state
(params + optimizer + EMA + step/epoch + data order + host RNG) round-trips.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import nnx


class TrainStateCheckpointer:
    def __init__(self, save_dir: str, keep: int = 2):
        self.save_dir = Path(save_dir).resolve()
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            str(self.save_dir),
            options=ocp.CheckpointManagerOptions(max_to_keep=keep),
        )

    def save(
        self,
        step: int,
        trainable: nnx.Module,
        optimizer: nnx.Optimizer,
        ema_state=None,
        metadata: dict | None = None,
        block: bool = True,
    ) -> None:
        """block=False returns as soon as the device arrays are snapshotted
        and commits in the background (orbax atomic rename — an interrupted
        async save never leaves a corrupt step dir); training overlaps the
        serialization. Call ``wait()`` (or save with block=True, e.g. the
        preemption save) before relying on the file being on disk."""
        # orbax requires the previous async save to finish before a new one
        self.manager.wait_until_finished()
        if step in (self.manager.all_steps() or ()):
            # idempotent: a preemption save can land on a step the periodic
            # save just wrote (orbax raises StepAlreadyExistsError otherwise)
            return
        params = nnx.state(trainable)
        opt_state = nnx.state(optimizer)
        payload = {
            "params": ocp.args.StandardSave(nnx.to_pure_dict(params)),
            "opt_state": ocp.args.StandardSave(nnx.to_pure_dict(opt_state)),
        }
        if ema_state is not None:
            payload["ema"] = ocp.args.StandardSave(nnx.to_pure_dict(ema_state))
        if metadata:
            payload["metadata"] = ocp.args.JsonSave(metadata)
        self.manager.save(step, args=ocp.args.Composite(**payload))
        if block:
            self.manager.wait_until_finished()

    def wait(self) -> None:
        """Block until any in-flight async save has committed."""
        self.manager.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(
        self,
        trainable: nnx.Module,
        optimizer: nnx.Optimizer,
        ema_state=None,
        step: int | None = None,
    ) -> dict:
        """Restore in place; returns the metadata dict (may be empty)."""
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.save_dir}")

        params = nnx.state(trainable)
        opt_state = nnx.state(optimizer)
        targets = {
            "params": ocp.args.StandardRestore(nnx.to_pure_dict(params)),
            "opt_state": ocp.args.StandardRestore(nnx.to_pure_dict(opt_state)),
        }
        if ema_state is not None:
            targets["ema"] = ocp.args.StandardRestore(
                nnx.to_pure_dict(ema_state)
            )
        targets["metadata"] = ocp.args.JsonRestore()
        restored = self.manager.restore(step, args=ocp.args.Composite(**targets))

        nnx.replace_by_pure_dict(params, restored["params"])
        nnx.update(trainable, params)
        nnx.replace_by_pure_dict(opt_state, restored["opt_state"])
        nnx.update(optimizer, opt_state)
        new_ema = None
        if ema_state is not None:
            nnx.replace_by_pure_dict(ema_state, restored["ema"])
            new_ema = ema_state
        meta = restored.get("metadata") or {}
        meta["_restored_step"] = step
        meta["_ema"] = new_ema
        return meta
