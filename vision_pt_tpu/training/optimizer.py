"""Optimizer factory (rebuild of reference ``src/optimizer/util.py:6-32``).

The reference dynamically imports optimizers by dotted name
("torch.optim.AdamW", "schedulefree.RAdamScheduleFree",
"bitsandbytes.optim.AdamW8bit"). Here the same config strings resolve to optax
transformations: known torch/bnb/schedulefree names map to TPU-appropriate
optax equivalents, and any "optax.xxx" / bare optax name resolves dynamically.
"""

from __future__ import annotations

from typing import Callable

import optax

ScheduleOrFloat = float | Callable[[int], float]

# torch/bnb/schedulefree name -> optax builder
_ALIASES: dict[str, str] = {
    "torch.optim.adamw": "adamw",
    "torch.optim.adam": "adam",
    "torch.optim.sgd": "sgd",
    "torch.optim.rmsprop": "rmsprop",
    "torch.optim.adagrad": "adagrad",
    "torch.optim.adafactor": "adafactor",
    "bitsandbytes.optim.adamw8bit": "adamw8bit",  # int8 moments (optim8bit)
    "bitsandbytes.optim.adam8bit": "adam8bit",
    "bitsandbytes.optim.lion8bit": "lion",
    "bitsandbytes.optim.lion": "lion",
    "schedulefree.adamwschedulefree": "schedule_free_adamw",
    "schedulefree.radamschedulefree": "schedule_free_radam",
    "transformers.optimization.adafactor": "adafactor",
    "came": "came",
    "lion": "lion",
    "prodigy": "prodigy",
}

_TORCH_TO_OPTAX_ARGS = {
    "lr": "learning_rate",
    "betas": None,  # expanded to b1/b2
    "eps": "eps",
    "weight_decay": "weight_decay",
}


def _translate_args(args: dict) -> dict:
    out = dict(args)
    if "lr" in out:
        out["learning_rate"] = out.pop("lr")
    if "betas" in out:
        b1, b2 = out.pop("betas")
        out["b1"], out["b2"] = b1, b2
    return out


def _build(name: str, args: dict) -> optax.GradientTransformation:
    if name in ("schedule_free_adamw", "schedule_free_radam"):
        # schedule_free_radam's closest optax analog is the schedule-free
        # AdamW wrapper. NOTE: warmup_steps=0 makes optax build a zero-length
        # warmup schedule that stays at lr=0 forever — pass None instead.
        lr = args.pop("learning_rate", 1e-3)
        warmup = args.pop("warmup_steps", 0) or None
        return optax.contrib.schedule_free_adamw(
            learning_rate=lr, warmup_steps=warmup, **args
        )
    if name in ("adamw8bit", "adam8bit"):
        from .optim8bit import adam8bit, adamw8bit

        fn = adamw8bit if name == "adamw8bit" else adam8bit
        return fn(**args)
    if name == "prodigy":
        return optax.contrib.prodigy(**args)
    if name == "came":
        fn = getattr(optax.contrib, "came", None)
        if fn is None:
            raise ValueError("optax.contrib.came not available in this optax")
        return fn(**args)
    builder = getattr(optax, name, None) or getattr(optax.contrib, name, None)
    if builder is None:
        raise ValueError(f"Unknown optimizer: {name}")
    return builder(**args)


def get_optimizer(
    name: str,
    args: dict | None = None,
    learning_rate_schedule: ScheduleOrFloat | None = None,
) -> optax.GradientTransformation:
    """Resolve an optimizer config (reference-compatible names) to optax.

    If ``learning_rate_schedule`` is given it overrides any lr in args
    (optax builders take schedules directly as learning_rate).
    """
    args = _translate_args(dict(args or {}))
    if learning_rate_schedule is not None:
        args["learning_rate"] = learning_rate_schedule
    key = name.lower()
    key = _ALIASES.get(key, key)
    key = key.removeprefix("optax.").removeprefix("optax.contrib.")
    return _build(key, args)


def is_schedule_free(name: str) -> bool:
    """Schedule-free optimizers need eval-mode param extraction (reference
    ``src/trainer/common.py:276-306``)."""
    return "schedulefree" in name.lower() or "schedule_free" in name.lower()
