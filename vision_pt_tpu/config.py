"""Train configuration schema (rebuild of reference ``src/config.py``).

Pydantic v2 with the same two-stage validation: ``TrainConfig.model`` /
``.dataset`` are opaque dicts validated later by the per-workload model and
dataset config classes — this is what lets one Trainer serve every workload.
"""

from __future__ import annotations

from pathlib import Path
from typing import Literal

import yaml
from pydantic import BaseModel

from .data import PreviewDatasetAlias
from .preview import LocalPreviewCallbackConfig, PreviewCallbackConfigAlias
from .preview import PreviewStrategyConfig
from .saving import (
    ModelSavingCallbackConfigAlias,
    ModelSavingStrategyConfig,
    SafetensorsSavingCallbackConfig,
)


class OptimizerConfig(BaseModel):
    name: str = "adamw"
    args: dict = {"lr": 1e-3}


class SchedulerConfig(BaseModel):
    name: str = "constant"
    args: dict = {}


class SavingConfig(BaseModel):
    strategy: ModelSavingStrategyConfig = ModelSavingStrategyConfig()
    callbacks: list[ModelSavingCallbackConfigAlias] = [
        SafetensorsSavingCallbackConfig(name="model", save_dir="./output")
    ]
    rename_key_map: dict[str, str] = {}


class PreviewConfig(BaseModel):
    strategy: PreviewStrategyConfig = PreviewStrategyConfig()
    callbacks: list[PreviewCallbackConfigAlias] = [
        LocalPreviewCallbackConfig(save_dir="./output/preview")
    ]
    data: PreviewDatasetAlias


class TrackerConfig(BaseModel):
    project_name: str
    loggers: list[Literal["wandb", "tensorboard", "jsonl"]]
    log_dir: str = "./output/logs"


DEBUG_MODE_TYPE = Literal[False, "sanity_check", "1step", "dataset"]


class CheckpointingConfig(BaseModel):
    """Full train-state checkpoint/resume — a deliberate improvement over the
    reference, which only ever saves weights (SURVEY §5)."""

    save_dir: str | None = None
    per_steps: int | None = None
    keep: int = 2
    resume: bool = True


class TrainerConfig(BaseModel):
    debug_mode: DEBUG_MODE_TYPE = False

    # torch_compile knobs are accepted for config compatibility; everything
    # is jit-compiled by construction in JAX.
    torch_compile: bool = False
    torch_compile_args: dict = {}

    gradient_checkpointing: bool = False
    gradient_accumulation_steps: int = 1

    clip_grad_norm: float | None = None
    clip_grad_value: float | None = None

    fp32_matmul_precision: Literal["highest", "high", "medium"] | None = None
    allow_tf32: bool = False  # accepted for compat; no-op on TPU

    use_ema: bool = False
    ema_decay: float = 0.9999

    # mesh layout for multi-chip runs: data / fsdp / tensor axis sizes;
    # None = single-device
    mesh: dict | None = None
    # multi-host: call jax.distributed.initialize() before backend init
    # (reference relies on `accelerate launch` for process-group setup;
    # here one flag does it — coordinator/rank discovery is automatic on
    # TPU pods)
    distributed_init: bool = False

    checkpointing: CheckpointingConfig = CheckpointingConfig()

    # flush metrics/progress every N steps; fetching device scalars syncs
    # the async dispatch pipeline, so raising this overlaps host logging
    # with TPU compute (1 = reference per-step behavior)
    log_every_n_steps: int = 1

    # observability (SURVEY §5: the reference has no tracer/sanitizer in the
    # train path; these are the cheap JAX equivalents)
    debug_nans: bool = False  # jax_debug_nans: fail fast on the first NaN
    profile_dir: str | None = None  # write a jax.profiler trace here
    profile_steps: int = 5  # trace this many steps after warmup


class TrainConfig(BaseModel):
    model: dict | BaseModel
    dataset: dict | BaseModel
    peft: dict | list[dict] | None = None  # validated by the PEFT layer

    optimizer: OptimizerConfig = OptimizerConfig()
    scheduler: SchedulerConfig | None = None
    saving: SavingConfig | None = SavingConfig()
    preview: PreviewConfig | None = None
    tracker: TrackerConfig | None = None
    trainer: TrainerConfig = TrainerConfig()

    seed: int = 42
    num_train_epochs: int = 1

    def to_dict(self) -> dict:
        return self.model_dump()

    def save_to(self, dir: Path | str, filename: str = "config.yaml"):
        dir = Path(dir)
        dir.mkdir(parents=True, exist_ok=True)
        with open(dir / filename, "w") as f:
            yaml.dump(self.to_dict(), f)

    @staticmethod
    def from_config_file(path: str) -> "TrainConfig":
        with open(path) as f:
            config = yaml.safe_load(f)
        return TrainConfig.model_validate(config, strict=True)
