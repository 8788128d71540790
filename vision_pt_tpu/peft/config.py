"""PEFT configuration (rebuild of reference ``src/modules/peft/config.py`` and
``__init__.py``)."""

from __future__ import annotations

import re
from typing import Literal, Union

from pydantic import BaseModel, field_validator

PEFT_TYPE = Literal["lora", "loha", "none"]


class RegexMatch(BaseModel):
    """Regex key matcher (reference ``src/utils/state_dict.py:8-12``)."""

    regex: str

    def __call__(self, value: str) -> bool:
        return bool(re.match(self.regex, value))


class PeftConfigMixin(BaseModel):
    type: PEFT_TYPE
    dtype: str = "bfloat16"


class LoRAConfig(PeftConfigMixin):
    type: Literal["lora"] = "lora"
    rank: int
    alpha: float = 1.0
    dropout: float = 0.0
    use_bias: bool = False


class LoHaConfig(PeftConfigMixin):
    type: Literal["loha"] = "loha"
    rank: int
    alpha: float = 1.0
    dropout: float = 0.0


PeftConfigUnion = Union[LoRAConfig, LoHaConfig]


class PeftTargetConfig(BaseModel):
    """Target selection + adapter config (reference
    ``src/modules/peft/__init__.py:24-48``)."""

    include_keys: list[str | RegexMatch] = []
    exclude_keys: list[str | RegexMatch] = []
    config: PeftConfigUnion
    resume_weight_path: str | None = None
    resume_rename_key_map: dict[str, str] = {}

    @field_validator("include_keys")
    @classmethod
    def check_include_keys(cls, v):
        if len(v) == 0:
            raise ValueError("include_keys must not be empty")
        return v

    def replace_to_peft_layer(self, model, freeze_base: bool = False):
        from .functional import replace_to_peft_layer

        replace_to_peft_layer(
            model,
            self.include_keys,
            self.exclude_keys,
            self.config,
        )


def get_target_keys(
    include, exclude, keys: list[str]
) -> list[str]:
    """Include/exclude matching with substring-or-regex patterns
    (reference ``src/utils/state_dict.py:15-42``)."""
    matched: set[str] = set()
    for pattern in include:
        if isinstance(pattern, str):
            matched.update(k for k in keys if pattern in k)
        elif isinstance(pattern, RegexMatch):
            rx = re.compile(pattern.regex)
            matched.update(k for k in keys if rx.match(k))
    for pattern in exclude:
        if isinstance(pattern, str):
            matched.difference_update(k for k in keys if pattern in k)
        elif isinstance(pattern, RegexMatch):
            rx = re.compile(pattern.regex)
            matched.difference_update(k for k in keys if rx.match(k))
    return sorted(matched)
