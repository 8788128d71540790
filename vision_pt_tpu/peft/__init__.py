from .config import LoHaConfig, LoRAConfig, PeftConfigMixin, PeftTargetConfig, RegexMatch
from .functional import (
    AdapterParam,
    PeftConst,
    calculate_trainable_parameters,
    detect_peft_method,
    get_adapter_parameters,
    iter_named_modules,
    load_peft_weight,
    print_trainable_parameters,
    replace_to_peft_layer,
    set_peft_layer_enabled,
    while_peft_disabled,
    while_peft_enabled,
)
from .lora import LoRALinear
from .loha import LoHaLinear

__all__ = [
    "AdapterParam",
    "PeftConst",
    "LoRAConfig",
    "LoHaConfig",
    "LoRALinear",
    "LoHaLinear",
    "PeftConfigMixin",
    "PeftTargetConfig",
    "RegexMatch",
    "replace_to_peft_layer",
    "get_adapter_parameters",
    "load_peft_weight",
    "detect_peft_method",
    "iter_named_modules",
    "set_peft_layer_enabled",
    "while_peft_disabled",
    "while_peft_enabled",
    "calculate_trainable_parameters",
    "print_trainable_parameters",
]
