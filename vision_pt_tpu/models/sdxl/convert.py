"""SDXL checkpoint key/layout conversion.

Two layers (mirroring reference ``src/models/sdxl/util.py``):

1. sgm/original single-file keys <-> internal torch-style keys
   (``model.diffusion_model.input_blocks.N...`` <->
   ``denoiser.input_blocks.blocks.N...``), plus comfy export.
2. internal torch-style keys <-> our NNX module state: sequential indices
   become named attributes, Linear kernels transpose, Conv kernels go
   OIHW -> HWIO, norm ``weight`` becomes ``scale``.
"""

from __future__ import annotations

import re

import numpy as np

# ------------------------------------------------- sgm <-> internal keys
# (same mapping semantics as reference ``util.py:6-227``)


def unet_block_convert_from_original_key(key: str) -> str:
    key = re.sub(r"(input|output)_blocks\.", r"\1_blocks.blocks.", key)
    return key.replace("middle_block.", "middle_block.blocks.", 1)


def unet_block_convert_to_original_key(key: str) -> str:
    key = re.sub(r"(input|output)_blocks\.blocks\.", r"\1_blocks.", key)
    return key.replace("middle_block.blocks.", "middle_block.", 1)


def vae_convert_from_original_key(key: str, num_blocks: int = 4) -> str:
    if ".mid." in key:
        key = re.sub(r"block_(\d+)", lambda m: f"resnets.{int(m.group(1)) - 1}", key)
    key = key.replace(".attn_1.", ".attentions.0.", 1)
    key = key.replace(".q.", ".to_q.", 1)
    key = key.replace(".k.", ".to_k.", 1)
    key = key.replace(".v.", ".to_v.", 1)
    key = key.replace(".proj_out.", ".to_out.0.", 1) if ".attn" in key or ".attentions." in key else key
    key = key.replace(".norm.", ".group_norm.", 1)
    key = key.replace(".nin_shortcut.", ".conv_shortcut.", 1)
    key = key.replace(".mid.", ".mid_block.", 1)
    if groups := re.search(r".*\.up\.(\d+)\..*", key):
        key = re.sub(
            r"\.up\.\d+\.", f".up_blocks.{num_blocks - 1 - int(groups.group(1))}.", key
        )
    elif groups := re.search(r".*\.down\.(\d+)\..*", key):
        key = re.sub(r"\.down\.\d+\.", f".down_blocks.{int(groups.group(1))}.", key)
    key = key.replace(".upsample.conv.", ".upsamplers.0.conv.", 1)
    key = key.replace(".downsample.conv.", ".downsamplers.0.conv.", 1)
    key = key.replace(".block.", ".resnets.", 1)
    key = key.replace(".norm_out.", ".conv_norm_out.", 1)
    return key


def vae_convert_to_original_key(key: str, num_blocks: int = 4) -> str:
    if ".mid_block." in key:
        key = re.sub(r"resnets\.(\d+)", lambda m: f"block_{int(m.group(1)) + 1}", key)
    key = key.replace(".attentions.0.", ".attn_1.", 1)
    key = key.replace(".to_q.", ".q.", 1)
    key = key.replace(".to_k.", ".k.", 1)
    key = key.replace(".to_v.", ".v.", 1)
    key = key.replace(".to_out.0.", ".proj_out.", 1)
    key = key.replace(".group_norm.", ".norm.", 1)
    key = key.replace(".conv_shortcut.", ".nin_shortcut.", 1)
    key = key.replace(".mid_block.", ".mid.", 1)
    if groups := re.search(r".*\.up_blocks\.(\d+)\..*", key):
        key = re.sub(
            r"\.up_blocks\.\d+\.", f".up.{num_blocks - 1 - int(groups.group(1))}.", key
        )
    elif groups := re.search(r".*\.down_blocks\.(\d+)\..*", key):
        key = re.sub(r"\.down_blocks\.\d+\.", f".down.{int(groups.group(1))}.", key)
    key = key.replace(".upsamplers.0.conv.", ".upsample.conv.", 1)
    key = key.replace(".downsamplers.0.conv.", ".downsample.conv.", 1)
    key = key.replace(".resnets.", ".block.", 1)
    key = key.replace(".conv_norm_out.", ".norm_out.", 1)
    return key


def root_convert_from_original_key(key: str) -> str:
    key = key.replace("model.diffusion_model.", "diffusion_model.", 1)
    key = key.replace("diffusion_model.", "denoiser.", 1)
    key = key.replace(
        "conditioner.embedders.0.transformer.", "text_encoder.text_encoder_1.", 1
    )
    key = key.replace(
        "conditioner.embedders.1.model.text_projection",
        "text_encoder.text_encoder_2.text_projection.weight",
        1,
    )
    key = key.replace(
        "conditioner.embedders.1.model.", "text_encoder.text_encoder_2.text_model.", 1
    )
    return key.replace("first_stage_model.", "vae.", 1)


def root_convert_to_original_key(key: str) -> str:
    key = key.replace("denoiser.", "model.diffusion_model.", 1)
    key = key.replace(
        "text_encoder.text_encoder_1.", "conditioner.embedders.0.transformer.", 1
    )
    key = key.replace(
        "text_encoder.text_encoder_2.text_projection.weight",
        "conditioner.embedders.1.model.text_projection",
        1,
    )
    key = key.replace(
        "text_encoder.text_encoder_2.text_model.", "conditioner.embedders.1.model.", 1
    )
    return key.replace("vae.", "first_stage_model.", 1)


def convert_from_original_key(key: str) -> str:
    key = root_convert_from_original_key(key)
    if key.startswith("denoiser."):
        key = unet_block_convert_from_original_key(key)
    elif key.startswith("vae."):
        key = vae_convert_from_original_key(key)
    return key


def convert_to_original_key(key: str) -> str:
    if key.startswith("denoiser."):
        key = unet_block_convert_to_original_key(key)
    elif key.startswith("vae."):
        key = vae_convert_to_original_key(key)
    return root_convert_to_original_key(key)


def convert_to_comfy_key(key: str) -> str:
    key = key.replace("text_encoder.text_encoder_1.", "clip_l.", 1)
    key = key.replace("text_encoder.text_encoder_2.", "clip_g.", 1)
    if key.startswith("denoiser."):
        key = unet_block_convert_to_original_key(key)
        key = key.replace("denoiser.", "diffusion_model.", 1)
    return key


# ------------------------------------------------- torch <-> NNX (UNet)

# sequential-index attribute names -> our named attributes (ordered, literal)
_UNET_RENAMES = [
    ("time_embed.0.", "time_embed.linear_1."),
    ("time_embed.2.", "time_embed.linear_2."),
    ("label_emb.0.0.", "label_emb.linear_1."),
    ("label_emb.0.2.", "label_emb.linear_2."),
    (".in_layers.0.", ".in_norm."),
    (".in_layers.2.", ".in_conv."),
    (".emb_layers.1.", ".emb_linear."),
    (".out_layers.0.", ".out_norm."),
    (".out_layers.3.", ".out_conv."),
    (".to_out.0.", ".to_out."),
    (".ff.net.0.proj.", ".ff.geglu.proj."),
    (".ff.net.2.", ".ff.out."),
]
_UNET_RENAMES_TOP = [
    ("out.0.", "out_norm."),
    ("out.2.", "out_conv."),
]

# diffusers-VAE / HF-CLIP container names -> our attribute names
_EXTRA_RENAMES = [
    (".downsamplers.0.conv.", ".downsampler."),
    (".upsamplers.0.conv.", ".upsampler."),
    (".encoder.layers.", ".layers."),  # CLIP text model
]

_NORM_HINTS = (
    ".in_norm.", ".out_norm.", ".norm.", ".norm1.", ".norm2.", ".norm3.",
    "out_norm.", ".group_norm.", ".conv_norm_out.", ".norm_out.",
    ".layer_norm1.", ".layer_norm2.", ".final_layer_norm.",
    ".layernorm.", ".norm_final.",
)


def _is_norm_weight(key: str) -> bool:
    return any(h in key for h in _NORM_HINTS)


def unet_torch_to_nnx(torch_sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Reference-internal torch keys/layouts -> our NNX flat state."""
    out: dict[str, np.ndarray] = {}
    for key, value in torch_sd.items():
        value = np.asarray(value)
        for old, new in _UNET_RENAMES + _EXTRA_RENAMES:
            if old in key:
                key = key.replace(old, new, 1)
        for old, new in _UNET_RENAMES_TOP:
            if key.startswith(old):
                key = new + key[len(old):]
        if key.endswith(".embedding"):
            out[key] = value
            continue
        if key.endswith(".weight"):
            base = key[: -len(".weight")]
            if value.ndim == 4:  # conv OIHW -> HWIO
                out[base + ".kernel"] = value.transpose(2, 3, 1, 0)
            elif value.ndim == 2:  # linear
                out[base + ".kernel"] = value.T
            elif _is_norm_weight(key):
                out[base + ".scale"] = value
            else:
                out[key] = value
        else:
            out[key] = value
    return out


def unet_nnx_to_torch(nnx_sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for key, value in nnx_sd.items():
        value = np.asarray(value)
        if key.endswith(".kernel"):
            base = key[: -len(".kernel")]
            if value.ndim == 4:
                out[base + ".weight"] = value.transpose(3, 2, 0, 1)
            else:
                out[base + ".weight"] = value.T
        elif key.endswith(".scale"):
            out[key[: -len(".scale")] + ".weight"] = value
        else:
            out[key] = value
    final: dict[str, np.ndarray] = {}
    for key, value in out.items():
        for new, old in _UNET_RENAMES + _EXTRA_RENAMES:  # inverse renames
            if old in key:
                key = key.replace(old, new, 1)
        for new, old in _UNET_RENAMES_TOP:
            if key.startswith(old):
                key = new + key[len(old):]
        final[key] = value
    return final
