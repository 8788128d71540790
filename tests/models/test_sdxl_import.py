"""End-to-end sgm-checkpoint import on a synthetic reference-keyed file
(VERDICT r4 item 5).

The zero-egress box can never download a real SDXL checkpoint, but the exact
FORMAT path is provable today: build a random-init checkpoint whose sgm key
layout comes from the TORCH REFERENCE's own converters
(``/root/reference/src/models/sdxl/util.py:138-209`` applied to a live
reference UNet + HF CLIP text encoders, mirroring the reference pipeline's
save path ``src/models/sdxl/pipeline.py:116-151``), then drive
``tools/checkpoint/import_sdxl.run_import`` end-to-end: strict load ->
denoiser forward -> 2-step generate -> quant matrix -> PEFT export
(reference ``tests/models/test_sdxl.py:154-257`` is the real-weight mirror).
Only weights *quality* remains unverifiable offline."""

import numpy as np
import pytest

from tests.reference_stubs import install_stubs, reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(),
                       reason="reference repo not mounted"),
]

# tiny-but-structural UNet: the reference hardcodes [1, 2, 10] transformers
# per stage in DownBlocks, so format parity requires the default stage layout
UNET_KW = dict(
    hidden_dim=32, block_out_channels=[32, 32, 64],
    num_transformers_per_block=[1, 2, 10],
    # context_dim = te1 hidden + te2 hidden (the dual-CLIP concat)
    num_head_channels=16, context_dim=40, layers_per_block=2,
)
VAE_KW = dict(block_out_channels=(8, 16, 16, 16), layers_per_block=1,
              norm_num_groups=4, latent_channels=4)
TE1_KW = dict(vocab_size=1000, hidden_size=16, intermediate_size=32,
              num_hidden_layers=2, num_attention_heads=2)
TE2_KW = dict(vocab_size=1000, hidden_size=24, intermediate_size=48,
              num_hidden_layers=2, num_attention_heads=2,
              hidden_act="gelu", projection_dim=1280)


def _tiny_config(checkpoint_path: str):
    from vision_pt_tpu.models.sdxl.config import DenoiserConfig, SDXLConfig

    return SDXLConfig(
        checkpoint_path=checkpoint_path,
        dtype="float32",
        denoiser=DenoiserConfig(**UNET_KW),
        vae_config=VAE_KW,
        text_encoder_1_config=TE1_KW,
        text_encoder_2_config=TE2_KW,
    )


def _build_reference_keyed_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Random-init tiny SDXL checkpoint whose key layout is produced by the
    torch reference's own converters wherever the reference is importable
    (UNet + both text encoders); the VAE section (reference VAE is a
    diffusers subclass, not importable offline) uses this repo's converter
    but every key is cross-checked against the reference's string mapping
    below. Returns the raw sgm dict."""
    import torch
    from safetensors.numpy import save_file
    from src.models.sdxl.config import DenoiserConfig as TorchDenoiserConfig
    from src.models.sdxl.denoiser import Denoiser as TorchDenoiser
    from src.models.sdxl.util import (
        convert_to_original_key as ref_to_original,
    )
    from src.utils.state_dict import (
        convert_transformers_to_open_clip as ref_to_open_clip,
    )
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel as HFCLIPTextModel
    from transformers import CLIPTextModelWithProjection

    sgm: dict[str, np.ndarray] = {}

    # ---- UNet: live torch reference, reference key converter
    torch.manual_seed(0)
    tunet = TorchDenoiser(TorchDenoiserConfig(**UNET_KW))
    for k, v in tunet.state_dict().items():
        sgm[ref_to_original(f"denoiser.{k}")] = (
            v.detach().to(torch.float32).numpy()
        )

    # ---- text encoder 1 (CLIP-L layout): HF torch model, reference mapping
    hf1 = HFCLIPTextModel(HFCLIPTextConfig(**{**TE1_KW,
                                              "max_position_embeddings": 77}))
    for k, v in hf1.state_dict().items():
        if "position_ids" in k:
            continue  # non-persistent buffer in modern checkpoints
        sgm[ref_to_original(f"text_encoder.text_encoder_1.{k}")] = (
            v.detach().numpy()
        )

    # ---- text encoder 2 (OpenCLIP-bigG layout): HF torch model ->
    # reference transformers->open_clip converter (in_proj qkv merge) ->
    # reference key mapping — the exact reference save path
    hf2 = CLIPTextModelWithProjection(
        HFCLIPTextConfig(**{**TE2_KW, "max_position_embeddings": 77})
    )
    te2_sd = {
        f"text_encoder.text_encoder_2.{k}": v
        for k, v in hf2.state_dict().items()
        if "position_ids" not in k
    }
    for k, v in ref_to_open_clip(te2_sd).items():
        sgm[ref_to_original(k)] = v.detach().numpy()

    # ---- VAE: no importable torch reference (diffusers subclass); export a
    # random-init VAE through THIS repo's converter and cross-check every
    # produced key against the reference's pure-string mapping
    from flax import nnx
    from src.models.sdxl.util import (
        convert_from_original_key as ref_from_original,
    )

    from vision_pt_tpu.models.sdxl.convert import (
        convert_from_original_key,
        convert_to_original_key,
        unet_nnx_to_torch,
    )
    from vision_pt_tpu.models.sdxl.vae import VAE
    from vision_pt_tpu.utils.state_dict import flatten_state

    vae = VAE(**VAE_KW, rngs=nnx.Rngs(3))
    vae_torch = unet_nnx_to_torch(
        {k: np.asarray(v) for k, v in flatten_state(vae).items()}
    )
    import re

    for k, v in vae_torch.items():
        key = convert_to_original_key(f"vae.{k}")
        assert key.startswith("first_stage_model."), key
        # the reference's string converter must agree on where this key
        # lands internally (arbiter for the section we can't instantiate)
        assert ref_from_original(key) == convert_from_original_key(key), key
        # original-format VAEs store mid-attention projections as 4D 1x1
        # convs — reproduce that so the load-time flatten fixup is exercised
        if re.search(r"attn_1\.(q|k|v|proj_out)\.weight$", key):
            v = v[:, :, None, None]
        sgm[key] = v

    save_file(sgm, path)
    return sgm


def test_sgm_checkpoint_import_end_to_end(tmp_path):
    install_stubs()
    import jax.numpy as jnp

    from tests.models.test_sdxl import MockTokenizer
    from tools.checkpoint.import_sdxl import run_import
    from vision_pt_tpu.models.sdxl.pipeline import SDXLModel

    ckpt = str(tmp_path / "synthetic_sgm.safetensors")
    sgm = _build_reference_keyed_checkpoint(ckpt)
    assert any(k.startswith("model.diffusion_model.") for k in sgm)
    assert any(k.startswith("conditioner.embedders.0.transformer.") for k in sgm)
    assert any(k.startswith("conditioner.embedders.1.model.") for k in sgm)
    assert any(k.startswith("first_stage_model.") for k in sgm)

    config = _tiny_config(ckpt)

    def attach_tokenizers(model):
        model.text_encoder.tokenizer_1 = MockTokenizer()
        model.text_encoder.tokenizer_2 = MockTokenizer()

    # the import tool itself: strict load -> forward -> generate -> quant
    report = run_import(
        config, str(tmp_path / "out"),
        prompt="a cat", negative_prompt="bad",
        cfg_scale=3.0, num_inference_steps=2,
        height=64, width=64, seed=7,
        quant_matrix=True,
        attach_tokenizers=attach_tokenizers,
        execution_dtype=jnp.float32,
        quant_types=("bnb_nf4", "fp8_e4m3fn"),
    )
    assert report["denoiser_forward"] == "ok"
    for cell in ("bf16", "bnb_nf4", "fp8_e4m3fn"):
        assert (tmp_path / "out" / f"{cell}.webp").exists(), cell
        assert report[cell]["pixel_std"] >= 0.0

    # value routing: a strict re-load must carry the torch reference's exact
    # tensors into the nnx tree (spot-check the UNet output conv)
    model = SDXLModel.from_checkpoint(config)
    from vision_pt_tpu.utils.state_dict import flatten_state

    flat = {k: np.asarray(v) for k, v in flatten_state(model.denoiser).items()}
    src = sgm["model.diffusion_model.out.2.weight"]  # torch OIHW conv
    np.testing.assert_array_equal(
        flat["out_conv.kernel"], np.transpose(src, (2, 3, 1, 0))
    )

    # PEFT export on the imported model (reference
    # ``train/sdxl/text_to_image.py:193-201``): LoRA surgery -> adapter-only
    # state dict -> comfy keys
    from vision_pt_tpu.models.sdxl.convert import convert_to_comfy_key
    from vision_pt_tpu.peft import LoRAConfig
    from vision_pt_tpu.peft.functional import (
        get_adapter_parameters,
        replace_to_peft_layer,
    )

    replace_to_peft_layer(
        model.denoiser, ["attn1", "attn2"], [],
        LoRAConfig(type="lora", rank=2, alpha=1.0), seed=0,
    )
    adapter = {
        convert_to_comfy_key(f"denoiser.{k}"): v
        for k, v in get_adapter_parameters(model.denoiser).items()
    }
    assert adapter, "no adapter parameters extracted"
    assert all(k.startswith("diffusion_model.") for k in adapter)
    assert any("lora" in k for k in adapter)
