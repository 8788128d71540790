"""CogView4 DiT numerical parity against the PyTorch reference with
converted weights (same method as the JiT/SDXL parity tests; reference
``src/models/cogview4/denoiser.py:526-667``)."""

import numpy as np

from tests.parity_record import record
import pytest

from tests.reference_stubs import install_stubs, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

TINY = dict(
    patch_size=2, in_channels=4, out_channels=4, num_layers=2,
    attention_head_dim=16, num_attention_heads=4, text_embed_dim=32,
    time_embed_dim=32, condition_dim=8, rope_axes_dim=[16, 16],
)


def _torch_sd_to_nnx(sd):
    """The reference's own module-tree keys -> our attribute layout
    (identical renames to ``CogView4Model._load_checkpoint``)."""
    from vision_pt_tpu.models.sdxl.convert import unet_torch_to_nnx

    renamed = {
        k.replace(".ff.net.0.proj.", ".ff.proj.")
         .replace(".ff.net.2.", ".ff.out.")
         .replace(".to_out.0.", ".to_out."): v.detach().numpy()
        for k, v in sd.items()
    }
    return unet_torch_to_nnx(renamed)


@pytest.mark.slow
def test_cogview4_dit_forward_parity_with_reference():
    install_stubs()
    import torch
    from src.models.cogview4.config import DenoiserConfig as TorchDenoiserConfig
    from src.models.cogview4.denoiser import Denoiser as TorchDenoiser

    import jax.numpy as jnp
    from flax import nnx

    from vision_pt_tpu.models.cogview4.config import DenoiserConfig
    from vision_pt_tpu.models.cogview4.denoiser import Denoiser as JaxDenoiser
    from vision_pt_tpu.ops.attention import (
        get_default_attention_dtype,
        set_default_attention_dtype,
    )
    from vision_pt_tpu.utils.state_dict import load_flat_state

    tmodel = TorchDenoiser(TorchDenoiserConfig(**TINY, attention_backend="eager"))
    tmodel.eval()
    jmodel = JaxDenoiser(DenoiserConfig(**TINY), rngs=nnx.Rngs(0))
    load_flat_state(jmodel, _torch_sd_to_nnx(tmodel.state_dict()), strict=True)

    rng = np.random.default_rng(0)
    batch = 2
    lat = rng.normal(size=(batch, 4, 8, 8)).astype(np.float32)
    ehs = rng.normal(size=(batch, 6, 32)).astype(np.float32)
    t = np.asarray([500.0, 10.0], dtype=np.float32)
    osz = np.asarray([[64.0, 64.0]] * batch, dtype=np.float32)
    crop = np.zeros((batch, 2), dtype=np.float32)

    with torch.no_grad():
        tout = tmodel(
            latent=torch.from_numpy(lat),
            encoder_hidden_states=torch.from_numpy(ehs),
            timestep=torch.from_numpy(t),
            original_size=torch.from_numpy(osz),
            target_size=torch.from_numpy(osz),
            crop_coords=torch.from_numpy(crop),
        ).numpy()

    _prev_attn_dtype = get_default_attention_dtype()
    set_default_attention_dtype(None)  # fp32 math for the parity run
    try:
        jout = jmodel(
            jnp.asarray(lat.transpose(0, 2, 3, 1)),
            jnp.asarray(ehs),
            jnp.asarray(t),
            jnp.asarray(osz),
            jnp.asarray(osz),
            jnp.asarray(crop),
        )
    finally:
        set_default_attention_dtype(_prev_attn_dtype)
    jout_nchw = np.asarray(jout).transpose(0, 3, 1, 2)
    mse = np.mean((jout_nchw - tout) ** 2)
    psnr = 20 * np.log10(tout.max() - tout.min()) - 10 * np.log10(mse)
    print(f"cogview4 dit parity PSNR: {psnr:.1f} dB")
    record("cogview4_forward_psnr", psnr)
    assert psnr > 60.0, f"PSNR {psnr:.1f} dB below parity threshold"
