"""END-TO-END sampler-output parity against the PyTorch reference.

Per-module forward parity (test_jit_parity / test_sdxl_parity) cannot catch
scheduler bugs — sigma indexing, the ancestral up/down split, CFG gating.
These tests run the FULL pipelines — the reference's own ``generate`` loop
vs ours — with every random stream injected from shared NumPy arrays
(PyTorch and JAX RNGs cannot be seeded to match; SURVEY "Randomness
parity"), and require PSNR >= 40 dB on the outputs.

- JiT: reference ``src/models/jit/pipeline.py:378-488`` (Euler rectified
  flow + CFG + class encoder), weights transferred through our checkpoint
  converter; only the initial noise is injected (the walk is deterministic).
- SDXL: reference ``src/models/sdxl/pipeline.py:286-415`` (sigma walk + CFG
  + Euler-ancestral); initial latents AND the per-step ancestral noise are
  injected on both sides. Compared at the latent output (``return_latents``
  / decode bypass): the reference's VAE is diffusers' AutoencoderKL, and
  diffusers is not installed in this environment — VAE decode cannot run on
  the reference side (our VAE has its own roundtrip/tiling tests).
"""

import json
import types

import numpy as np

from tests.parity_record import record
import pytest

from tests.reference_stubs import install_stubs, reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not reference_available(), reason="reference repo not mounted"
    ),
]


def _psnr(ours: np.ndarray, theirs: np.ndarray) -> float:
    mse = float(np.mean((ours - theirs) ** 2))
    peak = float(theirs.max() - theirs.min())
    return 10 * np.log10(peak**2 / max(mse, 1e-20))


def test_jit_euler_sampler_parity(tmp_path):
    install_stubs()
    import functools

    import torch
    import src.models.jit.denoiser as tden
    import src.modules.attention as tattn
    from src.models.jit.config import (
        ClassContextConfig as TClassContextConfig,
        DenoiserConfig as TDenoiserConfig,
        JiTConfig as TJiTConfig,
    )
    from src.models.jit.pipeline import JiTModel as TorchJiTModel

    tden.scaled_dot_product_attention = functools.partial(
        tattn.scaled_dot_product_attention, attention_dtype=torch.float32
    )

    import jax.numpy as jnp

    from vision_pt_tpu.models.jit import (
        ClassContextConfig,
        DenoiserConfig,
        JiTConfig,
        JiTModel,
    )
    from vision_pt_tpu.ops.attention import (
        get_default_attention_dtype,
        set_default_attention_dtype,
    )

    label2id = tmp_path / "label2id.json"
    label2id.write_text(json.dumps({f"c{i}": i for i in range(8)}))

    tiny = dict(
        patch_size=4, hidden_size=64, depth=3, num_heads=2, bottleneck_dim=16,
        context_dim=32, context_start_block=1, rope_axes_dims=[8, 12, 12],
        num_time_tokens=2,
    )
    tconfig = TJiTConfig(
        context_encoder=TClassContextConfig(label2id_map_path=str(label2id)),
        denoiser=TDenoiserConfig(**tiny),
        dtype="float32",
    )
    tmodel = TorchJiTModel(tconfig)
    tmodel.denoiser.initialize_weights()
    tmodel.class_encoder.initialize_weights()
    tmodel.eval()

    # weights cross the frameworks through OUR checkpoint converter — this
    # is also an interop test of the on-disk format
    from safetensors.torch import save_file

    ckpt = str(tmp_path / "jit.safetensors")
    save_file(
        {k: v.detach().clone() for k, v in tmodel.state_dict().items()}, ckpt
    )
    jconfig = JiTConfig(
        context_encoder=ClassContextConfig(label2id_map_path=str(label2id)),
        denoiser=DenoiserConfig(**tiny),
        dtype="float32",
    )
    jmodel = JiTModel.from_pretrained(jconfig, ckpt)

    # inject the one random stream: the initial pixel noise
    rng = np.random.default_rng(0)
    batch, size, steps = 2, 16, 5
    init_nchw = rng.normal(size=(batch, 3, size, size)).astype(np.float32)
    tmodel.prepare_noisy_image = lambda *a, **k: torch.from_numpy(init_nchw)
    tmodel.to_pil_images = lambda x: x  # keep arrays
    jmodel.prepare_noisy_image = lambda *a, **k: jnp.asarray(
        init_nchw.transpose(0, 2, 3, 1)
    )

    # negatives have the same token count as each positive, so the
    # reference's reuse of the positive mask for the negative half
    # (pipeline.py:207-214) is invisible here
    prompts = ["c1 c2", "c3 c4"]
    negatives = ["c0 c5", "c0 c5"]
    kw = dict(
        negative_prompt=negatives, width=size, height=size,
        num_inference_steps=steps, cfg_scale=2.5, max_token_length=4,
    )

    theirs = tmodel.generate(
        prompts, **kw, execution_dtype=torch.float32,
        device=torch.device("cpu"),
    ).numpy()

    _prev_attn_dtype = get_default_attention_dtype()
    set_default_attention_dtype(None)
    try:
        ours = np.asarray(
            jmodel.generate(
                prompts, **kw, execution_dtype=jnp.float32,
                return_arrays=True,
            )
        ).transpose(0, 3, 1, 2)
    finally:
        set_default_attention_dtype(_prev_attn_dtype)

    psnr = _psnr(ours, theirs)
    print(f"JiT Euler sampler parity: {psnr:.1f} dB")
    record("jit_euler_sampler_psnr", psnr)
    assert psnr >= 40.0, f"sampler PSNR {psnr:.1f} dB < 40"


def test_sdxl_euler_ancestral_sampler_parity(tmp_path, monkeypatch):
    install_stubs()
    import functools

    import torch
    import src.models.sdxl.denoiser as tden
    import src.modules.attention as tattn
    from src.models.sdxl.config import DenoiserConfig as TDenoiserConfig
    from src.models.sdxl.denoiser import Denoiser as TorchDenoiser
    from src.models.sdxl.pipeline import SDXLModel as TorchSDXLModel
    from src.models.sdxl.scheduler import Scheduler as TorchScheduler

    tden.scaled_dot_product_attention = functools.partial(
        tattn.scaled_dot_product_attention, attention_dtype=torch.float32
    )

    import jax.numpy as jnp
    from flax import nnx
    from tqdm import tqdm

    from vision_pt_tpu.models.sdxl.config import DenoiserConfig, SDXLConfig
    from vision_pt_tpu.models.sdxl.convert import unet_torch_to_nnx
    from vision_pt_tpu.models.sdxl.pipeline import SDXLModel
    from vision_pt_tpu.models.sdxl.scheduler import Scheduler as JaxScheduler
    from vision_pt_tpu.ops.attention import (
        get_default_attention_dtype,
        set_default_attention_dtype,
    )
    from vision_pt_tpu.utils.state_dict import load_flat_state

    # the reference UNet hardcodes the [1, 2, 10] stage layout (see
    # test_sdxl_parity.py NOTE), so parity uses that layout at tiny dims
    kw = dict(
        hidden_dim=32, block_out_channels=[32, 32, 64],
        num_transformers_per_block=[1, 2, 10],
        num_head_channels=16, context_dim=32, layers_per_block=2,
    )
    tunet = TorchDenoiser(TDenoiserConfig(**kw))
    tunet.eval()

    batch, size, steps = 2, 64, 4
    lat = size // 8
    rng = np.random.default_rng(1)
    init_nchw = rng.normal(size=(batch, 4, lat, lat)).astype(np.float32)
    step_noises = [
        rng.normal(size=(batch, 4, lat, lat)).astype(np.float32)
        for _ in range(steps)
    ]
    ehs = rng.normal(size=(2 * batch, 7, 32)).astype(np.float32)
    pooled = rng.normal(size=(2 * batch, 1280)).astype(np.float32)

    # ---- reference side: the REAL generate loop with injected streams ----
    tmodel = TorchSDXLModel.__new__(TorchSDXLModel)
    torch.nn.Module.__init__(tmodel)
    tmodel.denoiser = tunet
    tmodel.scheduler = TorchScheduler()
    tmodel.progress_bar = tqdm
    tmodel.vae = types.SimpleNamespace(
        device=torch.device("cpu"), dtype=torch.float32, compression_ratio=8
    )
    tmodel.text_encoder = types.SimpleNamespace(
        encode_prompts=lambda *a, **k: None
    )
    tmodel.prepare_encoder_hidden_states = lambda **k: (
        torch.from_numpy(ehs), torch.from_numpy(pooled)
    )
    tmodel.prepare_latents = lambda *a, **k: (
        torch.from_numpy(init_nchw) * float(k["max_noise_sigma"])
    )
    tmodel.decode_image = lambda latents, use_tiling=False: latents

    t_noise_iter = iter(step_noises)
    monkeypatch.setattr(
        torch, "randn_like",
        lambda t, **k: torch.from_numpy(next(t_noise_iter)),
    )

    gen_kw = dict(
        prompt=["p"] * batch, negative_prompt=["n"] * batch,
        width=size, height=size, num_inference_steps=steps, cfg_scale=3.0,
    )
    with torch.inference_mode():
        theirs = tmodel.generate(
            **gen_kw, execution_dtype=torch.float32,
            device=torch.device("cpu"),
        ).numpy()

    # ---- our side: full SDXLModel.generate with the same streams ----
    jconfig = SDXLConfig(
        checkpoint_path="", dtype="float32", denoiser=DenoiserConfig(**kw),
        vae_config=dict(block_out_channels=(8, 16, 16, 16),
                        layers_per_block=1, norm_num_groups=4,
                        latent_channels=4),
    )
    jmodel = SDXLModel.from_config(jconfig, rngs=nnx.Rngs(0))
    load_flat_state(
        jmodel.denoiser,
        unet_torch_to_nnx(
            {k: v.detach().numpy() for k, v in tunet.state_dict().items()}
        ),
        strict=True,
    )
    jmodel.text_encoder = types.SimpleNamespace(
        encode_prompts=lambda *a, **k: None
    )
    jmodel.prepare_encoder_hidden_states = lambda out, do_cfg: (
        jnp.asarray(ehs), jnp.asarray(pooled)
    )
    jmodel.prepare_latents = lambda *a, **k: jnp.asarray(
        init_nchw.transpose(0, 2, 3, 1) * float(k["max_noise_sigma"])
    )

    class NoiseFromFile(JaxScheduler):
        def __init__(self, noises):
            self._noises = iter(noises)

        def ancestral_step(self, key, latent, noise_pred, sigma, next_sigma):
            noise = jnp.asarray(next(self._noises).transpose(0, 2, 3, 1))
            return super().ancestral_step(
                key, latent, noise_pred, sigma, next_sigma, noise=noise
            )

    jmodel.scheduler = NoiseFromFile(step_noises)

    _prev_attn_dtype = get_default_attention_dtype()
    set_default_attention_dtype(None)
    try:
        ours = np.asarray(
            jmodel.generate(
                **gen_kw, execution_dtype=jnp.float32, return_latents=True,
                # {} routes to the step-wise loop, where the host-side noise
                # iterator is usable; scan-vs-stepwise equality is covered by
                # test_sdxl_sampler_scan_matches_stepwise_seed_stream
                cross_attention_kwargs={},
            )
        ).transpose(0, 3, 1, 2)
    finally:
        set_default_attention_dtype(_prev_attn_dtype)

    psnr = _psnr(ours, theirs)
    print(f"SDXL Euler-ancestral sampler parity: {psnr:.1f} dB")
    record("sdxl_euler_ancestral_sampler_psnr", psnr)
    assert psnr >= 40.0, f"sampler PSNR {psnr:.1f} dB < 40"
