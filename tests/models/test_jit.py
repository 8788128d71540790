import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vision_pt_tpu.models.jit import (
    ClassContextConfig,
    DenoiserConfig,
    JiTConfig,
    JiTModel,
)
from vision_pt_tpu.models.jit.class_encoder import ClassTokenizer
from vision_pt_tpu.models.jit.denoiser import Denoiser, RopeEmbedder


TINY_KW = dict(
    patch_size=4,
    hidden_size=64,
    depth=2,
    num_heads=2,
    bottleneck_dim=16,
    context_dim=32,
    context_start_block=1,
    rope_axes_dims=[8, 12, 12],
    num_time_tokens=2,
)


@pytest.fixture
def label2id_path(tmp_path):
    p = tmp_path / "label2id.json"
    p.write_text(json.dumps({f"c{i}": i for i in range(10)}))
    return str(p)


@pytest.fixture
def tiny_model(label2id_path):
    cfg = JiTConfig(
        context_encoder=ClassContextConfig(label2id_map_path=label2id_path),
        denoiser=DenoiserConfig(**TINY_KW),
    )
    return JiTModel.new_with_config(cfg, seed=0)


def test_rope_embedder_zero_centered_positions():
    rope = RopeEmbedder(axes_dims=(8, 12, 12))
    pos = rope.prepare_image_position_ids(16, 16, 4, global_index=3)
    assert pos.shape == (16, 3)
    assert np.all(pos[:, 0] == 3)
    # 4x4 grid zero-centered: y, x in [-2, 2)
    assert pos[:, 1].min() == -2 and pos[:, 1].max() == 1
    ctx = rope.prepare_context_position_ids(5, global_index=0)
    assert np.all(ctx[:, 0] == 0)
    np.testing.assert_array_equal(ctx[:, 1], np.arange(5))


def test_rope_freqs_unit_modulus():
    rope = RopeEmbedder(axes_dims=(8, 12, 12))
    pos = rope.prepare_image_position_ids(8, 8, 4, global_index=3)
    freqs = rope(pos)
    assert freqs.shape == (4, 16, 2)
    np.testing.assert_allclose(
        freqs[..., 0] ** 2 + freqs[..., 1] ** 2, 1.0, atol=1e-6
    )


def test_class_tokenizer_right_padding():
    tok = ClassTokenizer({f"c{i}": i for i in range(5)})
    out = tok.tokenize(["c1 c2", "c0"], max_length=4)
    np.testing.assert_array_equal(out.class_ids[0], [1, 2, 5, 5])
    np.testing.assert_array_equal(out.attention_mask[0], [1, 1, 0, 0])
    np.testing.assert_array_equal(out.attention_mask[1], [1, 0, 0, 0])


def test_class_tokenizer_unknown_label_warns():
    tok = ClassTokenizer({"a": 0})
    with pytest.warns(UserWarning, match="not found"):
        out = tok.tokenize(["a zzz"], max_length=2)
    np.testing.assert_array_equal(out.class_ids[0], [0, 1])


def test_denoiser_forward_shape_and_finite(tiny_model):
    img = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    t = jnp.asarray([0.3, 0.7])
    ctx = tiny_model.class_encoder.encode_prompts(["c1 c2", "c3"], max_token_length=8)
    osz, tsz, crop = tiny_model.prepare_image_size_inputs(16, 16, 2)
    pred = tiny_model.denoiser(
        img, t, ctx.embeddings, osz, tsz, crop, ctx.attention_mask
    )
    assert pred.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(pred)))


@pytest.mark.slow
def test_denoiser_mask_only_affects_padded_context(tiny_model):
    """Changing an embedding under a masked position must not change output."""
    img = jax.random.normal(jax.random.key(0), (1, 16, 16, 3))
    t = jnp.asarray([0.5])
    ctx = jax.random.normal(jax.random.key(1), (1, 4, 32))
    mask = jnp.asarray([[1, 1, 0, 0]])
    osz, tsz, crop = tiny_model.prepare_image_size_inputs(16, 16, 1)
    out1 = tiny_model.denoiser(img, t, ctx, osz, tsz, crop, mask)
    ctx2 = ctx.at[:, 2:].set(99.0)
    out2 = tiny_model.denoiser(img, t, ctx2, osz, tsz, crop, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    # and changing an unmasked position must change it
    ctx3 = ctx.at[:, 0].set(99.0)
    out3 = tiny_model.denoiser(img, t, ctx3, osz, tsz, crop, mask)
    # influence is attenuated through 0.02-std random-init weights, so the
    # effect is small but must be clearly nonzero
    assert float(jnp.max(jnp.abs(out3 - out1))) > 1e-4


def test_generate_two_steps(tiny_model):
    imgs = tiny_model.generate(
        "c1 c2",
        width=16,
        height=16,
        num_inference_steps=2,
        cfg_scale=2.0,
        max_token_length=8,
        seed=42,
    )
    assert len(imgs) == 1
    assert imgs[0].size == (16, 16)


def test_generate_seed_reproducible(tiny_model):
    a = tiny_model.generate(
        "c1", width=16, height=16, num_inference_steps=2, cfg_scale=1.0,
        max_token_length=8, seed=7, return_arrays=True,
    )
    b = tiny_model.generate(
        "c1", width=16, height=16, num_inference_steps=2, cfg_scale=1.0,
        max_token_length=8, seed=7, return_arrays=True,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generate_cfg_time_range_and_extras(tiny_model):
    arr = tiny_model.generate(
        "c1", width=16, height=16, num_inference_steps=3, cfg_scale=3.0,
        max_token_length=8, seed=1, cfg_time_range=(0.0, 0.5),
        do_cfg_renorm=True, do_dynamic_thresholding=True, return_arrays=True,
    )
    assert np.isfinite(np.asarray(arr, dtype=np.float32)).all()


def test_generate_cfg_time_range_excludes_all_steps(tiny_model):
    """do_cfg=True but the range gates out every step: the scan fast path
    must slice the CFG-doubled context back to the carried batch (regression:
    mismatched batch dims crashed the trace)."""
    arr = tiny_model.generate(
        "c1", width=16, height=16, num_inference_steps=2, cfg_scale=3.0,
        max_token_length=8, seed=1, cfg_time_range=(2.0, 3.0),
        return_arrays=True,
    )
    assert arr.shape[0] == 1
    assert np.isfinite(np.asarray(arr, dtype=np.float32)).all()
    # and it must equal the plain uncond sampler (cfg disabled outright)
    uncond = tiny_model.generate(
        "c1", width=16, height=16, num_inference_steps=2, cfg_scale=1.0,
        max_token_length=8, seed=1, return_arrays=True,
    )
    np.testing.assert_allclose(
        np.asarray(arr, dtype=np.float32),
        np.asarray(uncond, dtype=np.float32), atol=1e-5,
    )


def test_checkpoint_roundtrip(tiny_model, tmp_path):
    path = str(tmp_path / "model.safetensors")
    tiny_model.save_checkpoint(path)
    m2 = JiTModel.from_pretrained(tiny_model.config, path)
    img = jax.random.normal(jax.random.key(0), (1, 16, 16, 3))
    t = jnp.asarray([0.5])
    ctx = tiny_model.class_encoder.encode_prompts(["c1"], max_token_length=4)
    osz, tsz, crop = tiny_model.prepare_image_size_inputs(16, 16, 1)
    a = tiny_model.denoiser(img, t, ctx.embeddings, osz, tsz, crop, ctx.attention_mask)
    b = m2.denoiser(img, t, ctx.embeddings, osz, tsz, crop, ctx.attention_mask)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_gradient_checkpointing_same_output(tiny_model):
    img = jax.random.normal(jax.random.key(0), (1, 16, 16, 3))
    t = jnp.asarray([0.5])
    ctx = jax.random.normal(jax.random.key(1), (1, 4, 32))
    osz, tsz, crop = tiny_model.prepare_image_size_inputs(16, 16, 1)
    base = tiny_model.denoiser(img, t, ctx, osz, tsz, crop)
    tiny_model.denoiser.set_gradient_checkpointing(True)
    remat = tiny_model.denoiser(img, t, ctx, osz, tsz, crop)
    tiny_model.denoiser.set_gradient_checkpointing(False)
    np.testing.assert_allclose(np.asarray(base), np.asarray(remat), atol=1e-6)


def test_pixel_shuffle_unpatchify_roundtrip(label2id_path):
    cfg = JiTConfig(
        context_encoder=ClassContextConfig(label2id_map_path=label2id_path),
        denoiser=DenoiserConfig(**{**TINY_KW, "use_pixel_shuffle": True}),
    )
    model = JiTModel.new_with_config(cfg, seed=0)
    img = jax.random.normal(jax.random.key(0), (1, 16, 16, 3))
    t = jnp.asarray([0.5])
    ctx = jax.random.normal(jax.random.key(1), (1, 4, 32))
    osz, tsz, crop = model.prepare_image_size_inputs(16, 16, 1)
    out = model.denoiser(img, t, ctx, osz, tsz, crop)
    assert out.shape == (1, 16, 16, 3)
