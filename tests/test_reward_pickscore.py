"""PickScore reward: local-weights loading + parity vs transformers CLIPModel
(reference ``src/modules/reward/pickscore.py:30-81``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_clip_dir(tmp_path_factory):
    """A tiny random CLIPModel saved in HF layout (config.json +
    model.safetensors), the same file shape as a PickScore_v1 snapshot."""
    import torch
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    torch.manual_seed(0)
    config = CLIPConfig(
        projection_dim=32,
        text_config=CLIPTextConfig(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            max_position_embeddings=77,
            hidden_act="gelu",
            eos_token_id=2,
        ).to_dict(),
        vision_config=CLIPVisionConfig(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            image_size=32,
            patch_size=8,
            hidden_act="gelu",
            projection_dim=32,
        ).to_dict(),
    )
    model = CLIPModel(config)
    model.eval()
    d = tmp_path_factory.mktemp("tiny_clip")
    model.save_pretrained(str(d), safe_serialization=True)
    return str(d), model


@pytest.mark.slow
def test_reward_params_structurally_frozen(tiny_clip_dir):
    """Judge weights are non-Param variables: a full-FT grad sweep over
    nnx.Param selects nothing in the reward model, while gradients still
    flow THROUGH it to the images (what DRaFT+ differentiates)."""
    from flax import nnx

    from vision_pt_tpu.reward.pickscore import PickScoreModel
    from vision_pt_tpu.reward.utils import FrozenRewardParam

    path, _ = tiny_clip_dir
    model = PickScoreModel.from_local(path)
    assert not jax.tree.leaves(nnx.state(model, nnx.Param))
    assert jax.tree.leaves(nnx.state(model, FrozenRewardParam))

    images = jnp.zeros((2, 32, 32, 3))
    ids = jnp.zeros((2, 8), dtype=jnp.int32)

    def loss(m, im):
        return jnp.sum(m.score(im, ids))

    grads = nnx.grad(loss, argnums=nnx.DiffState(0, nnx.Param))(model, images)
    assert not jax.tree.leaves(grads), "reward params received gradients"

    img_grads = jax.grad(lambda im: loss(model, im))(images)
    assert float(jnp.abs(img_grads).sum()) > 0


@pytest.mark.slow
def test_pickscore_from_local_matches_transformers(tiny_clip_dir):
    """Tower + projection + logit-scale parity against HF CLIPModel on the
    same weights (the model PickScore_v1 is an instance of)."""
    import torch

    path, hf_model = tiny_clip_dir
    from vision_pt_tpu.ops.attention import (
        get_default_attention_dtype,
        set_default_attention_dtype,
    )
    from vision_pt_tpu.reward.pickscore import PickScoreModel

    model = PickScoreModel.from_local(path)
    # keep attention fp32 for exact parity (the default bf16 auto-cast is
    # reference-faithful but adds ~1e-3 noise)
    _prev_attn_dtype = get_default_attention_dtype()
    set_default_attention_dtype(None)

    rng = np.random.default_rng(0)
    # square pixel input, already at the tower's native size -> resize is
    # identity and parity isolates the towers
    images = rng.uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
    input_ids = np.zeros((3, 12), dtype=np.int64)
    input_ids[:, 0] = 10  # bos-ish
    input_ids[:, 1:6] = rng.integers(3, 127, (3, 5))
    input_ids[:, 6] = 127  # highest id = argmax pooling position (eos==2 rule)

    scores = np.asarray(model.score(jnp.asarray(images), jnp.asarray(input_ids)))

    from vision_pt_tpu.reward.pickscore import clip_preprocess_images

    pixels = np.asarray(clip_preprocess_images(jnp.asarray(images), 32))
    with torch.no_grad():
        t_img = hf_model.get_image_features(
            pixel_values=torch.from_numpy(pixels).permute(0, 3, 1, 2)
        )
        t_txt = hf_model.get_text_features(
            input_ids=torch.from_numpy(input_ids)
        )
        t_img = t_img / t_img.norm(dim=-1, keepdim=True)
        t_txt = t_txt / t_txt.norm(dim=-1, keepdim=True)
        expected = (
            hf_model.logit_scale.exp() * (t_txt * t_img).sum(-1)
        ).numpy()

    try:
        np.testing.assert_allclose(scores, expected, rtol=2e-4, atol=2e-4)

        # reference-shape probs: softmax over images for the first prompt
        probs = np.asarray(
            model.probs(jnp.asarray(images), jnp.asarray(input_ids))
        )
        assert probs.shape == (3,)
        np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-5)
    finally:
        set_default_attention_dtype(_prev_attn_dtype)


@pytest.mark.slow
def test_pickscore_reward_differentiable(tiny_clip_dir):
    """DRaFT+ needs d(score)/d(images) — through preprocessing and the
    vision tower."""
    path, _ = tiny_clip_dir
    from vision_pt_tpu.reward.pickscore import PickScoreRewardModel

    class FakeTokenizer:
        def __call__(self, prompts, **kw):
            ids = np.zeros((len(prompts), 8), dtype=np.int64)
            ids[:, 0] = 10
            ids[:, 1] = 127
            return {"input_ids": ids}

    rm = PickScoreRewardModel(weights_path=path, tokenizer=FakeTokenizer())
    images = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    )

    scores = rm(images, ["a", "b"])
    assert scores.shape == (2,)
    assert np.isfinite(np.asarray(scores)).all()

    g = jax.grad(lambda im: jnp.sum(rm(im, ["a", "b"])))(images)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_pickscore_via_reward_config(tiny_clip_dir):
    """The config path the DRaFT+ workload uses:
    {'type': 'pickscore', 'weights_path': ...}."""
    path, _ = tiny_clip_dir
    from vision_pt_tpu.reward import load_reward_models

    (rm,) = load_reward_models(
        [{"type": "pickscore", "weights_path": path}]
    )
    assert rm._model is not None

    class FakeTokenizer:
        def __call__(self, prompts, **kw):
            ids = np.zeros((len(prompts), 8), dtype=np.int64)
            ids[:, 0] = 10
            ids[:, 1] = 127
            return {"input_ids": ids}

    rm._tokenizer = FakeTokenizer()
    images = jnp.zeros((2, 32, 32, 3), dtype=jnp.float32)
    scores = rm(images, ["x", "y"])
    assert scores.shape == (2,)
