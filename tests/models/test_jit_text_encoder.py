"""JiT Qwen3 text encoder (reference ``src/models/jit/text_encoder.py``)."""

import numpy as np
import pytest
from flax import nnx


class MockQwenTokenizer:
    pad_token_id = 0

    def __call__(self, prompts, max_length, padding, truncation,
                 add_special_tokens):
        ids = []
        for p in prompts:
            toks = [5 + (hash(w) % 90) for w in p.split()][: max_length]
            ids.append(toks or [1])
        longest = max(len(t) for t in ids)
        ids = [t + [self.pad_token_id] * (longest - len(t)) for t in ids]
        return {"input_ids": ids}


def test_text_encoder_shapes_and_negative_batching():
    from vision_pt_tpu.models.jit.text_encoder import (
        QWEN3_VL_2B_TEXT_CONFIG,
        TextEncoder,
    )
    from vision_pt_tpu.models.lm.model import DecoderLM, DecoderLMConfig

    tiny = DecoderLMConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, rope_theta=5e6, arch="qwen3",
    )
    te = TextEncoder(DecoderLM(tiny, rngs=nnx.Rngs(0)), MockQwenTokenizer())
    out = te.encode_prompts(
        ["a cat photo", "a dog"], negative_prompts=None,
        use_negative_prompts=True, max_token_length=16,
    )
    assert out.positive_embeddings.shape[0] == 2
    assert out.positive_embeddings.shape[-1] == 32
    assert out.negative_embeddings.shape[0] == 2
    # right padding cannot change real-token embeddings (causal attention)
    out_single = te.encode_prompts(
        ["a cat photo"], use_negative_prompts=False, max_token_length=16,
    )
    np.testing.assert_allclose(
        np.asarray(out.positive_embeddings[0][:3]),
        np.asarray(out_single.positive_embeddings[0][:3]),
        atol=1e-5,
    )
    # reference architecture constants (text_encoder.py:14-41)
    assert QWEN3_VL_2B_TEXT_CONFIG.hidden_size == 2048
    assert QWEN3_VL_2B_TEXT_CONFIG.rope_theta == 5_000_000.0


def test_from_remote_is_gated():
    from vision_pt_tpu.models.jit.text_encoder import TextEncoder

    with pytest.raises(NotImplementedError, match="no network egress"):
        TextEncoder.from_remote()


def test_from_local_roundtrip(tmp_path):
    """Save a tiny qwen3 in HF layout, load via from_local, compare."""
    import json

    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from vision_pt_tpu.models.jit.text_encoder import TextEncoder
    from vision_pt_tpu.models.lm.model import DecoderLM, DecoderLMConfig
    from vision_pt_tpu.utils.state_dict import flatten_state

    tiny = dict(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, rms_norm_eps=1e-6, rope_theta=5e6,
    )
    src = DecoderLM(DecoderLMConfig(**tiny, arch="qwen3"), rngs=nnx.Rngs(7))
    # export in HF torch layout: 2D kernels transposed back to .weight
    sd = {}
    for k, v in flatten_state(src).items():
        # NOTE: must copy — safetensors save_file silently corrupts
        # zero-copy numpy views of jax buffers
        v = np.ascontiguousarray(np.asarray(v))
        if k.endswith(".kernel") and v.ndim == 2:
            sd["model." + k[: -len(".kernel")] + ".weight"] = (
                np.ascontiguousarray(v.T)
            )
        elif k.endswith(".embedding"):
            sd["model." + k[: -len(".embedding")] + ".weight"] = v
        else:
            sd["model." + k] = v
    save_file(sd, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps(
        {"text_config": {**tiny, "num_hidden_layers": 2}}
    ))

    te = TextEncoder.from_local(str(tmp_path))
    ids = jnp.asarray([[3, 7, 11, 2]])
    ref = src(ids).penultimate_hidden_state
    got = te.model(ids).penultimate_hidden_state
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
