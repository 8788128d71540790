"""Sequence-parallel (ring) attention wired into the MODEL path (VERDICT r3
#5): the `sequence_parallel` dispatch context routes eligible self-attention
through ops/ring_attention.py, a full JiT block matches fwd+bwd, and a
Trainer on a seq>1 mesh trains with the same loss as seq=1.

The reference has no sequence parallelism (``src/modules/attention.py:98-159``
is single-device); this is the SURVEY §5 long-context stretch goal made
load-bearing.
"""

import json
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vision_pt_tpu.ops import attention as attention_mod
from vision_pt_tpu.ops.attention import (
    attention_dtype,
    dot_product_attention,
    ring_dispatch_count,
    sequence_parallel,
)
from vision_pt_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def seq_mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    return make_mesh({"data": -1, "seq": 4})


def test_dispatch_routes_auto_to_ring(seq_mesh):
    q = jax.random.normal(jax.random.key(0), (2, 64, 3, 8), dtype=jnp.float32)
    before = ring_dispatch_count()
    with attention_dtype(None):
        ref = dot_product_attention(q, q, q, backend="xla")
        assert ring_dispatch_count() == before  # xla backend never rings
        with sequence_parallel(seq_mesh):
            out = dot_product_attention(q, q, q)  # backend="auto"
    assert ring_dispatch_count() == before + 1
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_dispatch_falls_back_when_ineligible(seq_mesh):
    # S=30 not divisible by seq=4 -> auto silently falls back to xla;
    # backend="ring" raises instead of silently degrading
    q = jax.random.normal(jax.random.key(1), (2, 30, 3, 8), dtype=jnp.float32)
    before = ring_dispatch_count()
    with sequence_parallel(seq_mesh):
        out = dot_product_attention(q, q, q)
        assert ring_dispatch_count() == before
        assert out.shape == q.shape
        with pytest.raises(ValueError, match="divisible"):
            dot_product_attention(q, q, q, backend="ring")
    # cross-attention (Sq != Sk) is also ineligible
    k = jax.random.normal(jax.random.key(2), (2, 64, 3, 8), dtype=jnp.float32)
    with sequence_parallel(seq_mesh):
        out = dot_product_attention(q, k, k)
        assert ring_dispatch_count() == before


def test_ring_backend_requires_context():
    q = jax.random.normal(jax.random.key(3), (2, 64, 3, 8), dtype=jnp.float32)
    with pytest.raises(ValueError, match="sequence_parallel"):
        dot_product_attention(q, q, q, backend="ring")


def test_jit_block_fwd_bwd_parity(seq_mesh):
    """A full JiT block (QKNorm + RoPE attention + SwiGLU) fwd+bwd under the
    seq-parallel context matches the single-device path — the exact unit the
    trainer scans."""
    from vision_pt_tpu.models.jit.denoiser import JiTBlock, RopeEmbedder

    dim, heads, s, b = 64, 2, 64, 2  # head_dim 32
    block = JiTBlock(
        hidden_dim=dim, num_heads=heads, rngs=nnx.Rngs(0),
    )
    embedder = RopeEmbedder(axes_dims=(16, 8, 8))
    freqs = jnp.asarray(
        embedder(embedder.prepare_context_position_ids(s))
    )
    x = jax.random.normal(jax.random.key(4), (b, s, dim), dtype=jnp.float32)
    kv_lens = jnp.asarray([s, s - 17])  # crosses shard boundaries

    graphdef, params = nnx.split(block)

    def loss_fn(params, x):
        m = nnx.merge(graphdef, params)
        return (m(x, freqs, kv_lens=kv_lens) ** 2).sum()

    with attention_dtype(None):
        ref_out = block(x, freqs, kv_lens=kv_lens)
        ref_loss, (ref_gp, ref_gx) = jax.value_and_grad(
            loss_fn, argnums=(0, 1)
        )(params, x)
        before = ring_dispatch_count()
        with sequence_parallel(seq_mesh):
            out = block(x, freqs, kv_lens=kv_lens)
            loss, (gp, gx) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                params, x
            )
        assert ring_dispatch_count() > before

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_gx),
                               atol=1e-4, rtol=1e-4)
    for (pa, ga), (pb, gb) in zip(
        nnx.to_flat_state(gp), nnx.to_flat_state(ref_gp)
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(ga.value), np.asarray(gb.value),
            atol=1e-4, rtol=1e-4, err_msg=str(pa),
        )


def _train_config(mesh: dict):
    from vision_pt_tpu.config import OptimizerConfig, TrainConfig, TrainerConfig

    label2id_path = tempfile.mktemp(suffix=".json")
    with open(label2id_path, "w") as f:
        json.dump({f"c{i}": i for i in range(4)}, f)
    return TrainConfig(
        model={
            "context_encoder": {
                "type": "class", "label2id_map_path": label2id_path,
            },
            "denoiser": {
                "patch_size": 8, "hidden_size": 64, "depth": 2,
                "num_heads": 2, "bottleneck_dim": 16, "context_dim": 32,
                "context_start_block": 0, "rope_axes_dims": [16, 8, 8],
                "num_time_tokens": 2,
            },
            "max_token_length": 4,
        },
        dataset={
            "num_classes": 4, "num_items": 8, "image_size": 16,
            "batch_size": 8, "seed": 0,
        },
        optimizer=OptimizerConfig(name="adamw", args={"lr": 1e-3}),
        saving=None,
        seed=0,
        num_train_epochs=1,
        trainer=TrainerConfig(mesh=mesh),
    )


def _one_step_loss(mesh_cfg: dict) -> float:
    from vision_pt_tpu.data.square_class_image import (
        SyntheticClassImageDatasetConfig,
    )
    from vision_pt_tpu.parallel.mesh import shard_batch
    from vision_pt_tpu.training.trainer import Trainer
    from vision_pt_tpu.workloads.jit_class_to_image import (
        JiTForClassToImageTraining,
    )

    trainer = Trainer(_train_config(mesh_cfg))
    trainer.register_train_dataset_class(SyntheticClassImageDatasetConfig)
    trainer.register_model_class(JiTForClassToImageTraining)
    trainer.before_train()
    batch = next(iter(trainer.train_dataset))
    key = trainer._next_key()
    arrays = trainer.model.prepare_batch(batch, key)
    arrays = shard_batch(arrays, trainer.mesh)
    loss, _ = trainer.train_step(arrays, key)
    return float(loss)


def test_trainer_seq_parallel_loss_matches():
    """One train step on a seq=2 mesh produces the same loss as seq=1 (same
    seed, same batch): VERDICT r3 #5's done-criterion at test scale. Also
    asserts the ring path actually traced (no silent fallback)."""
    if len(jax.devices()) != 8:
        pytest.skip("needs the 8-device CPU mesh")
    loss_base = _one_step_loss({"data": 2, "fsdp": 2, "tensor": 2, "seq": 1})
    before = ring_dispatch_count()
    loss_seq = _one_step_loss({"data": 2, "fsdp": 2, "tensor": 1, "seq": 2})
    assert ring_dispatch_count() > before, "seq=2 trainer never hit the ring"
    assert np.isfinite(loss_seq)
    np.testing.assert_allclose(loss_seq, loss_base, rtol=2e-3)
