"""Mesh + sharding-rule tests (vision_pt_tpu/parallel/mesh.py) on the
8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import PartitionSpec as P

from vision_pt_tpu.parallel.mesh import (
    fsdp_partition_spec,
    make_mesh,
    shard_batch,
    shard_module,
    tensor_partition_spec,
)


def test_make_mesh_inference():
    mesh = make_mesh({"data": 2, "fsdp": -1, "tensor": 2})
    assert mesh.shape["data"] == 2
    assert mesh.shape["fsdp"] == 2
    assert mesh.shape["tensor"] == 2


def test_fsdp_spec_rules():
    mesh = make_mesh({"data": 1, "fsdp": 8, "tensor": 1})
    # large divisible param: largest axis sharded
    assert fsdp_partition_spec((1024, 256), mesh) == P("fsdp", None)
    # small param: replicated
    assert fsdp_partition_spec((16, 16), mesh) == P()
    # no divisible axis: replicated
    assert fsdp_partition_spec((1023, 255), mesh) == P()


def test_tensor_spec_rules():
    mesh = make_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    # column-parallel: output features sharded
    assert tensor_partition_spec(
        "blocks.0.attention.to_q.kernel", (128, 128), mesh
    ) == P(None, "tensor")
    assert tensor_partition_spec(
        "blocks.0.mlp.w_1.kernel", (128, 342), mesh
    ) == P(None, "tensor")
    # row-parallel: input features sharded, bias replicated
    assert tensor_partition_spec(
        "blocks.0.attention.to_o.kernel", (128, 128), mesh
    ) == P("tensor", None)
    assert tensor_partition_spec(
        "blocks.0.attention.to_o.bias", (128,), mesh
    ) == P()
    # non-target params: None (fall through to FSDP)
    assert tensor_partition_spec(
        "blocks.0.norm.scale", (128,), mesh
    ) is None
    # tensor axis of 1: disabled
    mesh1 = make_mesh({"data": 8, "fsdp": 1, "tensor": 1})
    assert tensor_partition_spec(
        "blocks.0.attention.to_q.kernel", (128, 128), mesh1
    ) is None


def test_tp_matmul_matches_replicated():
    """A column->row parallel pair under the mesh must match the unsharded
    computation (GSPMD inserts the all-reduce)."""

    class Block(nnx.Module):
        def __init__(self, rngs):
            self.to_q = nnx.Linear(64, 128, rngs=rngs)
            self.to_o = nnx.Linear(128, 64, rngs=rngs)

        def __call__(self, x):
            return self.to_o(jax.nn.gelu(self.to_q(x)))

    block = Block(nnx.Rngs(0))
    x = jax.random.normal(jax.random.key(0), (8, 16, 64))
    expected = block(x)

    mesh = make_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    shard_module(block, mesh, min_size_to_shard=1)
    specs = {
        ".".join(map(str, p)): v.value.sharding.spec
        for p, v in nnx.to_flat_state(nnx.state(block, nnx.Param))
    }
    assert specs["to_q.kernel"] == P(None, "tensor")
    assert specs["to_o.kernel"] == P("tensor", None)

    xs = shard_batch(x, mesh)
    graphdef, state = nnx.split(block)

    @jax.jit
    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    out = fwd(state, xs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=1e-5
    )


def _expected_tp_map(root) -> dict[str, str]:
    """Type-derived TP intent: walk the module tree and mark, per known
    attention/MLP class, which child Linears are column/row targets. This is
    independent of the path-rule matcher in mesh.py, so comparing the two
    catches both missed targets and unintended rule hits (VERDICT r3 #6)."""
    from vision_pt_tpu.models.cogview4 import denoiser as cog_d
    from vision_pt_tpu.models.jit import denoiser as jit_d
    from vision_pt_tpu.models.sdxl import denoiser as sdxl_d

    expected: dict[str, str] = {}
    for path, mod in nnx.iter_graph(root):
        if not isinstance(mod, nnx.Module):
            continue
        prefix = tuple(str(p) for p in path)

        def mark(attr: str, kind: str, _mod=mod, _prefix=prefix):
            sub = getattr(_mod, attr, None)
            if sub is None:
                return
            for pname in ("kernel", "bias"):
                if getattr(sub, pname, None) is not None:
                    expected[".".join(_prefix + (attr, pname))] = kind

        if isinstance(mod, (sdxl_d.SelfAttention, sdxl_d.CrossAttention,
                            cog_d.SelfAttention)):
            mark("to_q", "column")
            mark("to_k", "column")
            mark("to_v", "column")
            mark("to_out", "row")
        elif isinstance(mod, jit_d.Attention):  # PopeAttention subclasses it
            mark("to_q", "column")
            mark("to_k", "column")
            mark("to_v", "column")
            mark("to_o", "row")
        elif isinstance(mod, sdxl_d.GeGLU):
            mark("proj", "column")
        elif isinstance(mod, sdxl_d.FeedForward):
            mark("out", "row")
        elif isinstance(mod, cog_d.FeedForward):
            mark("proj", "column")
            mark("out", "row")
        elif isinstance(mod, jit_d.SwiGLU):
            mark("w_1", "column")
            mark("w_2", "column")
            mark("w_3", "row")
    return expected


def _assert_tp_rules_cover(model, min_column: int, min_row: int):
    from vision_pt_tpu.parallel.mesh import tp_classification

    expected = _expected_tp_map(model)
    actual = {}
    for path_tuple, var in nnx.to_flat_state(nnx.state(model, nnx.Param)):
        path = ".".join(str(p) for p in path_tuple)
        kind = tp_classification(path)
        if kind is not None:
            actual[path] = kind
    assert actual == expected, (
        "TP rule mismatch:\n"
        f"unintended: {sorted(set(actual) - set(expected))[:10]}\n"
        f"missed: {sorted(set(expected) - set(actual))[:10]}\n"
        f"reclassified: "
        f"{ {k: (actual[k], expected[k]) for k in actual if k in expected and actual[k] != expected[k]} }"
    )
    n_col = sum(1 for v in actual.values() if v == "column")
    n_row = sum(1 for v in actual.values() if v == "row")
    assert n_col >= min_column and n_row >= min_row, (n_col, n_row)


def test_tp_rules_exact_match_jit_tree():
    from vision_pt_tpu.models.jit.config import DenoiserConfig
    from vision_pt_tpu.models.jit.denoiser import Denoiser

    model = Denoiser(
        DenoiserConfig(
            patch_size=8, hidden_size=64, depth=3, num_heads=2,
            bottleneck_dim=16, context_dim=32, context_start_block=1,
            rope_axes_dims=[16, 8, 8], num_time_tokens=2,
        ),
        rngs=nnx.Rngs(0),
    )
    # 3 blocks x (q,k,v kernels+biases) + final-layer SwiGLU w_1/w_2
    _assert_tp_rules_cover(model, min_column=3 * 6 + 2, min_row=3 * 3 + 1)


def test_tp_rules_exact_match_sdxl_unet_tree():
    from vision_pt_tpu.models.sdxl.config import DenoiserConfig
    from vision_pt_tpu.models.sdxl.denoiser import Denoiser

    model = Denoiser(
        DenoiserConfig(
            hidden_dim=32, block_out_channels=[32, 32, 64],
            num_transformers_per_block=[1, 2, 10],
            num_head_channels=16, context_dim=32, layers_per_block=2,
        ),
        rngs=nnx.Rngs(0),
    )
    # every TransformerBlock: attn1 (3 no-bias kernels) + attn2 (3) + to_out
    # (kernel+bias) x2 + geglu.proj (kernel+bias) + ff.out (kernel+bias)
    _assert_tp_rules_cover(model, min_column=20, min_row=10)


def test_tp_rules_exact_match_cogview4_tree():
    from vision_pt_tpu.models.cogview4.config import DenoiserConfig
    from vision_pt_tpu.models.cogview4.denoiser import Denoiser

    model = Denoiser(
        DenoiserConfig(
            patch_size=2, in_channels=4, out_channels=4, num_layers=2,
            attention_head_dim=16, num_attention_heads=4, text_embed_dim=32,
            time_embed_dim=32, condition_dim=8, rope_axes_dim=[16, 16],
        ),
        rngs=nnx.Rngs(0),
    )
    _assert_tp_rules_cover(model, min_column=2 * 4, min_row=2 * 2)
