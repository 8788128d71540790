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
