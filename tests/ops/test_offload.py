import jax
import jax.numpy as jnp
from flax import nnx

from vision_pt_tpu.ops.offload import (
    LayerwiseOffloadStrategy,
    OffloadableModuleMixin,
)


def test_group_schedule():
    """Group-head schedule matches reference offload.py:15-89 semantics."""
    s = LayerwiseOffloadStrategy([[0, 1], [2, 3], [4]], enabled=False)
    assert s.should_offload(0) and s.should_offload(2) and s.should_offload(4)
    assert not s.should_offload(1) and not s.should_offload(3)
    prev, nxt = s.offload_args[2]
    assert prev.layer_indices == [0, 1] and prev.to_host
    assert nxt.layer_indices == [2, 3] and not nxt.to_host
    prev0, nxt0 = s.offload_args[0]
    assert prev0.layer_indices == []


def test_from_num_groups():
    s = LayerwiseOffloadStrategy.from_num_groups(10, 3, enabled=False)
    assert [list(g) for g in s.layer_groups] == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]


def test_disabled_is_noop():
    layers = [nnx.Linear(4, 4, rngs=nnx.Rngs(i)) for i in range(4)]

    class M(OffloadableModuleMixin):
        pass

    m = M()
    m.set_offload_strategy(LayerwiseOffloadStrategy([[0, 1], [2, 3]], enabled=False))
    m.maybe_offload_by_group(layers, 2)  # must not crash on CPU
    x = jnp.ones((1, 4))
    for layer in layers:
        assert layer(x).shape == (1, 4)
