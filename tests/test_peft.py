import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vision_pt_tpu.peft import (
    AdapterParam,
    LoHaConfig,
    LoHaLinear,
    LoRAConfig,
    LoRALinear,
    PeftTargetConfig,
    RegexMatch,
    calculate_trainable_parameters,
    detect_peft_method,
    get_adapter_parameters,
    iter_named_modules,
    load_peft_weight,
    replace_to_peft_layer,
    while_peft_disabled,
)


class TinyNet(nnx.Module):
    def __init__(self, rngs):
        self.to_q = nnx.Linear(8, 8, rngs=rngs)
        self.to_k = nnx.Linear(8, 8, rngs=rngs)
        self.blocks = nnx.List(
            [nnx.Linear(8, 8, rngs=rngs) for _ in range(2)]
        )
        self.out_proj = nnx.Linear(8, 4, rngs=rngs)

    def __call__(self, x):
        h = self.to_q(x) + self.to_k(x)
        for b in self.blocks:
            h = b(h)
        return self.out_proj(h)


def test_iter_named_modules_paths():
    net = TinyNet(nnx.Rngs(0))
    paths = [p for p, _ in iter_named_modules(net)]
    assert "to_q" in paths
    assert "blocks.0" in paths and "blocks.1" in paths
    assert "out_proj" in paths


def test_lora_starts_as_identity():
    rngs = nnx.Rngs(0)
    lin = nnx.Linear(8, 8, rngs=rngs)
    lora = LoRALinear(LoRAConfig(rank=4, alpha=2.0, dtype="float32"), lin, rngs=rngs)
    x = jax.random.normal(jax.random.key(0), (2, 8))
    np.testing.assert_allclose(
        np.asarray(lora(x)), np.asarray(lin(x)), atol=1e-6
    )  # lora_up is zero-init
    # nonzero after perturbing up
    lora.lora_up.value = jnp.ones_like(lora.lora_up.value)
    assert float(jnp.max(jnp.abs(lora(x) - lin(x)))) > 1e-3


def test_loha_starts_as_identity():
    rngs = nnx.Rngs(0)
    lin = nnx.Linear(8, 8, rngs=rngs)
    loha = LoHaLinear(LoHaConfig(rank=4, dtype="float32"), lin, rngs=rngs)
    x = jax.random.normal(jax.random.key(0), (2, 8))
    np.testing.assert_allclose(np.asarray(loha(x)), np.asarray(lin(x)), atol=1e-6)


def test_replace_targets_include_exclude():
    net = TinyNet(nnx.Rngs(0))
    replaced = replace_to_peft_layer(
        net,
        include_keys=["to_", RegexMatch(regex=r"blocks\.\d+")],
        exclude_keys=["to_k"],
        config=LoRAConfig(rank=2, dtype="float32"),
    )
    assert set(replaced) == {"to_q", "blocks.0", "blocks.1"}
    assert isinstance(net.to_q, LoRALinear)
    assert isinstance(net.to_k, nnx.Linear)
    assert isinstance(net.blocks[0], LoRALinear)
    x = jax.random.normal(jax.random.key(0), (2, 8))
    assert net(x).shape == (2, 4)


def test_adapter_state_dict_roundtrip_and_detection():
    net = TinyNet(nnx.Rngs(0))
    replace_to_peft_layer(
        net, ["to_q"], [], LoRAConfig(rank=2, alpha=4.0, dtype="float32")
    )
    net.to_q.lora_up.value = jnp.ones_like(net.to_q.lora_up.value)
    sd = get_adapter_parameters(net)
    assert "to_q.lora_down.weight" in sd
    assert sd["to_q.lora_down.weight"].shape == (2, 8)  # torch layout (rank, in)
    assert float(sd["to_q.alpha"]) == 4.0
    assert detect_peft_method(sd) == "lora"

    # load into a fresh net with plain Linears -> layers get replaced
    net2 = TinyNet(nnx.Rngs(0))
    affected = load_peft_weight(net2, sd)
    assert affected == ["to_q"]
    assert isinstance(net2.to_q, LoRALinear)
    x = jax.random.normal(jax.random.key(1), (2, 8))
    np.testing.assert_allclose(
        np.asarray(net.to_q(x)), np.asarray(net2.to_q(x)), atol=1e-5
    )


def test_enable_disable_context():
    net = TinyNet(nnx.Rngs(0))
    replace_to_peft_layer(net, ["to_q"], [], LoRAConfig(rank=2, dtype="float32"))
    net.to_q.lora_up.value = jnp.ones_like(net.to_q.lora_up.value)
    x = jax.random.normal(jax.random.key(0), (2, 8))
    with_lora = np.asarray(net.to_q(x))
    with while_peft_disabled(net):
        without = np.asarray(net.to_q(x))
    again = np.asarray(net.to_q(x))
    assert np.abs(with_lora - without).max() > 1e-4
    np.testing.assert_array_equal(with_lora, again)


def test_trainable_parameter_counting():
    net = TinyNet(nnx.Rngs(0))
    full = calculate_trainable_parameters(net)
    assert full.trainable_params == full.all_param
    replace_to_peft_layer(net, ["to_q"], [], LoRAConfig(rank=2, dtype="float32"))
    peft = calculate_trainable_parameters(net)
    assert peft.trainable_params == 2 * 8 * 2  # down + up
    assert peft.trainable_percent < 100.0


def test_grad_only_flows_to_adapters():
    net = TinyNet(nnx.Rngs(0))
    replace_to_peft_layer(net, ["to_q"], [], LoRAConfig(rank=2, dtype="float32"))
    x = jax.random.normal(jax.random.key(0), (2, 8))

    def loss_fn(m):
        return jnp.sum(jnp.square(m(x)))

    grads = nnx.grad(loss_fn, argnums=nnx.DiffState(0, AdapterParam))(net)
    leaves = jax.tree.leaves(grads)
    assert len(leaves) == 2  # lora_down + lora_up only
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_peft_target_config_validation():
    with pytest.raises(ValueError):
        PeftTargetConfig(include_keys=[], config=LoRAConfig(rank=2))
    cfg = PeftTargetConfig(
        include_keys=["to_q"], config={"type": "lora", "rank": 4}
    )
    assert cfg.config.rank == 4


def test_lora_merged_kernel():
    rngs = nnx.Rngs(0)
    lin = nnx.Linear(8, 8, rngs=rngs)
    lora = LoRALinear(LoRAConfig(rank=2, alpha=2.0, dtype="float32"), lin, rngs=rngs)
    lora.lora_up.value = jax.random.normal(jax.random.key(2), (2, 8)) * 0.1
    x = jax.random.normal(jax.random.key(0), (4, 8))
    merged = x @ lora.merged_kernel() + lin.bias.value
    np.testing.assert_allclose(np.asarray(lora(x)), np.asarray(merged), atol=1e-5)
