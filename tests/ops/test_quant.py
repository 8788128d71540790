import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vision_pt_tpu.ops.quant import (
    QuantLinear4bit,
    QuantLinearFP8,
    QuantLinearInt8,
    dequantize_4bit,
    detect_quant_type,
    quantize_4bit,
    quantize_inplace,
    quantize_state_dict,
    replace_by_prequantized_weights,
)
from vision_pt_tpu.ops.quant.nf4 import (
    NF4_CODE,
    QuantState4bit,
    state_from_bnb_dict,
    state_to_bnb_dict,
    unpack_4bit,
)
from vision_pt_tpu.ops.quant.pallas_nf4 import dequant_matmul_4bit


def test_nf4_codebook_properties():
    assert NF4_CODE.shape == (16,)
    assert NF4_CODE[0] == -1.0 and NF4_CODE[-1] == 1.0 and NF4_CODE[7] == 0.0
    assert np.all(np.diff(NF4_CODE) > 0)  # sorted ascending


def test_quantize_dequantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 128)).astype(np.float32) * 0.05
    packed, state = quantize_4bit(w, blocksize=64, quant_type="nf4")
    assert packed.dtype == np.uint8
    assert packed.shape == (64 * 128 // 2, 1)
    deq = np.asarray(dequantize_4bit(packed, state))
    assert deq.shape == w.shape
    # NF4 with blockwise absmax: relative error should be small
    rel = np.abs(deq - w).mean() / np.abs(w).mean()
    assert rel < 0.1, rel
    # codes at block max must be exact
    flat = w.reshape(-1, 64)
    maxpos = np.abs(flat).argmax(axis=1)
    np.testing.assert_allclose(
        deq.reshape(-1, 64)[np.arange(flat.shape[0]), maxpos],
        flat[np.arange(flat.shape[0]), maxpos],
        rtol=1e-6,
    )


def test_packing_order_high_nibble_first():
    w = np.asarray([[-1.0, 1.0, 0.0, 0.5]], dtype=np.float32)
    packed, state = quantize_4bit(w, blocksize=4)
    codes = unpack_4bit(packed)
    assert codes[0] == 0  # -1.0 -> index 0 in high nibble of byte 0
    assert codes[1] == 15  # 1.0
    assert codes[2] == 7  # 0.0


def test_bnb_state_dict_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(32, 64)).astype(np.float32)
    packed, state = quantize_4bit(w, quant_type="fp4")
    stats = state_to_bnb_dict(state)
    assert "quant_state.bitsandbytes__fp4" in stats
    parsed = state_from_bnb_dict(stats)
    assert parsed.shape == (32, 64)
    assert parsed.quant_type == "fp4"
    assert parsed.blocksize == 64
    np.testing.assert_array_equal(parsed.absmax, state.absmax)


def test_nested_absmax_denesting():
    """Compressed (double-quantized) stats de-nest using shipped maps."""
    import json

    absmax_true = np.asarray([0.5, 1.5, 2.5, 3.5], dtype=np.float32)
    offset = 2.0
    nested_map = np.linspace(-2, 2, 256).astype(np.float32)
    # pick codes whose map value * nested_absmax + offset == absmax_true
    nested_absmax = np.asarray([2.0], dtype=np.float32)
    target = (absmax_true - offset) / nested_absmax[0]
    codes = np.abs(nested_map[None, :] - target[:, None]).argmin(axis=1)
    meta = {
        "blocksize": 64, "dtype": "float32", "shape": [4, 64],
        "quant_type": "nf4", "nested_blocksize": 256, "nested_offset": offset,
    }
    stats = {
        "absmax": codes.astype(np.uint8),
        "nested_absmax": nested_absmax,
        "nested_quant_map": nested_map,
        "quant_map": NF4_CODE,
        "quant_state.bitsandbytes__nf4": np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        ).copy(),
    }
    state = state_from_bnb_dict(stats)
    np.testing.assert_allclose(state.absmax, absmax_true, atol=0.02)


def test_quant_linear_4bit_matches_dequant():
    rngs = nnx.Rngs(0)
    lin = nnx.Linear(128, 64, rngs=rngs)
    q = QuantLinear4bit.from_linear(lin)
    x = jax.random.normal(jax.random.key(0), (4, 128))
    y_q = q(x)
    w_deq = q.dequantized_kernel()
    y_ref = x @ w_deq + lin.bias.value
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_ref), atol=1e-4)
    # quantization error vs original should be moderate
    y_full = lin(x)
    rel = float(jnp.abs(y_q - y_full).mean() / jnp.abs(y_full).mean())
    assert rel < 0.2


def test_pallas_dequant_matmul_interpret():
    from vision_pt_tpu.ops.quant.pallas_nf4 import (
        repack_bnb,
        repack_deinterleaved,
    )

    rng = np.random.default_rng(2)
    w = rng.normal(size=(64, 256)).astype(np.float32) * 0.1
    packed, state = quantize_4bit(w)
    deint = repack_deinterleaved(packed, (64, 256))
    np.testing.assert_array_equal(repack_bnb(deint), packed)  # roundtrip
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    assert deint.shape == (128, 64)  # (in//2, out) transposed layout
    y_kernel = dequant_matmul_4bit(
        x,
        jnp.asarray(deint),
        jnp.asarray(state.absmax).reshape(64, 4).T,  # (in//BLOCK, out)
        interpret=True,
    )
    y_ref = x @ jnp.asarray(dequantize_4bit(packed, state)).T
    np.testing.assert_allclose(
        np.asarray(y_kernel), np.asarray(y_ref), atol=1e-3
    )


def test_pallas_dequant_matmul_interpret_bf16_tree():
    """bf16 activations take the int16 bit-pattern select tree; its output
    must equal the XLA dequant reference rounded to bf16."""
    from vision_pt_tpu.ops.quant.pallas_nf4 import repack_deinterleaved

    rng = np.random.default_rng(3)
    w = rng.normal(size=(64, 256)).astype(np.float32) * 0.1
    packed, state = quantize_4bit(w)
    deint = repack_deinterleaved(packed, (64, 256))
    x = jnp.asarray(rng.normal(size=(8, 256)), dtype=jnp.bfloat16)
    y_kernel = dequant_matmul_4bit(
        x,
        jnp.asarray(deint),
        jnp.asarray(state.absmax).reshape(64, 4).T,
        interpret=True,
    )
    w_ref = jnp.asarray(dequantize_4bit(packed, state)).astype(jnp.bfloat16)
    y_ref = x @ w_ref.T
    np.testing.assert_allclose(
        np.asarray(y_kernel, np.float32),
        np.asarray(y_ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_qlora_gradients_flow_to_adapter_only():
    from vision_pt_tpu.peft import AdapterParam, LoRAConfig, LoRALinear

    rngs = nnx.Rngs(0)
    lin = nnx.Linear(128, 64, rngs=rngs)
    q = QuantLinear4bit.from_linear(lin)
    lora = LoRALinear(LoRAConfig(rank=4, dtype="float32"), q, rngs=rngs)
    x = jax.random.normal(jax.random.key(1), (2, 128))

    def loss(m, x):
        return jnp.sum(jnp.square(m(x)))

    grads = nnx.grad(loss, argnums=nnx.DiffState(0, AdapterParam))(lora, x)
    leaves = jax.tree.leaves(grads)
    assert len(leaves) == 2
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # input gradient flows through the quantized base
    gx = jax.grad(lambda x: loss(lora, x))(x)
    assert float(jnp.abs(gx).max()) > 0


def test_int8_and_fp8_linears():
    rngs = nnx.Rngs(0)
    lin = nnx.Linear(64, 32, rngs=rngs)
    x = jax.random.normal(jax.random.key(0), (4, 64))
    y_full = lin(x)
    for cls, tol in [(QuantLinearInt8, 0.03), (QuantLinearFP8, 0.1)]:
        q = cls.from_linear(lin)
        y_q = q(x)
        rel = float(jnp.abs(y_q - y_full).mean() / jnp.abs(y_full).mean())
        assert rel < tol, (cls.__name__, rel)


class _Net(nnx.Module):
    def __init__(self, rngs):
        self.to_q = nnx.Linear(32, 32, rngs=rngs)
        self.to_k = nnx.Linear(32, 32, rngs=rngs)

    def __call__(self, x):
        return self.to_q(x) + self.to_k(x)


def test_quantize_inplace_targets():
    net = _Net(nnx.Rngs(0))
    x = jax.random.normal(jax.random.key(0), (2, 32))
    y_before = net(x)
    replaced = quantize_inplace(net, "bnb_nf4", include_keys=["to_q"])
    assert replaced == ["to_q"]
    assert isinstance(net.to_q, QuantLinear4bit)
    assert isinstance(net.to_k, nnx.Linear)
    y_after = net(x)
    rel = float(jnp.abs(y_after - y_before).mean() / jnp.abs(y_before).mean())
    assert rel < 0.2


def test_prequantized_checkpoint_flow():
    """quantize_state_dict -> sniff -> replace_by_prequantized_weights."""
    net = _Net(nnx.Rngs(0))
    sd = {
        "to_q.weight": np.asarray(net.to_q.kernel.value).T,
        "to_q.bias": np.asarray(net.to_q.bias.value),
        "to_k.weight": np.asarray(net.to_k.kernel.value).T,
        "to_k.bias": np.asarray(net.to_k.bias.value),
    }
    qsd = quantize_state_dict(sd, "bnb_nf4", include_keys=["to_q"])
    children = {k[len("to_q.weight."):]: v for k, v in qsd.items()
                if k.startswith("to_q.weight.")}
    assert detect_quant_type(children) == "bnb_nf4"

    net2 = _Net(nnx.Rngs(0))
    x = jax.random.normal(jax.random.key(0), (2, 32))
    y_ref = net2(x)
    replaced = replace_by_prequantized_weights(net2, qsd)
    assert replaced == ["to_q"]
    y_q = net2(x)
    rel = float(jnp.abs(y_q - y_ref).mean() / jnp.abs(y_ref).mean())
    assert rel < 0.2
