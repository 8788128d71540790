import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vision_pt_tpu.ops.timestep import embedding as emb
from vision_pt_tpu.ops.timestep import sampling, schedule


def _ddpm_reference_embedding(timesteps, dim, max_period=10000, downscale_shift=1.0):
    """Independent numpy reimplementation of the DDPM/diffusers sinusoid."""
    half = dim // 2
    freqs = np.exp(
        -math.log(max_period) * np.arange(half, dtype=np.float64) / (half - downscale_shift)
    )
    args = timesteps[:, None].astype(np.float64) * freqs[None]
    out = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
    if dim % 2:
        out = np.pad(out, ((0, 0), (0, 1)))
    return out.astype(np.float32)


def test_timestep_embedding_golden():
    t = np.array([0.0, 1.0, 10.0, 999.0], dtype=np.float32)
    got = np.asarray(emb.get_timestep_embedding(jnp.asarray(t), 64))
    want = _ddpm_reference_embedding(t, 64)
    # fp32 sin/cos of large arguments (t=999) vs the fp64 reference: ~1e-3
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_timestep_embedding_flip_and_odd_dim():
    t = np.array([5.0], dtype=np.float32)
    flipped = np.asarray(
        emb.get_timestep_embedding(jnp.asarray(t), 8, flip_sin_to_cos=True)
    )
    plain = np.asarray(emb.get_timestep_embedding(jnp.asarray(t), 8))
    np.testing.assert_allclose(flipped[:, :4], plain[:, 4:], atol=1e-6)
    odd = np.asarray(emb.get_timestep_embedding(jnp.asarray(t), 7))
    assert odd.shape == (1, 7)
    assert odd[0, -1] == 0.0


def test_timestep_embedding_module():
    rngs = nnx.Rngs(0)
    mod = emb.TimestepEmbedding(16, 32, rngs=rngs)
    x = jax.random.normal(jax.random.key(0), (3, 16))
    assert mod(x).shape == (3, 32)


@pytest.mark.parametrize(
    "name",
    [
        "sigmoid",
        "shift_sigmoid",
        "uniform",
        "shift_uniform",
        "fraction_uniform",
        "shift_fraction_uniform",
        "scale_shift_sigmoid",
    ],
)
def test_continuous_samplers_in_unit_interval(name):
    key = jax.random.key(42)
    t = sampling.sample_timestep(key, 512, name)
    arr = np.asarray(t)
    assert arr.shape == (512,)
    assert np.all(arr >= 0.0) and np.all(arr <= 1.0)


def test_flux_shift_sampler():
    t = sampling.sample_timestep(
        jax.random.key(0), 256, "flux_shift", height=32, width=32
    )
    arr = np.asarray(t)
    assert np.all(arr > 0.0) and np.all(arr < 1.0)


def test_scale_shift_sigmoid_distribution():
    """JiT default: sigmoid(N(-0.8, 0.8)) has mean well below 0.5."""
    t = np.asarray(sampling.scale_shift_sigmoid_randn(jax.random.key(1), 8192))
    assert 0.28 < t.mean() < 0.38  # sigmoid(-0.8)≈0.31 plus Jensen spread


def test_shift_formula_golden():
    """(t*s)/(1+(s-1)t) at known points."""
    t = jnp.asarray([0.0, 0.5, 1.0])
    s = 3.0
    out = (t * s) / (1 + (s - 1) * t)
    np.testing.assert_allclose(np.asarray(out), [0.0, 0.75, 1.0], atol=1e-6)


def test_discrete_samplers():
    key = jax.random.key(7)
    u = np.asarray(sampling.uniform_randint(key, 1000, 0, 1000))
    assert u.min() >= 0 and u.max() < 1000
    g = np.asarray(sampling.gaussian_randint(key, 4000, 0, 1000, mean=500, std=100))
    assert 400 < g.mean() < 600
    s = np.asarray(sampling.sigmoid_randint(key, 1000, 0, 1000))
    assert s.min() >= 0 and s.max() <= 1000


def test_time_shift_linear_golden():
    """CogView4 linear shift: mu/(mu + (1/t - 1)) (reference sampling.py:27-31)."""
    t = jnp.asarray([0.25, 0.5, 1.0])
    out = np.asarray(sampling.time_shift_linear(2.0, t))
    np.testing.assert_allclose(out, [2 / 5, 2 / 3, 1.0], atol=1e-6)


def test_flux_schedule():
    sched = schedule.get_flux_schedule(8, image_seq_len=1024)
    assert len(sched) == 9
    assert sched[0] == pytest.approx(1.0)
    assert sched[-1] == pytest.approx(0.0)
    assert all(a > b for a, b in zip(sched, sched[1:]))
    # unshifted = plain linspace
    plain = schedule.get_flux_schedule(4, image_seq_len=1024, shift=False)
    np.testing.assert_allclose(plain, [1.0, 0.75, 0.5, 0.25, 0.0], atol=1e-7)


def test_linear_schedule():
    np.testing.assert_allclose(
        schedule.get_linear_schedule(5), [1.0, 0.75, 0.5, 0.25, 0.0], atol=1e-7
    )
