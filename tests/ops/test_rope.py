import jax.numpy as jnp
import numpy as np

from vision_pt_tpu.ops.rope import (
    RoPEFrequency,
    apply_rope,
    apply_rope_qk,
    get_rope_frequencies,
    image_position_indices,
)


def test_image_position_indices_layout():
    pos = image_position_indices(8, 6, rope_axes=3)
    assert pos.shape == (4 * 3, 3)
    # (zero, y, x), row-major over (y, x)
    np.testing.assert_array_equal(pos[0], [0, 0, 0])
    np.testing.assert_array_equal(pos[1], [0, 0, 1])
    np.testing.assert_array_equal(pos[3], [0, 1, 0])
    np.testing.assert_array_equal(pos[-1], [0, 3, 2])
    assert np.all(pos[:, 0] == 0)


def test_frequencies_shape_and_values():
    pos = image_position_indices(4, 4, rope_axes=3)
    freqs = get_rope_frequencies(pos, [4, 6, 6], theta=10000.0)
    assert freqs.shape == (4, 8, 2)  # (seq, sum(dims)//2, [cos, sin])
    # position 0 along all axes -> angle 0 -> cos=1, sin=0
    np.testing.assert_allclose(freqs[0, :, 0], 1.0, atol=1e-7)
    np.testing.assert_allclose(freqs[0, :, 1], 0.0, atol=1e-7)
    # cos^2 + sin^2 == 1
    np.testing.assert_allclose(
        freqs[..., 0] ** 2 + freqs[..., 1] ** 2, 1.0, atol=1e-6
    )


def test_apply_rope_preserves_norm_and_zero_position_identity():
    rng = np.random.default_rng(0)
    seq, dim = 6, 8
    pos = np.zeros((seq, 1), dtype=np.float32)
    pos[:, 0] = np.arange(seq)
    freqs = jnp.asarray(get_rope_frequencies(pos, [dim]))
    x = jnp.asarray(rng.normal(size=(2, seq, 3, dim)).astype(np.float32))
    # broadcast freqs over (batch, heads): (seq, d/2, 2) -> (seq, 1, d/2, 2)? our
    # layout is (..., seq, dim): use (B, H, S, D) style by moving heads forward
    xt = x.transpose(0, 2, 1, 3)  # (B, H, S, D)
    y = apply_rope(xt, freqs)
    # rotation preserves per-pair norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(xt), axis=-1),
        rtol=1e-5,
    )
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(y[:, :, 0]), np.asarray(xt[:, :, 0]), atol=1e-6)


def test_rope_relative_phase_property():
    """<rope(q, m), rope(k, n)> depends only on m - n."""
    rng = np.random.default_rng(1)
    dim = 8
    q = rng.normal(size=(dim,)).astype(np.float32)
    k = rng.normal(size=(dim,)).astype(np.float32)

    def dot_at(m, n):
        pos = np.array([[m], [n]], dtype=np.float32)
        freqs = jnp.asarray(get_rope_frequencies(pos, [dim]))
        qr, kr = apply_rope_qk(
            jnp.asarray(q)[None, None, None, :].repeat(2, axis=2),
            jnp.asarray(k)[None, None, None, :].repeat(2, axis=2),
            freqs,
        )
        return float(jnp.dot(qr[0, 0, 0], kr[0, 0, 1]))

    assert abs(dot_at(3, 1) - dot_at(7, 5)) < 1e-4
    assert abs(dot_at(0, 0) - dot_at(9, 9)) < 1e-4


def test_rope_frequency_helper():
    rf = RoPEFrequency([4, 6, 6], theta=10000.0)
    pos = rf.get_image_position_indices(8, 8)
    freqs = rf(pos)
    assert freqs.shape == (16, 8, 2)
    txt = rf.get_text_position_indices(5)
    assert txt.shape == (5, 3)
    assert np.all(txt == 0)
