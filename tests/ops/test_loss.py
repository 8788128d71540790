import jax
import jax.numpy as jnp
import numpy as np

from vision_pt_tpu.ops.loss import diffusion, flow_match, shortcut


def test_flow_match_interpolation_endpoints():
    key = jax.random.key(0)
    latents = jax.random.normal(jax.random.key(1), (4, 8, 8, 3))
    t0 = jnp.zeros((4,))
    t1 = jnp.ones((4,))
    noisy0, noise0 = flow_match.prepare_noised_latents(key, latents, t0)
    np.testing.assert_allclose(np.asarray(noisy0), np.asarray(latents), atol=1e-6)
    noisy1, noise1 = flow_match.prepare_noised_latents(key, latents, t1)
    np.testing.assert_allclose(np.asarray(noisy1), np.asarray(noise1), atol=1e-6)


def test_scaled_noised_polarity():
    key = jax.random.key(0)
    latents = jax.random.normal(jax.random.key(1), (2, 4, 4, 3))
    t = jnp.ones((2,))
    # clean_at_zero=False (JiT): t=1 is clean
    noisy, _ = flow_match.prepare_scaled_noised_latents(
        key, latents, t, clean_at_zero=False
    )
    np.testing.assert_allclose(np.asarray(noisy), np.asarray(latents), atol=1e-6)
    # clean_at_zero=True: t=1 is pure noise
    noisy2, noise2 = flow_match.prepare_scaled_noised_latents(
        key, latents, t, clean_at_zero=True
    )
    np.testing.assert_allclose(np.asarray(noisy2), np.asarray(noise2), atol=1e-6)


def test_velocity_target_and_loss():
    latents = jnp.ones((2, 2, 2, 1))
    noise = 3.0 * jnp.ones((2, 2, 2, 1))
    v = flow_match.get_flow_match_target_velocity(latents, noise)
    np.testing.assert_allclose(np.asarray(v), 2.0)
    loss = flow_match.loss_with_predicted_velocity(latents, noise, jnp.zeros_like(v))
    np.testing.assert_allclose(float(loss), 4.0, atol=1e-6)


def test_convert_x0_to_velocity_consistency():
    """x0->v then Euler integration recovers direction of (x0 - x_t)/(1-t)."""
    key = jax.random.key(0)
    x0 = jax.random.normal(jax.random.key(1), (2, 4, 4, 3))
    t = jnp.asarray([0.3, 0.7])
    noisy, noise = flow_match.prepare_scaled_noised_latents(
        key, x0, t, clean_at_zero=True
    )
    v = flow_match.convert_x0_to_velocity(x0, noisy, t, clean_at_zero=True)
    want = (noisy - x0) / jnp.maximum(t, 1e-5).reshape(2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(v), np.asarray(want), rtol=1e-5)


def test_ddpm_noising_matches_torch_formula():
    torch = __import__("torch")
    acp_np = diffusion._alphas_cumprod(0.00085, 0.012, 1000)
    betas = (
        torch.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=torch.float32) ** 2
    )
    acp_t = torch.cumprod(1.0 - betas, dim=0).numpy()
    np.testing.assert_allclose(acp_np, acp_t, rtol=1e-5)

    key = jax.random.key(0)
    latents = jax.random.normal(jax.random.key(1), (2, 4, 4, 4))
    t = jnp.asarray([0, 999])
    noisy, noise = diffusion.prepare_noised_latents(key, latents, t)
    want = (
        np.sqrt(acp_np[np.asarray(t)])[:, None, None, None] * np.asarray(latents)
        + np.sqrt(1 - acp_np[np.asarray(t)])[:, None, None, None] * np.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(noisy), want, rtol=1e-4, atol=1e-5)


def test_diffusion_loss():
    noise = jnp.ones((2, 2))
    pred = jnp.zeros((2, 2))
    assert float(diffusion.loss_with_predicted_noise(None, noise, pred)) == 1.0


def test_shortcut_durations():
    d = shortcut.prepare_random_shortcut_durations(jax.random.key(0), 256, 0, 7)
    steps = np.asarray(d.inference_steps)
    assert set(np.unique(steps)).issubset({1, 2, 4, 8, 16, 32, 64})
    np.testing.assert_allclose(
        np.asarray(d.shortcut_duration), 1.0 / steps, rtol=1e-6
    )
    dep = np.asarray(d.departure_timesteps)
    assert np.all(dep > 0.0) and np.all(dep <= 1.0)
    # departure = a/steps for integer a in [1, steps]
    np.testing.assert_allclose(dep * steps, np.round(dep * steps), atol=1e-5)


def test_shortcut_self_consistency_targets_and_loss():
    def fake_denoiser(latents, ehs, t, dur):
        return latents * 0 + t.reshape(-1, 1, 1, 1)

    latents = jnp.ones((2, 2, 2, 1))
    t = jnp.asarray([0.5, 1.0])
    dur = jnp.asarray([0.25, 0.25])
    targets = shortcut.prepare_self_consistency_targets(
        fake_denoiser, latents, None, t, dur
    )
    np.testing.assert_allclose(
        np.asarray(targets.first_shortcut).reshape(2, -1)[:, 0], [0.5, 1.0]
    )
    np.testing.assert_allclose(
        np.asarray(targets.second_shortcut).reshape(2, -1)[:, 0], [0.375, 0.875]
    )
    loss = shortcut.loss_with_shortcut_self_consistency(
        targets.first_shortcut,
        targets.second_shortcut,
        jnp.zeros_like(targets.first_shortcut),
    )
    assert float(loss) > 0


def test_ssim_identity_and_noise():
    from vision_pt_tpu.ops.loss.perceptual import PerceptualLoss, ssim, ssim_loss

    key = jax.random.key(0)
    x = jax.random.uniform(key, (2, 32, 32, 3), minval=-1, maxval=1)
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-5)
    noisy = x + jax.random.normal(jax.random.key(1), x.shape) * 0.5
    s = np.asarray(ssim(x, noisy))
    assert np.all(s < 0.9)
    assert float(ssim_loss(x, x)) < 1e-5
    pl = PerceptualLoss({"ssim": 2.0})
    out = pl(x, noisy)
    np.testing.assert_allclose(
        float(out["total"]), 2.0 * float(out["ssim"]), rtol=1e-6
    )


def test_lpips_gated():
    import pytest

    from vision_pt_tpu.ops.loss.perceptual import LPIPS

    with pytest.raises(NotImplementedError, match="pretrained"):
        LPIPS()
