import jax
import jax.numpy as jnp
import numpy as np
import pytest

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

    with pytest.raises(ValueError, match="pretrained"):
        LPIPS()


def _tiny_vgg_state_dict(rng, layout="torchvision"):
    """Random VGG16-conv weights in torch layouts, scaled small so deep
    activations stay finite."""
    import numpy as np

    from vision_pt_tpu.ops.loss.perceptual import _VGG16_CONV_IDX, _VGG16_STAGES

    sd = {}
    for k, (stage, idxs) in enumerate(zip(_VGG16_STAGES, _VGG16_CONV_IDX)):
        slice_start = [0, 4, 9, 16, 23][k]
        for (cin, cout), idx in zip(stage, idxs):
            w = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
            w *= np.sqrt(2.0 / (cin * 9))
            b = rng.standard_normal(cout).astype(np.float32) * 0.01
            if layout == "torchvision":
                sd[f"features.{idx}.weight"] = w
                sd[f"features.{idx}.bias"] = b
            else:  # torchmetrics / lpips package
                sd[f"net.slice{k + 1}.{idx}.weight"] = w
                sd[f"net.slice{k + 1}.{idx}.bias"] = b
        if layout != "torchvision":
            lin = np.abs(rng.standard_normal((1, stage[-1][1], 1, 1))).astype(
                np.float32
            )
            sd[f"lin{k}.model.1.weight"] = lin
    return sd


def _torch_lpips_reference(sd, x_np, y_np, layout):
    """Minimal torch implementation of the lpips-package math (scaling layer,
    VGG16 slices, unit-normalize, 1x1 lin heads, spatial mean)."""
    import torch
    import torch.nn.functional as F

    from vision_pt_tpu.ops.loss.perceptual import (
        _LPIPS_SCALE,
        _LPIPS_SHIFT,
        _VGG16_CONV_IDX,
        _VGG16_STAGES,
    )

    def prep(a):
        a = torch.from_numpy(a).permute(0, 3, 1, 2) * 2.0 - 1.0  # NCHW [-1,1]
        shift = torch.tensor(_LPIPS_SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(_LPIPS_SCALE).view(1, 3, 1, 1)
        return (a - shift) / scale

    def unit(a):
        return a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)

    fx, fy = prep(x_np), prep(y_np)
    total = torch.zeros(x_np.shape[0])
    for k, (stage, idxs) in enumerate(zip(_VGG16_STAGES, _VGG16_CONV_IDX)):
        if k > 0:
            fx = F.max_pool2d(fx, 2)
            fy = F.max_pool2d(fy, 2)
        for (cin, cout), idx in zip(stage, idxs):
            if layout == "torchvision":
                w, b = sd[f"features.{idx}.weight"], sd[f"features.{idx}.bias"]
            else:
                w = sd[f"net.slice{k + 1}.{idx}.weight"]
                b = sd[f"net.slice{k + 1}.{idx}.bias"]
            w, b = torch.from_numpy(w), torch.from_numpy(b)
            fx = F.relu(F.conv2d(fx, w, b, padding=1))
            fy = F.relu(F.conv2d(fy, w, b, padding=1))
        if layout == "torchvision":
            lin = torch.full((stage[-1][1],), 1.0 / stage[-1][1])
        else:
            lin = torch.from_numpy(sd[f"lin{k}.model.1.weight"]).view(-1)
        diff = (unit(fx) - unit(fy)).pow(2)
        total = total + (diff * lin.view(1, -1, 1, 1)).sum(1).mean(dim=(1, 2))
    return total.numpy()


@pytest.mark.parametrize("layout", ["torchvision", "torchmetrics"])
@pytest.mark.slow
def test_lpips_parity_vs_torch(tmp_path, layout):
    """JAX LPIPS matches a torch implementation of the lpips-package math on
    both accepted weight layouts (reference wraps torchmetrics LPIPS,
    ``src/modules/loss/perceptual.py:37-86``)."""
    import numpy as np

    from vision_pt_tpu.ops.loss.perceptual import LPIPS

    rng = np.random.default_rng(0)
    sd = _tiny_vgg_state_dict(rng, layout)

    from safetensors.numpy import save_file

    path = str(tmp_path / "lpips.safetensors")
    save_file(sd, path)

    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

    ours = np.asarray(LPIPS(path)(jnp.asarray(x), jnp.asarray(y)))
    ref = _torch_lpips_reference(sd, x, y, layout)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
    assert ours.shape == (2,)
    assert np.all(ours > 0)

    # identical inputs -> zero distance
    zero = np.asarray(LPIPS(path)(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(zero, 0.0, atol=1e-6)


@pytest.mark.slow
def test_lpips_in_perceptual_loss_and_grad(tmp_path):
    """PerceptualLoss({'lpips': ...}) works end-to-end with a weights path and
    is differentiable (DRaFT-style reward backprop needs the gradient)."""
    import numpy as np

    from vision_pt_tpu.ops.loss.perceptual import PerceptualLoss

    rng = np.random.default_rng(1)
    sd = _tiny_vgg_state_dict(rng, "torchmetrics")
    from safetensors.numpy import save_file

    path = str(tmp_path / "lpips.safetensors")
    save_file(sd, path)

    pl = PerceptualLoss(
        {"lpips": 1.0, "ssim": 0.5}, lpips_weights_path=path
    )
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    out = pl(x, y)
    assert float(out["lpips"]) > 0
    np.testing.assert_allclose(
        float(out["total"]),
        float(out["lpips"]) + 0.5 * float(out["ssim"]),
        rtol=1e-6,
    )

    g = jax.grad(lambda x: pl(x, y)["total"])(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
