import jax.numpy as jnp
import numpy as np

from vision_pt_tpu.ops.patch import patchify, pixel_shuffle_nhwc, unpatchify


def test_patchify_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 8, 12, 3)).astype(np.float32)
    out = patchify(jnp.asarray(img), patch_size=4)
    assert out.patches.shape == (2, 2 * 3, 4 * 4 * 3)
    assert (out.grid_height, out.grid_width) == (2, 3)
    rec = unpatchify(out.patches, 2, 3, patch_size=4, out_channels=3)
    np.testing.assert_allclose(np.asarray(rec), img, atol=1e-6)


def test_patchify_feature_order_matches_torch_nchw():
    """Feature axis must be flattened (c, ph, pw) like the reference's NCHW impl."""
    torch = __import__("torch")
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)  # NHWC
    ours = np.asarray(patchify(jnp.asarray(img), patch_size=2).patches)

    t = torch.from_numpy(img.transpose(0, 3, 1, 2))  # NCHW
    b, c, h, w = t.shape
    p = 2
    ref = (
        t.view(b, c, h // p, p, w // p, p)
        .permute(0, 2, 4, 1, 3, 5)
        .reshape(b, (h // p) * (w // p), p * p * c)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_pixel_shuffle_matches_torch():
    torch = __import__("torch")
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 5, 8)).astype(np.float32)  # NHWC, C=8=2*2*2
    ours = np.asarray(pixel_shuffle_nhwc(jnp.asarray(x), upscale=2))
    ref = (
        torch.nn.functional.pixel_shuffle(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 2
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-6)
