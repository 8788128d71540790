"""JiT checkpoint layout conversion: PyTorch reference keys <-> NNX state.

The reference saves ``denoiser.*`` / ``class_encoder.*`` / ``text_encoder.*``
prefixed safetensors with torch layouts (reference
``src/models/jit/pipeline.py:50-88``). Differences handled here:

- ``Linear.weight`` (out, in) <-> nnx kernel (in, out): transpose
- ``patch_embedder.proj_1.weight`` conv (bott, C, P, P) <-> matmul kernel
  (C*P*P, bott): flatten + transpose (the flatten order matches our
  patchify's (c, ph, pw) feature order)
- ``patch_embedder.proj_2.weight`` 1x1 conv (hidden, bott, 1, 1) <-> (bott, hidden)
- ``time_embedder.mlp.0/.2`` <-> ``time_embedder.linear_1/linear_2``
  (same for image_size_embedder)
- ``class_encoder.embedding.weight`` <-> ``class_encoder.embedding`` (no transpose)
"""

from __future__ import annotations

import numpy as np

_MLP_SEQ_TO_LINEAR = [
    ("time_embedder.mlp.0.", "time_embedder.linear_1."),
    ("time_embedder.mlp.2.", "time_embedder.linear_2."),
    ("image_size_embedder.mlp.0.", "image_size_embedder.linear_1."),
    ("image_size_embedder.mlp.2.", "image_size_embedder.linear_2."),
]

# our apply_rope uses the rotate-half convention on a DEINTERLEAVED head-dim
# layout (2.2x faster on TPU than the reference's interleaved pairs, see
# denoiser.apply_rope); checkpoint interop folds the fixed permutation into
# the q/k projections + qk-norm scales. Attention scores are invariant (q
# and k permute identically), so model outputs match the reference exactly.
_ROPE_PERMUTE_SUFFIXES = (
    ".to_q.weight", ".to_k.weight", ".to_q.bias", ".to_k.bias",
    ".q_norm.weight", ".k_norm.weight",
)


def _rope_deint_perm(head_dim: int, inverse: bool = False) -> np.ndarray:
    perm = np.concatenate(
        [np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)]
    )
    return np.argsort(perm) if inverse else perm


def _permute_rope_param(value: np.ndarray, head_dim: int,
                        inverse: bool = False) -> np.ndarray:
    """Permute the OUT-features axis (torch layout: rows for 2D weights)
    within each head block."""
    perm = _rope_deint_perm(head_dim, inverse)
    if value.ndim == 1:
        return value.reshape(-1, head_dim)[:, perm].reshape(value.shape)
    return value.reshape(-1, head_dim, value.shape[1])[:, perm, :].reshape(
        value.shape
    )


def torch_to_nnx(
    torch_sd: dict[str, np.ndarray],
    rope_head_dim: int | None = None,
) -> dict[str, np.ndarray]:
    """Torch-layout flat dict -> NNX-layout flat dict (dotted keys).

    ``rope_head_dim``: pass the attention head dim for rope-positional models
    to fold the deinterleave permutation into q/k params (leave None for
    PoPE/NoPE variants, whose attention does not use apply_rope)."""
    out: dict[str, np.ndarray] = {}
    for key, value in torch_sd.items():
        value = np.asarray(value)
        if rope_head_dim is not None and key.endswith(_ROPE_PERMUTE_SUFFIXES):
            value = _permute_rope_param(value, rope_head_dim)
        new_key = key
        for old, new in _MLP_SEQ_TO_LINEAR:
            if old in new_key:
                new_key = new_key.replace(old, new)
                break

        if new_key.endswith("patch_embedder.proj_1.weight"):
            # (bott, C, P, P) -> (C*P*P, bott)
            out[new_key.replace(".weight", ".kernel")] = value.reshape(
                value.shape[0], -1
            ).T
        elif new_key.endswith("patch_embedder.proj_2.weight"):
            # (hidden, bott, 1, 1) -> (bott, hidden)
            out[new_key.replace(".weight", ".kernel")] = value[:, :, 0, 0].T
        elif new_key.endswith("embedding.weight"):
            out[new_key.replace(".weight", "")] = value
        elif new_key.endswith(".weight") and value.ndim == 2:
            out[new_key.replace(".weight", ".kernel")] = value.T
        else:
            # norms (.weight 1D), biases, time_position_embeds, pope_bias
            out[new_key] = value
    return out


def nnx_to_torch(
    nnx_sd: dict[str, np.ndarray],
    rope_head_dim: int | None = None,
) -> dict[str, np.ndarray]:
    """NNX-layout flat dict -> torch-layout flat dict (for checkpoint export
    that the PyTorch reference can load). ``rope_head_dim`` un-applies the
    rotate-half deinterleave permutation (see :func:`torch_to_nnx`)."""
    out: dict[str, np.ndarray] = {}
    for key, value in nnx_sd.items():
        value = np.asarray(value)
        new_key = key
        for old, new in _MLP_SEQ_TO_LINEAR:
            if new in new_key:
                new_key = new_key.replace(new, old)
                break

        if new_key.endswith("patch_embedder.proj_1.kernel"):
            bott = value.shape[1]
            # (C*P*P, bott) -> (bott, C, P, P): caller reshapes spatial dims;
            # store flattened conv layout which torch can view back.
            out[new_key.replace(".kernel", ".weight")] = value.T  # (bott, C*P*P)
        elif new_key.endswith("patch_embedder.proj_2.kernel"):
            out[new_key.replace(".kernel", ".weight")] = value.T[:, :, None, None]
        elif new_key.endswith("class_encoder.embedding") or new_key.endswith(
            ".embedding"
        ):
            out[new_key + ".weight"] = value
        elif new_key.endswith(".kernel") and value.ndim == 2:
            out[new_key.replace(".kernel", ".weight")] = value.T
        else:
            out[new_key] = value
    if rope_head_dim is not None:
        for k in list(out):
            if k.endswith(_ROPE_PERMUTE_SUFFIXES):
                out[k] = _permute_rope_param(
                    out[k], rope_head_dim, inverse=True
                )
    return out


def nnx_to_torch_with_conv_shape(
    nnx_sd: dict[str, np.ndarray],
    patch_size: int,
    in_channels: int,
    rope_head_dim: int | None = None,
) -> dict[str, np.ndarray]:
    """Like :func:`nnx_to_torch` but restores the 4D conv shape of proj_1."""
    out = nnx_to_torch(nnx_sd, rope_head_dim=rope_head_dim)
    for key, value in list(out.items()):
        if key.endswith("patch_embedder.proj_1.weight") and value.ndim == 2:
            out[key] = value.reshape(
                value.shape[0], in_channels, patch_size, patch_size
            )
    return out
