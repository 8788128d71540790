"""Class-label conditioning encoder (rebuild of reference
``src/models/jit/class_encoder.py``).

Tokenization is host-side NumPy; the embedding lookup is an nnx.Embed with an
extra zero-initialized padding row at index ``num_classes``.
"""

from __future__ import annotations

import warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...utils import PromptType


class ClassTokenizerOutput(NamedTuple):
    class_ids: np.ndarray  # (B, L) int32
    attention_mask: np.ndarray  # (B, L) int32; right-padded


class ClassTokenizer:
    """Tag-string -> id sequence with right padding
    (reference ``class_encoder.py:16-90``)."""

    def __init__(
        self,
        label2id: dict[str, int],
        splitter: str = " ",
        do_mask_padding: bool = True,
    ) -> None:
        self.label2id = label2id
        self.id2label = {v: k for k, v in label2id.items()}
        self.splitter = splitter
        self.do_mask_padding = do_mask_padding
        self.pad_token_id = len(label2id)
        assert all(i < len(label2id) for i in label2id.values()), (
            "All label IDs must be less than the number of classes."
        )

    def normalize_prompts(self, class_names: PromptType) -> list[str]:
        return class_names if isinstance(class_names, list) else [class_names]

    def tokenize(
        self, prompts: PromptType, max_length: int = 32
    ) -> ClassTokenizerOutput:
        texts = self.normalize_prompts(prompts)
        ids_batch: list[list[int]] = []
        for text in texts:
            ids = []
            for label in text.split(self.splitter):
                label = label.strip()
                if not label:
                    continue
                label_id = self.label2id.get(label)
                if label_id is not None:
                    ids.append(label_id)
                else:
                    warnings.warn(f"Label '{label}' not found in label2id mapping.")
            ids_batch.append(ids)

        padded_ids = np.full(
            (len(ids_batch), max_length), self.pad_token_id, dtype=np.int32
        )
        mask = np.zeros((len(ids_batch), max_length), dtype=np.int32)
        for i, ids in enumerate(ids_batch):
            n = min(len(ids), max_length)
            padded_ids[i, :n] = ids[:n]
            mask[i, :n] = 1
        if not self.do_mask_padding:
            mask = np.ones_like(padded_ids)
        return ClassTokenizerOutput(class_ids=padded_ids, attention_mask=mask)


class ClassEncoderOutput(NamedTuple):
    embeddings: jax.Array
    attention_mask: jax.Array


class ClassEncoder(nnx.Module):
    """Embedding lookup over class ids (reference ``class_encoder.py:98-144``)."""

    def __init__(
        self,
        label2id: dict[str, int],
        embedding_dim: int,
        splitter: str = " ",
        do_mask_padding: bool = True,
        *,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.num_classes = len(label2id)
        self.pad_token_id = self.num_classes
        # normal(0.02) init, zeroed padding row (torch padding_idx semantics)
        init = nnx.initializers.normal(stddev=0.02)
        table = init(rngs.params(), (self.num_classes + 1, embedding_dim), param_dtype)
        table = table.at[self.pad_token_id].set(0.0)
        self.embedding = nnx.Param(table)
        self.tokenizer = ClassTokenizer(
            label2id=label2id, splitter=splitter, do_mask_padding=do_mask_padding
        )

    def __call__(self, class_ids: jax.Array) -> jax.Array:
        return self.embedding.value[class_ids]

    def encode_prompts(
        self, prompts: PromptType, max_token_length: int = 32
    ) -> ClassEncoderOutput:
        class_ids, attention_mask = self.tokenizer.tokenize(
            prompts, max_length=max_token_length
        )
        return ClassEncoderOutput(
            embeddings=self(jnp.asarray(class_ids)),
            attention_mask=jnp.asarray(attention_mask),
        )
