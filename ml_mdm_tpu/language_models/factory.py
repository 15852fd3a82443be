"""Language model factory: tokenizer + frozen T5 encoder (JAX).

Reference surface (factory.py:44-140): ``create_lm(args)`` returns
(tokenizer, language_model); ``language_model(sample, tokenizer)`` returns
(lm_outputs, lm_mask). Modes:

- precomputed text embeddings (no LM at all, reader supplies
  ``text_embedding``) — ``--use-precomputed-text-embeddings``;
- categorical conditioning (one-hot of the first real token);
- full T5 encoder converted from a local HF torch checkpoint.

Zero-egress note: ``text_model`` may be a local path or an HF name with a
local cache; if the checkpoint is unavailable, pass
``use_precomputed_text_embeddings`` or a ``random:<d_model>`` spec (tiny
randomly initialised encoder — used by the hermetic tests).
"""
from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ml_mdm_tpu.language_models.t5 import (
    T5Config,
    T5Encoder,
    load_t5_from_torch,
)
from ml_mdm_tpu.language_models.tokenizer import Tokenizer


class LanguageModel:
    """Frozen text tower. Callable: (sample, tokenizer) -> (lm_outputs,
    lm_mask), both jnp arrays."""

    def __init__(self, args, encoder: Optional[T5Encoder], params=None):
        self.args = args
        self.encoder = encoder
        self.params = params
        self.embed_dim = encoder.embed_dim if encoder is not None else -1
        self._jit_forward = None
        if getattr(args, "use_precomputed_text_embeddings", 0):
            self.encoder = None
            self.params = None
            logging.info("<-- precomputed text embeddings: LM deleted -->")

    def _forward(self, tokens, mask):
        out = self.encoder.apply(
            {"params": self.params}, tokens, attention_mask=mask
        )
        return out.astype(jnp.float32)

    def __call__(self, sample, tokenizer) -> Tuple[jnp.ndarray, jnp.ndarray]:
        args = self.args
        tokens = jnp.asarray(np.asarray(sample["tokens"]), dtype=jnp.int32)

        if getattr(args, "categorical_conditioning", 0):
            one_hot = jax.nn.one_hot(
                tokens[:, 1], tokenizer.vocab_size, dtype=jnp.float32
            )
            return one_hot[:, None, :], None

        pad_token = tokenizer.token_id(args.reader_config.padding_token)
        lm_mask = (tokens != pad_token).astype(jnp.float32)
        if getattr(args, "use_precomputed_text_embeddings", 0):
            lm_outputs = jnp.asarray(
                np.asarray(sample["text_embedding"]), dtype=jnp.float32
            )
        else:
            if self._jit_forward is None:
                self._jit_forward = jax.jit(self._forward)
            lm_outputs = self._jit_forward(tokens, lm_mask)
        lm_outputs = lm_outputs * lm_mask[..., None]
        return lm_outputs, lm_mask


def create_tokenizer(vocab_file: str) -> Tokenizer:
    return Tokenizer(vocab_file, mode="t5")


def create_lm(args, device=None):
    """Returns (tokenizer, language_model). ``device`` kept for reference
    API compatibility (JAX manages placement)."""
    if getattr(args, "categorical_conditioning", 0):
        tokenizer = create_tokenizer(args.vocab_file)
        model = LanguageModel(args, None)
        model.embed_dim = tokenizer.vocab_size
        return tokenizer, model

    tokenizer = create_tokenizer(args.vocab_file)
    if getattr(args, "use_precomputed_text_embeddings", 0):
        return tokenizer, LanguageModel(args, None)

    text_model = getattr(args, "text_model", "google/flan-t5-xl")
    if str(text_model).startswith("random:"):
        # hermetic tiny encoder for tests / offline environments
        d = int(str(text_model).split(":")[1])
        cfg = T5Config(
            vocab_size=tokenizer.vocab_size + 16,
            d_model=d, d_kv=max(d // 4, 8), d_ff=2 * d,
            num_layers=2, num_heads=4,
        )
        enc = T5Encoder(cfg)
        params = jax.jit(enc.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8), jnp.int32),
            jnp.ones((1, 8)),
        )["params"]
        return tokenizer, LanguageModel(args, enc, params)

    enc, params = load_t5_from_torch(text_model)
    return tokenizer, LanguageModel(args, enc, params)
