"""T5 encoder in Flax (t5x-style): the frozen text tower.

The reference wraps HF's torch ``T5ForConditionalGeneration`` and returns
``encoder.last_hidden_state`` (factory.py:14-41). Here the encoder is
implemented natively in JAX so text conditioning jits into the same XLA
program as the rest of the step; weights convert from any HF torch T5 /
FLAN-T5 checkpoint directory via ``load_t5_from_torch``.

Architecture (both T5 v1.0 and v1.1/FLAN variants):
- token embedding (shared), RMSNorm pre-norm blocks, final RMSNorm;
- self-attention WITHOUT 1/sqrt(d) scaling, relative position bias
  (32 buckets, max distance 128) owned by block 0 and shared;
- FFN: ReLU (v1.0) or gated-GeLU (v1.1 / flan).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@dataclass
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    is_gated_act: bool = True  # flan-t5 / v1.1
    dense_act_fn: str = "gelu_new"

    @classmethod
    def from_hf_config(cls, hf):
        get = (lambda k, d=None: getattr(hf, k, d)) if not isinstance(
            hf, dict
        ) else (lambda k, d=None: hf.get(k, d))
        return cls(
            vocab_size=get("vocab_size"),
            d_model=get("d_model"),
            d_kv=get("d_kv"),
            d_ff=get("d_ff"),
            num_layers=get("num_layers"),
            num_heads=get("num_heads"),
            relative_attention_num_buckets=get(
                "relative_attention_num_buckets", 32
            ),
            relative_attention_max_distance=get(
                "relative_attention_max_distance", 128
            ),
            layer_norm_epsilon=get("layer_norm_epsilon", 1e-6),
            is_gated_act=get("is_gated_act", False)
            or "gated" in str(get("feed_forward_proj", "")),
            dense_act_fn=get("dense_act_fn", "relu"),
        )


class RMSNorm(nn.Module):
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale", nn.initializers.ones, (x.shape[-1],), jnp.float32
        )
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale).astype(x.dtype)


def _relative_position_bucket(
    relative_position, num_buckets=32, max_distance=128
):
    """Bidirectional bucketing (HF modeling_t5 semantics)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5SelfAttention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        self.q = nn.Dense(inner, use_bias=False, dtype=self.dtype)
        self.k = nn.Dense(inner, use_bias=False, dtype=self.dtype)
        self.v = nn.Dense(inner, use_bias=False, dtype=self.dtype)
        self.o = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype)
        if self.has_relative_bias:
            self.relative_attention_bias = nn.Embed(
                cfg.relative_attention_num_buckets,
                cfg.num_heads,
                dtype=jnp.float32,
            )

    def compute_bias(self, length):
        cfg = self.config
        ctx = jnp.arange(length)[:, None]
        mem = jnp.arange(length)[None, :]
        buckets = _relative_position_bucket(
            mem - ctx,
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        )
        bias = self.relative_attention_bias(buckets)  # (L, L, H)
        return bias.transpose(2, 0, 1)[None]  # (1, H, L, L)

    def __call__(self, x, mask=None, position_bias=None):
        cfg = self.config
        b, l, _ = x.shape
        h, dk = cfg.num_heads, cfg.d_kv

        def heads(t):
            return t.reshape(b, l, h, dk).transpose(0, 2, 1, 3)

        q, k, v = heads(self.q(x)), heads(self.k(x)), heads(self.v(x))
        # T5: no 1/sqrt(d) scaling
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        if position_bias is None and self.has_relative_bias:
            position_bias = self.compute_bias(l)
        if position_bias is not None:
            scores = scores + position_bias
        if mask is not None:
            scores = jnp.where(
                mask[:, None, None, :] == 0, -1e9, scores
            )
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            v.dtype
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, h * dk)
        return self.o(out), position_bias


class T5FF(nn.Module):
    config: T5Config
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        if cfg.is_gated_act:
            self.wi_0 = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype)
            self.wi_1 = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype)
        else:
            self.wi = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype)
        self.wo = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype)

    def _act(self, x):
        if self.config.dense_act_fn in ("gelu_new", "gelu"):
            return jax.nn.gelu(x, approximate=True)
        return jax.nn.relu(x)

    def __call__(self, x):
        if self.config.is_gated_act:
            x = self._act(self.wi_0(x)) * self.wi_1(x)
        else:
            x = self._act(self.wi(x))
        return self.wo(x)


class T5Block(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.ln_0 = RMSNorm(self.config.layer_norm_epsilon)
        self.attn = T5SelfAttention(
            self.config, self.has_relative_bias, dtype=self.dtype
        )
        self.ln_1 = RMSNorm(self.config.layer_norm_epsilon)
        self.ff = T5FF(self.config, dtype=self.dtype)

    def __call__(self, x, mask=None, position_bias=None):
        y, position_bias = self.attn(self.ln_0(x), mask, position_bias)
        x = x + y
        x = x + self.ff(self.ln_1(x))
        return x, position_bias


class T5Encoder(nn.Module):
    config: T5Config
    dtype: Dtype = jnp.float32

    @property
    def embed_dim(self):
        return self.config.d_model

    def setup(self):
        cfg = self.config
        self.shared = nn.Embed(cfg.vocab_size, cfg.d_model,
                               dtype=self.dtype)
        self.blocks = [
            T5Block(cfg, has_relative_bias=(i == 0), dtype=self.dtype)
            for i in range(cfg.num_layers)
        ]
        self.final_layer_norm = RMSNorm(cfg.layer_norm_epsilon)

    def __call__(self, input_ids, attention_mask=None):
        x = self.shared(input_ids)
        bias = None
        for block in self.blocks:
            x, bias = block(x, attention_mask, bias)
        return self.final_layer_norm(x)


# ---------------------------------------------------------------------------
# HF torch checkpoint conversion
# ---------------------------------------------------------------------------


def convert_hf_t5_state_dict(state_dict, num_layers: int):
    """HF torch T5 state dict -> params for T5Encoder above. Dense kernels
    transpose (out,in)->(in,out); embeddings stay."""
    import numpy as np

    def g(key):
        v = state_dict[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    def lin(key):
        return jnp.asarray(g(key).transpose(1, 0))

    params = {
        "shared": {"embedding": jnp.asarray(g("shared.weight"))},
        "final_layer_norm": {
            "scale": jnp.asarray(g("encoder.final_layer_norm.weight"))
        },
    }
    for i in range(num_layers):
        p = f"encoder.block.{i}.layer"
        blk = {
            "ln_0": {"scale": jnp.asarray(g(f"{p}.0.layer_norm.weight"))},
            "attn": {
                "q": {"kernel": lin(f"{p}.0.SelfAttention.q.weight")},
                "k": {"kernel": lin(f"{p}.0.SelfAttention.k.weight")},
                "v": {"kernel": lin(f"{p}.0.SelfAttention.v.weight")},
                "o": {"kernel": lin(f"{p}.0.SelfAttention.o.weight")},
            },
            "ln_1": {"scale": jnp.asarray(g(f"{p}.1.layer_norm.weight"))},
        }
        if i == 0:
            blk["attn"]["relative_attention_bias"] = {
                "embedding": jnp.asarray(
                    g(f"{p}.0.SelfAttention.relative_attention_bias.weight")
                )
            }
        ff = {}
        if f"{p}.1.DenseReluDense.wi_0.weight" in state_dict:
            ff["wi_0"] = {"kernel": lin(f"{p}.1.DenseReluDense.wi_0.weight")}
            ff["wi_1"] = {"kernel": lin(f"{p}.1.DenseReluDense.wi_1.weight")}
        else:
            ff["wi"] = {"kernel": lin(f"{p}.1.DenseReluDense.wi.weight")}
        ff["wo"] = {"kernel": lin(f"{p}.1.DenseReluDense.wo.weight")}
        blk["ff"] = ff
        params[f"blocks_{i}"] = blk
    return params


def load_t5_from_torch(model_name_or_path: str, dtype=jnp.float32):
    """Build (T5Encoder, params) from a local HF torch T5 checkpoint."""
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    hf_cfg = HFT5Config.from_pretrained(model_name_or_path)
    tm = T5ForConditionalGeneration.from_pretrained(model_name_or_path)
    cfg = T5Config.from_hf_config(hf_cfg)
    enc = T5Encoder(cfg, dtype=dtype)
    params = convert_hf_t5_state_dict(tm.state_dict(), cfg.num_layers)
    return enc, params
