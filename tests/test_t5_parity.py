"""T5 encoder torch-vs-JAX numerical parity (the test_unet_mlx.py
pattern from the reference, applied to the text tower): a tiny randomly
initialised HF torch T5 converts through convert_hf_t5_state_dict and
must match last_hidden_state."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_hf(gated: bool):
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    cfg = HFT5Config(
        vocab_size=64,
        d_model=32,
        d_kv=8,
        d_ff=48,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu" if gated else "relu",
        dropout_rate=0.0,
        is_encoder_decoder=True,
        tie_word_embeddings=not gated,
    )
    torch.manual_seed(0)
    return T5ForConditionalGeneration(cfg).eval(), cfg


@pytest.mark.parametrize("gated", [True, False])
def test_t5_encoder_parity(gated):
    from ml_mdm_tpu.language_models.t5 import (
        T5Config,
        T5Encoder,
        convert_hf_t5_state_dict,
    )

    tm, hf_cfg = _tiny_hf(gated)
    cfg = T5Config.from_hf_config(hf_cfg)
    enc = T5Encoder(cfg)
    params = convert_hf_t5_state_dict(tm.state_dict(), cfg.num_layers)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 64, size=(3, 11))
    mask = np.ones((3, 11), dtype=np.int64)
    mask[1, 7:] = 0
    mask[2, 4:] = 0

    with torch.no_grad():
        ref = tm.encoder(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()

    out = enc.apply(
        {"params": params},
        jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(mask),
    )
    out = np.asarray(out)

    # masked positions may legitimately differ (torch zeroes nothing,
    # both sides just never attend to them) — compare valid positions
    for b in range(3):
        valid = int(mask[b].sum())
        np.testing.assert_allclose(
            out[b, :valid], ref[b, :valid], rtol=2e-4, atol=2e-5
        )
