"""t5 conditioning mode: frozen class-name embedding table end to end.

Uses a tiny randomly-initialized FlaxT5EncoderModel and a stub tokenizer —
no network, no pretrained weights (zero-egress environment); what's under
test is the table construction, the FrozenTableEncoder wiring, and that the
multi-token context drives UNet cross-attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_classifier_tpu.engine.denoiser import Denoiser
from diffusion_classifier_tpu.models import UNetCondition2D, UNetConfig
from diffusion_classifier_tpu.models.encoders import (
    FrozenTableEncoder,
    build_t5_class_table,
    make_encoder,
)

transformers = pytest.importorskip("transformers")

D_MODEL = 16
CLASSES = ["cat", "dog", "frog"]


def tiny_t5():
    cfg = transformers.T5Config(
        d_model=D_MODEL, d_ff=32, num_layers=1, num_heads=2, vocab_size=64, d_kv=8
    )
    return transformers.FlaxT5EncoderModel(cfg, seed=0)


def stub_tokenize(texts, max_length):
    ids = np.zeros((len(texts), max_length), np.int32)
    for i, t in enumerate(texts):
        for j, ch in enumerate(t[:max_length]):
            ids[i, j] = (ord(ch) % 63) + 1
    return ids


def test_build_table_shape_and_null_row():
    table = build_t5_class_table(
        CLASSES, model=tiny_t5(), max_length=6, tokenize_fn=stub_tokenize
    )
    assert table.shape == (4, 6, D_MODEL)  # 3 classes + null
    # null row (empty text) differs from class rows
    assert float(jnp.abs(table[0] - table[3]).max()) > 1e-6


def test_make_encoder_t5_mode():
    table = build_t5_class_table(
        CLASSES, model=tiny_t5(), max_length=6, tokenize_fn=stub_tokenize
    )
    enc, null = make_encoder("t5", num_classes=3, t5_table=table)
    assert isinstance(enc, FrozenTableEncoder) and null == 3
    out = enc.apply({"params": {}}, jnp.array([0, 3]))
    assert out.shape == (2, 6, D_MODEL)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(table[3]), atol=1e-6)

    with pytest.raises(AssertionError, match="precomputed"):
        make_encoder("t5", num_classes=3)


def test_t5_context_drives_unet_cross_attention():
    table = build_t5_class_table(
        CLASSES, model=tiny_t5(), max_length=6, tokenize_fn=stub_tokenize
    )
    enc, _ = make_encoder("t5", num_classes=3, t5_table=table)
    backbone = UNetCondition2D(
        UNetConfig(
            sample_size=8,
            in_channels=1,
            out_channels=1,
            block_out_channels=(16, 32),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            layers_per_block=1,
            attention_head_dim=2,
            cross_attention_dim=16,
            encoder_hid_dim=D_MODEL,
            encoder_hid_dim_type="text_proj",
            norm_num_groups=8,
        )
    )
    denoiser = Denoiser(backbone=backbone, encoder=enc)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 1))
    lg = jnp.zeros(2)
    params = denoiser.init(rng, x, lg, jnp.array([0, 1]))
    out_a = denoiser.apply(params, x, lg, jnp.array([0, 0]))
    out_b = denoiser.apply(params, x, lg, jnp.array([1, 1]))
    assert float(jnp.abs(out_a - out_b).max()) > 1e-6
