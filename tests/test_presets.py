"""Model-family presets: shapes init correctly and convert from matching HF
configs (ViT-L/14 exercised at reduced depth for speed)."""
import jax
import jax.numpy as jnp
import pytest

from prcv2025reid_tpu.configs import MODEL_PRESETS, TrainingConfig, apply_model_preset
from prcv2025reid_tpu.models.encoder import UnifiedEncoder


def test_presets_apply():
    c = apply_model_preset(TrainingConfig(), "clip-vit-large-patch14")
    assert c.vision_hidden_dim == 1024
    assert c.patch_size == 14
    assert c.fusion_dim == 768
    with pytest.raises(ValueError):
        apply_model_preset(TrainingConfig(), "nope")


@pytest.mark.parametrize("preset", sorted(MODEL_PRESETS))
def test_preset_encoder_initializes(preset):
    c = apply_model_preset(TrainingConfig(), preset)
    # shrink depth/vocab for test speed; widths/patching stay per preset
    c = c.replace(
        vision_layers=2,
        text_layers=1,
        text_vocab_size=64,
        text_context_length=8,
        compute_dtype="float32",
        use_pallas_attention=False,
    )
    enc = UnifiedEncoder.from_config(c, dtype=jnp.float32)
    S = c.image_size
    imgs = jnp.zeros((1, 4, S, S, 3))
    toks = jnp.zeros((1, 8), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), imgs, toks)
    v, t = enc.apply(params, imgs, toks)
    assert v.shape == (1, 4, c.fusion_dim)
    assert t.shape == (1, c.fusion_dim)
    # patch grid must tile the image exactly
    n_patches = (S // c.patch_size) ** 2
    assert params["params"]["vision"]["pos_embed"].shape[0] == n_patches + 1
