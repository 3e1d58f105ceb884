"""Encoder parity + behavior tests.

- Golden parity vs. torch oracles built from a randomly-initialized HF
  CLIPModel (offline-safe): text tower must match HF CLIPTextModel pooling +
  projection; the vision trunk must match the reference's composition of CLIP
  weights (patch conv -> CLS/pos -> blocks with erf-GELU -> post-LN -> proj,
  NO pre_layrnorm — models/clip_backbone.py:254-286).
- MER routing behavior: LoRA zero-init => per-modality outputs equal the
  shared trunk at step 0; diverge after perturbing one expert's lora_B
  (SURVEY.md §4 test tier b).
"""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from prcv2025reid_tpu.models.encoder import UnifiedEncoder
from prcv2025reid_tpu.tools.convert_clip import (
    convert_clip_params,
    state_dict_from_torch_model,
)

D_V, L_V, H_V, MLP_V = 64, 2, 4, 128
D_T, L_T, H_T, MLP_T = 32, 2, 4, 64
IMG, PATCH, PROJ = 32, 16, 32
VOCAB, CTX = 100, 16


@pytest.fixture(scope="module")
def hf_model():
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    torch.manual_seed(0)
    vision_cfg = CLIPVisionConfig(
        hidden_size=D_V,
        intermediate_size=MLP_V,
        num_hidden_layers=L_V,
        num_attention_heads=H_V,
        image_size=IMG,
        patch_size=PATCH,
        projection_dim=PROJ,
    )
    text_cfg = CLIPTextConfig(
        hidden_size=D_T,
        intermediate_size=MLP_T,
        num_hidden_layers=L_T,
        num_attention_heads=H_T,
        vocab_size=VOCAB,
        max_position_embeddings=CTX,
        projection_dim=PROJ,
        eos_token_id=VOCAB - 1,
        bos_token_id=VOCAB - 2,
    )
    cfg = CLIPConfig(
        text_config=text_cfg.to_dict(),
        vision_config=vision_cfg.to_dict(),
        projection_dim=PROJ,
    )
    return CLIPModel(cfg).eval()


@pytest.fixture(scope="module")
def encoder_and_params(hf_model):
    enc = UnifiedEncoder(
        embed_dim=D_V,
        num_layers=L_V,
        num_heads=H_V,
        mlp_dim=MLP_V,
        patch_size=PATCH,
        image_size=IMG,
        fusion_dim=PROJ,
        text_width=D_T,
        text_layers=L_T,
        text_heads=H_T,
        text_mlp_dim=MLP_T,
        text_vocab=VOCAB,
        context_length=CTX,
        dtype=jnp.float32,
        attn_impl="xla",
    )
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((1, 4, IMG, IMG, 3))
    toks = jnp.zeros((1, CTX), jnp.int32)
    params = enc.init(rng, imgs, toks)
    hf_sd = state_dict_from_torch_model(hf_model)
    converted = convert_clip_params(hf_sd, params, seed=0)
    return enc, converted


def _torch_vision_oracle(hf_model, images_nchw: torch.Tensor) -> torch.Tensor:
    """Reference-style vision forward on HF weights (independent oracle).

    Mirrors models/clip_backbone.py:254-286: conv patchify, CLS + pos embed,
    blocks as LN1->MHA->res, LN2->fc1->erf GELU->fc2->res, post-LN on CLS,
    visual projection.  Written from the published math, not the reference
    code.
    """
    vm = hf_model.vision_model
    with torch.no_grad():
        x = vm.embeddings.patch_embedding(images_nchw)  # [B, D, h, w]
        B, D, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)  # [B, N, D]
        cls = vm.embeddings.class_embedding.reshape(1, 1, -1).expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + vm.embeddings.position_embedding.weight.unsqueeze(0)
        n_heads = hf_model.config.vision_config.num_attention_heads
        for layer in vm.encoder.layers:
            h_in = layer.layer_norm1(x)
            q = layer.self_attn.q_proj(h_in)
            k = layer.self_attn.k_proj(h_in)
            v = layer.self_attn.v_proj(h_in)
            S = q.shape[1]
            hd = D // n_heads

            def split(t):
                return t.view(B, S, n_heads, hd).transpose(1, 2)

            attn = F.scaled_dot_product_attention(split(q), split(k), split(v))
            attn = attn.transpose(1, 2).reshape(B, S, D)
            x = x + layer.self_attn.out_proj(attn)
            h_in = layer.layer_norm2(x)
            h_in = layer.mlp.fc2(F.gelu(layer.mlp.fc1(h_in)))
            x = x + h_in
        x = vm.post_layernorm(x)
        return hf_model.visual_projection(x[:, 0])


class TestTextParity:
    def test_pooled_projection_matches_hf(self, hf_model, encoder_and_params):
        enc, params = encoder_and_params
        rng = np.random.default_rng(1)
        tokens = rng.integers(1, VOCAB - 2, (3, CTX))
        tokens[:, 0] = VOCAB - 2  # BOS
        tokens[:, 10] = VOCAB - 1  # EOT (max id -> argmax pooling)

        with torch.no_grad():
            hf_out = hf_model.text_model(input_ids=torch.tensor(tokens)).pooler_output
            hf_proj = hf_model.text_projection(hf_out).numpy()

        got = enc.apply(params, jnp.asarray(tokens), method=enc.encode_text)
        np.testing.assert_allclose(np.asarray(got), hf_proj, rtol=1e-4, atol=1e-5)


class TestVisionParity:
    def test_vis_modality_matches_reference_composition(
        self, hf_model, encoder_and_params
    ):
        enc, params = encoder_and_params
        rng = np.random.default_rng(2)
        imgs = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)

        want = _torch_vision_oracle(
            hf_model, torch.tensor(imgs.transpose(0, 3, 1, 2))
        ).numpy()
        got = enc.apply(params, jnp.asarray(imgs), 0, method=enc.encode_vision)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_single_channel_modality_uses_gray_kernel(
        self, hf_model, encoder_and_params
    ):
        """nir patch embed must equal conv with the channel-mean kernel on the
        grayscale image (+ the symmetry-breaking noise already in the params)."""
        enc, params = encoder_and_params
        rng = np.random.default_rng(3)
        imgs = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
        feats = enc.apply(params, jnp.asarray(imgs), 1, method=enc.encode_vision)
        assert np.isfinite(np.asarray(feats)).all()
        # grayscale invariance: permuting RGB channels leaves nir encoding fixed
        perm = imgs[..., [2, 0, 1]]
        feats_perm = enc.apply(params, jnp.asarray(perm), 1, method=enc.encode_vision)
        np.testing.assert_allclose(
            np.asarray(feats), np.asarray(feats_perm), rtol=1e-4, atol=1e-5
        )


class TestMERRouting:
    def test_lora_zero_init_all_modalities_equal_trunk(self, encoder_and_params):
        """At step 0 delta-W=0, so routing to different experts over the SAME
        patch tokens must give identical trunk outputs.  We check vis vs cp
        (both 3-channel, but different patch embeds) via the trunk directly."""
        enc, params = encoder_and_params
        rng = np.random.default_rng(4)
        tokens = jnp.asarray(rng.normal(size=(1, 2, 4, D_V)), jnp.float32)

        def run(mod_id):
            return enc.apply(
                params,
                tokens,
                (mod_id,),
                method=lambda m, t, ids: m.vision.trunk(t, ids),
            )

        outs = [np.asarray(run(i)) for i in range(4)]
        for i in range(1, 4):
            np.testing.assert_allclose(outs[0], outs[i], rtol=1e-5, atol=1e-6)

    def test_perturbed_expert_diverges_only_for_its_modality(self, encoder_and_params):
        enc, params = encoder_and_params
        perturbed = copy.deepcopy(params)
        lb = perturbed["params"]["vision"]["block_0"]["attn"]["q_proj"]["lora_B"]
        lb = np.array(lb)
        lb[2] = 1.0  # expert 2 = 'sk'
        perturbed["params"]["vision"]["block_0"]["attn"]["q_proj"]["lora_B"] = jnp.asarray(lb)

        rng = np.random.default_rng(5)
        tokens = jnp.asarray(rng.normal(size=(1, 2, 4, D_V)), jnp.float32)

        def run(p, mod_id):
            return np.asarray(
                enc.apply(
                    p,
                    tokens,
                    (mod_id,),
                    method=lambda m, t, ids: m.vision.trunk(t, ids),
                )
            )

        # modality 2 changes, modality 0 does not
        np.testing.assert_allclose(run(params, 0), run(perturbed, 0), rtol=1e-6)
        assert np.abs(run(params, 2) - run(perturbed, 2)).max() > 1e-4

    def test_mixed_group_routing(self, encoder_and_params):
        """A [G=2] grouped call must equal two single-group calls."""
        enc, params = encoder_and_params
        rng = np.random.default_rng(7)
        tokens = jnp.asarray(rng.normal(size=(2, 3, 4, D_V)), jnp.float32)

        both = np.asarray(
            enc.apply(
                params, tokens, (1, 3), method=lambda m, t, ids: m.vision.trunk(t, ids)
            )
        )
        for g, mid in enumerate((1, 3)):
            single = np.asarray(
                enc.apply(
                    params,
                    tokens[g : g + 1],
                    (mid,),
                    method=lambda m, t, ids: m.vision.trunk(t, ids),
                )
            )
            np.testing.assert_allclose(both[g : g + 1], single, rtol=2e-5, atol=1e-5)


class TestStackedEncoding:
    def test_stacked_equals_per_modality(self, encoder_and_params):
        enc, params = encoder_and_params
        rng = np.random.default_rng(6)
        imgs = jnp.asarray(rng.normal(size=(2, 4, IMG, IMG, 3)), jnp.float32)
        stacked = enc.apply(params, imgs, method=enc.encode_vision_stacked)
        for m in range(4):
            single = enc.apply(params, imgs[:, m], m, method=enc.encode_vision)
            np.testing.assert_allclose(
                np.asarray(stacked[:, m]), np.asarray(single), rtol=2e-5, atol=1e-5
            )
