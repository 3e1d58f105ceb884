"""Model-layer tests: fusion masking, BNNeck, full forward + loss."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.models.reid_model import (
    BNNeck,
    FeatureFusion,
    MultiModalReIDModel,
    SemanticDisentanglementModule,
    compute_loss,
)

from conftest import TINY_BASE

TINY = {**TINY_BASE, "drop_path": 0.1}


@pytest.fixture(scope="module")
def tiny_config():
    return TrainingConfig(**TINY)


@pytest.fixture(scope="module")
def model_and_params(tiny_config):
    model = MultiModalReIDModel(config=tiny_config, num_classes=7, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    B = 4
    imgs = jax.random.normal(rng, (B, 4, 32, 32, 3))
    toks = jnp.ones((B, 16), jnp.int32).at[:, 3].set(99)
    variables = model.init(
        {"params": rng}, imgs, jnp.ones((B, 4)), toks, jnp.ones(B), train=False
    )
    return model, variables


class TestFeatureFusion:
    def test_masked_slots_do_not_affect_output(self, rng):
        fusion = FeatureFusion(num_heads=4, dtype=jnp.float32)
        feats = jnp.asarray(rng.normal(size=(2, 5, 32)), jnp.float32)
        masks = jnp.asarray([[1, 1, 0, 1, 0], [1, 0, 0, 0, 1]], jnp.float32)
        params = fusion.init(jax.random.PRNGKey(0), feats, masks)

        out1 = fusion.apply(params, feats, masks)
        # scrambling the masked slots' features must not change the output
        noise = jnp.asarray(rng.normal(size=feats.shape), jnp.float32) * 100
        feats2 = jnp.where(masks[..., None] > 0, feats, feats + noise)
        out2 = fusion.apply(params, feats2, masks)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-5)

    def test_all_masked_sample_is_finite(self, rng):
        fusion = FeatureFusion(num_heads=4, dtype=jnp.float32)
        feats = jnp.asarray(rng.normal(size=(3, 5, 32)), jnp.float32)
        masks = jnp.asarray(
            [[1, 1, 1, 1, 1], [0, 0, 0, 0, 0], [1, 0, 0, 0, 0]], jnp.float32
        )
        params = fusion.init(jax.random.PRNGKey(0), feats, masks)
        out = fusion.apply(params, feats, masks)
        assert np.isfinite(np.asarray(out)).all()


class TestBNNeck:
    def test_bn_feature_norm_is_eight(self, rng):
        neck = BNNeck(num_classes=5, dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(6, 32)) * 13.0, jnp.float32)
        variables = neck.init(jax.random.PRNGKey(0), x, train=False)
        bn_feat, logits = neck.apply(variables, x, train=False)
        norms = np.linalg.norm(np.asarray(bn_feat), axis=1)
        np.testing.assert_allclose(norms, 8.0, rtol=1e-5)
        assert logits.shape == (6, 5)

    def test_train_mode_updates_batch_stats(self, rng):
        neck = BNNeck(num_classes=5, dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(6, 32)) + 3.0, jnp.float32)
        variables = neck.init(jax.random.PRNGKey(0), x, train=True)
        _, updates = neck.apply(
            variables,
            x,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        new_mean = np.asarray(updates["batch_stats"]["bn"]["mean"])
        assert np.abs(new_mean).sum() > 0  # moved toward the batch mean (+3)


class TestSDMModule:
    def test_eval_is_deterministic(self, rng):
        mod = SemanticDisentanglementModule(semantic_dim=32, num_heads=4, dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(4, 32)), jnp.float32)
        params = mod.init(jax.random.PRNGKey(0), x)
        a = mod.apply(params, x, deterministic=True)
        b = mod.apply(params, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.shape == (4, 32)


class TestFullForward:
    def test_eval_forward_shapes(self, model_and_params):
        model, variables = model_and_params
        B = 4
        imgs = jnp.ones((B, 4, 32, 32, 3))
        toks = jnp.ones((B, 16), jnp.int32).at[:, 3].set(99)
        out = model.apply(
            variables, imgs, jnp.ones((B, 4)), toks, jnp.ones(B), train=False
        )
        assert out["features"].shape == (B, 32)
        assert out["bn_features"].shape == (B, 32)
        assert out["logits"].shape == (B, 7)
        assert out["raw_modality_features"].shape == (5, B, 32)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out["bn_features"]), axis=1), 8.0, rtol=1e-4
        )

    def test_invalid_modality_gets_null_token(self, model_and_params):
        model, variables = model_and_params
        B = 2
        imgs = jnp.ones((B, 4, 32, 32, 3))
        toks = jnp.ones((B, 16), jnp.int32).at[:, 3].set(99)
        mask = jnp.asarray([[1, 0, 1, 1], [1, 1, 1, 1]], jnp.float32)
        out = model.apply(variables, imgs, mask, toks, jnp.ones(B), train=False)
        null = np.asarray(variables["params"]["null_tokens"])
        raw = np.asarray(out["raw_modality_features"])  # [M, B, D]
        np.testing.assert_allclose(raw[1, 0], null[1], rtol=1e-5, atol=1e-6)
        assert np.abs(raw[1, 1] - null[1]).max() > 1e-3

    def test_train_forward_runs_with_losses(self, model_and_params):
        model, variables = model_and_params
        B = 4
        imgs = jax.random.normal(jax.random.PRNGKey(2), (B, 4, 32, 32, 3))
        toks = jnp.ones((B, 16), jnp.int32).at[:, 3].set(99)
        labels = jnp.asarray([0, 0, 1, 1])
        out, updates = model.apply(
            variables,
            imgs,
            jnp.ones((B, 4)),
            toks,
            jnp.ones(B),
            train=True,
            enable_modality_dropout=True,
            mutable=["batch_stats"],
            rngs={
                "dropout": jax.random.PRNGKey(3),
                "droppath": jax.random.PRNGKey(4),
                "moddrop": jax.random.PRNGKey(5),
            },
        )
        losses = compute_loss(out, labels, sdm_weight=0.3, sdm_tau=0.2)
        assert np.isfinite(float(losses["total_loss"]))
        assert float(losses["ce_loss"]) > 0
        assert float(losses["sdm_loss"]) >= 0
        assert int(losses["ce_valid_cnt"]) == B
        assert "batch_stats" in updates

    def test_sdm_weight_zero_disables_sdm(self, model_and_params):
        model, variables = model_and_params
        B = 4
        imgs = jax.random.normal(jax.random.PRNGKey(2), (B, 4, 32, 32, 3))
        toks = jnp.ones((B, 16), jnp.int32).at[:, 3].set(99)
        labels = jnp.asarray([0, 0, 1, 1])
        out = model.apply(
            variables, imgs, jnp.ones((B, 4)), toks, jnp.ones(B), train=False
        )
        losses = compute_loss(out, labels, sdm_weight=0.0)
        assert float(losses["sdm_loss"]) == 0.0
        np.testing.assert_allclose(
            float(losses["total_loss"]), float(losses["ce_loss"]), rtol=1e-6
        )


class TestModalitiesConfig:
    def test_invalid_modalities_rejected(self):
        with pytest.raises(ValueError, match="start with 'vis'"):
            TrainingConfig(**{**TINY, "modalities": ("nir", "vis", "text")})
        with pytest.raises(ValueError, match="last modality"):
            TrainingConfig(**{**TINY, "modalities": ("vis", "text", "nir")})
        with pytest.raises(ValueError, match="unknown modalities"):
            TrainingConfig(**{**TINY, "modalities": ("vis", "rgb2", "text")})
        with pytest.raises(ValueError, match="duplicate"):
            TrainingConfig(**{**TINY, "modalities": ("vis", "nir", "nir", "text")})

    def test_subset_modalities_model_runs(self):
        """A non-default --modalities value must initialize and forward:
        null_tokens and the fusion slots are sized by the configured set."""
        cfg = TrainingConfig(**{**TINY, "modalities": ("vis", "nir", "text")})
        model = MultiModalReIDModel(config=cfg, num_classes=3, dtype=jnp.float32)
        rng = jax.random.PRNGKey(0)
        B, Mv = 2, len(cfg.vision_modalities)
        assert Mv == 2
        imgs = jax.random.normal(rng, (B, Mv, 32, 32, 3))
        toks = jnp.ones((B, 16), jnp.int32).at[:, 3].set(99)
        variables = model.init(
            {"params": rng}, imgs, jnp.ones((B, Mv)), toks, jnp.ones(B),
            train=False,
        )
        assert variables["params"]["null_tokens"].shape == (Mv + 1, cfg.fusion_dim)
        out = model.apply(
            variables, imgs, jnp.ones((B, Mv)), toks, jnp.ones(B), train=False
        )
        assert out["features"].shape == (B, cfg.fusion_dim)
        assert np.isfinite(np.asarray(out["logits"])).all()
        # subset embedding works with the reduced slot set too
        feats = model.apply(
            variables, imgs, jnp.ones((B, Mv)), toks, jnp.ones(B),
            ("nir", "text"), method=model.encode_subset,
        )
        assert np.isfinite(np.asarray(feats)).all()
