"""Round-5 features: batched SDM formulation and bf16 optimizer second
moments — both default-off train-step candidates (VERDICT r4 "weak #1";
ROADMAP train-side residual).  Promotion requires a same-day on-chip A/B
pair; these tests pin the MATH so the A/B only measures speed."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.ops.losses import (
    multimodal_sdm_loss,
    multimodal_sdm_loss_batched,
)
from prcv2025reid_tpu.training.param_groups import adamw_nu_dtype


class TestBatchedSDM:
    def _data(self, seed=0, mods=5, B=12, D=32):
        rng = np.random.default_rng(seed)
        feats = jnp.asarray(rng.normal(size=(mods, B, D)), jnp.float32)
        masks = jnp.asarray(rng.random((mods, B)) > 0.3, jnp.float32)
        labels = jnp.asarray(rng.integers(0, 4, B), jnp.int32)
        return feats, masks, labels

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_value_matches_unrolled(self, seed):
        feats, masks, labels = self._data(seed)
        a = multimodal_sdm_loss(feats, masks, labels, 0.2)
        b = multimodal_sdm_loss_batched(feats, masks, labels, 0.2)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6, atol=1e-6)

    def test_grad_matches_unrolled(self):
        feats, masks, labels = self._data(3)
        ga = jax.grad(lambda f: multimodal_sdm_loss(f, masks, labels, 0.18))(feats)
        gb = jax.grad(
            lambda f: multimodal_sdm_loss_batched(f, masks, labels, 0.18)
        )(feats)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)

    def test_all_masked_modality(self):
        feats, masks, labels = self._data(4)
        masks = masks.at[2].set(0.0)  # one modality fully absent
        a = multimodal_sdm_loss(feats, masks, labels, 0.2)
        b = multimodal_sdm_loss_batched(feats, masks, labels, 0.2)
        np.testing.assert_allclose(float(a), float(b), atol=1e-6)
        assert np.isfinite(float(b))

    def test_compute_loss_threads_impl(self):
        from prcv2025reid_tpu.models.reid_model import compute_loss

        rng = np.random.default_rng(5)
        B, C, D = 8, 6, 16
        outputs = {
            "logits": jnp.asarray(rng.normal(size=(B, C)), jnp.float32),
            "raw_modality_features": jnp.asarray(
                rng.normal(size=(5, B, D)), jnp.float32
            ),
            "feature_masks": jnp.ones((5, B), jnp.float32),
        }
        labels = jnp.asarray(rng.integers(0, C, B), jnp.int32)
        la = compute_loss(outputs, labels, sdm_weight=0.5, sdm_impl="unrolled")
        lb = compute_loss(outputs, labels, sdm_weight=0.5, sdm_impl="batched")
        np.testing.assert_allclose(
            float(la["total_loss"]), float(lb["total_loss"]), rtol=1e-6
        )

    def test_config_validation(self):
        with pytest.raises(ValueError, match="sdm_impl"):
            TrainingConfig(sdm_impl="nope")


TINY4 = dict(
    vision_hidden_dim=64, vision_layers=4, vision_heads=4,
    vision_mlp_dim=128, text_hidden_dim=32, text_layers=2, text_heads=4,
    text_mlp_dim=64, text_vocab_size=100, text_context_length=16,
    image_size=64, fusion_dim=32, sdm_semantic_dim=32, sdm_num_heads=4,
    fusion_num_heads=4, compute_dtype="float32", drop_path=0.0,
)


class TestTokenReduction:
    """EViT-style eval-path token reduction (config.token_keep) — the
    VERDICT r4 #4 gated FLOP-reduction lever.  These pin mechanics; the
    promotion decision is bench.py's two gates on chip."""

    def _encode(self, **kw):
        from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel

        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.normal(size=(2, 4, 64, 64, 3)), jnp.float32)
        mask = jnp.ones((2, 4), jnp.float32)
        tok = jnp.zeros((2, 16), jnp.int32)
        tm = jnp.ones((2,), jnp.float32)
        cfg = TrainingConfig(**TINY4, **kw)
        model = MultiModalReIDModel(config=cfg, num_classes=8)
        v = model.init(
            {"params": jax.random.PRNGKey(0)}, imgs, mask, tok, tm,
            train=False,
        )
        out = model.apply(
            v, imgs, mask, tok, tm, ("vis",), method=model.encode_subset
        )
        return np.asarray(out), (model, v, imgs, mask, tok, tm)

    def test_reduction_changes_eval_not_params(self):
        base, _ = self._encode()
        red, _ = self._encode(token_keep=8, token_reduce_layer=2)
        assert base.shape == red.shape
        assert np.abs(base - red).max() > 1e-6  # inexact by design
        # but correlated: the kept+merged content carries the signal
        cos = (base * red).sum(-1) / (
            np.linalg.norm(base, axis=-1) * np.linalg.norm(red, axis=-1)
        )
        assert (cos > 0.5).all(), cos

    def test_keep_beyond_patches_is_noop(self):
        base, _ = self._encode()
        noop, _ = self._encode(token_keep=999, token_reduce_layer=2)
        np.testing.assert_allclose(base, noop)

    def test_prune_differs_from_merge(self):
        merge, _ = self._encode(token_keep=8, token_reduce_layer=2)
        prune, _ = self._encode(
            token_keep=8, token_reduce_layer=2, token_reduce_mode="prune"
        )
        assert np.abs(merge - prune).max() > 1e-7

    def test_training_forward_never_reduces(self):
        _, (m0, v0, imgs, mask, tok, tm) = self._encode()
        _, (m1, v1, *_unused) = self._encode(
            token_keep=8, token_reduce_layer=2
        )
        rngs = {
            "dropout": jax.random.PRNGKey(1),
            "droppath": jax.random.PRNGKey(2),
            "moddrop": jax.random.PRNGKey(3),
        }
        o0, _ = m0.apply(
            v0, imgs, mask, tok, tm, train=True,
            mutable=["batch_stats"], rngs=rngs,
        )
        o1, _ = m1.apply(
            v1, imgs, mask, tok, tm, train=True,
            mutable=["batch_stats"], rngs=rngs,
        )
        np.testing.assert_allclose(
            np.asarray(o0["features"]), np.asarray(o1["features"])
        )

    def test_validation(self):
        with pytest.raises(ValueError, match="token_reduce_mode"):
            TrainingConfig(token_reduce_mode="avg")
        with pytest.raises(ValueError, match="token_reduce_layer"):
            TrainingConfig(token_keep=8, token_reduce_layer=0)
        with pytest.raises(ValueError, match="token_keep"):
            TrainingConfig(token_keep=-1)
        with pytest.raises(ValueError, match="token_reduce_train"):
            TrainingConfig(token_reduce_train=True)  # needs token_keep > 0


class TestTokenReduceTrain:
    """token_reduce_train: apply the EViT reduction during TRAINING too —
    the capability behind the ROADMAP standby's "token-keep fine-tuning"
    step (train WITH reduction so identity evidence concentrates in the
    kept tokens).  These pin that the reduction actually runs in the train
    forward, that gradients flow to params on both sides of the reduce
    layer, and that the remat path composes."""

    def _model(self, **kw):
        from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel

        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.normal(size=(2, 4, 64, 64, 3)), jnp.float32)
        mask = jnp.ones((2, 4), jnp.float32)
        tok = jnp.zeros((2, 16), jnp.int32)
        tm = jnp.ones((2,), jnp.float32)
        cfg = TrainingConfig(
            **TINY4, modality_dropout=0.0, dropout_rate=0.0,
            fusion_dropout=0.0, **kw,
        )
        model = MultiModalReIDModel(config=cfg, num_classes=8)
        v = model.init(
            {"params": jax.random.PRNGKey(0)}, imgs, mask, tok, tm,
            train=False,
        )
        return model, v, (imgs, mask, tok, tm)

    def _train_fwd(self, model, v, batch):
        imgs, mask, tok, tm = batch
        rngs = {
            "dropout": jax.random.PRNGKey(1),
            "droppath": jax.random.PRNGKey(2),
            "moddrop": jax.random.PRNGKey(3),
        }
        out, _ = model.apply(
            v, imgs, mask, tok, tm, train=True,
            mutable=["batch_stats"], rngs=rngs,
        )
        return np.asarray(out["features"])

    def test_train_forward_reduces(self):
        m0, v0, batch = self._model(token_keep=8, token_reduce_layer=2)
        m1, v1, _ = self._model(
            token_keep=8, token_reduce_layer=2, token_reduce_train=True
        )
        base = self._train_fwd(m0, v0, batch)  # train never reduces (default)
        red = self._train_fwd(m1, v1, batch)
        assert base.shape == red.shape
        assert np.abs(base - red).max() > 1e-6  # reduction applied in train
        # and the train forward now matches the (reducing) eval forward
        # at zero stochasticity: same params, same reduce point
        imgs, mask, tok, tm = batch
        ev = m1.apply(
            v1, imgs, mask, tok, tm, ("vis", "nir", "sk", "cp", "text"),
            method=m1.encode_subset,
        )
        assert np.isfinite(np.asarray(ev)).all()

    def test_gradients_flow_both_sides_of_reduce(self):
        from prcv2025reid_tpu.models.reid_model import compute_loss

        m, v, batch = self._model(
            token_keep=8, token_reduce_layer=2, token_reduce_train=True
        )
        imgs, mask, tok, tm = batch
        labels = jnp.asarray([0, 1], jnp.int32)
        rngs = {
            "dropout": jax.random.PRNGKey(1),
            "droppath": jax.random.PRNGKey(2),
            "moddrop": jax.random.PRNGKey(3),
        }

        def loss_fn(params):
            out, _ = m.apply(
                {**v, "params": params}, imgs, mask, tok, tm, train=True,
                mutable=["batch_stats"], rngs=rngs,
            )
            return compute_loss(out, labels, sdm_weight=0.5)["total_loss"]

        grads = jax.grad(loss_fn)(v["params"])
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]

        def gnorm(substr):
            tot = 0.0
            for path, leaf in flat:
                if substr in jax.tree_util.keystr(path):
                    tot += float(jnp.abs(leaf).sum())
            return tot

        # blocks below (0,1), at (1 -> reduce after), and above (2,3) the
        # reduce layer all receive gradient, as does the patch embed: the
        # top-k gather + merged token keep the whole trunk trainable
        for name in ("block_0", "block_1", "block_2", "block_3",
                     "patch_embed_vis"):
            assert gnorm(name) > 0, f"no gradient reached {name}"
        assert all(np.isfinite(float(jnp.abs(l).max())) for _, l in flat)

    def test_remat_composes_with_train_reduce(self):
        m0, v0, batch = self._model(
            token_keep=8, token_reduce_layer=2, remat_blocks=True
        )
        m1, v1, _ = self._model(
            token_keep=8, token_reduce_layer=2, token_reduce_train=True,
            remat_blocks=True,
        )
        base = self._train_fwd(m0, v0, batch)
        red = self._train_fwd(m1, v1, batch)
        assert np.abs(base - red).max() > 1e-6  # reduce ran inside remat path
        assert np.isfinite(red).all()


class TestNuDtypeAdamW:
    def _run(self, tx, params, grads_seq):
        state = tx.init(params)
        for g in grads_seq:
            updates, state = tx.update(g, state, params)
            params = optax.apply_updates(params, updates)
        return params, state

    def test_state_dtype_and_trajectory_close(self):
        rng = np.random.default_rng(0)
        params = {
            "w": jnp.asarray(rng.normal(size=(16, 8)), jnp.float32),
            "b": jnp.asarray(rng.normal(size=(8,)), jnp.float32),
        }
        grads_seq = [
            jax.tree.map(
                lambda p: jnp.asarray(
                    rng.normal(size=p.shape) * 0.1, jnp.float32
                ),
                params,
            )
            for _ in range(25)
        ]
        ref_tx = optax.adamw(learning_rate=1e-3, weight_decay=1e-4)
        p_ref, _ = self._run(ref_tx, params, grads_seq)
        bf_tx = adamw_nu_dtype(
            learning_rate=1e-3, weight_decay=1e-4, nu_dtype=jnp.bfloat16
        )
        p_bf, s_bf = self._run(bf_tx, params, grads_seq)

        # nu leaves really are stored narrow
        nus = jax.tree.leaves(s_bf[0].nu)
        assert all(v.dtype == jnp.bfloat16 for v in nus)
        # trajectory stays close to f32 AdamW: the Adam step is
        # scale-invariant in nu up to sqrt of the bf16 relative error
        # (~0.4%), so parameter drift stays well under the update scale
        for k in params:
            drift = float(jnp.abs(p_bf[k] - p_ref[k]).max())
            moved = float(jnp.abs(p_ref[k] - params[k]).max())
            assert drift < 0.05 * max(moved, 1e-6), (k, drift, moved)

    def test_f32_nu_matches_optax_adamw(self):
        rng = np.random.default_rng(1)
        params = {"w": jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)}
        grads_seq = [
            {"w": jnp.asarray(rng.normal(size=(8, 4)) * 0.1, jnp.float32)}
            for _ in range(10)
        ]
        ref_tx = optax.adamw(learning_rate=2e-3, weight_decay=1e-4)
        p_ref, _ = self._run(ref_tx, params, grads_seq)
        my_tx = adamw_nu_dtype(
            learning_rate=2e-3, weight_decay=1e-4, nu_dtype=jnp.float32
        )
        p_my, _ = self._run(my_tx, params, grads_seq)
        np.testing.assert_allclose(
            np.asarray(p_my["w"]), np.asarray(p_ref["w"]), rtol=2e-5, atol=2e-6
        )

    def test_build_optimizer_threads_nu_dtype(self):
        from prcv2025reid_tpu.training.param_groups import build_optimizer

        config = TrainingConfig(opt_nu_dtype="bfloat16", num_workers=0)
        # a LoRA leaf: trainable under the default freeze_backbone=True
        params = {
            "encoder": {
                "block_0": {
                    "attn": {
                        "q_proj": {
                            "lora_A": {"nir": jnp.zeros((4, 4), jnp.float32)}
                        }
                    }
                }
            }
        }
        tx = build_optimizer(config, params, steps_per_epoch=10)
        state = tx.init(params)
        dtypes = {
            str(leaf.dtype)
            for leaf in jax.tree.leaves(state)
            if hasattr(leaf, "dtype") and leaf.ndim > 0
        }
        assert "bfloat16" in dtypes

    def test_config_validation(self):
        with pytest.raises(ValueError, match="opt_nu_dtype"):
            TrainingConfig(opt_nu_dtype="float16")
