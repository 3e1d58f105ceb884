"""Round-3 feature tests: cache-tag completeness, gallery-cache eviction,
loud int8 grad failure, eval-batch mesh padding, ranking-equivalence gate.

(VERDICT r2 "Next round" items 5, 7 and the ADVICE r2 findings.)
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prcv2025reid_tpu.configs import TrainingConfig


# ----- ADVICE r2: cache tag must cover every numerics-affecting selector ----


class TestCacheTag:
    def _tag(self, config):
        from prcv2025reid_tpu.evaluation.protocol import checkpoint_cache_tag

        params = {
            "bn_neck": {"classifier": {"kernel": np.ones((4, 4), np.float32)}}
        }
        return checkpoint_cache_tag(params, "base", step=7, config=config)

    def test_default_config_plain_tag(self):
        tag = self._tag(TrainingConfig())
        assert "block_impl" not in tag and "attn_backend" not in tag

    @pytest.mark.parametrize(
        "field,value",
        [
            ("block_impl", "fused_int8"),
            ("attn_backend", "splash"),
            ("use_pallas_attention", True),
            ("use_fused_resln", True),
            ("use_fused_mlp", True),
            ("compute_dtype", "float32"),
        ],
    )
    def test_numerics_selectors_change_tag(self, field, value):
        base = self._tag(TrainingConfig())
        changed = self._tag(TrainingConfig(**{field: value}))
        assert changed != base, field
        assert field in changed

    def test_weights_change_tag(self):
        from prcv2025reid_tpu.evaluation.protocol import checkpoint_cache_tag

        cfg = TrainingConfig()
        p1 = {"bn_neck": {"classifier": {"kernel": np.ones((4, 4), np.float32)}}}
        p2 = {"bn_neck": {"classifier": {"kernel": np.zeros((4, 4), np.float32)}}}
        assert checkpoint_cache_tag(p1, "b", step=1, config=cfg) != (
            checkpoint_cache_tag(p2, "b", step=1, config=cfg)
        )


# ----- VERDICT r2 weak #3: gallery cache eviction -----


class TestGalleryCacheEviction:
    def test_save_evicts_beyond_keep_newest(self, tmp_path):
        from prcv2025reid_tpu.evaluation.protocol import GalleryCache

        feats = np.ones((3, 4), np.float32)
        pids = np.arange(3)
        for i in range(6):
            cache = GalleryCache(str(tmp_path), f"tag{i}", keep_newest=3)
            cache.save([0, 1, 2], feats, pids)
            os.utime(
                cache._path([0, 1, 2]), (1_000_000 + i, 1_000_000 + i)
            )  # deterministic mtimes on coarse filesystems
        left = sorted(f for f in os.listdir(tmp_path) if f.endswith(".npz"))
        assert len(left) == 3
        # newest tags survive
        assert any("tag5" in f for f in left)
        assert not any("tag0" in f for f in left)

    def test_current_tag_always_survives(self, tmp_path):
        from prcv2025reid_tpu.evaluation.protocol import GalleryCache

        feats = np.ones((2, 4), np.float32)
        pids = np.arange(2)
        cache = GalleryCache(str(tmp_path), "mine", keep_newest=1)
        cache.save([0, 1], feats, pids)
        assert cache.load([0, 1]) is not None


# ----- ADVICE r2: grad through int8 kernels must raise, not silently zero ----


class TestInt8GradRaises:
    def test_ln_qkv_int8_grad_raises(self):
        from prcv2025reid_tpu.ops.fused_block import fused_ln_qkv, quantize_weight

        x = jnp.ones((1, 8, 16))
        lns = jnp.ones((16,))
        lnb = jnp.zeros((16,))
        w = quantize_weight(jnp.ones((1, 16, 32)) * 0.1)
        b = jnp.zeros((1, 32))

        def loss(x):
            return fused_ln_qkv(x, lns, lnb, w, b, "int8", 8, True).sum()

        with pytest.raises(NotImplementedError, match="serving-only"):
            jax.grad(loss)(x)

    def test_out_mlp_int8_grad_raises(self):
        from prcv2025reid_tpu.ops.fused_block import fused_out_mlp, quantize_weight

        attn = jnp.ones((1, 8, 16))
        x = jnp.ones((1, 8, 16))
        wo = quantize_weight(jnp.ones((1, 16, 16)) * 0.1)
        w1 = quantize_weight(jnp.ones((1, 16, 32)) * 0.1)
        w2 = quantize_weight(jnp.ones((1, 32, 16)) * 0.1)
        lns = jnp.ones((16,))
        lnb = jnp.zeros((16,))

        def loss(attn):
            return fused_out_mlp(
                attn, x, wo, jnp.zeros((1, 16)), lns, lnb,
                w1, jnp.zeros((1, 32)), w2, jnp.zeros((1, 16)),
                "int8", 8, True,
            ).sum()

        with pytest.raises(NotImplementedError, match="serving-only"):
            jax.grad(loss)(attn)

    def test_bf16_grad_still_works(self):
        from prcv2025reid_tpu.ops.fused_block import fused_ln_qkv

        x = jnp.ones((1, 8, 16))
        g = jax.grad(
            lambda x: fused_ln_qkv(
                x, jnp.ones((16,)), jnp.zeros((16,)),
                jnp.ones((1, 16, 32)) * 0.1, jnp.zeros((1, 32)),
                "bf16", 8, True,
            ).sum()
        )(x)
        assert np.isfinite(np.asarray(g)).all()
