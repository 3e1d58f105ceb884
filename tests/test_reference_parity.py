"""Golden parity against the ACTUAL reference implementation (SURVEY.md §4
tier c): the reference's torch-only modules (models/sdm_loss.py,
models/patch_embeds.py) run directly on fixed inputs and must agree with this
framework's equivalents.  Skipped when /root/reference is absent.

No reference code is copied — it is imported and executed as an oracle.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "models")),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE)
    import importlib

    sdm_loss_ref = importlib.import_module("models.sdm_loss")
    patch_embeds_ref = importlib.import_module("models.patch_embeds")
    sys.path.remove(REFERENCE)
    return torch, sdm_loss_ref, patch_embeds_ref


@pytest.fixture(scope="module")
def ref_model_module():
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    sys.path.insert(0, REFERENCE)
    import importlib

    model_ref = importlib.import_module("models.model")
    sys.path.remove(REFERENCE)
    return torch, model_ref


class TestSDMLossGoldenParity:
    @pytest.mark.parametrize("tau", [0.1, 0.2, 0.4, 0.7])
    def test_matches_reference_on_fixed_inputs(self, ref_modules, rng, tau):
        torch, sdm_ref, _ = ref_modules
        import jax.numpy as jnp

        from prcv2025reid_tpu.ops.losses import sdm_loss

        N, M, D = 14, 10, 64
        qry = rng.normal(size=(N, D)).astype(np.float32)
        gal = rng.normal(size=(M, D)).astype(np.float32)
        ql = rng.integers(0, 4, N)
        gl = rng.integers(0, 4, M)
        y = (ql[:, None] == gl[None, :]).astype(np.float32)

        want = float(
            sdm_ref.sdm_loss_stable(
                torch.tensor(qry), torch.tensor(gal), torch.tensor(y), tau=tau
            )
        )
        ones_n = jnp.ones(N, jnp.float32)
        ones_m = jnp.ones(M, jnp.float32)
        got, has = sdm_loss(qry, gal, y, ones_n, ones_m, tau=tau)
        assert float(has) == 1.0
        np.testing.assert_allclose(float(got), want, rtol=2e-5, atol=1e-6)

    def test_reference_row_filtering_matches_masking(self, ref_modules, rng):
        """Rows without positives: the reference filters them physically; our
        masked form must produce the same loss."""
        torch, sdm_ref, _ = ref_modules
        import jax.numpy as jnp

        from prcv2025reid_tpu.ops.losses import sdm_loss

        N, M, D = 12, 8, 32
        qry = rng.normal(size=(N, D)).astype(np.float32)
        gal = rng.normal(size=(M, D)).astype(np.float32)
        ql = rng.integers(0, 6, N)  # some query labels have no gallery match
        gl = rng.integers(0, 3, M)
        y = (ql[:, None] == gl[None, :]).astype(np.float32)

        want = float(
            sdm_ref.sdm_loss_stable(
                torch.tensor(qry), torch.tensor(gal), torch.tensor(y), tau=0.2
            )
        )
        got, _ = sdm_loss(
            qry, gal, y, jnp.ones(N, jnp.float32), jnp.ones(M, jnp.float32), tau=0.2
        )
        np.testing.assert_allclose(float(got), want, rtol=2e-5, atol=1e-6)


class TestPatchEmbedGoldenParity:
    def test_matches_reference_conv(self, ref_modules, rng):
        """Our patchify+matmul must equal the reference's Conv2d patch embed
        given the same weights (3-channel and grayscale-reduced 1-channel)."""
        torch, _, pe_ref = ref_modules
        import jax.numpy as jnp

        from prcv2025reid_tpu.models.vit import PatchEmbed

        S, P, D = 32, 16, 24
        imgs = rng.normal(size=(2, S, S, 3)).astype(np.float32)

        for in_chans in (3, 1):
            ref = pe_ref.PatchEmbed(
                in_chans=in_chans, embed_dim=D, patch_size=P, img_size=S
            ).eval()
            with torch.no_grad():
                x_t = torch.tensor(imgs.transpose(0, 3, 1, 2))
                if in_chans == 1:
                    x_t = x_t  # reference reduces 3->1 internally
                want = ref(x_t).numpy()  # [2, num_patches, D]

            mod = PatchEmbed(
                embed_dim=D, patch_size=P, in_chans=in_chans, dtype=jnp.float32
            )
            params = mod.init(__import__("jax").random.PRNGKey(0), jnp.asarray(imgs))
            # copy reference conv weights into our layout [P, P, C, D]
            w = ref.proj.weight.detach().numpy().transpose(2, 3, 1, 0)
            b = ref.proj.bias.detach().numpy()
            params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
            got = np.asarray(mod.apply(params, jnp.asarray(imgs)))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestBNNeckGoldenParity:
    def test_matches_reference_eval(self, ref_model_module, rng):
        torch, model_ref = ref_model_module
        import jax
        import jax.numpy as jnp

        from prcv2025reid_tpu.models.reid_model import BNNeck

        D, C, B = 32, 7, 6
        ref = model_ref.BNNeck(in_dim=D, num_classes=C, dropout=0.0).eval()
        with torch.no_grad():
            ref.bn.running_mean.copy_(torch.tensor(rng.normal(size=D), dtype=torch.float32))
            ref.bn.running_var.copy_(torch.tensor(rng.random(D) + 0.5, dtype=torch.float32))
            ref.bn.weight.copy_(torch.tensor(rng.normal(size=D) + 1.0, dtype=torch.float32))

        x = rng.normal(size=(B, D)).astype(np.float32)
        with torch.no_grad():
            want_feat, want_logits = ref(torch.tensor(x))

        mod = BNNeck(num_classes=C, dropout=0.0, dtype=jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
        variables = {
            "params": {
                "bn": {"scale": jnp.asarray(ref.bn.weight.detach().numpy())},
                "classifier": {
                    "kernel": jnp.asarray(ref.classifier.weight.detach().numpy().T)
                },
            },
            "batch_stats": {
                "bn": {
                    "mean": jnp.asarray(ref.bn.running_mean.numpy()),
                    "var": jnp.asarray(ref.bn.running_var.numpy()),
                }
            },
        }
        got_feat, got_logits = mod.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(
            np.asarray(got_feat), want_feat.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_logits), want_logits.numpy(), rtol=1e-4, atol=1e-5
        )
        # the x8 L2 rescale (models/model.py:219)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(got_feat), axis=1), 8.0, rtol=1e-5
        )


class TestFeatureFusionGoldenParity:
    def _convert(self, ref, jnp):
        ip_w = ref.multihead_attn.in_proj_weight.detach().numpy()
        ip_b = ref.multihead_attn.in_proj_bias.detach().numpy()
        D = ip_w.shape[1]
        mlp = ref.mlp
        return {
            "params": {
                "q_proj": {"kernel": jnp.asarray(ip_w[:D].T), "bias": jnp.asarray(ip_b[:D])},
                "k_proj": {"kernel": jnp.asarray(ip_w[D:2*D].T), "bias": jnp.asarray(ip_b[D:2*D])},
                "v_proj": {"kernel": jnp.asarray(ip_w[2*D:].T), "bias": jnp.asarray(ip_b[2*D:])},
                "out_proj": {
                    "kernel": jnp.asarray(ref.multihead_attn.out_proj.weight.detach().numpy().T),
                    "bias": jnp.asarray(ref.multihead_attn.out_proj.bias.detach().numpy()),
                },
                "norm1": {
                    "scale": jnp.asarray(ref.norm1.weight.detach().numpy()),
                    "bias": jnp.asarray(ref.norm1.bias.detach().numpy()),
                },
                "norm2": {
                    "scale": jnp.asarray(ref.norm2.weight.detach().numpy()),
                    "bias": jnp.asarray(ref.norm2.bias.detach().numpy()),
                },
                "mlp_ln": {
                    "scale": jnp.asarray(mlp[0].weight.detach().numpy()),
                    "bias": jnp.asarray(mlp[0].bias.detach().numpy()),
                },
                "mlp_fc1": {
                    "kernel": jnp.asarray(mlp[1].weight.detach().numpy().T),
                    "bias": jnp.asarray(mlp[1].bias.detach().numpy()),
                },
                "mlp_fc2": {
                    "kernel": jnp.asarray(mlp[4].weight.detach().numpy().T),
                    "bias": jnp.asarray(mlp[4].bias.detach().numpy()),
                },
            }
        }

    @pytest.mark.parametrize(
        "masks",
        [
            [[1, 1, 1, 1, 1], [1, 1, 1, 1, 1]],
            [[1, 0, 1, 0, 1], [0, 1, 0, 0, 1]],
        ],
    )
    def test_matches_reference_eval(self, ref_model_module, rng, masks):
        torch, model_ref = ref_model_module
        import jax
        import jax.numpy as jnp

        from prcv2025reid_tpu.models.reid_model import FeatureFusion

        D, M, B = 32, 5, 2
        torch.manual_seed(0)
        ref = model_ref.FeatureFusion(
            feature_dim=D, num_heads=4, mlp_ratio=2.0, dropout=0.0
        ).eval()

        feats = rng.normal(size=(B, M, D)).astype(np.float32)
        mask_arr = np.asarray(masks, np.float32)
        with torch.no_grad():
            want = ref(
                [torch.tensor(feats[:, m]) for m in range(M)],
                [torch.tensor(mask_arr[:, m]) for m in range(M)],
            ).numpy()

        mod = FeatureFusion(num_heads=4, mlp_ratio=2.0, dropout=0.0, dtype=jnp.float32)
        variables = self._convert(ref, jnp)
        got = np.asarray(
            mod.apply(variables, jnp.asarray(feats), jnp.asarray(mask_arr))
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestSDMModuleGoldenParity:
    def test_matches_reference_eval(self, ref_model_module, rng):
        torch, model_ref = ref_model_module
        import jax
        import jax.numpy as jnp

        from prcv2025reid_tpu.models.reid_model import SemanticDisentanglementModule

        D, B = 32, 5
        torch.manual_seed(1)
        ref = model_ref.SemanticDisentanglementModule(
            input_dim=D, semantic_dim=D, num_heads=4
        ).eval()
        x = rng.normal(size=(B, D)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.tensor(x)).numpy()

        ip_w = ref.semantic_attn.in_proj_weight.detach().numpy()
        ip_b = ref.semantic_attn.in_proj_bias.detach().numpy()
        sp = ref.semantic_proj
        variables = {
            "params": {
                "v_proj": {"kernel": jnp.asarray(ip_w[2*D:].T), "bias": jnp.asarray(ip_b[2*D:])},
                "attn_out_proj": {
                    "kernel": jnp.asarray(ref.semantic_attn.out_proj.weight.detach().numpy().T),
                    "bias": jnp.asarray(ref.semantic_attn.out_proj.bias.detach().numpy()),
                },
                "proj1": {
                    "kernel": jnp.asarray(sp[0].weight.detach().numpy().T),
                    "bias": jnp.asarray(sp[0].bias.detach().numpy()),
                },
                "proj_ln": {
                    "scale": jnp.asarray(sp[1].weight.detach().numpy()),
                    "bias": jnp.asarray(sp[1].bias.detach().numpy()),
                },
                "proj2": {
                    "kernel": jnp.asarray(sp[4].weight.detach().numpy().T),
                    "bias": jnp.asarray(sp[4].bias.detach().numpy()),
                },
            }
        }
        mod = SemanticDisentanglementModule(semantic_dim=D, num_heads=4, dtype=jnp.float32)
        got = np.asarray(mod.apply(variables, jnp.asarray(x), deterministic=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestMERLinearGoldenParity:
    def test_matches_reference_routing_and_scaling(self, ref_modules, rng):
        """Reference MERLinear (shared + per-modality LoRA, scaling=alpha/rank)
        vs our MERDense in both fold modes, per modality."""
        torch, _, _ = ref_modules
        import importlib

        sys.path.insert(0, REFERENCE)
        mer_ref = importlib.import_module("models.mer_lora")
        sys.path.remove(REFERENCE)

        import jax.numpy as jnp

        from prcv2025reid_tpu.models.mer import MERDense

        D_in, D_out, R, A = 16, 24, 4, 1.0
        mods = ["vis", "nir", "sk", "cp"]
        torch.manual_seed(3)
        ref = mer_ref.MERLinear(D_in, D_out, mods, lora_rank=R, lora_alpha=A).eval()
        # give LoRA B non-zero weights so routing actually differentiates
        with torch.no_grad():
            for m in mods:
                ref.loras[m].lora_B.weight.copy_(
                    torch.tensor(rng.normal(size=(D_out, R)) * 0.3, dtype=torch.float32)
                )

        x = rng.normal(size=(3, 5, D_in)).astype(np.float32)

        variables = {
            "params": {
                "shared": {
                    "kernel": jnp.asarray(ref.shared_linear.weight.detach().numpy().T),
                    "bias": jnp.asarray(ref.shared_linear.bias.detach().numpy()),
                },
                "lora_A": jnp.asarray(
                    np.stack([ref.loras[m].lora_A.weight.detach().numpy().T for m in mods])
                ),
                "lora_B": jnp.asarray(
                    np.stack([ref.loras[m].lora_B.weight.detach().numpy().T for m in mods])
                ),
            }
        }
        mod = MERDense(D_out, num_experts=4, rank=R, alpha=A, dtype=jnp.float32)
        for mid, mname in enumerate(mods):
            with torch.no_grad():
                want = ref(torch.tensor(x), mname).numpy()  # [3, 5, D_out]
            for fold in (True, False):
                got = np.asarray(
                    mod.apply(variables, jnp.asarray(x)[None], (mid,), fold=fold)
                )[0]
                np.testing.assert_allclose(
                    got, want, rtol=2e-4, atol=2e-4,
                    err_msg=f"modality={mname} fold={fold}",
                )
