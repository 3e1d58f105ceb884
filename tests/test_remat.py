"""remat_blocks (jax.checkpoint per transformer block) must not change the
math — it trades recompute for activation memory.  Since round 3 the
non-remat TRAINING forward computes the last block CLS-only (exact math,
different floating-point association), so remat-vs-plain comparisons carry
fp-reassociation noise ~1e-4 relative."""
import jax
import jax.numpy as jnp
import numpy as np

from prcv2025reid_tpu.models.vit import MERVisionTransformer


def _trunk(remat, policy="full", attn_bwd="stored"):
    return MERVisionTransformer(
        embed_dim=64,
        num_layers=2,
        num_heads=4,
        mlp_dim=128,
        patch_size=16,
        image_size=32,
        fusion_dim=32,
        modalities=("vis", "nir"),
        remat_blocks=remat,
        remat_policy=policy,
        attn_bwd=attn_bwd,
    )


def test_attn_bwd_remat_matches_stored():
    """attn_bwd='remat' (jax.checkpoint on the attention core) must change
    scheduling only: identical forward, identical gradients."""
    imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 32, 32, 3))
    ref_model = _trunk(False, attn_bwd="stored")
    variables = ref_model.init(jax.random.PRNGKey(1), imgs)
    remat_model = _trunk(False, attn_bwd="remat")

    out_ref = ref_model.apply(variables, imgs, deterministic=False,
                              rngs={"droppath": jax.random.PRNGKey(2)})
    out = remat_model.apply(variables, imgs, deterministic=False,
                            rngs={"droppath": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(out, out_ref, rtol=1e-6, atol=1e-6)

    def loss(model):
        def f(params):
            y = model.apply(
                {"params": params},
                imgs,
                deterministic=False,
                rngs={"droppath": jax.random.PRNGKey(2)},
            )
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return f

    g_ref = jax.grad(loss(ref_model))(variables["params"])
    g_remat = jax.grad(loss(remat_model))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_remat_dots_policy_matches():
    imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 32, 32, 3))
    ref_model = _trunk(False)
    variables = ref_model.init(jax.random.PRNGKey(1), imgs)
    dots_model = _trunk(True, "dots")

    def loss(model):
        def f(params):
            y = model.apply({"params": params}, imgs, deterministic=False)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return f

    g_ref = jax.grad(loss(ref_model))(variables["params"])
    g_dots = jax.grad(loss(dots_model))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_dots)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)


def test_remat_eval_and_grads_match():
    imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 32, 32, 3))
    ref_model = _trunk(False)
    variables = ref_model.init(jax.random.PRNGKey(1), imgs)
    remat_model = _trunk(True)

    # eval path (cls_only last block) must run and match through the wrapper
    ref_out = ref_model.apply(variables, imgs)
    out = remat_model.apply(variables, imgs)
    np.testing.assert_allclose(out, ref_out, rtol=1e-6, atol=1e-6)

    # training grads identical (remat changes scheduling, not math)
    def loss(model):
        def f(params):
            y = model.apply(
                {"params": params},
                imgs,
                deterministic=False,
                rngs={"droppath": jax.random.PRNGKey(2)},
            )
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return f

    g_ref = jax.grad(loss(ref_model))(variables["params"])
    g_remat = jax.grad(loss(remat_model))(variables["params"])
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_remat = jax.tree_util.tree_leaves(g_remat)
    assert len(flat_ref) == len(flat_remat)
    for a, b in zip(flat_ref, flat_remat):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)
