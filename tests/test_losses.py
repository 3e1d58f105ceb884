"""Unit tests for SDM and CE losses.

Property tests mirror the reference's inline self-tests
(models/sdm_loss.py:153-198) plus a brute-force numpy oracle that implements
the published SDM definition independently (filter valid rows, uniform target
over positives, H(q, softmax)).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prcv2025reid_tpu.ops.losses import (
    masked_cross_entropy,
    multimodal_sdm_loss,
    sdm_loss,
)


def _np_sdm_oracle(qry, gal, y, row_valid, col_valid, tau):
    """Independent dense-numpy SDM: explicit row/col filtering."""
    tau = min(max(tau, 0.15), 0.5)
    qry = qry / np.maximum(np.linalg.norm(qry, axis=1, keepdims=True), 1e-8)
    gal = gal / np.maximum(np.linalg.norm(gal, axis=1, keepdims=True), 1e-8)
    rsel = row_valid.astype(bool)
    csel = col_valid.astype(bool)
    q_f, g_f = qry[rsel], gal[csel]
    y_f = y[np.ix_(rsel, csel)]

    def one_side(S, yy):
        row_pos = yy.sum(axis=1)
        valid = row_pos > 0
        if not valid.any():
            return 0.0
        S_v = np.clip(S[valid], -20, 20)
        y_v = yy[valid]
        q = y_v / np.maximum(y_v.sum(axis=1, keepdims=True), 1.0)
        S_shift = S_v - S_v.max(axis=1, keepdims=True)
        log_p = S_shift - np.log(np.exp(S_shift).sum(axis=1, keepdims=True))
        return float((-(q * log_p).sum(axis=1)).mean())

    S = np.clip(q_f @ g_f.T / tau, -20, 20)
    return 0.5 * (one_side(S, y_f) + one_side(S.T, y_f.T))


class TestSDMLoss:
    def test_matches_numpy_oracle(self, rng):
        N, M, D = 12, 10, 32
        qry = rng.normal(size=(N, D)).astype(np.float32)
        gal = rng.normal(size=(M, D)).astype(np.float32)
        ql = rng.integers(0, 4, N)
        gl = rng.integers(0, 4, M)
        y = (ql[:, None] == gl[None, :]).astype(np.float32)
        rv = (rng.random(N) > 0.3).astype(np.float32)
        cv = (rng.random(M) > 0.3).astype(np.float32)

        got, has = sdm_loss(qry, gal, y, rv, cv, tau=0.2)
        want = _np_sdm_oracle(qry, gal, y, rv, cv, 0.2)
        assert has == 1.0
        np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6)

    def test_finite_and_nonnegative(self, rng):
        qry = rng.normal(size=(16, 64)).astype(np.float32) * 10
        gal = rng.normal(size=(16, 64)).astype(np.float32) * 10
        labels = rng.integers(0, 5, 16)
        y = (labels[:, None] == labels[None, :]).astype(np.float32)
        ones = np.ones(16, np.float32)
        loss, _ = sdm_loss(qry, gal, y, ones, ones, tau=0.05)  # tau clamps to 0.15
        assert np.isfinite(float(loss))
        assert float(loss) >= 0.0

    def test_no_positive_pairs_gives_zero(self, rng):
        qry = rng.normal(size=(8, 16)).astype(np.float32)
        gal = rng.normal(size=(8, 16)).astype(np.float32)
        y = np.zeros((8, 8), np.float32)
        ones = np.ones(8, np.float32)
        loss, has = sdm_loss(qry, gal, y, ones, ones)
        assert float(loss) == 0.0
        assert float(has) == 0.0

    def test_all_rows_masked_gives_zero(self, rng):
        qry = rng.normal(size=(8, 16)).astype(np.float32)
        gal = rng.normal(size=(8, 16)).astype(np.float32)
        y = np.ones((8, 8), np.float32)
        zeros = np.zeros(8, np.float32)
        ones = np.ones(8, np.float32)
        loss, has = sdm_loss(qry, gal, y, zeros, ones)
        assert float(loss) == 0.0
        assert float(has) == 0.0

    def test_masked_rows_equal_filtered_rows(self, rng):
        """Masking row i must equal physically removing row i."""
        N, M, D = 10, 8, 16
        qry = rng.normal(size=(N, D)).astype(np.float32)
        gal = rng.normal(size=(M, D)).astype(np.float32)
        ql = rng.integers(0, 3, N)
        gl = rng.integers(0, 3, M)
        y = (ql[:, None] == gl[None, :]).astype(np.float32)
        rv = np.ones(N, np.float32)
        rv[3] = 0.0
        rv[7] = 0.0
        ones_m = np.ones(M, np.float32)

        masked, _ = sdm_loss(qry, gal, y, rv, ones_m)
        keep = rv.astype(bool)
        filtered, _ = sdm_loss(
            qry[keep], gal, y[keep], np.ones(keep.sum(), np.float32), ones_m
        )
        np.testing.assert_allclose(float(masked), float(filtered), rtol=1e-5)

    def test_jit_and_grad(self, rng):
        qry = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
        gal = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 3, 8))
        y = (labels[:, None] == labels[None, :]).astype(jnp.float32)
        ones = jnp.ones(8, jnp.float32)

        fn = jax.jit(lambda q: sdm_loss(q, gal, y, ones, ones)[0])
        g = jax.grad(lambda q: fn(q))(qry)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestMaskedCE:
    def test_matches_full_ce_when_all_valid(self, rng):
        logits = jnp.asarray(rng.normal(size=(8, 10)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 10, 8))
        ones = jnp.ones(8, jnp.float32)
        loss, n = masked_cross_entropy(logits, labels, ones, label_smoothing=0.0)
        # plain softmax CE oracle
        lp = jax.nn.log_softmax(logits, axis=1)
        want = -lp[jnp.arange(8), labels].mean()
        np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)
        assert int(n) == 8

    def test_out_of_range_labels_excluded(self, rng):
        logits = jnp.asarray(rng.normal(size=(4, 5)), jnp.float32)
        labels = jnp.asarray([0, 99, -1, 2])
        ones = jnp.ones(4, jnp.float32)
        loss, n = masked_cross_entropy(logits, labels, ones)
        assert int(n) == 2
        assert np.isfinite(float(loss))

    def test_label_smoothing_value(self, rng):
        """Smoothed CE = (1-s)*CE + s*mean over classes of -log p."""
        logits = jnp.asarray(rng.normal(size=(6, 7)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 7, 6))
        ones = jnp.ones(6, jnp.float32)
        s = 0.1
        loss, _ = masked_cross_entropy(logits, labels, ones, label_smoothing=s)
        lp = jax.nn.log_softmax(logits, axis=1)
        hard = -lp[jnp.arange(6), labels]
        uniform = -lp.mean(axis=1)
        want = ((1 - s) * hard + s * uniform).mean()
        np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)

    def test_all_invalid_zero(self, rng):
        logits = jnp.asarray(rng.normal(size=(4, 5)), jnp.float32)
        labels = jnp.asarray([0, 1, 2, 3])
        zeros = jnp.zeros(4, jnp.float32)
        loss, n = masked_cross_entropy(logits, labels, zeros)
        assert float(loss) == 0.0
        assert int(n) == 0


class TestMultimodalSDM:
    def test_mean_over_contributing_modalities(self, rng):
        B, D = 8, 16
        feats = jnp.asarray(rng.normal(size=(5, B, D)), jnp.float32)
        masks = jnp.ones((5, B), jnp.float32)
        # silence modality 2 entirely
        masks = masks.at[2].set(0.0)
        labels = jnp.asarray(rng.integers(0, 3, B))

        total = multimodal_sdm_loss(feats, masks, labels, tau=0.2)

        per = []
        y = (labels[:, None] == labels[None, :]).astype(jnp.float32)
        for m in [1, 3, 4]:  # modality 2 has no valid rows, 0 is vis
            l, _ = sdm_loss(feats[m], feats[0], y, masks[m], masks[0], 0.2)
            per.append(float(l))
        np.testing.assert_allclose(float(total), np.mean(per), rtol=1e-5)

    def test_zero_when_no_modality_has_pairs(self, rng):
        feats = jnp.asarray(rng.normal(size=(5, 4, 8)), jnp.float32)
        masks = jnp.zeros((5, 4), jnp.float32)
        labels = jnp.asarray([0, 1, 2, 3])
        total = multimodal_sdm_loss(feats, masks, labels, tau=0.2)
        assert float(total) == 0.0
