"""Loss functions: masked SDM alignment and masked ID cross-entropy.

TPU-native re-design of the reference losses:

- ``sdm_loss`` reproduces ``sdm_loss_stable`` (reference: models/sdm_loss.py:
  13-149) — vis-anchored Similarity Distribution Matching — but with *static
  shapes*: instead of boolean-index filtering of valid rows/columns
  (dynamic shapes, impossible under jit), validity enters as row/column
  masks.  Invalid columns are excluded from the softmax by additive masking;
  invalid rows contribute zero and are excluded from the mean.
- ``masked_cross_entropy`` reproduces the CE path of ``compute_loss``
  (reference: models/model.py:529-549): label smoothing 0.1, validity mask =
  (any modality valid) AND (label in range).

Everything here runs in float32 regardless of the trunk compute dtype —
the reference insists on an fp32 island for SDM (models/sdm_loss.py:73).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_NEG_BIG = -1e9  # additive mask for excluded softmax columns


def _masked_one_side_ce(
    S: jnp.ndarray,  # [N, M] similarity logits (already clamped)
    y: jnp.ndarray,  # [N, M] same-identity indicator in {0,1}
    row_valid: jnp.ndarray,  # [N] float validity of rows
    col_valid: jnp.ndarray,  # [M] float validity of columns
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One direction of the SDM cross-entropy H(q, softmax(S)).

    Returns (loss, num_valid_rows).  A row is valid iff its mask is set AND it
    has at least one valid positive column (reference: models/sdm_loss.py:37-42
    filters rows with ``row_pos > 0``).
    """
    y_eff = y * row_valid[:, None] * col_valid[None, :]
    row_pos = y_eff.sum(axis=1)  # [N]
    valid = (row_pos > 0).astype(S.dtype) * row_valid  # [N]

    # Target distribution: uniform over valid positives (models/sdm_loss.py:49-51).
    q = y_eff / jnp.maximum(row_pos[:, None], 1.0)

    # Masked log-softmax over valid columns only.
    S_masked = S + (1.0 - col_valid[None, :]) * _NEG_BIG
    log_p = jax.nn.log_softmax(S_masked, axis=1)
    ce_per_row = -(q * log_p).sum(axis=1)  # [N]

    n_valid = valid.sum()
    loss = (ce_per_row * valid).sum() / jnp.maximum(n_valid, 1.0)
    return loss, n_valid


def sdm_loss(
    qry: jnp.ndarray,  # [N, D] query-side (non-vis modality) features
    gal: jnp.ndarray,  # [M, D] gallery-side (vis) features
    y: jnp.ndarray,  # [N, M] same-identity indicator
    qry_valid: jnp.ndarray,  # [N] float mask
    gal_valid: jnp.ndarray,  # [M] float mask
    tau: float | jnp.ndarray = 0.2,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric SDM loss with validity masks; returns (loss, has_pairs).

    Mirrors ``sdm_loss_stable`` (models/sdm_loss.py:13-149): tau clamped to
    [0.15, 0.5], both sides L2-normalized, similarities clamped to +/-20, and
    the symmetric mean 0.5*(q->g + g->q).  ``has_pairs`` is 1.0 when at least
    one valid positive pair exists — the caller uses it to skip the modality
    exactly like the reference's "no positives -> skip" branch
    (models/model.py:608-612).  Non-finite inputs zero the loss (the
    reference's guard at models/sdm_loss.py:78-91,145-147).
    """
    qry = qry.astype(jnp.float32)
    gal = gal.astype(jnp.float32)
    qry_valid = qry_valid.astype(jnp.float32)
    gal_valid = gal_valid.astype(jnp.float32)
    y = y.astype(jnp.float32)

    tau_eff = jnp.clip(jnp.asarray(tau, jnp.float32), 0.15, 0.5)

    qn = qry / jnp.maximum(jnp.linalg.norm(qry, axis=1, keepdims=True), eps)
    gn = gal / jnp.maximum(jnp.linalg.norm(gal, axis=1, keepdims=True), eps)

    # Full-precision matmul: this is the fp32 island, don't let TPU matmul
    # default (bf16 passes) erode the similarity values.
    S = jnp.clip(
        jnp.dot(qn, gn.T, precision=jax.lax.Precision.HIGHEST) / tau_eff,
        -20.0,
        20.0,
    )  # [N, M]

    L_q2g, n_q = _masked_one_side_ce(S, y, qry_valid, gal_valid)
    L_g2q, n_g = _masked_one_side_ce(S.T, y.T, gal_valid, qry_valid)
    symmetric = 0.5 * (L_q2g + L_g2q)

    pair_count = (y * qry_valid[:, None] * gal_valid[None, :]).sum()
    has_pairs = (pair_count > 0).astype(jnp.float32)

    finite = jnp.isfinite(symmetric)
    loss = jnp.where(finite & (symmetric >= 0), symmetric, 0.0) * has_pairs
    return loss, has_pairs


def masked_cross_entropy(
    logits: jnp.ndarray,  # [B, C]
    labels: jnp.ndarray,  # [B] int
    valid: jnp.ndarray,  # [B] float
    label_smoothing: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Label-smoothed CE over valid samples; returns (loss, valid_count).

    Reference: models/model.py:529-549 + nn.CrossEntropyLoss(label_smoothing=0.1)
    at models/model.py:290.  Out-of-range labels are force-invalidated, matching
    the ``valid_label_mask`` clause (models/model.py:541).
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[1]
    in_range = (labels >= 0) & (labels < num_classes)
    valid = valid.astype(jnp.float32) * in_range.astype(jnp.float32)

    safe_labels = jnp.clip(labels, 0, num_classes - 1)
    onehot = jax.nn.one_hot(safe_labels, num_classes, dtype=jnp.float32)
    target = onehot * (1.0 - label_smoothing) + label_smoothing / num_classes

    log_p = jax.nn.log_softmax(logits, axis=1)
    ce_per_row = -(target * log_p).sum(axis=1)

    n_valid = valid.sum()
    loss = (ce_per_row * valid).sum() / jnp.maximum(n_valid, 1.0)
    return loss, n_valid


def multimodal_sdm_loss(
    modality_features: jnp.ndarray,  # [Mv+1, B, D] raw features, slot order = MODALITIES
    modality_masks: jnp.ndarray,  # [Mv+1, B] float masks, same order
    labels: jnp.ndarray,  # [B]
    tau: float | jnp.ndarray,
    vis_slot: int = 0,
) -> jnp.ndarray:
    """Mean SDM loss over all non-vis modalities vs. the vis anchor.

    Reproduces the per-modality loop of ``compute_loss``
    (models/model.py:584-625): each modality with at least one valid positive
    pair against valid vis rows contributes; modalities without pairs are
    skipped; the result is the mean over contributing modalities (zero when
    none contribute).
    """
    labels = labels.astype(jnp.int32)
    y_full = (labels[:, None] == labels[None, :]).astype(jnp.float32)  # [B, B]
    vis_feat = modality_features[vis_slot]
    vis_mask = modality_masks[vis_slot]

    num_mods = modality_features.shape[0]
    losses = []
    gates = []
    for m in range(num_mods):
        if m == vis_slot:
            continue
        loss_m, has_pairs = sdm_loss(
            modality_features[m], vis_feat, y_full, modality_masks[m], vis_mask, tau
        )
        losses.append(loss_m)
        gates.append(has_pairs)
    losses = jnp.stack(losses)
    gates = jnp.stack(gates)
    # NOTE: a modality whose loss was force-zeroed by sdm_loss's finite/
    # negative guard keeps gate=1 and dilutes the mean — reference-exact:
    # sdm_loss_stable returns a FINITE 0.0 on anomalies (sdm_loss.py:144-147),
    # so the reference's `if torch.isfinite(L)` filter (model.py:616-617)
    # never fires and the zero is averaged in there too.
    total = (losses * gates).sum() / jnp.maximum(gates.sum(), 1.0)
    return jnp.where(jnp.isfinite(total), total, 0.0)


def multimodal_sdm_loss_batched(
    modality_features: jnp.ndarray,  # [Mv+1, B, D] raw features, slot order = MODALITIES
    modality_masks: jnp.ndarray,  # [Mv+1, B] float masks, same order
    labels: jnp.ndarray,  # [B]
    tau: float | jnp.ndarray,
    vis_slot: int = 0,
) -> jnp.ndarray:
    """Same math as :func:`multimodal_sdm_loss`, restructured for the TPU:
    one vmapped pass over the stacked non-vis modalities (a single batched
    [M-1, B, B] similarity contraction + batched masked softmaxes) instead
    of M-1 Python-unrolled per-modality graphs.  Fewer, larger fusions —
    the ROADMAP "chunked SDM" train-step candidate; promoted only through a
    same-day A/B pair plus the train golden-parity tolerance
    (config.sdm_impl='batched')."""
    labels = labels.astype(jnp.int32)
    y_full = (labels[:, None] == labels[None, :]).astype(jnp.float32)  # [B, B]
    vis_feat = modality_features[vis_slot]
    vis_mask = modality_masks[vis_slot]

    idx = jnp.asarray(
        [m for m in range(modality_features.shape[0]) if m != vis_slot]
    )
    losses, gates = jax.vmap(
        lambda q, qm: sdm_loss(q, vis_feat, y_full, qm, vis_mask, tau)
    )(modality_features[idx], modality_masks[idx])
    total = (losses * gates).sum() / jnp.maximum(gates.sum(), 1.0)
    return jnp.where(jnp.isfinite(total), total, 0.0)
