"""Training subsystem tests: schedulers, param groups/freezing, train step,
monitors, checkpoint/resume."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
from prcv2025reid_tpu.training.checkpoint import (
    latest_checkpoint_exists,
    restore_checkpoint,
    save_checkpoint,
)
from prcv2025reid_tpu.training.monitors import (
    CEDiagnostics,
    PairCoverageMonitor,
    SpikeDetector,
)
from prcv2025reid_tpu.training.param_groups import (
    build_label_tree,
    build_optimizer,
    count_trainable,
)
from prcv2025reid_tpu.training.schedulers import (
    SDMScheduler,
    SDMTemperatureScheduler,
    SDMWeightScheduler,
    warmup_cosine_multiplier,
)
from prcv2025reid_tpu.training.train_step import TrainState, make_embed_step, make_train_step

from conftest import TINY_BASE

TINY = {**TINY_BASE, "num_epochs": 4, "warmup_epochs": 1}


def _batch(B=6, rng=None):
    rng = rng or np.random.default_rng(0)
    return {
        "images": jnp.asarray(rng.normal(size=(B, 4, 32, 32, 3)), jnp.float32),
        "image_mask": jnp.ones((B, 4), jnp.float32),
        "text_tokens": jnp.ones((B, 16), jnp.int32).at[:, 3].set(99),
        "text_mask": jnp.ones(B, jnp.float32),
        "labels": jnp.asarray([0, 0, 1, 1, 2, 2][:B], jnp.int32),
    }


@pytest.fixture(scope="module")
def setup():
    config = TrainingConfig(**TINY)
    model = MultiModalReIDModel(config=config, num_classes=3, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    b = _batch()
    variables = model.init(
        {"params": rng},
        b["images"],
        b["image_mask"],
        b["text_tokens"],
        b["text_mask"],
        train=False,
    )
    tx = build_optimizer(config, variables["params"], steps_per_epoch=10)
    state = TrainState.create(
        variables["params"], variables["batch_stats"], tx, jax.random.PRNGKey(1)
    )
    step_fn = make_train_step(model, tx, config)
    return config, model, tx, state, step_fn


class TestSchedulers:
    def test_sdm_weight_schedule(self):
        s = SDMWeightScheduler(warmup_epochs=1, schedule=(0.1, 0.3, 0.5))
        assert s.get_weight(1) == 0.0
        assert s.get_weight(2) == 0.1
        assert s.get_weight(3) == 0.3
        assert s.get_weight(4) == 0.5
        assert s.get_weight(9) == 0.5

    def test_sdm_weight_gates(self):
        s = SDMWeightScheduler()
        assert not s.can_increase_weight(5, {"stability_score": 0.9})
        assert not s.can_increase_weight(11, {"stability_score": 0.5})
        assert s.can_increase_weight(11, {"stability_score": 0.9})
        assert not s.can_increase_weight(
            11, {"stability_score": 0.9}, {"map_avg2": 0.05}
        )

    def test_temperature_fallback(self):
        t = SDMTemperatureScheduler(init_temp=0.18, final_temp=0.16, warmup_epochs=3)
        assert t.get_temperature(1) == 0.18
        assert t.get_temperature(5) == 0.16
        t.check_stability({"sdm_loss": 9.0, "stability_score": 1.0})
        assert t.get_temperature(5) == 0.20
        t.reset_to_normal()
        assert t.get_temperature(5) == 0.16

    def test_combined_tolerates_missing_metrics(self):
        s = SDMScheduler()
        w, t = s.get_parameters(3, {})
        assert w == s.weight_scheduler.current_weight
        assert t == s.temp_scheduler.current_temp

    def test_step_and_multistep_schedulers(self):
        from prcv2025reid_tpu.training.schedulers import lr_multiplier_jnp

        m = lambda e, **kw: float(lr_multiplier_jnp(e, **kw))
        # step: gamma every 10 epochs after 2-epoch warmup
        kw = dict(scheduler="step", num_epochs=40, warmup_epochs=2,
                  step_every=10, step_gamma=0.1, floor=0.001)
        assert m(2, **kw) == pytest.approx(1.0)
        assert m(11, **kw) == pytest.approx(1.0)
        assert m(12, **kw) == pytest.approx(0.1)
        assert m(22, **kw) == pytest.approx(0.01)
        # multistep at milestones
        kw = dict(scheduler="multistep", num_epochs=40, warmup_epochs=2,
                  milestones=(10, 20), step_gamma=0.5, floor=0.001)
        assert m(5, **kw) == pytest.approx(1.0)
        assert m(10, **kw) == pytest.approx(0.5)
        assert m(20, **kw) == pytest.approx(0.25)

    def test_warmup_cosine_shape(self):
        mult = [warmup_cosine_multiplier(e, 10, 2, 0.01) for e in range(10)]
        assert mult[0] < mult[1] <= 1.0  # warmup rises
        assert abs(mult[2] - 1.0) < 1e-6  # peak after warmup
        assert mult[-1] < 0.1  # decays toward floor
        assert min(mult) >= 0.01


class TestParamGroups:
    def test_label_assignment(self, setup):
        config, model, tx, state, _ = setup
        labels = build_label_tree(state.params, freeze_backbone=True)
        flat = jax.tree_util.tree_flatten_with_path(labels)[0]
        by_path = {
            "/".join(k.key for k in path if hasattr(k, "key")): lbl
            for path, lbl in flat
        }
        assert by_path["null_tokens"] == "other_modules"
        lora_labels = {v for k, v in by_path.items() if "lora_" in k}
        assert lora_labels == {"mer_loras"}
        shared = {v for k, v in by_path.items() if "shared/kernel" in k}
        assert shared == {"frozen"}
        cls = {v for k, v in by_path.items() if "classifier" in k}
        assert cls == {"classification_head"}

    def test_frozen_params_do_not_move(self, setup):
        config, model, tx, state, step_fn = setup
        b = _batch()
        new_state, metrics = step_fn(state, b, jnp.float32(0.1), jnp.float32(0.2))
        before = state.params["encoder"]["vision"]["block_0"]["attn"]["q_proj"]["shared"]["kernel"]
        after = new_state.params["encoder"]["vision"]["block_0"]["attn"]["q_proj"]["shared"]["kernel"]
        np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
        # trainable groups DO move
        lb = state.params["encoder"]["vision"]["block_0"]["attn"]["q_proj"]["lora_B"]
        la = new_state.params["encoder"]["vision"]["block_0"]["attn"]["q_proj"]["lora_B"]
        assert np.abs(np.asarray(lb) - np.asarray(la)).max() > 0

    def test_count_trainable(self, setup):
        config, model, tx, state, _ = setup
        counts = count_trainable(state.params, freeze_backbone=True)
        assert counts["frozen"] > counts["mer_loras"] > 0
        assert counts["classification_head"] > 0


class TestTrainStep:
    def test_metrics_finite_and_params_update(self, setup):
        config, model, tx, state, step_fn = setup
        b = _batch()
        new_state, m = step_fn(state, b, jnp.float32(0.3), jnp.float32(0.2))
        for k, v in m.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        assert float(m["skipped"]) == 0.0
        assert float(m["sdm_loss"]) > 0
        assert int(new_state.step) == 1

    def test_loss_decreases_over_steps(self, setup):
        config, model, tx, state, step_fn = setup
        b = _batch()
        first = None
        s = state
        for i in range(8):
            s, m = step_fn(s, b, jnp.float32(0.0), jnp.float32(0.2))
            if first is None:
                first = float(m["ce_loss"])
        assert float(m["ce_loss"]) < first

    def test_grad_norm_history_advances(self, setup):
        config, model, tx, state, step_fn = setup
        b = _batch()
        s, _ = step_fn(state, b, jnp.float32(0.0), jnp.float32(0.2))
        assert int(s.grad_norm_count) == 1
        assert float(s.grad_norm_hist[0]) > 0

    def test_donated_state_aliases_buffers(self, setup):
        """donate=True (the Trainer's production path) must invalidate the
        pre-step state object and still step correctly when rebound."""
        config, model, tx, state, _ = setup
        donating = make_train_step(model, tx, config, donate=True)
        # private copy: the module-scoped fixture state is shared across tests
        s = jax.tree.map(jnp.copy, state)
        old_leaf = s.params["encoder"]["vision"]["block_0"]["attn"]["q_proj"]["lora_B"]
        b = _batch()
        s2, m = donating(s, b, jnp.float32(0.1), jnp.float32(0.2))
        assert np.isfinite(float(m["total_loss"]))
        with pytest.raises(RuntimeError, match="deleted"):
            np.asarray(old_leaf)  # donated buffer is gone
        step2 = int(s2.step)  # read BEFORE s2 is donated in turn
        s3, m2 = donating(s2, b, jnp.float32(0.1), jnp.float32(0.2))
        assert int(s3.step) == step2 + 1 == 2

    def test_nan_batch_skips_everything(self, setup):
        """A non-finite loss must leave params, optimizer state, BN stats and
        the clip history untouched (reference skips optimizer.step entirely,
        train.py:868-876; AdamW on zero grads would still drift params)."""
        config, model, tx, state, step_fn = setup
        bad = _batch()
        bad["images"] = bad["images"].at[0, 0, 0, 0, 0].set(jnp.nan)
        new_state, m = step_fn(state, bad, jnp.float32(0.0), jnp.float32(0.2))
        assert float(m["skipped"]) == 1.0
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            new_state.params,
            state.params,
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            new_state.batch_stats,
            state.batch_stats,
        )
        assert int(new_state.skipped_total) == int(state.skipped_total) + 1
        np.testing.assert_array_equal(
            np.asarray(new_state.grad_norm_hist), np.asarray(state.grad_norm_hist)
        )

    def test_embed_step(self, setup):
        config, model, tx, state, step_fn = setup
        embed = make_embed_step(model)
        b = _batch()
        feats = embed({"params": state.params, "batch_stats": state.batch_stats}, b)
        norms = np.linalg.norm(np.asarray(feats), axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


class TestMetricRing:
    def test_ring_records_every_step(self, setup):
        """Each step writes (total, ce, sdm, coverage) into its ring row —
        the epoch-end feed for the spike/pair-coverage monitors (the
        reference updates them per batch, train.py:933-956)."""
        config, model, tx, state, step_fn = setup
        s = TrainState.create(
            state.params, state.batch_stats, tx, jax.random.PRNGKey(1), ring_size=5
        )
        per_step = []
        for i in range(3):
            b = _batch(rng=np.random.default_rng(i))
            s, m = step_fn(s, b, jnp.float32(0.2), jnp.float32(0.2))
            per_step.append((float(m["total_loss"]), float(m["ce_loss"]), float(m["sdm_loss"])))
        ring = np.asarray(s.metric_ring)
        for i, (tot, ce, sdm) in enumerate(per_step):
            assert ring[i, 0] == pytest.approx(tot, rel=1e-5)
            assert ring[i, 1] == pytest.approx(ce, rel=1e-5)
            assert ring[i, 2] == pytest.approx(sdm, rel=1e-5)
            assert 0.0 <= ring[i, 3] <= 1.0  # pair coverage
        assert np.all(ring[3:] == 0)  # untouched rows

    def test_spike_detector_sees_injected_midepoch_spike(self, setup):
        """A poisoned batch mid-epoch lands in the ring (even though the
        update is skipped) and the host detector counts it."""
        config, model, tx, state, step_fn = setup
        s = TrainState.create(
            state.params, state.batch_stats, tx, jax.random.PRNGKey(1), ring_size=8
        )
        n = 0
        for i in range(6):
            b = _batch(rng=np.random.default_rng(i))
            if i == 3:
                b["images"] = b["images"].at[0, 0, 0, 0, 0].set(jnp.nan)
            s, _ = step_fn(s, b, jnp.float32(0.0), jnp.float32(0.2))
            n += 1
        ring = np.asarray(s.metric_ring)[:n]
        det = SpikeDetector(min_samples=2)
        for row in ring:
            det.update(float(row[0]))
        assert det.spikes >= 1  # the NaN row counts as a spike
        assert not np.isfinite(ring[3, 0])


class TestEnableMer:
    def test_disabled_equals_enabled_at_zero_init(self, setup):
        """LoRA B is zero-init, so enable_mer=False must produce the exact
        same forward at step 0 (the delta path is identically zero)."""
        config, model, tx, state, _ = setup
        from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel

        model_off = MultiModalReIDModel(
            config=config.replace(enable_mer=False), num_classes=3, dtype=jnp.float32
        )
        b = _batch()
        vars_ = {"params": state.params, "batch_stats": state.batch_stats}
        out_on = model.apply(vars_, b["images"], b["image_mask"], b["text_tokens"], b["text_mask"], train=False)
        out_off = model_off.apply(vars_, b["images"], b["image_mask"], b["text_tokens"], b["text_mask"], train=False)
        np.testing.assert_allclose(
            np.asarray(out_on["logits"]), np.asarray(out_off["logits"]), atol=1e-5
        )

    def test_disabled_ignores_lora_perturbation(self, setup):
        config, model, tx, state, _ = setup
        from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel

        import copy
        params = jax.tree.map(lambda x: x, state.params)
        lb = params["encoder"]["vision"]["block_0"]["attn"]["q_proj"]["lora_B"]
        params["encoder"]["vision"]["block_0"]["attn"]["q_proj"]["lora_B"] = lb + 1.0
        vars_ = {"params": params, "batch_stats": state.batch_stats}
        b = _batch()
        model_off = MultiModalReIDModel(
            config=config.replace(enable_mer=False), num_classes=3, dtype=jnp.float32
        )
        out_off = model_off.apply(vars_, b["images"], b["image_mask"], b["text_tokens"], b["text_mask"], train=False)
        out_on = model.apply(vars_, b["images"], b["image_mask"], b["text_tokens"], b["text_mask"], train=False)
        base = {"params": state.params, "batch_stats": state.batch_stats}
        out_base = model.apply(base, b["images"], b["image_mask"], b["text_tokens"], b["text_mask"], train=False)
        # routed model reacts to the perturbation; unrouted does not
        assert np.abs(np.asarray(out_on["logits"]) - np.asarray(out_base["logits"])).max() > 1e-4
        out_off_base = model_off.apply(base, b["images"], b["image_mask"], b["text_tokens"], b["text_mask"], train=False)
        np.testing.assert_allclose(
            np.asarray(out_off["logits"]), np.asarray(out_off_base["logits"]), atol=1e-6
        )


class TestFreezeTextBackbone:
    def test_text_tower_labeled_frozen(self, setup):
        config, model, tx, state, _ = setup
        labels = build_label_tree(
            state.params, freeze_backbone=False, freeze_text_backbone=True
        )
        flat = jax.tree_util.tree_flatten_with_path(labels)[0]
        by_path = {
            "/".join(k.key for k in path if hasattr(k, "key")): lbl
            for path, lbl in flat
        }
        text_tower = {v for k, v in by_path.items() if k.startswith("encoder/text/")}
        assert text_tower == {"frozen"}
        # text_proj stays trainable (reference freezes the tower only,
        # models/clip_backbone.py:213-215)
        proj = {v for k, v in by_path.items() if "text_proj" in k}
        assert proj == {"projections"}
        # vision trunk unaffected
        vis = {v for k, v in by_path.items() if "block_0/attn" in k and "shared" in k}
        assert vis == {"clip_backbone"}


class TestMonitors:
    def test_spike_detector(self):
        det = SpikeDetector()
        for _ in range(30):
            det.update(1.0)
        assert not det.update(1.05)
        assert det.update(10.0)
        assert det.stability_score < 1.0

    def test_pair_coverage(self):
        mon = PairCoverageMonitor(window=10)
        pids = np.asarray([1, 1, 2, 2])
        img = np.asarray([[1, 0, 0, 0], [0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 0, 0]], np.float32)
        txt = np.asarray([0, 0, 0, 0], np.float32)
        cov = mon.update(pids, img, txt)
        assert cov == 0.5  # id1 has vis+nonvis, id2 has only vis
        txt2 = np.asarray([0, 0, 0, 1], np.float32)
        assert mon.update(pids, img, txt2) == 1.0

    def test_ce_diagnostics(self):
        d = CEDiagnostics(num_classes=100)
        assert d.is_random(np.log(100))
        assert not d.is_random(1.0)


class TestCheckpoint:
    def test_roundtrip(self, setup, tmp_path):
        config, model, tx, state, step_fn = setup
        b = _batch()
        s1, _ = step_fn(state, b, jnp.float32(0.1), jnp.float32(0.2))
        host = {"epoch": 3, "best_map": 0.42, "sampler_rng": {"a": 1}}
        save_checkpoint(str(tmp_path), s1, host)
        assert latest_checkpoint_exists(str(tmp_path))
        restored, host2 = restore_checkpoint(str(tmp_path), state)
        assert host2["epoch"] == 3
        assert int(restored.step) == int(s1.step)
        jax.tree.map(
            lambda a, b2: np.testing.assert_array_equal(np.asarray(a), np.asarray(b2)),
            restored.params,
            s1.params,
        )

    def test_async_save_commits_sidecar_on_finalize(self, setup, tmp_path):
        """block=False: the host sidecar (the 'checkpoint is complete'
        marker) lands only at finalize, so readers never see a half-written
        directory; the restored state is identical to a blocking save's."""
        from prcv2025reid_tpu.training.checkpoint import finalize_pending_saves

        config, model, tx, state, step_fn = setup
        b = _batch()
        s1, _ = step_fn(state, b, jnp.float32(0.1), jnp.float32(0.2))
        host = {"epoch": 5, "best_map": 0.1}
        save_checkpoint(str(tmp_path), s1, host, name="async", block=False)
        assert not latest_checkpoint_exists(str(tmp_path), name="async")
        finalize_pending_saves()
        assert latest_checkpoint_exists(str(tmp_path), name="async")
        restored, host2 = restore_checkpoint(str(tmp_path), state, name="async")
        assert host2["epoch"] == 5
        jax.tree.map(
            lambda a, b2: np.testing.assert_array_equal(np.asarray(a), np.asarray(b2)),
            restored.params, s1.params,
        )

        # a subsequent save finalizes the previous in-flight one implicitly
        save_checkpoint(str(tmp_path), s1, host, name="a2", block=False)
        save_checkpoint(str(tmp_path), s1, host, name="a3", block=False)
        assert latest_checkpoint_exists(str(tmp_path), name="a2")
        assert not latest_checkpoint_exists(str(tmp_path), name="a3")
        finalize_pending_saves()
        assert latest_checkpoint_exists(str(tmp_path), name="a3")

        # restore also drains the pipeline: save async then restore directly
        save_checkpoint(str(tmp_path), s1, host, name="a4", block=False)
        restored, _ = restore_checkpoint(str(tmp_path), state, name="a4")
        assert int(restored.step) == int(s1.step)

    def test_overwrite_is_atomic(self, setup, tmp_path):
        """Re-saving a name never destroys the previous checkpoint: the write
        stages in <name>.tmp and swaps in only when complete, and interrupted
        swaps are recovered on read."""
        import os
        import shutil

        config, model, tx, state, step_fn = setup
        b = _batch()
        s1, _ = step_fn(state, b, jnp.float32(0.1), jnp.float32(0.2))
        save_checkpoint(str(tmp_path), s1, {"epoch": 1})
        save_checkpoint(str(tmp_path), s1, {"epoch": 2})
        _, host = restore_checkpoint(str(tmp_path), state)
        assert host["epoch"] == 2
        path = str(tmp_path / "latest")
        assert not os.path.exists(path + ".tmp")
        assert not os.path.exists(path + ".old")

        # crash before the swap (incomplete staging left behind): the old
        # checkpoint must keep serving and the garbage must not be promoted
        os.makedirs(path + ".tmp/state", exist_ok=True)
        assert latest_checkpoint_exists(str(tmp_path))
        _, host = restore_checkpoint(str(tmp_path), state)
        assert host["epoch"] == 2
        shutil.rmtree(path + ".tmp")

        # crash between the two renames: path gone, complete staging + old —
        # recovery must promote the NEWER staging dir
        save_checkpoint(str(tmp_path), s1, {"epoch": 3})  # -> the new 'old'
        os.rename(path, path + ".bak")
        save_checkpoint(str(tmp_path), s1, {"epoch": 4})
        os.rename(path, path + ".tmp")  # complete checkpoint as staging
        os.rename(path + ".bak", path + ".old")
        _, host = restore_checkpoint(str(tmp_path), state)
        assert host["epoch"] == 4
        assert not os.path.exists(path + ".old")

        # crash after rename(path -> old) with staging not yet complete:
        # recovery must roll the old checkpoint back into place
        os.rename(path, path + ".old")
        assert latest_checkpoint_exists(str(tmp_path))
        _, host = restore_checkpoint(str(tmp_path), state)
        assert host["epoch"] == 4
