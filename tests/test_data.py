"""Data layer tests: dataset expansion, sampler invariants, collate masks,
tokenizer, split integrity (SURVEY.md §4 tiers a & d)."""
import numpy as np
import pytest

from prcv2025reid_tpu.data.dataset import MultiModalDataset, analyze_sampling_capability
from prcv2025reid_tpu.data.pipeline import HostPipeline, collate
from prcv2025reid_tpu.data.sampler import PKBatchSampler
from prcv2025reid_tpu.data.split import create_split_datasets, split_ids, verify_split_integrity
from prcv2025reid_tpu.data.tokenizer import HashTokenizer, build_tokenizer
from prcv2025reid_tpu.utils.modalities import canon_mod


class TestModalityCanon:
    def test_aliases(self):
        assert canon_mod("rgb") == "vis"
        assert canon_mod("IR") == "nir"
        assert canon_mod("sketch") == "sk"
        assert canon_mod("cpencil") == "cp"
        assert canon_mod("TEXT") == "text"
        assert canon_mod("v") == "vis"
        assert canon_mod("coloredpencil") == "cp"
        # reference-exact: unknown names pass through lowercased
        assert canon_mod("bogus") == "bogus"
        assert canon_mod(None) == ""


class TestDataset:
    def test_record_expansion(self, tiny_data_config):
        ds = MultiModalDataset(tiny_data_config, "train")
        assert len(ds) == 12  # 6 ids x 2 anchors
        rec = ds.records[0]
        assert rec.vis and rec.nir
        assert rec.pool("sk") and rec.pool("cp")
        assert rec.modality_mask() == {m: 1.0 for m in ("vis", "nir", "sk", "cp", "text")}

    def test_get_sample_shapes_and_masks(self, tiny_data_config):
        ds = MultiModalDataset(tiny_data_config, "train")
        s = ds.get_sample(0, np.random.default_rng(0), modality_dropout=0.0)
        assert s["images"].shape == (4, 32, 32, 3)
        assert s["image_mask"].tolist() == [1.0, 1.0, 1.0, 1.0]
        assert s["text_mask"] == 1.0
        assert s["label"] >= 0

    def test_modality_dropout_zeroes_mask_and_image(self, tiny_data_config):
        ds = MultiModalDataset(tiny_data_config, "train")
        dropped_any = False
        for seed in range(20):
            s = ds.get_sample(0, np.random.default_rng(seed), modality_dropout=0.5)
            for m in range(4):
                if s["image_mask"][m] == 0.0:
                    dropped_any = True
                    assert np.abs(s["images"][m]).sum() == 0.0
        assert dropped_any

    def test_eval_split_is_deterministic(self, tiny_data_config):
        ds = MultiModalDataset(tiny_data_config, "val")
        a = ds.get_sample(0, np.random.default_rng(0))
        b = ds.get_sample(0, np.random.default_rng(99))
        np.testing.assert_array_equal(a["images"], b["images"])

    def test_analyze_sampling_capability(self, tiny_data_config):
        ds = MultiModalDataset(tiny_data_config, "train")
        report = analyze_sampling_capability(ds)
        assert report["pairable"]
        assert report["strong_ids"] == 6


class TestSampler:
    def test_batch_structure(self, tiny_data_config):
        ds = MultiModalDataset(tiny_data_config, "train")
        sampler = PKBatchSampler(ds, 3, 2, seed=0)
        for batch in sampler:
            assert len(batch) == 6
            # each chosen id-slot contributes K=2 records; under id-reuse the
            # same pid may fill several slots, so counts are multiples of K
            pids = [ds.records[i].pid for i in batch]
            vals, counts = np.unique(pids, return_counts=True)
            assert (counts % 2 == 0).all()
            assert counts.sum() == 6
            break

    def test_strong_ids_and_length(self, tiny_data_config):
        ds = MultiModalDataset(tiny_data_config, "train")
        sampler = PKBatchSampler(ds, 3, 2, seed=0)
        assert len(sampler.strong_ids) == 6
        assert len(sampler) == sampler.nominal_steps == max(1, 12 // 6)

    def test_rng_state_roundtrip(self, tiny_data_config):
        ds = MultiModalDataset(tiny_data_config, "train")
        s1 = PKBatchSampler(ds, 3, 2, seed=7)
        state = s1.state_dict()
        a = s1.sample_batch()
        s2 = PKBatchSampler(ds, 3, 2, seed=99)
        s2.load_state_dict(state)
        b = s2.sample_batch()
        assert a == b

    def test_no_id_reuse_consumes_pool(self, tiny_data_config):
        """allow_id_reuse=False: every id serves at most once per epoch and
        the epoch ends when the pool is spent (reference removes used pids,
        datasets/dataset.py:1458-1464)."""
        ds = MultiModalDataset(tiny_data_config, "train")
        sampler = PKBatchSampler(ds, 2, 2, allow_id_reuse=False, seed=0,
                                 steps_per_epoch=50)
        batches = list(sampler)
        assert len(sampler) == 3  # 6 strong ids // P=2
        seen = [ds.records[i].pid for b in batches for i in b]
        vals, counts = np.unique(seen, return_counts=True)
        assert (counts <= 2).all()  # each id at most once (K=2 records)
        assert len(batches) <= 3

    def test_odd_k_gives_extra_nonvis(self, tiny_data_config):
        ds = MultiModalDataset(tiny_data_config, "train")
        sampler = PKBatchSampler(ds, 2, 3, seed=0)
        batch = sampler.sample_batch()
        assert len(batch) == 6

    def test_no_reuse_len_matches_iter(self, tiny_data_config):
        """len(sampler) sizes the LR horizon + metric ring (trainer.py) — it
        must agree with what __iter__ actually yields, including the
        steps_per_epoch cap and the soft-pool fill."""
        ds = MultiModalDataset(tiny_data_config, "train")
        # cap below the pool-drain count: len must respect the cap
        s = PKBatchSampler(ds, 2, 2, allow_id_reuse=False, seed=0,
                           steps_per_epoch=2)
        assert len(s) == 2
        assert len(list(s)) <= 2
        # no cap: len is the pool-drain bound and iter never exceeds it
        s = PKBatchSampler(ds, 2, 2, allow_id_reuse=False, seed=0,
                           steps_per_epoch=50)
        assert len(list(s)) <= len(s)

    def test_plain_mode_epoch_sized_by_records(self, tiny_data_config):
        """force_modal_pairs=False never consults the pair buckets, so the
        nominal epoch must cover the usable records, not the strong-pair
        supply."""
        ds = MultiModalDataset(tiny_data_config, "train")
        plain = PKBatchSampler(ds, 2, 2, seed=0, force_modal_pairs=False)
        usable = len(ds.records)  # every tiny-fixture record is usable
        assert plain.nominal_steps == max(1, usable // 4)


class TestCollate:
    def test_real_mask_semantics(self, tiny_data_config):
        """The real-mask distinction is placeholder-vs-loaded, not
        pixel-nonzero: a failed load carries mask 0 out of get_sample, while a
        genuinely all-black loaded image KEEPS its mask (the reference tests
        the normalized tensor, where black is non-zero —
        datasets/dataset.py:1526-1554)."""
        ds = MultiModalDataset(tiny_data_config, "train")
        tok = HashTokenizer(100, 16)
        s0 = ds.get_sample(0, np.random.default_rng(0), modality_dropout=0.0)
        s1 = ds.get_sample(1, np.random.default_rng(1), modality_dropout=0.0)
        # a real-but-black image stays a valid modality
        s1["images"][2] = 0
        batch = collate([s0, s1], tok)
        assert batch["image_mask"][1, 2] == 1.0
        assert batch["image_mask"][0, 2] == 1.0
        # a load failure (zero placeholder + mask 0 from get_sample) stays out
        s1["images"][3] = 0
        s1["image_mask"][3] = 0.0
        batch = collate([s0, s1], tok)
        assert batch["image_mask"][1, 3] == 0.0
        assert batch["images"].shape == (2, 4, 32, 32, 3)
        assert batch["text_tokens"].shape == (2, 16)
        assert batch["text_tokens"].dtype == np.int32

    def test_empty_caption_gets_zero_text_mask(self, tiny_data_config):
        ds = MultiModalDataset(tiny_data_config, "train")
        tok = HashTokenizer(100, 16)
        s = ds.get_sample(0, np.random.default_rng(0))
        s["caption"] = ""
        s["text_mask"] = 0.0
        batch = collate([s], tok)
        assert batch["text_mask"][0] == 0.0


class _SlowFakeDataset:
    """Picklable stand-in whose get_sample burns a fixed wall time — makes
    the overlap property measurable without real decode work."""

    def __init__(self, n: int, delay_s: float):
        self.n = n
        self.delay_s = delay_s

    def __len__(self):
        return self.n

    def get_sample(self, index, rng, modality_dropout=None):
        import time as _time

        _time.sleep(self.delay_s)
        return {
            "images": np.zeros((4, 8, 8, 3), np.uint8),
            "image_mask": np.ones(4, np.float32),
            "caption": "x",
            "text_mask": 1.0,
            "label": int(index) % 4,
            "pid": int(index),
            "index": int(index),
        }


class TestPipeline:
    def test_resolve_num_workers(self):
        import os

        from prcv2025reid_tpu.data.pipeline import resolve_num_workers

        assert resolve_num_workers(0) == 0
        assert resolve_num_workers(3) == 3
        auto = resolve_num_workers(-1)
        assert 1 <= auto <= 32
        try:
            cores = len(os.sched_getaffinity(0))  # cgroup/affinity-aware
        except (AttributeError, OSError):
            cores = os.cpu_count() or 2
        assert auto == max(1, min(32, cores - 1))

    def test_worker_overlap_hides_host_time(self):
        """The pipeline's reason to exist: decode (workers) must overlap the
        device step (main process), so wall time approaches
        max(host, device), not their sum (VERDICT r3 #5 — the property that
        decides whether the chip starves)."""
        import time

        ds = _SlowFakeDataset(n=16, delay_s=0.05)
        tok = HashTokenizer(100, 16)
        batches = [[0, 1], [2, 3], [4, 5], [6, 7]]  # plain index lists
        host_s = len(batches) * 2 * 0.05  # 0.4s of worker-side sample time
        device_s_each = 0.1
        device_s = len(batches) * device_s_each  # 0.4s of "device" time

        def timed_pass():
            pipe = HostPipeline(ds, batches, tok, num_workers=1, seed=0)
            try:
                for _ in pipe:  # warm pass: pool spawn/import cost excluded
                    pass
                t0 = time.perf_counter()
                for _ in pipe:
                    time.sleep(device_s_each)
                return time.perf_counter() - t0
            finally:
                pipe.close()

        # serial would be ~0.8s; require at least half the device time
        # hidden.  Wall-clock on real sleeps can flake on a loaded host —
        # retry once before declaring the overlap property broken.
        bound = host_s + 0.5 * device_s
        wall = timed_pass()
        if wall >= bound:
            wall = min(wall, timed_pass())
        assert wall < bound, (
            f"no overlap: wall {wall:.2f}s vs host {host_s:.2f}s + "
            f"device {device_s:.2f}s"
        )

    def test_threaded_matches_serial(self, tiny_data_config):
        ds = MultiModalDataset(tiny_data_config, "train")
        tok = HashTokenizer(100, 16)
        sampler = PKBatchSampler(ds, 3, 2, seed=3, steps_per_epoch=4)
        serial = HostPipeline(ds, sampler, tok, num_workers=0, seed=5)
        sampler2 = PKBatchSampler(ds, 3, 2, seed=3, steps_per_epoch=4)
        threaded = HostPipeline(ds, sampler2, tok, num_workers=3, seed=5)
        for a, b in zip(serial, threaded):
            np.testing.assert_array_equal(a["labels"], b["labels"])
            np.testing.assert_array_equal(a["images"], b["images"])

    def test_epoch_changes_batches(self, tiny_data_config):
        ds = MultiModalDataset(tiny_data_config, "train")
        tok = HashTokenizer(100, 16)
        sampler = PKBatchSampler(ds, 3, 2, seed=3, steps_per_epoch=2)
        pipe = HostPipeline(ds, sampler, tok, num_workers=0, seed=5)
        first = [b["images"].copy() for b in pipe]
        pipe.set_epoch(1)
        second = [b["images"] for b in pipe]
        assert any(np.abs(a - b).sum() > 0 for a, b in zip(first, second))


class TestAugmentParity:
    def test_contrast_matches_pil_enhance(self):
        """Our contrast jitter must agree with PIL ImageEnhance.Contrast —
        the exact op torchvision's ColorJitter applies to PIL inputs in the
        reference pipeline (datasets/dataset.py:290).  The gray point is the
        LUMA mean, not the flat channel mean."""
        from PIL import Image, ImageEnhance

        rng = np.random.default_rng(0)
        # strongly green-dominant (luma weights green 0.587 vs flat 1/3), so
        # the luma and flat-mean gray points differ by ~50 levels
        x = rng.integers(0, 40, (48, 32, 3), dtype=np.uint8)
        x[..., 1] = rng.integers(200, 256, (48, 32), dtype=np.uint8)
        img = Image.fromarray(x)
        for c in (0.8, 1.2):
            oracle = np.asarray(ImageEnhance.Contrast(img).enhance(c))
            xf = x.astype(np.float32)
            gray = (xf @ np.array([0.299, 0.587, 0.114], np.float32)).mean()
            ours = np.clip((xf - gray) * c + gray, 0, 255).astype(np.uint8)
            # PIL rounds the gray point to an int and rounds per pixel
            diff = np.abs(ours.astype(np.int32) - oracle.astype(np.int32))
            assert diff.max() <= 2, diff.max()
            # and the flat channel mean would NOT pass this bound
            bad_gray = xf.mean()
            bad = np.clip((xf - bad_gray) * c + bad_gray, 0, 255).astype(np.uint8)
            bad_diff = np.abs(bad.astype(np.int32) - oracle.astype(np.int32))
            assert bad_diff.max() > 2


class TestSplit:
    def test_split_ids_disjoint_complete(self):
        train, val = split_ids(list(range(100)), 0.2, seed=42)
        assert len(val) == 20 and len(train) == 80
        assert not (set(train) & set(val))

    def test_create_split_shares_label_space(self, tiny_data_config):
        train_ds, val_ds, pid2label = create_split_datasets(tiny_data_config)
        verify_split_integrity(train_ds, val_ds)
        assert len(pid2label) == 6
        labels = sorted(pid2label.values())
        assert labels == list(range(6))


class TestTokenizer:
    def test_hash_tokenizer_layout(self):
        tok = HashTokenizer(100, 16)
        out = tok(["hello world", ""])
        assert out.shape == (2, 16)
        assert out[0, 0] == 98  # BOS
        assert out[0].max() == 99  # EOT is the max id (argmax pooling)
        assert out[1, 1] == 99  # empty caption = BOS EOT
        np.testing.assert_array_equal(out[1, 2:], 0)

    def test_deterministic(self):
        tok = HashTokenizer(100, 16)
        np.testing.assert_array_equal(tok(["abc def"]), tok(["abc def"]))

    def test_build_tokenizer_fallback(self):
        tok = build_tokenizer(None, 100, 16)
        inner = getattr(tok, "inner", tok)
        assert isinstance(inner, HashTokenizer)

    def test_clip_bpe_matches_hf_on_ascii(self, tmp_path):
        """When vocab files exist, our BPE must agree with HF CLIPTokenizer."""
        pytest.importorskip("transformers")
        # build a miniature vocab from HF's tokenizer machinery: write a tiny
        # vocab/merges pair and compare both implementations on it.
        import json

        from transformers import CLIPTokenizer

        from prcv2025reid_tpu.data.tokenizer import ClipBPETokenizer, _bytes_to_unicode

        base = list(_bytes_to_unicode().values())
        vocab = {tok: i for i, tok in enumerate(base + [t + "</w>" for t in base])}
        merges = ["h e", "he l", "hel l", "hell o</w>", "w o", "wo r", "wor l", "worl d</w>"]
        for m in merges:
            vocab["".join(m.split())] = len(vocab)
        vocab["<|startoftext|>"] = len(vocab)
        vocab["<|endoftext|>"] = len(vocab)
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        (tmp_path / "merges.txt").write_text("#version\n" + "\n".join(merges) + "\n")

        ours = ClipBPETokenizer(str(tmp_path), context_length=12)
        theirs = CLIPTokenizer(
            str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
        )
        for text in ["hello world", "hello", "a b c", "Hello   WORLD"]:
            want = theirs(text, padding="max_length", max_length=12, truncation=True)[
                "input_ids"
            ]
            got = ours([text])[0]
            # HF pads with eot; ours pads with 0 — compare the content region
            n = want.index(theirs.eos_token_id) + 1
            assert got[:n].tolist() == want[:n]
