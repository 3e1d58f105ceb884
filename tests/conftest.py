"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated the standard way — 8 virtual CPU devices via XLA flags.  This must
run before jax initializes its backends, hence module level in conftest.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overwrites
# jax_platforms; undo that so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on CPU devices"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_synthetic_orbench(root, num_ids=6, anchors_per_id=2, img_size=48):
    """Write a tiny ORBench-style tree: vis/nir/sk/cp dirs + text_annos.json.

    Layout mirrors the reference's annotation contract
    (reference: datasets/dataset.py:341-447): JSON lists only vis paths +
    captions; nir is an identity-level pool; sk/cp filenames carry
    front/back/side view tags.

    Images carry an identity-dependent base pattern + per-image noise so
    that retrieval is LEARNABLE (the convergence test depends on this).
    """
    import json as _json
    import os

    from PIL import Image

    g = np.random.default_rng(1234)
    annos = []
    for pid in range(1, num_ids + 1):
        pid_str = f"{pid:04d}"
        for mod in ("vis", "nir", "sk", "cp"):
            os.makedirs(os.path.join(root, mod, pid_str), exist_ok=True)

        id_rng = np.random.default_rng(10_000 + pid)
        base = id_rng.integers(30, 225, (img_size, img_size, 3)).astype(np.int16)

        def _write(relpath):
            noise = g.integers(-25, 25, (img_size, img_size, 3))
            arr = np.clip(base + noise, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(root, relpath))

        for a in range(anchors_per_id):
            rel = f"vis/{pid_str}/{pid_str}_cam{a}_{a:04d}_vis.jpg"
            _write(rel)
            annos.append(
                {
                    "file_path": rel,
                    "caption": f"person {pid} wearing outfit {a} walking",
                }
            )
        for n in range(2):
            _write(f"nir/{pid_str}/{pid_str}_nir_{n:04d}.jpg")
        for view in ("front", "back"):
            _write(f"sk/{pid_str}/{pid_str}_{view}_sk.jpg")
            _write(f"cp/{pid_str}/{pid_str}_{view}_cp.jpg")
    with open(os.path.join(root, "text_annos.json"), "w") as f:
        _json.dump(annos, f)
    return root


@pytest.fixture(scope="session")
def orbench_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("orbench")
    return make_synthetic_orbench(str(root))


@pytest.fixture(scope="session")
def tiny_data_config(orbench_root):
    import os

    from prcv2025reid_tpu.configs import TrainingConfig

    return TrainingConfig(
        data_root=orbench_root,
        json_file=os.path.join(orbench_root, "text_annos.json"),
        image_size=32,
        text_context_length=16,
        text_vocab_size=100,
        num_ids_per_batch=3,
        instances_per_id=2,
    )


@pytest.fixture(scope="session")
def tiny_dataset(tiny_data_config):
    from prcv2025reid_tpu.data.dataset import MultiModalDataset

    return MultiModalDataset(tiny_data_config, split="train")


@pytest.fixture(scope="session")
def tiny_tokenizer(tiny_data_config):
    from prcv2025reid_tpu.data.tokenizer import build_tokenizer

    c = tiny_data_config
    return build_tokenizer(
        c.tokenizer_vocab_path, c.text_vocab_size, c.text_context_length
    )
