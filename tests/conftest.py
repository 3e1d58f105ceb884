"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated the standard way — 8 virtual CPU devices via XLA flags.  This must
run before jax initializes its backends, hence module level in conftest.
"""
import os
import re

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
# the suite owns its device topology: rewrite any pre-existing count to 8
# rather than aborting later on an inherited 4-device environment
if "xla_force_host_platform_device_count" in flags:
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "--xla_force_host_platform_device_count=8",
        flags,
    )
    os.environ["XLA_FLAGS"] = flags
else:
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
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {len(jax.devices())} — jax "
    "initialized before conftest could set XLA_FLAGS (import order issue?)"
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Tiny ViT dims shared by the per-file TINY configs (single authority: a
# numerics-relevant change here reaches every test file; files override via
# {**TINY_BASE, ...}).
TINY_BASE = dict(
    gradient_accumulation_steps=1,  # defeat auto-accum: tests assert per-step updates
    vision_hidden_dim=64,
    vision_layers=2,
    vision_heads=4,
    vision_mlp_dim=128,
    text_hidden_dim=32,
    text_layers=2,
    text_heads=4,
    text_mlp_dim=64,
    text_vocab_size=100,
    text_context_length=16,
    image_size=32,
    fusion_dim=32,
    sdm_semantic_dim=32,
    sdm_num_heads=4,
    fusion_num_heads=4,
    compute_dtype="float32",
    use_pallas_attention=False,
    drop_path=0.0,
)


# promoted into the package (round 3) so __graft_entry__'s submission-export
# dry run can build a dataset too; re-exported here because the verify-skill
# drive recipes do `from conftest import make_synthetic_orbench`
from prcv2025reid_tpu.utils.synthetic import make_synthetic_orbench  # noqa: E402,F401


@pytest.fixture(scope="session")
def orbench_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("orbench")
    return make_synthetic_orbench(str(root))


@pytest.fixture(scope="session")
def tiny_data_config(orbench_root):
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
