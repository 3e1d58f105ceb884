"""Multi-host runtime glue (utils/distributed.py).

The single-process behavior must be bit-identical to not having the module
(no-op barrier, identity fetch, main-process == True); the multi-process
branches are exercised for REAL by a 2-process CPU integration test
(jax.distributed over localhost gRPC — the standard way to test multi-host
code without a pod).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.utils import distributed as dist


@pytest.fixture(autouse=True)
def _reset_initialized():
    before = dist._INITIALIZED
    yield
    dist._INITIALIZED = before


class TestConfigFields:
    def test_invalid_mode_rejected(self):
        with pytest.raises(ValueError, match="distributed"):
            TrainingConfig(distributed="yes")

    def test_valid_modes(self):
        for mode in ("off", "auto", "on"):
            assert TrainingConfig(distributed=mode).distributed == mode

    def test_cli_overrides_parse(self):
        from prcv2025reid_tpu.configs import apply_cli_overrides

        c = apply_cli_overrides(
            TrainingConfig(),
            [
                "--distributed=auto",
                "--coordinator_address=10.0.0.1:1234",
                "--num_processes=4",
                "--process_id=2",
            ],
        )
        assert c.distributed == "auto"
        assert c.coordinator_address == "10.0.0.1:1234"
        assert c.num_processes == 4 and c.process_id == 2


class TestInitializeFromConfig:
    def test_off_is_noop(self, monkeypatch):
        import jax

        def boom(**kw):
            raise AssertionError("must not initialize in off mode")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        assert dist.initialize_from_config(TrainingConfig()) is False

    def test_auto_without_coordinator_is_noop(self, monkeypatch):
        import jax

        for v in dist._AUTO_ENV_VARS:
            monkeypatch.delenv(v, raising=False)
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda **kw: pytest.fail("must not initialize"),
        )
        cfg = TrainingConfig(distributed="auto")
        assert dist.initialize_from_config(cfg) is False

    def test_on_passes_flags_through(self, monkeypatch):
        import jax

        seen = {}
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda **kw: seen.update(kw)
        )
        cfg = TrainingConfig(
            distributed="on",
            coordinator_address="h:1",
            num_processes=2,
            process_id=1,
        )
        assert dist.initialize_from_config(cfg) is True
        assert seen == {
            "coordinator_address": "h:1",
            "num_processes": 2,
            "process_id": 1,
        }
        # second call must not re-initialize (the runtime cannot be)
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda **kw: pytest.fail("re-initialized"),
        )
        assert dist.initialize_from_config(cfg) is False

    def test_auto_with_env_coordinator_initializes(self, monkeypatch):
        import jax

        called = []
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda **kw: called.append(kw)
        )
        monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.2:99")
        cfg = TrainingConfig(distributed="auto")
        assert dist.initialize_from_config(cfg) is True
        # COORDINATOR_ADDRESS is OUR trigger name, not one jax's own
        # discovery reads — it must be forwarded explicitly (ADVICE r3)
        assert called == [{"coordinator_address": "10.0.0.2:99"}]

    def test_auto_with_jax_env_uses_jax_discovery(self, monkeypatch):
        import jax

        called = []
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda **kw: called.append(kw)
        )
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.3:99")
        cfg = TrainingConfig(distributed="auto")
        assert dist.initialize_from_config(cfg) is True
        # env names jax.distributed itself reads pass through untouched
        assert called == [{}]


class TestSingleProcessDegenerates:
    def test_is_main_process(self):
        assert dist.is_main_process() is True

    def test_barrier_noop(self):
        dist.barrier("test-point")  # must not raise or block

    def test_fetch_global_numpy_passthrough(self):
        x = np.arange(6).reshape(2, 3)
        np.testing.assert_array_equal(dist.fetch_global(x), x)

    def test_fetch_global_sharded_array(self):
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
        x = jnp.arange(16.0).reshape(8, 2)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        np.testing.assert_array_equal(dist.fetch_global(xs), np.asarray(x))


_CHILD = r"""
import os, sys
port, rank, cache_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=rank
)
assert jax.process_count() == 2, jax.process_count()

import numpy as np
from prcv2025reid_tpu.utils.distributed import (
    barrier, fetch_global, is_main_process,
)

assert is_main_process() == (rank == 0)
barrier("start")

# --- GalleryCache: process 0 is the hit/miss authority; hits broadcast ---
from prcv2025reid_tpu.evaluation.protocol import GalleryCache

cache = GalleryCache(cache_dir, "mp")
feats = np.arange(12, dtype=np.float32).reshape(4, 3)
pids = np.arange(4, dtype=np.int64)
if rank == 0:
    cache.save([1, 2, 3, 4], feats, pids)
barrier("saved")
got = cache.load([1, 2, 3, 4])
assert got is not None, f"rank {rank} missed a process-0 hit"
np.testing.assert_array_equal(got[0], feats)
np.testing.assert_array_equal(got[1], pids)
# misses agree on every process
assert cache.load([9, 9]) is None
# non-main saves are no-ops (one writer on shared storage)
cache.save([7, 7], feats, pids) if rank == 1 else None
barrier("rank1-save")
assert cache.load([7, 7]) is None, "rank-1 save must not write"

# --- fetch_global on a CROSS-PROCESS sharded array ---
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("data",))
full = np.arange(12, dtype=np.float32).reshape(4, 3)
local = full[rank * 2 : (rank + 1) * 2]
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, full.shape
)
assert not arr.is_fully_addressable
np.testing.assert_array_equal(fetch_global(arr), full)

barrier("done")
print(f"CHILD-OK {rank}")
"""


class TestTwoProcessIntegration:
    def test_two_process_cpu(self, tmp_path):
        """Real jax.distributed over localhost: barrier, main-process
        gating, cache authority broadcast, cross-process fetch_global."""
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        script = tmp_path / "child.py"
        script.write_text(_CHILD)
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)  # child sets cpu itself
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(port), str(r),
                 str(tmp_path / "cache")],
                env=env, cwd=root,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for r in (0, 1)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("2-process integration test timed out (deadlock?)")
            outs.append(out)
        for r, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"rank {r} failed:\n{out}"
            assert f"CHILD-OK {r}" in out
