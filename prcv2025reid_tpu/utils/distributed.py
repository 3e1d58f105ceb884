"""Multi-host (multi-process) runtime glue.

The reference is single-process/single-GPU (SURVEY.md §5.8 — its only
``torch.distributed`` use is a vestigial ``get_world_size`` log line,
reference train.py:1326-1341).  This framework's sharding already scales
over a ``jax.sharding.Mesh`` within one process; this module adds the
remaining production pieces for a REAL multi-host pod (v5e-16+, one Python
process per host):

- :func:`initialize_from_config` — ``jax.distributed.initialize()`` driven
  by ``TrainingConfig`` (``--distributed=auto`` on a managed pod is the
  whole flag story; coordinator/rank flags exist for bare-metal setups).
  Must run before the first device query; ``train.py`` calls it first.
- :func:`is_main_process` — gate for host-side artifacts (CSV histories,
  TensorBoard event files, checkpoint sidecars) that exactly one process
  may write when ``save_dir``/``log_dir`` live on shared storage.
- :func:`barrier` — cross-process sync point (no-op single-process);
  the checkpoint swap uses it so process 0 only promotes a staging dir
  after every process's orbax shard write is durable.
- :func:`fetch_global` — ``np.asarray`` that also works on globally
  sharded arrays whose shards live on other hosts (the eval feature
  fetch): per-process ``np.asarray`` of a non-fully-addressable array
  raises, so multi-process fetch goes through
  ``multihost_utils.process_allgather``.

Single-process behavior is bit-identical to not importing this module —
every helper degenerates to a no-op/identity, which is what the test
suite (single process, virtual 8-device mesh) exercises; the multi-process
branches follow the documented jax.distributed/multihost_utils contracts
and activate only when ``jax.process_count() > 1``.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

# set by initialize_from_config so a second call (e.g. library re-entry)
# never re-initializes the runtime
_INITIALIZED = False

# env vars that mark a managed multi-process environment where
# jax.distributed.initialize() auto-discovers everything (GKE/TPU-pod
# launchers export one of these per the jax.distributed docs)
_AUTO_ENV_VARS = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "CLOUD_TPU_TASK_ID",
    "TPU_WORKER_HOSTNAMES",
)


def initialize_from_config(config) -> bool:
    """Call ``jax.distributed.initialize()`` per ``config.distributed``.

    Modes:
      - ``"off"`` (default): never initialize — single-process run.
      - ``"auto"``: initialize only when a coordinator is discoverable —
        ``config.coordinator_address`` is set or one of the managed-pod
        env vars is present.  Safe to leave on in launch scripts: a plain
        single-host invocation stays single-process.
      - ``"on"``: always initialize (bare-metal multi-host — pass
        ``--coordinator_address=host:port --num_processes=N
        --process_id=R`` on each host).

    Returns True iff the distributed runtime was initialized by this call.
    MUST run before anything queries devices (jax backends are initialized
    lazily on first use and cannot be re-initialized).
    """
    mode = getattr(config, "distributed", "off")
    if mode == "off":
        return False
    global _INITIALIZED
    if _INITIALIZED:
        return False
    has_env = any(os.environ.get(v) for v in _AUTO_ENV_VARS)
    coord = getattr(config, "coordinator_address", None)
    if mode == "auto" and not (coord or has_env):
        logger.info(
            "--distributed=auto: no coordinator discoverable (flags/env) — "
            "running single-process"
        )
        return False

    import jax

    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
    elif os.environ.get("COORDINATOR_ADDRESS"):
        # this env name triggers auto mode above but jax's own discovery
        # does not read it — forward it explicitly so initialize() can
        # actually find the coordinator
        kwargs["coordinator_address"] = os.environ["COORDINATOR_ADDRESS"]
    n = getattr(config, "num_processes", None)
    if n is not None:
        kwargs["num_processes"] = int(n)
    r = getattr(config, "process_id", None)
    if r is not None:
        kwargs["process_id"] = int(r)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    logger.info(
        "jax.distributed initialized: process %d / %d (%d local of %d "
        "global devices)",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


def is_main_process() -> bool:
    """True on the process that owns shared host-side artifacts.

    CSV/TensorBoard histories and checkpoint sidecars are whole-file
    rewrites; on shared storage every process writing them is a race (and
    N-1 of the writes are pure waste).  Orbax array saves are NOT gated by
    this — they are collective (each process writes its addressable
    shards) — only the sidecar + atomic swap are (training/checkpoint.py).
    """
    import jax

    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Block until every process reaches this point (no-op single-process).

    ``name`` must be unique per sync point and identical across processes
    (the multihost_utils contract)."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def fetch_global(x):
    """``np.asarray(x)`` that tolerates cross-host sharded arrays.

    Single-process (including the virtual 8-device CPU mesh): plain
    ``np.asarray`` — all shards are addressable.  Multi-process: a
    GSPMD-sharded eval embedding has shards on other hosts, where
    ``np.asarray`` raises; ``process_allgather(tiled=True)`` materializes
    the GLOBAL value on every host (eval features are [B, 512] — small)."""
    import numpy as np

    import jax

    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
