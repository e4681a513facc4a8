"""Spawn-context process pools with the accelerator environment scrubbed.

Worker processes of both the host block-parallel pool (encoder_host) and
the hybrid host+device scheduler (pipeline) are NumPy-only, but this
image's sitecustomize claims the accelerator in EVERY new interpreter
whose environment requests it — a spawned worker would then fight the
parent for the chip and hang.  Children inherit ``os.environ`` at exec
time, so the only lever is the parent's environment during the spawn.
The mutation window is scoped as tightly as multiprocessing allows
(set → spawn → restore in a ``finally``) and serialized behind a module
lock so concurrent pool creations never interleave their save/restore.

Fork is never used: the parent typically holds XLA runtime threads, and
forking a multithreaded process deadlocks (reference-free hazard — see
CPython docs on fork+threads).  Spawned workers re-import by module
path, which is why the worker functions live in jax-free modules.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import threading

# Env keys whose presence makes a fresh interpreter claim the accelerator.
_ACCEL_KEYS = ("PALLAS_AXON_POOL_IPS",)

_ENV_LOCK = threading.Lock()


def spawn_pool(jobs: int) -> "mp.pool.Pool":
    """A spawn-context Pool whose workers see a CPU-only environment."""
    with _ENV_LOCK:
        saved = {k: os.environ.pop(k, None) for k in _ACCEL_KEYS}
        prev_plat = os.environ.get("JAX_PLATFORMS")
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            return mp.get_context("spawn").Pool(jobs)
        finally:
            for k, v in saved.items():
                if v is not None:
                    os.environ[k] = v
            if prev_plat is None:
                os.environ.pop("JAX_PLATFORMS", None)
            else:
                os.environ["JAX_PLATFORMS"] = prev_plat
