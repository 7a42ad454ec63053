"""Mesh construction for the two parallel axes of the framework.

The reference is a single-node OpenMP program (SURVEY.md §2.3); the TPU-native
design introduces two first-class axes it lacks:

  "data" — reads are data-parallel across chips (the OpenMP read queue analog)
  "db"   — the k-mer table is sharded across chips' HBM by prefix-bucket
           range (the capability the reference lacks: its 460 GB DB must fit
           one node's RAM; here it spans the pod slice)

Queries route between the axes with all_to_all (parallel/router.py).
"""

from __future__ import annotations

import numpy as np


def make_mesh(data: int = 1, db: int = 1, devices=None):
    import os

    import jax
    from jax.sharding import Mesh

    if devices is None:
        if (
            data * db > 1
            and "--xla_force_host_platform_device_count"
            in os.environ.get("XLA_FLAGS", "")
        ):
            # a virtual CPU mesh was requested: pin the platform BEFORE the
            # first backend query (some environments force-prepend a
            # single-chip TPU plugin that would otherwise win)
            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass
        devices = jax.devices()
    n = data * db
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(data, db)
    return Mesh(arr, ("data", "db"))
