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
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    n = data * db
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(data, db)
    return Mesh(arr, ("data", "db"))
