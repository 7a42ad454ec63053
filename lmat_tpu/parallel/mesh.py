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


def _n_local_tpu_chips() -> int:
    """Count real TPU chips on this host WITHOUT initializing JAX (the
    platform choice freezes at the first backend query).  TPU VMs expose
    chips as /dev/accel* (PCI driver) or /dev/vfio/<N> (vfio driver)."""
    import glob

    return max(
        len(glob.glob("/dev/accel*")),
        len(glob.glob("/dev/vfio/[0-9]*")),
    )


def make_mesh(data: int = 1, db: int = 1, devices=None):
    import os

    import jax
    from jax.sharding import Mesh

    if devices is None:
        if (
            data * db > 1
            and "--xla_force_host_platform_device_count"
            in os.environ.get("XLA_FLAGS", "")
            and _n_local_tpu_chips() < data * db
        ):
            # A virtual CPU mesh was requested (the force-device-count flag is
            # set and this host does not have enough real TPU chips to
            # satisfy the mesh — tunneled single-chip setups included).  Pin
            # cpu BEFORE the first backend query — the platform choice freezes
            # at the first jax.devices() call, even with an explicit backend
            # argument, so the decision must be made without touching JAX.
            # On a real multi-chip TPU host where XLA_FLAGS carries the flag
            # for unrelated reasons, the chip count keeps the TPUs in charge.
            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass
        devices = jax.devices()
    n = data * db
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(data, db)
    return Mesh(arr, ("data", "db"))
