"""Multi-host execution: jax.distributed + per-host input/output sharding.

The reference is single-node (OpenMP + a whole-DB mmap per node,
SURVEY.md §2.3); spanning hosts is a headline capability of this framework.
Design:

  * ``jax.distributed.initialize`` joins the processes into one runtime; the
    global mesh is laid out process-major on the "data" axis so reads stay
    data-parallel across hosts while the k-mer table's "db" axis stays inside
    a host (collectives over ICI, not DCN, whenever db <= local device count).
  * Each process feeds its own contiguous row-block of every global batch
    (``jax.make_array_from_process_local_data``) from its own slice of the
    input file — the per-host analog of the reference's GNU-parallel
    byte-range splitting (read_label.cpp:1282-1305).
  * Each process fetches only its addressable output rows and writes its own
    ``.out`` + fastsummary files (the reference's per-thread files, one level
    up); ``lmat-tpu report merge-fastsummary`` combines the summaries.

On TPU pods the same code runs over ICI+DCN; correctness is CI-tested with
2 processes x 4 virtual CPU devices (tests/test_multihost.py).
"""

from __future__ import annotations

import numpy as np


def init_distributed(coordinator: str, num_processes: int, process_id: int,
                     local_device_count: int | None = None):
    """Join this process into a jax.distributed runtime.

    On CPU (tests / dev) set XLA_FLAGS=--xla_force_host_platform_device_count
    per process before calling; on TPU hosts the device count is discovered.
    """
    import jax

    kwargs = {}
    if local_device_count is not None:
        kwargs["local_device_ids"] = list(range(local_device_count))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(data: int, db: int):
    """Build a ("data", "db") mesh over ALL processes' devices, process-major
    on the data axis: the db-axis all_to_all stays within a host whenever
    db divides the local device count (ICI-only routing; DCN only carries the
    batch boundaries, which need no communication at all)."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = len(devs)
    assert data * db == n, f"mesh {data}x{db} != {n} global devices"
    n_local = len(jax.local_devices())
    if db > n_local:
        import sys

        print(
            f"warning: db axis ({db}) spans hosts ({n_local} local devices): "
            "k-mer routing will cross DCN",
            file=sys.stderr,
        )
    # jax.devices() orders by process; reshaping keeps each process's devices
    # contiguous, i.e. whole rows of the [data, db] grid per process
    grid = np.array(devs).reshape(data, db)
    return Mesh(grid, ("data", "db"))


def local_batch_rows(mesh, batch: int, process_id: int | None = None):
    """(row_start, row_count) of the global batch this process feeds.

    Rows are sharded over ("data","db") device-major; with the process-major
    mesh layout each process owns one contiguous block.
    """
    import jax

    n_proc = jax.process_count()
    pid = jax.process_index() if process_id is None else process_id
    assert batch % n_proc == 0, "global batch must divide the process count"
    per = batch // n_proc
    return pid * per, per


class MultiHostFastClassifier:
    """ShardedFastClassifier on a multi-process mesh.

    The jitted step is unchanged — global arrays in, global arrays out; only
    the host-side staging (process-local rows in) and fetching (process-local
    rows out) differ.  Built lazily as a subclass to keep the import graph
    jax-free until used.
    """

    def __new__(cls, *args, **kwargs):
        from ..apps.read_label_sharded import ShardedFastClassifier

        class _Impl(ShardedFastClassifier):
            is_multihost = True

            def __init__(self, *a, **kw):
                import jax

                self._n_proc = jax.process_count()
                self._pid = jax.process_index()
                super().__init__(*a, **kw)
                assert self.batch % self._n_proc == 0
                self.local_rows = self.batch // self._n_proc

            def pad(self, reads, pad_to=None, fixed_rows=None):
                # each process pads only its own row block of the global batch
                from ..apps.read_label_fast import FastClassifier

                return FastClassifier.pad(
                    self, reads, pad_to=self._read_len,
                    fixed_rows=fixed_rows or self.local_rows,
                )

            def _stage_batch(self, batch_np, gcb=None):
                import jax

                from ..core.encoding import host_gc_bins, pack_nibbles

                batch_np = np.asarray(batch_np)
                bins = gcb if gcb is not None else host_gc_bins(
                    batch_np, self.k
                )
                B = self.batch
                packed = pack_nibbles(batch_np)
                arr = jax.make_array_from_process_local_data(
                    self._data_sharding, np.ascontiguousarray(packed),
                    (B,) + tuple(packed.shape[1:]),
                )
                gb = jax.make_array_from_process_local_data(
                    self._data_sharding, np.ascontiguousarray(bins), (B,)
                )
                return arr, gb

            def _fetch(self, dev_out):
                """Pull only this process's addressable rows of each output.

                Idempotent: values already fetched (numpy) pass through, so
                the format path can re-call it safely.
                """
                import jax

                out = []
                for a in dev_out:
                    if isinstance(a, np.ndarray) or not hasattr(
                        a, "addressable_shards"
                    ):
                        out.append(np.asarray(a))
                        continue
                    if a.is_fully_addressable:
                        out.append(np.asarray(jax.device_get(a)))
                        continue
                    shards = a.addressable_shards
                    if a.ndim == 0:
                        out.append(np.asarray(shards[0].data))
                        continue
                    rows = {}
                    for s in shards:
                        rows.setdefault(s.index[0].start or 0, s.data)
                    out.append(
                        np.concatenate(
                            [np.asarray(rows[k]) for k in sorted(rows)], axis=0
                        )
                    )
                return tuple(out)

        obj = object.__new__(_Impl)
        obj.__init__(*args, **kwargs)
        return obj


def make_multihost_classifier(mesh, index, taxonomy, cfg, null_model=None,
                              k: int = 20, min_score: float = 0.0,
                              batch: int = 512, read_len: int = 256,
                              cap: int | None = None, layout: str = "auto"):
    """Build a MultiHostFastClassifier from a host KmerIndex (each process
    holds the full host index and shards it identically — deterministic, no
    build-time communication)."""
    from ..apps.read_label_score_device import DeviceScorer
    from ..apps.read_label_sharded import _shard_layout
    from ..parallel.router import ShardedIndex

    n_db = mesh.shape["db"]
    scorer = DeviceScorer(taxonomy, cfg, null_model=null_model)
    remapped = scorer.remap_index_tids(index)
    sidx = ShardedIndex.from_index(remapped, n_db, layout=_shard_layout(layout))
    clf = MultiHostFastClassifier(mesh, sidx, scorer, k=k, min_score=min_score,
                                  batch=batch, read_len=read_len, cap=cap)
    return scorer, clf
