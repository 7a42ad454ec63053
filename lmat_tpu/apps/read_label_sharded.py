"""Multi-chip fast mode: DB-sharded probe + data-parallel scorer in one jit.

The single-chip fast path (apps/read_label_fast.py) assumes the whole k-mer
table fits one device's HBM.  Here the table is sharded by prefix bucket over
the mesh's "db" axis (parallel/router.py) and reads are data-parallel over
("data", "db"); each step:

  [B, L] reads (sharded over the batch axis)
    -> encode/canonical k-mers (auto-partitioned, batch-parallel)
    -> all_to_all query routing + shard-local probe (shard_map)
    -> device scorer (batch-parallel; taxonomy arrays replicated)

This is the capability the reference lacks: its 460 GB DB must fit one
node's RAM (SURVEY.md §2.3), while this spans the table across a pod slice.

Outputs are identical to the single-chip FastClassifier step; the host
formatting/tally machinery is reused unchanged.
"""

from __future__ import annotations

import numpy as np

from ..parallel.router import ShardedIndex, make_sharded_lookup
from .read_label_fast import FastClassifier


def _shard_layout(layout: str) -> str:
    """Map a CLI --layout value onto the shard layouts the router supports.
    "auto" = the minimum-memory windowed layout; "fused" has no sharded
    form (its bucket rows are not uniform across shards) and is rejected
    rather than silently substituted."""
    if layout in (None, "", "auto"):
        return "window"
    if layout not in ("window", "paged"):
        raise ValueError(
            f"--layout {layout!r} is not available with a sharded mesh "
            "(choose auto, window, or paged)"
        )
    return layout


class ShardedFastClassifier(FastClassifier):
    """FastClassifier whose probe routes through a mesh-sharded index.

    mesh: jax.sharding.Mesh with ("data", "db") axes; the batch axis of every
    step input must be divisible by mesh.size.
    """

    def __init__(self, mesh, sidx: ShardedIndex, scorer, k: int = 20,
                 min_score: float = 0.0, batch: int = 512,
                 read_len: int = 256, cap: int | None = None):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.k = k
        self.scorer = scorer
        self.min_score = min_score
        self.mesh = mesh
        self.batch = batch
        self.sidx = sidx
        n_dev = mesh.size
        assert batch % n_dev == 0, "batch must divide the mesh size"

        P_pos = read_len - k + 1
        self._q_per_dev = batch * P_pos // n_dev
        self._data_sharding = NamedSharding(mesh, P(("data", "db")))
        self._idx16 = self._init_node_tab(scorer)
        self._read_len = read_len
        import threading

        self._runs = {}
        self._cap = cap if cap is not None else self._q_per_dev
        # classify_stream_native runs _resolve_router on up to FETCH_DEPTH
        # worker threads; the cap ratchet / jit-cache / step swap below must
        # not interleave
        self._router_lock = threading.Lock()
        self.step = self._build_run(self._cap)
        self.fallback = None
        self.track_count = {}
        self.track_score = {}
        self.track_nomatch = {}

    def _build_run(self, cap):
        """Jit the full sharded step for one router cap (cached per cap so
        the doubled-cap overflow retry compiles at most log2 extra shapes)."""
        if cap in self._runs:
            return self._runs[cap]
        import jax
        import jax.numpy as jnp

        from .read_label_device import prepare_reads

        k, scorer, idx16 = self.k, self.scorer, self._idx16
        if not hasattr(self, "_tables"):
            from ..parallel.router import place_tables

            # placed once, shared by every cap's program; passed as jit
            # ARGUMENTS so multi-GB shard tables are never embedded into
            # the traced program (see router.place_tables)
            self._tables = place_tables(self.mesh, self.sidx)
        lookup = make_sharded_lookup(self.mesh, self.sidx,
                                     q_per_device=self._q_per_dev, cap=cap,
                                     tables=self._tables)

        def step(tables, batch_arr, gc_bins):
            # nibble-packed input (see read_label_fast): halves the
            # host->device upload, which crosses DCN on multi-host meshes
            prep = prepare_reads(batch_arr, k, packed=True)
            B, Pp = prep["hi"].shape
            found, ng, tids, tmask, overflow = lookup.sharded_fn(
                *tables,
                prep["hi"].reshape(-1), prep["lo"].reshape(-1),
                prep["qvalid"].reshape(-1),
            )
            pr = {
                "found": found.reshape(B, Pp),
                "ng": ng.reshape(B, Pp),
                "tids": tids.reshape(B, Pp, -1),
                "tmask": tmask.reshape(B, Pp, -1),
                **prep,
            }
            # host-computed GC bins (IEEE f32 division; see host_gc_bins)
            pr["bin_sel"] = gc_bins
            out = scorer.score_batch(pr)
            ints = jnp.stack(
                [out["call_tid"], out["match"], out["n_cand"],
                 out["cand_kmer_cnt"], out["cnt_fnd"], out["valid_kmers"],
                 out["fnd_phix"].astype(jnp.int32)],
                axis=1,
            )
            flts = jnp.stack(
                [out["call_score"], out["log_avg"], out["stdev"],
                 out["top_score"], out["phix_score"]],
                axis=1,
            )
            cs = out["cand_sorted"]
            cs = cs.astype(jnp.uint16) if idx16 else cs
            # per-read candidate overflow + scalar router-capacity overflow
            # (the latter triggers a doubled-cap re-run on the host)
            return ints, flts, cs, out["score_sorted"], out["overflow"], overflow

        from jax.sharding import NamedSharding, PartitionSpec as P

        # explicit out shardings: per-read rows over ("data","db") so every
        # process can fetch exactly its own rows; router overflow replicated
        rows = NamedSharding(self.mesh, P(("data", "db")))
        repl = NamedSharding(self.mesh, P())
        jitted = jax.jit(step, out_shardings=(rows, rows, rows, rows, rows, repl))

        def run(batch_np, gcb=None):
            return jitted(self._tables, *self._stage_batch(batch_np, gcb))

        self._runs[cap] = run
        return run

    def _stage_batch(self, batch_np, gcb=None):
        """Host -> global device arrays; the multi-host subclass stages
        process-local rows instead.  gcb = precomputed host GC bins (the
        pipelined _stream preps them on a producer thread)."""
        import jax

        from ..core.encoding import host_gc_bins, pack_nibbles

        batch_np = np.asarray(batch_np)
        if gcb is None:
            gcb = host_gc_bins(batch_np, self.k)
        arr = jax.device_put(pack_nibbles(batch_np), self._data_sharding)
        bins = jax.device_put(gcb, self._data_sharding)
        return arr, bins

    def _resolve_router(self, reads, vals):
        """Router-capacity overflow degrade path: re-run the batch with a
        doubled cap (up to the q_per_device safe bound, at which overflow is
        impossible) instead of aborting."""
        cap_used = None  # cap of OUR last retry (None = not retried yet)
        while int(vals[5]) > 0:
            with self._router_lock:
                # serialized: concurrent worker threads must not interleave
                # the cap ratchet (double-doubling), the _runs jit cache, or
                # the step swap.  The dispatch-time cap of `vals` is
                # unknown (another thread may have raised self._cap since),
                # so the first iteration retries at the CURRENT cap; only a
                # retry that overflowed at self._cap itself doubles — this
                # also keeps the safe-cap assert from firing when another
                # thread already raised the cap to the safe bound.
                if cap_used == self._cap:
                    assert self._cap < self._q_per_dev, (
                        "router overflow at safe cap"
                    )
                    self._cap = min(self._cap * 2, self._q_per_dev)
                cap_used = self._cap
                run = self._build_run(cap_used)
                # the ratchet is permanent: later batches dispatch straight
                # at the raised cap instead of overflowing once per batch
                self.step = run
            vals = self._fetch(run(self.pad(reads)))
        return vals

    def pad(self, reads, pad_to=None, fixed_rows=None):
        return super().pad(reads, pad_to=self._read_len,
                           fixed_rows=fixed_rows or self.batch)


def make_sharded_classifier(mesh, index, taxonomy, cfg, null_model=None,
                            k: int = 20, min_score: float = 0.0,
                            batch: int = 512, read_len: int = 256,
                            cap: int | None = None, layout: str = "auto"):
    """Build (scorer, ShardedFastClassifier) from a host KmerIndex: the
    index arena is remapped to node indices + flag bits, then sharded by
    prefix bucket over the mesh's db axis.

    layout: shard probe layout — "window" (minimum memory), "paged"
    (capacity-scale speed tier), or "auto" (= window, the safe default for
    arbitrary shard geometries)."""
    from .read_label_score_device import DeviceScorer

    n_db = mesh.shape["db"]
    scorer = DeviceScorer(taxonomy, cfg, null_model=null_model)
    remapped = scorer.remap_index_tids(index)
    sidx = ShardedIndex.from_index(remapped, n_db, layout=_shard_layout(layout))
    clf = ShardedFastClassifier(mesh, sidx, scorer, k=k, min_score=min_score,
                                batch=batch, read_len=read_len, cap=cap)
    return scorer, clf
