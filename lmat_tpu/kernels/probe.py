"""Pallas TPU probe kernel — pipelined bucket search.

The XLA probe resolves each query with ~search_depth (up to 13+) dependent
4-byte HBM gathers (the binary search).  This kernel instead DMAs each
query's *entire* suffix bucket into VMEM scratch — one contiguous transfer
per query instead of a pointer chase — with a PIPE-deep in-flight window to
hide DMA latency, and resolves membership as a single vectorized compare.

The two bucket-table reads per query stay in XLA (a cheap batched gather);
the kernel receives (start, len, lo, valid) per query through SMEM tiles.
Output is (found, pos) per query, pos being the global k-mer slot; the
taxid-arena gathers (a handful per hit) also stay in XLA.

Falls back to interpret mode off-TPU (tests) via interpret=True.

Measured on a v5e (4M-kmer table, 131k queries): this kernel sustains ~3.0M
lookups/s vs ~11.2M for the XLA gather chain — the scalar core's sequential
DMA issue rate dominates at small bucket sizes (max_bucket 16 -> one ~8KB
window per query).  The XLA probe therefore remains the default
(core/index.py); this kernel is the right shape when buckets are large
(IDX geometries with few buckets, where the binary search would need ~17
dependent gathers but the window DMA streams at full bandwidth).
"""

from __future__ import annotations

import numpy as np


def make_pallas_probe(bucket_start, suffix, max_bucket: int, q_tile: int = 1024,
                      pipe: int = 8, interpret: bool = False):
    """Returns fn(hi, lo, valid) -> (found, pos) for flat query arrays."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # TPU i32 tiles are (8, 128): store the suffix table as [rows, 128] and
    # DMA an 8-row-aligned window of whole tiles covering each bucket's span
    LANE = 128
    SUB = 8
    span_rows = SUB + int(np.ceil((max_bucket + LANE - 1) / LANE)) + 1
    ROWS = ((span_rows + SUB - 1) // SUB) * SUB
    n = suffix.shape[0]
    n_rows = ((n + LANE - 1) // LANE + ROWS + SUB - 1) // SUB * SUB
    suffix_2d = jnp.zeros((n_rows, LANE), jnp.uint32).at[: (n + LANE - 1) // LANE].set(
        jnp.concatenate(
            [suffix, jnp.full(((-n) % LANE,), 0xFFFFFFFF, jnp.uint32)]
        ).reshape(-1, LANE),
        mode="drop",
    )
    MB = ROWS * LANE

    def kernel(start_ref, n_ref, lo_ref, valid_ref, suffix_hbm,
               found_ref, pos_ref, buf, sems):
        def issue(q, slot):
            row = (start_ref[q] // (LANE * SUB)) * SUB
            pltpu.make_async_copy(
                suffix_hbm.at[pl.ds(row, ROWS)],
                buf.at[slot],
                sems.at[slot],
            ).start()

        def process(q, slot):
            row = (start_ref[q] // (LANE * SUB)) * SUB
            off = start_ref[q] - row * LANE
            pltpu.make_async_copy(
                suffix_hbm.at[pl.ds(row, ROWS)], buf.at[slot], sems.at[slot]
            ).wait()
            lo = lo_ref[q]
            n = n_ref[q]
            data = buf[slot].reshape(MB)
            idx = jax.lax.broadcasted_iota(jnp.int32, (MB,), 0)
            hit = (idx >= off) & (idx < off + n) & (data == lo)
            # integer min instead of argmax (Mosaic argmax is f32-only)
            first = jnp.min(jnp.where(hit, idx, MB))
            anyhit = first < MB
            found_ref[q] = (anyhit & (valid_ref[q] != 0)).astype(jnp.int32)
            pos_ref[q] = start_ref[q] + jnp.where(anyhit, first - off, 0)

        def body(q, _):
            slot = jax.lax.rem(q, pipe)

            # drain the slot before its buffer is overwritten by the next DMA
            @pl.when(q >= pipe)
            def _():
                process(q - pipe, slot)

            @pl.when(q < q_tile)
            def _():
                issue(q, slot)
            return 0

        jax.lax.fori_loop(0, q_tile + pipe, body, 0, unroll=False)

    def make_call(tiles: int):
        smem_block = lambda: pl.BlockSpec(
            (q_tile,), lambda i: (i,), memory_space=pltpu.SMEM
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(tiles,),
            in_specs=[
                smem_block(),                          # start
                smem_block(),                          # n
                smem_block(),                          # lo
                smem_block(),                          # valid
                pl.BlockSpec(memory_space=pltpu.ANY),  # suffix (HBM)
            ],
            out_specs=[smem_block(), smem_block()],
            scratch_shapes=[
                pltpu.VMEM((pipe, ROWS, LANE), jnp.uint32),
                pltpu.SemaphoreType.DMA((pipe,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((tiles * q_tile,), jnp.int32),
                jax.ShapeDtypeStruct((tiles * q_tile,), jnp.int32),
            ],
            interpret=interpret,
        )

    bs32 = bucket_start.astype(jnp.int32)

    def fn(hi, lo, valid):
        Q = hi.shape[0]
        pad = (-Q) % q_tile
        hi_p = jnp.concatenate([hi.astype(jnp.int32), jnp.zeros(pad, jnp.int32)])
        lo_p = jnp.concatenate([lo.astype(jnp.uint32), jnp.zeros(pad, jnp.uint32)])
        va_p = jnp.concatenate(
            [valid.astype(jnp.int32), jnp.zeros(pad, jnp.int32)]
        )
        start = jnp.take(bs32, hi_p, mode="clip")
        end = jnp.take(bs32, hi_p + 1, mode="clip")
        n = end - start
        tiles = (Q + pad) // q_tile
        f, p = make_call(tiles)(start, n, lo_p, va_p, suffix_2d)
        return f[:Q].astype(bool), p[:Q]

    return fn
