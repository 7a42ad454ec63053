"""Pallas TPU probe kernel — pipelined bucket search.

The XLA probe resolves each query with ~search_depth (up to 13+) dependent
4-byte HBM gathers (the binary search).  This kernel instead:

  * keeps the whole bucket table (2^20 x i32, 4 MB) resident in VMEM;
  * DMAs each query's *entire* suffix bucket into VMEM scratch — one
    contiguous transfer instead of a pointer chase — with a PIPE-deep
    in-flight window to hide DMA latency;
  * resolves the membership test as a single vectorized compare over the
    bucket (the per-bucket suffixes are <= MAX_BUCKET).

Output is (found, pos) per query, pos being the global k-mer slot; the
taxid-arena gathers (a handful per *hit*) stay in XLA.

Falls back to interpret mode off-TPU (tests) via interpret=True.
"""

from __future__ import annotations

import functools

import numpy as np


def make_pallas_probe(bucket_start, suffix, max_bucket: int, q_tile: int = 512,
                      pipe: int = 8, interpret: bool = False):
    """Returns fn(hi, lo, valid) -> (found, pos) for flat query arrays.

    bucket_start: i32 [n_buckets+1] (device array, fits VMEM)
    suffix: u32 [n_kmers] (HBM)
    max_bucket: max suffixes per bucket (power-of-two padded internally)
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    MB = max(128, 1 << int(np.ceil(np.log2(max(max_bucket, 1)))))
    n_kmers = suffix.shape[0]
    # pad the suffix table so over-fetching the fixed MB window is safe
    suffix_padded = jnp.concatenate(
        [suffix, jnp.full((MB,), 0xFFFFFFFF, jnp.uint32)]
    )

    def kernel(bucket_ref, hi_ref, lo_ref, valid_ref, suffix_hbm,
               found_ref, pos_ref, buf, sems):
        def issue(q, slot):
            b = hi_ref[q]
            start = bucket_ref[b]
            pltpu.make_async_copy(
                suffix_hbm.at[pl.ds(start, MB)],
                buf.at[slot],
                sems.at[slot],
            ).start()

        def process(q, slot):
            b = hi_ref[q]
            start = bucket_ref[b]
            end = bucket_ref[b + 1]
            n = end - start
            pltpu.make_async_copy(
                suffix_hbm.at[pl.ds(start, MB)], buf.at[slot], sems.at[slot]
            ).wait()
            lo = lo_ref[q]
            data = buf[slot]
            idx = jax.lax.broadcasted_iota(jnp.int32, (MB,), 0)
            inside = idx < n
            hit = inside & (data == lo)
            anyhit = jnp.any(hit)
            first = jnp.argmax(hit)
            found_ref[q] = (anyhit & (valid_ref[q] != 0)).astype(jnp.int32)
            pos_ref[q] = start + first.astype(jnp.int32)

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

        jax.lax.fori_loop(0, q_tile + pipe, body, 0)

    n_buckets_p1 = bucket_start.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # bucket table
            pl.BlockSpec(memory_space=pltpu.SMEM),    # hi
            pl.BlockSpec(memory_space=pltpu.SMEM),    # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),    # valid
            pl.BlockSpec(memory_space=pltpu.ANY),     # suffix (HBM)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((pipe, MB), jnp.uint32),
            pltpu.SemaphoreType.DMA((pipe,)),
        ],
    )

    probe_tile = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_tile,), jnp.int32),
            jax.ShapeDtypeStruct((q_tile,), jnp.int32),
        ],
        interpret=interpret,
    )

    def fn(hi, lo, valid):
        Q = hi.shape[0]
        pad = (-Q) % q_tile
        hi_p = jnp.concatenate([hi.astype(jnp.int32), jnp.zeros(pad, jnp.int32)])
        lo_p = jnp.concatenate([lo.astype(jnp.uint32), jnp.zeros(pad, jnp.uint32)])
        va_p = jnp.concatenate(
            [valid.astype(jnp.int32), jnp.zeros(pad, jnp.int32)]
        )
        tiles = (Q + pad) // q_tile
        found = []
        pos = []
        for t in range(tiles):
            sl = slice(t * q_tile, (t + 1) * q_tile)
            f, p = probe_tile(
                bucket_start.astype(jnp.int32), hi_p[sl], lo_p[sl], va_p[sl],
                suffix_padded,
            )
            found.append(f)
            pos.append(p)
        found = jnp.concatenate(found)[:Q]
        pos = jnp.concatenate(pos)[:Q]
        return found.astype(bool), pos

    return fn
