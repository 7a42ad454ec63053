#!/usr/bin/env python3
"""Round-3 profiling, take 9: micro-benchmarks behind two fast-path choices.

1. split-gather: one [Q] row gather vs G independent [Q/G] gathers over the
   same fused table (core/index.py probe_fused issues G=4) — the gather
   engine overlaps independent gathers ~1.5x.
2. permute: take_along_axis vs the one-hot where+sum select
   (read_label_score_device.DeviceScorer._permute) for applying a [B, C]
   sort order to several [B, C] fields.

Both loop inside one jit (lax.scan) and reduce over every output so RPC
latency amortizes and XLA cannot DCE the work (NOTES.md methodology).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=3, warm=1):
    for _ in range(warm):
        fn()
    t0 = time.time()
    for _ in range(n):
        fn()
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ITER = 32
    rng = np.random.default_rng(0)

    # ---- 1. split-gather -------------------------------------------------
    NB, WID = 1 << 20, 40  # fused-table shape at bench scale (R=8, MT=8 -> 80)
    Q = 2048 * 181
    table = jax.device_put(rng.integers(0, 2**32, (NB, WID), np.uint32))
    idx = jax.device_put(rng.integers(0, NB, (Q,), np.int32))

    def gather_g(G):
        @jax.jit
        def f(table, idx):
            def body(c, i):
                ix = (idx + i) % NB
                if G == 1:
                    row = jnp.take(table, ix, axis=0, mode="clip")
                else:
                    parts = [
                        jnp.take(table, g, axis=0, mode="clip")
                        for g in ix.reshape(G, Q // G)
                    ]
                    row = jnp.concatenate(parts, axis=0)
                return c + jnp.sum(row, dtype=jnp.uint32), 0

            c, _ = lax.scan(body, jnp.uint32(0), jnp.arange(ITER))
            return c

        return lambda: jax.block_until_ready(f(table, idx))

    res = {}
    for G in (1, 2, 4, 8):
        t = timeit(gather_g(G)) / ITER
        res[f"gather_G{G}_ms"] = round(t * 1e3, 3)
        res[f"gather_G{G}_Mrows_s"] = round(Q / t / 1e6, 1)

    # ---- 2. permute: take_along_axis vs one-hot select --------------------
    B, C, NF = 2048, 32, 7
    order = jax.device_put(
        np.argsort(rng.random((B, C)), axis=1).astype(np.int32)
    )
    fields = jax.device_put(rng.integers(0, 2**31, (NF, B, C), np.int32))

    @jax.jit
    def f_tala(order, fields):
        def body(c, i):
            o = (order + i) % C
            out = [jnp.take_along_axis(fields[j], o, axis=1) for j in range(NF)]
            return c + sum(jnp.sum(x, dtype=jnp.int32) for x in out), 0

        c, _ = lax.scan(body, jnp.int32(0), jnp.arange(ITER))
        return c

    @jax.jit
    def f_onehot(order, fields):
        def body(c, i):
            o = (order + i) % C
            oh = o[:, :, None] == jnp.arange(C, dtype=jnp.int32)[None, None, :]
            out = [
                jnp.sum(jnp.where(oh, fields[j][:, None, :], 0), axis=2)
                for j in range(NF)
            ]
            return c + sum(jnp.sum(x, dtype=jnp.int32) for x in out), 0

        c, _ = lax.scan(body, jnp.int32(0), jnp.arange(ITER))
        return c

    assert int(f_tala(order, fields)) == int(f_onehot(order, fields))
    res["permute_tala_ms"] = round(
        timeit(lambda: jax.block_until_ready(f_tala(order, fields))) / ITER * 1e3, 3
    )
    res["permute_onehot_ms"] = round(
        timeit(lambda: jax.block_until_ready(f_onehot(order, fields))) / ITER * 1e3, 3
    )

    print(json.dumps(res))


if __name__ == "__main__":
    main()
