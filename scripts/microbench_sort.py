"""A/B/C: lax.sort vs pure-JAX bitonic vs Pallas VMEM bitonic on the chip.

Shapes mirror the collate voting sort: N = CAPG = expand_budget * CHUNK =
65536 two-word uint32 keys. Per the axon rules each variant runs as a
lax.scan over NCH fresh key sets inside ONE dispatch (amortizes tunnel RTT)
and every rep feeds fresh buffers (server memoizes identical executions).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from rapmap_tpu.utils.jaxenv import setup as _jax_setup  # noqa: E402

_jax_setup()

N = 1 << 16
NCH = 16
REPS = 3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rapmap_tpu.ops.pallas.sort2 import (
        bitonic_sort_pairs,
        bitonic_sort_pairs_pallas,
    )

    rng = np.random.default_rng(0)

    def feed(rep):
        x = rng.integers(0, 2**32, (2, NCH, N), dtype=np.uint32)
        return jnp.asarray(x)

    def chunked(sort2):
        def run(x):  # (2, NCH, N)
            def body(acc, hl):
                h, l = sort2(hl[0], hl[1])
                return acc + h[0] + h[-1] + l[N // 2], 0

            acc, _ = lax.scan(body, jnp.uint32(0), jnp.moveaxis(x, 1, 0))
            return acc

        return jax.jit(run)

    def timeit(name, jfn):
        t0 = time.time()
        r0 = np.asarray(jfn(feed(0)))
        print(f"# {name}: compile+first {time.time()-t0:.1f}s chk={int(r0)}",
              file=sys.stderr, flush=True)
        best = []
        for rep in range(REPS):
            x = feed(rep + 1)
            x.block_until_ready()
            t0 = time.time()
            np.asarray(jfn(x))
            best.append(time.time() - t0)
        dt = min(best) / NCH
        print(f"{name:16s} {dt*1e3:8.3f} ms/sort of {N} 2-word keys", flush=True)
        return dt

    timeit("lax.sort", chunked(
        lambda h, l: tuple(lax.sort([h, l], dimension=0, num_keys=2))
    ))
    timeit("jax_bitonic", chunked(bitonic_sort_pairs))
    timeit("pallas_bitonic", chunked(bitonic_sort_pairs_pallas))


if __name__ == "__main__":
    main()
