"""A/B: current uint8-based wire input unpack vs an int32-word variant.

The fine profile charges ~0.46 us/read to unpack+wire mechanics; TPUs
emulate narrow-int vector ops, so the (B, nb2) uint8 nibble expansion is the
prime suspect. Variant B bitcasts the packed bytes to int32 words and does
all shifts in the int32 domain.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from rapmap_tpu.utils.jaxenv import setup as _jax_setup  # noqa: E402

_jax_setup()

C, L = 8192, 76
NCH = 16
REPS = 3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rapmap_tpu.ops.wire import _in_sizes, pack_in_se

    rng = np.random.default_rng(0)
    B = NCH * C

    def feed(rep):
        codes = rng.integers(1, 5, (B, L)).astype(np.int8)
        lens = np.full(B, L, np.int32)
        return jnp.asarray(pack_in_se(codes, lens, B))

    nb2, nbm = _in_sizes(L)

    def unpack_u8(wire):
        b2 = wire[: B * nb2].reshape(B, nb2)
        bm = wire[B * nb2 : B * (nb2 + nbm)].reshape(B, nbm)
        nibs = jnp.stack(
            [(b2 >> np.uint8(2 * j)) & np.uint8(3) for j in range(4)], axis=-1
        ).reshape(B, nb2 * 4)[:, :L]
        bits = jnp.stack(
            [(bm >> np.uint8(j)) & np.uint8(1) for j in range(8)], axis=-1
        ).reshape(B, nbm * 8)[:, :L]
        codes = nibs.astype(jnp.int8) + np.int8(1)
        return jnp.where(bits != 0, np.int8(5), codes)

    nw2 = -(-nb2 // 4)
    nwm = -(-nbm // 4)

    def unpack_i32(wire):
        # word-aligned variant: pad rows to 4-byte multiples on the host and
        # extract 16 bases per int32 word
        b2 = wire[: B * nb2].reshape(B, nb2)
        bm = wire[B * nb2 : B * (nb2 + nbm)].reshape(B, nbm)
        pad2 = jnp.zeros((B, nw2 * 4 - nb2), jnp.uint8)
        padm = jnp.zeros((B, nwm * 4 - nbm), jnp.uint8)
        w2 = lax.bitcast_convert_type(
            jnp.concatenate([b2, pad2], axis=1).reshape(B, nw2, 4), jnp.int32
        )  # (B, nw2)
        wm = lax.bitcast_convert_type(
            jnp.concatenate([bm, padm], axis=1).reshape(B, nwm, 4), jnp.int32
        )
        nibs = jnp.stack(
            [(w2 >> np.int32(2 * j)) & np.int32(3) for j in range(16)], axis=-1
        ).reshape(B, nw2 * 16)[:, :L]
        bits = jnp.stack(
            [(wm >> np.int32(j)) & np.int32(1) for j in range(32)], axis=-1
        ).reshape(B, nwm * 32)[:, :L]
        codes = (nibs + 1).astype(jnp.int8)
        return jnp.where(bits != 0, np.int8(5), codes)

    def mk(fn):
        def run(w):
            c = fn(w)
            return jnp.sum(c.astype(jnp.int32))

        return jax.jit(run)

    def timeit(name, jfn):
        xs = []
        for rep in range(REPS + 1):
            x = feed(rep)
            x.block_until_ready()
            xs.append(x)
        t0 = time.time()
        r0 = np.asarray(jfn(xs[0]))
        print(f"# {name}: compile+first {time.time()-t0:.1f}s chk={int(r0)}",
              file=sys.stderr, flush=True)
        best = []
        for x in xs[1:]:
            t0 = time.time()
            np.asarray(jfn(x))
            best.append(time.time() - t0)
        dt = min(best)
        print(f"{name:12s} {dt*1e3:8.1f} ms/{B} reads  {dt/B*1e6:6.3f} us/read",
              flush=True)

    timeit("unpack_u8", mk(unpack_u8))
    timeit("unpack_i32", mk(unpack_i32))


if __name__ == "__main__":
    main()
