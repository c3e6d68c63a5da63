"""Isolate the per-pallas_call overhead on this platform.

Times (inside one scanned dispatch) trivial kernels with increasing
feature sets: bare VMEM in/out, +grid, +ANY memory space with manual DMA,
+input_output_aliases, +scalar prefetch, +semaphores; plus a pure-XLA
body for reference.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/spatten_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 64


def scan_time(fn, carry, donate=True, n=N):
    kw = dict(donate_argnums=(0,)) if donate else {}
    carry = jax.tree.map(lambda x: jnp.array(x), carry)   # fresh buffers

    @functools.partial(jax.jit, static_argnums=(1,), **kw)
    def loop(carry, n):
        return jax.lax.scan(lambda c, _: (fn(c), ()), carry, None,
                            length=n)[0]

    carry = loop(carry, n)
    jax.device_get(jax.tree.leaves(carry)[-1])
    t0 = time.perf_counter()
    carry = loop(carry, n)
    jax.device_get(jax.tree.leaves(carry)[-1])
    return (time.perf_counter() - t0) / n


def report(name, dt):
    print(f"{name:44s}: {dt * 1e6:8.1f} us/iter", flush=True)


def main():
    x0 = jnp.ones((8, 128), jnp.float32)

    # pure XLA body
    report("xla add N=64", scan_time(lambda c: c + 1.0, x0))
    report("xla add N=512", scan_time(lambda c: c + 1.0, x0, n=512))
    report("xla add nodonate", scan_time(lambda c: c + 1.0, x0,
                                         donate=False))
    report("xla 8 adds/iter", scan_time(
        lambda c: c + 1.0 + jnp.tanh(c) * 1e-9, x0))

    # bare pallas: one tiny VMEM->VMEM kernel, no grid
    def k_add(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def bare(c):
        return pl.pallas_call(
            k_add, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(c)

    report("pallas bare", scan_time(bare, x0))

    # with a 16-step grid
    def gridded(c):
        return pl.pallas_call(
            k_add,
            grid=(16,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(c)

    report("pallas grid=16", scan_time(gridded, x0))

    # ANY memory space + manual DMA + semaphore
    big0 = jnp.ones((1024, 512), jnp.int8)

    def k_dma(x_hbm, o_ref, scr, sem):
        pltpu.make_async_copy(x_hbm.at[pl.ds(0, 256)], scr, sem).start()
        pltpu.make_async_copy(x_hbm.at[pl.ds(0, 256)], scr, sem).wait()
        o_ref[...] = jnp.sum(scr[...].astype(jnp.float32)) + \
            jnp.zeros((8, 128), jnp.float32)

    def dma(c):
        big, small = c
        out = pl.pallas_call(
            k_dma,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((256, 512), jnp.int8),
                            pltpu.SemaphoreType.DMA],
        )(big)
        return big, small + out

    report("pallas ANY+dma", scan_time(dma, (big0, x0)))

    # aliased in/out ANY plane (the cache-update pattern)
    def k_alias(x_hbm, o_hbm, o_ref, scr, sem):
        pltpu.make_async_copy(x_hbm.at[pl.ds(0, 8)], scr, sem).start()
        pltpu.make_async_copy(x_hbm.at[pl.ds(0, 8)], scr, sem).wait()
        scr[...] = (scr[...].astype(jnp.int32) + 1).astype(jnp.int8)
        pltpu.make_async_copy(scr, o_hbm.at[pl.ds(0, 8)], sem).start()
        pltpu.make_async_copy(scr, o_hbm.at[pl.ds(0, 8)], sem).wait()
        o_ref[...] = jnp.zeros((8, 128), jnp.float32)

    def aliased(c):
        big, small = c
        big2, out = pl.pallas_call(
            k_alias,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                       pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((1024, 512), jnp.int8),
                       jax.ShapeDtypeStruct((8, 128), jnp.float32)],
            input_output_aliases={0: 0},
            scratch_shapes=[pltpu.VMEM((8, 512), jnp.int8),
                            pltpu.SemaphoreType.DMA],
        )(big)
        return big2, small + out

    report("pallas aliased ANY rmw", scan_time(aliased, (big0, x0)))

    # scalar prefetch grid spec (the fused kernel's structure)
    def k_sp(s_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...] + s_ref[0].astype(jnp.float32)

    def spref(c):
        s = jnp.ones((4,), jnp.int32)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(4,),
            in_specs=[pl.BlockSpec((8, 128), lambda i, *_: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i, *_: (0, 0)),
        )
        return pl.pallas_call(
            k_sp, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(s, c)

    report("pallas scalar-prefetch grid=4", scan_time(spref, x0))

    # 8 bare pallas calls per iteration (the per-layer pattern)
    def eight(c):
        for _ in range(8):
            c = bare(c)
        return c

    report("8x pallas bare", scan_time(eight, x0))


if __name__ == "__main__":
    main()
