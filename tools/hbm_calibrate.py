"""Raw HBM bandwidth calibration for the attached TPU.

Measures effective read bandwidth with a trivial reduction over a large
array, at several dtypes, plus a copy (read+write) test.  Establishes the
roofline denominator for bench analysis (RESULTS.md notes a platform
write-path anomaly on this tunnel-attached chip).
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/spatten_jax_cache")


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[-1])
    return (time.perf_counter() - t0) / n


def main():
    nbytes = 512 * 1024 * 1024

    for dtype, name in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16"),
                        (jnp.float32, "f32")):
        elems = nbytes // jnp.dtype(dtype).itemsize
        x = jnp.ones((elems // 1024, 1024), dtype)

        @jax.jit
        def rsum(x):
            return jnp.sum(x.astype(jnp.float32))

        dt = timeit(rsum, x)
        print(f"read {name}: {nbytes / dt / 1e9:.1f} GB/s "
              f"({dt * 1e3:.2f} ms for 512 MB)")

    # int8 -> bf16 dot: the weight-streaming pattern ([16, K] @ [K, N])
    for rows in (16, 64):
        k, nn = 4096, 16384
        w = jnp.ones((k, nn), jnp.int8)
        a = jnp.ones((rows, k), jnp.bfloat16)

        @jax.jit
        def dot(a, w):
            return jnp.matmul(a, w.astype(jnp.bfloat16)).sum()

        dt = timeit(dot, a, w)
        wb = k * nn
        print(f"int8 dot rows={rows}: {wb / dt / 1e9:.1f} GB/s of weights "
              f"({dt * 1e3:.3f} ms for {wb // 2**20} MB)")

    x = jnp.ones((256 * 1024, 1024), jnp.int8)   # 256 MB

    @jax.jit
    def copy(x):
        return x + jnp.int8(1)

    dt = timeit(copy, x)
    print(f"copy int8 (r+w): {2 * x.size / dt / 1e9:.1f} GB/s agg "
          f"({dt * 1e3:.2f} ms for 256 MB r + 256 MB w)")


if __name__ == "__main__":
    main()
