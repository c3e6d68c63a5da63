"""Scanned microbenchmarks for the attached TPU.

Per-dispatch (tunnel) latency is ~5 ms on this platform, so every
measurement here runs N iterations inside one jitted lax.scan and reports
per-iteration time.

  python tools/microbench.py bw       # read/write bandwidth vs size
  python tools/microbench.py kernel   # fused_decode variant sweep
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/tmp/spatten_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(msg, flush=True)


def scan_time(fn, carry, n, donate=True):
    """fn: carry -> carry, scanned n times inside one dispatch.  Returns
    per-iteration seconds."""
    kw = dict(donate_argnums=(0,)) if donate else {}

    @functools.partial(jax.jit, **kw)
    def loop(carry):
        return jax.lax.scan(lambda c, _: (fn(c), ()), carry, None,
                            length=n)[0]

    carry = loop(carry)          # compile + warm
    jax.device_get(jax.tree.leaves(carry)[-1])
    best = float("inf")
    for _ in range(5):           # min over repeats: robust to the
        t0 = time.perf_counter()  # tunnel's contention noise
        carry = loop(carry)
        jax.device_get(jax.tree.leaves(carry)[-1])
        best = min(best, time.perf_counter() - t0)
    return best / n


def bench_bw():
    # -- scanned read: sum over a big int8 buffer --------------------------
    for mb in (16, 64, 256):
        x = jnp.ones((mb * 1024, 1024), jnp.int8)

        def body(c, x=x):
            return c + jnp.sum(x.astype(jnp.float32))

        dt = scan_time(body, jnp.zeros(()), 16, donate=False)
        log(f"scanned read {mb:4d} MB: {mb / 1024 / dt:7.1f} GB/s"
            f"  ({dt * 1e3:.3f} ms/iter)")

    # -- scanned write: fill a buffer (no read) ----------------------------
    for mb in (1, 8, 64):
        shape = (mb * 1024, 1024)

        def body(c, shape=shape):
            return (jnp.full(shape, c[1].astype(jnp.int8)), c[1] + 1)

        dt = scan_time(body, (jnp.zeros(shape, jnp.int8),
                              jnp.zeros((), jnp.int32)), 16)
        log(f"scanned write {mb:4d} MB: {mb / 1024 / dt:7.1f} GB/s"
            f"  ({dt * 1e3:.3f} ms/iter)")

    # -- scanned copy (read + write) --------------------------------------
    for mb in (1, 8, 64):
        shape = (mb * 1024, 1024)

        def body(c, shape=shape):
            x, k = c
            return (x + k, k)

        dt = scan_time(body, (jnp.zeros(shape, jnp.int8),
                              jnp.ones((), jnp.int8)), 16)
        log(f"scanned r+w  {mb:4d} MB: {2 * mb / 1024 / dt:7.1f} GB/s agg"
            f"  ({dt * 1e3:.3f} ms/iter)")

    # -- scanned weight streaming: int8 dot over L stacked layers ---------
    L, k, nn, rows = 8, 4096, 8192, 16
    w = jnp.ones((L, k, nn), jnp.int8)
    a = jnp.ones((rows, k), jnp.bfloat16)

    def body(c):
        def layer(x, wl):
            y = jnp.matmul(x, wl.astype(jnp.bfloat16))
            return y[:, :k], ()
        x, _ = jax.lax.scan(layer, c, w)
        return x

    dt = scan_time(body, a, 16, donate=False)
    bytes_ = L * k * nn
    log(f"scanned int8-dot stream rows={rows}: "
        f"{bytes_ / 2**30 / dt:7.1f} GB/s  ({dt * 1e3:.3f} ms/iter, "
        f"{bytes_ // 2**20} MB weights)")

    # -- scanned big matmul (MXU rate) ------------------------------------
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    b = jnp.ones((4096, 4096), jnp.bfloat16)

    def body(c):
        return jnp.matmul(c, b) * 1e-3

    dt = scan_time(body, a, 8, donate=False)
    fl = 2 * 4096**3
    log(f"scanned bf16 4k matmul: {fl / dt / 1e12:7.1f} TFLOP/s"
        f"  ({dt * 1e3:.3f} ms/iter)")


def kernel_case(name, *, batch=16, cap=4096, spatten=False, quant=None,
                requant=None, vprune=None, imp=None, steps=256,
                length=None, threshold=0.05, skip_append=False, hpp=None):
    """Time a scan of bare fused_decode_attention calls (one layer)."""
    from spatten_tpu.engine.kv_cache import init_stacked_cache
    from spatten_tpu.ops.fused_decode import fused_decode_attention

    hq = hkv = 4
    dh = 128
    b = batch
    quant = spatten if quant is None else quant
    requant = spatten if requant is None else requant
    vprune = spatten if vprune is None else vprune
    imp = spatten if imp is None else imp

    stacked = init_stacked_cache(1, b, hkv, cap, dh)
    kq = jax.tree.map(lambda x: x[0], stacked.k)
    vq = jax.tree.map(lambda x: x[0], stacked.v)
    length = int(cap * 0.9) if length is None else length
    lengths = jnp.full((b,), length, jnp.int32)
    impbuf = jnp.zeros((b, hkv, cap), jnp.float32)
    qv = jax.random.normal(jax.random.PRNGKey(0), (b, hq, 1, dh),
                           jnp.float32)
    knew = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, 1, dh),
                             jnp.float32)

    def body(carry):
        kq, vq, impbuf, acc = carry
        out, stats, k2, v2 = fused_decode_attention(
            qv, kq, vq, knew, knew, lengths,
            sm_scale=0.088,
            requant_threshold=threshold if requant else 0.0,
            quant_enabled=quant,
            v_keep=cap // 4 if vprune else 0,
            v_block_size=64,
            importance_in=impbuf if imp else None,
            quantize_queries=True,
            track_importance=imp,
            _skip_append=skip_append,
            _hpp_override=hpp,
        )
        return (k2, v2, stats.importance_delta if imp else impbuf,
                acc + out.sum())

    dt = scan_time(body, (kq, vq, impbuf, jnp.zeros(())), steps)
    log(f"kernel {name:32s}: {dt * 1e6:8.1f} us/call"
        f"  (b={batch} cap={cap})")
    return dt


def bench_kernel():
    kernel_case("dense", spatten=False)
    kernel_case("dense b=4", spatten=False, batch=4)
    kernel_case("dense b=1", spatten=False, batch=1)
    kernel_case("dense cap=1024", spatten=False, cap=1024)
    kernel_case("spatten full allfire", spatten=True)
    kernel_case("spatten full nofire", spatten=True, threshold=1e-9)
    kernel_case("spatten len=1250 allfire", spatten=True, length=1250)
    kernel_case("spatten len=1250 nofire", spatten=True, length=1250,
                threshold=1e-9)
    kernel_case("spatten no-requant", spatten=True, requant=False)
    kernel_case("spatten no-vprune", spatten=True, vprune=False)
    kernel_case("spatten no-imp", spatten=True, imp=False)
    kernel_case("quant-only", quant=True, requant=False, vprune=False,
                imp=False)
    kernel_case("dense+imp", spatten=False, imp=True)
    kernel_case("dense len=1250", spatten=False, length=1250)


def bench_8k():
    kernel_case("dense 8k", spatten=False, cap=8192)
    kernel_case("dense 8k b=32", spatten=False, cap=8192, batch=32)
    kernel_case("spatten 8k len=2490 allfire", spatten=True, cap=8192,
                length=2490)
    kernel_case("spatten 8k len=2490 nofire", spatten=True, cap=8192,
                length=2490, threshold=1e-9)
    kernel_case("spatten 8k b=32 len=2490 nofire", spatten=True, cap=8192,
                batch=32, length=2490, threshold=1e-9)
    kernel_case("spatten 8k b=32 len=2490 allfire", spatten=True, cap=8192,
                batch=32, length=2490)
    kernel_case("sp 8k b=32 2490 nofire novp", spatten=True, cap=8192,
                batch=32, length=2490, threshold=1e-9, vprune=False)
    kernel_case("sp 8k b=32 2490 nofire noimp", spatten=True, cap=8192,
                batch=32, length=2490, threshold=1e-9, imp=False)
    kernel_case("sp 8k b=32 2490 norq", spatten=True, cap=8192,
                batch=32, length=2490, requant=False)
    kernel_case("sp 8k b=32 2490 qonly", quant=True, cap=8192,
                batch=32, length=2490, requant=False, vprune=False,
                imp=False)
    kernel_case("dense 8k b=32 len=2490", spatten=False, cap=8192,
                batch=32, length=2490)


def bench_floor():
    kernel_case("dense", spatten=False)
    kernel_case("dense no-append", spatten=False, skip_append=True)
    kernel_case("dense len=1250 no-append", spatten=False, length=1250,
                skip_append=True)
    kernel_case("spatten 1250 nofire no-append", spatten=True, length=1250,
                threshold=1e-9, skip_append=True)
    kernel_case("dense len=128", spatten=False, length=128)
    kernel_case("dense len=128 no-append", spatten=False, length=128,
                skip_append=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "bw"
    if mode == "bw":
        bench_bw()
    elif mode == "kernel":
        bench_kernel()
    elif mode == "8k":
        bench_8k()
    elif mode == "floor":
        bench_floor()
    else:
        raise SystemExit(f"unknown mode {mode}")
