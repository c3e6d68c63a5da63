"""Test config: run on a virtual 8-device CPU mesh.

Real-TPU kernel tests live behind the SPATTEN_TPU_TESTS=1 env var (see
tests/test_kernels_tpu.py); everything else runs on CPU with
xla_force_host_platform_device_count=8 so sharding tests exercise real
multi-device paths without hardware.
"""

import os

# The sandbox host changed mid-round-5 to a machine whose XLA:CPU
# backend segfaults inside compile after ~100 in-process compilations
# (faulthandler points at backend_compile_and_load; every test passes
# when the suite is split across processes).  Capping the CPU codegen
# ISA avoids the crashing code path.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_max_isa" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_cpu_max_isa=AVX2").strip()

import jax

# Force CPU for the unit suite even when the session env points JAX at a
# remote TPU (JAX_PLATFORMS=axon/tpu) — kernel tests that need the real chip
# opt back in with SPATTEN_TPU_TESTS=1.  jax may already be imported by a
# pytest plugin (jaxtyping), so env vars are too late; use jax.config, which
# takes effect any time before backend initialization.
if not os.environ.get("SPATTEN_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_default_matmul_precision", "highest")
