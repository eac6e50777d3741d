"""Global JAX configuration for khmer-tpu.

khmer's hash space is 64-bit (``HashIntoType`` is ``uint64_t``, see reference
include/oxli/oxli.hh:115), so the framework runs with ``jax_enable_x64``.
On TPU, 64-bit integer ops are emulated by XLA with 32-bit pairs; the
performance-critical paths do the pair arithmetic explicitly as
phase-major u32 kernels (see khmer_tpu/ops/hashing.py and
khmer_tpu/ops/deferred.py).

Import this module before creating any JAX arrays.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# KHMER_TPU_PLATFORM=cpu forces the CPU backend (the JAX_PLATFORMS env
# var alone can lose to a registered TPU platform plugin); useful for
# running the CLI scripts host-side on small inputs.
_plat = os.environ.get("KHMER_TPU_PLATFORM")
if _plat:
    jax.config.update("jax_platforms", _plat)

# persistent compilation cache: first compiles of the big fused kernels
# take tens of seconds (especially over a tunneled TPU); cache them.
jax.config.update("jax_compilation_cache_dir", "/tmp/khmer_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# KHMER_TPU_PROFILE=<dir> captures a device profile (XProf/TensorBoard
# trace: per-op device time, HBM traffic, h2d/d2h activity) for the
# whole process — the profiler hook of the tracing subsystem (SURVEY
# §5; complements the KHMER_TPU_TIMING per-stage wall clocks in
# ops/deferred.py).  View with `tensorboard --logdir <dir>` or xprof.
_profile_dir = os.environ.get("KHMER_TPU_PROFILE")
if _profile_dir:
    import atexit

    jax.profiler.start_trace(_profile_dir)
    atexit.register(jax.profiler.stop_trace)

#: dtype used for k-mer hash values everywhere (parity with oxli HashIntoType)
import jax.numpy as jnp  # noqa: E402

HASH_DTYPE = jnp.uint64
COUNT_DTYPE = jnp.uint8

# Constants mirrored from reference include/oxli/oxli.hh:81-83,116
MAX_KCOUNT = 255
MAX_BIGCOUNT = 65535
DEFAULT_TAG_DENSITY = 40
KSIZE_MAX = 32  # for the exact 2-bit hash


def default_device():
    return jax.devices()[0]
