"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on virtual CPU devices so the suite is
hardware-independent (the reference never tested DDP; we do better).
Must run before jax is imported anywhere.
"""

import os

# Force the CPU backend: the ambient environment may point JAX_PLATFORMS at
# a remote TPU, which would make every test dispatch ride the tunnel.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()
os.environ.setdefault('JAX_ENABLE_X64', 'false')

# The environment's sitecustomize may register a remote TPU PJRT plugin
# and pin jax_platforms through the config (which wins over the env
# var). Re-pin it to cpu before any backend initializes.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# Persistent compile cache: XLA-CPU compiles are slow on this machine
# (~15 s for a fresh op graph); cache them across test runs. NOTE: on
# this jax version the JAX_COMPILATION_CACHE_DIR env var is silently
# ignored — the config update below is the only wiring that works.
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
# Cache EVERY compile: the default 1 s threshold silently skips the
# hundreds of ~0.1 s executables a suite run produces.
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
