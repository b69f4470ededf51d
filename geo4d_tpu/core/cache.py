"""Persistent XLA compile-cache setup that works under ambient jax imports.

The obvious way to enable jax's persistent compilation cache is to export
``JAX_COMPILATION_CACHE_DIR`` before importing jax.  That silently fails in
any environment whose ``sitecustomize`` (or other PYTHONPATH shim) imports
jax at interpreter startup — jax snapshots the env into its config at import
time, so values set afterwards by the entry script are never seen and every
process pays the full compile again (the 1.44B-param UNet compile is minutes,
reference scale: lvdm/modules/networks/openaimodel3d.py:281).

``enable_persistent_compile_cache`` is import-order-proof: it writes the
config values directly on the live jax config, which the compiler consults
at every compile.  Call it from process entry points (bench, CLIs, tests);
it is a no-op when a cache dir is already configured.
"""

from __future__ import annotations

import os


def enable_persistent_compile_cache(path: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at `path` and enable it.

    Resolution order: an already-configured ``jax_compilation_cache_dir``
    wins (no-op); else explicit `path`; else the ``JAX_COMPILATION_CACHE_DIR``
    env var (honoured even when jax was imported before it was set); else
    ``~/.cache/geo4d_tpu/xla``.  Returns the directory in effect.
    """
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    path = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "geo4d_tpu", "xla"
        )
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that takes >=1 s to compile, regardless of entry size:
    # over a remote-device tunnel even mid-sized graphs cost tens of seconds
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
