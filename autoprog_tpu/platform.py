"""Platform selection shim.

The bundled TPU plugin ignores the `JAX_PLATFORMS` environment variable
during discovery; route it through `jax.config` (which is honored) so
`JAX_PLATFORMS=cpu python main.py ...` works as documented. Must run
before the first JAX computation.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plats = os.environ.get("JAX_PLATFORMS", "").strip()
    if plats:
        import jax
        jax.config.update("jax_platforms", plats)
    enable_compilation_cache()


def enable_compilation_cache(path: str = "") -> None:
    """Persistent XLA compilation cache (reference analogue: cuDNN
    autotune cache + torch.compile caches). First compiles of the VOLO
    programs cost 20-40 s each through the TPU tunnel and recur on every
    process start; the persistent cache makes warm starts ~instant.
    Opt out with AUTOPROG_NO_COMPILE_CACHE=1."""
    if os.environ.get("AUTOPROG_NO_COMPILE_CACHE") == "1":
        return
    if not path:
        # one cache dir per requested platform: under the remote-compile
        # tunnel, CPU AOT results can be compiled with machine features
        # that differ from the local host's (XLA warns about potential
        # SIGILL when loading them) — keep cpu/tpu entries apart
        plat = os.environ.get("JAX_PLATFORMS", "").strip() or "default"
        path = os.environ.get(
            "AUTOPROG_COMPILE_CACHE",
            os.path.expanduser(f"~/.cache/autoprog_tpu/xla-{plat}"))
    try:
        import jax
        if jax.process_count() > 1:
            # per-process dirs in multi-process runs: programs compile
            # against different device ids per process, so a SHARED dir
            # hits for one process (entries from its previous runs) and
            # misses for the others — the resulting minutes-long compile
            # skew trips Gloo's ~30 s context-init window at the first
            # collective. Separate dirs keep every process's hit/miss
            # pattern identical, so they stay in natural lockstep.
            path = os.path.join(path, f"proc{jax.process_index()}")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is an optimization, never a failure mode
