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
