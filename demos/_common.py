"""Shared demo prologue: honor JAX_PLATFORMS even where a site
customization pre-registers a TPU backend (the env var alone is read too
early; the config update works at any point before first device use)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    try:
        jax.config.update("jax_platforms", _plat)
    except Exception:
        pass
