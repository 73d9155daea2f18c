"""Model registry.

TPU-native replacement for the timm registry the reference leans on
(`timm.create_model`, used at `main_prog.py:411-426` / `validate.py:136-143`).
Model builders register under a name; `create_model` also understands the
`<family>_h<H>_l<L>` name-as-config grammar by delegating to the
`model_variant` factory (reference `models/submodels.py:9-41`, implemented
ungated here per SURVEY §7.4).
"""

from __future__ import annotations

from typing import Callable, Dict, List

_REGISTRY: Dict[str, Callable] = {}


def register_model(fn: Callable) -> Callable:
    _REGISTRY[fn.__name__] = fn
    return fn


def list_models() -> List[str]:
    return sorted(_REGISTRY)


def is_model(name: str) -> bool:
    return name in _REGISTRY


def create_model(model_name: str, **kwargs):
    """Instantiate a registered model description by name.

    Returns a `ModelDef` (see models/factory.py) bundling the Flax module
    factory with its default data config — models themselves are pure
    functions of (params, inputs) so "creating a model" creates no state.
    """
    # Late import so registering modules are loaded exactly once.
    import autoprog_tpu.models  # noqa: F401

    from autoprog_tpu.config import is_variant_name

    if model_name in _REGISTRY:
        return _REGISTRY[model_name](**kwargs)
    if is_variant_name(model_name):
        return _REGISTRY["model_variant"](variant=model_name, **kwargs)
    raise KeyError(
        f"Unknown model {model_name!r}. Known: {list_models()} "
        f"or any '<family>_h<H>_l<L>' variant name.")
