"""Lazy object construction for the config system.

Mirrors the public surface of the reference's detectron2-style LazyCall
(``fastgen/utils/__init__.py:101-132``) and recursive ``instantiate``
(``fastgen/utils/__init__.py:53-98``) without OmegaConf: a ``LazyCall(cls)(**kw)``
produces a plain ``LazyDict`` with a ``_target_`` entry; ``instantiate`` walks the
tree and builds the objects bottom-up. ``locate`` resolves dotted import paths
(reference: ``fastgen/utils/registry.py:46``).
"""

from __future__ import annotations

import copy
import importlib
import pydoc
from typing import Any, Callable


class LazyDict(dict):
    """A dict with attribute access, used to hold lazily-constructed objects."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __deepcopy__(self, memo):
        return LazyDict({k: copy.deepcopy(v, memo) for k, v in self.items()})


class LazyCall:
    """Wrap a callable so that calling it records the call instead of executing it.

    Example::

        cfg = LazyCall(EDMPrecond)(img_resolution=32, img_channels=3)
        net = instantiate(cfg)
    """

    def __init__(self, target: Callable | str):
        if not (callable(target) or isinstance(target, str)):
            raise TypeError(f"LazyCall target must be callable or a dotted path, got {target!r}")
        self._target = target

    def __call__(self, **kwargs) -> LazyDict:
        d = LazyDict(kwargs)
        d["_target_"] = self._target
        return d


def locate(name: str) -> Any:
    """Resolve a dotted path like ``fastgen_tpu.networks.edm.EDMPrecond`` to the object."""
    obj = pydoc.locate(name)
    if obj is None:
        # pydoc.locate can fail on modules that raise on partial import; retry manually
        parts = name.split(".")
        for i in range(len(parts) - 1, 0, -1):
            try:
                mod = importlib.import_module(".".join(parts[:i]))
            except ImportError:
                continue
            obj = mod
            for attr in parts[i:]:
                obj = getattr(obj, attr)
            return obj
        raise ImportError(f"Cannot locate object {name!r}")
    return obj


def dump_target(target: Callable | str) -> str:
    if isinstance(target, str):
        return target
    return f"{target.__module__}.{target.__qualname__}"


def is_lazy(obj: Any) -> bool:
    return isinstance(obj, dict) and "_target_" in obj


def instantiate(cfg: Any, **extra_kwargs) -> Any:
    """Recursively instantiate a config tree.

    Dicts containing ``_target_`` become objects; lists/tuples/dicts are walked.
    ``extra_kwargs`` are merged into the top-level call (reference passes e.g.
    ``instantiate(config.net_optimizer, model=self.net)``).
    """
    if isinstance(cfg, (list, tuple)):
        return type(cfg)(instantiate(x) for x in cfg)
    if is_lazy(cfg):
        target = cfg["_target_"]
        if isinstance(target, str):
            target = locate(target)
        kwargs = {k: instantiate(v) for k, v in cfg.items() if k != "_target_"}
        kwargs.update(extra_kwargs)
        return target(**kwargs)
    if isinstance(cfg, dict):
        return {k: instantiate(v) for k, v in cfg.items()}
    return cfg
