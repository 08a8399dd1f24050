"""Module-level global variables with temporary override context
(ref ``fastgen/utils/global_vars.py`` + ``utils/__init__.py:135-158``).

Used by configs to toggle behavior per validation variant: the trainer sets
``trainer.global_vars`` once and applies each entry of
``trainer.global_vars_val`` as a temporary override around a validation pass
(ref ``trainer.py:349-354``)."""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Dict, Optional

_GLOBALS: Dict[str, Any] = {}


def set_global_vars(values: Optional[Dict[str, Any]]) -> None:
    if values:
        _GLOBALS.update(values)


def get_global_var(name: str, default: Any = None) -> Any:
    return _GLOBALS.get(name, default)


def get_all() -> Dict[str, Any]:
    return dict(_GLOBALS)


@contextmanager
def temporary_global_vars(values: Optional[Dict[str, Any]]):
    """Temporarily override globals (validation variants)."""
    if not values:
        yield
        return
    saved = {k: _GLOBALS.get(k, _MISSING) for k in values}
    _GLOBALS.update(values)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is _MISSING:
                _GLOBALS.pop(k, None)
            else:
                _GLOBALS[k] = v


class _Missing:
    pass


_MISSING = _Missing()
