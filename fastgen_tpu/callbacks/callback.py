"""Callback base + fan-out dict (ref ``fastgen/callbacks/callback.py``).

Same 20 lifecycle hooks as the reference (``callback.py:65-183``) so trainer
extensions port directly. Hooks receive the functional pieces: the method
object (module defs), the current ``MethodState``, loss maps, and iteration.
"""

from __future__ import annotations

from typing import Callable, Dict

from fastgen_tpu.utils import instantiate
from fastgen_tpu.utils import logging_utils as logger


class Callback:
    """Base callback; override any subset of hooks."""

    def __init__(self, config=None, trainer=None):
        self.config = config
        self.trainer = trainer

    # app / init
    def on_app_begin(self): ...
    def on_model_init_start(self, model): ...
    def on_model_init_end(self, model): ...
    def on_optimizer_init_start(self, model): ...
    def on_optimizer_init_end(self, model): ...
    def on_load_checkpoint_start(self, model): ...
    def on_load_checkpoint_end(self, model, iteration=0): ...
    def on_dataloader_init_start(self, model, iteration=0): ...
    def on_dataloader_init_end(self, model, iteration=0): ...
    # train loop
    def on_train_begin(self, model, state=None, iteration=0): ...
    def on_training_step_begin(self, model, state=None, iteration=0): ...
    def on_training_accum_step_begin(self, model, state=None, iteration=0): ...
    def on_backward_begin(self, model, state=None, iteration=0): ...
    def on_optimizer_step_begin(self, model, state=None, iteration=0): ...
    def on_training_step_end(self, model, state=None, data_batch=None,
                             loss_map=None, outputs=None, iteration=0): ...
    def on_train_end(self, model, state=None, iteration=0): ...
    # validation
    def on_validation_begin(self, model, state=None, iteration=0, idx=0): ...
    def on_validation_step_begin(self, model, state=None, iteration=0, idx=0): ...
    def on_validation_step_end(self, model, state=None, data_batch=None,
                               loss_map=None, outputs=None, iteration=0, idx=0): ...
    def on_validation_end(self, model, state=None, iteration=0, idx=0): ...
    # checkpoint
    def on_save_checkpoint_start(self, model, iteration=0): ...
    def on_save_checkpoint_success(self, model, iteration=0, path=None): ...
    def on_save_checkpoint_end(self, model, iteration=0): ...
    def on_app_end(self, model=None, iteration=0): ...

    def state_dict(self) -> dict:
        return {}

    def load_state_dict(self, state: dict) -> None:
        pass


class CallbackDict:
    """Named-callback container fanning hooks out to every member
    (ref ``callback.py:18-62``)."""

    def __init__(self, config=None, trainer=None):
        self.callbacks: Dict[str, Callback] = {}
        self._config = config
        self._trainer = trainer
        callbacks_cfg = getattr(getattr(config, "trainer", None), "callbacks", None) or {}
        for name, cb_cfg in callbacks_cfg.items():
            cb = instantiate(cb_cfg, config=config, trainer=trainer)
            self.add(name, cb)

    def add(self, name: str, callback: Callback) -> None:
        if name in self.callbacks:
            logger.warning(f"Callback {name!r} already registered; replacing")
        self.callbacks[name] = callback

    def __getitem__(self, name):
        return self.callbacks[name]

    def __contains__(self, name):
        return name in self.callbacks

    def __getattr__(self, method_name: str) -> Callable:
        if not method_name.startswith("on_"):
            raise AttributeError(method_name)

        def fanout(*args, **kwargs):
            for cb in self.callbacks.values():
                getattr(cb, method_name)(*args, **kwargs)

        return fanout

    def state_dict(self) -> dict:
        return {name: cb.state_dict() for name, cb in self.callbacks.items()}

    def load_state_dict(self, state: dict) -> None:
        for name, sub in (state or {}).items():
            if name in self.callbacks:
                self.callbacks[name].load_state_dict(sub)
