"""Functional method base: the TPU-native redesign of ``FastGenModel``.

The reference (``fastgen/methods/model.py:26-700``) is a mutable nn.Module that
owns networks, optimizers, EMA copies and an autocast/GradScaler stack. The
TPU-native design is purely functional:

* ``MethodState`` — one pytree holding every net's params, per-net optax
  states, EMA param copies and the iteration counter. It is donated through the
  jitted train step, so all of DDP/FSDP/EMA/optimizer logic is a single XLA
  program with GSPMD-inserted collectives.
* ``FastGenModel`` (same public name) — a host-side object holding the linen
  module definitions, optax transforms and config. ``train_step(phase)``
  returns a pure ``(state, batch, rng) -> (state, loss_map, outputs)`` that the
  trainer jits (with sharding annotations) once per training phase; the
  reference's phase-routed optimizers (``dmd2.py:473-501``) become two compiled
  programs selected by ``iteration % student_update_freq`` in Python.
* no GradScaler: params live in ``precision`` (fp32), compute optionally in
  bf16 (``precision_amp``), which needs no loss scaling on TPU.
* EMA is a sharded lerp fused into the step (strictly better than the
  reference's FSDP ``full_tensor()`` gather per step, ``callbacks/ema.py:114``).
* random phases (rank-0 sample + broadcast in the reference,
  ``self_forcing.py:73-89``) are identical seeded draws on every host.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from fastgen_tpu.configs.opt import make_optimizer
from fastgen_tpu.utils import PRECISION_MAP, expand_like, instantiate
from fastgen_tpu.utils import logging_utils as logger


def convert_cfg_to_dict(cfg) -> dict:
    """attrs/LazyDict config -> kwargs dict (reference ``basic_utils.convert_cfg_to_dict``)."""
    import attrs

    if cfg is None:
        return {}
    if isinstance(cfg, dict):
        return {k: v for k, v in cfg.items() if k != "_target_"}
    if attrs.has(type(cfg)):
        return attrs.asdict(cfg)
    raise TypeError(f"Cannot convert {type(cfg)} to dict")


class MethodState(struct.PyTreeNode):
    """The complete training state as one donated pytree."""

    params: Dict[str, Any]         # per-net parameter trees ("net", "teacher", ...)
    opt_states: Dict[str, Any]     # optax states for trainable nets
    ema: Dict[str, Any]            # {ema_name: params-like tree for "net"}
    iteration: jnp.ndarray         # scalar int32

    def param_count(self, key: str = "net") -> int:
        return sum(p.size for p in jax.tree_util.tree_leaves(self.params[key]))


def _tree_cast(tree, dtype):
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if (hasattr(x, "dtype") and
                                      jnp.issubdtype(x.dtype, jnp.floating)) else x,
        tree)


def ema_beta_from_spec(spec, iteration=None):
    """EMA decay for a spec (mirrors EMACallback beta/power/halflife modes)."""
    if isinstance(spec, (int, float)):
        return jnp.asarray(spec, jnp.float32)
    kind = spec.get("type", "constant")
    if kind == "constant":
        return jnp.asarray(spec["beta"], jnp.float32)
    if kind == "power":
        # EDM2 power-law EMA: beta = (1 - 1/t)^(gamma+1)
        gamma = spec.get("gamma", 6.94)
        t = jnp.maximum(iteration.astype(jnp.float32), 1.0)
        return (1.0 - 1.0 / t) ** (gamma + 1)
    if kind == "halflife":
        # halflife in iterations
        hl = spec["halflife_iters"]
        return jnp.asarray(0.5 ** (1.0 / hl), jnp.float32)
    raise ValueError(f"Unknown EMA spec {spec!r}")


def ema_name_from_spec(spec) -> str:
    if isinstance(spec, (int, float)):
        return f"ema_{spec}"
    kind = spec.get("type", "constant")
    if kind == "constant":
        return f"ema_{spec['beta']}"
    if kind == "power":
        return f"ema_power_{spec.get('gamma', 6.94)}"
    return f"ema_halflife_{spec['halflife_iters']}"


class FastGenModel:
    """Host-side method object: module defs + optax transforms + pure step fns.

    Subclasses implement:
      * ``network_keys`` / ``trainable_keys(phase)`` / ``phases``
      * ``phase_for_iteration(iteration) -> str`` (Python-level routing)
      * ``compute_losses(params, batch, rng, iteration, phase) -> (loss_map, outputs)``
    """

    def __init__(self, config):
        self.config = config
        self.precision = PRECISION_MAP[config.precision]
        self.precision_amp = PRECISION_MAP.get(config.precision_amp) if config.precision_amp else None
        self.precision_amp_infer = (PRECISION_MAP.get(config.precision_amp_infer)
                                    if config.precision_amp_infer else None)
        self.precision_amp_enc = (PRECISION_MAP.get(config.precision_amp_enc)
                                  if getattr(config, "precision_amp_enc", None)
                                  else None)
        self.input_shape = tuple(config.input_shape)
        self.nets: Dict[str, Any] = {}       # linen modules per key
        self.txs: Dict[str, optax.GradientTransformation] = {}
        # net key -> grad-clip spec dict (norm/posinf/neginf); populated by the
        # trainer from the GradClipCallback config before optimizers are built
        self.grad_clip: Dict[str, Dict[str, Any]] = {}
        self._grad_clip_wrapped = False
        self.build_model()
        self._register_param_postprocessors()
        self._build_encoders()

    def _build_encoders(self):
        """Frozen encoder stack for preprocess_data (ref nets attach
        ``vae``/``text_encoder``/``image_encoder``; ``trainer.py:374-476``)."""
        self.vae = None
        self.text_encoder = None
        self.image_encoder = None
        self.depth_annotator = None
        for name in ("vae", "text_encoder", "image_encoder", "depth_annotator"):
            cfg = getattr(self.config, name, None)
            if cfg is not None and getattr(self.config, "enable_preprocessors", True):
                logger.info(f"Instantiating frozen {name}")
                setattr(self, name, instantiate(cfg))

    # ------------------------------------------------------------- structure
    @property
    def phases(self) -> Tuple[str, ...]:
        return ("student",)

    def phase_for_iteration(self, iteration: int) -> str:
        return "student"

    def trainable_keys(self, phase: str) -> Tuple[str, ...]:
        return ("net",)

    @property
    def net(self):
        return self.nets["net"]

    @property
    def teacher(self):
        return self.nets.get("teacher")

    @property
    def model_dict(self) -> Dict[str, Any]:
        """Module definitions to checkpoint/shard (ref ``model.py:654-700``)."""
        return dict(self.nets)

    # ------------------------------------------------------------- building
    def build_model(self):
        logger.info("Instantiating the generator network")
        self.nets["net"] = instantiate(self.config.net)

    def build_teacher(self):
        teacher_cfg = self.config.teacher if self.config.teacher is not None else self.config.net
        self.nets["teacher"] = instantiate(teacher_cfg)

    def init_optimizers(self):
        """Create optax transforms per trainable net (ref ``model.py:514-536``)."""
        self.txs["net"] = make_optimizer(self.config.net_optimizer,
                                         self.config.net_scheduler)

    def _register_param_postprocessors(self):
        """Per-net transforms applied to updated params after each optimizer
        step. EDM2's forced weight normalization (reference
        ``ForcedWeightNormCallback``) is fused into the jitted step here."""
        self.param_postprocessors: Dict[str, Callable] = {}
        try:
            from fastgen_tpu.networks.edm2.network import EDM2Precond, normalize_weights
        except ImportError:
            return
        for key, net in self.nets.items():
            if isinstance(net, EDM2Precond):
                self.param_postprocessors[key] = normalize_weights

    def postprocess_updated_params(self, key: str, params):
        fn = getattr(self, "param_postprocessors", {}).get(key)
        return fn(params) if fn else params

    # --------------------------------------------------------------- state
    def _init_net_params(self, key, net_key: str, rng, params_so_far=None) -> Any:
        net = self.nets[net_key]
        batch = self.example_batch(batch_size=1)
        x = batch["real"]
        t = jnp.ones((x.shape[0],), jnp.float32)
        # nets with an r-timestep head (sCM/MeanFlow) must be traced with r so
        # all params materialize
        r = t if (getattr(net, "model_kwargs", {}).get("r_timestep")
                  or getattr(net, "r_timestep", False)) else None
        variables = net.init({"params": rng, "dropout": rng}, x, t, r=r,
                             condition=batch.get("condition"))
        return variables

    def example_batch(self, batch_size: int = 1) -> Dict[str, Any]:
        """Synthetic batch matching the data contract, for shape inference."""
        x = jnp.zeros((batch_size,) + self.input_shape, self.precision)
        cond = self.example_condition(batch_size)
        return {"real": x, "condition": cond, "neg_condition": cond}

    def example_condition(self, batch_size: int):
        """Condition matching the net's contract: one-hot labels for
        class-conditional nets, zero text embeddings for text-conditioned
        ones, None otherwise (used for shape inference and validation
        sampling when no val loader is configured)."""
        net = self.nets["net"]
        label_dim = getattr(net, "label_dim", 0)
        if label_dim:
            return jax.nn.one_hot(jnp.arange(batch_size) % label_dim, label_dim,
                                  dtype=self.precision)
        # nets with an in-network text projection (Cosmos Reason1) consume
        # raw embeddings wider than their cross-attention dim
        text_dim = (getattr(net, "text_input_dim", 0)
                    or getattr(net, "text_dim", 0))
        if text_dim:
            cond = {"text_embeds": jnp.zeros((batch_size, 1, text_dim),
                                             self.precision)}
            # conditional branches must be traced at init so their params
            # materialize (I2V image-context embedder, VACE context blocks)
            if getattr(net, "is_i2v", False) and getattr(net, "image_embed_dim", 0):
                cond["encoder_hidden_states_image"] = jnp.zeros(
                    (batch_size, 1, net.image_embed_dim), self.precision)
            if getattr(net, "is_vid2vid", False):
                cond["vid_context"] = jnp.zeros(
                    (batch_size,) + self.input_shape, self.precision)
            return cond
        return None

    def init_order(self) -> Tuple[str, ...]:
        """Init order: nets that others depend on (teacher feature shapes for
        discriminator heads) come first."""
        preferred = [k for k in ("net", "teacher", "fake_score") if k in self.nets]
        rest = sorted(k for k in self.nets if k not in preferred)
        return tuple(preferred + rest)

    def _finalize_optimizers(self):
        """Compose the grad sanitize+clip pass (ref ``GradClipCallback``) in
        front of each configured net's transform. Must run before any
        ``tx.init`` so the chain's state layout is final."""
        if self._grad_clip_wrapped:
            return
        self._grad_clip_wrapped = True
        from fastgen_tpu.configs.opt import grad_sanitize_and_clip

        for key, spec in self.grad_clip.items():
            if key in self.txs:
                self.txs[key] = optax.chain(
                    grad_sanitize_and_clip(spec.get("norm"), spec.get("posinf"),
                                           spec.get("neginf")),
                    self.txs[key])
            else:
                logger.warning(f"grad_clip configured for unknown net {key!r}")

    def init_state(self, rng, load_pretrained: bool = True) -> MethodState:
        """Initialize all params / optimizer states / EMA copies.

        ``load_pretrained=False`` skips ``pretrained_model_path`` resolution —
        eval tools (FID sweeps, inference) that restore a full checkpoint
        immediately after only need the state *template*, and must not crash
        on a training-time teacher path that no longer exists.
        """
        if not self.txs:
            self.init_optimizers()
        self._finalize_optimizers()
        params: Dict[str, Any] = {}
        order = self.init_order()
        keys = jax.random.split(rng, len(order))
        for k, name in zip(keys, order):
            params[name] = _tree_cast(self._init_net_params(k, name, k, params),
                                      self.precision)

        # pretrained teacher/student weights from torch checkpoints
        # (ref ``model.py:176-238`` build_teacher + load_student_weights_and_ema)
        if load_pretrained:
            params = self._load_pretrained(params)

        # teacher-seeded nets (e.g. fake_score starts from teacher weights)
        params = self.post_init_params(params)

        opt_states = {k: self.txs[k].init(params[k]["params"])
                      for k in self.txs if k in params}
        ema = {}
        for spec in self.ema_specs():
            # real copies: donation requires distinct buffers
            ema[ema_name_from_spec(spec)] = jax.tree_util.tree_map(
                jnp.copy, params["net"])
        return MethodState(params=params, opt_states=opt_states, ema=ema,
                           iteration=jnp.zeros((), jnp.int32))

    def post_init_params(self, params: Dict[str, Any]) -> Dict[str, Any]:
        return params

    # ---------------------------------------------------- checkpoint pruning
    def frozen_net_keys(self) -> frozenset:
        """Nets never trained in any phase (teacher, TCM's cm_teacher) —
        excluded from checkpoints like the reference's ``model_dict``
        (ref ``model.py:684-687``; invariant
        ``tests/test_checkpointing.py:405-486``). They are rebuilt from config
        + ``pretrained_model_path`` at startup, so persisting them only
        doubles checkpoint size/time for the big distillation runs."""
        trainable = set()
        for p in self.phases:
            trainable.update(self.trainable_keys(p))
        return frozenset(k for k in self.nets if k not in trainable)

    def prune_for_checkpoint(self, state: "MethodState") -> "MethodState":
        frozen = self.frozen_net_keys()
        if not frozen:
            return state
        return state.replace(
            params={k: v for k, v in state.params.items() if k not in frozen},
            opt_states={k: v for k, v in state.opt_states.items()
                        if k not in frozen})

    def restore_frozen(self, restored: "MethodState",
                       full_state: "MethodState") -> "MethodState":
        """Re-attach the frozen nets' (initialized/pretrained) params to a
        pruned restored state (ref invariant: teacher unchanged after load)."""
        frozen = self.frozen_net_keys()
        if not frozen:
            return restored
        params = dict(restored.params)
        for k in frozen:
            if k in full_state.params:
                params[k] = full_state.params[k]
        return restored.replace(params=params)

    def _checkpoint_arch(self, net) -> Optional[str]:
        name = type(net).__name__
        if "EDM2" in name:
            return "edm2"
        if "EDM" in name:
            return "edm"
        if name == "DiT":
            return "dit"
        if "Cosmos" in name:
            return "cosmos"
        if "Wan" in name:
            return "wan"
        if "XL" in name:
            return "sdxl"
        if "StableDiffusion" in name:
            return "sd15"
        if "Flux" in name:
            return "flux"
        if "CogVideoX" in name:
            return "cogvideox"
        if "LTX2" in name:
            return "ltx2"
        return None

    def _load_pretrained(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Load torch teacher/student checkpoints into the param dict
        (ref ``model.py:600-644`` _load_pretrained_model)."""
        path = getattr(self.config, "pretrained_model_path", "")
        if path and os.path.isdir(path):
            # a fastgen-tpu Orbax run directory (e.g. a stage-1 SFT teacher
            # feeding a distillation recipe) — native counterpart of the
            # reference loading its own trained torch ckpts (model.py:600-644)
            from fastgen_tpu.utils.checkpointer import load_native_net_params

            variables = _tree_cast(load_native_net_params(path), self.precision)
            params = self._merge_pretrained_nets(params, variables, path)
        elif path.endswith(".npz"):
            # a committed single-file param snapshot (save_net_params_npz) —
            # e.g. quality/ckpt/teacher_*.npz warm-starting a longer teacher
            # run after the Orbax output root died with its session
            from fastgen_tpu.utils.checkpointer import load_net_params_npz

            variables = _tree_cast(load_net_params_npz(path), self.precision)
            params = self._merge_pretrained_nets(params, variables, path)
        elif path:
            from fastgen_tpu.utils import torch_convert

            arch = self._checkpoint_arch(self.nets.get("teacher") or self.net)
            if arch is None or arch not in torch_convert.CONVERTERS:
                logger.warning(f"No converter for {type(self.net).__name__} "
                               f"(arch={arch}); pretrained_model_path ignored")
            else:
                variables = torch_convert.convert_checkpoint(path, arch)
                variables = _tree_cast(variables, self.precision)
                for key in ("teacher", "net"):
                    if key == "net" and not self.config.load_student_weights:
                        continue
                    if key in params:
                        torch_convert.verify_against_template(variables, params[key])
                params = self._merge_pretrained_nets(params, variables, path)
        student_path = getattr(self.config, "pretrained_student_net_path", "")
        if student_path and self.config.load_student_weights:
            # same three source kinds as pretrained_model_path, but the overlay
            # targets ONLY params["net"] — e.g. resuming a distillation student
            # from a committed npz snapshot while pretrained_model_path seeds
            # teacher/fake_score from the teacher's snapshot (the Orbax run dir
            # died with its session; QUALITY.md v8b)
            from fastgen_tpu.utils.checkpointer import (load_native_net_params,
                                                        load_net_params_npz,
                                                        tolerant_merge)

            if os.path.isdir(student_path):
                variables = _tree_cast(load_native_net_params(student_path),
                                       self.precision)
                params["net"] = tolerant_merge(params["net"], variables,
                                               f"{student_path}:net")
            elif student_path.endswith(".npz"):
                variables = _tree_cast(load_net_params_npz(student_path),
                                       self.precision)
                params["net"] = tolerant_merge(params["net"], variables,
                                               f"{student_path}:net")
            else:
                from fastgen_tpu.utils import torch_convert

                arch = self._checkpoint_arch(self.net)
                if arch:
                    variables = _tree_cast(
                        torch_convert.convert_checkpoint(student_path, arch),
                        self.precision)
                    params["net"] = self._merge_variables(params["net"],
                                                          variables)
        return params

    def _merge_pretrained_nets(self, params: Dict[str, Any], variables,
                               source: str) -> Dict[str, Any]:
        """Overlay loaded variables onto the teacher/net param trees via
        ``tolerant_merge`` — missing keys and shape mismatches keep init but
        WARN (a snapshot from a mismatched config no longer warm-starts
        silently from garbage; ref ``model.py:600-644`` verifies torch
        loads the same way)."""
        from fastgen_tpu.utils.checkpointer import tolerant_merge

        for key in ("teacher", "net"):
            if key == "net" and not self.config.load_student_weights:
                continue
            if key in params:
                params[key] = tolerant_merge(params[key], variables,
                                             f"{source}:{key}")
        return params

    @staticmethod
    def _merge_variables(template, loaded):
        """Overlay loaded leaves onto the template (missing keys keep init)."""
        import numpy as _np

        def walk(tmpl, conv):
            if not isinstance(tmpl, dict):
                return jnp.asarray(conv, dtype=tmpl.dtype) if conv is not None else tmpl
            out = {}
            for k, v in tmpl.items():
                out[k] = walk(v, conv.get(k) if isinstance(conv, dict) else None)
            return out

        return walk(template, loaded)

    def ema_specs(self):
        use_ema = self.config.use_ema
        if not use_ema:
            return []
        if isinstance(use_ema, (list, tuple)):
            return list(use_ema)
        return [use_ema] if not isinstance(use_ema, bool) else [0.9999]

    # --------------------------------------------------------------- losses
    _VIDEO_COND_KEYS = ("vid_context", "first_frame_cond", "first_frame_latent",
                        "conditioning_latents", "condition_mask",
                        "encoder_hidden_states_image")

    def _prepare_training_data(self, batch):
        """(real, condition, neg_condition) from the batch dict
        (ref ``model.py:431-485``). Video-conditioning sibling keys (e.g. the
        latent-WDS loaders' ``vid_context``/``depth_latent``) are folded into
        the condition dicts — CFG negates text only, so both positive and
        negative conditions share them."""
        cond, neg = batch.get("condition"), batch.get("neg_condition")
        extra = {k: batch[k] for k in self._VIDEO_COND_KEYS if k in batch}
        if "depth_latent" in batch and "vid_context" not in extra:
            extra["vid_context"] = batch["depth_latent"]
        if extra:
            def merge(c):
                if c is None:
                    return dict(extra)
                c = dict(c) if isinstance(c, dict) else {"text_embeds": c}
                for k, v in extra.items():
                    c.setdefault(k, v)
                return c
            cond, neg = merge(cond), (merge(neg) if neg is not None or cond is None
                                      else neg)
        return batch["real"], cond, neg

    def mix_condition(self, rng, condition, neg_condition, dropout_prob,
                      keys_no_dropout=()):
        """Per-sample CFG condition dropout (ref ``sft.py:33-76``)."""
        if dropout_prob is None or condition is None:
            return condition
        if isinstance(condition, dict):
            drop_keys = [k for k in condition if k not in keys_no_dropout]
            if not drop_keys:
                return condition
            b = condition[drop_keys[0]].shape[0]
            keep = jax.random.uniform(rng, (b,)) >= dropout_prob
            out = dict(condition)
            for k in drop_keys:
                mask = expand_like(keep, condition[k])
                out[k] = jnp.where(mask, condition[k], neg_condition[k])
            return out
        b = condition.shape[0]
        keep = jax.random.uniform(rng, (b,)) >= dropout_prob
        return jnp.where(expand_like(keep, condition), condition, neg_condition)

    def compute_losses(self, params, batch, rng, iteration, phase):
        raise NotImplementedError

    def apply_net(self, params, net_key, *args, compute_dtype=None, **kwargs):
        """Apply a net with optional bf16 compute casting (AMP-equivalent)."""
        net = self.nets[net_key]
        variables = params[net_key]
        if compute_dtype is None:
            compute_dtype = self.precision_amp
        if compute_dtype is not None:
            variables = _tree_cast(variables, compute_dtype)
            args = tuple(a.astype(compute_dtype)
                         if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                         and a.ndim > 1 else a
                         for a in args)
        return net.apply(variables, *args, **kwargs)

    # ----------------------------------------------------------- train step
    def make_train_step(self, phase: str) -> Callable:
        """Build the pure train step for one phase. jit/donate by the trainer."""
        trainable = self.trainable_keys(phase)
        ema_specs = self.ema_specs()

        def step(state: MethodState, batch, rng):
            def loss_fn(train_params):
                params = dict(state.params)
                for k in trainable:
                    params[k] = {**state.params[k], "params": train_params[k]}
                loss_map, outputs = self.compute_losses(
                    params, batch, rng, state.iteration, phase)
                return loss_map["total_loss"], (loss_map, outputs)

            train_params = {k: state.params[k]["params"] for k in trainable}
            (_, (loss_map, outputs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(train_params)

            gnorm = optax.global_norm(grads)
            loss_map = dict(loss_map)
            loss_map["grad_norm"] = gnorm

            new_params = dict(state.params)
            new_opt = dict(state.opt_states)
            for k in trainable:
                updates, new_opt[k] = self.txs[k].update(
                    grads[k], state.opt_states[k], state.params[k]["params"])
                new_params[k] = {**state.params[k],
                                 "params": self.postprocess_updated_params(
                                     k, optax.apply_updates(
                                         state.params[k]["params"], updates))}

            # non-trainable variable updates (e.g. f-distill ratio bins) ride
            # in outputs["_variable_updates"] = {net_key: {collection: tree}}
            outputs = dict(outputs)
            var_updates = outputs.pop("_variable_updates", None)
            if var_updates:
                for k, colls in var_updates.items():
                    new_params[k] = {**new_params.get(k, state.params[k]),
                                     **jax.lax.stop_gradient(colls)}

            ema = state.ema
            if ema_specs and "net" in trainable:
                ema = {}
                for spec in ema_specs:
                    name = ema_name_from_spec(spec)
                    beta = ema_beta_from_spec(spec, state.iteration)
                    ema[name] = jax.tree_util.tree_map(
                        lambda e, p: e * beta + p.astype(e.dtype) * (1 - beta),
                        state.ema[name], new_params["net"])

            new_state = state.replace(params=new_params, opt_states=new_opt,
                                      ema=ema, iteration=state.iteration + 1)
            return new_state, loss_map, outputs

        return step

    def make_grad_step(self, phase: str) -> Callable:
        """Gradient-only step for grad accumulation (reference no-sync rounds,
        ``trainer.py:310-329``): returns grads + loss_map, no state mutation."""
        trainable = self.trainable_keys(phase)

        def gstep(state: MethodState, batch, rng):
            def loss_fn(train_params):
                params = dict(state.params)
                for k in trainable:
                    params[k] = {**state.params[k], "params": train_params[k]}
                loss_map, outputs = self.compute_losses(
                    params, batch, rng, state.iteration, phase)
                return loss_map["total_loss"], (loss_map, outputs)

            train_params = {k: state.params[k]["params"] for k in trainable}
            (_, (loss_map, outputs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(train_params)
            return grads, loss_map, outputs

        return gstep

    def make_apply_step(self, phase: str) -> Callable:
        """Apply pre-accumulated grads (optimizer + EMA + iteration bump)."""
        trainable = self.trainable_keys(phase)
        ema_specs = self.ema_specs()

        def astep(state: MethodState, grads, variable_updates=None):
            new_params = dict(state.params)
            new_opt = dict(state.opt_states)
            for k in trainable:
                updates, new_opt[k] = self.txs[k].update(
                    grads[k], state.opt_states[k], state.params[k]["params"])
                new_params[k] = {**state.params[k],
                                 "params": self.postprocess_updated_params(
                                     k, optax.apply_updates(
                                         state.params[k]["params"], updates))}
            if variable_updates:
                for k, colls in variable_updates.items():
                    new_params[k] = {**new_params.get(k, state.params[k]),
                                     **jax.lax.stop_gradient(colls)}
            ema = state.ema
            if ema_specs and "net" in trainable:
                ema = {}
                for spec in ema_specs:
                    name = ema_name_from_spec(spec)
                    beta = ema_beta_from_spec(spec, state.iteration)
                    ema[name] = jax.tree_util.tree_map(
                        lambda e, p: e * beta + p.astype(e.dtype) * (1 - beta),
                        state.ema[name], new_params["net"])
            return state.replace(params=new_params, opt_states=new_opt, ema=ema,
                                 iteration=state.iteration + 1)

        return astep

    def make_eval_step(self, phase: str) -> Callable:
        """Grad-free loss evaluation over a held-out batch. The reference's
        ``validate`` runs ``single_train_step`` under ``no_grad`` per val
        batch to log validation loss (ref ``trainer.py:341-372``); here the
        equivalent is ``compute_losses`` without the grad transform — one
        forward-only jitted program per phase, no state mutation."""

        def estep(state: MethodState, batch, rng):
            loss_map, _ = self.compute_losses(
                state.params, batch, rng, state.iteration, phase)
            return loss_map

        return estep

    def make_merge_variables_step(self) -> Callable:
        """Merge non-trainable variable updates (e.g. f-distill ratio bins)
        into the state between grad-accumulation rounds, matching the
        reference's per-microbatch buffer updates (``f_distill.py:72-98``)."""

        def mstep(state: MethodState, variable_updates):
            new_params = dict(state.params)
            for k, colls in variable_updates.items():
                new_params[k] = {**new_params[k],
                                 **jax.lax.stop_gradient(colls)}
            return state.replace(params=new_params)

        return mstep

    # ------------------------------------------------------------- sampling
    def _student_sample_loop(self, params_net, x, t_list, rng, condition=None,
                            student_sample_type: str = "sde", net_key: str = "net",
                            params_full=None, **kwargs):
        """Few-step student sampling (ref ``model.py:315-372``).

        t_list is a static numpy array -> the loop unrolls under jit
        (1-4 steps). SDE re-noises with fresh eps; ODE reuses the implied eps.
        """
        net = self.nets[net_key]
        ns = net.noise_scheduler
        batch_size = x.shape[0]
        x_pred = x
        for i, (t_cur, t_next) in enumerate(zip(t_list[:-1], t_list[1:])):
            t_batch = jnp.full((batch_size,), t_cur, jnp.float32)
            x_pred = net.apply(params_net, x, t_batch, condition=condition,
                               fwd_pred_type="x0", **kwargs)
            if float(t_next) > 0:
                t_next_batch = jnp.full((batch_size,), t_next, jnp.float32)
                if student_sample_type == "sde":
                    rng, sub = jax.random.split(rng)
                    eps_infer = jax.random.normal(sub, x_pred.shape, x_pred.dtype)
                elif student_sample_type == "ode":
                    eps_infer = ns.x0_to_eps(x, x_pred, t_batch)
                else:
                    raise NotImplementedError(student_sample_type)
                x = ns.forward_process(x_pred, eps_infer, t_next_batch)
        return x_pred

    def generator_fn(self, params_net, noise, rng=None, student_sample_steps: int = 1,
                     t_list=None, condition=None, data=None,
                     student_sample_type: str = "sde", net_key: str = "net", **kwargs):
        """Few-step generation entry (ref ``model.py:374-420``)."""
        net = self.nets[net_key]
        ns = net.noise_scheduler
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if t_list is None:
            t_list = ns.get_t_list(student_sample_steps)
        else:
            t_list = np.asarray(t_list, np.float32)
            assert len(t_list) - 1 == student_sample_steps
        assert float(t_list[-1]) == 0.0, "t_list[-1] must be zero"
        latents = ns.latents(noise, t_init=jnp.asarray(float(t_list[0]), jnp.float32))
        if data is not None:
            latents = latents + data
        out = self._student_sample_loop(params_net, latents, t_list, rng,
                                        condition=condition,
                                        student_sample_type=student_sample_type,
                                        net_key=net_key, **kwargs)
        return out.astype(noise.dtype)

    def sample_teacher(self, params, noise, net_key: str = "teacher", **kwargs):
        """Full multi-step sampling via the net's own sampler."""
        net = self.nets[net_key]
        return net.apply(params[net_key], noise, method=net.sample,
                         guidance_scale=self.config.guidance_scale, **kwargs)
