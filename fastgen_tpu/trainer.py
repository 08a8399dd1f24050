"""Training loop (ref ``fastgen/trainer.py``).

Same skeleton as the reference — grad accumulation, validation cadence,
checkpoint cadence, auto-resume, callback hooks — but the step itself is one
jitted XLA program per training phase with the donated ``MethodState``:

* DDP/FSDP wrap (``trainer.py:107-111``) -> state sharded onto the mesh once
  (``parallel.mesh.shard_state``); collectives come from GSPMD.
* AMP/GradScaler (``trainer.py:285-339``) -> bf16 compute policy inside the
  step; no scaler.
* grad-accum no-sync (``trainer.py:310-329``) -> grad-only steps summed on
  device, then one apply step. Single-round accumulation uses a fused
  step+update program.
* per-iteration RNG: ``fold_in(seed, iteration)`` (the reference re-seeds
  ``seed + iteration`` per rank, ``basic_utils.py:128-166``); identical across
  hosts so "rank-0 sample + broadcast" patterns become plain seeded draws.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from fastgen_tpu.callbacks.callback import CallbackDict
from fastgen_tpu.data.prefetch import Prefetcher
from fastgen_tpu.data.preprocess import preprocess_data
from fastgen_tpu.parallel import mesh as mesh_lib
from fastgen_tpu.parallel import sp as sp_lib
from fastgen_tpu.utils import instantiate
from fastgen_tpu.utils import logging_utils as logger
from fastgen_tpu.utils.autoresume import FileAutoResume
from fastgen_tpu.utils.checkpointer import Checkpointer
from fastgen_tpu.utils.global_vars import set_global_vars, temporary_global_vars


class Trainer:
    def __init__(self, config, autoresume=None):
        self.config = config
        os.makedirs(config.log_config.save_path, exist_ok=True)
        self.callbacks = CallbackDict(config, self)
        ckpt_cfg = config.trainer.checkpointer
        save_dir = ckpt_cfg.save_dir
        if ckpt_cfg.use_s3:
            # ref ``checkpointer.py:99-141``: checkpoints live under
            # <s3_container>/<save_dir> with credentials from s3_credential
            save_dir = os.path.join(ckpt_cfg.s3_container, ckpt_cfg.save_dir)
        elif not os.path.isabs(save_dir):
            save_dir = os.path.join(config.log_config.save_path, save_dir)
        self.checkpointer = Checkpointer(
            save_dir, max_to_keep=ckpt_cfg.max_to_keep,
            async_save=ckpt_cfg.async_save,
            s3_credential_path=ckpt_cfg.s3_credential or None)
        # FileAutoResume by default: touching the sentinel (default
        # /tmp/fastgen_terminate, env FASTGEN_TERMINATE_SENTINEL) makes the
        # run save a checkpoint and exit cleanly — the preemption contract
        # the reference implements via its cluster's AutoResume lib
        self.autoresume = autoresume or FileAutoResume()
        self.autoresume.init()
        self.mesh = mesh_lib.mesh_from_trainer_config(config.trainer)
        jax.config.update("jax_default_matmul_precision",
                          config.trainer.matmul.matmul_precision)
        set_global_vars(config.trainer.global_vars)
        # tp>1 routes attention through the XLA (GSPMD-partitionable) path
        set_global_vars({"mesh_tp": int(self.mesh.shape.get("tp", 1))})
        # sp>1: networks pin their token axis via parallel.sp.shard_seq
        sp_lib.set_active_mesh(self.mesh)
        # ADA augmentation pipe (ref trainer passes it into preprocess;
        # ``datasets/augment.py`` aug labels feed condition["aug_condition"])
        self.augment_pipe = (instantiate(config.trainer.augment_pipe)
                             if config.trainer.augment_pipe is not None else None)
        logger.info(f"Mesh: {dict(self.mesh.shape)} over {len(jax.devices())} devices")

    # ------------------------------------------------------------------ setup
    def _grad_accum_rounds(self, batch_size_per_process: int) -> int:
        """Global-batch -> accumulation math (ref ``utils/scripts.py:95-108``)."""
        cfg = self.config.trainer
        if cfg.batch_size_global is None:
            return cfg.grad_accum_rounds
        world = mesh_lib.process_count()
        denom = batch_size_per_process * world
        assert cfg.batch_size_global % denom == 0, (
            f"batch_size_global={cfg.batch_size_global} not divisible by "
            f"{batch_size_per_process}x{world}")
        rounds = cfg.batch_size_global // denom
        logger.info(f"grad_accum_rounds = {rounds} "
                    f"(global {cfg.batch_size_global} / per-process {batch_size_per_process} / world {world})")
        return rounds

    # -------------------------------------------------------------------- run
    def run(self, model) -> None:
        cfg = self.config.trainer
        cb = self.callbacks
        self._sync_every = int(os.environ.get("FASTGEN_SYNC_EVERY_ITER", "0"))
        cb.on_app_begin()

        cb.on_optimizer_init_start(model)
        # wire GradClipCallback specs into the optimizer chains before they
        # are built (ref applies the clip in on_optimizer_step_begin; here it
        # composes into the jitted apply step — see base._finalize_optimizers)
        from fastgen_tpu.callbacks.basic import GradClipCallback

        for cb_obj in cb.callbacks.values():
            if isinstance(cb_obj, GradClipCallback) and cb_obj.clip_norm is not None:
                model.grad_clip[cb_obj.model_key] = cb_obj.clip_spec()
        model.init_optimizers()
        cb.on_optimizer_init_end(model)

        # state init + sharding (meta-init equivalent)
        rng = jax.random.PRNGKey(cfg.seed)
        cb.on_model_init_start(model)
        with jax.default_device(jax.local_devices()[0]):
            state = model.init_state(rng)
        state, self.state_shardings = mesh_lib.shard_state(state, self.mesh,
                                                           fsdp=cfg.fsdp)
        cb.on_model_init_end(model)

        # warm-start nets from another run's checkpoint with key remapping
        # (ref ``trainer.py:233-261`` load_pretrained_ckpt)
        if getattr(cfg.checkpointer, "pretrained_ckpt_path", ""):
            state = self._load_pretrained_ckpt(model, state)

        # resume
        cb.on_load_checkpoint_start(model)
        iter_start = 0
        if cfg.resume:
            restored, meta, step = self.checkpointer.load(
                model.prune_for_checkpoint(state))
            if restored is not None:
                restored = model.restore_frozen(restored, state)
                state = jax.device_put(restored, self.state_shardings)
                iter_start = int(step)
                if meta and "callbacks" in meta:
                    cb.load_state_dict(meta["callbacks"])
        cb.on_load_checkpoint_end(model, iteration=iter_start)

        # compiled step programs, one per phase
        train_steps = {p: jax.jit(model.make_train_step(p), donate_argnums=0)
                       for p in model.phases}
        grad_steps = {p: jax.jit(model.make_grad_step(p)) for p in model.phases}
        apply_steps = {p: jax.jit(model.make_apply_step(p), donate_argnums=0)
                       for p in model.phases}
        # phase-independent: one compiled program serves every phase
        merge_var_step = jax.jit(model.make_merge_variables_step(),
                                 donate_argnums=0)

        # dataloaders; exact sample-index resume (ref ``trainer.py:156-163``)
        cb.on_dataloader_init_start(model, iteration=iter_start)
        loader_cfg = self.config.dataloader_train
        if isinstance(loader_cfg, dict):
            batch_size = loader_cfg.get("batch_size", 1)
        else:
            batch_size = getattr(loader_cfg, "batch_size", 1)
        accum = self._grad_accum_rounds(batch_size)
        sampler_start_idx = iter_start * batch_size * accum * mesh_lib.process_count()
        loader = instantiate(loader_cfg, sampler_start_idx=sampler_start_idx)
        train_iter = iter(loader)
        # held-out validation loader (ref ``trainer.py:166-169`` instantiates
        # it beside the train loader; ``validate`` iterates it for val loss)
        val_loader_cfg = self.config.dataloader_val
        self._val_loader = (instantiate(val_loader_cfg)
                            if val_loader_cfg is not None else None)
        self._eval_steps = (
            {p: jax.jit(model.make_eval_step(p)) for p in model.phases}
            if self._val_loader is not None else {})
        cb.on_dataloader_init_end(model, iteration=iter_start)

        cb.on_train_begin(model, state=state, iteration=iter_start)
        logger.info(f"Starting training loop at iteration {iter_start + 1} "
                    f"(max {cfg.max_iter})")

        base_key = jax.random.PRNGKey(cfg.seed)

        # background prefetch: fetch -> preprocess -> H2D runs a fixed number
        # of batches ahead in a producer thread so the data path overlaps
        # device compute. Key order is EXACTLY the sequential loop's —
        # data-pipeline keys live in a disjoint fold_in domain (1<<20 + a)
        # from the train-step keys (a) so augment/VAE noise never correlates
        # with the step's noise/timestep draws.
        def _batch_stream():
            for it_ in range(iter_start + 1, cfg.max_iter + 1):
                sk = jax.random.fold_in(base_key, it_)
                for a in range(accum):
                    yield self._fetch_batch(
                        model, train_iter,
                        jax.random.fold_in(sk, (1 << 20) + a))

        depth = getattr(cfg, "prefetch_batches", 2)
        batches = Prefetcher(_batch_stream(), depth=depth) if depth else None

        def _next_batch(step_key, a):
            if batches is not None:
                return batches.get()
            return self._fetch_batch(
                model, train_iter, jax.random.fold_in(step_key, (1 << 20) + a))

        loss_map_host: Dict[str, Any] = {}
        outputs = None
        # resumed at/past max_iter -> loop body never runs; keep hooks valid
        iteration = iter_start
        last_saved = iter_start
        try:
            for iteration in range(iter_start + 1, cfg.max_iter + 1):
                cb.on_training_step_begin(model, state=state, iteration=iteration)
                phase = model.phase_for_iteration(iteration)
                step_key = jax.random.fold_in(base_key, iteration)

                _dbg = os.environ.get("FASTGEN_TRAINER_DEBUG")
                if _dbg:
                    print(f"[dbg] iter {iteration} phase {phase} accum {accum}", flush=True)
                if accum == 1:
                    batch = _next_batch(step_key, 0)
                    cb.on_training_accum_step_begin(model, state=state, iteration=iteration)
                    state, loss_map, outputs = train_steps[phase](state, batch, step_key)
                else:
                    grads_sum = None
                    for a in range(accum):
                        if _dbg:
                            print(f"[dbg] fetch batch round {a}", flush=True)
                        batch = _next_batch(step_key, a)
                        if _dbg:
                            print(f"[dbg] got batch round {a}", flush=True)
                        cb.on_training_accum_step_begin(model, state=state,
                                                        iteration=iteration)
                        akey = jax.random.fold_in(step_key, a)
                        grads, loss_map, outputs = grad_steps[phase](state, batch, akey)
                        if _dbg:
                            print(f"[dbg] grad step done round {a}", flush=True)
                        # apply non-trainable variable updates (e.g. f-distill
                        # ratio bins) every microbatch, matching the reference's
                        # per-round buffer updates (``f_distill.py:72-98``)
                        var_updates = (outputs.pop("_variable_updates", None)
                                       if isinstance(outputs, dict) else None)
                        if var_updates:
                            state = merge_var_step(state, var_updates)
                        grads_sum = grads if grads_sum is None else jax.tree_util.tree_map(
                            jnp.add, grads_sum, grads)
                    grads_sum = jax.tree_util.tree_map(lambda g: g / accum, grads_sum)
                    cb.on_optimizer_step_begin(model, state=state, iteration=iteration)
                    state = apply_steps[phase](state, grads_sum, None)
                    if _dbg:
                        print(f"[dbg] apply done", flush=True)

                # host-side scalars for logging (async fetch; blocks rarely)
                loss_map_host = {k: v for k, v in loss_map.items()}
                if self._sync_every:
                    # opt-in per-step device sync (FASTGEN_SYNC_EVERY_ITER=N,
                    # sync when iteration % N == 0). Bounds the async dispatch
                    # queue: through the axon TPU tunnel, a deep queue right
                    # after process start correlates with the relay dropping
                    # the client ("grant unclaimed past timeout"), leaving the
                    # next device_get blocked forever (quality/v7b logs,
                    # 2026-08-21). At ~250 ms/step one extra round trip per
                    # step costs <2%; perf benches leave this unset.
                    if iteration % self._sync_every == 0:
                        jax.block_until_ready(loss_map_host)
                cb.on_training_step_end(model, state=state, data_batch=None,
                                        loss_map=loss_map_host, outputs=outputs,
                                        iteration=iteration)

                if cfg.validation_iter and iteration % cfg.validation_iter == 0:
                    self.validate(model, state, iteration)

                if cfg.save_ckpt_iter and iteration % cfg.save_ckpt_iter == 0:
                    self.save_checkpoint(model, state, iteration)
                    last_saved = iteration

                if self.autoresume.termination_requested():
                    logger.info("Termination requested; saving and exiting")
                    self.save_checkpoint(model, state, iteration)
                    last_saved = iteration
                    self.checkpointer.wait()
                    self.autoresume.request_resume()
                    break
        finally:
            if batches is not None:
                batches.stop()

        if os.environ.get("FASTGEN_TRAINER_DEBUG"):
            print("[dbg] loop done", flush=True)
        # final-iteration checkpoint: max_iter off the save cadence must still
        # persist (the reference checkpoints on trainer exit, ``trainer.py:
        # 263-283``; a 15000-iter run saving every 2000 otherwise strands the
        # last 1000 iterations — exactly what the v7b teacher hit)
        if cfg.save_ckpt_iter and iteration > last_saved:
            self.save_checkpoint(model, state, iteration)
        cb.on_train_end(model, state=state, iteration=iteration)
        self.checkpointer.wait()
        cb.on_app_end(model, iteration=iteration)
        if os.environ.get("FASTGEN_TRAINER_DEBUG"):
            print("[dbg] run() returning", flush=True)

    # ---------------------------------------------------------------- batch
    def _fetch_batch(self, model, train_iter, rng):
        """next(loader) -> preprocess (VAE/text/image encode,
        ref ``trainer.py:374-476``) -> shard onto the mesh."""
        batch = next(train_iter)
        if getattr(self.config.model, "enable_preprocessors", True):
            batch = preprocess_data(model, batch, augment_pipe=self.augment_pipe,
                                    rng=rng)
        # raw pixels/prompts are host-side context, not step inputs
        batch = {k: v for k, v in batch.items() if not k.endswith("_raw")}
        return mesh_lib.shard_batch(batch, self.mesh)

    # ------------------------------------------------------------ validation
    def validate(self, model, state, iteration: int) -> None:
        """Generate student samples (+ optionally teacher) for visual/metric
        hooks, once per global-vars validation variant
        (ref ``trainer.py:341-372``)."""
        for idx, variant in enumerate(self.config.trainer.global_vars_val or [None]):
            with temporary_global_vars(variant):
                self._validate_once(model, state, iteration, idx)

    def _eval_val_loss(self, model, state, iteration: int):
        """Run the grad-free eval step over held-out batches and return
        (mean val loss_map, last preprocessed val batch). Mirrors the
        reference's per-batch ``single_train_step`` loop over
        ``dataloader_val`` (ref ``trainer.py:357-370``), bounded by the
        MAX_VAL_STEPS global var / ``trainer.max_val_steps``."""
        from fastgen_tpu.utils.global_vars import get_global_var

        cfg = self.config.trainer
        max_steps = get_global_var("MAX_VAL_STEPS", None)
        if max_steps is None:
            max_steps = getattr(cfg, "max_val_steps", 2)
        val_key = jax.random.PRNGKey(cfg.val_seed or cfg.seed)
        # fresh iterator per validation: the samplers are seeded with
        # start_idx 0, so every validation scores the SAME deterministic
        # held-out prefix (comparable across iterations)
        val_iter = iter(self._val_loader)
        sums: Dict[str, Any] = {}
        count = 0
        last_batch = None
        multi_phase = len(model.phases) > 1
        for step in range(int(max_steps)):
            bkey = jax.random.fold_in(val_key, step)
            batch = next(val_iter)
            if getattr(self.config.model, "enable_preprocessors", True):
                # no augmentation on held-out data (the reference's validate
                # calls preprocess_data without an augment pipe)
                batch = preprocess_data(model, batch, augment_pipe=None,
                                        rng=jax.random.fold_in(bkey, 1 << 20))
            batch = {k: v for k, v in batch.items() if not k.endswith("_raw")}
            batch = mesh_lib.shard_batch(batch, self.mesh)
            last_batch = batch
            for pi, phase in enumerate(model.phases):
                lm = self._eval_steps[phase](state, batch,
                                             jax.random.fold_in(bkey, pi))
                for k, v in lm.items():
                    name = f"{phase}/{k}" if multi_phase else k
                    sums[name] = v if name not in sums else sums[name] + v
            count += 1
        host = jax.device_get(sums)
        loss_map = {}
        for k, v in host.items():
            v = np.asarray(v)
            if v.ndim == 0:
                loss_map[k] = float(v) / max(count, 1)
        return loss_map, last_batch

    def _validate_once(self, model, state, iteration: int, idx: int = 0) -> None:
        cb = self.callbacks
        cb.on_validation_begin(model, state=state, iteration=iteration, idx=idx)
        try:
            # held-out loss over dataloader_val (ref ``trainer.py:341-372``)
            val_loss_map, val_batch = (
                self._eval_val_loss(model, state, iteration)
                if getattr(self, "_val_loader", None) is not None
                else (None, None))
            sample_key = jax.random.PRNGKey(self.config.trainer.val_seed
                                            or self.config.trainer.seed)
            n = min(16, 8 * max(1, len(jax.devices())))
            noise = jax.random.normal(sample_key, (n,) + model.input_shape,
                                      model.precision)
            cond = model.example_condition(n)
            # real held-out conditions feed the sample grid when available
            # (the reference visualizes generations for the val batch's
            # conditions, not synthetic ones)
            if val_batch is not None and val_batch.get("condition") is not None:
                real_cond = jax.tree_util.tree_map(lambda x: x[:n],
                                                   val_batch["condition"])
                sizes = {x.shape[0]
                         for x in jax.tree_util.tree_leaves(real_cond)}
                if sizes and min(sizes) >= n:
                    cond = real_cond
            params_net = self._ema_or_net_params(model, state)
            gen = model.generator_fn(
                params_net, noise, rng=sample_key, condition=cond,
                student_sample_steps=self.config.model.student_sample_steps,
                t_list=self.config.model.sample_t_cfg.t_list,
                student_sample_type=self.config.model.student_sample_type)
            outputs = {"gen_rand": np.asarray(gen), "input_rand": np.asarray(noise)}
            cb.on_validation_step_end(model, state=state, outputs=outputs,
                                      loss_map=val_loss_map,
                                      iteration=iteration, idx=idx)
        except Exception as e:
            # the reference does not catch validation failures; keep a lenient
            # opt-out for exploratory runs (strict_validation=False)
            if getattr(self.config.trainer, "strict_validation", True):
                raise
            logger.warning(f"validation sampling failed: {e}")
        cb.on_validation_end(model, state=state, iteration=iteration, idx=idx)

    def _ema_or_net_params(self, model, state):
        choice = getattr(self.config.trainer, "validation_ema", None)
        if choice == "net":
            return state.params["net"]
        if choice is not None:
            if choice not in state.ema:
                raise KeyError(f"validation_ema={choice!r} not in EMA set "
                               f"{sorted(state.ema)}")
            return state.ema[choice]
        if state.ema:
            first = sorted(state.ema.keys())[0]
            return state.ema[first]
        return state.params["net"]

    # ------------------------------------------------------------ checkpoint
    def _load_pretrained_ckpt(self, model, state):
        """Warm-start selected nets from a previous run's Orbax checkpoint,
        remapping checkpoint net keys onto this model's keys (ref
        ``trainer.py:233-261``: ``pretrained_ckpt_key_map`` = {model_key:
        ckpt_key}, e.g. seeding DMD2's fake_score from an SFT run's net)."""
        from fastgen_tpu.utils.checkpointer import raw_restore, tolerant_merge

        ck_cfg = self.config.trainer.checkpointer
        raw_state, step = raw_restore(ck_cfg.pretrained_ckpt_path)
        raw_params = raw_state.get("params", {})
        params = dict(state.params)
        for k_model, k_ckpt in (ck_cfg.pretrained_ckpt_key_map or {}).items():
            if k_model not in params:
                logger.warning(f"model has no net {k_model!r}; skipping "
                               f"pretrained key {k_ckpt!r}")
                continue
            if k_ckpt not in raw_params:
                logger.warning(f"pretrained ckpt has no net {k_ckpt!r}; "
                               f"skipping {k_model!r}")
                continue
            params[k_model] = tolerant_merge(params[k_model],
                                             raw_params[k_ckpt],
                                             f"pretrained/{k_model}")
            logger.info(f"Warm-started {k_model!r} from {k_ckpt!r} in "
                        f"{ck_cfg.pretrained_ckpt_path}@{step}")
        state = state.replace(params=params)
        return jax.device_put(state, self.state_shardings)

    def save_checkpoint(self, model, state, iteration: int) -> None:
        cb = self.callbacks
        cb.on_save_checkpoint_start(model, iteration=iteration)
        # frozen nets (teacher/cm_teacher) are not persisted (ref model_dict)
        self.checkpointer.save(iteration, model.prune_for_checkpoint(state),
                               metadata={"callbacks": cb.state_dict()})
        self._save_param_snapshot(model, state, iteration)
        cb.on_save_checkpoint_success(model, iteration=iteration,
                                      path=self.checkpointer.save_dir)
        cb.on_save_checkpoint_end(model, iteration=iteration)

    def _save_param_snapshot(self, model, state, iteration: int) -> None:
        """Pack the EMA (or net) params into a committable single-file npz at
        every save cadence (``trainer.snapshot_dir``). Written synchronously
        from the in-memory state — unlike a post-stage export, a session kill
        mid-stage still leaves every completed cadence's snapshot on disk."""
        snap_dir = getattr(self.config.trainer, "snapshot_dir", None)
        if not snap_dir:
            return
        from fastgen_tpu.utils.checkpointer import save_net_params_npz

        params = self._ema_or_net_params(model, state)
        path = os.path.join(
            snap_dir, f"{self.config.log_config.name}_{iteration:06d}.npz")
        save_net_params_npz(
            jax.device_get(params), path,
            dtype=getattr(self.config.trainer, "snapshot_dtype", "bfloat16"))
