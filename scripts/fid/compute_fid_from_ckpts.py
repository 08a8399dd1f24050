"""Checkpoint-sweep FID (ref ``scripts/fid/compute_fid_from_ckpts.py``).

For each checkpoint step in the run's save dir: generate N samples with the
few-step student (rank-strided over jax processes, ref ``:88-93``), compute
inception stats, FID against the reference npz, write ``fid.json``::

    python scripts/fid/compute_fid_from_ckpts.py --config=<config.py> \
        --ref=<fid-refs/cifar10-32x32.npz> [--num_samples=50000] [--batch=256] \
        [--detector=auto|inception_torch|random_proj] [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from scripts.fid import fid as fid_lib  # noqa: E402
from scripts.inference.inference_utils import init_model, select_params  # noqa: E402


def parse_args():
    argv = sys.argv[1:]
    overrides = []
    if "-" in argv:
        idx = argv.index("-")
        overrides = argv[idx + 1:]
        argv = argv[:idx]
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ref", required=True, help="reference stats npz (mu, sigma)")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--num_samples", type=int, default=None,
                   help="default: config.eval.num_samples (50k protocol)")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--min_ckpt", type=int, default=None,
                   help="default: config.eval.min_ckpt")
    p.add_argument("--max_ckpt", type=int, default=None,
                   help="default: config.eval.max_ckpt")
    p.add_argument("--detector", default="auto")
    p.add_argument("--detector_path", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--sampler", choices=["student", "teacher"],
                   default="student",
                   help="student: few-step generator_fn (the distillation "
                        "protocol); teacher: the net's own multi-step sampler "
                        "(--steps, default 35) — the upper-bound row")
    p.add_argument("--npz", default=None,
                   help="glob of committed param-snapshot npz files "
                        "(save_net_params_npz) to score instead of an Orbax "
                        "run dir — the step label is the trailing _<iter> of "
                        "each filename. Lets FID rows be recovered after the "
                        "untracked Orbax output root dies with its session "
                        "(QUALITY.md v8b).")
    p.add_argument("--out", default=None,
                   help="fid.json output path (default: <ckpt save dir>/"
                        "fid.json; required sidestep when --npz snapshots "
                        "have no run dir)")
    return p.parse_args(argv), overrides


def main():
    args, overrides = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fastgen_tpu.configs.config_utils import (
        import_config_from_python_file, override_config_with_opts)
    from fastgen_tpu.utils.checkpointer import Checkpointer

    if not os.path.exists(args.ref):
        raise SystemExit(f"--ref stats npz not found: {args.ref} — run "
                         "scripts/fid/compute_dataset_ref_stats.py first "
                         "(validated up front so a missing ref cannot waste "
                         "the whole sampling budget)")
    config = import_config_from_python_file(args.config)
    override_config_with_opts(config, overrides)
    # the eval protocol block is the config-side default (ref config.eval,
    # ``configs/config.py:49-59``)
    if args.num_samples is None:
        args.num_samples = config.eval.num_samples
    if args.min_ckpt is None:
        args.min_ckpt = config.eval.min_ckpt
    if args.max_ckpt is None:
        args.max_ckpt = config.eval.max_ckpt
    model = init_model(config)
    if args.npz:
        # committed single-file snapshots: each IS the (EMA) net variable
        # tree, so no state template / Orbax manager is involved at all
        import glob
        import re

        ckpt, state_template = None, None
        npz_by_step = {}
        for path in glob.glob(args.npz):
            m = re.search(r"_(\d+)\.npz$", os.path.basename(path))
            if m and args.min_ckpt <= int(m.group(1)) <= args.max_ckpt:
                npz_by_step[int(m.group(1))] = path
        steps_avail = sorted(npz_by_step)
        save_dir = os.path.dirname(args.out) if args.out else "."
        if not steps_avail:
            raise FileNotFoundError(f"No snapshots match {args.npz}")
    else:
        # checkpoints exclude frozen nets (teacher/cm_teacher) — prune the
        # template. load_pretrained=False: a full checkpoint restore follows,
        # so the training-time pretrained teacher path must not be required
        # here.
        state_template = model.prune_for_checkpoint(
            model.init_state(jax.random.PRNGKey(config.trainer.seed),
                             load_pretrained=False))

        save_dir = args.ckpt_dir or os.path.join(
            config.log_config.save_path, config.trainer.checkpointer.save_dir)
        ckpt = Checkpointer(save_dir, async_save=False)
        steps_avail = sorted(s for s in (ckpt.manager.all_steps() or [])
                             if args.min_ckpt <= s <= args.max_ckpt)
        if not steps_avail:
            raise FileNotFoundError(f"No checkpoints in {save_dir}")

    detector = fid_lib.get_detector(args.detector, args.detector_path)
    print(f"Detector: {type(detector).__name__} (dim {detector.feature_dim})")
    sample_steps = args.steps or config.model.student_sample_steps
    label_dim = getattr(model.net, "label_dim", 0)

    rank = jax.process_index()
    world = jax.process_count()
    results = {}
    with np.load(args.ref) as ref:
        mu_ref, sigma_ref = ref["mu"], ref["sigma"]
    for step in steps_avail:
        if args.npz:
            from fastgen_tpu.utils.checkpointer import load_net_params_npz

            variables = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, model.precision),
                load_net_params_npz(npz_by_step[step]))
            params_net = jax.device_put(variables)
        else:
            state, _, _ = ckpt.load(state_template, step=step)
            # Orbax restores host numpy arrays; device_put + passing params
            # as an EXPLICIT jit argument keeps them out of the lowered HLO —
            # closed-over numpy leaves are inlined as literal constants, which
            # blows the compile RPC past the TPU tunnel's request-size limit
            # (HTTP 413).
            params_net = jax.device_put(select_params(model, state))

        def gen_batch(params_net, key):
            noise = jax.random.normal(
                key, (args.batch,) + tuple(config.model.input_shape), model.precision)
            cond = None
            if label_dim:
                ids = jax.random.randint(jax.random.fold_in(key, 1), (args.batch,),
                                         0, label_dim)
                cond = jax.nn.one_hot(ids, label_dim, dtype=model.precision)
            if args.sampler == "teacher":
                # the net's own multi-step sampler (EDM Euler / dpm2m), the
                # teacher-quality upper bound for the distilled student
                imgs = model.net.apply(params_net, noise, condition=cond,
                                       num_steps=args.steps or 35,
                                       method=model.net.sample)
            else:
                imgs = model.generator_fn(params_net, noise, rng=key,
                                          condition=cond,
                                          student_sample_steps=sample_steps,
                                          t_list=config.model.sample_t_cfg.t_list)
            return jnp.clip((imgs.astype(jnp.float32) + 1) * 127.5,
                            0, 255).astype(jnp.uint8)

        n_batches = (args.num_samples + args.batch - 1) // args.batch
        if hasattr(detector, "stats_fns"):
            # fused sample->detector->stats device step with a donated
            # accumulator carry: the host loop enqueues one async dispatch
            # per batch and synchronizes once at finalize. Through the TPU
            # tunnel the old generate->host->detector->host round trips cost
            # seconds per batch (quality/v4_pipeline.log timeouts).
            init_acc, _, finalize = detector.stats_fns()

            @functools.partial(jax.jit, donate_argnums=0)
            def fid_step(acc, params_net, key):
                feats = detector._fwd(gen_batch(params_net, key)).astype(jnp.float32)
                return {"n": acc["n"] + feats.shape[0],
                        "mu": acc["mu"] + feats.sum(axis=0),
                        "sigma": acc["sigma"] + feats.T @ feats}

            acc = init_acc()
            t0 = time.time()
            for bi in range(rank, n_batches, world):
                acc = fid_step(acc, params_net, jax.random.fold_in(
                    jax.random.PRNGKey(args.seed), bi))
                if bi == rank:  # first dispatch includes the compile
                    jax.block_until_ready(acc["n"])
                    print(f"first batch (incl. compile): {time.time()-t0:.1f}s",
                          flush=True)
                elif (bi // world) % 32 == 0:
                    # device-progress heartbeat (a print alone would only
                    # show host dispatch): the stall supervisor kills
                    # silent stages, and one sync per 32 batches is noise
                    jax.block_until_ready(acc["n"])
                    print(f"[fid] batch {bi}/{n_batches} "
                          f"({time.time()-t0:.0f}s)", flush=True)
            mu_sum, sigma_sum, n = finalize(acc)
            if world > 1:
                from jax.experimental import multihost_utils

                stacked = np.concatenate(
                    [mu_sum, sigma_sum.reshape(-1), [float(n)]])
                reduced = np.asarray(
                    multihost_utils.process_allgather(stacked)).sum(0)
                dim = detector.feature_dim
                mu_sum, sigma_sum = reduced[:dim], reduced[dim:-1].reshape(dim, dim)
                n = int(reduced[-1])
            mu = mu_sum / n
            sigma = (sigma_sum - n * np.outer(mu, mu)) / max(n - 1, 1)
            score = fid_lib.calculate_fid_from_inception_stats(
                mu, sigma, mu_ref, sigma_ref)
            print(f"stats over {n} samples in {time.time()-t0:.1f}s", flush=True)
        else:
            gen_jit = jax.jit(gen_batch)

            def sample_iter():
                # rank-strided: each process generates a disjoint seed range
                for bi in range(rank, n_batches, world):
                    key = jax.random.fold_in(jax.random.PRNGKey(args.seed), bi)
                    yield np.asarray(gen_jit(params_net, key))

            score = fid_lib.calc(sample_iter(), args.ref, detector=detector,
                                 max_samples=args.num_samples // world)
        results[str(step)] = score
        print(f"ckpt {step}: FID = {score:.4f}", flush=True)
        if rank == 0:
            # rewrite after EVERY checkpoint so a timeout mid-sweep keeps
            # all completed rows (a 90-min sweep used to lose everything)
            _write_results(args, config, results, save_dir, sample_steps,
                           detector)

    if rank == 0:
        print(f"Wrote {args.out or os.path.join(save_dir, 'fid.json')}")


def _write_results(args, config, results, save_dir, sample_steps, detector):
        out_path = args.out or os.path.join(save_dir, "fid.json")
        # self-describing artifact: a later reader can audit every row
        # without the run log (ref fid.json is keyed by full config,
        # ``/root/reference/scripts/fid/compute_fid_from_ckpts.py:66-253``)
        payload = dict(results)
        payload["protocol"] = {
            "config": args.config,
            "run_name": config.log_config.name,
            "sampler": args.sampler,
            "sample_steps": (args.steps or 35) if args.sampler == "teacher"
                            else sample_steps,
            "num_samples": args.num_samples,
            "batch": args.batch,
            "seed": args.seed,
            "detector": type(detector).__name__,
            "detector_path": args.detector_path,
            "feature_dim": int(detector.feature_dim),
            "ref_stats": args.ref,
        }
        if args.npz:
            payload["protocol"]["source"] = f"npz:{args.npz}"
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"Wrote {out_path}")


if __name__ == "__main__":
    main()
