"""Precompute teacher denoising trajectories for KD / CausalKD training.

The KD methods (``fastgen_tpu/methods/knowledge_distillation/kd.py``; ref
``fastgen/methods/knowledge_distillation/KD.py``) regress the student onto
*precomputed* teacher trajectories delivered by the Pair/Path WDS loaders
(``configs/data.py`` ``Pair_Loader_Config`` / ``Path_Loader_Config``). The
reference documents that data contract but ships no generator; this script
produces the shards from any trained teacher checkpoint:

    python scripts/generate_kd_paths.py --config=<teacher config.py> \
        [--ckpt_dir=...] [--num_samples=50000] [--steps=8] \
        [--guidance_scale=...] [--classes=N | --prompt_file=...] \
        --out=DATA/kd-paths [--shard_size=1000] [--cpu]

Each tar shard holds per-sample members (WDS layout, key-grouped):
    {i:08d}.latent.npy   final teacher output x0            -> "real"
    {i:08d}.path.npy     [S, ...] states at the t_list grid -> "path"
    {i:08d}.noise.npy    the initial noise (= path[0])      -> "noise" (pair)
    {i:08d}.txt_emb.npy  the conditioning array             -> "condition"

The trajectory is the deterministic DDIM walk on the teacher's own noise
schedule: at each t in ``get_t_list(steps)`` the state is recorded, the
teacher predicts x0 (with optional CFG), and the state is re-noised to the
next t via the pred-type algebra (``x0_to_eps`` + ``forward_process``) —
the same update ``FastGenModel._student_sample_loop`` uses. ``path[:, i]``
therefore aligns with ``sample_t_cfg.t_list`` exactly as ``KDModel``'s
``sample_from_t_list`` gather expects.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.inference.inference_utils import (  # noqa: E402
    init_model, load_prompt_file, load_state, select_params)


def parse_args():
    argv = sys.argv[1:]
    overrides = []
    if "-" in argv:
        idx = argv.index("-")
        overrides = argv[idx + 1:]
        argv = argv[:idx]
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--out", required=True, help="output shard directory")
    p.add_argument("--num_samples", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--shard_size", type=int, default=1000,
                   help="samples per .tar shard")
    p.add_argument("--steps", type=int, default=8,
                   help="trajectory length S (path.npy rows); must be a "
                        "multiple of the student's sample steps")
    p.add_argument("--guidance_scale", type=float, default=None)
    p.add_argument("--classes", type=int, default=None,
                   help="number of classes for uniform class conditioning")
    p.add_argument("--prompt_file", default=None,
                   help="text prompts cycled over the dataset")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_ema", action="store_true", default=False,
                   help="sample the EMA weights instead of the raw teacher")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv), overrides


def make_rollout(net, params, t_list, guidance_scale: float = 0.0):
    """Jitted ``noise -> (final x0, path [B, S, ...])`` teacher rollout.

    ``t_list`` must be ``ns.get_t_list(S)`` (S+1 entries ending at t=0); the
    path records the state at each of the S *non-terminal* entries (KDModel's
    gather requires ``path.shape[1] % student_sample_steps == 0`` and
    ``sample_from_t_list`` never draws the terminal t)."""
    import jax
    import jax.numpy as jnp

    ns = net.noise_scheduler
    g = guidance_scale

    def x0_pred(x, t, cond, neg):
        pred = net.apply(params, x, t, condition=cond, fwd_pred_type="x0")
        if g and g > 1.0 and neg is not None:
            uncond = net.apply(params, x, t, condition=neg,
                               fwd_pred_type="x0")
            pred = uncond + g * (pred - uncond)
        return pred

    @jax.jit
    def rollout(noise, cond, neg):
        x = noise
        states = []
        x0 = x
        for i, t in enumerate(t_list[:-1]):
            tv = jnp.full((x.shape[0],), float(t), jnp.float32)
            states.append(x)
            x0 = x0_pred(x, tv, cond, neg)
            t_next = jnp.full((x.shape[0],), float(t_list[i + 1]), jnp.float32)
            eps = ns.x0_to_eps(x, x0, tv)
            x = ns.forward_process(x0, eps, t_next)
        return x0, jnp.stack(states, axis=1)

    return rollout


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

    config = import_config_from_python_file(args.config)
    override_config_with_opts(config, overrides)

    model = init_model(config)
    state, found_step = load_state(config, model, args.ckpt_dir, args.step)
    print(f"Loaded checkpoint step {found_step}")

    # teacher params: dedicated teacher net if the method carries one,
    # else the trained net (optionally its EMA)
    if "teacher" in state.params:
        net, params = model.nets["teacher"], state.params["teacher"]
    else:
        net = model.net
        params = select_params(model, state, use_ema=args.use_ema)

    ns = net.noise_scheduler
    t_list = np.asarray(ns.get_t_list(args.steps), np.float32)
    g = args.guidance_scale if args.guidance_scale is not None else \
        (getattr(config.model, "guidance_scale", None) or 0.0)
    rollout = make_rollout(net, params, t_list, g)

    label_dim = getattr(net, "label_dim", 0)
    prompts = load_prompt_file(args.prompt_file) if args.prompt_file else None
    if prompts is not None and model.text_encoder is None:
        raise SystemExit("--prompt_file requires model.text_encoder")

    from fastgen_tpu.data.wds import ShardWriter

    key = jax.random.PRNGKey(args.seed)
    shape = tuple(config.model.input_shape)
    written = 0
    input_dtype = getattr(model, "precision", jnp.float32)

    with ShardWriter(args.out, shard_size=args.shard_size) as writer:
        while written < args.num_samples:
            n = min(args.batch_size, args.num_samples - written)
            key, kn, kc = jax.random.split(key, 3)
            noise = ns.latents(jax.random.normal(kn, (n,) + shape, input_dtype))
            neg = None
            if prompts is not None:
                batch_prompts = [prompts[(written + j) % len(prompts)]
                                 for j in range(n)]
                cond = model.text_encoder.encode(batch_prompts,
                                                 precision=input_dtype)
                neg = model.text_encoder.encode([""] * n, precision=input_dtype)
            elif args.classes or label_dim:
                ncls = args.classes or label_dim
                ids = jax.random.randint(kc, (n,), 0, ncls)
                cond = jax.nn.one_hot(ids, label_dim or ncls, dtype=input_dtype)
                neg = jnp.zeros_like(cond)
            else:
                cond = None

            x0, path = jax.device_get(rollout(noise, cond, neg))
            # text encoders may return {"text_embeds": ...}; the WDS loader
            # delivers the raw array (nets accept either form)
            cond_arr = cond.get("text_embeds") if isinstance(cond, dict) else cond
            cond_np = np.asarray(cond_arr) if cond_arr is not None else \
                np.zeros((n, 1), np.float32)

            for j in range(n):
                writer.write(f"{written + j:08d}",
                             {"latent.npy": x0[j], "path.npy": path[j],
                              "noise.npy": path[j][0],
                              "txt_emb.npy": cond_np[j]})
            written += n
            print(f"{written}/{args.num_samples}")
    print(f"wrote {written} trajectories ({args.steps} steps) -> {args.out}")


if __name__ == "__main__":
    main()
