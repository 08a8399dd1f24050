"""Image inference CLI (ref ``scripts/inference/image_model_inference.py``).

Generates student few-step samples and/or teacher multi-step samples from a
trained checkpoint::

    python scripts/inference/image_model_inference.py \
        --config=<config.py> [--ckpt_dir=...] [--mode=student|teacher|both] \
        [--num_samples=16] [--classes=0,1,2|<ids.txt>] [--steps=1] \
        [--prompt="..."|--prompt_file=<prompts.txt>] [--guidance_scale=3] \
        [--outdir=samples] [--cpu] [- key=value ...]

Prompt/class list assets ship in ``scripts/inference/prompts/`` (ref CLI
defaults): ``image_prompts.txt``, ``classes.txt``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from scripts.inference.inference_utils import (  # noqa: E402
    init_model, load_prompt_file, load_state, save_image_grid, select_params)


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
    p.add_argument("--mode", default="student", choices=["student", "teacher", "both"])
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--classes", default=None,
                   help="comma-separated class ids, or a file with one id "
                        "per line (ref prompts/classes.txt)")
    p.add_argument("--prompt", default=None,
                   help="text prompt (encoded with the model's text_encoder)")
    p.add_argument("--prompt_file", default=None,
                   help="file with one prompt per line; generates one sample "
                        "per line (ref CLI --prompt_file, e.g. "
                        "scripts/inference/prompts/image_prompts.txt)")
    p.add_argument("--neg_prompt", default="",
                   help="negative prompt for CFG when --prompt is used")
    p.add_argument("--steps", type=int, default=None, help="student sample steps")
    p.add_argument("--teacher_steps", type=int, default=50)
    p.add_argument("--solver", default="euler",
                   choices=["euler", "dpm2m", "heun"],
                   help="teacher ODE solver (dpm2m = UniPC-class multistep; "
                        "heun = EDM-paper 2nd order for EDM/EDM2)")
    p.add_argument("--guidance_scale", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument("--no_ema", dest="use_ema", action="store_false")
    p.add_argument("--outdir", default="samples")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv), overrides


def main():
    args, overrides = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from fastgen_tpu.configs.config_utils import (
        import_config_from_python_file, override_config_with_opts)

    config = import_config_from_python_file(args.config)
    override_config_with_opts(config, overrides)

    model = init_model(config)
    state, found_step = load_state(config, model, args.ckpt_dir, args.step)
    print(f"Loaded checkpoint step {found_step}")

    key = jax.random.PRNGKey(args.seed)
    prompts = None
    if args.prompt_file is not None:
        prompts = load_prompt_file(args.prompt_file)
    elif args.prompt is not None:
        prompts = [args.prompt] * args.num_samples
    n = len(prompts) if prompts is not None else args.num_samples
    noise = jax.random.normal(key, (n,) + tuple(config.model.input_shape),
                              model.precision)

    label_dim = getattr(model.net, "label_dim", 0)
    cond = neg = None
    if prompts is not None:
        if model.text_encoder is None:
            raise SystemExit("--prompt requires model.text_encoder in the config")
        cond = model.text_encoder.encode(prompts, precision=model.precision)
        neg = model.text_encoder.encode([args.neg_prompt] * n,
                                        precision=model.precision)
        if not isinstance(cond, dict):
            cond, neg = {"text_embeds": cond}, {"text_embeds": neg}
    elif label_dim:
        if args.classes:
            if os.path.isfile(args.classes):
                # class-id file, one id per line (ref prompts/classes.txt)
                with open(args.classes) as f:
                    ids = [int(ln) for ln in f if ln.strip()]
            else:
                ids = [int(c) for c in args.classes.split(",")]
            ids = (ids * ((n + len(ids) - 1) // len(ids)))[:n]
        else:
            ids = list(range(n))
        cond = jax.nn.one_hot(jnp.array(ids) % label_dim, label_dim,
                              dtype=model.precision)
        neg = jnp.zeros_like(cond)

    steps = args.steps or config.model.student_sample_steps
    os.makedirs(args.outdir, exist_ok=True)

    def to_pixels(latents):
        """VAE-decode latent-space outputs (ref ``basic_utils.save_media``
        decodes with the net's VAE before writing)."""
        if model.vae is not None:
            return model.vae.decode(latents, precision=model.precision)
        return latents

    if args.mode in ("student", "both"):
        params_net = select_params(model, state, use_ema=args.use_ema)
        gen = model.generator_fn(params_net, noise, rng=key, condition=cond,
                                 student_sample_steps=steps,
                                 t_list=config.model.sample_t_cfg.t_list,
                                 student_sample_type=config.model.student_sample_type)
        path = save_image_grid(to_pixels(gen), os.path.join(
            args.outdir, f"student_step{steps}_grid.png"))
        print(f"Student samples -> {path}")

    if args.mode in ("teacher", "both") and "teacher" in state.params:
        g = args.guidance_scale if args.guidance_scale is not None else \
            config.model.guidance_scale
        teacher = model.nets["teacher"]
        gen = teacher.apply(state.params["teacher"], noise, method=teacher.sample,
                            condition=cond, neg_condition=neg, guidance_scale=g,
                            num_steps=args.teacher_steps, solver=args.solver)
        path = save_image_grid(to_pixels(gen), os.path.join(
            args.outdir, f"teacher_cfg{g}_steps{args.teacher_steps}_grid.png"))
        print(f"Teacher samples -> {path}")


if __name__ == "__main__":
    main()
