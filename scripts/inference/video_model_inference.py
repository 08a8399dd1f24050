"""Video inference CLI (ref ``scripts/inference/video_model_inference.py``).

Student (few-step ``generator_fn``) and teacher (multi-step ``net.sample``
with CFG + skip-layer guidance) generation for every video conditioning mode:

* **T2V** — text only;
* **I2V** — ``--image=<png>`` first-frame conditioning (replicated to the
  pixel clip, VAE-encoded like training; ref ``prepare_wani2v_condition:178``);
* **V2V** — ``--cond_video=<npy|npz|frame-dir>`` VACE control context, run
  through the Depth-Anything annotator when the model carries one
  (ref ``prepare_vacewan_condition:296``);
* **video2world** — ``--cond_video`` first frames + condition mask
  (ref ``prepare_cosmos_v2w_condition:254``);
* multi-segment extrapolation with overlap re-noising (ref
  ``causvid.py:187-397``).

Conditioning media routes through ``preprocess_data`` itself so CLI layouts
match training exactly. Text comes from ``--prompt`` (encoded in-process,
optionally rewritten with ``--prompt_expand``), ``--prompt_file`` (one clip
batch per line — VBench-style sweeps), or ``--text_emb=<npy>``; negative
prompts from ``--neg_prompt`` / ``--neg_prompt_file``. Conditioning media
can likewise be swept with ``--image_file`` / ``--cond_video_file`` path
lists paired positionally with the prompt lines (ref ``--input_image_file``
/ ``--source_video_file``). Latent outputs are VAE-decoded when the model
carries a video VAE::

    python scripts/inference/video_model_inference.py --config=<config.py> \
        [--mode=student|teacher|both] [--prompt="..."] [--image=first.png] \
        [--cond_video=clip.npy] [--steps=2] [--teacher_steps=50] \
        [--guidance_scale=5.0] [--skip_layers=9,10] \
        [--num_segments=1 --overlap_frames=1] [--outdir=videos] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from scripts.inference.inference_utils import (  # noqa: E402
    init_model, load_image_file, load_prompt_file, load_state,
    load_video_frames_file, prepare_video_conditions, save_video_frames,
    select_params, vae_scale_factors)


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
    p.add_argument("--mode", default="student",
                   choices=["student", "teacher", "both"])
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--teacher_steps", type=int, default=50)
    p.add_argument("--solver", default="euler", choices=["euler", "dpm2m"],
                   help="teacher ODE solver (dpm2m = UniPC-class multistep)")
    p.add_argument("--guidance_scale", type=float, default=None)
    p.add_argument("--skip_layers", default=None,
                   help="comma-separated layer ids for skip-layer guidance "
                        "(applied to the unconditional branch)")
    p.add_argument("--skip_layers_start_percent", type=float, default=0.0)
    p.add_argument("--text_emb", default=None, help="npy [L,D] text embedding")
    p.add_argument("--prompt", default=None,
                   help="text prompt (encoded with the model's text_encoder)")
    p.add_argument("--prompt_file", default=None,
                   help="file with one prompt per line; generates one clip "
                        "batch per line (VBench-style sweeps; ref CLI "
                        "--prompt_file, e.g. "
                        "scripts/inference/prompts/validation_video_prompts.txt)")
    p.add_argument("--neg_prompt", default="")
    p.add_argument("--neg_prompt_file", default=None,
                   help="file whose contents replace --neg_prompt (ref "
                        "prompts/negative_prompt.txt)")
    p.add_argument("--prompt_expand", action="store_true",
                   help="rewrite --prompt with the prompt expander "
                        "(ref third_party/wan_prompt_expand)")
    p.add_argument("--prompt_expand_model", default=None,
                   help="local HF model dir for Qwen expansion; template "
                        "fallback when omitted/unavailable")
    p.add_argument("--image", default=None,
                   help="first-frame image for I2V conditioning")
    p.add_argument("--image_file", default=None,
                   help="file listing one conditioning-image path per line, "
                        "paired positionally with --prompt_file lines (ref "
                        "CLI --input_image_file, e.g. "
                        "scripts/inference/prompts/source_image_paths.txt)")
    p.add_argument("--cond_video", default=None,
                   help="conditioning clip (npy/npz or directory of frames) "
                        "for V2V control / video2world")
    p.add_argument("--cond_video_file", default=None,
                   help="file listing one conditioning-clip path per line, "
                        "paired positionally with --prompt_file lines (ref "
                        "CLI --source_video_file)")
    p.add_argument("--num_segments", type=int, default=1)
    p.add_argument("--overlap_frames", type=int, default=1)
    p.add_argument("--context_noise", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument("--no_ema", dest="use_ema", action="store_false")
    p.add_argument("--outdir", default="videos")
    p.add_argument("--cpu", action="store_true")
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

    config = import_config_from_python_file(args.config)
    override_config_with_opts(config, overrides)

    model = init_model(config)
    state, found_step = load_state(config, model, args.ckpt_dir, args.step)
    print(f"Loaded checkpoint step {found_step}")

    key = jax.random.PRNGKey(args.seed)
    n = args.num_samples
    shape = tuple(config.model.input_shape)  # [T, H, W, C] latents
    net = model.net

    # ---- conditioning media (single path, or per-job lists paired with
    # --prompt_file lines — ref --input_image_file/--source_video_file)
    tf, sf = vae_scale_factors(getattr(model, "vae", None))
    pixel_t = 1 + tf * (shape[0] - 1)
    pix_h, pix_w = shape[1] * sf, shape[2] * sf
    image_paths = (load_prompt_file(args.image_file) if args.image_file
                   else [args.image] if args.image else None)
    video_paths = (load_prompt_file(args.cond_video_file) if args.cond_video_file
                   else [args.cond_video] if args.cond_video else None)
    if getattr(net, "is_i2v", False) and image_paths is None:
        raise SystemExit("this config is image-to-video: pass --image=<png> "
                         "or --image_file=<list>")
    if (getattr(net, "is_vid2vid", False) or
            getattr(net, "is_video2world", False)) and video_paths is None:
        raise SystemExit("this config needs --cond_video=<npy|npz|frame-dir> "
                         "or --cond_video_file=<list>")

    def media_for(job_idx):
        image = cond_video = None
        if image_paths is not None:
            image = load_image_file(
                image_paths[min(job_idx, len(image_paths) - 1)], pix_h, pix_w)
        if video_paths is not None:
            cond_video = load_video_frames_file(
                video_paths[min(job_idx, len(video_paths) - 1)],
                pixel_t, pix_h, pix_w)
        return image, cond_video

    # ---- text condition(s): one job per prompt line with --prompt_file,
    # otherwise a single job (raw prompt / precomputed emb / unconditional)
    if args.neg_prompt_file is not None:
        with open(args.neg_prompt_file) as f:
            args.neg_prompt = f.read().strip()
    if args.prompt_file is not None:
        raw_prompts = load_prompt_file(args.prompt_file)
        jobs = [(p, f"p{i:03d}") for i, p in enumerate(raw_prompts)]
    else:
        # no prompt list: one job per conditioning-media entry (I2V/V2V
        # sweeps without per-clip prompts), else a single job
        n_media = max(len(image_paths) if image_paths else 1,
                      len(video_paths) if video_paths else 1)
        tags = [f"m{i:03d}" for i in range(n_media)] if n_media > 1 else [""]
        jobs = [(args.prompt, t) for t in tags]

    expander = None
    if args.prompt_expand and jobs[0][0] is not None:
        from fastgen_tpu.utils.prompt_expand import make_prompt_expander

        expander = make_prompt_expander(args.prompt_expand_model)

    def build_conditions(prompt, rng, image, cond_video):
        if prompt is not None:
            if expander is not None:
                out = expander(prompt, seed=args.seed)
                print(f"Expanded prompt: {out.prompt}")
                prompt = out.prompt
            if model.text_encoder is None:
                raise SystemExit(
                    "--prompt requires model.text_encoder in the config "
                    "(or pass --text_emb with precomputed embeddings)")
            prompts, neg_prompts = [prompt] * n, [args.neg_prompt] * n
        elif args.text_emb:
            text = jnp.asarray(np.load(args.text_emb))[None].repeat(n, 0)
            prompts = {"text_embeds": text}
            neg_prompts = {"text_embeds": jnp.zeros_like(text)}
        else:
            text = jnp.zeros((n, 1, net.text_dim), model.precision)
            prompts = {"text_embeds": text}
            neg_prompts = {"text_embeds": text}
        return prepare_video_conditions(model, prompts, neg_prompts,
                                        image=image, cond_video=cond_video,
                                        rng=rng)

    steps = args.steps or config.model.student_sample_steps
    ns = net.noise_scheduler
    os.makedirs(args.outdir, exist_ok=True)

    def decode_and_save(video_latents, prefix):
        video = np.asarray(video_latents)
        if model.vae is not None:
            # decode latent clips to pixel frames (ref video save path decodes
            # with the Wan VAE before writing)
            video = np.asarray(model.vae.decode(video, precision=model.precision))
        for i in range(video.shape[0]):
            out = save_video_frames(video[i], args.outdir, f"{prefix}_{i}")
            print(f"{prefix} sample {i} -> {out}")

    for job_idx, (prompt, tag) in enumerate(jobs):
        if tag:
            print(f"[{tag}] {prompt}")
        image, cond_video = media_for(job_idx)
        key, sub = jax.random.split(key)
        cond, neg = build_conditions(prompt, sub, image, cond_video)
        sep = "_" if tag else ""

        if args.mode in ("student", "both"):
            params_net = select_params(model, state, use_ema=args.use_ema)
            segments, prev_tail = [], None
            for seg in range(args.num_segments):
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, (n,) + shape, model.precision)
                gen = model.generator_fn(params_net, noise, rng=sub, condition=cond,
                                         student_sample_steps=steps,
                                         t_list=config.model.sample_t_cfg.t_list,
                                         student_sample_type=config.model.student_sample_type,
                                         context_noise=args.context_noise)
                if prev_tail is not None and args.overlap_frames > 0:
                    # overwrite the first overlap frames with the previous
                    # segment's tail (VAE-bridged overlap in the reference;
                    # latent overlap here)
                    gen = gen.at[:, :args.overlap_frames].set(prev_tail)
                segments.append(np.asarray(gen))
                prev_tail = gen[:, -args.overlap_frames:] if args.overlap_frames else None
            if len(segments) == 1:
                video = segments[0]
            else:
                parts = [segments[0]] + [s[:, args.overlap_frames:]
                                         for s in segments[1:]]
                video = np.concatenate(parts, axis=1)
            decode_and_save(video, f"student_steps{steps}{sep}{tag}")

        if args.mode in ("teacher", "both"):
            teacher = model.teacher if model.teacher is not None else net
            t_params = state.params.get("teacher", state.params["net"])
            g = args.guidance_scale if args.guidance_scale is not None else \
                (config.model.guidance_scale or 5.0)
            skip_layers = (tuple(int(s) for s in args.skip_layers.split(","))
                           if args.skip_layers else None)
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, (n,) + shape, model.precision)
            sample_kw = dict(condition=cond, neg_condition=neg, guidance_scale=g,
                             num_steps=args.teacher_steps, solver=args.solver)
            if skip_layers is not None:
                sample_kw.update(skip_layers=skip_layers,
                                 skip_layers_start_percent=args.skip_layers_start_percent)
            gen = teacher.apply(t_params, noise, method=teacher.sample, **sample_kw)
            decode_and_save(gen, f"teacher_cfg{g}_steps{args.teacher_steps}{sep}{tag}")


if __name__ == "__main__":
    main()
