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
optionally rewritten with ``--prompt_expand``) or ``--text_emb=<npy>``.
Latent outputs are VAE-decoded when the model carries a video VAE::

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
    init_model, load_image_file, load_state, load_video_frames_file,
    prepare_video_conditions, save_video_frames, select_params,
    vae_scale_factors)


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
    p.add_argument("--neg_prompt", default="")
    p.add_argument("--prompt_expand", action="store_true",
                   help="rewrite --prompt with the prompt expander "
                        "(ref third_party/wan_prompt_expand)")
    p.add_argument("--prompt_expand_model", default=None,
                   help="local HF model dir for Qwen expansion; template "
                        "fallback when omitted/unavailable")
    p.add_argument("--image", default=None,
                   help="first-frame image for I2V conditioning")
    p.add_argument("--cond_video", default=None,
                   help="conditioning clip (npy/npz or directory of frames) "
                        "for V2V control / video2world")
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

    # ---- conditioning media
    tf, sf = vae_scale_factors(getattr(model, "vae", None))
    pixel_t = 1 + tf * (shape[0] - 1)
    pix_h, pix_w = shape[1] * sf, shape[2] * sf
    image = load_image_file(args.image, pix_h, pix_w) if args.image else None
    cond_video = (load_video_frames_file(args.cond_video, pixel_t, pix_h, pix_w)
                  if args.cond_video else None)
    if getattr(net, "is_i2v", False) and image is None:
        raise SystemExit("this config is image-to-video: pass --image=<png>")
    if (getattr(net, "is_vid2vid", False) or
            getattr(net, "is_video2world", False)) and cond_video is None:
        raise SystemExit("this config needs --cond_video=<npy|npz|frame-dir>")

    # ---- text condition
    if args.prompt is not None:
        prompt = args.prompt
        if args.prompt_expand:
            from fastgen_tpu.utils.prompt_expand import make_prompt_expander

            expander = make_prompt_expander(args.prompt_expand_model)
            out = expander(prompt, seed=args.seed)
            print(f"Expanded prompt: {out.prompt}")
            prompt = out.prompt
        if model.text_encoder is None:
            raise SystemExit("--prompt requires model.text_encoder in the config "
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

    key, sub = jax.random.split(key)
    cond, neg = prepare_video_conditions(model, prompts, neg_prompts,
                                         image=image, cond_video=cond_video,
                                         rng=sub)

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
        decode_and_save(video, f"student_steps{steps}")

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
        decode_and_save(gen, f"teacher_cfg{g}_steps{args.teacher_steps}")


if __name__ == "__main__":
    main()
