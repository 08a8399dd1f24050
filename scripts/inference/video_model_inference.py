"""Video inference CLI (ref ``scripts/inference/video_model_inference.py``).

T2V few-step student generation from a trained causal checkpoint, with
optional multi-segment extrapolation (overlap frames re-noised as context,
ref ``causvid.py:187-397``)::

    python scripts/inference/video_model_inference.py --config=<config.py> \
        [--num_segments=1 --overlap_frames=1] [--steps=2] [--outdir=videos] [--cpu]

Text conditions come from ``--prompt`` (encoded in-process with the model's
text encoder, optionally rewritten with ``--prompt_expand``) or precomputed
embeddings (``--text_emb=<npy>``). Latent outputs are VAE-decoded when the
model carries a video VAE.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from scripts.inference.inference_utils import (  # noqa: E402
    init_model, load_state, save_video_frames, select_params)


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
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--text_emb", default=None, help="npy [L,D] text embedding")
    p.add_argument("--prompt", default=None,
                   help="text prompt (encoded with the model's text_encoder)")
    p.add_argument("--prompt_expand", action="store_true",
                   help="rewrite --prompt with the prompt expander "
                        "(ref third_party/wan_prompt_expand)")
    p.add_argument("--prompt_expand_model", default=None,
                   help="local HF model dir for Qwen expansion; template "
                        "fallback when omitted/unavailable")
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
        enc = model.text_encoder.encode([prompt] * n, precision=model.precision)
        text = enc["text_embeds"] if isinstance(enc, dict) else enc
    elif args.text_emb:
        text = jnp.asarray(np.load(args.text_emb))[None].repeat(n, 0)
    else:
        text = jnp.zeros((n, 1, model.net.text_dim), model.precision)
    cond = {"text_embeds": text}

    steps = args.steps or config.model.student_sample_steps
    params_net = select_params(model, state, use_ema=args.use_ema)
    ns = model.net.noise_scheduler

    segments = []
    prev_tail = None
    for seg in range(args.num_segments):
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, (n,) + shape, model.precision)
        gen = model.generator_fn(params_net, noise, rng=sub, condition=cond,
                                 student_sample_steps=steps,
                                 t_list=config.model.sample_t_cfg.t_list,
                                 student_sample_type=config.model.student_sample_type,
                                 context_noise=args.context_noise)
        if prev_tail is not None and args.overlap_frames > 0:
            # overwrite the first overlap frames with the previous segment's
            # tail (VAE-bridged overlap in the reference; latent overlap here)
            gen = gen.at[:, :args.overlap_frames].set(prev_tail)
        segments.append(np.asarray(gen))
        prev_tail = gen[:, -args.overlap_frames:] if args.overlap_frames else None

    if len(segments) == 1:
        video = segments[0]
    else:
        parts = [segments[0]] + [s[:, args.overlap_frames:] for s in segments[1:]]
        video = np.concatenate(parts, axis=1)

    if model.vae is not None:
        # decode latent clips to pixel frames (ref video save path decodes
        # with the Wan VAE before writing)
        video = np.asarray(model.vae.decode(video, precision=model.precision))

    for i in range(n):
        out = save_video_frames(video[i], args.outdir, f"student_steps{steps}_{i}")
        print(f"Sample {i} -> {out}")


if __name__ == "__main__":
    main()
