"""Pack an Orbax run directory's net params into one committable npz.

The quality pipeline's long-horizon checkpoints live under untracked
``FASTGEN_OUTPUT/`` and die with the session that produced them (QUALITY.md
v6 lost an 8.4k-iteration teacher extension that way). This packs just the
EMA (or raw net) params into a compressed single-file snapshot small enough
to commit under ``quality/ckpt/``; a later session warm-starts from it via
``model.pretrained_model_path=<file>.npz`` (methods/base.py _load_pretrained).

Counterpart of the reference's practice of distributing trained torch
checkpoints as single files (ref ``fastgen/methods/model.py:600-644`` loads
them back via load_torch_state_dict).

Usage:
    python scripts/export_ckpt_params.py --ckpt <run>/checkpoints \
        [--step N] [--no-ema] [--dtype bfloat16] --out quality/ckpt/t.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # packing params is host-side work; never claim the (possibly busy) TPU —
    # the session sitecustomize force-sets the platform, so set it in-process
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="Orbax checkpoints dir (contains numeric step dirs)")
    ap.add_argument("--step", type=int, default=None,
                    help="step to export (default: latest)")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float16", "float32"],
                    help="storage dtype for floating leaves")
    ap.add_argument("--no-ema", action="store_true",
                    help="export raw net params instead of the EMA tree")
    args = ap.parse_args()

    from fastgen_tpu.utils.checkpointer import (load_native_net_params,
                                                save_net_params_npz)

    variables = load_native_net_params(args.ckpt, step=args.step,
                                       prefer_ema=not args.no_ema)
    save_net_params_npz(variables, args.out, dtype=args.dtype)
    print(f"{args.out}: {os.path.getsize(args.out) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
