"""Pack a folder of files into WDS tar shards.

The reference's data docs (``fastgen/datasets/README.md`` "Preparing Your
Data") tell users to build shards with the external ``webdataset`` library;
this is the in-tree equivalent using ``fastgen_tpu.data.wds.ShardWriter``,
so shard creation needs no extra dependency.

Files are grouped into samples by their stem (basename up to the first
dot): ``clip_0001.mp4`` + ``clip_0001.txt`` + ``clip_0001.json`` become one
sample with members ``mp4``/``txt``/``json``; ``x.latent.npy`` keeps its
full ``latent.npy`` suffix so ``key_map={"real": "latent.npy"}`` addresses
it. Shards are numbered ``00000.tar``, ``00001.tar``, … exactly as
``resolve_datatags`` enumerates them.

    python scripts/pack_wds.py --src /data/clips --out /data/shards \
        [--shard_size 1000] [--rename mp4=video.mp4]
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import OrderedDict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="directory of files to pack")
    p.add_argument("--out", required=True, help="output shard directory")
    p.add_argument("--shard_size", type=int, default=1000)
    p.add_argument("--rename", action="append", default=[],
                   help="suffix rewrite old=new (repeatable), e.g. "
                        "jpeg=jpg to normalize extensions")
    args = p.parse_args()

    from fastgen_tpu.data.wds import ShardWriter

    rename = dict(r.split("=", 1) for r in args.rename)
    samples: "OrderedDict[str, dict]" = OrderedDict()
    for fname in sorted(os.listdir(args.src)):
        path = os.path.join(args.src, fname)
        if not os.path.isfile(path) or "." not in fname:
            continue
        stem, suffix = fname.split(".", 1)
        suffix = rename.get(suffix, suffix)
        samples.setdefault(stem, {})[suffix] = path

    if not samples:
        raise SystemExit(f"no packable files in {args.src}")

    with ShardWriter(args.out, shard_size=args.shard_size) as writer:
        for stem, members in samples.items():
            writer.write(stem, {suffix: open(path, "rb").read()
                                for suffix, path in members.items()})
    n_shards = len([f for f in os.listdir(args.out) if f.endswith(".tar")])
    print(f"packed {writer.num_samples} samples ({n_shards} shards) -> {args.out}")


if __name__ == "__main__":
    main()
