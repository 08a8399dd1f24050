"""Dataset prep + teacher conversion (ref ``scripts/download_data.py``).

Zero-egress environments cannot download; this script covers the local halves:

* ``convert-teacher``: EDM/DiT torch pickle/pth -> a jax-ready .pth the
  framework loads via ``model.pretrained_model_path``
  (ref pickle->pth conversion, ``download_data.py:228-332``)
* ``pack-zip``: a folder of images (+ optional labels.json) -> the EDM-style
  ``<name>.zip`` with ``dataset.json`` the class-conditional loader reads
* ``cifar10``: build ``cifar10-32x32.zip`` from the standard python pickle
  batches (``cifar-10-batches-py``) if present locally

Usage::

    python scripts/download_data.py convert-teacher --src edm-cifar10.pkl \
        --arch edm --out teacher.pth
    python scripts/download_data.py cifar10 --src ./cifar-10-batches-py \
        --out $DATA_ROOT_DIR/cifar10-32x32.zip
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_teacher(args):
    import torch

    from fastgen_tpu.utils.torch_convert import load_torch_state_dict

    sd = load_torch_state_dict(args.src)
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, args.out)
    n = sum(v.size for v in sd.values())
    print(f"Wrote {args.out}: {len(sd)} tensors, {n/1e6:.2f}M params")


def pack_zip(args):
    import numpy as np
    import PIL.Image

    files = sorted(f for f in os.listdir(args.src)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    labels_path = os.path.join(args.src, "labels.json")
    labels = json.load(open(labels_path)) if os.path.exists(labels_path) else None
    out_labels = []
    with zipfile.ZipFile(args.out, "w") as z:
        for i, fname in enumerate(files):
            img = PIL.Image.open(os.path.join(args.src, fname)).convert("RGB")
            if args.resolution:
                img = img.resize((args.resolution, args.resolution),
                                 PIL.Image.LANCZOS)
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            arc = f"img{i:08d}.png"
            z.writestr(arc, buf.getvalue())
            out_labels.append([arc, int(labels[fname]) if labels else 0])
        z.writestr("dataset.json", json.dumps({"labels": out_labels}))
    print(f"Packed {len(files)} images -> {args.out}")


def cifar10(args):
    import pickle

    import numpy as np
    import PIL.Image

    batches = [f"data_batch_{i}" for i in range(1, 6)]
    images, labels = [], []
    for b in batches:
        with open(os.path.join(args.src, b), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        images.append(np.asarray(d[b"data"], np.uint8).reshape(-1, 3, 32, 32))
        labels.extend(int(x) for x in d[b"labels"])
    images = np.concatenate(images).transpose(0, 2, 3, 1)  # NHWC
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    out_labels = []
    with zipfile.ZipFile(args.out, "w") as z:
        for i, (img, lab) in enumerate(zip(images, labels)):
            buf = io.BytesIO()
            PIL.Image.fromarray(img).save(buf, format="PNG")
            arc = f"img{i:08d}.png"
            z.writestr(arc, buf.getvalue())
            out_labels.append([arc, lab])
        z.writestr("dataset.json", json.dumps({"labels": out_labels}))
    print(f"Wrote {args.out}: {len(images)} images")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert-teacher")
    c.add_argument("--src", required=True)
    c.add_argument("--arch", default="edm")
    c.add_argument("--out", required=True)
    c.set_defaults(fn=convert_teacher)
    c = sub.add_parser("pack-zip")
    c.add_argument("--src", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--resolution", type=int, default=None)
    c.set_defaults(fn=pack_zip)
    c = sub.add_parser("cifar10")
    c.add_argument("--src", required=True)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cifar10)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
