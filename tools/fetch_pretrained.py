"""Fetch + convert the pretrained initializations the reference uses.

The reference initializes from two external checkpoints this sandbox cannot
reach (zero egress):
- torchvision resnet18 ImageNet weights for the image encoder stem/layers
  (/root/reference/models/style_networks.py:117-121)
- the pretrained E2VID recurrent net
  (/root/reference/README.md -> e2vid/pretrained/E2VID_lightweight.pth.tar)

Run this WHERE NETWORK EXISTS; it downloads both, converts them through the
parity-tested converters (ess_tpu/io/convert.py), and writes flax param
pytrees as .npz files that ``ess_tpu.cli.train`` /
``ess_tpu.cli.reconstruct`` consume directly.

Usage:
    python tools/fetch_pretrained.py [--out pretrained/]
"""

import argparse
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

E2VID_URL = ("http://rpg.ifi.uzh.ch/data/E2VID/models/"
             "E2VID_lightweight.pth.tar")
RESNET18_URL = "https://download.pytorch.org/models/resnet18-f37072fd.pth"


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _save_npz(path, tree):
    import numpy as np
    np.savez(path, **{k: np.asarray(v) for k, v in _flatten(tree).items()})
    print(f"wrote {path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="pretrained")
    ap.add_argument("--skip-download", action="store_true",
                    help="convert already-downloaded files in --out")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    import torch

    e2vid_pth = os.path.join(args.out, "E2VID_lightweight.pth.tar")
    resnet_pth = os.path.join(args.out, "resnet18_imagenet.pth")
    if not args.skip_download:
        for url, dst in ((E2VID_URL, e2vid_pth), (RESNET18_URL, resnet_pth)):
            if os.path.exists(dst):
                print(f"exists: {dst}")
                continue
            print(f"downloading {url} ...")
            urllib.request.urlretrieve(url, dst)

    # E2VID: converted flax params + the architecture config
    from ess_tpu.io.convert import load_e2vid_checkpoint, load_resnet18_torch
    params, config = load_e2vid_checkpoint(e2vid_pth)
    _save_npz(os.path.join(args.out, "e2vid_lightweight_flax.npz"), params)
    import json
    with open(os.path.join(args.out, "e2vid_lightweight_config.json"), "w") as f:
        json.dump({k: v for k, v in config.items()
                   if isinstance(v, (int, float, str, bool))}, f, indent=2)

    # resnet18: grayscale-stem encoder init (the reference averages the RGB
    # stem kernel into 1 channel, style_networks.py:117-121 — the converter
    # reproduces that)
    import jax
    import jax.numpy as jnp
    from ess_tpu.models import ResNet18Encoder
    sd = torch.load(resnet_pth, map_location="cpu")
    enc = ResNet18Encoder()
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    enc_params, enc_stats = load_resnet18_torch(
        sd, variables["params"], variables["batch_stats"])
    _save_npz(os.path.join(args.out, "resnet18_encoder_flax.npz"), enc_params)
    _save_npz(os.path.join(args.out, "resnet18_encoder_stats.npz"), enc_stats)
    print("done — point model.e2vid_checkpoint / the encoder init at these "
          "files (see README).")


if __name__ == "__main__":
    main()
