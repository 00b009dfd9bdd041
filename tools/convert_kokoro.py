# SPDX-License-Identifier: Apache-2.0
"""Kokoro checkpoint → streamkit_tpu model-dir converter.

Builds the reference model-dir layout (``plugins/native/kokoro/src/
kokoro_node.rs:705-709``: model weights + voices.bin + tokens.txt) from the
public kokoro distribution formats:

* ``--checkpoint kokoro-v1_0.pth``  — PyTorch state dict (torch is in-image,
  CPU build): tensors are mapped onto the JAX param layout of
  :mod:`streamkit_tpu.models.kokoro` by the name table below and written as
  flat ``weights.npz`` (the loader's override path). Unmapped tensors are
  listed so the table can be extended when real weights are provisioned
  (zero-egress environment: the mapping is exercised by synthetic
  checkpoints in tests until then).
* ``--voices voice1.pt voice2.pt ...`` — kokoro voicepacks (``[510, 1,
  256]`` f32 per voice) concatenated into ``voices.bin`` in argument order
  (speaker_id = position).
* ``--voices-bin voices.bin`` — pass through an existing sherpa-style pack.
* ``--tokens tokens.txt`` — copied verbatim.

Usage:
    python tools/convert_kokoro.py --out models/kokoro \\
        --checkpoint kokoro-v1_0.pth --voices af_bella.pt am_adam.pt \\
        --tokens tokens.txt
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamkit_tpu.models.kokoro import STYLE_DIM, STYLE_ROWS  # noqa: E402

# state-dict prefix → our param key prefix. Kokoro (StyleTTS2) modules:
# text_encoder (embedding + cnn + lstm), predictor (text_encoder/lstm/
# duration_proj/F0/N), decoder (generator). Extend as real checkpoints
# surface exact names.
NAME_TABLE = [
    ("text_encoder.embedding.weight", "embed"),
    ("predictor.duration_proj.linear_layer.weight", "dur_out/w"),
    ("predictor.duration_proj.linear_layer.bias", "dur_out/b"),
]


def convert_voicepacks(paths, out_path: str) -> int:
    import torch

    packs = []
    for p in paths:
        t = torch.load(p, map_location="cpu", weights_only=True)
        arr = np.asarray(t, dtype="<f4")
        arr = arr.reshape(-1, STYLE_DIM)
        if arr.shape[0] % STYLE_ROWS != 0:
            raise SystemExit(
                f"{p}: {arr.shape[0]} style rows is not a multiple of {STYLE_ROWS}"
            )
        packs.append(arr.reshape(-1, STYLE_ROWS, STYLE_DIM))
    voices = np.concatenate(packs, axis=0)
    voices.astype("<f4").tofile(out_path)
    return voices.shape[0]


def convert_checkpoint(path: str, out_path: str) -> tuple:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "net" in sd:
        sd = sd["net"]
    flat = {}
    mapped, unmapped = [], []
    for torch_name, ours in NAME_TABLE:
        if torch_name in sd:
            flat[ours] = np.asarray(sd[torch_name], np.float32)
            # torch Linear stores [out, in]; our dense is [in, out]
            if ours.endswith("/w") and flat[ours].ndim == 2:
                flat[ours] = flat[ours].T
            mapped.append(torch_name)
    for k in sd:
        if k not in mapped:
            unmapped.append(k)
    np.savez(out_path, **flat)
    return mapped, unmapped


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output model dir")
    ap.add_argument("--checkpoint", help="kokoro .pth state dict")
    ap.add_argument("--voices", nargs="*", default=[], help="voicepack .pt files")
    ap.add_argument("--voices-bin", help="existing sherpa-style voices.bin")
    ap.add_argument("--tokens", help="tokens.txt to copy")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if args.voices:
        n = convert_voicepacks(args.voices, os.path.join(args.out, "voices.bin"))
        print(f"voices.bin: {n} voices")
    elif args.voices_bin:
        shutil.copy(args.voices_bin, os.path.join(args.out, "voices.bin"))
    if args.tokens:
        shutil.copy(args.tokens, os.path.join(args.out, "tokens.txt"))
    if args.checkpoint:
        mapped, unmapped = convert_checkpoint(
            args.checkpoint, os.path.join(args.out, "weights.npz")
        )
        print(f"weights.npz: mapped {len(mapped)} tensors")
        if unmapped:
            print(f"UNMAPPED ({len(unmapped)}): extend NAME_TABLE in this tool:")
            for k in unmapped[:40]:
                print(f"  {k}")
    for sub in ("espeak-ng-data", "dict"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
