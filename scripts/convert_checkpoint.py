#!/usr/bin/env python3
"""Convert a reference checkpoint directory (config.json + model.pth +
codec.pth + tokenizer.tiktoken) to fish-tts-tpu native format
(lm.safetensors + vocoder.safetensors, torch-free at load time).

Usage: python scripts/convert_checkpoint.py <model_dir> <out_dir>
"""

# Allow running straight from a source checkout without installation.
import sys as _sys
from pathlib import Path as _Path

try:
    import fish_tts_tpu  # noqa: F401
except ModuleNotFoundError:
    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--lm-dtype", default="bf16", choices=["bf16", "fp32"],
                    help="LM storage dtype (model.pth ships bf16, so the "
                         "default round-trips losslessly)")
    ap.add_argument("--vocoder-dtype", default="fp32",
                    choices=["bf16", "fp32"],
                    help="codec storage dtype (fp32 = lossless default)")
    ap.add_argument("--verify", action="store_true",
                    help="print the key-coverage report (consumed / expected "
                         "drops / unconsumed) and exit non-zero if any "
                         "checkpoint key was left unconsumed")
    args = ap.parse_args()

    from fish_tts_tpu.utils.checkpoint import convert_checkpoint_dir

    reports = convert_checkpoint_dir(args.model_dir, args.out_dir,
                                     lm_dtype=args.lm_dtype,
                                     vocoder_dtype=args.vocoder_dtype)
    print(f"Converted {args.model_dir} -> {args.out_dir}")
    if args.verify:
        bad = False
        for name, rep in reports.items():
            print(f"[{name}] {rep.summary()}")
            bad |= not rep.ok
        if bad:
            print("VERIFY FAILED: unconsumed checkpoint keys (see above)")
            raise SystemExit(1)
        print("VERIFY OK: every checkpoint key consumed or expected-dropped")


if __name__ == "__main__":
    main()
