#!/usr/bin/env python3
"""Encode reference audio into a voice profile (.npy) for voice cloning.

CLI parity with reference scripts/encode_reference.py: ffmpeg transcode of
non-WAV input, transcript from arg or file, auto output naming.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path


def convert_to_wav(audio_path: Path) -> bytes:
    """Convert any audio file to 44.1 kHz mono WAV via ffmpeg."""
    try:
        result = subprocess.run(
            [
                "ffmpeg", "-i", str(audio_path),
                "-f", "wav", "-ar", "44100", "-ac", "1",
                "-acodec", "pcm_s16le", "-",
            ],
            capture_output=True,
            check=True,
        )
        return result.stdout
    except subprocess.CalledProcessError as e:
        print(f"Error converting audio: {e.stderr.decode()}", file=sys.stderr)
        sys.exit(1)
    except FileNotFoundError:
        print(
            "Error: ffmpeg not found. Please install ffmpeg to convert non-WAV audio.",
            file=sys.stderr,
        )
        sys.exit(1)


def main():
    parser = argparse.ArgumentParser(
        description="Encode reference audio into a voice profile for voice cloning.",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog="""
Examples:
  %(prog)s reference.wav "Hello, this is the reference transcript." -o voice.npy
  %(prog)s reference.wav -t transcript.txt -o voice.npy
  %(prog)s reference.wav "Hello world"        # -> saves to reference.npy
""",
    )
    parser.add_argument("audio", type=Path, help="Input audio file (WAV, MP3, FLAC, ...)")
    parser.add_argument("transcript", nargs="?", help="Reference transcript text")
    parser.add_argument("-t", "--transcript-file", type=Path,
                        help="Read transcript from file instead of argument")
    parser.add_argument("-o", "--output", type=Path,
                        help="Output .npy path (default: <audio>.npy)")
    parser.add_argument("--model-dir", default=None)
    parser.add_argument("--device", default="tpu", choices=["cpu", "tpu", "cuda"])
    parser.add_argument("--precision", default="bf16",
                        choices=["bf16", "fp16", "fp32"])
    args = parser.parse_args()

    if args.transcript_file:
        transcript = args.transcript_file.read_text().strip()
    elif args.transcript:
        transcript = args.transcript
    else:
        parser.error("Provide a transcript (positional or --transcript-file)")

    if not args.audio.exists():
        print(f"Error: {args.audio} not found", file=sys.stderr)
        sys.exit(1)

    if args.audio.suffix.lower() == ".wav":
        wav_bytes = args.audio.read_bytes()
    else:
        print(f"Converting {args.audio.name} to WAV...")
        wav_bytes = convert_to_wav(args.audio)

    output = args.output or args.audio.with_suffix(".npy")

    from fish_tts_tpu import get_instance

    print("Loading model...")
    synth = get_instance(
        model_dir=args.model_dir, device=args.device, precision=args.precision,
        warmup=False,
    )

    print("Encoding reference...")
    profile = synth.encode_reference(wav_bytes, transcript)
    profile.save(output)
    print(f"Saved voice profile to {output}  (codes {profile.codes.shape})")


if __name__ == "__main__":
    main()
