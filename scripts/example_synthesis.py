#!/usr/bin/env python3
"""fish-tts-tpu synthesis example (CLI parity with reference
scripts/example_synthesis.py): basic synthesis, voice cloning from a
reference WAV or a pre-encoded .npy profile, streaming mode."""

from __future__ import annotations

import argparse
import logging
import subprocess
import sys
import time
from pathlib import Path

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("example_synthesis")


def convert_to_wav(audio_path: Path) -> bytes:
    try:
        result = subprocess.run(
            [
                "ffmpeg", "-i", str(audio_path),
                "-f", "wav", "-ar", "44100", "-ac", "1",
                "-acodec", "pcm_s16le", "-",
            ],
            capture_output=True, check=True,
        )
        return result.stdout
    except subprocess.CalledProcessError as e:
        logger.error("Error converting audio: %s", e.stderr.decode())
        sys.exit(1)
    except FileNotFoundError:
        logger.error("ffmpeg not found. Install ffmpeg to convert non-WAV audio.")
        sys.exit(1)


def main():
    parser = argparse.ArgumentParser(
        description="fish-tts-tpu synthesis example",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog="""
Examples:
  %(prog)s --text "Hello world"
  %(prog)s --text "Nice to meet you" --reference voice.wav --transcript "..."
  %(prog)s --text "Nice to meet you" --profile voice.npy --transcript "..."
  %(prog)s --text "Long text here..." --stream --profile voice.npy --transcript "..."
""",
    )
    parser.add_argument("--text", type=str,
                        default="Hello, this is a test of Fish TTS text to speech synthesis.")
    parser.add_argument("--output", "-o", type=str, default="output.wav")
    parser.add_argument("--model-dir", default=None)
    parser.add_argument("--device", type=str, default="tpu",
                        choices=["cpu", "tpu", "cuda"])
    parser.add_argument("--precision", type=str, default="bf16",
                        choices=["bf16", "fp16", "fp32"])
    parser.add_argument("--temperature", type=float, default=0.7)
    parser.add_argument("--top-p", type=float, default=0.8)

    ref_group = parser.add_argument_group("Voice Cloning")
    ref_group.add_argument("--reference", "-r", type=Path,
                           help="Reference audio for voice cloning")
    ref_group.add_argument("--profile", "-p", type=Path,
                           help="Pre-encoded voice profile (.npy)")
    ref_group.add_argument("--transcript", "-t", type=str,
                           help="Transcript of the reference audio")

    parser.add_argument("--stream", action="store_true", help="Streaming mode")
    args = parser.parse_args()

    if args.reference and args.profile:
        parser.error("Cannot use both --reference and --profile. Choose one.")
    if (args.reference or args.profile) and not args.transcript:
        parser.error("--transcript is required for voice cloning")

    from fish_tts_tpu import VoiceProfile, get_instance

    logger.info("Loading model...")
    synth = get_instance(
        model_dir=args.model_dir, device=args.device, precision=args.precision
    )

    references = None
    if args.reference:
        logger.info("Encoding reference audio %s", args.reference)
        wav_bytes = (
            args.reference.read_bytes()
            if args.reference.suffix.lower() == ".wav"
            else convert_to_wav(args.reference)
        )
        references = [synth.encode_reference(wav_bytes, args.transcript)]
    elif args.profile:
        logger.info("Loading voice profile %s", args.profile)
        references = [VoiceProfile.load(args.profile, text=args.transcript)]

    t0 = time.perf_counter()
    if args.stream:
        logger.info("Streaming synthesis...")
        pcm_chunks = []
        first = None
        for chunk in synth.synthesize_stream(
            args.text, references=references,
            temperature=args.temperature, top_p=args.top_p,
        ):
            if first is None:
                first = time.perf_counter() - t0
                logger.info("First audio chunk after %.3fs", first)
            pcm_chunks.append(chunk)
        import numpy as np

        from fish_tts_tpu.utils.audio import to_wav_bytes

        pcm = b"".join(pcm_chunks)
        audio = np.frombuffer(pcm, dtype=np.int16).astype(np.float32) / 32767.0
        wav = to_wav_bytes(audio)
    else:
        wav = synth.synthesize(
            args.text, references=references,
            temperature=args.temperature, top_p=args.top_p,
        )
    elapsed = time.perf_counter() - t0

    Path(args.output).write_bytes(wav)
    duration = (len(wav) - 44) / (44100 * 2)
    logger.info(
        "Wrote %s: %.1fs audio in %.2fs (RTF=%.3f)",
        args.output, duration, elapsed, elapsed / duration if duration else 0,
    )


if __name__ == "__main__":
    main()
