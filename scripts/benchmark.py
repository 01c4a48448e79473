#!/usr/bin/env python3
"""Benchmark script for fish-tts-tpu (parity with reference
scripts/benchmark.py: RTF per length bucket, streaming first-chunk latency,
component profile)."""

from __future__ import annotations

import argparse
import sys
import time


def benchmark(model_dir: str | None, precision: str, profile: bool, tiny: bool):
    if tiny:
        from fish_tts_tpu.testing import make_tiny_tts

        print("Using tiny random-weight model (--tiny)")
        t0 = time.perf_counter()
        synth = make_tiny_tts(warmup=True)
    else:
        from fish_tts_tpu import FishTTS

        t0 = time.perf_counter()
        synth = FishTTS(model_dir=model_dir, precision=precision)
    init_time = time.perf_counter() - t0

    print("=" * 60)
    print("fish-tts-tpu Benchmark")
    print("=" * 60)
    print(f"Init time: {init_time:.1f}s  (precision={synth.precision})")
    print()

    print("Warming up...")
    _ = synth.synthesize("Test", max_tokens=32)
    print()

    tests = [
        ("Short", "Hello world!"),
        ("Medium", "The quick brown fox jumps over the lazy dog."),
        (
            "Long",
            "In a world where technology advances rapidly, artificial intelligence "
            "has emerged as a transformative force reshaping how we live and work.",
        ),
    ]

    print("Synthesis Benchmark:")
    print("-" * 60)
    total_audio = 0.0
    total_time = 0.0
    for name, text in tests:
        t0 = time.perf_counter()
        audio = synth.synthesize(text)
        elapsed = time.perf_counter() - t0
        audio_duration = (len(audio) - 44) / (44100 * 2)
        rtf = elapsed / audio_duration if audio_duration > 0 else 0
        total_audio += audio_duration
        total_time += elapsed
        print(
            f"{name:8s}: {len(text):3d} chars -> {audio_duration:5.1f}s audio "
            f"in {elapsed:5.2f}s (RTF={rtf:.3f})"
        )
    avg_rtf = total_time / total_audio if total_audio > 0 else 0
    print("-" * 60)
    print(f"Average RTF: {avg_rtf:.3f}")
    print()

    if profile:
        print("Component profile (Long text):")
        print("-" * 60)
        profile_synthesis(synth, tests[2][1])
        print()

    print("Streaming Benchmark:")
    print("-" * 60)
    text = tests[2][1]
    chunks = []
    t0 = time.perf_counter()
    first_chunk_time = None
    for chunk in synth.synthesize_stream(text):
        if first_chunk_time is None:
            first_chunk_time = time.perf_counter() - t0
        chunks.append(chunk)
    total_stream_time = time.perf_counter() - t0
    total_pcm = sum(len(c) for c in chunks)
    audio_duration = total_pcm / (44100 * 2)
    rtf = total_stream_time / audio_duration if audio_duration > 0 else 0
    print(f"First chunk (TTFA): {first_chunk_time:.3f}s")
    print(
        f"Total: {audio_duration:.1f}s audio in {total_stream_time:.2f}s "
        f"(RTF={rtf:.3f}), {len(chunks)} chunks"
    )


def profile_synthesis(synth, text: str):
    """Split timing into token generation vs vocoder decode."""
    import numpy as np

    prompt_text, prompt_tokens, use_prefix = synth._get_prompt_data(None)
    codes_list = []
    t0 = time.perf_counter()
    token_count = 0
    for response in synth._engine.generate_long(
        text, max_new_tokens=2048, temperature=0.7, top_p=0.8,
        repetition_penalty=1.1, prompt_text=prompt_text,
        prompt_tokens=prompt_tokens, use_prefix_cache=use_prefix,
    ):
        if response.action == "sample":
            codes_list.append(response.codes)
            token_count += response.codes.shape[1]
        elif response.action == "next":
            break
    gen_time = time.perf_counter() - t0

    vocoder_time = 0.0
    if codes_list:
        codes = np.concatenate(codes_list, axis=1)
        t0 = time.perf_counter()
        _ = synth._decode_codes(codes)
        vocoder_time = time.perf_counter() - t0

    total = gen_time + vocoder_time
    tps = token_count / gen_time if gen_time > 0 else 0
    print(f"Token generation: {gen_time:.2f}s ({token_count} tokens, {tps:.1f} tok/s)")
    print(f"Vocoder decode:   {vocoder_time:.2f}s")
    print(f"Total:            {total:.2f}s  (gen {gen_time/total*100:.1f}%)")


def main():
    parser = argparse.ArgumentParser(description="Benchmark fish-tts-tpu")
    parser.add_argument("--model-dir", default=None)
    parser.add_argument(
        "--precision", default="bf16", choices=["bf16", "fp16", "fp32"]
    )
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--tiny", action="store_true", help="tiny random model")
    args = parser.parse_args()
    benchmark(args.model_dir, args.precision, args.profile, args.tiny)


if __name__ == "__main__":
    sys.exit(main())
