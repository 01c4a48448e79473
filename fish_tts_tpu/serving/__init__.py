"""Serving front-ends over the continuous-batching engine."""

from fish_tts_tpu.serving.http import ServeDriver, make_server

__all__ = ["ServeDriver", "make_server"]
