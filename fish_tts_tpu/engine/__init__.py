"""Generation engine: prefill, chunked decode, sampling, streaming."""
