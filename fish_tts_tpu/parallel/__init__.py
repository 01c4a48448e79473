"""Parallelism: device mesh construction and sharding rules."""
