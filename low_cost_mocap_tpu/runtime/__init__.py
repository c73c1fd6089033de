"""Streaming runtime: frame sources, engine loop, API server, serial link."""
