"""Structured Streaming support: replay harness + streaming operators."""
