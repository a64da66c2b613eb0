"""Codec layer: search orchestration, physical block codec, decompression."""
