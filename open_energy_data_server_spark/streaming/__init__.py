"""Structured Streaming surface (SURVEY §2.9 / F12): windowed
aggregations with watermarks and custom stateful operators over the
``events`` stream shape."""
