"""Structured Streaming surface (SURVEY §2.9).

The reference advertises Spark Streaming (hot/readme.md:2) but ships pure
batch; here the same windowed energy aggregation runs under readStream with
a watermark, proving the batch/stream unification the reference intended.
"""
