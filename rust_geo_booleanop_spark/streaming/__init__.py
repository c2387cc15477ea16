"""Streaming is out of scope for the reference (batch-only kernel).

The north rule's resumability requirement is met with batch
checkpointing per partition instead — see sources/checkpoint.py.
This package exists for future structured-streaming variants of the
extraction pipeline (readStream over WARC drops).
"""
