"""Structured Streaming facade.

The reference is a bounded batch job per file — it has no streaming
operators (SURVEY.md §2.6: watermarks/session windows n/a).  This module
exists for the continuous-ingestion deployment shape: the same extraction
kernels over ``readStream`` micro-batches.
"""
