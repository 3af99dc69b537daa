"""Structured Streaming variants of the extraction job."""
