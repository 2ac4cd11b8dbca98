"""Operator library: generators, analytics, dedup, similarity, text
analysis, multimodal plumbing, skew tools."""
