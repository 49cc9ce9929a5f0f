"""Ray Data pipeline stages: fingerprint → exact dedup → blocking →
pairwise scoring → transitive clustering."""
