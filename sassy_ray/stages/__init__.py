"""Ray Data stages: blocking, pair generation, scoring, clustering, checkpointing."""
