"""End-to-end Ray Data pipelines."""
