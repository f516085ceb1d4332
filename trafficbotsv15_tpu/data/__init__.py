"""Data pipeline: h5 schema, scene-centric preprocessing, synthetic scenarios."""
