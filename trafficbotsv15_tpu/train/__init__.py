"""Training: loss assembly, optimizer, pjit train step, checkpointing."""
