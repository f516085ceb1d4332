"""Flax model library: shared modules, encoders and the TrafficBots policy."""
