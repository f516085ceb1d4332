"""Closed-loop simulator: dynamics, teacher forcing, rewards, rollout scan."""
