"""Collision detection and constraint assembly (masked, fixed-capacity)."""
