"""Batched math primitives: pose algebra, spatial vectors, grids, EDT."""
