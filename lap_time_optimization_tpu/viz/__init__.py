"""Plotting and simulation replay (side-car, matplotlib-gated)."""
