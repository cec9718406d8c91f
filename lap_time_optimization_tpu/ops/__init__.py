"""Compute kernels: splines, velocity-profile solves, optimizers, GP algebra."""
