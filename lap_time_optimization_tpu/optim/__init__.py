"""Racing-line optimizers: gradient methods, sector solve, global search."""
