"""Checkpoint/resume for optimizer state (SURVEY.md §5).

The reference has no in-process persistence; its JSON artifacts are the only
state (src/utils.py:108-136) and its do_mpc controllers admit they can't
pickle (src/mpc.py:103).  Here long runs checkpoint their full state as npz
so interrupted runs resume exactly (both paths resume-tested):

* BO: the (X, y) dataset + sigma history + PRNG key
  (optim/global_search.bayesian, tests/test_gp.py)
* NMPC closed loop: the warm-start inputs/multipliers + plant state +
  per-step outputs at every chunk boundary
  (mpc/runner.closed_loop_chunked, tests/test_mpc.py)
"""

from __future__ import annotations

import os

import numpy as np


def save(path: str, **arrays) -> str:
    """Atomic npz write of named arrays (scalars fine)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
    os.replace(tmp, path)
    return path


def load(path: str) -> dict:
    with np.load(path, allow_pickle=False) as f:
        return {k: f[k] for k in f.files}


def exists(path: str) -> bool:
    return os.path.isfile(path)
