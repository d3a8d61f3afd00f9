"""Shared numeric helpers for the hash kernels."""

from __future__ import annotations

import functools

import numpy as np


def _ignore_overflow(fn):
    """uint64 wraparound is intentional in these hash kernels."""

    @functools.wraps(fn)
    def wrapper(*a, **k):
        with np.errstate(over="ignore"):
            return fn(*a, **k)

    return wrapper
