"""Accuracy metrics. Reference: python/eva/metric.py."""

import numpy as np


def valuation_mse(a, b):
    """Mean squared error between two valuations (dicts name -> vector),
    averaged across outputs."""
    if set(a.keys()) != set(b.keys()):
        raise ValueError("Valuations must have the same keys")
    mse = 0.0
    for key in a:
        mse += float(np.mean((np.asarray(a[key]) - np.asarray(b[key])) ** 2))
    return mse / len(a)
