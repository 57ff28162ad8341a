"""Parameter tree helpers."""
import jax
import numpy as np


def count_parameters(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))
