"""Pure-numpy monotonic alignment search used as the test oracle.

Independent banded-Viterbi implementation with the same semantics as the
reference Cython kernel (training/vits2/monotonic_align/core.pyx:7-40): used
both to satisfy `import monotonic_align` when importing reference models.py
and as the golden for our on-device Pallas/scan MAS.
"""

import numpy as np
import torch


def maximum_path_numpy(neg_cent: np.ndarray, t_ys: np.ndarray, t_xs: np.ndarray) -> np.ndarray:
    """neg_cent: (B, T_y, T_x) log-likelihood; returns one-hot path (B, T_y, T_x)."""
    b, max_ty, max_tx = neg_cent.shape
    paths = np.zeros_like(neg_cent, dtype=np.float32)
    for ib in range(b):
        t_y, t_x = int(t_ys[ib]), int(t_xs[ib])
        value = np.full((t_y, t_x), -1e9, dtype=np.float32)
        # DP: v[y, x] = neg_cent[y, x] + max(v[y-1, x], v[y-1, x-1]),
        # with the band constraint x <= y and x >= t_x - (t_y - y).
        for y in range(t_y):
            x_lo = max(0, t_x + y - t_y)
            x_hi = min(t_x, y + 1)
            for x in range(x_lo, x_hi):
                v_cur = value[y - 1, x] if (y > 0 and x < y) else (-1e9 if y > 0 else 0.0)
                if x == 0:
                    v_prev = 0.0 if y == 0 else -1e9
                else:
                    v_prev = value[y - 1, x - 1] if y > 0 else -1e9
                value[y, x] = neg_cent[ib, y, x] + max(v_cur, v_prev)
        # Backtrack.
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            paths[ib, y, index] = 1.0
            if index != 0 and (index == y or value[y - 1, index] < value[y - 1, index - 1]):
                index -= 1
    return paths


def maximum_path(neg_cent, mask):
    """Torch-facing wrapper matching reference monotonic_align/__init__.py:6-20."""
    device, dtype = neg_cent.device, neg_cent.dtype
    nc = neg_cent.detach().cpu().numpy().astype(np.float32)
    t_ys = mask.sum(1)[:, 0].cpu().numpy().astype(np.int32)
    t_xs = mask.sum(2)[:, 0].cpu().numpy().astype(np.int32)
    path = maximum_path_numpy(nc, t_ys, t_xs)
    return torch.from_numpy(path).to(device=device, dtype=dtype)
