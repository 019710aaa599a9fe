import numpy as np


def pad_center(data, size, axis=-1, **kwargs):
    n = data.shape[axis]
    lpad = (size - n) // 2
    lengths = [(0, 0)] * data.ndim
    lengths[axis] = (lpad, size - n - lpad)
    return np.pad(data, lengths, **kwargs)


def tiny(x):
    x = np.asarray(x)
    dtype = x.dtype if np.issubdtype(x.dtype, np.floating) else np.float32
    return np.finfo(dtype).tiny


def normalize(S, norm=np.inf, axis=0, threshold=None, fill=None):
    if norm is None:
        return S
    raise NotImplementedError("refshim librosa.util.normalize supports norm=None only")
