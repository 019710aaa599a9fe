"""Import reference (torch) modules as numerical test oracles.

The reference at /root/reference is read-only public content used ONLY to
generate golden outputs inside tests — no reference code lives in this repo.
Missing third-party deps (librosa) and the unbuilt Cython monotonic_align are
satisfied by the minimal shims in tests/refshim/.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_SHIM = os.path.join(_HERE, "refshim")
_REF = "/root/reference"

_paths = {}


def _load(tag, subdir, names):
    """Import ``names`` with ``subdir`` at the front of sys.path, isolated per
    subproject (the reference has several same-named module copies)."""
    import importlib

    key = (tag, tuple(names))
    if key in _paths:
        return _paths[key]
    saved_mods = {n: sys.modules.pop(n, None) for n in _ALL_REF_MODULES}
    sys.path.insert(0, os.path.join(_REF, subdir))
    # the shim must stay AHEAD of the reference dir (its monotonic_align /
    # librosa / torchaudio stand-ins shadow unbuildable reference imports)
    if _SHIM in sys.path:
        sys.path.remove(_SHIM)
    sys.path.insert(0, _SHIM)
    try:
        mods = tuple(importlib.import_module(n) for n in names)
    finally:
        sys.path.remove(os.path.join(_REF, subdir))
        for n, m in saved_mods.items():
            if m is not None and n not in sys.modules:
                sys.modules[n] = m
    _paths[key] = mods if len(names) > 1 else mods[0]
    return _paths[key]


_ALL_REF_MODULES = [
    "commons", "modules", "attentions", "transforms", "models",
    "mel_processing", "stft", "pqmf", "losses", "stft_loss", "monotonic_align",
]


def vits2(*names):
    """Import modules from training/vits2 (e.g. oracle.vits2('modules'))."""
    return _load("vits2", "training/vits2", names)


def stabletts(*names):
    """Import matcha component modules (e.g. 'diffusion_transformer',
    'text_encoder', 'decoder', 'flow_matching', 'duration_predictors') with a
    synthetic ``matcha`` package: real component/model files, stubbed
    lightning/hydra-dependent utils."""
    import importlib
    import importlib.util
    import types

    base = os.path.join(_REF, "training/stabletts")
    if "matcha" not in sys.modules:
        if _SHIM in sys.path:
            sys.path.remove(_SHIM)
        sys.path.insert(0, _SHIM)  # torchdiffeq stub

        matcha = types.ModuleType("matcha")
        matcha.__path__ = [os.path.join(base, "matcha")]
        sys.modules["matcha"] = matcha

        # stub matcha.utils (the real one imports lightning/hydra/rich)
        utils = types.ModuleType("matcha.utils")
        utils.__path__ = [os.path.join(base, "matcha/utils")]
        utils.get_pylogger = lambda name=None: __import__("logging").getLogger(name or "matcha")
        sys.modules["matcha.utils"] = utils
        pylogger = types.ModuleType("matcha.utils.pylogger")
        pylogger.get_pylogger = utils.get_pylogger
        sys.modules["matcha.utils.pylogger"] = pylogger
        # real matcha.utils.model (pure torch)
        spec = importlib.util.spec_from_file_location(
            "matcha.utils.model", os.path.join(base, "matcha/utils/model.py")
        )
        model_mod = importlib.util.module_from_spec(spec)
        sys.modules["matcha.utils.model"] = model_mod
        spec.loader.exec_module(model_mod)
        utils.model = model_mod

        for pkg in ("matcha.models", "matcha.models.components"):
            m = types.ModuleType(pkg)
            m.__path__ = [os.path.join(base, pkg.replace(".", "/"))]
            sys.modules[pkg] = m

    mods = tuple(importlib.import_module(f"matcha.models.components.{n}") for n in names)
    return mods if len(names) > 1 else mods[0]


def vosk_tts(*names):
    """Import the inference package modules (pure python, e.g. g2p)."""
    sys.path.insert(0, _REF)
    if _SHIM in sys.path:
        sys.path.remove(_SHIM)
    sys.path.insert(0, _SHIM)  # onnxruntime stub for vosk_tts.synth import
    import importlib

    try:
        mods = tuple(importlib.import_module(f"vosk_tts.{n}") for n in names)
    finally:
        sys.path.remove(_REF)
    return mods if len(names) > 1 else mods[0]
