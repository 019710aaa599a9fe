"""torchmetrics stub (only MulticlassAccuracy is referenced by the AR model)."""

from . import classification  # noqa: F401
