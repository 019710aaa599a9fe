"""TPU-native model zoo (VITS2 / StableTTS / QuickVC / GPT-SoVITS)."""

from . import vits2
from .vits2 import VITS2Config
