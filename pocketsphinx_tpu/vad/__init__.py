from .vad import Vad
from .endpointer import Endpointer

__all__ = ["Vad", "Endpointer"]
