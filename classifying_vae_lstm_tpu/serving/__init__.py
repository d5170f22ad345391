from .engine import GenerationEngine

__all__ = ["GenerationEngine"]
