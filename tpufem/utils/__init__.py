"""Utilities: reproducibility helpers, logging."""

from tpufem.utils.glibc_rand import GlibcRand

__all__ = ["GlibcRand"]
