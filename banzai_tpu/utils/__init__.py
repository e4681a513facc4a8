"""Small shared utilities."""

from .jaxcfg import enable_compile_cache

__all__ = ["enable_compile_cache"]
