"""Small shared utilities."""

from .jaxcfg import enable_compile_cache
from .pool import spawn_pool

__all__ = ["enable_compile_cache", "spawn_pool"]
