from .template import cpp_format, generate, map_ctype
from .compiler import build, get_cxx_compiler
from .runtime import Runtime, RuntimeCache

__all__ = [
    "cpp_format",
    "generate",
    "map_ctype",
    "build",
    "get_cxx_compiler",
    "Runtime",
    "RuntimeCache",
]
