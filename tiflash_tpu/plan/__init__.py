from . import nodes  # noqa: F401
from .compiler import compile_fragment, execute_plan  # noqa: F401
