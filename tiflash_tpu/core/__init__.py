from .dtypes import *  # noqa: F401,F403
from .block import Block, Column, column_from_numpy  # noqa: F401
