from .nodes import Call, ColumnRef, Expr, Literal, call, case_when, col, if_, lit  # noqa: F401
from .compile import evaluate_expr  # noqa: F401
