from .settings import Settings  # noqa: F401
from .metrics import METRICS, Counter  # noqa: F401
from .failpoint import FailPoint, fail_point  # noqa: F401
from .summary import ExecutionSummary  # noqa: F401
