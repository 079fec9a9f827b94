from sparseharness_tpu.utils.timing import (  # noqa: F401
    ScopedTimer,
    timed,
    report_timing,
    set_trace_stream,
)
from sparseharness_tpu.utils.logging import get_logger, set_log_level  # noqa: F401
