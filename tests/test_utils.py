"""utils/: tracing format parity and logging."""

import io
import re

from sparseharness_tpu.utils import (
    ScopedTimer, timed, report_timing, set_trace_stream,
)
from sparseharness_tpu.utils.logging import get_logger, set_log_level


def test_profiling_datum_format():
    """Lines must match the reference's greppable format
    PROFILING_DATUM("name", "context", ms, "lang") — src/csds_timer.cpp:33
    (the reference's analyse.sh greps exactly this)."""
    buf = io.StringIO()
    set_trace_stream(buf)
    try:
        with ScopedTimer("encode", "sparse_matrix"):
            pass
        report_timing("executeKernel", "harness", 1.25)
    finally:
        set_trace_stream(None)
    lines = buf.getvalue().strip().splitlines()
    assert len(lines) == 2
    pat = re.compile(
        r'^PROFILING_DATUM\("([^"]+)", "([^"]+)", ([0-9.]+), "Python"\)$'
    )
    m = pat.match(lines[0])
    assert m and m.group(1) == "encode" and m.group(2) == "sparse_matrix"
    m = pat.match(lines[1])
    assert m and m.group(1) == "executeKernel" and float(m.group(3)) == 1.25


def test_timed_decorator():
    buf = io.StringIO()
    set_trace_stream(buf)
    try:
        @timed("ctx")
        def work():
            return 42

        assert work() == 42
    finally:
        set_trace_stream(None)
    assert "PROFILING_DATUM" in buf.getvalue()
    assert "work" in buf.getvalue()


def test_logger_levels():
    import logging

    log = get_logger("testmod")
    buf = io.StringIO()
    h = logging.StreamHandler(buf)
    logging.getLogger("sparseharness_tpu").addHandler(h)
    try:
        set_log_level("ERROR")
        log.warning("hidden")
        log.error("shown")
    finally:
        logging.getLogger("sparseharness_tpu").removeHandler(h)
        set_log_level("WARNING")
    out = buf.getvalue()
    assert "shown" in out and "hidden" not in out
