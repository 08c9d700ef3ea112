"""Brick-accelerated traversal tests, isolated in a fresh interpreter.

The real tests live in tests/_traverse_fast_impl.py.  The round-3 full
suite run as ONE process segfaulted inside XLA:CPU while COMPILING
trace_grid_fast at the suite tail (faulthandler frame in
backend_compile_and_load — the long-lived-process crash class CLAUDE.md
section 3b documents); both suite halves pass when split.  Subprocess
isolation gives this Pallas-heavy module the fresh-process
configuration that is known good (see tests/_isolate.py).
"""
from _isolate import run_isolated


def test_traverse_fast_suite_in_subprocess():
    run_isolated("_traverse_fast_impl.py")
