"""Tri-grid acceleration tests, isolated in a fresh interpreter.

The real tests live in tests/_tri_accel_impl.py.  XLA:CPU segfaults
compiling this module's trace_triangles_grid executables ONLY in a
long-lived full-suite process (two distinct crash sites observed at the
suite tail: first serializing the executable for the persistent cache,
then — with cache writes disabled — inside backend_compile_and_load
itself; the same module passes every time in a fresh process).  See
tests/_isolate.py for the shared mitigation.
"""
from _isolate import run_isolated


def test_tri_accel_suite_in_subprocess():
    run_isolated("_tri_accel_impl.py")
