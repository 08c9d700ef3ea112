"""Tri-grid acceleration tests, isolated in a fresh interpreter.

The real tests live in tests/_tri_accel_impl.py (underscore = not
collected directly).  XLA:CPU segfaults compiling this module's
trace_triangles_grid executables ONLY in a long-lived full-suite
process (two distinct crash sites observed at the suite tail: first
serializing the executable for the persistent cache, then — with cache
writes disabled — inside backend_compile_and_load itself; the same
module passes every time in a fresh process).  Whatever cumulative
LLVM/XLA process state triggers it, a subprocess gives the module the
exact solo configuration that is known good, and bounds the blast
radius to a failed wrapper test instead of a suite-killing SIGSEGV.
"""
import os
import subprocess
import sys

def test_tri_accel_suite_in_subprocess():
    impl = os.path.join(os.path.dirname(__file__), "_tri_accel_impl.py")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", impl, "-q", "--no-header"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(impl)))
    if proc.returncode != 0:
        sys.stdout.write(proc.stdout[-8000:])
        sys.stderr.write(proc.stderr[-4000:])
    assert proc.returncode == 0, \
        f"tri_accel subprocess suite failed (rc={proc.returncode})"
