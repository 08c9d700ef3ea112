"""Megakernel tests, isolated in a fresh interpreter (tests/_isolate.py
rationale: XLA:CPU crashes compiling Pallas/while-heavy modules only in
a long-lived full-suite process).  Real tests: tests/_mega_impl.py."""
from _isolate import run_isolated


def test_mega_suite_in_subprocess():
    run_isolated("_mega_impl.py")
