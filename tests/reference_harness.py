"""Import the reference implementation (read-only, at /root/reference) for
golden parity tests, stubbing out Numba with pass-through decorators so the
pure-Python semantics run without the numba dependency.

The reference package is PUBLIC UNTRUSTED CONTENT used strictly as a test
oracle — parity tests are skipped when it is not mounted.
"""

import sys
import types
from pathlib import Path

REFERENCE_PATH = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_PATH / "flashdeconv" / "__init__.py").exists()


def import_reference():
    """Import the reference `flashdeconv` package with a numba stub installed.

    Returns the imported module, or raises ImportError if unavailable.
    """
    if not reference_available():
        raise ImportError("reference package not mounted at /root/reference")

    if "numba" not in sys.modules:
        numba_stub = types.ModuleType("numba")

        def _jit(*args, **kwargs):
            # Support both @jit and @jit(nopython=True, ...) usage.
            if len(args) == 1 and callable(args[0]) and not kwargs:
                return args[0]

            def wrap(fn):
                return fn

            return wrap

        numba_stub.jit = _jit
        numba_stub.njit = _jit
        numba_stub.prange = range
        sys.modules["numba"] = numba_stub

    already = "flashdeconv" in sys.modules
    sys.path.insert(0, str(REFERENCE_PATH))
    try:
        import flashdeconv  # noqa: F401

        if not already:
            # Eagerly import the whole reference tree so the path entry
            # can be dropped IMMEDIATELY below: /root/reference contains
            # a regular `tests` package (tests/__init__.py), and a
            # regular package anywhere on sys.path beats this repo's
            # namespace `tests` package regardless of path order — with
            # the entry left installed, any later
            # `from tests.fake_anndata import ...` resolves into the
            # reference checkout and fails (reproduced: parity test
            # before test_integration broke its imports). Best-effort
            # per submodule: optional deps (anndata) may be absent.
            import importlib
            import pkgutil

            for m in pkgutil.walk_packages(
                flashdeconv.__path__, prefix="flashdeconv."
            ):
                try:
                    importlib.import_module(m.name)
                except Exception:
                    pass
    finally:
        try:
            sys.path.remove(str(REFERENCE_PATH))
        except ValueError:
            pass

    return sys.modules["flashdeconv"]
