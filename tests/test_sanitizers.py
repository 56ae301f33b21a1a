"""ASan/UBSan over the native C++ modules (SURVEY §5: the reference's
race/memory-safety story is Rust itself; ours is sanitizer builds).

The driver runs in a subprocess with the sanitizer runtime preloaded
and WITHOUT jax — XLA's runtime is not sanitizer-clean and would mask
findings in our code."""

import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).parent.parent


def _libasan():
    try:
        out = subprocess.run(
            ["g++", "-print-file-name=libasan.so"],
            capture_output=True, timeout=30, text=True,
        )
        p = out.stdout.strip()
        return p if p and os.path.exists(p) else None
    except (OSError, subprocess.TimeoutExpired):
        return None


@pytest.mark.skipif(_libasan() is None, reason="no g++/libasan toolchain")
def test_native_modules_clean_under_asan_ubsan():
    env = dict(
        os.environ,
        UCFP_NATIVE_SANITIZE="address,undefined",
        ASAN_OPTIONS="detect_leaks=0:halt_on_error=1",
        UBSAN_OPTIONS="halt_on_error=1:print_stacktrace=1",
        LD_PRELOAD=_libasan(),
    )
    proc = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "native_sanitize_driver.py")],
        capture_output=True, timeout=300, text=True, env=env, cwd=str(ROOT),
    )
    assert proc.returncode == 0, (
        f"sanitized driver failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}"
    )
    assert "SANITIZE_DRIVER_OK" in proc.stdout
