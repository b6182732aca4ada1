"""The shipped examples must actually run — they are the library-level
documentation (docs/API.md) a migrating user will paste from."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_library_quickstart_runs(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples",
                                      "library_quickstart.py"),
         "--epochs", "1", "--base-ch", "4", "--image-size", "32",
         "--num-samples", "24", "--work-dir", str(tmp_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "QUICKSTART_OK" in proc.stdout
    # the printed MAE is a real number, not a masked-out zero
    mae_line = next(ln for ln in proc.stdout.splitlines()
                    if ln.startswith("val MAE"))
    assert float(mae_line.split()[2]) > 0.0
