"""RealSense .bag preprocessing tool (reference
evaluation/datasets/process_realsense.py equivalent).

pyrealsense2 is not bundled; the import-gated degradation path and the
CLI surface are what can be validated headlessly.
"""

import subprocess
import sys

import pytest

from coslam_tpu.tools.process_realsense import process_bag


def _has_pyrealsense2():
    try:
        import pyrealsense2  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has_pyrealsense2(),
                    reason="pyrealsense2 present; gated path not reachable")
def test_process_bag_import_gated(tmp_path):
    """Without pyrealsense2 the tool must fail with actionable guidance,
    not an opaque ModuleNotFoundError from inside the extraction loop."""
    with pytest.raises(ImportError, match="pyrealsense2 is required"):
        process_bag(str(tmp_path / "cap.bag"), str(tmp_path / "out"))


def test_cli_requires_bag_and_out():
    proc = subprocess.run(
        [sys.executable, "-m", "coslam_tpu.tools.process_realsense"],
        capture_output=True, text=True)
    assert proc.returncode == 2
    assert "--bag" in proc.stderr


def test_download_scripts_are_valid_bash():
    """scripts/download_*.sh (reference scripts/download_*.sh) must at
    least parse (zero-egress environment: cannot execute the wgets)."""
    import glob
    import os

    scripts = glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                     "scripts", "download_*.sh"))
    assert len(scripts) >= 4
    for sc in scripts:
        proc = subprocess.run(["bash", "-n", sc], capture_output=True,
                              text=True)
        assert proc.returncode == 0, f"{sc}: {proc.stderr}"
