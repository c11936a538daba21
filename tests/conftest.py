"""Test configuration: force an 8-virtual-device CPU JAX platform.

Must run before jax is imported anywhere, hence the env mutation at
module import time (pytest imports conftest first).
"""

import os
import sys

# The TPU-tunnel environment injects an 'axon' PJRT plugin via
# PYTHONPATH sitecustomize that initializes JAX at interpreter start,
# locking the platform/device count before conftest runs. If we detect
# it, re-exec pytest with a cleaned environment.
_PYPATH = os.environ.get("PYTHONPATH", "")
if ".axon_site" in _PYPATH or os.environ.get("JAX_PLATFORMS") == "axon":
    import subprocess

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in _PYPATH.split(os.pathsep) if ".axon_site" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # pytest's fd-level capture is already active during conftest import,
    # so fds 1/2 point at its temp files — but pytest keeps dups of the
    # ORIGINAL stdout/stderr open. Find every fd that is a pipe or
    # terminal (the invoking console), dedupe by target, and echo the
    # child's report to each so the caller actually sees it; also keep
    # the full log at /tmp/pytest_reexec.log.
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *sys.argv[1:]], env=env,
        capture_output=True, text=True)
    report = proc.stdout[-20000:] + proc.stderr[-4000:]
    with open("/tmp/pytest_reexec.log", "w") as f:
        f.write(proc.stdout + proc.stderr)

    sinks = {}
    try:
        for fd_name in os.listdir("/proc/self/fd"):
            fd = int(fd_name)
            try:
                target = os.readlink(f"/proc/self/fd/{fd}")
            except OSError:
                continue
            if target.startswith("pipe:") or target.startswith("/dev/pts") \
                    or target == "/dev/tty":
                sinks.setdefault(target, fd)
    except OSError:
        pass
    wrote = False
    for fd in sinks.values():
        try:
            os.write(fd, report.encode())
            wrote = True
        except OSError:
            continue
    if not wrote:
        try:
            os.write(2, report.encode())
        except OSError:
            pass
    os._exit(proc.returncode)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: XLA compiles are extremely slow on this
# single-core CPU; cache them across test processes.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long end-to-end protocol runs")
    config.addinivalue_line(
        "markers", "fast: unit/numeric tier (`pytest -m fast` < 2 min)")


# Compile-heavy integration files excluded from the fast tier (measured
# per-file wall times; everything else sums to ~100 s on this host).
_FAST_EXCLUDE = {
    "test_integration",        # ~300 s: full SLAM loops on the CPU mesh
    "test_pipeline_active",    # ~140 s: threaded pipeline runs
    "test_cli",                # ~125 s: CLI end-to-end incl. crash-resume
    "test_benchmark_protocol", # ~65 s: culling/virtual-cam protocol
    "test_render_view",        # ~45 s: full-image renders
    "test_tensovm",            # ~30 s: lattice TV equivalences
    "test_synth_tum",          # ~24 s: TUM-format loader e2e
    "test_synth_scannet",      # ~22 s: ScanNet-format loader e2e
    "test_frame_align",        # ~90 s: three short SLAM loops (A/B)
    "test_ba_chunks",          # ~40 s: two full BA compiles
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod not in _FAST_EXCLUDE \
                and item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
