"""TPU test lane (SURVEY.md §4 implication (4); VERDICT r2 item 2).

The main suite pins jax to the CPU backend before import
(tests/conftest.py), so nothing in it ever touches the real chip — which
is how round 2 shipped a flagship Pallas kernel that failed to compile on
TPU with 146 tests green. This lane re-runs the critical device paths on
the REAL TPU backend in a fresh subprocess (fresh interpreter = no CPU
pin): every Pallas kernel, one full frontend, one fused track step, one
window BA (tests/tpu_lane_script.py).

Skips (with the reason visible) when no TPU backend is reachable from a
fresh interpreter — e.g. developer machines without the axon relay.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tpu_lane_script.py")


@pytest.mark.tpu
def test_tpu_lane():
    env = dict(os.environ)
    # undo the CPU-suite pin for the child; sitecustomize re-selects the
    # default (axon TPU when present, cpu otherwise)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    r = subprocess.run([sys.executable, _SCRIPT], cwd=_ROOT, env=env,
                       capture_output=True, text=True, timeout=2400)
    tail = (r.stdout + r.stderr)[-2000:]
    if "TPU_LANE_SKIP" in r.stdout:
        pytest.skip(f"no TPU backend in subprocess: {tail}")
    assert r.returncode == 0, f"TPU lane failed:\n{tail}"
    assert "TPU_LANE_OK" in r.stdout, f"TPU lane incomplete:\n{tail}"
