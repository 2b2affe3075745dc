"""The examples/ scripts must stay runnable (FAST smoke mode)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = ["simple_demo.py", "batch_solver.py", "custom_cost.py",
            "receding_horizon.py", "arbitrary_constraints.py"]


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs(script):
    env = dict(os.environ, PMPC_EXAMPLES_FAST="1", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script)],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, f"{script} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
