"""Remote farm: localhost ZMQ round trip (parity with reference tests/remote.py)."""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

zmq = pytest.importorskip("zmq")

PORT = 23000 + (os.getpid() % 1000)  # unique per run (a leaked server from an
# aborted previous run must not answer this run) and OUTSIDE the Linux
# ephemeral range 32768-60999 (an outgoing connection could occupy the port)


@pytest.fixture(scope="module")
def farm():
    env = dict(os.environ)
    env["PMPC_TPU_NO_CACHE"] = "1"
    proc = subprocess.Popen(
        [sys.executable, "-m", "pmpc_tpu.remote", "--port", str(PORT),
         "--worker-num", "1", "--no-warmup"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    time.sleep(3.0)
    yield proc
    proc.terminate()
    proc.wait(timeout=10)


def _problem(N=8, xdim=2, udim=1, seed=0):
    from fixtures import double_integrator_f_fx_fu_fn

    rng = np.random.default_rng(seed)
    return dict(
        f_fx_fu_fn=double_integrator_f_fx_fu_fn(),
        Q=np.tile(np.eye(xdim), (N, 1, 1)),
        R=np.tile(0.1 * np.eye(udim), (N, 1, 1)),
        x0=rng.normal(size=xdim),
        max_it=5, verbose=False,
    )


def test_remote_solve_round_trip(farm):
    from pmpc_tpu import remote

    p = _problem()
    ret = remote.call("solve", "localhost", PORT, True, **p)
    assert not isinstance(ret, Exception), ret
    X, U, data = ret
    assert X.shape == (9, 2) and U.shape == (8, 1)

    import pmpc_tpu
    X_l, U_l, _ = pmpc_tpu.solve(**p)
    # worker runs f32 (no x64 in subprocess); tiny dtype-driven differences
    np.testing.assert_allclose(U, U_l, atol=1e-4)


def test_remote_unsupported_method_returns_exception(farm):
    from pmpc_tpu import remote

    ret = remote.call("rm_rf", "localhost", PORT, True)
    assert isinstance(ret, Exception)


def test_remote_nonblocking_poll(farm):
    from pmpc_tpu import remote

    fn = remote.call("solve", "localhost", PORT, False, **_problem(seed=1))
    t0 = time.time()
    while time.time() - t0 < 30.0:
        ret = fn()
        if not (isinstance(ret, str) and ret == "NOT_ARRIVED_YET"):
            break
        time.sleep(0.05)
    assert not isinstance(ret, str), "poll never completed"
    X, U, data = ret
    assert U.shape == (8, 1)


def test_remote_solve_problems_batch(farm):
    """A single farm request can carry a whole batch (solve_problems)."""
    from pmpc_tpu import remote

    # ONE shared f_fx_fu_fn: homogeneity compares callbacks by identity
    # (cloudpickle memoizes, so identity survives the wire) — distinct
    # closures would silently take the serial fallback instead of the
    # stacked whole-batch path this test exists to cover
    base = _problem()
    problems = [dict(base, x0=base["x0"] + 0.1 * i) for i in range(3)]
    ret = remote.call("solve_batch", "localhost", PORT, True, problems)
    assert not isinstance(ret, Exception), ret
    assert len(ret) == 3
    import pmpc_tpu
    for (X, U, data), p in zip(ret, problems):
        X_l, U_l, _ = pmpc_tpu.solve(**p)
        np.testing.assert_allclose(U, U_l, atol=1e-4)


def test_remote_riccati_state_round_trips(farm):
    """The riccati path's solver_state holds DEVICE arrays (round-5: the
    warm tuple stays on device to avoid per-iteration pulls) — it must still
    cloudpickle through the farm's wire format and warm-start a follow-up
    remote solve."""
    from pmpc_tpu import remote

    p = _problem()
    p["solver_settings"] = dict(method="riccati")
    p["u_l"] = -np.ones((8, 1))
    p["u_u"] = np.ones((8, 1))
    ret = remote.call("solve", "localhost", PORT, True, **p)
    assert not isinstance(ret, Exception), ret
    X, U, data = ret
    assert X is not None and np.isfinite(U).all()
    ss = data["solver_data"][-1]["solver_state"]
    assert ss and "riccati_warm" in ss
    p2 = dict(p)
    p2["solver_settings"] = dict(method="riccati", solver_state=ss)
    ret2 = remote.call("solve", "localhost", PORT, True, **p2)
    assert not isinstance(ret2, Exception), ret2
    X2, U2, d2 = ret2
    assert X2 is not None and np.isfinite(U2).all()
