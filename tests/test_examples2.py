"""The examples/ scripts must stay runnable — second half (see
test_examples.run_example)."""

import pytest

from test_examples import run_example


@pytest.mark.parametrize("script", ["custom_cost.py",
                                    "receding_horizon.py",
                                    "arbitrary_constraints.py"])
def test_example_runs(script):
    run_example(script)
