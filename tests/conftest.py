import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (SURVEY.md §4: multi-host simulation layer).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores JAX_PLATFORMS; jax.config is authoritative.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
DATA = ROOT / "test_data"
SYNTH = DATA / "synth"
GOLD = DATA / "golden"


@pytest.fixture(scope="session")
def synth():
    assert (SYNTH / "cov-total.bg").exists(), \
        "run: python3 test_data/gen_synth.py"
    return SYNTH


@pytest.fixture(scope="session")
def gold():
    assert (GOLD / "boring_t1.txt").exists(), \
        "run: bash test_data/gen_goldens.sh"
    return GOLD


@pytest.fixture(scope="session")
def bigenough_fixtures():
    return DATA / "bigenough"


# ---- slow-test lanes (round-2 verdict item #9) -------------------------
# `pytest -q` is the fast inner loop (< 5 min); slow tiers (multiprocess
# gloo runs, composed-pipeline goldens, crash-injection, 20 Mbp diffs)
# run with --runslow, which CI always passes.  RUNSLOW=1 also enables
# them (for the driver's plain `pytest tests/` invocations).


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (CI always does)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tier, deselected unless --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUNSLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow (CI does)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
