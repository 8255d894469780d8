"""The driver's multi-chip gate, run exactly as the driver runs it.

The round driver imports __graft_entry__ and calls dryrun_multichip(8) under
a wall-clock budget on a small (2-core) host with a cold XLA cache. This test
asserts the tier ladder (depth10 -> toy -> pico) completes inside that budget
— the budget claim is tested, not asserted. Marked `dryrun` (not part of the
fast tier) because the cold-cache path intentionally burns its subprocess
budgets before falling through to the guaranteed pico floor.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.dryrun
def test_dryrun_ladder_within_budget():
    env = dict(os.environ)
    # The driver runs dryrun_multichip under a forced 8-device CPU platform;
    # replicate that so the gate is hermetic even on a TPU-attached host
    # (without JAX_PLATFORMS=cpu the subprocess would pick the 1-chip TPU).
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        timeout=540,
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    assert "dryrun_multichip OK on 8 devices" in r.stdout
    # The tier REACHED is the claim, not just "OK": on any host this suite
    # runs on, the real-circuit tier (depth10 or depth10-lite) must pass —
    # a silent fallback to toy/pico is a regression (round-4 failure mode).
    tiers = [
        line.split("=", 1)[1].strip()
        for line in r.stdout.splitlines()
        if line.startswith("DRYRUN_TIER=")
    ]
    assert tiers, f"no DRYRUN_TIER line in stdout:\n{r.stdout}"
    min_tier = os.environ.get("DRYRUN_MIN_TIER", "depth10-lite")
    ladder = ["pico", "toy", "depth10-lite", "depth10"]
    assert ladder.index(tiers[-1]) >= ladder.index(min_tier), (
        f"dryrun fell back to {tiers[-1]!r} (need >= {min_tier!r})\n"
        f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    )


@pytest.mark.dryrun
def test_dryrun_pico_tier_direct():
    """The guaranteed-completion floor runs in seconds on any host."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "zerokit_tpu.parallel.dryrun", "8", "pico"],
        cwd=REPO,
        env=env,
        timeout=180,
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    assert "DRYRUN-PICO-OK" in r.stdout
