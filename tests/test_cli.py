"""CLI example coverage: the interactive relay REPL driven over stdin.

The reference ships interactive clap REPLs (rln-cli/src/examples/relay.rs);
this drives ours the same way a user would, piping a command script and
asserting the protocol outcomes (registration, signaling, double-signal
slashing) appear. Runs without proving (protocol-values path) so it stays in
the fast tier.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_relay_repl_slashing_flow():
    script = "\n".join(
        [
            "register",
            "register",
            "send 0 hello",
            "send 1 hi there",
            "send 0 again",  # same epoch -> slashed
            "epoch two",
            "send 0 fresh epoch",  # rate limit reset
            "send 9 nobody",  # out of range -> error line, not a crash
            "root",
            "log",
            "quit",
            "",
        ]
    )
    r = subprocess.run(
        [sys.executable, "-m", "zerokit_tpu.cli.relay", "--depth", "10"],
        input=script,
        cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout
    assert "registered user 0" in out
    assert "registered user 1" in out
    assert out.count("sent; nullifier") == 3  # two in epoch 1, one in epoch 2
    assert "SPAM: user 0 double-signaled" in out
    assert "(matches: True)" in out
    assert "no such user 9" in out
    assert "bye" in out
