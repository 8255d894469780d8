"""Builds the native host runtime: python -m zerokit_tpu.runtime.build."""

import os
import subprocess
import sys

NATIVE_DIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "native"))


def build() -> str:
    srcs = [
        os.path.join(NATIVE_DIR, "rln_native.cpp"),
        os.path.join(NATIVE_DIR, "pairing.cpp"),
    ]
    out = os.path.join(NATIVE_DIR, "librln_native.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17", "-o", out] + srcs
    subprocess.run(cmd, check=True)
    return out


def _pyconfig(*flags: str) -> list:
    out = subprocess.run(
        ["python3-config", *flags], check=True, capture_output=True, text=True
    ).stdout
    return out.split()


def build_ffi() -> str:
    """Builds the C-ABI frontend librln_ffi.so (embeds CPython; see rln.h)."""
    src = os.path.join(NATIVE_DIR, "rln_ffi.cpp")
    out = os.path.join(NATIVE_DIR, "librln_ffi.so")
    cmd = (
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", out, src]
        + _pyconfig("--includes")
        + _pyconfig("--ldflags", "--embed")
    )
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}", file=sys.stderr)
    path = build_ffi()
    print(f"built {path}", file=sys.stderr)
