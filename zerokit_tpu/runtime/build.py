"""Builds the native host runtime: python -m zerokit_tpu.runtime.build."""

import os
import subprocess
import sys

NATIVE_DIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "native"))


def build() -> str:
    src = os.path.join(NATIVE_DIR, "rln_native.cpp")
    out = os.path.join(NATIVE_DIR, "librln_native.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out, src]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}", file=sys.stderr)
