"""Hardware parity check for the grid-carry EC prefix-scan kernels.

These kernels (ff/pallas_field.ec_scan_rows) are the fused MSM's hot stages.
They cannot run in the CPU test suite: interpret mode dispatches ~50K eager
ops per scan step and jit-of-interpret hands XLA:CPU the whole limb chain
(minutes either way). This tool validates them against host big-int prefix
sums on the real chip; end-to-end coverage also comes from the fused MSM
parity checks (tools/fused_check.py, tools/fused_g2_check via bench).

Usage: python tools/ecscan_check.py
"""

import random

import numpy as np

from zerokit_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

from zerokit_tpu.constants import NUM_LIMBS, Q, R
from zerokit_tpu.ff import pallas_field as pf
from zerokit_tpu.ff.field import FQ
from zerokit_tpu.hostmath import bn254


def _rand_points(rnd, n):
    return [bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(1, R)) for _ in range(n)]


def _affine_rows(points_by_step):
    k = len(points_by_step)
    n = len(points_by_step[0])
    out = np.zeros((k, 2 * NUM_LIMBS, n), dtype=np.uint32)
    for step, pts in enumerate(points_by_step):
        flat = []
        for p in pts:
            x, y = (0, 0) if p is None else p
            flat.extend([x, y])
        enc = FQ.encode(flat).reshape(NUM_LIMBS, n, 2)
        for i in range(NUM_LIMBS):
            for c in range(2):
                out[step, i * 2 + c] = enc[i, :, c]
    return out


def _proj_rows(points_by_step):
    k = len(points_by_step)
    n = len(points_by_step[0])
    out = np.zeros((k, 3 * NUM_LIMBS, n), dtype=np.uint32)
    for step, pts in enumerate(points_by_step):
        flat = []
        for p in pts:
            if p is None:
                flat.extend([0, 1, 0])
            else:
                flat.extend([p[0], p[1], 1])
        enc = FQ.encode(flat).reshape(NUM_LIMBS, n, 3)
        for i in range(NUM_LIMBS):
            for c in range(3):
                out[step, i * 3 + c] = enc[i, :, c]
    return out


def _decode_proj(rows):
    k, _, n = rows.shape
    out = []
    for step in range(k):
        r = rows[step].reshape(NUM_LIMBS, 3, n)
        vals = FQ.decode(r.reshape(NUM_LIMBS, 3 * n))
        row = []
        for j in range(n):
            x, y, z = (int(vals[c * n + j]) for c in range(3))
            if z == 0:
                row.append(None)
                continue
            zi = pow(z, -1, Q)
            row.append((x * zi % Q, y * zi % Q))
        out.append(row)
    return out


def main():
    rnd = random.Random(71)
    k, n = 8, 4096
    steps = [_rand_points(rnd, 64) for _ in range(k)]
    steps = [[row[i % 64] for i in range(n)] for row in steps]
    steps[2][3] = None  # infinity sentinel mid-scan
    rows = _affine_rows(steps)
    got = _decode_proj(np.asarray(pf.ec_scan_rows(1, rows, "mixed")))
    for j in (0, 3, n - 1):
        acc = None
        for i in range(k):
            acc = bn254.G1.add(acc, steps[i][j])
            assert got[i][j] == acc, f"mixed lane {j} step {i}"
    print("scan_mixed parity OK")

    steps = [_rand_points(rnd, 16) for _ in range(4)]
    rows = _proj_rows(steps)
    got = _decode_proj(np.asarray(pf.ec_scan_rows(1, rows, "excl")))
    for j in range(16):
        acc = None
        for i in range(4):
            assert got[i][j] == acc, f"excl lane {j} step {i}"
            acc = bn254.G1.add(acc, steps[i][j])
    print("scan_excl parity OK")


if __name__ == "__main__":
    main()
