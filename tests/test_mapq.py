"""Differential test: compute_mapq vs the C expression it replicates.

ref: sigfish src/sigfish.c:979-983 (int mapq=(int)round(500*(score2-score)/
score); if(mapq>60)mapq=60;) stored into the uint8_t aln_t.mapq field
(src/sigfish.h:153). Compiles the exact C expression and compares over a
grid that includes inf, nan, d1=0, .5-rounding boundaries, and overflow.
"""

from __future__ import annotations

import math
import struct
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from sigfish_tpu.ops.candidates import compute_mapq

C_SRC = r"""
#include <stdio.h>
#include <stdint.h>
#include <math.h>
#include <stdlib.h>
int main(void) {
    uint32_t a, b;
    while (scanf("%u %u", &a, &b) == 2) {
        float s1, s2;
        union { uint32_t u; float f; } u1, u2;
        u1.u = a; u2.u = b; s1 = u1.f; s2 = u2.f;
        int mapq = (int)round(500*(s2-s1)/s1);
        if (mapq > 60) mapq = 60;
        uint8_t m = mapq;
        printf("%d\n", m);
    }
    return 0;
}
"""


@pytest.fixture(scope="module")
def c_mapq(tmp_path_factory):
    d = tmp_path_factory.mktemp("cmapq")
    src = d / "mapq.c"
    src.write_text(C_SRC)
    exe = d / "mapq"
    subprocess.run(
        ["gcc", "-O2", str(src), "-o", str(exe), "-lm"], check=True
    )
    return exe


def _pairs():
    inf = float("inf")
    nan = float("nan")
    cases = [
        (1.0, inf),
        (0.0, 5.0),
        (0.0, 0.0),
        (13.16, inf),
        (10.0, 10.05),  # exactly-.5 region after f32 math
        (10.0, 10.049999),
        (10.0, 10.050001),
        (1.0, nan),
        (nan, 1.0),
        (1e-30, 1.0),  # overflow -> INT_MIN -> uint8 wrap
        (1e-38, 3e38),
        (100.0, 100.0),
        (7.25, 7.75),
        (2.0, 2.002),  # 0.5 boundary: 500*0.002/2
        (3.0, 3.003),
        (1.0, 1.121),  # 60.5 boundary
        (1.0, 1.1205),
        (1.0, 1.12),
    ]
    rng = np.random.default_rng(42)
    a = rng.uniform(0.01, 200, 500).astype(np.float32)
    b = a * (1 + rng.uniform(0, 0.3, 500)).astype(np.float32)
    cases += list(zip(a.tolist(), b.tolist()))
    return cases


def test_mapq_matches_c(c_mapq):
    pairs = _pairs()
    lines = []
    for d1, d2 in pairs:
        u1 = struct.unpack("<I", struct.pack("<f", np.float32(d1)))[0]
        u2 = struct.unpack("<I", struct.pack("<f", np.float32(d2)))[0]
        lines.append(f"{u1} {u2}")
    out = subprocess.run(
        [str(c_mapq)], input="\n".join(lines), capture_output=True, text=True,
        check=True,
    )
    got_c = [int(x) for x in out.stdout.split()]
    assert len(got_c) == len(pairs)
    for (d1, d2), expect in zip(pairs, got_c):
        assert compute_mapq(d1, d2) == expect, (d1, d2, expect)
